"""nginx-upsync registration over consul KV (sd/nginx/nginx.go).

Key layout under the configured base URL (a consul KV prefix such as
``http://127.0.0.1:8500/v1/kv/upstreams``), namespace defaulting to
"graphite":

    <base>/<namespace>/<dc-or-_>/<hostname>/<ip><port>?flags=<unix-ts>

The value is the nginx-upsync server line: ``{"weight":N,"max_fails":0}``
for the primary datacenter, ``{"backup":1,"max_fails":0}`` for the
others (nginx.go:276-342). ``flags`` carries the registration time;
Cleanup later expires records whose flags fall behind (register.go:138).
Consul's recurse listing returns full key paths, so listings strip the
"upstreams/<namespace>/" prefix exactly as the reference's nsEnd does
(nginx.go:74,133-141).
"""

from __future__ import annotations

import base64
import json
import time

from . import utils


class InvalidKeyError(Exception):
    """ErrInvalidKey — a listed key is outside the expected namespace."""

    def __init__(self, key: str, val: str):
        super().__init__(f"list key '{key}' is invalid: '{val}'")


def split_node(node: str):
    """splitNode (nginx.go:32-49): "dc/host/listen" -> parts, valid only
    with exactly three segments."""
    parts = node.split("/")
    if len(parts) != 3:
        parts = (parts + ["", "", ""])[:3]
        return parts[0], parts[1], parts[2], False
    return parts[0], parts[1], parts[2], True


class NginxSD:
    """The reference's Nginx SD (nginx.go:52-444) on stdlib HTTP."""

    def __init__(self, url: str, namespace: str, hostname: str,
                 clock=time.time):
        if not namespace:
            namespace = "graphite"
        self.hostname = hostname
        self._namespace = namespace
        self._base = f"{url}/{namespace}/"
        self._ns_end = f"upstreams/{namespace}/"
        self._clock = clock
        self._weight = 1
        self._body = b'{"weight":1,"max_fails":0}'
        self._backup_body = b'{"backup":1,"max_fails":0}'

    def namespace(self) -> str:
        return self._namespace

    def _set_weight(self, weight: int) -> None:
        if weight <= 0:
            weight = 1
        if self._weight != weight:
            self._weight = weight
            self._body = b'{"weight":%d,"max_fails":0}' % weight

    # -- listings ---------------------------------------------------------

    def _recurse(self) -> list[dict]:
        data = utils.http_get(self._base + "?recurse")
        nodes = json.loads(data)
        if not isinstance(nodes, list):
            raise ValueError("list key no found")
        return nodes

    def _entries(self):
        """Yield (stripped_key, raw_entry) for every key in the
        namespace, validating the nsEnd prefix like the reference."""
        for entry in self._recurse():
            if not isinstance(entry, dict) or not isinstance(
                entry.get("Key"), str
            ):
                raise ValueError("list key no found")
            key = entry["Key"]
            if not key.startswith(self._ns_end):
                raise InvalidKeyError(self._ns_end, key)
            yield key[len(self._ns_end):], entry

    def list(self) -> list[str]:
        """Keys registered for THIS hostname (nginx.go:111-153)."""
        out = []
        for key, _ in self._entries():
            _, host, _, ok = split_node(key)
            if ok and host == self.hostname:
                out.append(key)
        return out

    def list_map(self) -> dict[str, str]:
        """key -> decoded value for this hostname (nginx.go:155-210)."""
        out = {}
        for key, entry in self._entries():
            _, host, _, ok = split_node(key)
            if ok and host == self.hostname:
                value = entry.get("Value")
                out[key] = (
                    base64.b64decode(value).decode()
                    if isinstance(value, str) else ""
                )
        return out

    def nodes(self) -> list[utils.KV]:
        """Every record in the namespace, all hostnames (nginx.go:212-274)
        — the Cleanup input."""
        out = []
        for key, entry in self._entries():
            value = entry.get("Value")
            flags = entry.get("Flags")
            out.append(utils.KV(
                key=key,
                value=(
                    base64.b64decode(value).decode()
                    if isinstance(value, str) else ""
                ),
                flags=int(flags) if isinstance(flags, (int, float)) else 0,
            ))
        return out

    # -- registration -----------------------------------------------------

    def update(self, ip: str, port: str, dcs, weight: int) -> None:
        """Register (or refresh) this node (nginx.go:276-348). With
        datacenters, the first is primary (weighted) and the rest are
        nginx backups; without, the pseudo-dc "_" is used."""
        self._set_weight(weight)
        flags = f"?flags={int(self._clock())}"
        if not dcs:
            utils.http_put(
                f"{self._base}_/{self.hostname}/{ip}{port}{flags}",
                self._body,
            )
            return
        err = None
        for i, dc in enumerate(dcs):
            body = self._body if i == 0 else self._backup_body
            try:
                utils.http_put(
                    f"{self._base}{dc}/{self.hostname}/{ip}{port}{flags}",
                    body,
                )
            except Exception as e:  # keep going, surface the last error
                err = e
        if err is not None:
            raise err

    def delete(self, ip: str, port: str, dcs) -> None:
        """Drop this node's records (nginx.go:361-404)."""
        if not dcs:
            utils.http_delete(f"{self._base}_/{self.hostname}/{ip}{port}")
            return
        err = None
        for dc in dcs:
            try:
                utils.http_delete(
                    f"{self._base}{dc}/{self.hostname}/{ip}{port}"
                )
            except Exception as e:
                err = e
        if err is not None:
            raise err

    def delete_node(self, node: str) -> None:
        """Drop one listed key verbatim (nginx.go:350-359)."""
        utils.http_delete(self._base + node)

    def clear(self, preserve_ip: str, preserve_port: str) -> None:
        """Drop every record of this hostname except the current listen
        address (nginx.go:406-444) — stale-endpoint hygiene at startup
        and full cleanup ("", "") at shutdown."""
        preserve = preserve_ip + preserve_port
        err = None
        for node in self.list():
            _, host, listen, _ = split_node(node)
            if host == self.hostname and listen != preserve:
                try:
                    self.delete_node(node)
                except Exception as e:
                    err = e
        if err is not None:
            raise err

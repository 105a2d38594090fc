"""Registration loop and expiry cleanup (sd/register.go).

`Registrar` is the Spark-side Register(): a daemon thread that
re-registers the driver's HTTP listener every `delay` seconds with a
weight derived from the host's normalized load average, re-resolving the
local IP when listening on the wildcard address, and clearing the
registration on stop. `cleanup` is the `graphite-clickhouse -sd-list /
-sd-delete` maintenance pass (register.go:138-166): expire records whose
flags timestamp has fallen `sd_expire` behind.
"""

from __future__ import annotations

import socket
import threading
import time

from . import load_avg
from .nginx import NginxSD
from .utils import KV, NotFoundError

DEFAULT_DELAY_SEC = 10.0  # register.go:20


def new_sd(settings, hostname: str) -> NginxSD:
    """sd.New (register.go:41-49): only the nginx/consul flavour is
    registered; any other type errors."""
    if settings.sd_type in ("nginx", ""):
        return NginxSD(settings.sd_url, settings.sd_namespace, hostname)
    raise ValueError("service discovery type not registered")


def short_hostname() -> str:
    """os.Hostname cut at the first dot (register.go:69-70)."""
    return socket.gethostname().split(".", 1)[0]


class Registrar:
    """Periodic self-registration (register.go:51-132)."""

    def __init__(self, settings, listen: str, sd: NginxSD | None = None,
                 delay_sec: float = DEFAULT_DELAY_SEC,
                 load_fn=load_avg.normalized_load, local_ip_fn=None):
        from .utils import get_local_ip

        self.settings = settings
        self.listen = listen
        self.delay_sec = delay_sec
        self._load_fn = load_fn
        self._local_ip_fn = local_ip_fn or get_local_ip
        # listening on ":port" (all interfaces) -> register the first
        # non-loopback IP, re-probed every round (register.go:63-67,99-102)
        self.register_first = listen.startswith(":")
        self.listen_ip = self._local_ip_fn() if self.register_first else ""
        self._prev_ip = self.listen_ip
        self.sd = sd if sd is not None else new_sd(settings, short_hostname())
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _weight(self) -> int:
        try:
            load = self._load_fn()
            load_avg.store(load)
        except OSError:
            load = load_avg.load()
        s = self.settings
        return load_avg.weight(
            s.base_weight, s.degraded_multiply, s.degraded_load, load
        )

    def register_once(self) -> None:
        """One loop body: refresh the record, chase IP changes."""
        if self.register_first:
            self.listen_ip = self._local_ip_fn()
        self.sd.update(
            self.listen_ip, self.listen, list(self.settings.sd_dc),
            self._weight(),
        )
        if self._prev_ip != self.listen_ip:
            try:
                self.sd.delete(
                    self._prev_ip, self.listen, list(self.settings.sd_dc)
                )
            except NotFoundError:
                pass
            self._prev_ip = self.listen_ip

    def start(self) -> None:
        # initial registration + stale-record sweep (register.go:87-88)
        self.register_once()
        try:
            self.sd.clear(self.listen_ip, self.listen)
        except NotFoundError:
            pass
        self._thread = threading.Thread(
            target=self._run, name="sd-register", daemon=True
        )
        self._thread.start()

    def _run(self) -> None:
        while not self._stop.wait(self.delay_sec):
            try:
                self.register_once()
            except Exception:
                # transient consul outages must not kill the loop; the
                # reference logs and retries next tick
                pass

    def stop(self, timeout: float = 5.0) -> None:
        """Stop the loop and clear every record of this host
        (register.go:120-131)."""
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout)
        try:
            self.sd.clear("", "")
        except Exception:
            pass


def cleanup(settings, sd: NginxSD, check_only: bool,
            now: float | None = None) -> list[tuple[KV, str]]:
    """Expire stale registrations (register.go:138-166). Returns
    (record, action) pairs where action is "expired" (check mode),
    "deleted", or "" (kept); callers print, like the CLI does."""
    out: list[tuple[KV, str]] = []
    if not settings.sd_url or settings.sd_expire_sec <= 0:
        return out
    ts = (now if now is not None else time.time()) - settings.sd_expire_sec
    for node in sd.nodes():
        if node.flags > 0 and ts > node.flags:
            if check_only:
                out.append((node, "expired"))
            else:
                sd.delete_node(node.key)
                out.append((node, "deleted"))
        else:
            out.append((node, ""))
    return out

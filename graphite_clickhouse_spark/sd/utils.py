"""HTTP + KV helpers for service discovery (sd/utils/utils.go).

Same surface as the reference: 2-second-deadline GET/PUT/DELETE against a
consul KV endpoint, 404 mapped to a sentinel "not found" error, any other
non-200 to an error carrying the status code, and a best-effort local-IP
probe for processes listening on the wildcard address.
"""

from __future__ import annotations

import socket
import urllib.error
import urllib.request
from dataclasses import dataclass

_TIMEOUT_SEC = 2.0


class NotFoundError(Exception):
    """utils.ErrNotFound — the KV path does not exist (HTTP 404)."""


class HTTPStatusError(Exception):
    """Non-200/404 response (errs.NewErrorWithCode in the reference)."""

    def __init__(self, body: str, code: int):
        super().__init__(f"{code}: {body}")
        self.code = code
        self.body = body


@dataclass
class KV:
    """One consul KV entry (sd/utils/utils.go:16-20). `flags` carries the
    registration's unix timestamp — the expiry input for Cleanup."""

    key: str
    value: str = ""
    flags: int = 0


def _request(method: str, url: str, body: bytes | None = None) -> bytes:
    req = urllib.request.Request(url, data=body, method=method)
    if body is not None:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req, timeout=_TIMEOUT_SEC) as resp:
            return resp.read()
    except urllib.error.HTTPError as e:
        data = e.read()
        if e.code == 404:
            raise NotFoundError(url) from None
        raise HTTPStatusError(data.decode("utf-8", "replace"), e.code) from None


def http_get(url: str) -> bytes:
    return _request("GET", url)


def http_put(url: str, body: bytes) -> None:
    _request("PUT", url, body)


def http_delete(url: str) -> None:
    _request("DELETE", url)


def get_local_ip() -> str:
    """First non-loopback IPv4 of this host (utils.GetLocalIP). The UDP
    connect trick needs no packets on the wire; falls back to resolving
    the hostname, then to empty (the reference returns "" on failure)."""
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            s.connect(("203.0.113.1", 9))  # TEST-NET-3, never routed to
            ip = s.getsockname()[0]
        finally:
            s.close()
        if not ip.startswith("127."):
            return ip
    except OSError:
        pass
    try:
        for ip in socket.gethostbyname_ex(socket.gethostname())[2]:
            if not ip.startswith("127."):
                return ip
    except OSError:
        pass
    return ""

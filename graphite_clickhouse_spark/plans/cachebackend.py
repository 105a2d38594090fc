"""Find-cache storage backends — in-process and shared/external.

The reference defines a BytesCache interface with an in-memory and a
memcached implementation (/root/reference/cache/cache.go:10-85); the
memcached client hashes every key through sha256 so arbitrary-length
target keys stay protocol-legal. This module mirrors that split:

- MemBackend        thread-safe TTL+LRU byte store (single process)
- MemcachedBackend  memcached TEXT protocol client (get/set), stdlib
                    sockets only, sha256-hexed keys, multi-server by
                    key-hash modulo — the shared backend that keeps a
                    multi-replica deployment cache-coherent

Backends store opaque bytes; FindCache owns serialization and the TTL
class / key-shape logic (plans/findcache.py).
"""

from __future__ import annotations

import hashlib
import socket
import threading
import time as _time
from collections import OrderedDict


class CacheBackendError(RuntimeError):
    pass


class MemBackend:
    """Bounded TTL+LRU byte map (the reference's in-memory cache role)."""

    def __init__(self, max_entries: int = 65536):
        self.max_entries = max_entries
        self._data: OrderedDict[str, tuple[float, bytes]] = OrderedDict()
        self._lock = threading.Lock()

    def get(self, key: str, now: float | None = None) -> bytes | None:
        now = _time.time() if now is None else now
        with self._lock:
            item = self._data.get(key)
            if item is None or item[0] <= now:
                if item is not None:
                    del self._data[key]
                return None
            self._data.move_to_end(key)
            return item[1]

    def set(self, key: str, value: bytes, ttl_sec: int,
            now: float | None = None) -> None:
        now = _time.time() if now is None else now
        with self._lock:
            self._data[key] = (now + ttl_sec, bytes(value))
            self._data.move_to_end(key)
            while len(self._data) > self.max_entries:
                self._data.popitem(last=False)


class MemcachedBackend:
    """Minimal memcached text-protocol client (get/set only — the two
    verbs cache.go uses). One pooled connection per server, re-dialed on
    error; cache failures are soft (None / swallow) exactly like the
    reference treats memcache misses and errors."""

    def __init__(self, servers: tuple[str, ...], timeout_sec: float = 1.0):
        if not servers:
            raise ValueError("memcached backend needs at least one server")
        self._servers = tuple(servers)
        self._timeout = timeout_sec
        self._conns: dict[int, socket.socket] = {}
        self._locks = [threading.Lock() for _ in servers]

    @staticmethod
    def _hash_key(key: str) -> str:
        # cache.go hashes keys (sha256) so any target string is legal
        return hashlib.sha256(key.encode("utf-8")).hexdigest()

    def _pick(self, hashed: str) -> int:
        return int(hashed[:8], 16) % len(self._servers)

    def _conn(self, idx: int) -> socket.socket:
        conn = self._conns.get(idx)
        if conn is not None:
            return conn
        host, _, port = self._servers[idx].partition(":")
        conn = socket.create_connection(
            (host, int(port or 11211)), timeout=self._timeout
        )
        self._conns[idx] = conn
        return conn

    def _drop(self, idx: int) -> None:
        conn = self._conns.pop(idx, None)
        if conn is not None:
            try:
                conn.close()
            except OSError:
                pass

    def _read_line(self, conn: socket.socket) -> bytes:
        buf = bytearray()
        while not buf.endswith(b"\r\n"):
            b = conn.recv(1)
            if not b:
                raise CacheBackendError("connection closed")
            buf += b
        return bytes(buf[:-2])

    def _read_exact(self, conn: socket.socket, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                raise CacheBackendError("connection closed")
            buf += chunk
        return bytes(buf)

    def get(self, key: str, now: float | None = None) -> bytes | None:
        hashed = self._hash_key(key)
        idx = self._pick(hashed)
        with self._locks[idx]:
            try:
                conn = self._conn(idx)
                conn.sendall(b"get " + hashed.encode() + b"\r\n")
                line = self._read_line(conn)
                if line == b"END":
                    return None
                if not line.startswith(b"VALUE "):
                    raise CacheBackendError(f"unexpected reply {line!r}")
                nbytes = int(line.rsplit(b" ", 1)[1])
                value = self._read_exact(conn, nbytes)
                self._read_exact(conn, 2)  # trailing \r\n
                if self._read_line(conn) != b"END":
                    raise CacheBackendError("missing END")
                return value
            except (OSError, CacheBackendError, ValueError):
                self._drop(idx)
                return None  # soft-fail: a cache error is a miss

    def set(self, key: str, value: bytes, ttl_sec: int,
            now: float | None = None) -> None:
        hashed = self._hash_key(key)
        idx = self._pick(hashed)
        with self._locks[idx]:
            try:
                conn = self._conn(idx)
                head = f"set {hashed} 0 {int(ttl_sec)} {len(value)}\r\n"
                conn.sendall(head.encode() + value + b"\r\n")
                reply = self._read_line(conn)
                if reply != b"STORED":
                    raise CacheBackendError(f"set failed: {reply!r}")
            except (OSError, CacheBackendError):
                self._drop(idx)  # soft-fail: next read is just a miss


def make_backend(cache_type: str, servers: tuple[str, ...] = (),
                 max_entries: int = 65536):
    """Config 'type' -> backend ('mem' | 'memcached'; cache.go:22-41)."""
    if cache_type == "mem":
        return MemBackend(max_entries)
    if cache_type == "memcached":
        return MemcachedBackend(servers)
    raise ValueError(f"unknown find-cache type: {cache_type!r}")

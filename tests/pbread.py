"""Minimal protobuf wire reader for e2e format checks (test-side only).

Decodes the render/find response formats our encoders emit so HTTP
checks can assert every format the reference corpus declares
(`formats = ["pickle", "protobuf", "carbonapi_v3_pb"]`) instead of
trusting one. Independent of render/reply.py — a second implementation
of the public wire format, reading what the first one writes.
"""

from __future__ import annotations

import math
import struct


def read_varint(buf: bytes, i: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[i]
        out |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return out, i
        shift += 7


def iter_fields(buf: bytes):
    """Yield (field_no, wire_type, value) — value is int for varint,
    bytes for length-delimited, raw 4 bytes for fixed32."""
    i = 0
    while i < len(buf):
        key, i = read_varint(buf, i)
        field_no, wt = key >> 3, key & 7
        if wt == 0:
            v, i = read_varint(buf, i)
        elif wt == 2:
            n, i = read_varint(buf, i)
            v = buf[i:i + n]
            i += n
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field_no, wt, v


def _doubles(payload: bytes) -> list[float]:
    return list(struct.unpack(f"<{len(payload) // 8}d", payload))


def parse_render_v2(buf: bytes) -> list[dict]:
    """carbonapi_v2_pb MultiFetchResponse -> [{name,start,stop,step,
    values}] with isAbsent applied (absent -> NaN)."""
    out = []
    for fno, _wt, msg in iter_fields(buf):
        assert fno == 1
        m: dict = {}
        vals: list[float] = []
        absent: bytes = b""
        for f, _w, v in iter_fields(msg):
            if f == 1:
                m["name"] = v.decode()
            elif f == 2:
                m["start"] = v
            elif f == 3:
                m["stop"] = v
            elif f == 4:
                m["step"] = v
            elif f == 5:
                vals = _doubles(v)
            elif f == 6:
                absent = v
        m["values"] = [
            math.nan if (i < len(absent) and absent[i]) else x
            for i, x in enumerate(vals)
        ]
        out.append(m)
    return out


def parse_render_v3(buf: bytes) -> list[dict]:
    """carbonapi_v3_pb MultiFetchResponse -> [{name,pathExpression,
    function,start,stop,step,values,request_start,request_stop}]."""
    out = []
    for fno, _wt, msg in iter_fields(buf):
        assert fno == 1
        m: dict = {}
        for f, _w, v in iter_fields(msg):
            if f == 1:
                m["name"] = v.decode()
            elif f == 2:
                m["pathExpression"] = v.decode()
            elif f == 3:
                m["function"] = v.decode()
            elif f == 4:
                m["start"] = v
            elif f == 5:
                m["stop"] = v
            elif f == 6:
                m["step"] = v
            elif f == 9:
                m["values"] = _doubles(v)
            elif f == 11:
                m["request_start"] = v
            elif f == 12:
                m["request_stop"] = v
        out.append(m)
    return out


def _parse_glob(msg: bytes) -> tuple[str, list[tuple[str, bool]]]:
    query, matches = "", []
    for f, _w, v in iter_fields(msg):
        if f == 1:
            query = v.decode()
        elif f == 2:
            path, leaf = "", False
            for mf, _mw, mv in iter_fields(v):
                if mf == 1:
                    path = mv.decode()
                elif mf == 2:
                    leaf = bool(mv)
            matches.append((path, leaf))
    return query, matches


def parse_find_v2(buf: bytes) -> list[tuple[str, bool]]:
    """find protobuf GlobResponse -> [(path, is_leaf)]."""
    return _parse_glob(buf)[1]


def parse_find_v3(buf: bytes) -> list[tuple[str, bool]]:
    """find carbonapi_v3_pb MultiGlobResponse{1: GlobResponse}."""
    out = []
    for fno, _wt, msg in iter_fields(buf):
        assert fno == 1
        out.extend(_parse_glob(msg)[1])
    return out

"""Pure-Python Snappy BLOCK-format codec.

Prometheus remote read/write wraps its protobuf bodies in snappy block
compression (prompb: "snappy-compressed protocol buffer"); the reference
gets the codec from golang/snappy via the embedded Prometheus web handler
(/root/reference/prometheus/run.go:63-87). This container has no snappy
binding, and the format is small and public (google/snappy
format_description.txt), so it is implemented here directly:

- stream  = uvarint(uncompressed length) ++ elements
- element = literal (tag&3 == 0, length in tag or 1-4 trailing bytes)
          | copy1  (tag&3 == 1: len 4-11, 11-bit offset)
          | copy2  (tag&3 == 2: len 1-64, 16-bit LE offset)
          | copy4  (tag&3 == 3: len 1-64, 32-bit LE offset)

The compressor is a greedy 4-byte-hash matcher over 64 KiB fragments
(matches never cross a fragment, so copy2 offsets always suffice —
the same fragmentation golang/snappy and the C++ reference use). Any
spec-conforming decompressor accepts its output; the decompressor here
accepts the full format including copy4 and overlapping copies.
"""

from __future__ import annotations

_MAX_FRAGMENT = 65536  # compressors fragment input so offsets fit copy2


class SnappyError(ValueError):
    pass


def _read_uvarint(data: bytes, i: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        if i >= len(data):
            raise SnappyError("truncated uvarint")
        b = data[i]
        v |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return v, i
        shift += 7
        if shift > 63:
            raise SnappyError("uvarint too long")


def _write_uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decompress(data: bytes) -> bytes:
    """Snappy block-format decompress (raises SnappyError on malformed
    input; validates the declared uncompressed length)."""
    n, i = _read_uvarint(data, 0)
    out = bytearray()
    ln_data = len(data)
    while i < ln_data:
        tag = data[i]
        i += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59  # 1..4 little-endian length bytes
                if i + nb > ln_data:
                    raise SnappyError("truncated literal length")
                ln = int.from_bytes(data[i : i + nb], "little")
                i += nb
            ln += 1
            if i + ln > ln_data:
                raise SnappyError("truncated literal")
            out += data[i : i + ln]
            i += ln
            continue
        if kind == 1:  # copy, 1-byte offset extension
            if i >= ln_data:
                raise SnappyError("truncated copy1")
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | data[i]
            i += 1
        elif kind == 2:
            if i + 2 > ln_data:
                raise SnappyError("truncated copy2")
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[i : i + 2], "little")
            i += 2
        else:
            if i + 4 > ln_data:
                raise SnappyError("truncated copy4")
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[i : i + 4], "little")
            i += 4
        if off == 0 or off > len(out):
            raise SnappyError(f"invalid copy offset {off} at output {len(out)}")
        # overlapping copies are legal (RLE-style): append in chunks that
        # never read past what exists
        pos = len(out) - off
        while ln > 0:
            take = min(ln, len(out) - pos)
            out += out[pos : pos + take]
            pos += take
            ln -= take
    if len(out) != n:
        raise SnappyError(f"length mismatch: declared {n}, got {len(out)}")
    return bytes(out)


def _emit_literal(out: bytearray, data: bytes, start: int, end: int) -> None:
    ln = end - start
    if ln <= 0:
        return
    ln -= 1
    if ln < 60:
        out.append(ln << 2)
    elif ln < (1 << 8):
        out.append(60 << 2)
        out.append(ln)
    elif ln < (1 << 16):
        out.append(61 << 2)
        out += ln.to_bytes(2, "little")
    elif ln < (1 << 24):
        out.append(62 << 2)
        out += ln.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += ln.to_bytes(4, "little")
    out += data[start:end]


def _emit_copy(out: bytearray, off: int, ln: int) -> None:
    # long matches: peel 64-byte copy2 elements (golang/snappy emitCopy)
    while ln >= 68:
        out.append((63 << 2) | 2)
        out += off.to_bytes(2, "little")
        ln -= 64
    if ln > 64:
        out.append((59 << 2) | 2)  # 60-byte copy leaves >=4 for the tail
        out += off.to_bytes(2, "little")
        ln -= 60
    if ln >= 12 or off >= 2048:
        out.append(((ln - 1) << 2) | 2)
        out += off.to_bytes(2, "little")
    else:
        out.append(((off >> 8) << 5) | ((ln - 4) << 2) | 1)
        out.append(off & 0xFF)


def compress(data: bytes) -> bytes:
    """Greedy hash-match snappy block compressor (64 KiB fragments)."""
    out = bytearray(_write_uvarint(len(data)))
    for frag_start in range(0, len(data), _MAX_FRAGMENT):
        frag_end = min(frag_start + _MAX_FRAGMENT, len(data))
        _compress_fragment(out, data, frag_start, frag_end)
    if not data:
        pass  # header alone is the valid empty stream
    return bytes(out)


def _compress_fragment(out: bytearray, data: bytes, start: int, end: int) -> None:
    n = end - start
    if n < 4:
        _emit_literal(out, data, start, end)
        return
    table: dict[bytes, int] = {}
    i = start
    lit_start = start
    limit = end - 3  # last position a 4-byte probe fits
    while i < limit:
        probe = data[i : i + 4]
        cand = table.get(probe)
        table[probe] = i
        if cand is None or data[cand : cand + 4] != probe:
            i += 1
            continue
        # extend the match
        ml = 4
        while i + ml < end and data[cand + ml] == data[i + ml]:
            ml += 1
        _emit_literal(out, data, lit_start, i)
        _emit_copy(out, i - cand, ml)
        # seed the table sparsely across the match (cheap, keeps long
        # runs compressible without hashing every byte)
        step = 1 if ml <= 16 else 13
        for j in range(i + 1, min(i + ml, limit), step):
            table[data[j : j + 4]] = j
        i += ml
        lit_start = i
    _emit_literal(out, data, lit_start, end)

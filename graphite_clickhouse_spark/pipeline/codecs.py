"""Pure-Python/stdlib media codecs for the multimodal pipeline.

The container has no PIL/libsndfile, but three real formats ARE fully
decodable with the stdlib + numpy, so the decode step is no longer a
stub for them:

- BMP  (24-bit uncompressed, bottom-up or top-down) — decode + encode
- PNG  (8-bit gray/gray+alpha/RGB/RGBA, non-interlaced, all 5 filter
        types) — decode via stdlib zlib
- WAV  (PCM 8/16-bit) — decode + encode via stdlib `wave`

Formats without an in-container codec (JPEG &c.) still fall back to the
clearly-marked deterministic fake in multimodal.py. All kernels operate
on numpy arrays so the mapInPandas Arrow batches stay vectorized.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np


class CodecError(ValueError):
    pass


# ------------------------------------------------------------------ BMP

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP (bottom-up)."""
    h, w, c = pixels.shape
    if c != 3:
        raise CodecError("encode_bmp expects RGB")
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    body = bytearray()
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        # BMP stores BGR
        body += pixels[y, :, ::-1].tobytes() + pad
    return header + bytes(body)


def decode_bmp(data: bytes) -> tuple[int, int, np.ndarray]:
    """24/32-bit uncompressed BMP -> (w, h, (H, W, 3) uint8 RGB)."""
    if data[:2] != b"BM" or len(data) < 54:
        raise CodecError("not a BMP")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise CodecError("unsupported BMP header")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise CodecError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    nbytes = bpp // 8
    row_size = (w * nbytes + 3) & ~3
    if pix_off + row_size * h > len(data):
        raise CodecError("truncated BMP")
    rows = np.frombuffer(
        data, np.uint8, count=row_size * h, offset=pix_off
    ).reshape(h, row_size)
    px = rows[:, : w * nbytes].reshape(h, w, nbytes)
    if not top_down:
        px = px[::-1]
    # BGR(A) -> RGB
    return w, h, np.ascontiguousarray(px[:, :, 2::-1])


# ------------------------------------------------------------------ PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> tuple[int, int, np.ndarray]:
    """8-bit non-interlaced PNG -> (w, h, (H, W, C) uint8)."""
    if data[:8] != _PNG_SIG:
        raise CodecError("not a PNG")
    pos, idat = 8, bytearray()
    w = h = ct = None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # + CRC
        if typ == b"IHDR":
            w, h, bd, ct, comp, filt, interlace = struct.unpack(">IIBBBBB", chunk)
            if bd != 8 or ct not in _PNG_CHANNELS or interlace:
                raise CodecError(
                    f"unsupported PNG: depth={bd} color={ct} interlace={interlace}"
                )
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if w is None:
        raise CodecError("PNG missing IHDR")
    ch = _PNG_CHANNELS[ct]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise CodecError("PNG data length mismatch")
    out = np.zeros((h, stride), np.uint8)
    zero = np.zeros(stride, np.int32)
    p = 0
    for y in range(h):
        ft = raw[p]
        row = np.frombuffer(raw, np.uint8, count=stride, offset=p + 1).astype(np.int32)
        p += 1 + stride
        up = out[y - 1].astype(np.int32) if y else zero
        if ft == 0:  # None
            cur = row
        elif ft == 2:  # Up
            cur = (row + up) & 0xFF
        elif ft in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = np.zeros(stride, np.int32)
            for x in range(0, stride, ch):
                left = cur[x - ch : x] if x else zero[:ch]
                if ft == 1:
                    cur[x : x + ch] = (row[x : x + ch] + left) & 0xFF
                elif ft == 3:
                    cur[x : x + ch] = (
                        row[x : x + ch] + (left + up[x : x + ch]) // 2
                    ) & 0xFF
                else:
                    ul = up[x - ch : x] if x else zero[:ch]
                    a, b, c = left, up[x : x + ch], ul
                    pth = a + b - c
                    pa, pb, pc = abs(pth - a), abs(pth - b), abs(pth - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                    )
                    cur[x : x + ch] = (row[x : x + ch] + pred) & 0xFF
        else:
            raise CodecError(f"unknown PNG filter {ft}")
        out[y] = cur
    return w, h, out.reshape(h, w, ch)


def encode_png(pixels: np.ndarray) -> bytes:
    """(H, W, C) uint8 -> 8-bit non-interlaced PNG (filter 0 rows)."""
    h, w, c = pixels.shape
    ct = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            len(payload).to_bytes(4, "big") + typ + payload
            + zlib.crc32(typ + payload).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# ------------------------------------------------------------------ WAV

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples -> PCM WAV bytes (stdlib wave)."""
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(np.asarray(samples, np.int16).tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV -> (sample_rate, float64 mono samples in native scale)."""
    import wave

    try:
        with wave.open(io.BytesIO(data), "rb") as wf:
            rate = wf.getframerate()
            n = wf.getnframes()
            width = wf.getsampwidth()
            nch = wf.getnchannels()
            frames = wf.readframes(n)
    except wave.Error as exc:
        raise CodecError(f"not a PCM WAV: {exc}") from exc
    if width == 2:
        arr = np.frombuffer(frames, "<i2").astype(np.float64)
    elif width == 1:
        arr = np.frombuffer(frames, np.uint8).astype(np.float64) - 128.0
    else:
        raise CodecError(f"unsupported WAV sample width {width}")
    if nch > 1:  # downmix
        arr = arr.reshape(-1, nch).mean(axis=1)
    return rate, arr


# ------------------------------------------------------------- features

def image_features(pixels: np.ndarray) -> list[float]:
    """Per-channel means followed by an 8-bin luminance histogram
    (normalized) — 3 + 8 floats for RGB, channel-count + 8 otherwise."""
    h, w, c = pixels.shape
    means = pixels.reshape(-1, c).mean(axis=0)
    if c >= 3:
        lum = (
            0.299 * pixels[:, :, 0].astype(np.float64)
            + 0.587 * pixels[:, :, 1]
            + 0.114 * pixels[:, :, 2]
        )
    else:
        lum = pixels[:, :, 0].astype(np.float64)
    hist, _ = np.histogram(lum, bins=8, range=(0, 256))
    hist = hist / max(lum.size, 1)
    return [float(x) for x in means] + [float(x) for x in hist]


def audio_features(samples: np.ndarray, rate: int) -> list[float]:
    """[n_samples, sample_rate, min, max, mean, rms, zero_crossings]."""
    n = samples.size
    if n == 0:
        return [0.0, float(rate), 0.0, 0.0, 0.0, 0.0, 0.0]
    zc = int(np.count_nonzero(np.signbit(samples[1:]) != np.signbit(samples[:-1])))
    return [
        float(n),
        float(rate),
        float(samples.min()),
        float(samples.max()),
        float(samples.mean()),
        float(np.sqrt(np.mean(samples * samples))),
        float(zc),
    ]

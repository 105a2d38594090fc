"""Pure-Python/stdlib media codecs for the multimodal pipeline.

The container has no PIL/libsndfile, but four real formats ARE fully
decodable with the stdlib + numpy, so the decode step is no longer a
stub for them:

- BMP  (24-bit uncompressed, bottom-up or top-down) — decode + encode
- PNG  (8-bit gray/gray+alpha/RGB/RGBA, non-interlaced, all 5 filter
        types) — decode via stdlib zlib
- JPEG (baseline sequential DCT, gray/4:4:4/4:2:0, restart markers) —
        decode + encode, pure numpy (see the JPEG section below)
- WAV  (PCM 8/16-bit) — decode + encode via stdlib `wave`

Formats without an in-container codec (progressive JPEG, video) still
fall back to the clearly-marked deterministic fake in multimodal.py.
All kernels operate on numpy arrays so the mapInPandas Arrow batches
stay vectorized.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np


class CodecError(ValueError):
    pass


def _codec_boundary(fn):
    """Decorator: a corrupt container must surface as CodecError, not a
    leaked struct/zlib/index/value error (fuzz-pinned in
    test_pipeline.py). CodecError subclasses ValueError, so re-raise it
    first."""
    import functools

    @functools.wraps(fn)
    def wrapped(data: bytes):
        try:
            return fn(data)
        except CodecError:
            raise
        except (struct.error, zlib.error, IndexError, KeyError,
                EOFError, StopIteration, ValueError,
                # hostile header fields can reach arithmetic (the r7
                # JPEG zero-sampling-factor find was a ZeroDivisionError
                # leak).  RuntimeError is deliberately NOT in this tuple:
                # the one stdlib source of bare RuntimeError on corrupt
                # input (wave/chunk.py) is caught narrowly at the wave
                # call site in decode_wav; catching it here would also
                # swallow RecursionError / NotImplementedError and mask
                # genuine implementation bugs as "corrupt container".
                ArithmeticError) as exc:
            raise CodecError(f"corrupt container: {exc}") from exc

    return wrapped



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
    # bottom-up row order, BGR channel order, rows padded to 4 bytes —
    # built as one zero-initialized (h, row_size) block and serialized
    # with a single tobytes() (the per-row loop + concat was the
    # encoder's dominant cost in the Arrow generator kernels)
    body = np.zeros((h, row_size), dtype=np.uint8)
    body[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    return header + body.tobytes()


@_codec_boundary
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
    if w <= 0 or h == 0:
        # a negative width would flow into np.frombuffer's count, where
        # count=-1 means "read everything" — reject, don't reinterpret
        raise CodecError(f"invalid BMP dimensions: {w}x{h}")
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


@_codec_boundary
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


@_codec_boundary
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
    # stdlib chunk.Chunk raises BARE RuntimeError on corrupt chunk
    # seeks (chunk.py skip/seek) — found by fuzz, must not leak
    except (wave.Error, RuntimeError) as exc:
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


# ----------------------------------------------------------------- JPEG
# Baseline sequential DCT JPEG (ITU-T T.81), pure numpy.
#
# Decoder: general baseline — DQT/DHT/SOF0/SOS/DRI parsing, interleaved
# or single-component scans, arbitrary sampling factors (4:4:4, 4:2:0,
# ...; chroma upsampled by replication), restart markers, byte
# unstuffing, Huffman + magnitude ("receive/extend") decode, dequant,
# float IDCT, level shift, YCbCr->RGB.
#
# Encoder: grayscale or YCbCr (4:4:4, optional 4:2:0), Annex-K standard
# quantization tables, canonical Huffman tables BUILT FROM the symbols
# actually emitted (and written to DHT — baseline JPEG carries its
# tables, so fixed Annex-K Huffman transcriptions are unnecessary).
#
# The flat-block arithmetic is closed-form (DC = 8*(v-128), AC = 0), so
# solid-color assets decode to an exactly predictable constant — the
# hook the SQL oracle uses to bit-verify the whole entropy-coded path.

_JPEG_QT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], np.int32)

_JPEG_QT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], np.int32)


def _zigzag() -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    for s in range(15):
        pts = [(y, s - y) for y in range(s + 1) if y < 8 and s - y < 8]
        if s % 2 == 0:
            pts = pts[::-1]
        out.extend(pts)
    return out


_ZZ = _zigzag()  # zigzag index -> (row, col)
_ZZ_R = np.array([r for r, _ in _ZZ])
_ZZ_C = np.array([c for _, c in _ZZ])

# T.81 DCT basis: A[0,x] = 1/(2*sqrt(2)), A[u,x] = cos((2x+1)u*pi/16)/2.
# Forward F = A @ f @ A.T (flat block v -> DC 8v, AC 0); inverse
# f = A.T @ F @ A.
_DCT_A = np.array([
    [
        (1 / (2 * np.sqrt(2))) if u == 0
        else 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
], np.float64)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, bits: int, n: int) -> None:
        self._acc = (self._acc << n) | (bits & ((1 << n) - 1))
        self._n += n
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category, appended bits)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _build_huffman(symbols: set[int]) -> tuple[list[int], list[int], dict]:
    """Canonical all-one-length Huffman over the used symbols -> (BITS
    table of 16 counts, ordered values, symbol -> (code, length)). One
    shared length keeps the all-ones codeword unused (T.81 requires it
    reserved) as long as count < 2^L."""
    vals = sorted(symbols) if symbols else [0]
    length = 1
    while (1 << length) <= len(vals):  # need count < 2^L
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(vals)
    codes = {v: (i, length) for i, v in enumerate(vals)}
    return bits, vals, codes


def _encode_plane_blocks(plane: np.ndarray, qt: np.ndarray) -> list[list[tuple[int, int]]]:
    """Pad to 8x8 multiples (edge replication), forward DCT, quantize
    (round half away from zero), zigzag -> per-block coefficient list."""
    h, w = plane.shape
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    padded = np.pad(plane.astype(np.float64) - 128.0,
                    ((0, ph - h), (0, pw - w)), mode="edge")
    # all blocks in one einsum: (nby, 8, nbx, 8) -> (nb, 8, 8) batch DCT
    f = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    f = f.reshape(-1, 8, 8)
    coef = np.einsum("ux,bxy,vy->buv", _DCT_A, f, _DCT_A)
    # snap the ~1e-13 float-product error so integer-valued
    # coefficients (flat blocks: DC = 8v, AC = 0) quantize on the exact
    # closed form the SQL oracle recomputes
    coef = np.round(coef, 6)
    q = (np.sign(coef) * np.floor(np.abs(coef) / qt + 0.5)).astype(np.int64)
    zz = q[:, _ZZ_R, _ZZ_C]  # (nb, 64) in zigzag order
    return [row.tolist() for row in zz]


def _block_symbols(blocks, dc_pred: int):
    """-> (per-block encoded token lists, dc symbols used, ac symbols
    used, final dc predictor). Tokens are (symbol, extra_bits, nbits)."""
    dc_syms: set[int] = set()
    ac_syms: set[int] = set()
    toks_per_block = []
    for zz in blocks:
        toks = []
        diff = zz[0] - dc_pred
        dc_pred = zz[0]
        s, extra = _magnitude(diff)
        dc_syms.add(s)
        toks.append(("dc", s, extra, s))
        run = 0
        last_nz = 0
        for k in range(63, 0, -1):
            if zz[k] != 0:
                last_nz = k
                break
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                ac_syms.add(0xF0)
                toks.append(("ac", 0xF0, 0, 0))
                run -= 16
            s, extra = _magnitude(zz[k])
            sym = (run << 4) | s
            ac_syms.add(sym)
            toks.append(("ac", sym, extra, s))
            run = 0
        if last_nz < 63:
            ac_syms.add(0x00)
            toks.append(("ac", 0x00, 0, 0))
        toks_per_block.append(toks)
    return toks_per_block, dc_syms, ac_syms, dc_pred


def encode_jpeg(pixels: np.ndarray, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(H, W, 1|3) uint8 -> baseline JPEG. 3-channel input is RGB,
    converted to YCbCr; `subsample=True` writes 4:2:0 chroma."""
    h, w, nc = pixels.shape
    if nc not in (1, 3):
        raise CodecError("encode_jpeg expects gray or RGB")
    if nc == 1:
        planes = [pixels[:, :, 0].astype(np.float64)]
    else:
        r = pixels[:, :, 0].astype(np.float64)
        g = pixels[:, :, 1].astype(np.float64)
        b = pixels[:, :, 2].astype(np.float64)
        y = np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
        cb = np.floor(128 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5)
        cr = np.floor(128 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5)
        planes = [np.clip(p, 0, 255) for p in (y, cb, cr)]
    samp = [(1, 1)] * len(planes)
    if nc == 3 and subsample:
        samp = [(2, 2), (1, 1), (1, 1)]
        for i in (1, 2):
            p = planes[i]
            ph, pw = (p.shape[0] + 1) & ~1, (p.shape[1] + 1) & ~1
            p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                       mode="edge")
            planes[i] = np.floor(
                (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])
                / 4.0 + 0.5
            )
    qts = [_JPEG_QT_LUMA] + [_JPEG_QT_CHROMA] * (len(planes) - 1)

    # per-component blocks in MCU-interleaved order
    hmax = max(sx for sx, _ in samp)
    vmax = max(sy for _, sy in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    comp_blocks = []
    for ci, plane in enumerate(planes):
        sx, sy = samp[ci]
        bw, bh = mcux * sx, mcuy * sy
        ph, pw = bh * 8, bw * 8
        p = np.pad(plane, ((0, max(0, ph - plane.shape[0])),
                           (0, max(0, pw - plane.shape[1]))), mode="edge")
        blocks = _encode_plane_blocks(p[:ph, :pw], qts[ci])
        comp_blocks.append((blocks, bw))

    # token streams per component (DC predictors reset at restarts)
    n_mcus = mcux * mcuy
    mcu_tokens: list[list[tuple]] = [[] for _ in range(n_mcus)]
    dc_syms = [set(), set()]
    ac_syms = [set(), set()]
    dc_pred = [0] * len(planes)
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            dc_pred = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci, (blocks, bw) in enumerate(comp_blocks):
            sx, sy = samp[ci]
            cls = 0 if ci == 0 else 1
            for byy in range(sy):
                for bxx in range(sx):
                    bi = (my * sy + byy) * bw + (mx * sx + bxx)
                    toks, dsy, asy, dc_pred[ci] = _block_symbols(
                        [blocks[bi]], dc_pred[ci]
                    )
                    dc_syms[cls] |= dsy
                    ac_syms[cls] |= asy
                    mcu_tokens[m].append((cls, toks[0]))

    n_tables = 1 if len(planes) == 1 else 2
    dc_tabs = [_build_huffman(dc_syms[i]) for i in range(n_tables)]
    ac_tabs = [_build_huffman(ac_syms[i]) for i in range(n_tables)]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)  # APP0, no thumbnail
    for ti in range(n_tables):
        zzq = bytes(int(qts[ti][r, c]) for r, c in _ZZ)
        out += b"\xff\xdb" + struct.pack(">HB", 67, ti) + zzq
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(planes), 8, h, w,
                                     len(planes))
    for ci in range(len(planes)):
        sx, sy = samp[ci]
        out += struct.pack("BBB", ci + 1, (sx << 4) | sy, min(ci, 1))
    for cls, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for ti, (bits, vals, _) in enumerate(tabs):
            out += b"\xff\xc4" + struct.pack(
                ">HB", 19 + len(vals), (cls << 4) | ti
            ) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(planes), len(planes))
    for ci in range(len(planes)):
        ti = min(ci, 1)
        out += struct.pack("BB", ci + 1, (ti << 4) | ti)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    bw_ = _BitWriter()
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            bw_.flush()
            out += bw_.out
            bw_.out = bytearray()
            out += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
        for cls, toks in mcu_tokens[m]:
            for kind, sym, extra, nbits in toks:
                _, _, codes = (dc_tabs if kind == "dc" else ac_tabs)[cls]
                code, ln = codes[sym]
                bw_.put(code, ln)
                if nbits:
                    bw_.put(extra, nbits)
    bw_.flush()
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-coded segment reader: byte unstuffing (FF00 -> FF),
    RSTn awareness (consumed by the caller via `restart()`)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise CodecError("truncated JPEG scan")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                # a real marker: the scan is over; feed 1-bits (padding)
                self._acc = (self._acc << 8) | 0xFF
                self._n += 8
                return
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume an RSTn marker at a byte boundary."""
        self._acc = 0
        self._n = 0
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and \
                0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise CodecError("missing restart marker")


def _huff_decode(br: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise CodecError("bad Huffman code")


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline JPEG -> (w, h, (H, W, C) uint8); C = 1 gray, 3 RGB.

    Malformed input raises CodecError — low-level struct/index/key
    errors from a corrupt container are mapped at this boundary, like
    the other decoders (fuzz-pinned in test_pipeline.py)."""
    return _codec_boundary(_decode_jpeg)(data)


def _decode_jpeg(data: bytes) -> tuple[int, int, np.ndarray]:
    if data[:3] != b"\xff\xd8\xff":
        raise CodecError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise CodecError("bad marker segment")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", data, pos + 2)[0]
        seg = data[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise CodecError("16-bit quant tables unsupported")
                t = np.zeros((8, 8), np.int32)
                for k, (r, c) in enumerate(_ZZ):
                    t[r, c] = seg[i + 1 + k]
                qt[tq] = t
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = seg[i + 1:i + 17]
                vals = seg[i + 17:i + 17 + sum(bits)]
                table: dict[tuple[int, int], int] = {}
                code = 0
                vi = 0
                for ln in range(1, 17):
                    for _ in range(bits[ln - 1]):
                        table[(ln, code)] = vals[vi]
                        code += 1
                        vi += 1
                    code <<= 1
                huff[(tc, th)] = table
                i += 17 + len(vals)
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            _prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if fw == 0 or fh == 0:
                # T.81 B.2.2: Y may be 0 only with a DNL marker, which
                # baseline profiles don't carry — reject at the boundary
                raise CodecError("SOF with zero frame dimensions")
            comps = []
            for ci in range(nc):
                cid, hv, tq_ = struct.unpack_from("BBB", seg, 6 + 3 * ci)
                h, v = hv >> 4, hv & 0xF
                # T.81 B.2.2: sampling factors are 1..4. A zero factor
                # reached the scan decoder's MCU-grid division and the
                # ZeroDivisionError escaped the CodecError boundary —
                # a job-aborting poison pill on hostile bytes (found by
                # the r7 fresh-seed fuzz rerun)
                if not (1 <= h <= 4 and 1 <= v <= 4):
                    raise CodecError(
                        f"SOF sampling factors out of range: {h}x{v}"
                    )
                comps.append({"id": cid, "h": h, "v": v, "tq": tq_})
            frame = {"w": fw, "h": fh, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise CodecError("only baseline JPEG is supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise CodecError("SOS before SOF")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0xF))
            planes = _decode_scan(
                data, pos, frame, scan, qt, huff, restart_interval
            )
            return _finish_jpeg(frame, planes)
        # APPn / COM / anything else: skipped
    raise CodecError("no scan in JPEG")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if len(scan) == 1:
        # non-interleaved: the component's own block grid, one block/MCU
        comp = scan[0][0]
        bw = (frame["w"] * comp["h"] + 8 * hmax - 1) // (8 * hmax)
        bh = (frame["h"] * comp["v"] + 8 * vmax - 1) // (8 * vmax)
        grids = {comp["id"]: (bw, bh)}
        mcux, mcuy = bw, bh
        per_mcu = [(scan[0], 1, 1)]
    else:
        mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
        mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
        grids = {
            s[0]["id"]: (mcux * s[0]["h"], mcuy * s[0]["v"]) for s in scan
        }
        per_mcu = [(s, s[0]["h"], s[0]["v"]) for s in scan]
    br = _BitReader(data, pos)
    dc_pred = {s[0]["id"]: 0 for s in scan}
    # entropy decode is inherently sequential; the numeric tail
    # (dequant + IDCT) is batched per plane below
    blocks: dict[int, list] = {s[0]["id"]: [] for s in scan}
    positions: dict[int, list] = {s[0]["id"]: [] for s in scan}
    qzz = {s[0]["id"]: qt[s[0]["tq"]][_ZZ_R, _ZZ_C].astype(np.float64)
           for s in scan}
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            br.restart()
            dc_pred = {k: 0 for k in dc_pred}
        my, mx = divmod(m, mcux)
        for (comp, tdc, tac), sh, sv in per_mcu:
            cid = comp["id"]
            for byy in range(sv):
                for bxx in range(sh):
                    zz = [0] * 64
                    s = _huff_decode(br, huff[(0, tdc)])
                    diff = _extend(br.bits(s), s)
                    dc_pred[cid] += diff
                    zz[0] = dc_pred[cid]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(br, huff[(1, tac)])
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise CodecError("AC run past block end")
                        zz[k] = _extend(br.bits(s), s)
                        k += 1
                    blocks[cid].append(zz)
                    positions[cid].append(
                        ((my * sv + byy) * 8, (mx * sh + bxx) * 8)
                    )
    planes = {}
    for cid, (bw, bh) in grids.items():
        plane = np.zeros((bh * 8, bw * 8), np.float64)
        if blocks[cid]:
            zzs = np.asarray(blocks[cid], np.float64) * qzz[cid]
            coefs = np.zeros((len(zzs), 8, 8), np.float64)
            coefs[:, _ZZ_R, _ZZ_C] = zzs
            # batched IDCT: f = A.T @ F @ A for every block at once
            spatial = np.einsum("ux,buv,vy->bxy", _DCT_A, coefs, _DCT_A)
            for (by0, bx0), blk in zip(positions[cid], spatial):
                plane[by0:by0 + 8, bx0:bx0 + 8] = blk
        planes[cid] = plane
    return planes


def _finish_jpeg(frame, planes):
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out_planes = []
    for c in comps:
        p = planes[c["id"]] + 128.0
        # upsample by replication to the full-resolution grid, then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        gray = np.clip(np.floor(out_planes[0] + 0.5), 0, 255)
        return w, h, gray.astype(np.uint8)[:, :, None]
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return w, h, np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


# ---------------------------------------------------------- GVID video

#: Minimal frame-sequence video container ("GVID"): magic + uint16
#: frame count, then per frame a uint32 length-prefixed still-image
#: payload (any format decode_* above understands — BMP/PNG/JPEG). A
#: deliberately simple but REAL container: parsing validates lengths
#: and rejects truncation, and every frame goes through the real image
#: codecs, so the video path exercises genuine decode work end-to-end.
#: Real-world containers (MP4/MKV) would need ffmpeg — absent here, the
#: multimodal charter says to keep the Spark-side plumbing real and the
#: codec swappable; swapping decode_gvid for an ffmpeg demux is a
#: one-function change.
GVID_MAGIC = b"GVID"


def encode_gvid(frames: list[bytes]) -> bytes:
    """Pack still-image payloads into a GVID container (uint16 frame
    count => at most 65535 frames)."""
    if len(frames) > 0xFFFF:
        raise CodecError(f"too many frames: {len(frames)}")
    parts = [GVID_MAGIC, struct.pack("<H", len(frames))]
    for p in frames:
        parts.append(struct.pack("<I", len(p)))
        parts.append(bytes(p))
    return b"".join(parts)


@_codec_boundary
def decode_gvid(data: bytes) -> list[bytes]:
    """Unpack a GVID container into its frame payloads. Truncated or
    oversized containers raise CodecError (via _codec_boundary for the
    struct errors, explicitly for length mismatches)."""
    if data[:4] != GVID_MAGIC:
        raise CodecError("not a GVID container")
    (n_frames,) = struct.unpack_from("<H", data, 4)
    frames: list[bytes] = []
    pos = 6
    for _ in range(n_frames):
        (length,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if pos + length > len(data):
            raise CodecError("truncated frame payload")
        frames.append(data[pos:pos + length])
        pos += length
    if pos != len(data):
        raise CodecError("trailing bytes after last frame")
    return frames

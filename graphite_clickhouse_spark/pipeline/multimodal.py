"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata, processed in Arrow batches via mapInPandas.

Decode is REAL for the formats the stdlib + numpy can handle — BMP,
8-bit PNG, baseline JPEG, PCM WAV (pipeline/codecs.py) — dispatched by
magic bytes. Anything else (progressive JPEG, video containers, ...)
falls back to the clearly-marked deterministic fake so the plumbing —
schemas, batch iteration, partition sizing, UDF signatures — stays
exercised either way. Swapping the fallback for PIL/ffmpeg is a
one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of a multimodal asset table: payload + typed metadata
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

#: feature is double-precision: audio stats (exact sums / sample counts)
#: must survive the oracle comparison bit-exactly; float32 would round
FEATURE_SCHEMA = (
    "asset_id long, modality string, n_bytes int, sha_prefix string, "
    "width int, height int, feature array<double>"
)


#: attribute carrying (ids_frame, generator_kernel) on synthetic asset
#: frames, enabling generator+consumer kernel fusion (see _map_assets)
_GEN_ATTR = "_graft_asset_gen"


def _tagged_assets(ids: DataFrame, kernel) -> DataFrame:
    """mapInPandas the asset-generator ``kernel`` over ``ids`` and TAG the
    result with (ids, kernel) so downstream Arrow consumers can fuse with
    it (guide §4: every JVM<->Python crossing of the heavy payload column
    costs a full Arrow serialize + transpose both ways)."""
    out = ids.mapInPandas(kernel, ASSET_SCHEMA)
    setattr(out, _GEN_ATTR, (ids, kernel))
    return out


def _map_assets(assets: DataFrame, kernel, schema: str) -> DataFrame:
    """assets.mapInPandas(kernel, schema), FUSING with the synthetic
    generator when ``assets`` came straight from one of the
    synthetic_*_assets builders in this module.

    Unfused, the composition ``generator.mapInPandas -> consumer
    .mapInPandas`` ships every payload Python -> JVM -> Python between
    the two nodes: at the 100x documents ladder that is ~5 GB of frame
    bytes crossing Arrow twice for nothing (measured: the video hash
    stage drops 20-28 s -> 9-11 s fused). Fusion is plain function
    composition of the two iterator kernels — the consumer sees the
    generator's yielded batches directly, the same values it would have
    received after a lossless Arrow round trip — so results are
    bit-identical. The tag dies on any intervening transformation
    (filters, selects return new DataFrame objects), in which case this
    degrades to the plain two-node plan."""
    gen = getattr(assets, _GEN_ATTR, None)
    if gen is None:
        return assets.mapInPandas(kernel, schema)
    ids, gen_kernel = gen

    def fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from kernel(gen_kernel(batches))

    return ids.mapInPandas(fused, schema)


def _spread_ids(ids: DataFrame, id_col: str) -> DataFrame:
    """Project to the id column and spread it over the session's cores.

    The synthetic asset generators EXPAND tiny id rows into heavy binary
    payloads inside an Arrow kernel; a small id corpus arrives as one
    parquet split, which would serialize all of that CPU-bound encode
    work onto a single core (the same trap tokens_projection documents
    for the text family — dedup.py:232). Repartitioning the *ids* is a
    shuffle of narrow rows (8 bytes each), paid before any payload
    exists; at scale the input file count already provides parallelism
    and the repartition keeps the same partition count. The decode-side
    operators deliberately do NOT repartition: their input rows carry
    the payloads, and shuffling those would move the heavy bytes an
    extra time (guide: decide with small rows, move big rows once)."""
    sc = ids.sparkSession.sparkContext
    parts = max(ids.rdd.getNumPartitions(), sc.defaultParallelism)
    return ids.select(id_col).repartition(parts)


def _decode_image_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """FALLBACK fake for formats with no in-container codec (JPEG &c.):
    dimensions derived from payload length, an 8-dim byte-histogram
    "feature". Raises for empty payloads like a real decoder would.
    """
    if not payload:
        raise ValueError("empty payload")
    width = 16 + len(payload) % 64
    height = 16 + (len(payload) // 64) % 64
    hist = [0.0] * 8
    for b in payload[:4096]:
        hist[b >> 5] += 1.0
    s = sum(hist) or 1.0
    return width, height, [h / s for h in hist]


def _decode_any(modality: str, payload: bytes) -> tuple[int, int, list[float]]:
    """Magic-byte dispatch to the REAL decoders (codecs.py); deterministic
    fake only for unrecognized formats. Returns (width, height, feature);
    audio reports (0, 0, audio_features)."""
    from . import codecs

    try:
        if payload[:2] == b"BM":
            w, h, px = codecs.decode_bmp(payload)
            return w, h, codecs.image_features(px)
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            w, h, px = codecs.decode_png(payload)
            return w, h, codecs.image_features(px)
        if payload[:3] == b"\xff\xd8\xff":
            w, h, px = codecs.decode_jpeg(payload)
            return w, h, codecs.image_features(px)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            rate, samples = codecs.decode_wav(payload)
            return 0, 0, codecs.audio_features(samples, rate)
    except Exception:  # noqa: BLE001 — corrupt container: quarantine to
        # the fake rather than abort the whole batch. Malformed payloads
        # surface zlib.error, struct.error, EOFError and numpy ValueError
        # from inside the decoders, not just CodecError.
        pass
    if modality == "image" and payload:
        return _decode_image_stub(payload)
    return 0, 0, []


def extract_features(assets: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode + featurize binary assets in Arrow batches.

    mapInPandas keeps the binary payloads off the driver and processes
    them partition-locally; at 100 TB this is the only sane shape (the
    alternative — collect-and-loop — is a non-starter).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {
                "asset_id": [],
                "modality": [],
                "n_bytes": [],
                "sha_prefix": [],
                "width": [],
                "height": [],
                "feature": [],
            }
            for aid, modality, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                payload = bytes(payload) if payload is not None else b""
                out["asset_id"].append(aid)
                out["modality"].append(modality)
                out["n_bytes"].append(len(payload))
                out["sha_prefix"].append(hashlib.sha256(payload).hexdigest()[:16])
                w, h, feat = _decode_any(modality, payload)
                out["width"].append(w)
                out["height"].append(h)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return _map_assets(assets, kernel, FEATURE_SCHEMA)


def _pack_bits_signed(bits) -> int:
    """Pack an iterable of 64 booleans little-endian into a SIGNED
    64-bit int (bit 63 -> two's complement) — the shared packing both
    perceptual hashes and their SQL oracle twins implement."""
    val = 0
    for k, b in enumerate(bits):
        if b:
            val |= 1 << k
    return val - (1 << 64) if val >= (1 << 63) else val


def _pack_bits_signed_np(bits) -> int:
    """_pack_bits_signed for a numpy bool array of 64 bits: packbits
    with little bit-order is the same little-endian packing, without
    the 64-iteration Python loop (the hash kernels call this once per
    frame/asset, so the loop was measurable)."""
    import numpy as np

    val = int.from_bytes(
        np.packbits(bits, bitorder="little").tobytes(), "little"
    )
    return val - (1 << 64) if val >= (1 << 63) else val


def _hash_neardup_pairs(hashes: DataFrame, max_hamming: int) -> DataFrame:
    """Shared LSH composition for the perceptual-hash family: filter
    NULL hashes, band via dedup.simhash_near_pairs (4 x 16-bit Hamming
    chunks), emit (id_a, id_b, hamming int). simhash_near_pairs
    materializes the hash frame before its self-join, so the decode+hash
    pipeline runs ONCE; the lifecycle handle is carried through the
    final projection so callers can release the cache."""
    from .dedup import simhash_near_pairs
    from .lifecycle import carry_intermediates

    pairs = simhash_near_pairs(
        hashes.filter(F.col("dhash").isNotNull()).select(
            F.col("asset_id").alias("id"), F.col("dhash").alias("simhash")
        ),
        max_hamming=max_hamming,
    )
    out = pairs.select("id_a", "id_b",
                       F.col("hamming").cast("int").alias("hamming"))
    return carry_intermediates(pairs, out)


def _decode_pixels(payload: bytes):
    """Magic-byte dispatch to the real image decoders, returning the raw
    pixel array (h, w, channels) — or None for non-images / corrupt
    payloads (quarantine, like _decode_any)."""
    from . import codecs

    try:
        if payload[:2] == b"BM":
            return codecs.decode_bmp(payload)[2]
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return codecs.decode_png(payload)[2]
        if payload[:3] == b"\xff\xd8\xff":
            return codecs.decode_jpeg(payload)[2]
    except Exception:  # noqa: BLE001 — corrupt container: skip, don't abort
        return None
    return None


def _dhash_from_pixels(px) -> int | None:
    """64-bit gradient dHash with EXACT integer arithmetic (the device
    that makes a float-free SQL oracle twin possible):

    - grayscale = per-pixel integer channel sum (any monotone scale of
      the luma works: the hash only compares sums, and the comparisons
      below are scale-invariant);
    - area-mean resize to a 9x8 grid via integer box partition
      (edges x_i = i*W//9, y_j = j*H//8 — every pixel in exactly one
      box);
    - bit(j, i) = mean(box[j,i]) > mean(box[j,i+1]), evaluated as the
      integer cross-multiplication S_l*A_r > S_r*A_l — no division, no
      floats, so Spark and the oracle agree bit-for-bit;
    - 64 bits packed little-endian (k = j*8 + i) into a signed long.

    Constant brightness shifts cancel in the cross-multiplication, so
    the hash has the brightness invariance expected of a perceptual
    hash. Images smaller than the grid (W < 9 or H < 8) return None.
    """
    import numpy as np

    gray = (
        px.astype(np.int64).sum(axis=2) if px.ndim == 3 else px.astype(np.int64)
    )
    h, w = gray.shape
    if w < 9 or h < 8:
        return None
    xs = (np.arange(10, dtype=np.int64) * w) // 9
    ys = (np.arange(9, dtype=np.int64) * h) // 8
    # np.add.reduceat over the left edges computes exactly the box
    # partition sums (edges are strictly increasing for w >= 9, h >= 8,
    # and the last segment runs to the array end = xs[9]/ys[8]); this
    # replaces a 72-iteration Python slice-and-sum loop that dominated
    # the per-frame hash cost. Integer adds are associative, so the
    # sums are bit-identical to the loop's.
    s = np.add.reduceat(np.add.reduceat(gray, ys[:8], axis=0), xs[:9], axis=1)
    area = np.diff(ys)[:, None] * np.diff(xs)[None, :]
    bits = (s[:, :8] * area[:, 1:]) > (s[:, 1:] * area[:, :8])
    return _pack_bits_signed_np(bits.reshape(-1))


def image_dhash(assets: DataFrame) -> DataFrame:
    """Perceptual hash per image asset: decode (real BMP/PNG/JPEG
    codecs) + 9x8 gradient dHash, in the same mapInPandas Arrow-batch
    kernel shape as extract_features — payloads never touch the driver.

    -> (asset_id long, dhash long); dhash is NULL for non-image /
    corrupt / sub-grid payloads."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                px = _decode_pixels(payload)
                ids.append(aid)
                hashes.append(None if px is None else _dhash_from_pixels(px))
            yield pd.DataFrame(
                {"asset_id": ids,
                 "dhash": pd.array(hashes, dtype=pd.Int64Dtype())}
            )

    return _map_assets(assets, kernel, "asset_id long, dhash long")


def _audio_dhash_from_samples(samples) -> int | None:
    """64-bit energy-envelope dHash for audio — the image dHash's
    one-dimensional sibling, with the same exact-integer portability:

    - envelope: integer |sample| sums over a 65-box partition of the
      stream (edges j*n//65 — every sample in exactly one box);
    - bit j = mean|box j| > mean|box j+1|, as the integer
      cross-multiplication S_l*C_r > S_r*C_l (no division, no floats —
      invariant to uniform GAIN, the audio analog of brightness);
    - 64 bits packed little-endian into a signed long.

    Unlike the image hash this is NOT offset-invariant (abs() breaks
    shift symmetry) — a DC-offset re-encode moves a few bits, which is
    the near-dup behavior wanted. Streams shorter than 65 samples
    return None."""
    import numpy as np

    s = np.abs(np.asarray(samples, dtype=np.int64))
    n = s.shape[0]
    if n < 65:
        return None
    edges = (np.arange(66, dtype=np.int64) * n) // 65
    # reduceat over the left edges = the 65 box sums (edges strictly
    # increasing for n >= 65; last segment runs to the end = edges[65]);
    # replaces the 65-iteration Python slice-and-sum loop bit-identically
    sums = np.add.reduceat(s, edges[:65])
    cnts = np.diff(edges)
    bits = (sums[:64] * cnts[1:]) > (sums[1:] * cnts[:64])
    return _pack_bits_signed_np(bits)


def audio_dhash(assets: DataFrame) -> DataFrame:
    """Perceptual hash per audio asset: real PCM WAV decode + 65-box
    energy-envelope dHash, Arrow-batched like image_dhash.

    -> (asset_id long, dhash long); NULL for non-WAV / corrupt /
    sub-65-sample payloads."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs

        for pdf in batches:
            ids, hashes = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                h = None
                if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                    try:
                        _rate, samples = codecs.decode_wav(payload)
                        h = _audio_dhash_from_samples(samples)
                    except Exception:  # noqa: BLE001 — corrupt: skip
                        h = None
                ids.append(aid)
                hashes.append(h)
            yield pd.DataFrame(
                {"asset_id": ids,
                 "dhash": pd.array(hashes, dtype=pd.Int64Dtype())}
            )

    return _map_assets(assets, kernel, "asset_id long, dhash long")


def audio_neardup_pairs(assets: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Audio near-duplicate pairs — same banded Hamming-LSH composition
    as image_neardup_pairs (4 x 16-bit chunks over the envelope dHash);
    collapses the same clip re-encoded / gain-scaled / lightly retouched.
    100 TB shape identical to the image path: one Arrow decode pass,
    chunk-bucketed self-join, no all-pairs."""
    return _hash_neardup_pairs(audio_dhash(assets), max_hamming)


def synthetic_pattern_wav_assets(
    ids: DataFrame, id_col: str = "doc_id", groups: int = 50,
    rate: int = 8000,
) -> DataFrame:
    """Structured synthetic WAVs for the audio perceptual-hash contract
    (the audio sibling of synthetic_pattern_bmp_assets): ids sharing
    gid = (id * 40503 % 65536) % groups draw the same signal, ids with
    id % 3 == 0 add a +300 bump over the first 10 samples (pre-modulo)
    — zero-to-a-few envelope bits depending on the signal (many bumped
    copies hash identically: hamming-0 pairs), the re-encode/retouch
    analog.
    s[i] = ((1 + gid%7)*i*i + (1 + gid%11)*i + 17*gid) % 4096 - 2048,
    n = 520 + (gid % 23) * 8 samples. The quadratic term wraps mod 4096
    many times at every n (a monotone ramp would hash whole groups to a
    degenerate constant — the image-lesson), and abs() breaks shift
    symmetry so even the 17*gid offset differentiates groups. Every
    quantity is integer arithmetic an SQL oracle reproduces without
    decoding."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from graphite_clickhouse_spark.pipeline import codecs

        for pdf in batches:
            out = {"asset_id": [], "modality": [], "mime": [], "payload": [],
                   "meta": []}
            for i in pdf[id_col]:
                i = int(i)
                gid = (i * 40503 % 65536) % groups
                n = 520 + (gid % 23) * 8
                idx = np.arange(n, dtype=np.int64)
                s = (1 + gid % 7) * idx * idx + (1 + gid % 11) * idx + 17 * gid
                if i % 3 == 0:
                    s[:10] += 300
                samples = (s % 4096 - 2048).astype(np.int16)
                out["asset_id"].append(i)
                out["modality"].append("audio")
                out["mime"].append("audio/wav")
                out["payload"].append(codecs.encode_wav(samples, rate))
                out["meta"].append({})
            yield pd.DataFrame(out)

    return _tagged_assets(_spread_ids(ids, id_col), kernel)


def image_neardup_pairs(assets: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Image-level near-duplicate pairs — the multimodal analog of
    url_dedup's same-page collapse: the same image re-encoded, slightly
    re-compressed, or brightness-shifted lands within a few dHash bits.

    -> (id_a, id_b, hamming int) for bucket-sharing pairs within
    ``max_hamming``.

    100 TB shape: dHash in the decode kernel (one Arrow pass), then the
    SAME banded Hamming-LSH the SimHash text path uses
    (dedup.simhash_near_pairs: 4 x 16-bit chunk buckets, pairs only
    inside buckets — pigeonhole-exact recall for Hamming <= 3, standard
    LSH recall beyond). No all-pairs anywhere; bucket skew is bounded by
    the duplicate-cluster size like every LSH family here."""
    return _hash_neardup_pairs(image_dhash(assets), max_hamming)


def synthetic_pattern_bmp_assets(
    ids: DataFrame, id_col: str = "doc_id", groups: int = 50
) -> DataFrame:
    """Structured synthetic BMPs for the perceptual-hash contract: ids
    sharing gid = (id * 40503 % 65536) % groups draw the SAME
    deterministic gradient pattern and dimensions (near-dup clusters by
    construction), and ids with ``id % 3 == 0`` add a small bright
    corner bump (+40 over the 3x3 top-left corner, pre-modulo) — a few
    dHash bits of distance, the re-encode/retouch analog. Pixel
    p(x, y) = ((1 + gid%11)*x*x + (1 + gid%13)*y*y + 31*gid
    [+ 40 if bump and x<3 and y<3]) % 256, W = 24 + gid%29,
    H = 16 + gid%17, gray as equal RGB channels. Every quantity is
    integer arithmetic an SQL oracle reproduces without decoding.

    Why this shape: dHash is brightness-invariant, so groups differing
    only in the constant 31*gid term collapse into one cluster — the
    dims and curvature coefficients vary per group, and the (29, 17,
    11, 13) moduli are pairwise-coprime primes with product > 65536, so
    by CRT every gid in the mix space has a UNIQUE signature. The
    QUADRATIC terms matter too: a linear gradient that never wraps mod
    256 is monotone along x, every left>right comparison is false, and
    the whole group degenerates to hash 0 (measured: 233 of 5000 docs
    shared hash 0 with linear slopes) — x^2 steps wrap many times at
    every W, so box means oscillate and groups hash apart. Clusters
    then stay ~corpus/groups sized at every ladder rung.

    The multiplicative id mix (Fibonacci-hash style, 16-bit space)
    exists for the scaling ladders: replica corpora offset doc_id by
    k * 1e9, and a bare ``id % groups`` would map every replica of a
    document into ITS OWN group (1e9 ≡ 0 mod the usual group counts) —
    cluster sizes, and therefore pair volume, would grow quadratically
    by construction. The mix scatters replicas across groups, so a
    caller scaling ``groups`` with corpus size keeps cluster sizes (and
    the operator's output) linear. Group count saturates at the 65536
    mix space."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from graphite_clickhouse_spark.pipeline import codecs

        for pdf in batches:
            out = {"asset_id": [], "modality": [], "mime": [], "payload": [],
                   "meta": []}
            for i in pdf[id_col]:
                i = int(i)
                gid = (i * 40503 % 65536) % groups
                w, h = 24 + gid % 29, 16 + gid % 17
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                p = (1 + gid % 11) * x * x + (1 + gid % 13) * y * y + 31 * gid
                if i % 3 == 0:
                    p[:3, :3] += 40
                gray = (p % 256).astype(np.uint8)
                px = np.repeat(gray[:, :, None], 3, axis=2)
                out["asset_id"].append(i)
                out["modality"].append("image")
                out["mime"].append("image/bmp")
                out["payload"].append(codecs.encode_bmp(px))
                out["meta"].append({})
            yield pd.DataFrame(out)

    return _tagged_assets(_spread_ids(ids, id_col), kernel)


def frame_sample_plan(assets: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to extract.

    The decode is stubbed; the plumbing (explode of a frame index computed
    from metadata, partition-friendly) is the real operator shape.
    """
    n_frames = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(0)
    )
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return (
        assets.filter(F.col("modality") == "video")
        .select("asset_id", F.explode(idx).alias("frame_idx"))
    )


def _video_dhash_from_frames(frames, every_n: int) -> int | None:
    """64-bit perceptual signature for a frame sequence: sample every
    ``every_n``-th frame (same index arithmetic as frame_sample_plan),
    dHash each sampled frame through the real image decoders, then
    MAJORITY-fold the per-frame hashes bit-wise — bit k of the video
    signature is set iff strictly more than half of the sampled frames
    set bit k (2*count > n, so even-count ties clear the bit,
    deterministically).

    The majority fold is the temporal analog of SimHash's coordinate
    vote: a re-encode that perturbs a few bits in a few frames moves
    the signature by at most those bits, and an edit to one frame out
    of many moves it not at all — exactly the tolerance wanted for
    same-video-re-encoded collapse. Frames that fail to decode are
    skipped (quarantine, like _decode_pixels); no decodable sampled
    frame => None."""
    hashes = []
    for f in range(0, len(frames), every_n):
        px = _decode_pixels(frames[f])
        if px is None:
            continue
        h = _dhash_from_pixels(px)
        if h is not None:
            hashes.append(h & 0xFFFFFFFFFFFFFFFF)
    if not hashes:
        return None
    import numpy as np

    # per-bit counts across frames in one vectorized pass (the pure-
    # Python 64 x n_frames generator-sum was ~60 us per video); exact
    # integer compare, so the vote is bit-identical to the loop's
    u = np.array(hashes, dtype=np.uint64)
    counts = (
        (u[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
        & np.uint64(1)
    ).sum(axis=0)
    bits = 2 * counts > len(hashes)
    return _pack_bits_signed_np(bits)


def video_dhash(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """Perceptual hash per video asset: parse the GVID container
    (codecs.decode_gvid — real length-validated demux), frame-sample,
    decode each sampled frame with the REAL image codecs, majority-fold
    the per-frame dHashes. Arrow-batched like image_dhash; payloads
    never touch the driver.

    -> (asset_id long, dhash long); NULL for non-GVID / corrupt /
    no-decodable-frame payloads."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs

        for pdf in batches:
            ids, hashes = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                h = None
                if payload[:4] == codecs.GVID_MAGIC:
                    try:
                        frames = codecs.decode_gvid(payload)
                        h = _video_dhash_from_frames(frames, every_n)
                    except Exception:  # noqa: BLE001 — corrupt: skip
                        h = None
                ids.append(aid)
                hashes.append(h)
            yield pd.DataFrame(
                {"asset_id": ids,
                 "dhash": pd.array(hashes, dtype=pd.Int64Dtype())}
            )

    return _map_assets(assets, kernel, "asset_id long, dhash long")


def video_neardup_pairs(
    assets: DataFrame, max_hamming: int = 6, every_n: int = 2
) -> DataFrame:
    """Video near-duplicate pairs — the frame-sequence member of the
    perceptual-hash family (image_neardup_pairs / audio_neardup_pairs):
    demux + frame-sample + per-frame dHash + temporal majority fold in
    ONE Arrow decode pass, then the same banded 4x16-bit Hamming-LSH.
    Collapses the same video re-encoded / lightly retouched / with a
    minority of frames edited. 100 TB shape identical to the image
    path: decode work scales with sampled frames only (every_n prunes
    the rest at the demux, before any pixel work), one hash per asset
    enters the chunk-bucketed self-join, no all-pairs anywhere."""
    return _hash_neardup_pairs(video_dhash(assets, every_n), max_hamming)


def synthetic_pattern_video_assets(
    ids: DataFrame, id_col: str = "doc_id", groups: int = 50
) -> DataFrame:
    """Structured synthetic GVID videos for the video perceptual-hash
    contract (the frame-sequence sibling of
    synthetic_pattern_bmp_assets): ids sharing gid = (id * 40503 %
    65536) % groups draw the SAME frame sequence — n_frames = 6 +
    gid%5 frames of W = 24 + gid%29 by H = 16 + gid%17 gray BMPs with
    frame-dependent quadratic curvature p(x, y, f) = ((1 + (gid+f)%11)
    * x*x + (1 + (gid+2f)%13) * y*y + 31*gid) % 256 — and ids with
    id % 3 == 0 add the +40 3x3 corner bump (pre-modulo) to EVERY
    frame, so the bump survives the majority fold as a few-bit
    signature distance (a bump on a minority of frames would vanish —
    that tolerance is tested separately, not part of the contract
    recipe). Frame-dependent CURVATURE (not a constant frame offset:
    dHash's brightness invariance would collapse that) keeps sampled
    frames' hashes distinct, so the fold is a real vote. Same CRT
    (29, 17, 11, 13 coprime) uniqueness and multiplicative id-mix
    rationale as the image recipe; every quantity is integer
    arithmetic an SQL oracle reproduces without decoding. meta carries
    n_frames, so frame_sample_plan composes with this corpus too."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from graphite_clickhouse_spark.pipeline import codecs

        for pdf in batches:
            out = {"asset_id": [], "modality": [], "mime": [], "payload": [],
                   "meta": []}
            for i in pdf[id_col]:
                i = int(i)
                gid = (i * 40503 % 65536) % groups
                nf = 6 + gid % 5
                w, h = 24 + gid % 29, 16 + gid % 17
                # all nf frames in one vectorized expression (frame axis
                # first) — same integer arithmetic per frame as the
                # scalar loop, just batched
                f = np.arange(nf, dtype=np.int64)[:, None, None]
                x = np.arange(w, dtype=np.int64)[None, None, :]
                y = np.arange(h, dtype=np.int64)[None, :, None]
                p = ((1 + (gid + f) % 11) * x * x
                     + (1 + (gid + 2 * f) % 13) * y * y + 31 * gid)
                if i % 3 == 0:
                    p[:, :3, :3] += 40
                gray = (p % 256).astype(np.uint8)
                frames = [
                    codecs.encode_bmp(np.repeat(g[:, :, None], 3, axis=2))
                    for g in gray
                ]
                out["asset_id"].append(i)
                out["modality"].append("video")
                out["mime"].append("video/x-gvid")
                out["payload"].append(codecs.encode_gvid(frames))
                out["meta"].append({"n_frames": str(nf)})
            yield pd.DataFrame(out)

    return _tagged_assets(_spread_ids(ids, id_col), kernel)


def synthetic_bmp_assets(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One solid-color BMP per id: width = 16 + id%32, height = 8 + id%16,
    RGB = (id%256, 3*id%256, 7*id%256). Deterministic by construction so
    an SQL oracle can verify the DECODED dimensions and channel means —
    i.e. the real decode path end-to-end. Encoded in the same Arrow-batch
    kernel shape the decode uses."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from graphite_clickhouse_spark.pipeline import codecs

        for pdf in batches:
            out = {"asset_id": [], "modality": [], "mime": [], "payload": [],
                   "meta": []}
            for i in pdf[id_col]:
                i = int(i)
                w, h = 16 + i % 32, 8 + i % 16
                px = np.zeros((h, w, 3), np.uint8)
                px[:] = (i % 256, (3 * i) % 256, (7 * i) % 256)
                out["asset_id"].append(i)
                out["modality"].append("image")
                out["mime"].append("image/bmp")
                out["payload"].append(codecs.encode_bmp(px))
                out["meta"].append({})
            yield pd.DataFrame(out)

    return _tagged_assets(_spread_ids(ids, id_col), kernel)


def synthetic_jpeg_assets(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One flat grayscale baseline JPEG per id: width = 9 + id%25,
    height = 7 + id%18 (deliberately not multiples of 8 — exercises edge
    padding), gray = (5*id)%256. A flat block quantizes to DC-only with
    an exactly predictable constant — decoded gray = clip(128 +
    2*round_half_away((c-128)/2)) at q00=16 — so an SQL oracle verifies
    the full Huffman/dequant/IDCT path bit-for-bit."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from graphite_clickhouse_spark.pipeline import codecs

        for pdf in batches:
            out = {"asset_id": [], "modality": [], "mime": [], "payload": [],
                   "meta": []}
            for i in pdf[id_col]:
                i = int(i)
                w, h = 9 + i % 25, 7 + i % 18
                px = np.full((h, w, 1), (5 * i) % 256, np.uint8)
                out["asset_id"].append(i)
                out["modality"].append("image")
                out["mime"].append("image/jpeg")
                out["payload"].append(codecs.encode_jpeg(px))
                out["meta"].append({})
            yield pd.DataFrame(out)

    return _tagged_assets(_spread_ids(ids, id_col), kernel)


def synthetic_wav_assets(
    ids: DataFrame, id_col: str = "doc_id", n_samples: int = 2000,
    rate: int = 8000,
) -> DataFrame:
    """One PCM WAV per id: a ramp signal s[i] = (i * k) % 2048 - 1024 with
    k = id%7 + 1 — every sample value is SQL-computable, so the oracle
    verifies the real WAV decode (sample count, rate, min/max/mean)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from graphite_clickhouse_spark.pipeline import codecs

        idx = np.arange(n_samples, dtype=np.int64)
        for pdf in batches:
            out = {"asset_id": [], "modality": [], "mime": [], "payload": [],
                   "meta": []}
            for i in pdf[id_col]:
                i = int(i)
                samples = ((idx * (i % 7 + 1)) % 2048 - 1024).astype(np.int16)
                out["asset_id"].append(i)
                out["modality"].append("audio")
                out["mime"].append("audio/wav")
                out["payload"].append(codecs.encode_wav(samples, rate))
                out["meta"].append({})
            yield pd.DataFrame(out)

    return _tagged_assets(_spread_ids(ids, id_col), kernel)


def synthetic_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fake asset table for tests (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        payload = bytes((i * 7 + j) % 256 for j in range(128 + (i % 5) * 64))
        modality = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                modality,
                f"application/x-{modality}",
                payload,
                {"n_frames": "120"} if modality == "video" else {},
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)

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

    return assets.mapInPandas(kernel, FEATURE_SCHEMA)


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

    return ids.select(id_col).mapInPandas(kernel, ASSET_SCHEMA)


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

    return ids.select(id_col).mapInPandas(kernel, ASSET_SCHEMA)


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

    return ids.select(id_col).mapInPandas(kernel, ASSET_SCHEMA)


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

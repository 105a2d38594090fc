"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata, processed in Arrow batches via mapInPandas.

The container has no image/audio codecs, so the decode kernels are STUBS
(deterministic fakes clearly marked); everything Spark-side — schemas,
batch iteration, partition sizing, UDF signatures — is real and tested.
Swapping the stub for PIL/libsndfile is a one-function change.
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

FEATURE_SCHEMA = (
    "asset_id long, modality string, n_bytes int, sha_prefix string, "
    "width int, height int, feature array<float>"
)


def _decode_image_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB decode: real implementation would be PIL/turbojpeg.

    Deterministic fake: dimensions derived from payload length, an 8-dim
    byte-histogram "feature". Raises for empty payloads like a real
    decoder would.
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
                if modality == "image" and payload:
                    w, h, feat = _decode_image_stub(payload)
                else:
                    w, h, feat = 0, 0, []
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

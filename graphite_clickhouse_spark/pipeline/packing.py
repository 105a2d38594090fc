"""Sequence packing for LLM training — the concat-and-chunk step.

Training pipelines concatenate a stream of tokenized documents and slice
the stream into fixed windows of `window_tokens` (2k/4k/8k); documents
cross chunk boundaries unless masked. The operator computes the packing
layout DETERMINISTICALLY from (group, id) order with pure integer math —
cumulative token offsets via a window sum, chunk indices via integer
division — so any engine reproduces the same layout bit-for-bit and a
re-run after failure packs identically (the property shuffle-order or
greedy-stateful packers lose).

Scale: one shuffle (window partitioned by the pack group). A pack group
is a sequential stream by definition, so parallelism = number of groups;
`num_shards` splits each group into independent consistent-hash shards
(shard = hash60(id) mod n, the portable coin from pipeline/dedup.py) —
the standard way real pipelines get N parallel packing streams per
source. Everything stays JVM-side; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import hash60_portable


def pack_layout(
    df: DataFrame,
    window_tokens: int,
    token_col: str = "n_tokens",
    group_col: str = "source",
    id_col: str = "doc_id",
    num_shards: int = 1,
) -> DataFrame:
    """Per-document packing layout: byte-exact chunk assignment of the
    concat-and-chunk stream.

    Adds: `shard` (consistent-hash packing stream within the group),
    `start_offset` (tokens before this doc in its stream),
    `start_chunk` / `end_chunk` (0-based chunk indices the doc touches),
    `chunk_span` (how many chunks it crosses).
    """
    if window_tokens <= 0:
        raise ValueError("window_tokens must be positive")
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    shard = (
        F.pmod(hash60_portable(F.col(id_col).cast("string")), F.lit(num_shards))
        if num_shards > 1 else F.lit(0)
    )
    df = df.withColumn("shard", shard.cast("int"))
    w = (
        Window.partitionBy(group_col, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    return (
        df.withColumn("start_offset", cum - F.col(token_col))
        .withColumn(
            "start_chunk", F.expr(f"start_offset DIV {window_tokens}")
        )
        .withColumn(
            # last token of the doc lives in chunk (end-1) DIV W; empty
            # docs (0 tokens) occupy no chunk — pin end to start
            "end_chunk",
            F.when(
                F.col(token_col) > 0,
                F.expr(
                    f"(start_offset + {token_col} - 1) DIV {window_tokens}"
                ),
            ).otherwise(F.expr(f"start_offset DIV {window_tokens}")),
        )
        .withColumn("chunk_span", F.col("end_chunk") - F.col("start_chunk") + 1)
    )


def pack_stats(
    df: DataFrame,
    window_tokens: int,
    token_col: str = "n_tokens",
    group_col: str = "source",
    id_col: str = "doc_id",
    num_shards: int = 1,
) -> DataFrame:
    """Per packing stream: documents, total tokens, chunks produced
    (ceil(total/W)), boundary-crossing docs (the attention-masking /
    document-loss accounting input), and the final chunk's fill."""
    layout = pack_layout(
        df, window_tokens, token_col=token_col, group_col=group_col,
        id_col=id_col, num_shards=num_shards,
    )
    w = window_tokens
    return (
        layout.groupBy(group_col, "shard")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(token_col).alias("total_tokens"),
            F.expr(f"CAST(ceil(sum({token_col}) / {w}.0) AS BIGINT)").alias(
                "n_chunks"
            ),
            F.sum(
                F.when(F.col("chunk_span") > 1, F.lit(1)).otherwise(F.lit(0))
            ).alias("boundary_docs"),
        )
        .withColumn(
            "last_chunk_fill",
            F.when(
                F.col("n_chunks") > 0,
                F.col("total_tokens") - (F.col("n_chunks") - 1) * F.lit(w),
            ).otherwise(F.lit(0)),  # all-empty stream: no chunk to fill
        )
    )

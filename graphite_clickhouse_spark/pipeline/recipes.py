"""Composed curation recipe — the operators chained the way a real
training-data pipeline runs them.

The individual operators (pipeline/{text,classifier,dedup,sampling}) are
each oracle-verified in isolation; `curate_corpus` is the composition a
user actually ships: URL-level dedup (optional) -> quality gate -> exact
dedup -> MinHash near-dup clustering -> benchmark decontamination ->
per-domain cap (optional) -> deterministic sampling, with a per-stage
survivor report. Every stage is a DataFrame->DataFrame
transform, so the whole recipe stays one lazy plan per stage and scales
exactly as its pieces do (the report's counts are the only actions).

Stage order follows the published pipelines (Gopher/RefinedWeb/FineWeb):
cheap row-local filters first (shrink before any shuffle), then exact
dedup (one hash aggregate), then the expensive near-dup machinery on the
survivors, decontamination against the (broadcast) eval corpus, and the
sampling knob last so rates apply to the cleaned population.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_clusters, exact_dedup, minhash_dedup
from .sampling import deterministic_sample
from .text import gopher_quality_filter


@dataclass
class CurationResult:
    kept: DataFrame
    #: [(stage, docs_in, docs_out)] in execution order
    stages: list = field(default_factory=list)

    def report(self, spark) -> DataFrame:
        return spark.createDataFrame(
            [(s, int(i), int(o)) for s, i, o in self.stages],
            "stage string, docs_in long, docs_out long",
        )


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    quality_params: dict | None = None,
    minhash: dict | None = None,
    sample_rate: float | None = None,
    url_col: str | None = None,
    domain_cap_n: int | None = None,
    domain_buckets: int = 16,
    salt: str = "",
    decontaminate_n: int = 8,
    checkpoint_dir: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    count_stages: bool = True,
) -> CurationResult:
    """Run the standard curation chain over `docs`.

    - quality gate: `quality_params` = trained classifier coefficients
      (pipeline.classifier.score_quality) or None for the Gopher rule
      filter.
    - exact dedup: smallest id per identical text survives.
    - near-dup: MinHash-LSH pairs (`minhash` kwargs override the
      defaults) -> connected components -> smallest id per cluster
      survives (`checkpoint_dir` enables the reliable-checkpoint mode
      for cluster runs).
    - decontamination: drop documents sharing any `decontaminate_n`-gram
      with `benchmark` (skipped when benchmark is None).
    - URL stages (both need `url_col`): canonical-URL dedup runs FIRST
      (the cheapest collapse — the same page refetched across snapshots
      dies before any text work, one hash agg), and `domain_cap_n`
      caps survivors per domain AFTER cleaning/dedup (FineWeb's
      over-representation collapse applies to the cleaned population),
      deterministically via the same salt.
    - sampling: consistent-hash `sample_rate` (skipped when None).

    `count_stages=False` skips the per-stage count actions (the report
    then records -1) — for production runs where only the output
    matters, the whole recipe becomes a single lazy plan.
    """
    if domain_cap_n is not None and url_col is None:
        raise ValueError("domain_cap_n requires url_col")
    result = CurationResult(kept=docs)
    cur = docs

    def record(stage: str, before: DataFrame, after: DataFrame) -> DataFrame:
        if count_stages:
            result.stages.append((stage, before.count(), after.count()))
        else:
            result.stages.append((stage, -1, -1))
        return after

    # 0. URL-level dedup: one hash aggregation on the canonical URL —
    #    runs before everything (same-page refetches are the cheapest
    #    rows to kill, and they'd otherwise inflate every later stage)
    if url_col is not None:
        from .urls import url_dedup

        keep_urls = url_dedup(cur, url_col=url_col, id_col=id_col).select(
            F.col("keep_id").alias(id_col)
        )
        cur = record("url_dedup", cur,
                     cur.join(keep_urls, id_col, "left_semi"))

    # 1. quality gate (row-local: shrink before any shuffle)
    if quality_params is not None:
        from .classifier import score_quality

        scored = score_quality(cur, quality_params, text_col=text_col,
                               id_col=id_col)
        keep_ids = scored.filter(F.col("keep")).select(id_col)
    else:
        keep_ids = (
            gopher_quality_filter(cur, text_col=text_col, id_col=id_col)
            .filter(F.col("keep"))
            .select(F.col("id").alias(id_col))
        )
    cur = record("quality", cur, cur.join(keep_ids, id_col, "left_semi"))

    # 2. exact dedup: one hash aggregate, smallest id survives
    keepers = exact_dedup(cur, text_col=text_col, id_col=id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    cur = record("exact_dedup", cur, cur.join(keepers, id_col, "left_semi"))

    # 3. near-dup clusters: banded MinHash pairs -> CC -> canonical keep
    pairs = minhash_dedup(cur, text_col=text_col, id_col=id_col,
                          **(minhash or {}))
    drop = (
        dedup_clusters(
            pairs.select("id_a", "id_b"), checkpoint_dir=checkpoint_dir
        )
        .filter(F.col("canonical_id") != F.col("id"))
        .select(F.col("id").alias(id_col))
    )
    cur = record("near_dedup", cur, cur.join(drop, id_col, "left_anti"))

    # 4. benchmark decontamination (eval grams broadcast; corpus never
    #    shuffles)
    if benchmark is not None:
        from .dedup import decontaminate

        clean = (
            decontaminate(cur, benchmark, n=decontaminate_n,
                          text_col=text_col, id_col=id_col)
            .filter(~F.col("contaminated"))
            .select(F.col("id").alias(id_col))
        )
        cur = record("decontaminate", cur,
                     cur.join(clean, id_col, "left_semi"))

    # 5. per-domain cap on the CLEANED population (capping before dedup
    #    would let duplicates crowd out distinct pages within the cap)
    if domain_cap_n is not None:
        from .urls import domain_cap

        cur = record(
            "domain_cap", cur,
            domain_cap(cur, cap=domain_cap_n, url_col=url_col,
                       key_col=id_col, salt=salt,
                       num_buckets=domain_buckets).drop("domain"),
        )

    # 6. deterministic sampling last: the rate applies to the cleaned
    #    population and stays reproducible anywhere
    if sample_rate is not None:
        cur = record(
            "sample", cur,
            deterministic_sample(cur, sample_rate, key_col=id_col, salt=salt),
        )

    result.kept = cur
    return result

"""Model-based quality classification for corpus curation.

The fastText-classifier recipe used by LLaMA/DataComp/FineWeb-style
pipelines: label a small slice with cheap heuristics (or human/LLM
judgments), train a lightweight linear classifier, then score the whole
corpus and keep the high-quality tail. Split into the two shapes Spark
wants:

- `train_quality_classifier` — pyspark.ml LogisticRegression over the
  expression-computed feature frame; runs on a SAMPLE (training is the
  small side). Returns plain float coefficients, not a model object.
- `score_quality` — inference as a PURE column expression:
  sigmoid(w.x + b) with the coefficients inlined as literals. At 100 TB
  the scoring pass is the big side, and as expressions it stays inside
  whole-stage codegen — no model broadcast, no UDF, no Python.

Features are the `text.quality_features` ratios plus ln(1+n_tokens) —
every one SQL-expressible, which keeps the scorer oracle-verifiable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import quality_features

#: feature order is part of the model contract
FEATURES = (
    "alpha_ratio",
    "punct_ratio",
    "stopword_ratio",
    "mean_token_len",
    "log_tokens",
)


def quality_feature_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, FEATURES...) — quality_features plus a log-scaled length."""
    base = quality_features(df, text_col=text_col, id_col=id_col)
    return base.select(
        id_col,
        *[F.col(c) for c in FEATURES[:-1]],
        F.log(F.lit(1.0) + F.col("n_tokens")).alias("log_tokens"),
    )


def train_quality_classifier(
    df: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    reg_param: float = 0.0,
    max_iter: int = 100,
) -> dict:
    """Fit LogisticRegression on the expression features against a
    boolean `label` Column (a heuristic like gopher_quality_filter's
    verdict, or curated judgments joined in). Returns
    {"weights": {feature: w}, "intercept": b} — plain floats ready to
    inline into `score_quality` (and into an SQL oracle)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = quality_feature_frame(df, text_col, id_col).join(
        df.select(id_col, label.cast("double").alias("_label")), id_col
    )
    assembled = VectorAssembler(
        inputCols=list(FEATURES), outputCol="_vec"
    ).transform(feats)
    lr = LogisticRegression(
        featuresCol="_vec", labelCol="_label",
        regParam=reg_param, maxIter=max_iter, standardization=True,
    )
    model = lr.fit(assembled)
    return {
        "weights": {
            name: float(w)
            for name, w in zip(FEATURES, model.coefficients.toArray())
        },
        "intercept": float(model.intercept),
    }


def score_quality(
    df: DataFrame,
    params: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """sigmoid(w.x + b) per document, as one codegen'd projection:
    (id, FEATURES..., quality_score, keep)."""
    feats = quality_feature_frame(df, text_col=text_col, id_col=id_col)
    z = F.lit(float(params["intercept"]))
    for name in FEATURES:
        z = z + F.lit(float(params["weights"][name])) * F.col(name)
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.select(
        id_col,
        *[F.col(c) for c in FEATURES],
        score.alias("quality_score"),
        (score >= F.lit(float(threshold))).alias("keep"),
    )

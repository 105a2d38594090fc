"""Sequence packing (pipeline/packing.py) and unigram-LM curation
operators (pipeline/lm.py) — hand-computed goldens + plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graphite_clickhouse_spark.pipeline.lm import (
    dsir_importance,
    unigram_counts,
    unigram_logprob_score,
)
from graphite_clickhouse_spark.pipeline.packing import pack_layout, pack_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")


class TestPacking:
    def test_layout_hand_computed(self, spark):
        # one stream: offsets 0/100/200; only the third doc crosses the
        # 256-token boundary (tokens 200..299 span chunks 0 and 1)
        df = _docs(spark, [(1, "s", 100), (2, "s", 100), (3, "s", 100)])
        rows = {
            r["doc_id"]: r
            for r in pack_layout(df, 256).collect()
        }
        assert rows[1]["start_offset"] == 0
        assert (rows[1]["start_chunk"], rows[1]["end_chunk"]) == (0, 0)
        assert (rows[2]["start_chunk"], rows[2]["end_chunk"]) == (0, 0)
        assert rows[3]["start_offset"] == 200
        assert (rows[3]["start_chunk"], rows[3]["end_chunk"]) == (0, 1)
        assert rows[3]["chunk_span"] == 2

    def test_stats_hand_computed(self, spark):
        df = _docs(spark, [(1, "s", 100), (2, "s", 100), (3, "s", 100)])
        [st] = pack_stats(df, 256).collect()
        assert st["docs"] == 3
        assert st["total_tokens"] == 300
        assert st["n_chunks"] == 2
        assert st["boundary_docs"] == 1
        assert st["last_chunk_fill"] == 300 - 256

    def test_empty_doc_occupies_no_chunk(self, spark):
        df = _docs(spark, [(1, "s", 256), (2, "s", 0), (3, "s", 10)])
        rows = {r["doc_id"]: r for r in pack_layout(df, 256).collect()}
        assert rows[2]["chunk_span"] == 1
        assert rows[2]["start_chunk"] == rows[2]["end_chunk"] == 1
        # exact-fit first doc fills chunk 0 exactly; doc 3 starts chunk 1
        assert (rows[3]["start_chunk"], rows[3]["end_chunk"]) == (1, 1)

    def test_all_empty_stream_has_no_chunks(self, spark):
        df = _docs(spark, [(1, "s", 0), (2, "s", 0)])
        [st] = pack_stats(df, 256).collect()
        assert (st["n_chunks"], st["last_chunk_fill"]) == (0, 0)

    def test_groups_pack_independently(self, spark):
        df = _docs(spark, [(1, "a", 300), (2, "b", 300)])
        st = {r["source"]: r for r in pack_stats(df, 256).collect()}
        assert st["a"]["n_chunks"] == 2 and st["b"]["n_chunks"] == 2

    def test_sharding_is_consistent_hash(self, spark):
        df = _docs(spark, [(i, "s", 10) for i in range(50)])
        out = pack_layout(df, 64, num_shards=4)
        shards = {r["doc_id"]: r["shard"] for r in out.collect()}
        assert set(shards.values()) <= {0, 1, 2, 3}
        assert len(set(shards.values())) > 1  # actually splits
        # pure function of the id: a re-run assigns identically
        again = {r["doc_id"]: r["shard"]
                 for r in pack_layout(df, 64, num_shards=4).collect()}
        assert shards == again

    def test_validation(self, spark):
        df = _docs(spark, [(1, "s", 1)])
        with pytest.raises(ValueError):
            pack_layout(df, 0)
        with pytest.raises(ValueError):
            pack_layout(df, 64, num_shards=0)


class TestUnigramLM:
    def _corpus(self, spark):
        return spark.createDataFrame(
            [(1, "x", "a a b"), (2, "y", "b c")],
            "doc_id long, source string, text string",
        )

    def test_unigram_counts(self, spark):
        counts = {
            r["word"]: r["cnt"]
            for r in unigram_counts(self._corpus(spark)).collect()
        }
        assert counts == {"a": 2, "b": 2, "c": 1}

    def test_logprob_score_hand_computed(self, spark):
        # total 5; doc1 = mean(-ln(2/5) x3) = ln(5/2); doc2 =
        # (-ln(2/5) - ln(1/5)) / 2
        out = {r["doc_id"]: r
               for r in unigram_logprob_score(self._corpus(spark)).collect()}
        assert out[1]["n_tokens"] == 3
        assert out[1]["mean_nll"] == pytest.approx(math.log(5 / 2), rel=1e-12)
        assert out[2]["mean_nll"] == pytest.approx(
            (-math.log(2 / 5) - math.log(1 / 5)) / 2, rel=1e-12
        )

    def test_rare_word_soup_scores_higher(self, spark):
        rows = [(i, "s", "the the the the") for i in range(20)]
        rows.append((99, "s", "zq xv qj wk"))
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        out = {r["doc_id"]: r["mean_nll"]
               for r in unigram_logprob_score(df).collect()}
        assert out[99] > out[0]  # CCNet keeps the low-perplexity tail

    def test_dsir_hand_computed(self, spark):
        # target = source x (doc1): corpus a:2 b:2 c:1 (total 5, V=3);
        # target a:2 b:1 (total 3). alpha=0.5
        df = self._corpus(spark)
        out = {r["doc_id"]: r
               for r in dsir_importance(df, F.col("source") == "x").collect()}
        a_llr = math.log(((2 + 0.5) * (5 + 0.5 * 3)) / ((2 + 0.5) * (3 + 0.5 * 3)))
        b_llr = math.log(((1 + 0.5) * (5 + 0.5 * 3)) / ((2 + 0.5) * (3 + 0.5 * 3)))
        c_llr = math.log(((0 + 0.5) * (5 + 0.5 * 3)) / ((1 + 0.5) * (3 + 0.5 * 3)))
        assert out[1]["mean_llr"] == pytest.approx(
            (2 * a_llr + b_llr) / 3, rel=1e-12
        )
        assert out[2]["mean_llr"] == pytest.approx(
            (b_llr + c_llr) / 2, rel=1e-12
        )
        # a target-looking doc weighs above a non-target one
        assert out[1]["mean_llr"] > out[2]["mean_llr"]

    def test_empty_and_whitespace_docs_are_excluded(self, spark):
        # docs with zero tokens can contribute nothing to a unigram
        # model; they drop out of the scored output instead of emitting
        # a divide-by-zero row
        df = spark.createDataFrame(
            [(1, "x", "a b"), (2, "x", ""), (3, "y", "   ")],
            "doc_id long, source string, text string",
        )
        assert [r["doc_id"] for r in unigram_logprob_score(df).collect()] == [1]
        assert [r["doc_id"]
                for r in dsir_importance(df, F.col("source") == "x").collect()] == [1]

    def test_vocab_join_is_broadcast(self, spark):
        plan = unigram_logprob_score(
            self._corpus(spark)
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestQualityClassifier:
    """fastText-recipe quality classifier (pipeline/classifier.py):
    heuristic weak labels -> LogisticRegression -> expression-only
    scoring."""

    def _corpus(self, spark):
        good = [
            (i, "the quick brown fox jumps over the lazy dog and then "
                "walks away to find some food in the quiet forest")
            for i in range(30)
        ]
        bad = [
            (100 + i, "@@ ## !! $$ %% ^^ && ** (( )) __ ++ == ~~ ``")
            for i in range(30)
        ]
        return spark.createDataFrame(
            [(i, t, i < 100) for i, t in good + bad],
            "doc_id long, text string, is_good boolean",
        )

    def test_train_then_score_separates(self, spark):
        from pyspark.sql import functions as F

        from graphite_clickhouse_spark.pipeline.classifier import (
            score_quality,
            train_quality_classifier,
        )

        df = self._corpus(spark)
        params = train_quality_classifier(df, F.col("is_good"), reg_param=0.01)
        assert set(params["weights"]) == {
            "alpha_ratio", "punct_ratio", "stopword_ratio",
            "mean_token_len", "log_tokens",
        }
        scored = score_quality(df, params).join(
            df.select("doc_id", "is_good"), "doc_id"
        )
        rows = scored.collect()
        assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)
        acc = sum(r["keep"] == r["is_good"] for r in rows) / len(rows)
        assert acc >= 0.95

    def test_scoring_is_expression_only(self, spark):
        from graphite_clickhouse_spark.pipeline.classifier import (
            FEATURES,
            score_quality,
        )

        params = {"weights": {f: 0.5 for f in FEATURES}, "intercept": -1.0}
        df = self._corpus(spark).select("doc_id", "text")
        plan = score_quality(df, params)._jdf.queryExecution() \
            .executedPlan().toString()
        # inference is one codegen'd projection: no shuffle, no python
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_score_matches_hand_sigmoid(self, spark):
        import math

        from graphite_clickhouse_spark.pipeline.classifier import (
            quality_feature_frame,
            score_quality,
        )

        df = self._corpus(spark).limit(3).select("doc_id", "text")
        params = {
            "weights": {
                "alpha_ratio": 2.0, "punct_ratio": -3.0,
                "stopword_ratio": 1.5, "mean_token_len": 0.25,
                "log_tokens": 0.1,
            },
            "intercept": -1.25,
        }
        feats = {r["doc_id"]: r for r in quality_feature_frame(df).collect()}
        scores = {r["doc_id"]: r["quality_score"]
                  for r in score_quality(df, params).collect()}
        for i, f in feats.items():
            z = params["intercept"] + sum(
                params["weights"][k] * f[k] for k in params["weights"]
            )
            assert scores[i] == pytest.approx(1 / (1 + math.exp(-z)), rel=1e-12)


class TestPackingDifferential:
    def test_matches_pure_python_simulator(self, spark):
        """Independent reimplementation check: the window-sum integer
        math must equal a sequential simulator on random tables."""
        import random

        for seed in (1, 7, 42):
            rng = random.Random(seed)
            rows = [
                (i, f"s{rng.randrange(3)}", rng.randrange(0, 300))
                for i in range(120)
            ]
            w = rng.choice([64, 128, 256])
            got = {
                r["doc_id"]: (r["start_offset"], r["start_chunk"],
                              r["end_chunk"], r["chunk_span"])
                for r in pack_layout(_docs(spark, rows), w).collect()
            }
            # simulator: per group in id order, running offset
            offsets: dict = {}
            for i, src, tok in sorted(rows):
                off = offsets.get(src, 0)
                offsets[src] = off + tok
                start_chunk = off // w
                end_chunk = (off + tok - 1) // w if tok > 0 else start_chunk
                assert got[i] == (
                    off, start_chunk, end_chunk, end_chunk - start_chunk + 1
                ), (seed, i, src, tok, w)


class TestBigramLogprobScore:
    """pipeline/lm.py::bigram_logprob_score — order-2 CCNet scoring with
    Jelinek-Mercer interpolation, hand-computed values."""

    def test_hand_computed(self, spark):
        import math

        from graphite_clickhouse_spark.pipeline.lm import bigram_logprob_score

        # corpus: "a a b" + "b b"  =>  uni a:2 b:3 N=5
        # bigrams (a,a):1 (a,b):1 (b,b):1; contexts a:2 b:1
        # p(a|a)=.5*1/2+.5*2/5=.45  p(b|a)=.25+.3=.55  p(b|b)=.5+.3=.8
        df = spark.createDataFrame(
            [(1, "a a b"), (2, "b b")], "doc_id long, text string"
        )
        got = {r.doc_id: r for r in bigram_logprob_score(df, lam=0.5).collect()}
        want1 = round(-(math.log(0.45) + math.log(0.55)) / 2, 6)
        want2 = round(-math.log(0.8), 6)
        assert got[1].n_bigrams == 2 and abs(got[1].mean_nll - want1) < 1e-9
        assert got[2].n_bigrams == 1 and abs(got[2].mean_nll - want2) < 1e-9

    def test_short_docs_report_zero(self, spark):
        from graphite_clickhouse_spark.pipeline.lm import bigram_logprob_score

        df = spark.createDataFrame(
            [(1, "solo"), (2, ""), (3, None), (4, "x y")],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in bigram_logprob_score(df).collect()}
        for i in (1, 2, 3):
            assert (got[i].n_bigrams, got[i].mean_nll) == (0, 0.0)
        assert got[4].n_bigrams == 1
        # every input doc appears exactly once
        assert len(got) == 4

    def test_case_and_whitespace_folding(self, spark):
        from graphite_clickhouse_spark.pipeline.lm import bigram_logprob_score

        a = spark.createDataFrame([(1, "Foo  Bar")], "doc_id long, text string")
        b = spark.createDataFrame([(1, "foo bar")], "doc_id long, text string")
        ra = bigram_logprob_score(a).collect()[0]
        rb = bigram_logprob_score(b).collect()[0]
        assert (ra.n_bigrams, ra.mean_nll) == (rb.n_bigrams, rb.mean_nll)

    def test_lam_guard(self, spark):
        import pytest

        from graphite_clickhouse_spark.pipeline.lm import bigram_logprob_score

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            bigram_logprob_score(df, lam=0.0)
        with pytest.raises(ValueError):
            bigram_logprob_score(df, lam=1.5)

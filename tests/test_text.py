"""Text-analysis operators: counts, quality, fingerprints."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_stream_aggr_spark.operators.text import (
    fingerprint,
    quality_score,
    stopword_hits,
    token_count,
)


def _one(spark, col, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("out")).collect()[0].out


def test_token_count_ignores_extra_spaces(spark):
    assert _one(spark, token_count(F.col("text")), "a  b   c") == 3
    assert _one(spark, token_count(F.col("text")), "single") == 1


def test_stopword_hits_counts_repeats(spark):
    assert _one(spark, stopword_hits(F.col("text")), "the cat the dog") == 2


def test_quality_score_components(spark):
    # stopwords present + mean token length in range → 1.0
    assert _one(spark, quality_score(F.col("text")), "the quick brown fox runs") == 1.0
    # no stopwords, short tokens → 0.0
    assert _one(spark, quality_score(F.col("text")), "x y z w") == 0.0


def test_fingerprint_order_and_case_invariant(spark):
    f1 = _one(spark, fingerprint(F.col("text")), "alpha beta gamma")
    f2 = _one(spark, fingerprint(F.col("text")), "Gamma ALPHA beta alpha")
    f3 = _one(spark, fingerprint(F.col("text")), "alpha beta delta")
    assert f1 == f2
    assert f1 != f3


def test_bigrams_single_token_doc_is_safe(spark):
    from event_stream_aggr_spark.plans.registry import load_all  # noqa: F401
    from pyspark.sql import functions as F
    from event_stream_aggr_spark.operators.text import tokens

    d = spark.createDataFrame([("one",), ("",), ("a b a",)], "text string")
    bigrams = (
        d.select(tokens(F.col("text")).alias("t"))
        .filter(F.size("t") >= 2)
        .select(F.explode(F.expr(
            "transform(sequence(1, size(t) - 1),"
            " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
        )).alias("bigram"))
    )
    got = sorted(r.bigram for r in bigrams.collect())
    assert got == ["a b", "b a"]  # 1-token and empty docs contribute nothing

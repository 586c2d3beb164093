"""Bloom-filter semi-join reduction — the 100 TB join-pruning
technique: build a tiny bitmap over the build side's join keys, probe
it map-side on the (huge) fact side, and let only possibly-matching
rows reach the join shuffle.

Spark applies this internally as runtime row-level filtering when
statistics allow; this module implements it as an explicit, auditable
operator so the pruning power is measurable (qb01 reports the false-
positive rate and the scan selectivity) and so the engine can prune
sources Spark's planner can't see through (pre-shuffle, pre-UDF, or at
the parquet scan of a foreign table).

Representation: an m-bit filter packed into ceil(m/63) longs — 63 bits
per word, not 64, because a set sign bit (1 << 63) is an overflow in
DuckDB's BIGINT shift and the oracle must recompute identical words.
At the default m = 2^16 the bitmap is a ~1041-row (word, bits)
relation, ~16 KB broadcast regardless of build-key count. k = 2 hash
probes per key via Knuth multiplicative mixing in exact BIGINT
arithmetic (no xxhash — plain modular integer math, exact in both
engines).

False positives only ever ADMIT extra rows — the exact join downstream
removes them — so correctness never depends on the filter; only the
shuffle volume does. That asymmetry is what makes the bloom step safe
to bolt onto any equi-join lineage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_aggr_spark.plans.registry import register
from event_stream_aggr_spark.tables import load_table

#: Filter size in bits (2^16) and the two Knuth multiplicative mixers.
BLOOM_M = 1 << 16
WORD_BITS = 63  # 1 << 62 max — sign-bit-safe in every engine
_MIX1_MUL = 2654435761
_MIX2_MUL = 2246822519
_MIX2_ADD = 3266489917
_MOD32 = 1 << 32


def _bloom_bits(key: Column) -> tuple[Column, Column]:
    """The k=2 bit positions of a BIGINT key, exact integer math."""
    h1 = (key.cast("long") * _MIX1_MUL) % _MOD32
    h2 = (key.cast("long") * _MIX2_MUL + _MIX2_ADD) % _MOD32
    return (h1 % BLOOM_M).alias("bit1"), (h2 % BLOOM_M).alias("bit2")


def _word(bit: str) -> Column:
    return F.expr(f"{bit} div {WORD_BITS}")


def _mask(bit: str) -> Column:
    return F.expr(f"shiftleft(1L, cast({bit} % {WORD_BITS} as int))")


def bloom_build(build: DataFrame, key: str) -> DataFrame:
    """Pack the build side's key set into the (word, bits) bitmap
    relation: ≤ ceil(BLOOM_M/63) rows, one aggregation, broadcastable."""
    b1, b2 = _bloom_bits(F.col(key))
    bits = build.select(b1).unionByName(build.select(b2.alias("bit1")))
    return (
        bits.select(_word("bit1").alias("word"), _mask("bit1").alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(probe: DataFrame, key: str, bloom: DataFrame) -> DataFrame:
    """Filter probe rows to those whose key MIGHT be in the build set
    (both bloom bits set). Adds no columns; possibly-false-positive
    rows pass — follow with the exact join."""
    b1, b2 = _bloom_bits(F.col(key))
    p = probe.select("*", b1, b2)
    w1 = bloom.select(F.col("word").alias("_w1"), F.col("bits").alias("_bits1"))
    w2 = bloom.select(F.col("word").alias("_w2"), F.col("bits").alias("_bits2"))
    return (
        p.join(F.broadcast(w1), _word("bit1") == F.col("_w1"), "left")
        .join(F.broadcast(w2), _word("bit2") == F.col("_w2"), "left")
        .where(
            (F.col("_bits1").bitwiseAND(_mask("bit1")) != 0)
            & (F.col("_bits2").bitwiseAND(_mask("bit2")) != 0)
        )
        .drop("bit1", "bit2", "_w1", "_bits1", "_w2", "_bits2")
    )


_ORACLE_BIT1 = f"((k * {_MIX1_MUL}) % {_MOD32}) % {BLOOM_M}"
_ORACLE_BIT2 = f"((k * {_MIX2_MUL} + {_MIX2_ADD}) % {_MOD32}) % {BLOOM_M}"


@register(
    "qb01_bloom_join_pruning",
    bench=True,
    tags=("join", "scale", "bloom"),
    oracle=f"""
WITH bk AS (SELECT DISTINCT o_orderkey AS k FROM orders
            WHERE o_orderpriority = '1-URGENT'),
bbits AS (SELECT {_ORACLE_BIT1} AS bit FROM bk
          UNION ALL SELECT {_ORACLE_BIT2} FROM bk),
words AS (SELECT bit // {WORD_BITS} AS word,
                 BIT_OR(1::BIGINT << CAST(bit % {WORD_BITS} AS INT)) AS bits
          FROM bbits GROUP BY bit // {WORD_BITS}),
pb AS (SELECT k, {_ORACLE_BIT1} AS b1, {_ORACLE_BIT2} AS b2
       FROM (SELECT l_orderkey AS k FROM lineitem)),
pass AS (
  SELECT pb.k FROM pb
  JOIN words w1 ON pb.b1 // {WORD_BITS} = w1.word
    AND (w1.bits & (1::BIGINT << CAST(pb.b1 % {WORD_BITS} AS INT))) != 0
  JOIN words w2 ON pb.b2 // {WORD_BITS} = w2.word
    AND (w2.bits & (1::BIGINT << CAST(pb.b2 % {WORD_BITS} AS INT))) != 0),
m AS (SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM bk) AS n_build_keys,
  (SELECT CAST(SUM(bit_count(bits)) AS BIGINT) FROM words) AS n_bits_set,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_probe,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM pass) AS n_pass_bloom,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
   WHERE l_orderkey IN (SELECT k FROM bk)) AS n_true_semi)
SELECT n_build_keys, n_bits_set, n_probe, n_pass_bloom, n_true_semi,
       n_pass_bloom - n_true_semi AS n_false_positive,
       ROUND(CAST(n_pass_bloom - n_true_semi AS DOUBLE)
             / (n_probe - n_true_semi), 6) AS fp_rate,
       ROUND(1.0 - CAST(n_pass_bloom AS DOUBLE) / n_probe, 6)
         AS pruned_fraction
FROM m
""",
)
def qb01_bloom_join_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom semi-join reduction audit: build a 2^16-bit / k=2 filter
    over urgent orders' keys, probe every lineitem row map-side, and
    report the measured pruning power — rows passed, true semi-join
    matches, false-positive rate, and the fraction of the probe scan
    the filter eliminated before any shuffle.

    Scale shape: the filter is ONE aggregation to ≤1041 bitmap words
    (16 KB broadcast however many build keys there are), and the probe
    side is scanned ONCE — the bloom test rides as a map-side flag
    (two broadcast word lookups + a bitwise test) and the exact
    membership as the k equi-join against the distinct build keys, so
    all three probe-grain counters fall out of a single aggregation
    (r5: three separate probe scans + four chained 1-row crossJoins).
    FP ≈ (1-e^(-kn/m))^k ≈ 2.6% at this build cardinality; false
    positives are ADMITTED rows the exact join later drops, so the
    filter can only reduce shuffle volume, never change results. The
    audit itself is the operator a pipeline runs to decide whether m
    is sized right for the build cardinality (bits set vs m, fp_rate
    vs target).
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    bk = (
        o.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    bloom = bloom_build(bk, "k")
    probe = li.select(F.col("l_orderkey").alias("k"))
    # ONE pass over the probe side computes all three probe-grain
    # counters (r5 VERDICT tidy — previously three separate probe
    # scans chained by four 1-row crossJoins): the bloom test rides
    # as a FLAG (two broadcast word lookups, map-side) instead of a
    # filter, and the exact membership rides the k equi-join against
    # the distinct build keys (left join on a distinct side — no row
    # duplication, and bk's distinct exchange is reused by Catalyst
    # for the join's build side). Two 1-row broadcast crossJoins then
    # attach the build-side metadata counters.
    b1, b2 = _bloom_bits(F.col("k"))
    w1 = bloom.select(F.col("word").alias("_w1"), F.col("bits").alias("_bits1"))
    w2 = bloom.select(F.col("word").alias("_w2"), F.col("bits").alias("_bits2"))
    flagged = (
        probe.select("k", b1, b2)
        .join(F.broadcast(w1), _word("bit1") == F.col("_w1"), "left")
        .join(F.broadcast(w2), _word("bit2") == F.col("_w2"), "left")
        .select(
            "k",
            (
                (F.col("_bits1").bitwiseAND(_mask("bit1")) != 0)
                & (F.col("_bits2").bitwiseAND(_mask("bit2")) != 0)
            )
            .cast("long")
            .alias("bloom_pass"),
        )
        .join(bk.select("k", F.lit(1).alias("hit")), "k", "left")
    )
    stats = flagged.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum("bloom_pass").alias("n_pass_bloom"),
        F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_true_semi"),
    )
    m = stats.crossJoin(
        F.broadcast(bk.agg(F.count(F.lit(1)).alias("n_build_keys")))
    ).crossJoin(
        F.broadcast(bloom.agg(F.sum(F.bit_count("bits")).alias("n_bits_set")))
    )
    return m.select(
        "n_build_keys",
        "n_bits_set",
        "n_probe",
        "n_pass_bloom",
        "n_true_semi",
        (F.col("n_pass_bloom") - F.col("n_true_semi")).alias("n_false_positive"),
        F.round(
            (F.col("n_pass_bloom") - F.col("n_true_semi")).cast("double")
            / (F.col("n_probe") - F.col("n_true_semi")),
            6,
        ).alias("fp_rate"),
        F.round(
            1.0 - F.col("n_pass_bloom").cast("double") / F.col("n_probe"), 6
        ).alias("pruned_fraction"),
    )

"""Probabilistic record linkage (entity resolution) — the Fellegi-
Sunter model (JASA 1969; the Splink/dedupe.io production shape) as
Spark-first dataflow: multi-pass equi-join BLOCKING generates candidate
pairs sub-quadratically, per-field agreement patterns score each pair
with log2(m/u) evidence weights, thresholds classify pairs into
match / possible (clerical review) / non-match, and matched pairs fold
into entities via connected components.

The linked corpus is ``customer`` against a deterministically derived
"second source" twin (a CRM-vs-billing scenario): every customer
reappears under a new id with an md5-band perturbation — identical,
segment lost, balance drifted, or name corrupted — so ground truth is
known and the report can audit the linker's precision per decision
class, while the LINKER itself never consults the ground-truth key.

Cross-engine determinism: evidence weights are 4-decimal Python-float
literals embedded verbatim in both the Spark expressions and the
DuckDB oracle SQL (identical doubles, fixed summation order); balances
compare as exact DECIMAL(12,2); the md5 band and blocking keys replay
bit-for-bit in SQL.

Scale shape (100 TB): blocking is two equi-joins (exact name;
nation x balance-band) — candidate volume is the sum of per-block
|A_b| x |B_b| products, never |A| x |B| — and BLOCK PURGING (the
Papadakis et al. rule every production linker applies) caps that
product per block at BLOCK_CAP: a degenerate block (placeholder names,
a hot balance band) is skipped and COUNTED (qer03 reports purged
blocks beside pair completeness) instead of detonating a quadratic
join. Under natural growth blocks multiply rather than densify, so
nothing purges and recall is untouched; the 30x upscale probe
exercises both regimes. Pair dedup, scoring, and the decision rollup
are one distinct + per-row expressions + one map-side-combinable
aggregate. Entity formation reuses operators/cluster.py's iterative
min-label propagation (one shuffle per round, bounded by match-graph
diameter).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_aggr_spark.plans.registry import register
from event_stream_aggr_spark.tables import load_table

# ---------------------------------------------------------------------------
# Model constants (m = P(agree | same entity), u = P(agree | different))
# ---------------------------------------------------------------------------

#: Per-field (m, u) probabilities — published-textbook magnitudes: a
#: name agreement is strong evidence (u ~ 1e-4: names rarely collide),
#: segment agreement is weak (1-in-5 chance collision), a close
#: balance is moderate.
FS_M_U: dict[str, tuple[float, float]] = {
    "name": (0.95, 0.0001),
    "seg": (0.90, 0.20),
    "bal": (0.85, 0.05),
}

#: log2(m/u) agreement / log2((1-m)/(1-u)) disagreement weights,
#: rounded to 4 decimals and embedded as LITERALS in both engines so
#: every pair's score is the same double bit-for-bit.
W_AGREE: dict[str, float] = {
    f: round(math.log2(m / u), 4) for f, (m, u) in FS_M_U.items()
}
W_DISAGREE: dict[str, float] = {
    f: round(math.log2((1 - m) / (1 - u)), 4) for f, (m, u) in FS_M_U.items()
}

#: Decision thresholds on the summed log2 evidence.
T_MATCH = 10.0
T_POSSIBLE = 0.0

#: Balance agreement tolerance (DECIMAL comparison) and the coarse
#: balance band used by blocking pass P2.
BAL_TOL = "5.00"
BAL_BAND = 100

#: Block purging cap: a blocking key whose |A_block| x |B_block|
#: candidate product exceeds this is SKIPPED (and reported by qer03) —
#: the standard defense against degenerate blocks (placeholder names,
#: hot bands) whose quadratic pair volume would dominate the join. At
#: the test/bench scale factors every block is orders of magnitude
#: below the cap, so purging changes nothing there by construction.
BLOCK_CAP = 20_000

#: Twin ids live in a disjoint namespace: b_id = c_custkey + offset.
B_ID_OFFSET = 10_000_000

#: md5-band perturbations applied to the twin source:
#: 0 = identical, 1 = segment lost ('UNKNOWN'), 2 = balance drifted
#: (+7.00, outside BAL_TOL), 3 = name corrupted ('X' prefix).
N_BANDS = 4
BAND2_DRIFT = "7.00"


# ---------------------------------------------------------------------------
# Shared dataflow (Spark side)
# ---------------------------------------------------------------------------


def _a_side(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("a_id"),
        F.col("c_name").alias("a_name"),
        F.col("c_mktsegment").alias("a_seg"),
        F.col("c_acctbal").cast("decimal(12,2)").alias("a_bal"),
        F.col("c_nationkey").alias("a_nation"),
    )


def _twin_side(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the second source: same entities, new ids, md5-band
    perturbations. The band hash replays verbatim in the oracle."""
    c = load_table(spark, sf_dir, "customer")
    band = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("lnk:"), F.col("c_custkey").cast("string"))),
                1,
                2,
            ),
            16,
            10,
        ).cast("long")
        % N_BANDS
    )
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    return c.select(
        (F.col("c_custkey") + B_ID_OFFSET).alias("b_id"),
        band.alias("band"),
        F.when(band == 3, F.concat(F.lit("X"), F.col("c_name")))
        .otherwise(F.col("c_name"))
        .alias("b_name"),
        F.when(band == 1, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("b_seg"),
        F.when(band == 2, bal + F.lit(BAND2_DRIFT).cast("decimal(12,2)"))
        .otherwise(bal)
        .cast("decimal(13,2)")
        .alias("b_bal"),
        F.col("c_nationkey").alias("b_nation"),
    )


def _p1_blocks(a: DataFrame, b: DataFrame, block_cap: int) -> DataFrame:
    """Surviving P1 (exact-name) blocking keys: names whose candidate
    product stays under the purge cap. Two map-side-combinable counts
    at block-key grain + one key-grain join — metadata-sized."""
    ca = a.groupBy(F.col("a_name").alias("k1")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    cb = b.groupBy(F.col("b_name").alias("k1")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    return (
        ca.join(cb, "k1")
        .filter(F.col("ca") * F.col("cb") <= block_cap)
        .select("k1")
    )


def _p2_blocks(a: DataFrame, b: DataFrame, block_cap: int) -> DataFrame:
    """Surviving P2 (nation x balance-band) blocking keys."""
    ca = a.groupBy(
        F.col("a_nation").alias("k2n"),
        F.floor(F.col("a_bal") / BAL_BAND).alias("k2b"),
    ).agg(F.count(F.lit(1)).alias("ca"))
    cb = b.groupBy(
        F.col("b_nation").alias("k2n"),
        F.floor(F.col("b_bal") / BAL_BAND).alias("k2b"),
    ).agg(F.count(F.lit(1)).alias("cb"))
    return (
        ca.join(cb, ["k2n", "k2b"])
        .filter(F.col("ca") * F.col("cb") <= block_cap)
        .select("k2n", "k2b")
    )


def candidate_pairs(
    a: DataFrame, b: DataFrame, block_cap: int = BLOCK_CAP
) -> DataFrame:
    """Blocked candidate generation (deduped across passes), with
    per-block purging at ``block_cap``. Returns (a_id, b_id)."""
    p1 = (
        a.join(_p1_blocks(a, b, block_cap), a["a_name"] == F.col("k1"))
        .join(b, F.col("k1") == b["b_name"])
        .select("a_id", "b_id")
    )
    a2 = a.select(
        "a_id",
        F.col("a_nation").alias("k2n"),
        F.floor(F.col("a_bal") / BAL_BAND).alias("k2b"),
    )
    b2 = b.select(
        "b_id",
        F.col("b_nation").alias("k2n"),
        F.floor(F.col("b_bal") / BAL_BAND).alias("k2b"),
    )
    p2 = (
        a2.join(_p2_blocks(a, b, block_cap), ["k2n", "k2b"])
        .join(b2, ["k2n", "k2b"])
        .select("a_id", "b_id")
    )
    return p1.unionAll(p2).distinct()


#: grouping_id() bitmask values for block_key_counts' two sets over
#: grouping columns (k1, k2n, k2b): the P1 set groups only k1 (k2n,k2b
#: ungrouped → bits 011 = 3); the P2 set groups (k2n,k2b) (k1
#: ungrouped → bit 100 = 4). Pinned by tests/test_linkage.py.
P1_GID = 3
P2_GID = 4


def block_key_counts(x: DataFrame, side: str) -> DataFrame:
    """Per-blocking-key row counts for BOTH passes in ONE scan and one
    shuffle of ``x`` via GROUPING SETS: rows (gid, k1, k2n, k2b, c)
    where gid = P1_GID rows carry exact-name counts and gid = P2_GID
    rows carry nation x balance-band counts. ``side`` is 'a' or 'b'
    (which column prefix to read).

    Round-14 (ADVICE): ``purged_block_counts`` previously scanned each
    input twice (one groupBy per pass); the streaming ER sink computed
    it twice per epoch (store pairing + batch pairing), re-evaluating
    the raw micro-batch 6x and the registry 2x solely for
    observability counters. Grouping sets fold both pass grains into
    one aggregate, and the sink materializes this metadata-sized frame
    once per side and derives all four counters from it."""
    return (
        x.select(
            F.col(f"{side}_name").alias("k1"),
            F.col(f"{side}_nation").alias("k2n"),
            F.floor(F.col(f"{side}_bal") / BAL_BAND).alias("k2b"),
        )
        .groupingSets([["k1"], ["k2n", "k2b"]], "k1", "k2n", "k2b")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("c"),
        )
    )


def purged_from_counts(
    ac: DataFrame, bc: DataFrame, block_cap: int = BLOCK_CAP
) -> DataFrame:
    """One row (n_purged_p1, n_purged_p2) from two ``block_key_counts``
    frames — the join/filter half of the purge counter, factored so a
    caller holding materialized count frames pays no source re-scan."""
    p1 = (
        ac.filter(F.col("gid") == P1_GID)
        .select("k1", F.col("c").alias("ca"))
        .join(
            bc.filter(F.col("gid") == P1_GID).select(
                "k1", F.col("c").alias("cb")
            ),
            "k1",
        )
        .filter(F.col("ca") * F.col("cb") > block_cap)
        .agg(F.count(F.lit(1)).alias("n_purged_p1"))
    )
    p2 = (
        ac.filter(F.col("gid") == P2_GID)
        .select("k2n", "k2b", F.col("c").alias("ca"))
        .join(
            bc.filter(F.col("gid") == P2_GID).select(
                "k2n", "k2b", F.col("c").alias("cb")
            ),
            ["k2n", "k2b"],
        )
        .filter(F.col("ca") * F.col("cb") > block_cap)
        .agg(F.count(F.lit(1)).alias("n_purged_p2"))
    )
    return p1.crossJoin(F.broadcast(p2))


def purged_block_counts(
    a: DataFrame, b: DataFrame, block_cap: int = BLOCK_CAP
) -> DataFrame:
    """One row (n_purged_p1, n_purged_p2): how many blocking keys the
    ``block_cap`` guard SKIPPED in each pass for this (a, b) pairing —
    the recall-loss observability counter. qer03 reports the offline
    sum; ``streaming/linkage.entity_resolution_sink`` writes these per
    epoch so a hot key silently densifying the registry is visible in
    the stream too, not only in the offline audit.

    Cost: one grouping-sets scan per side (both pass grains in one
    map-side-combinable aggregate) + one key-grain join per pass —
    metadata-sized, same shape as the purge decision itself."""
    return purged_from_counts(
        block_key_counts(a, "a"), block_key_counts(b, "b"), block_cap
    )


def scored_pairs(
    a: DataFrame, b: DataFrame, block_cap: int = BLOCK_CAP
) -> DataFrame:
    """Blocking (two equi-join passes, block-purged, deduped) +
    Fellegi-Sunter scoring. Returns (a_id, b_id, w, decision) at pair
    grain.

    Pass P1 blocks on exact name (catches every twin whose name
    survived); pass P2 blocks on (nation, floor(balance / BAL_BAND))
    (catches name-corrupted twins AND mints the accidental same-band
    pairs the classifier must reject — that rejection is the point of
    the u probabilities). Candidate volume is the sum of surviving
    block-pair products, never |A| x |B|; blocks over ``block_cap``
    are purged (see module docstring).

    Round 15 (from the ER gate's batch_components_assembly budget):
    the cross-pass dedup is the same block-grain MEMBERSHIP test the
    composed kernel uses, not a pair-grain ``distinct`` + two
    join-backs. Within a pass each pair surfaces exactly once (one
    equi-join on one key), so dedup only needs "drop a P2 pair that is
    also a P1 pair" — and a pair is in P1 iff both names agree AND
    that name's block was kept, testable with one left join against
    the block-grain kept-name frame (AQE broadcasts it). Each pass
    carries the compare fields from its own blocking join, so NOTHING
    pair-sized shuffles: the old shape paid one pair-grain distinct
    plus two pair-grain fetch joins per evaluation — at 100 TB those
    were the three widest exchanges in the linker. The pair SET is
    identical (the distinct-based ``candidate_pairs`` remains as the
    property-test witness, and the oracle replays UNION-distinct
    semantics in SQL)."""
    keep1 = _p1_blocks(a, b, block_cap)
    p1 = (
        a.join(keep1, a["a_name"] == F.col("k1"))
        .join(b, F.col("k1") == b["b_name"])
        .select(*_PAIR_COLS)
    )
    a2 = a.withColumn("k2n", F.col("a_nation")).withColumn(
        "k2b", F.floor(F.col("a_bal") / BAL_BAND)
    )
    b2 = b.withColumn("k2n", F.col("b_nation")).withColumn(
        "k2b", F.floor(F.col("b_bal") / BAL_BAND)
    )
    p2 = a2.join(_p2_blocks(a, b, block_cap), ["k2n", "k2b"]).join(
        b2, ["k2n", "k2b"]
    )
    in_p1 = (F.col("a_name") == F.col("b_name")) & F.col(
        "__in1"
    ).isNotNull()
    p2_only = (
        p2.join(
            keep1.select(
                F.col("k1").alias("__k1"), F.lit(True).alias("__in1")
            ),
            p2["a_name"] == F.col("__k1"),
            "left",
        )
        .filter(~F.coalesce(in_p1, F.lit(False)))
        .select(*_PAIR_COLS)
    )
    pairs = p1.unionAll(p2_only)
    w = (
        F.when(F.col("a_name") == F.col("b_name"), F.lit(W_AGREE["name"]))
        .otherwise(F.lit(W_DISAGREE["name"]))
        + F.when(F.col("a_seg") == F.col("b_seg"), F.lit(W_AGREE["seg"]))
        .otherwise(F.lit(W_DISAGREE["seg"]))
        + F.when(
            F.abs(F.col("a_bal") - F.col("b_bal"))
            <= F.lit(BAL_TOL).cast("decimal(12,2)"),
            F.lit(W_AGREE["bal"]),
        ).otherwise(F.lit(W_DISAGREE["bal"]))
    )
    return pairs.select(
        "a_id",
        "b_id",
        w.alias("w"),
        F.when(w >= T_MATCH, F.lit("match"))
        .when(w >= T_POSSIBLE, F.lit("possible"))
        .otherwise(F.lit("non_match"))
        .alias("decision"),
    )


# ---------------------------------------------------------------------------
# Shared dataflow (oracle side) — the same pipeline as DuckDB CTEs
# ---------------------------------------------------------------------------


def _src_ctes() -> str:
    """The two source CTEs (A side + derived twin) shared by every
    linkage oracle — factored so qer04's refinement ladder reuses the
    identical corpus without restating the band hash."""
    return f"""a AS (
  SELECT c_custkey AS a_id, c_name AS a_name, c_mktsegment AS a_seg,
         CAST(c_acctbal AS DECIMAL(12,2)) AS a_bal,
         c_nationkey AS a_nation
  FROM customer),
twin AS (
  SELECT c_custkey + {B_ID_OFFSET} AS b_id,
         band,
         CASE WHEN band = 3 THEN 'X' || c_name ELSE c_name END AS b_name,
         CASE WHEN band = 1 THEN 'UNKNOWN' ELSE c_mktsegment END AS b_seg,
         CAST(CASE WHEN band = 2
              THEN CAST(c_acctbal AS DECIMAL(12,2)) + {BAND2_DRIFT}
              ELSE CAST(c_acctbal AS DECIMAL(12,2)) END
              AS DECIMAL(13,2)) AS b_bal,
         c_nationkey AS b_nation
  FROM (SELECT *,
          (('0x' || substr(md5('lnk:' || CAST(c_custkey AS VARCHAR)), 1, 2))
             ::BIGINT % {N_BANDS}) AS band
        FROM customer))"""


def _scored_ctes() -> str:
    return f"""{_src_ctes()},
p1keep AS (
  SELECT x.k1 FROM
    (SELECT a_name AS k1, COUNT(*) AS ca FROM a GROUP BY a_name) x
    JOIN (SELECT b_name AS k1, COUNT(*) AS cb FROM twin GROUP BY b_name) y
      ON x.k1 = y.k1
  WHERE x.ca * y.cb <= {BLOCK_CAP}),
p2keep AS (
  SELECT x.k2n, x.k2b FROM
    (SELECT a_nation AS k2n, FLOOR(a_bal / {BAL_BAND}) AS k2b,
            COUNT(*) AS ca FROM a GROUP BY 1, 2) x
    JOIN (SELECT b_nation AS k2n, FLOOR(b_bal / {BAL_BAND}) AS k2b,
             COUNT(*) AS cb FROM twin GROUP BY 1, 2) y
      ON x.k2n = y.k2n AND x.k2b = y.k2b
  WHERE x.ca * y.cb <= {BLOCK_CAP}),
cand AS (
  SELECT a.a_id, t.b_id
  FROM a JOIN p1keep k ON a.a_name = k.k1
         JOIN twin t ON t.b_name = k.k1
  UNION
  SELECT a.a_id, t.b_id
  FROM a JOIN p2keep k
         ON a.a_nation = k.k2n AND FLOOR(a.a_bal / {BAL_BAND}) = k.k2b
       JOIN twin t
         ON t.b_nation = k.k2n AND FLOOR(t.b_bal / {BAL_BAND}) = k.k2b),
scored AS (
  SELECT c.a_id, c.b_id,
         (CASE WHEN a.a_name = t.b_name
               THEN CAST({W_AGREE["name"]} AS DOUBLE)
               ELSE CAST({W_DISAGREE["name"]} AS DOUBLE) END
          + CASE WHEN a.a_seg = t.b_seg
                 THEN CAST({W_AGREE["seg"]} AS DOUBLE)
                 ELSE CAST({W_DISAGREE["seg"]} AS DOUBLE) END
          + CASE WHEN ABS(a.a_bal - t.b_bal) <= {BAL_TOL}
                 THEN CAST({W_AGREE["bal"]} AS DOUBLE)
                 ELSE CAST({W_DISAGREE["bal"]} AS DOUBLE) END) AS w
  FROM cand c JOIN a ON a.a_id = c.a_id JOIN twin t ON t.b_id = c.b_id),
decided AS (
  SELECT a_id, b_id, w,
         CASE WHEN w >= {T_MATCH} THEN 'match'
              WHEN w >= {T_POSSIBLE} THEN 'possible'
              ELSE 'non_match' END AS decision
  FROM scored)"""


# ---------------------------------------------------------------------------
# qer01: decision-class report with ground-truth precision audit
# ---------------------------------------------------------------------------


@register(
    "qer01_record_linkage",
    bench=True,
    tags=("linkage", "join", "agg"),
    oracle=f"""
WITH {_scored_ctes()}
SELECT decision,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN b_id - {B_ID_OFFSET} = a_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_true_pairs,
       CAST(SUM(CAST(w AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_weight
FROM decided GROUP BY decision
""",
)
def qer01_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r15: scored_pairs dedups passes by block-grain membership (no
    # pair-grain distinct/join-backs) — body touch so the hash-
    # demotion protocol re-samples this query
    """Fellegi-Sunter probabilistic record linkage between customer and
    a derived second source (see module docstring): multi-pass blocking
    -> per-field agreement weights (log2 m/u literals, identical in
    both engines) -> threshold decisions. Reports, per decision class,
    the pair count, how many pairs are ground-truth correct (the twin's
    provenance key, which the linker never uses), and the average
    evidence weight — i.e. the linker's own precision audit: 'match'
    rows should be ~all true, 'possible' is the clerical-review queue
    (name-corrupted twins score 1.94 here), 'non_match' the rejected
    blocking collisions.

    Scale shape (100 TB): both blocking passes are equi-joins
    (AQE-splittable, candidate volume = sum of surviving block-pair
    products, never |A| x |B|) guarded by BLOCK_CAP purging — a
    degenerate block is skipped and counted (qer03), never joined; the
    purge decision costs two map-side-combinable counts at block-key
    grain. The pair set dedups with one distinct, scoring is per-row
    literal arithmetic, and the report is one map-side-combinable
    aggregate over pair grain. Weight sums use exact DECIMAL
    accumulation (order-independent) and divide once in DOUBLE."""
    a = _a_side(spark, sf_dir)
    b = _twin_side(spark, sf_dir)
    return (
        scored_pairs(a, b)
        .groupBy("decision")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.when(
                    F.col("b_id") - B_ID_OFFSET == F.col("a_id"), 1
                ).otherwise(0)
            ).alias("n_true_pairs"),
            (
                F.sum(F.col("w").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_weight"),
        )
    )


# ---------------------------------------------------------------------------
# qer02: matched pairs → entities (connected components) → size census
# ---------------------------------------------------------------------------


@register(
    "qer02_entity_clusters",
    tags=("linkage", "cluster"),
    oracle=f"""
WITH {_scored_ctes()},
edges AS (
  SELECT a_id AS a, b_id AS b FROM decided WHERE decision = 'match'
  UNION
  SELECT b_id, a_id FROM decided WHERE decision = 'match'),
reach AS (
  WITH RECURSIVE r(a, b) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.a, e.b FROM r JOIN edges e ON r.b = e.a)
  SELECT a, b FROM r),
comp AS (
  SELECT a AS node, LEAST(a, MIN(b)) AS component
  FROM reach GROUP BY a),
allnodes AS (
  SELECT a_id AS node FROM a
  UNION ALL
  SELECT b_id FROM twin),
labeled AS (
  SELECT n.node, COALESCE(c.component, n.node) AS component
  FROM allnodes n LEFT JOIN comp c ON c.node = n.node),
sizes AS (
  SELECT component, COUNT(*) AS entity_size FROM labeled GROUP BY component)
SELECT CAST(entity_size AS BIGINT) AS entity_size,
       CAST(COUNT(*) AS BIGINT) AS n_entities
FROM sizes GROUP BY entity_size
""",
)
def qer02_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r15: scored_pairs membership dedup + fused-convergence
    # connected_components — body touch for hash demotion
    """Entity formation over qer01's 'match' pairs: records from both
    sources are nodes (disjoint id namespaces), matched pairs are
    edges, entities are connected components, and the report is the
    entity-size census — size 2 = cleanly linked record pairs, size 1
    = unlinked residue (the name-corrupted band only reaches
    'possible', so its twins stay singletons until reviewed), size 3+
    would expose transitive over-linking (none on this corpus; the
    census is how you'd notice).

    Scale shape (100 TB): match edges reuse qer01's sub-quadratic
    block-purged blocking; components run on operators/cluster.py's
    iterative min-label propagation (one shuffle per round, rounds
    bounded by the match-graph diameter — here 1-2); singletons enter
    via ONE left join of the node census against the component labels,
    and both rollups are map-side-combinable counts. The oracle
    reaches the same fixpoint through a recursive-CTE transitive
    closure — a different algorithm entirely, same entities."""
    from event_stream_aggr_spark.operators.cluster import connected_components

    a = _a_side(spark, sf_dir)
    b = _twin_side(spark, sf_dir)
    matches = scored_pairs(a, b).filter(F.col("decision") == "match")
    # scored_pairs emits each pair once (membership dedup) over the
    # disjoint a_id < b_id namespaces — skip CC's edge dedup Exchange
    labels = connected_components(
        matches, a_col="a_id", b_col="b_id", pairs_unique=True
    )
    allnodes = a.select(F.col("a_id").alias("node")).unionAll(
        b.select(F.col("b_id").alias("node"))
    )
    labeled = allnodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )
    sizes = labeled.groupBy("component").agg(
        F.count(F.lit(1)).alias("entity_size")
    )
    return sizes.groupBy("entity_size").agg(
        F.count(F.lit(1)).alias("n_entities")
    )


# ---------------------------------------------------------------------------
# qer03: blocking-quality audit (pair completeness / reduction ratio)
# ---------------------------------------------------------------------------


@register(
    "qer03_blocking_quality",
    tags=("linkage", "audit", "agg"),
    oracle=f"""
WITH {_scored_ctes()},
flagged AS (
  SELECT a_id, b_id, MAX(in_p1) AS in_p1, MAX(in_p2) AS in_p2 FROM (
    SELECT a.a_id, t.b_id, 1 AS in_p1, 0 AS in_p2
    FROM a JOIN p1keep k ON a.a_name = k.k1
           JOIN twin t ON t.b_name = k.k1
    UNION ALL
    SELECT a.a_id, t.b_id, 0, 1
    FROM a JOIN p2keep k
           ON a.a_nation = k.k2n AND FLOOR(a.a_bal / {BAL_BAND}) = k.k2b
         JOIN twin t
           ON t.b_nation = k.k2n AND FLOOR(t.b_bal / {BAL_BAND}) = k.k2b)
  GROUP BY a_id, b_id),
purged AS (
  SELECT
    (SELECT COUNT(*) FROM
       (SELECT a_name AS k1, COUNT(*) AS ca FROM a GROUP BY a_name) x
       JOIN (SELECT b_name AS k1, COUNT(*) AS cb FROM twin GROUP BY b_name) y
         ON x.k1 = y.k1
     WHERE x.ca * y.cb > {BLOCK_CAP})
    + (SELECT COUNT(*) FROM
       (SELECT a_nation AS k2n, FLOOR(a_bal / {BAL_BAND}) AS k2b,
               COUNT(*) AS ca FROM a GROUP BY 1, 2) x
       JOIN (SELECT b_nation AS k2n, FLOOR(b_bal / {BAL_BAND}) AS k2b,
                COUNT(*) AS cb FROM twin GROUP BY 1, 2) y
         ON x.k2n = y.k2n AND x.k2b = y.k2b
     WHERE x.ca * y.cb > {BLOCK_CAP}) AS n_purged_blocks),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_records FROM a)
SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(SUM(in_p1) AS BIGINT) AS n_p1,
       CAST(SUM(in_p2) AS BIGINT) AS n_p2,
       CAST(SUM(in_p1 * in_p2) AS BIGINT) AS n_both,
       CAST(SUM(CASE WHEN b_id - {B_ID_OFFSET} = a_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_true_found,
       CAST((SELECT n_records FROM n)
            - SUM(CASE WHEN b_id - {B_ID_OFFSET} = a_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_true_missed,
       CAST(COUNT(*) * 1000000
            // ((SELECT n_records FROM n) * (SELECT n_records FROM n))
            AS BIGINT) AS reduction_ppm,
       CAST((SELECT n_purged_blocks FROM purged) AS BIGINT)
         AS n_purged_blocks
FROM flagged
""",
)
def qer03_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14: purged_block_counts rebuilt on grouping-sets single-scan
    # count frames (block_key_counts/purged_from_counts) — body touch
    # so the hash-demotion protocol re-samples this query
    """Blocking-quality audit — the two standard entity-resolution
    blocking metrics (Christen's survey nomenclature) as one data row:
    PAIR COMPLETENESS (how many ground-truth links survive blocking:
    n_true_found vs n_true_missed — a missed pair can never be linked,
    no matter how good the classifier) and REDUCTION RATIO (candidate
    pairs as ppm of the |A|x|B| cross product — the whole point of
    blocking). Per-pass candidate counts expose which pass earns its
    keep; pairs found by both passes are counted once (n_both audits
    the overlap the union dedups); n_purged_blocks counts blocks the
    BLOCK_CAP guard skipped — recall lost to purging shows up in
    n_true_missed, so the trade is visible in one row.

    Scale shape (100 TB): identical block-purged blocking joins to
    qer01 (equi only), flags fold in ONE map-side-combinable aggregate
    at pair grain, purge counts are block-key-grain aggregates, and
    the |A| count enters as a 1-row broadcast (structural crossJoin,
    the repo's scalar-stats shape). The cross-product size in the
    denominator is arithmetic on two counts, never a materialized
    relation."""
    a = _a_side(spark, sf_dir)
    b = _twin_side(spark, sf_dir)
    k1 = _p1_blocks(a, b, BLOCK_CAP)
    k2 = _p2_blocks(a, b, BLOCK_CAP)
    p1 = (
        a.join(k1, a["a_name"] == F.col("k1"))
        .join(b, F.col("k1") == b["b_name"])
        .select("a_id", "b_id", F.lit(1).alias("in_p1"), F.lit(0).alias("in_p2"))
    )
    a2 = a.select(
        "a_id",
        F.col("a_nation").alias("k2n"),
        F.floor(F.col("a_bal") / BAL_BAND).alias("k2b"),
    )
    b2 = b.select(
        "b_id",
        F.col("b_nation").alias("k2n"),
        F.floor(F.col("b_bal") / BAL_BAND).alias("k2b"),
    )
    p2 = (
        a2.join(k2, ["k2n", "k2b"])
        .join(b2, ["k2n", "k2b"])
        .select("a_id", "b_id", F.lit(0).alias("in_p1"), F.lit(1).alias("in_p2"))
    )
    flagged = (
        p1.unionAll(p2)
        .groupBy("a_id", "b_id")
        .agg(F.max("in_p1").alias("in_p1"), F.max("in_p2").alias("in_p2"))
    )

    def _purged_count(sizes_a, sizes_b, keys):
        return (
            sizes_a.join(sizes_b, keys)
            .filter(F.col("ca") * F.col("cb") > BLOCK_CAP)
            .agg(F.count(F.lit(1)).alias("n"))
        )

    purged1 = _purged_count(
        a.groupBy(F.col("a_name").alias("k1")).agg(
            F.count(F.lit(1)).alias("ca")
        ),
        b.groupBy(F.col("b_name").alias("k1")).agg(
            F.count(F.lit(1)).alias("cb")
        ),
        ["k1"],
    ).select(F.col("n").alias("np1"))
    purged2 = _purged_count(
        a.groupBy(
            F.col("a_nation").alias("k2n"),
            F.floor(F.col("a_bal") / BAL_BAND).alias("k2b"),
        ).agg(F.count(F.lit(1)).alias("ca")),
        b.groupBy(
            F.col("b_nation").alias("k2n"),
            F.floor(F.col("b_bal") / BAL_BAND).alias("k2b"),
        ).agg(F.count(F.lit(1)).alias("cb")),
        ["k2n", "k2b"],
    ).select(F.col("n").alias("np2"))

    n = a.agg(F.count(F.lit(1)).alias("n_records"))
    is_true = F.when(
        F.col("b_id") - B_ID_OFFSET == F.col("a_id"), 1
    ).otherwise(0)
    return (
        flagged.agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum("in_p1").alias("n_p1"),
            F.sum("in_p2").alias("n_p2"),
            F.sum(F.col("in_p1") * F.col("in_p2")).alias("n_both"),
            F.sum(is_true).alias("n_true_found"),
        )
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(purged1))
        .crossJoin(F.broadcast(purged2))
        .select(
            "n_candidates",
            "n_p1",
            "n_p2",
            "n_both",
            "n_true_found",
            (F.col("n_records") - F.col("n_true_found")).alias(
                "n_true_missed"
            ),
            F.expr(
                "n_candidates * 1000000 div (n_records * n_records)"
            ).alias("reduction_ppm"),
            (F.col("np1") + F.col("np2")).alias("n_purged_blocks"),
        )
    )


# ---------------------------------------------------------------------------
# qer04: block REFINEMENT ladder — the alternative to wholesale purging
# ---------------------------------------------------------------------------

#: Coarse blocking prefix length and the ladder's per-block product
#: cap. The coarse key is deliberately low-selectivity (a name prefix
#: — the realistic "first characters / soundex" production blocking
#: key), so the ladder ENGAGES at bench scale: at sf0.01 the single
#: coarse block refines once (kept at level 1: + nation); at sf0.1
#: level-1 blocks are still over the cap and refinement descends to
#: level 2 (+ segment), where the segment-corrupted twins drop out —
#: the measured recall trade of refining vs purging.
REFINE_COARSE_LEN = 14
REFINE_CAP = BLOCK_CAP


#: Pair payload carried by every ladder's candidate rows (scoring
#: reads names/segments/balances; the audit reads ids).
_PAIR_COLS = (
    "a_id", "b_id", "a_name", "b_name", "a_seg", "b_seg", "a_bal", "b_bal",
    "a_nation", "b_nation",
)


def ladder_candidates(
    a2: DataFrame,
    b2: DataFrame,
    levels: tuple[tuple[str, ...], ...],
    cap: int,
    persist_gen: list[int] | None = None,
) -> tuple[DataFrame, list[DataFrame], DataFrame]:
    """One refine-then-purge ladder (the qer04 kernel, generalized in
    round 14 so qer05 can run SEVERAL chains): ``levels`` is a nested
    key chain (each level's columns a superset of the previous, all
    precomputed on both sides under IDENTICAL names). A block whose
    |A_b|x|B_b| product exceeds ``cap`` descends to the next level;
    only a block still over the cap at the bottom is purged. Returns
    ``(candidates, kept_keys_per_level, purged_keys)``.

    Kept levels PARTITION the pair space (a pair's block is kept at
    exactly one level), so the candidate union is UNION ALL — no
    pair-dedup shuffle inside a ladder. Candidate joins run against
    the FULL sides on the kept keys: a kept key at level i>0 extends a
    level-(i-1) over-key, so key membership alone reproduces the
    descended row sets without re-filtering. Every level is block-
    grain count aggs (map-side combinable) + key-grain joins; per-
    block join product <= cap at every kept level.

    ``persist_gen`` (round 15, from the streaming gate's purge
    metrics): when a caller passes a list, each level's block-count
    frame is lazily DISK_ONLY-marked and the generation ids appended —
    the frames then materialize as a side effect of the scoring run
    that evaluates the ladder, so a later observability pass (counting
    the purged keys) reads cached block-grain data instead of
    re-scanning both sides per level. Callers own freeing the ids
    (lifecycle.free_blocks) once the metrics land."""
    from event_stream_aggr_spark.operators.lifecycle import (
        disk_checkpoint_lazy,
    )

    keeps: list[DataFrame] = []
    cur_a, cur_b = a2, b2
    over = None
    for keys in levels:
        keys = list(keys)
        ca = cur_a.groupBy(*keys).agg(F.count(F.lit(1)).alias("ca"))
        cb = cur_b.groupBy(*keys).agg(F.count(F.lit(1)).alias("cb"))
        blocks = ca.join(cb, keys)
        if persist_gen is not None:
            blocks, b_gen = disk_checkpoint_lazy(blocks)
            persist_gen.extend(b_gen)
        keep = blocks.filter(F.col("ca") * F.col("cb") <= cap).select(*keys)
        over = blocks.filter(F.col("ca") * F.col("cb") > cap).select(*keys)
        keeps.append(keep)
        cur_a = cur_a.join(over, keys)
        cur_b = cur_b.join(over, keys)
    cand = None
    for keep, keys in zip(keeps, levels):
        lvl = (
            a2.join(keep, list(keys)).join(b2, list(keys)).select(*_PAIR_COLS)
        )
        cand = lvl if cand is None else cand.unionAll(lvl)
    return cand, keeps, over


def refinement_report(
    a: DataFrame, b: DataFrame, cap: int = REFINE_CAP
) -> DataFrame:
    """Papadakis-style iterative BLOCK REFINEMENT (the production
    alternative the density probe's audit names): a block whose
    |A_b|x|B_b| product exceeds ``cap`` is not purged outright — it is
    re-blocked under a finer key (level 0: name prefix; level 1:
    + nation; level 2: + segment; level 3: + the exact name — the
    most selective key available, so only true full-key degeneracy is
    ever purged), and only a block still over the cap at the ladder's
    bottom is purged (and counted). Refinement loses only the pairs
    that DISAGREE on the added sub-key; purging loses the whole block
    — the report prices both on one row.

    Scale shape (100 TB): every level is an equi-join on its block
    key with map-side-combinable count aggs at block grain deciding
    keep/descend; candidate generation is a UNION ALL of the kept
    levels' joins — levels partition the pair space by construction
    (a pair's block is kept at exactly ONE level), so NO pair-dedup
    shuffle is needed, unlike multi-pass blocking's union-distinct.
    Per-block join product stays <= cap at every kept level, i.e. the
    largest non-splittable unit of scoring work is bounded without
    the purge-everything recall cliff the k100/cap5000 probe cell
    measures."""
    # bottom level key: the EXACT name — the textbook ladder ends at
    # the most selective key available, so only a block that is dense
    # under full-key equality (true hot-key degeneracy: many records
    # sharing name AND nation AND segment) is ever purged. b-side
    # names carry the twin's X-corruption, so a corrupted twin can
    # only be found at levels 0-2 (name disagreement at L3 is the
    # sub-key trade, reported like every other level's).
    a2 = a.select(
        "a_id",
        "a_name",
        "a_seg",
        "a_bal",
        "a_nation",
        F.substring("a_name", 1, REFINE_COARSE_LEN).alias("k0"),
        F.col("a_nation").alias("nation"),
        F.col("a_seg").alias("seg"),
        F.col("a_name").alias("nm"),
    )
    b2 = b.select(
        "b_id",
        "b_name",
        "b_seg",
        "b_bal",
        "b_nation",
        F.substring("b_name", 1, REFINE_COARSE_LEN).alias("k0"),
        F.col("b_nation").alias("nation"),
        F.col("b_seg").alias("seg"),
        F.col("b_name").alias("nm"),
    )
    cand, keeps, purged = ladder_candidates(
        a2,
        b2,
        (
            ("k0",),
            ("k0", "nation"),
            ("k0", "nation", "seg"),
            ("k0", "nation", "seg", "nm"),
        ),
        cap,
    )
    keep0, keep1, keep2, keep3 = keeps
    w = (
        F.when(F.col("a_name") == F.col("b_name"), F.lit(W_AGREE["name"]))
        .otherwise(F.lit(W_DISAGREE["name"]))
        + F.when(F.col("a_seg") == F.col("b_seg"), F.lit(W_AGREE["seg"]))
        .otherwise(F.lit(W_DISAGREE["seg"]))
        + F.when(
            F.abs(F.col("a_bal") - F.col("b_bal"))
            <= F.lit(BAL_TOL).cast("decimal(12,2)"),
            F.lit(W_AGREE["bal"]),
        ).otherwise(F.lit(W_DISAGREE["bal"]))
    )
    is_true = F.when(
        F.col("b_id") - B_ID_OFFSET == F.col("a_id"), 1
    ).otherwise(0)
    # coalesce: SUM over an all-purged (empty) candidate set is NULL,
    # but the counters' contract — and the oracle's COUNT(*) forms —
    # is 0 found / all missed
    report = cand.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.coalesce(
            F.sum(F.when(w >= T_MATCH, 1).otherwise(0)), F.lit(0)
        ).alias("n_match_pairs"),
        F.coalesce(F.sum(is_true), F.lit(0)).alias("n_true_found"),
    )

    def _n(df, name):
        return F.broadcast(df.agg(F.count(F.lit(1)).alias(name)))

    n_rec = F.broadcast(a.agg(F.count(F.lit(1)).alias("n_records")))
    return (
        report.crossJoin(_n(keep0, "n_l0_blocks_kept"))
        .crossJoin(_n(keep1, "n_l1_blocks_kept"))
        .crossJoin(_n(keep2, "n_l2_blocks_kept"))
        .crossJoin(_n(keep3, "n_l3_blocks_kept"))
        .crossJoin(_n(purged, "n_purged_blocks"))
        .crossJoin(n_rec)
        .select(
            "n_l0_blocks_kept",
            "n_l1_blocks_kept",
            "n_l2_blocks_kept",
            "n_l3_blocks_kept",
            "n_purged_blocks",
            "n_candidates",
            "n_match_pairs",
            "n_true_found",
            (F.col("n_records") - F.col("n_true_found")).alias(
                "n_true_missed"
            ),
        )
    )


@register(
    "qer04_blocking_refinement",
    tags=("linkage", "audit", "agg", "scale"),
    oracle=f"""
WITH {_src_ctes()},
aa AS (SELECT a_id, a_name, a_seg, a_bal,
              substr(a_name, 1, {REFINE_COARSE_LEN}) AS k0,
              a_nation AS nation, a_seg AS seg FROM a),
bb AS (SELECT b_id, b_name, b_seg, b_bal,
              substr(b_name, 1, {REFINE_COARSE_LEN}) AS k0,
              b_nation AS nation, b_seg AS seg FROM twin),
l0 AS (SELECT x.k0, x.ca, y.cb FROM
         (SELECT k0, COUNT(*) AS ca FROM aa GROUP BY 1) x
         JOIN (SELECT k0, COUNT(*) AS cb FROM bb GROUP BY 1) y USING (k0)),
keep0 AS (SELECT k0 FROM l0 WHERE ca * cb <= {REFINE_CAP}),
over0 AS (SELECT k0 FROM l0 WHERE ca * cb > {REFINE_CAP}),
l1 AS (SELECT x.k0, x.nation, x.ca, y.cb FROM
         (SELECT aa.k0, aa.nation, COUNT(*) AS ca
          FROM aa JOIN over0 USING (k0) GROUP BY 1, 2) x
         JOIN
         (SELECT bb.k0, bb.nation, COUNT(*) AS cb
          FROM bb JOIN over0 USING (k0) GROUP BY 1, 2) y
         USING (k0, nation)),
keep1 AS (SELECT k0, nation FROM l1 WHERE ca * cb <= {REFINE_CAP}),
over1 AS (SELECT k0, nation FROM l1 WHERE ca * cb > {REFINE_CAP}),
l2 AS (SELECT x.k0, x.nation, x.seg, x.ca, y.cb FROM
         (SELECT aa.k0, aa.nation, aa.seg, COUNT(*) AS ca
          FROM aa JOIN over1 USING (k0, nation) GROUP BY 1, 2, 3) x
         JOIN
         (SELECT bb.k0, bb.nation, bb.seg, COUNT(*) AS cb
          FROM bb JOIN over1 USING (k0, nation) GROUP BY 1, 2, 3) y
         USING (k0, nation, seg)),
keep2 AS (SELECT k0, nation, seg FROM l2 WHERE ca * cb <= {REFINE_CAP}),
over2 AS (SELECT k0, nation, seg FROM l2 WHERE ca * cb > {REFINE_CAP}),
l3 AS (SELECT x.k0, x.nation, x.seg, x.nm, x.ca, y.cb FROM
         (SELECT aa.k0, aa.nation, aa.seg, aa.a_name AS nm,
                 COUNT(*) AS ca
          FROM aa JOIN over2 USING (k0, nation, seg)
          GROUP BY 1, 2, 3, 4) x
         JOIN
         (SELECT bb.k0, bb.nation, bb.seg, bb.b_name AS nm,
                 COUNT(*) AS cb
          FROM bb JOIN over2 USING (k0, nation, seg)
          GROUP BY 1, 2, 3, 4) y
         USING (k0, nation, seg, nm)),
keep3 AS (SELECT k0, nation, seg, nm FROM l3
          WHERE ca * cb <= {REFINE_CAP}),
purged AS (SELECT k0, nation, seg, nm FROM l3
           WHERE ca * cb > {REFINE_CAP}),
cand AS (
  SELECT aa.a_id, bb.b_id, aa.a_name, bb.b_name, aa.a_seg, bb.b_seg,
         aa.a_bal, bb.b_bal
  FROM aa JOIN keep0 USING (k0) JOIN bb USING (k0)
  UNION ALL
  SELECT aa.a_id, bb.b_id, aa.a_name, bb.b_name, aa.a_seg, bb.b_seg,
         aa.a_bal, bb.b_bal
  FROM aa JOIN keep1 USING (k0, nation) JOIN bb USING (k0, nation)
  UNION ALL
  SELECT aa.a_id, bb.b_id, aa.a_name, bb.b_name, aa.a_seg, bb.b_seg,
         aa.a_bal, bb.b_bal
  FROM aa JOIN keep2 USING (k0, nation, seg)
       JOIN bb USING (k0, nation, seg)
  UNION ALL
  SELECT aa.a_id, bb.b_id, aa.a_name, bb.b_name, aa.a_seg, bb.b_seg,
         aa.a_bal, bb.b_bal
  FROM (SELECT *, a_name AS nm FROM aa) aa
       JOIN keep3 USING (k0, nation, seg, nm)
       JOIN (SELECT *, b_name AS nm FROM bb) bb
         USING (k0, nation, seg, nm)),
scored AS (
  SELECT a_id, b_id,
         (CASE WHEN a_name = b_name
               THEN CAST({W_AGREE["name"]} AS DOUBLE)
               ELSE CAST({W_DISAGREE["name"]} AS DOUBLE) END
          + CASE WHEN a_seg = b_seg
                 THEN CAST({W_AGREE["seg"]} AS DOUBLE)
                 ELSE CAST({W_DISAGREE["seg"]} AS DOUBLE) END
          + CASE WHEN ABS(a_bal - b_bal) <= {BAL_TOL}
                 THEN CAST({W_AGREE["bal"]} AS DOUBLE)
                 ELSE CAST({W_DISAGREE["bal"]} AS DOUBLE) END) AS w
  FROM cand)
SELECT
  CAST((SELECT COUNT(*) FROM keep0) AS BIGINT) AS n_l0_blocks_kept,
  CAST((SELECT COUNT(*) FROM keep1) AS BIGINT) AS n_l1_blocks_kept,
  CAST((SELECT COUNT(*) FROM keep2) AS BIGINT) AS n_l2_blocks_kept,
  CAST((SELECT COUNT(*) FROM keep3) AS BIGINT) AS n_l3_blocks_kept,
  CAST((SELECT COUNT(*) FROM purged) AS BIGINT) AS n_purged_blocks,
  CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
  CAST((SELECT COUNT(*) FROM scored WHERE w >= {T_MATCH}) AS BIGINT)
    AS n_match_pairs,
  CAST((SELECT COUNT(*) FROM cand
        WHERE b_id - {B_ID_OFFSET} = a_id) AS BIGINT) AS n_true_found,
  CAST((SELECT COUNT(*) FROM a)
       - (SELECT COUNT(*) FROM cand WHERE b_id - {B_ID_OFFSET} = a_id)
       AS BIGINT) AS n_true_missed
""",
)
def qer04_blocking_refinement(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14: refinement_report refactored onto the generic
    # ladder_candidates kernel and _PAIR_COLS widened with the raw
    # nation columns — body touch so the hash-demotion protocol
    # re-samples this query
    """Block-refinement audit (round 13, the density probe's named
    production move): one row pricing the REFINE-then-purge ladder on
    the linkage corpus under a deliberately coarse blocking key (name
    prefix, the realistic low-selectivity production key). Kept-block
    counts per level show where the ladder stabilized (sf0.01: the
    coarse block refines once and is kept at +nation; sf0.1: +nation
    is still over the cap and blocks descend to +segment), and the
    recall columns price refinement's trade: only pairs DISAGREEING
    on an added sub-key are lost (at sf0.1 the segment-corrupted
    twins), versus purging's whole-block cliff and versus the
    unguarded quadratic — the three regimes the ER density probe
    measures (SCALING_AUDIT round 13).

    Scale shape (100 TB): see ``refinement_report`` — block-grain
    count aggs decide keep/descend per level, kept levels partition
    the pair space so candidate union needs no dedup shuffle, and
    every kept block's join product is <= cap by construction."""
    return refinement_report(_a_side(spark, sf_dir), _twin_side(spark, sf_dir))


# ---------------------------------------------------------------------------
# qer05: pass-diverse blocking, each pass refined under its own ladder
# ---------------------------------------------------------------------------

#: qer05's two chains. Pass A refines the NAME key (coarse prefix →
#: + nation → the exact name) and deliberately SKIPS the segment
#: sub-key qer04 uses: a chain only reaches twins agreeing on every
#: added key, and segment-corrupted twins agree on name — they are
#: pass A's responsibility, so seg must not enter its chain. Pass B
#: refines the BALANCE key (band → + nation → + segment → the exact
#: balance) and contains no name key: name-corrupted twins agree on
#: nation/segment/balance, so they are pass B's responsibility. The
#: r13 density audit measured why ONE chain cannot win (its ceiling is
#: its key chain: 0.500 on the dense corpus = the name-agreeing bands)
#: and why flat multi-pass cannot either (purge cliffs: 0.803 at k=30,
#: spill at k=100): production linkers compose BOTH.
PASS_A_LEVELS = (("k0",), ("k0", "nation"), ("k0", "nation", "nm"))
PASS_B_LEVELS = (
    ("kb",),
    ("kb", "nation"),
    ("kb", "nation", "seg"),
    ("kb", "nation", "seg", "balx"),
)


def _name_frames(a: DataFrame, b: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Pass A (name-chain) key frames over the two sides — shared by
    the qer05 report, the pair kernel, and the streaming gate's
    observability counters."""
    a2 = a.select(
        "a_id",
        "a_name",
        "a_seg",
        "a_bal",
        "a_nation",
        F.substring("a_name", 1, REFINE_COARSE_LEN).alias("k0"),
        F.col("a_nation").alias("nation"),
        F.col("a_name").alias("nm"),
    )
    b2 = b.select(
        "b_id",
        "b_name",
        "b_seg",
        "b_bal",
        "b_nation",
        F.substring("b_name", 1, REFINE_COARSE_LEN).alias("k0"),
        F.col("b_nation").alias("nation"),
        F.col("b_name").alias("nm"),
    )
    return a2, b2


def _band_frames(a: DataFrame, b: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Pass B (balance-chain) key frames — see _name_frames."""
    a2 = a.select(
        "a_id",
        "a_name",
        "a_seg",
        "a_bal",
        "a_nation",
        F.floor(F.col("a_bal") / BAL_BAND).alias("kb"),
        F.col("a_nation").alias("nation"),
        F.col("a_seg").alias("seg"),
        F.col("a_bal").cast("decimal(13,2)").alias("balx"),
    )
    b2 = b.select(
        "b_id",
        "b_name",
        "b_seg",
        "b_bal",
        "b_nation",
        F.floor(F.col("b_bal") / BAL_BAND).alias("kb"),
        F.col("b_nation").alias("nation"),
        F.col("b_seg").alias("seg"),
        F.col("b_bal").cast("decimal(13,2)").alias("balx"),
    )
    return a2, b2


def composed_blocking_report(
    a: DataFrame, b: DataFrame, cap: int = REFINE_CAP
) -> DataFrame:
    """Pass-diverse blocking with per-pass refinement (round 14, the
    r13 audit's named production composition): TWO independent
    refine-then-purge ladders — a name chain and a balance chain whose
    key sets are chosen so each corruption mode has a chain that never
    blocks on the corrupted field — unioned at candidate grain.

    Within a pass the kept levels partition the pair space (UNION ALL,
    no dedup — the qer04 property, per pass); ACROSS passes a pair can
    surface twice (a fully-agreeing twin lives in both chains). The
    report's numbers are all counts over the DISTINCT pair set, so
    the cross-pass overlap is removed by inclusion-exclusion — per-
    pass map-side scoring + one skinny (a_id, b_id, flags)
    intersection join — never by materializing the distinct union
    (measured on the dense grid: the wide-row distinct shuffled
    30-151M 8-column rows and spilled 13-81 GB; the skinny
    intersection is the only cross-pass shuffle).

    Scale shape (100 TB): each ladder is block-grain count aggs +
    key-grain joins with every kept block's join product <= cap
    (``ladder_candidates``); scoring flags are computed where the
    candidate rows are generated (no extra shuffle), and the only
    cross-pass operation is the ids-grain intersection join
    (AQE-splittable). Per-pass kept/purged counters land on the same
    report row as recall, so the composition's coverage is data, not
    hope."""
    a_name, b_name = _name_frames(a, b)
    cand_a, keeps_a, purged_a = ladder_candidates(
        a_name, b_name, PASS_A_LEVELS, cap
    )
    a_band, b_band = _band_frames(a, b)
    cand_b, keeps_b, purged_b = ladder_candidates(
        a_band, b_band, PASS_B_LEVELS, cap
    )
    # Cross-pass dedup by INCLUSION-EXCLUSION, not a distinct (round
    # 14, measured on the dense grid): a distinct over the unioned
    # wide pair rows shuffled 30-151M 8-column rows and spilled
    # 13-81 GB. Every report number is a COUNT over the distinct pair
    # set, and within a pass candidates are already unique (the
    # ladder's partition property), so |A ∪ B| = |A| + |B| − |A ∩ B|
    # per counter: score each pass's pairs MAP-SIDE where the payload
    # already sits (no shuffle), aggregate per pass, and join only
    # (a_id, b_id, flags) — skinny rows — for the intersection terms.
    # The pair score is a pure function of the pair, so the flags
    # carried on pass A's side of the intersection join are exact.
    w = (
        F.when(F.col("a_name") == F.col("b_name"), F.lit(W_AGREE["name"]))
        .otherwise(F.lit(W_DISAGREE["name"]))
        + F.when(F.col("a_seg") == F.col("b_seg"), F.lit(W_AGREE["seg"]))
        .otherwise(F.lit(W_DISAGREE["seg"]))
        + F.when(
            F.abs(F.col("a_bal") - F.col("b_bal"))
            <= F.lit(BAL_TOL).cast("decimal(12,2)"),
            F.lit(W_AGREE["bal"]),
        ).otherwise(F.lit(W_DISAGREE["bal"]))
    )
    is_true = F.when(
        F.col("b_id") - B_ID_OFFSET == F.col("a_id"), 1
    ).otherwise(0)

    # Intersection WITHOUT a pair-grain shuffle: a pass-A pair is in
    # cand_b iff both sides agree on a pass-B level key AND that key
    # is kept at that level — and the keeps are DISJOINT by the
    # descend rule (a key kept at level l extends an over-cap key of
    # level l-1), so testing membership against the four kept-key
    # sets cannot double-count. The kept-key frames are block-grain
    # (thousands of rows; at worst #blocks), so AQE broadcasts them
    # and the whole intersection is map-side lookups over the pass-A
    # enumeration, folded into the SAME single aggregation pass that
    # produces pass A's own counters. When a kept-key frame ever
    # exceeds the broadcast threshold the fallback is a shuffle join
    # whose exchange hashes the pass-A candidate rows on the block
    # key — bounded by that key's per-block cap and AQE-splittable,
    # but candidate-row volume, not key-grain. Either way each pass
    # is enumerated exactly once and no pair-DISTINCT shuffle runs.
    kb_a = F.floor(F.col("a_bal") / BAL_BAND)
    pa = cand_a.select(
        F.when(w >= T_MATCH, 1).otherwise(0).alias("m"),
        is_true.alias("t"),
        kb_a.alias("kb"),
        (kb_a == F.floor(F.col("b_bal") / BAL_BAND)).alias("kb_eq"),
        (F.col("a_nation") == F.col("b_nation")).alias("nat_eq"),
        (F.col("a_seg") == F.col("b_seg")).alias("seg_eq"),
        (
            F.col("a_bal").cast("decimal(13,2)")
            == F.col("b_bal").cast("decimal(13,2)")
        ).alias("bal_eq"),
        F.col("a_nation").alias("nation"),
        F.col("a_seg").alias("seg"),
        F.col("a_bal").cast("decimal(13,2)").alias("balx"),
    )
    kb0, kb1, kb2, kb3 = keeps_b
    marked = (
        pa.join(kb0.withColumn("in0", F.lit(True)), ["kb"], "left")
        .join(kb1.withColumn("in1", F.lit(True)), ["kb", "nation"], "left")
        .join(
            kb2.withColumn("in2", F.lit(True)),
            ["kb", "nation", "seg"],
            "left",
        )
        .join(
            kb3.withColumn("in3", F.lit(True)),
            ["kb", "nation", "seg", "balx"],
            "left",
        )
    )
    in_b = F.col("kb_eq") & (
        F.col("in0").isNotNull()
        | (F.col("nat_eq") & F.col("in1").isNotNull())
        | (F.col("nat_eq") & F.col("seg_eq") & F.col("in2").isNotNull())
        | (
            F.col("nat_eq")
            & F.col("seg_eq")
            & F.col("bal_eq")
            & F.col("in3").isNotNull()
        )
    )
    agg_a = F.broadcast(
        marked.agg(
            F.count(F.lit(1)).alias("n_a"),
            F.coalesce(F.sum("m"), F.lit(0)).alias("m_a"),
            F.coalesce(F.sum("t"), F.lit(0)).alias("t_a"),
            F.coalesce(
                F.sum(F.when(in_b, 1).otherwise(0)), F.lit(0)
            ).alias("n_i"),
            F.coalesce(
                F.sum(F.when(in_b, F.col("m")).otherwise(0)), F.lit(0)
            ).alias("m_i"),
            F.coalesce(
                F.sum(F.when(in_b, F.col("t")).otherwise(0)), F.lit(0)
            ).alias("t_i"),
        )
    )
    agg_b = F.broadcast(
        cand_b.agg(
            F.count(F.lit(1)).alias("n_b"),
            F.coalesce(
                F.sum(F.when(w >= T_MATCH, 1).otherwise(0)), F.lit(0)
            ).alias("m_b"),
            F.coalesce(F.sum(is_true), F.lit(0)).alias("t_b"),
        )
    )
    report = agg_a.crossJoin(agg_b).select(
        (F.col("n_a") + F.col("n_b") - F.col("n_i")).alias("n_candidates"),
        (F.col("m_a") + F.col("m_b") - F.col("m_i")).alias("n_match_pairs"),
        (F.col("t_a") + F.col("t_b") - F.col("t_i")).alias("n_true_found"),
    )

    def _n(df, name):
        return F.broadcast(df.agg(F.count(F.lit(1)).alias(name)))

    out = report
    for frame, col in (
        (keeps_a[0], "pa_l0_blocks_kept"),
        (keeps_a[1], "pa_l1_blocks_kept"),
        (keeps_a[2], "pa_l2_blocks_kept"),
        (purged_a, "pa_purged_blocks"),
        (keeps_b[0], "pb_l0_blocks_kept"),
        (keeps_b[1], "pb_l1_blocks_kept"),
        (keeps_b[2], "pb_l2_blocks_kept"),
        (keeps_b[3], "pb_l3_blocks_kept"),
        (purged_b, "pb_purged_blocks"),
    ):
        out = out.crossJoin(_n(frame, col))
    out = out.crossJoin(
        F.broadcast(a.agg(F.count(F.lit(1)).alias("n_records")))
    )
    return out.select(
        "pa_l0_blocks_kept",
        "pa_l1_blocks_kept",
        "pa_l2_blocks_kept",
        "pa_purged_blocks",
        "pb_l0_blocks_kept",
        "pb_l1_blocks_kept",
        "pb_l2_blocks_kept",
        "pb_l3_blocks_kept",
        "pb_purged_blocks",
        "n_candidates",
        "n_match_pairs",
        "n_true_found",
        (F.col("n_records") - F.col("n_true_found")).alias("n_true_missed"),
    )


@register(
    "qer05_composed_blocking",
    tags=("linkage", "audit", "agg", "scale"),
    oracle=f"""
WITH {_src_ctes()},
paa AS (SELECT a_id, a_name, a_seg, a_bal,
               substr(a_name, 1, {REFINE_COARSE_LEN}) AS k0,
               a_nation AS nation, a_name AS nm FROM a),
pab AS (SELECT b_id, b_name, b_seg, b_bal,
               substr(b_name, 1, {REFINE_COARSE_LEN}) AS k0,
               b_nation AS nation, b_name AS nm FROM twin),
pal0 AS (SELECT x.k0, x.ca, y.cb FROM
           (SELECT k0, COUNT(*) AS ca FROM paa GROUP BY 1) x
           JOIN (SELECT k0, COUNT(*) AS cb FROM pab GROUP BY 1) y
           USING (k0)),
pakeep0 AS (SELECT k0 FROM pal0 WHERE ca * cb <= {REFINE_CAP}),
paover0 AS (SELECT k0 FROM pal0 WHERE ca * cb > {REFINE_CAP}),
pal1 AS (SELECT x.k0, x.nation, x.ca, y.cb FROM
           (SELECT paa.k0, paa.nation, COUNT(*) AS ca
            FROM paa JOIN paover0 USING (k0) GROUP BY 1, 2) x
           JOIN
           (SELECT pab.k0, pab.nation, COUNT(*) AS cb
            FROM pab JOIN paover0 USING (k0) GROUP BY 1, 2) y
           USING (k0, nation)),
pakeep1 AS (SELECT k0, nation FROM pal1 WHERE ca * cb <= {REFINE_CAP}),
paover1 AS (SELECT k0, nation FROM pal1 WHERE ca * cb > {REFINE_CAP}),
pal2 AS (SELECT x.k0, x.nation, x.nm, x.ca, y.cb FROM
           (SELECT paa.k0, paa.nation, paa.nm, COUNT(*) AS ca
            FROM paa JOIN paover1 USING (k0, nation) GROUP BY 1, 2, 3) x
           JOIN
           (SELECT pab.k0, pab.nation, pab.nm, COUNT(*) AS cb
            FROM pab JOIN paover1 USING (k0, nation) GROUP BY 1, 2, 3) y
           USING (k0, nation, nm)),
pakeep2 AS (SELECT k0, nation, nm FROM pal2 WHERE ca * cb <= {REFINE_CAP}),
papurged AS (SELECT k0, nation, nm FROM pal2 WHERE ca * cb > {REFINE_CAP}),
cand_a AS (
  SELECT paa.a_id, pab.b_id, paa.a_name, pab.b_name, paa.a_seg,
         pab.b_seg, paa.a_bal, pab.b_bal
  FROM paa JOIN pakeep0 USING (k0) JOIN pab USING (k0)
  UNION ALL
  SELECT paa.a_id, pab.b_id, paa.a_name, pab.b_name, paa.a_seg,
         pab.b_seg, paa.a_bal, pab.b_bal
  FROM paa JOIN pakeep1 USING (k0, nation) JOIN pab USING (k0, nation)
  UNION ALL
  SELECT paa.a_id, pab.b_id, paa.a_name, pab.b_name, paa.a_seg,
         pab.b_seg, paa.a_bal, pab.b_bal
  FROM paa JOIN pakeep2 USING (k0, nation, nm)
       JOIN pab USING (k0, nation, nm)),
pba AS (SELECT a_id, a_name, a_seg, a_bal,
               FLOOR(a_bal / {BAL_BAND}) AS kb, a_nation AS nation,
               a_seg AS seg, CAST(a_bal AS DECIMAL(13,2)) AS balx
        FROM a),
pbb AS (SELECT b_id, b_name, b_seg, b_bal,
               FLOOR(b_bal / {BAL_BAND}) AS kb, b_nation AS nation,
               b_seg AS seg, CAST(b_bal AS DECIMAL(13,2)) AS balx
        FROM twin),
pbl0 AS (SELECT x.kb, x.ca, y.cb FROM
           (SELECT kb, COUNT(*) AS ca FROM pba GROUP BY 1) x
           JOIN (SELECT kb, COUNT(*) AS cb FROM pbb GROUP BY 1) y
           USING (kb)),
pbkeep0 AS (SELECT kb FROM pbl0 WHERE ca * cb <= {REFINE_CAP}),
pbover0 AS (SELECT kb FROM pbl0 WHERE ca * cb > {REFINE_CAP}),
pbl1 AS (SELECT x.kb, x.nation, x.ca, y.cb FROM
           (SELECT pba.kb, pba.nation, COUNT(*) AS ca
            FROM pba JOIN pbover0 USING (kb) GROUP BY 1, 2) x
           JOIN
           (SELECT pbb.kb, pbb.nation, COUNT(*) AS cb
            FROM pbb JOIN pbover0 USING (kb) GROUP BY 1, 2) y
           USING (kb, nation)),
pbkeep1 AS (SELECT kb, nation FROM pbl1 WHERE ca * cb <= {REFINE_CAP}),
pbover1 AS (SELECT kb, nation FROM pbl1 WHERE ca * cb > {REFINE_CAP}),
pbl2 AS (SELECT x.kb, x.nation, x.seg, x.ca, y.cb FROM
           (SELECT pba.kb, pba.nation, pba.seg, COUNT(*) AS ca
            FROM pba JOIN pbover1 USING (kb, nation) GROUP BY 1, 2, 3) x
           JOIN
           (SELECT pbb.kb, pbb.nation, pbb.seg, COUNT(*) AS cb
            FROM pbb JOIN pbover1 USING (kb, nation) GROUP BY 1, 2, 3) y
           USING (kb, nation, seg)),
pbkeep2 AS (SELECT kb, nation, seg FROM pbl2 WHERE ca * cb <= {REFINE_CAP}),
pbover2 AS (SELECT kb, nation, seg FROM pbl2 WHERE ca * cb > {REFINE_CAP}),
pbl3 AS (SELECT x.kb, x.nation, x.seg, x.balx, x.ca, y.cb FROM
           (SELECT pba.kb, pba.nation, pba.seg, pba.balx, COUNT(*) AS ca
            FROM pba JOIN pbover2 USING (kb, nation, seg)
            GROUP BY 1, 2, 3, 4) x
           JOIN
           (SELECT pbb.kb, pbb.nation, pbb.seg, pbb.balx, COUNT(*) AS cb
            FROM pbb JOIN pbover2 USING (kb, nation, seg)
            GROUP BY 1, 2, 3, 4) y
           USING (kb, nation, seg, balx)),
pbkeep3 AS (SELECT kb, nation, seg, balx FROM pbl3
            WHERE ca * cb <= {REFINE_CAP}),
pbpurged AS (SELECT kb, nation, seg, balx FROM pbl3
             WHERE ca * cb > {REFINE_CAP}),
cand_b AS (
  SELECT pba.a_id, pbb.b_id, pba.a_name, pbb.b_name, pba.a_seg,
         pbb.b_seg, pba.a_bal, pbb.b_bal
  FROM pba JOIN pbkeep0 USING (kb) JOIN pbb USING (kb)
  UNION ALL
  SELECT pba.a_id, pbb.b_id, pba.a_name, pbb.b_name, pba.a_seg,
         pbb.b_seg, pba.a_bal, pbb.b_bal
  FROM pba JOIN pbkeep1 USING (kb, nation) JOIN pbb USING (kb, nation)
  UNION ALL
  SELECT pba.a_id, pbb.b_id, pba.a_name, pbb.b_name, pba.a_seg,
         pbb.b_seg, pba.a_bal, pbb.b_bal
  FROM pba JOIN pbkeep2 USING (kb, nation, seg)
       JOIN pbb USING (kb, nation, seg)
  UNION ALL
  SELECT pba.a_id, pbb.b_id, pba.a_name, pbb.b_name, pba.a_seg,
         pbb.b_seg, pba.a_bal, pbb.b_bal
  FROM pba JOIN pbkeep3 USING (kb, nation, seg, balx)
       JOIN pbb USING (kb, nation, seg, balx)),
cand AS (SELECT * FROM cand_a UNION SELECT * FROM cand_b),
scored AS (
  SELECT a_id, b_id,
         (CASE WHEN a_name = b_name
               THEN CAST({W_AGREE["name"]} AS DOUBLE)
               ELSE CAST({W_DISAGREE["name"]} AS DOUBLE) END
          + CASE WHEN a_seg = b_seg
                 THEN CAST({W_AGREE["seg"]} AS DOUBLE)
                 ELSE CAST({W_DISAGREE["seg"]} AS DOUBLE) END
          + CASE WHEN ABS(a_bal - b_bal) <= {BAL_TOL}
                 THEN CAST({W_AGREE["bal"]} AS DOUBLE)
                 ELSE CAST({W_DISAGREE["bal"]} AS DOUBLE) END) AS w
  FROM cand)
SELECT
  CAST((SELECT COUNT(*) FROM pakeep0) AS BIGINT) AS pa_l0_blocks_kept,
  CAST((SELECT COUNT(*) FROM pakeep1) AS BIGINT) AS pa_l1_blocks_kept,
  CAST((SELECT COUNT(*) FROM pakeep2) AS BIGINT) AS pa_l2_blocks_kept,
  CAST((SELECT COUNT(*) FROM papurged) AS BIGINT) AS pa_purged_blocks,
  CAST((SELECT COUNT(*) FROM pbkeep0) AS BIGINT) AS pb_l0_blocks_kept,
  CAST((SELECT COUNT(*) FROM pbkeep1) AS BIGINT) AS pb_l1_blocks_kept,
  CAST((SELECT COUNT(*) FROM pbkeep2) AS BIGINT) AS pb_l2_blocks_kept,
  CAST((SELECT COUNT(*) FROM pbkeep3) AS BIGINT) AS pb_l3_blocks_kept,
  CAST((SELECT COUNT(*) FROM pbpurged) AS BIGINT) AS pb_purged_blocks,
  CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
  CAST((SELECT COUNT(*) FROM scored WHERE w >= {T_MATCH}) AS BIGINT)
    AS n_match_pairs,
  CAST((SELECT COUNT(*) FROM cand
        WHERE b_id - {B_ID_OFFSET} = a_id) AS BIGINT) AS n_true_found,
  CAST((SELECT COUNT(*) FROM a)
       - (SELECT COUNT(*) FROM cand WHERE b_id - {B_ID_OFFSET} = a_id)
       AS BIGINT) AS n_true_missed
""",
)
def qer05_composed_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pass-diversity x refinement composition audit (round 14, the
    r13 audit's closing recommendation made an oracle-paired
    operator): the name ladder and the balance ladder each refine
    under their own chain, candidates union across passes with one
    distinct, and the report prices per-pass engagement (kept blocks
    per level, purged blocks per pass) next to recall on one row.

    Versus its parents on the SAME corpus: qer04's single chain tops
    out at the twins its key chain can express (dense corpus: 0.500);
    flat two-pass blocking (qer01/qer03's P1+P2) reaches 0.803 at
    moderate density but purge-cliffs or spills as blocks densify.
    Here each corruption mode has a chain that never blocks on the
    corrupted field (pass A skips segment; pass B contains no name
    key), so completeness survives density while every kept block's
    join product stays <= cap (measured on the dense grid in
    SCALING_AUDIT round 14).

    Scale shape (100 TB): see ``composed_blocking_report``."""
    return composed_blocking_report(
        _a_side(spark, sf_dir), _twin_side(spark, sf_dir)
    )


def composed_scored_pairs(
    a: DataFrame,
    b: DataFrame,
    cap: int = REFINE_CAP,
    purged_out: list[DataFrame] | None = None,
    persist_gen: list[int] | None = None,
) -> DataFrame:
    """qer05's pass-diverse candidate generation as a PAIR-PRODUCING
    kernel with ``scored_pairs``'s output contract — (a_id, b_id, w,
    decision) over the DISTINCT cross-pass union — so the streaming
    ER gate can trade flat two-pass blocking's density cliffs for the
    composition's measured completeness (SCALING_AUDIT round 14).

    The distinct union is produced WITHOUT a pair-grain shuffle, by
    the same membership trick the report uses, applied symmetrically:
    pass A's pairs are emitted as-is (unique within a pass by the
    ladder's partition property), and a pass-B pair is emitted only
    if it is NOT also a pass-A pair — both sides agree on a pass-A
    level key that is in that level's kept set (keeps disjoint by the
    descend rule; the key frames are block-grain and AQE-broadcasts
    them when small). ``purged_out``, when given, receives the two
    passes' purged-key frames (pass A, pass B) for observability
    counters — block-grain, count them cheaply; pass ``persist_gen``
    alongside it so those counts read the ladder's cached block-count
    frames (``ladder_candidates``) instead of re-scanning both
    sides."""
    a_name, b_name = _name_frames(a, b)
    cand_a, keeps_a, purged_a = ladder_candidates(
        a_name, b_name, PASS_A_LEVELS, cap, persist_gen=persist_gen
    )
    a_band, b_band = _band_frames(a, b)
    cand_b, keeps_b, purged_b = ladder_candidates(
        a_band, b_band, PASS_B_LEVELS, cap, persist_gen=persist_gen
    )
    if purged_out is not None:
        purged_out.extend([purged_a, purged_b])
    # pass-A membership test for pass-B pairs (symmetric to the
    # report's intersection): key values come from the a side, the
    # eq flags assert both sides agree — a requirement for the pair
    # to be in any pass-A block
    k0_a = F.substring("a_name", 1, REFINE_COARSE_LEN)
    pb = cand_b.select(
        *_PAIR_COLS,
        k0_a.alias("k0"),
        (k0_a == F.substring("b_name", 1, REFINE_COARSE_LEN)).alias(
            "k0_eq"
        ),
        (F.col("a_nation") == F.col("b_nation")).alias("nat_eq"),
        (F.col("a_name") == F.col("b_name")).alias("nm_eq"),
        F.col("a_nation").alias("nation"),
        F.col("a_name").alias("nm"),
    )
    ka0, ka1, ka2 = keeps_a
    marked = (
        pb.join(ka0.withColumn("in0", F.lit(True)), ["k0"], "left")
        .join(ka1.withColumn("in1", F.lit(True)), ["k0", "nation"], "left")
        .join(
            ka2.withColumn("in2", F.lit(True)),
            ["k0", "nation", "nm"],
            "left",
        )
    )
    in_a = F.col("k0_eq") & (
        F.col("in0").isNotNull()
        | (F.col("nat_eq") & F.col("in1").isNotNull())
        | (F.col("nat_eq") & F.col("nm_eq") & F.col("in2").isNotNull())
    )
    b_only = marked.filter(~F.coalesce(in_a, F.lit(False))).select(
        *_PAIR_COLS
    )
    pairs = cand_a.unionAll(b_only)
    w = (
        F.when(F.col("a_name") == F.col("b_name"), F.lit(W_AGREE["name"]))
        .otherwise(F.lit(W_DISAGREE["name"]))
        + F.when(F.col("a_seg") == F.col("b_seg"), F.lit(W_AGREE["seg"]))
        .otherwise(F.lit(W_DISAGREE["seg"]))
        + F.when(
            F.abs(F.col("a_bal") - F.col("b_bal"))
            <= F.lit(BAL_TOL).cast("decimal(12,2)"),
            F.lit(W_AGREE["bal"]),
        ).otherwise(F.lit(W_DISAGREE["bal"]))
    )
    return pairs.select(
        "a_id",
        "b_id",
        w.alias("w"),
        F.when(w >= T_MATCH, F.lit("match"))
        .when(w >= T_POSSIBLE, F.lit("possible"))
        .otherwise(F.lit("non_match"))
        .alias("decision"),
    )


@register(
    "qer06_blocking_advisor",
    tags=("linkage", "audit", "agg"),
    oracle=f"""
WITH {_src_ctes()},
p1 AS (
  SELECT x.ca, y.cb FROM
    (SELECT a_name AS k1, COUNT(*) AS ca FROM a GROUP BY a_name) x
    JOIN (SELECT b_name AS k1, COUNT(*) AS cb FROM twin GROUP BY b_name) y
      ON x.k1 = y.k1),
p2 AS (
  SELECT x.ca, y.cb FROM
    (SELECT a_nation AS k2n, FLOOR(a_bal / {BAL_BAND}) AS k2b,
            COUNT(*) AS ca FROM a GROUP BY 1, 2) x
    JOIN (SELECT b_nation AS k2n, FLOOR(b_bal / {BAL_BAND}) AS k2b,
             COUNT(*) AS cb FROM twin GROUP BY 1, 2) y
      ON x.k2n = y.k2n AND x.k2b = y.k2b),
s1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks_p1,
         CAST(COALESCE(MAX(ca * cb), 0) AS BIGINT) AS max_product_p1,
         CAST(COALESCE(SUM(CASE WHEN ca * cb > {BLOCK_CAP} THEN 1 ELSE 0
                           END), 0) AS BIGINT) AS n_purged_p1
  FROM p1),
s2 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks_p2,
         CAST(COALESCE(MAX(ca * cb), 0) AS BIGINT) AS max_product_p2,
         CAST(COALESCE(SUM(CASE WHEN ca * cb > {BLOCK_CAP} THEN 1 ELSE 0
                           END), 0) AS BIGINT) AS n_purged_p2
  FROM p2)
SELECT n_blocks_p1, max_product_p1, n_purged_p1,
       n_blocks_p2, max_product_p2, n_purged_p2,
       CASE WHEN n_purged_p1 + n_purged_p2 > 0
            THEN 'composed' ELSE 'flat' END AS chosen_blocking
FROM s1, s2
""",
)
def qer06_blocking_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-strategy advisor (round 15): the streaming gate's
    ``blocking='auto'`` crossover as an offline, oracle-paired report
    — for this corpus pairing, would FLAT two-pass blocking purge any
    block at BLOCK_CAP? One row: per-pass co-occurring block counts,
    the maximum |A_b|x|B_b| join product (headroom below the cap), the
    purged-block counts, and the strategy the gate's exact rule would
    choose ('composed' iff any block purges, else 'flat' — below the
    crossover the kernels link identically and flat is cheaper; above
    it flat silently loses recall). Run it before standing up a feed
    to pick the gate's setting from data, and on schedule to see the
    crossover approach as sources densify.

    Scale shape (100 TB): ONE grouping-sets scan per side
    (``block_key_counts`` — both pass grains in one map-side-
    combinable aggregate), two block-key-grain joins, and three-counter
    aggregates folded to a broadcast crossJoin of two 1-row frames;
    nothing pair-grain exists in the plan at all."""
    a = _a_side(spark, sf_dir)
    b = _twin_side(spark, sf_dir)
    ac = block_key_counts(a, "a")
    bc = block_key_counts(b, "b")

    def _pass_stats(gid: int, keys: list[str], n: str):
        prod = F.col("ca") * F.col("cb")
        return (
            ac.filter(F.col("gid") == gid)
            .select(*keys, F.col("c").alias("ca"))
            .join(
                bc.filter(F.col("gid") == gid).select(
                    *keys, F.col("c").alias("cb")
                ),
                keys,
            )
            .agg(
                F.count(F.lit(1)).alias(f"n_blocks_{n}"),
                F.coalesce(F.max(prod), F.lit(0))
                .cast("long")
                .alias(f"max_product_{n}"),
                F.coalesce(
                    F.sum(F.when(prod > BLOCK_CAP, 1).otherwise(0)),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"n_purged_{n}"),
            )
        )

    s1 = _pass_stats(P1_GID, ["k1"], "p1")
    s2 = _pass_stats(P2_GID, ["k2n", "k2b"], "p2")
    return (
        s1.crossJoin(F.broadcast(s2))
        .withColumn(
            "chosen_blocking",
            F.when(
                F.col("n_purged_p1") + F.col("n_purged_p2") > 0,
                F.lit("composed"),
            ).otherwise(F.lit("flat")),
        )
        .select(
            "n_blocks_p1",
            "max_product_p1",
            "n_purged_p1",
            "n_blocks_p2",
            "max_product_p2",
            "n_purged_p2",
            "chosen_blocking",
        )
    )

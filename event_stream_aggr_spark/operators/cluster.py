"""Connected components over near-dup pairs (dedup clustering).

A dedup pipeline ends with *clusters*, not pairs: the (doc_a, doc_b)
edges from Jaccard/MinHash/SimHash need grouping so one representative
per component survives. This is inherently iterative (no single SQL
query), so it's the one operator here built as a driver-side loop of
DataFrame steps — large-neighborhood label propagation, the same
dataflow GraphX/GraphFrames use for CC:

  label(v) <- min(label(v), min(label(u) for u adjacent))   until fixed

Each iteration is one shuffle (groupBy min over the undirected edge
list); convergence takes O(diameter) iterations — near-dup graphs are
star/clique-shaped, so 2-4 in practice. ``checkpoint_every`` truncates
the lineage so plans don't grow exponentially at scale (uses
localCheckpoint to avoid requiring a checkpoint dir).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
    gen_out: list[int] | None = None,
    init: DataFrame | None = None,
    label_offset: int = 0,
    pairs_unique: bool = False,
) -> DataFrame:
    """(a, b) edge list → (node, component) with component = min LABEL
    reachable; by default a node's own label is its id, so component =
    min node id reachable. Deterministic (min-label), loop ends early
    on a fixed point.

    Per-round shape (round-15 rewrite, from the ER gate's stage
    budget where ``batch_components_assembly`` was ~58% of the batch):
    each round is ONE job running TWO chained min-label steps —
    union(self-labels, neighbor-labels) → groupBy min, twice — into a
    lazy DISK_ONLY checkpoint whose materializing action is the
    convergence count, with the mid-step label carried through the
    second aggregation (``min(old)`` over the self row; neighbor rows
    carry null, which min ignores) so convergence needs no old-vs-new
    join. A diameter-1 match graph (the deduped-feed common case)
    converges in ONE action; diameter d needs ceil(d/2)+1, each two
    shuffles. The previous loop paid one action PER step plus a
    join-based changed count that re-evaluated both generations;
    this one evaluates each generation exactly once, reads the prior
    generation from its blocks, and frees the superseded generation
    the moment its successor materializes (the qg07 lifecycle).
    ``max_iter`` counts rounds, i.e. up to 2x``max_iter`` label steps.

    ``init``: optional (node, component) seed labels for a SUBSET of
    nodes (e.g. the streaming ER gate seeds records with the registry
    entity they matched — the "registry link as a zeroth label
    generation" shape); unseeded nodes label as node + ``label_offset``.
    With ``label_offset > 0`` a caller can priority-encode two label
    classes into one long ordering (seeded labels in [0, offset) always
    beat unseeded node labels) — requires ids in [0, offset). All-long
    labels keep every caller on the same codegen'd min-aggregation.

    ``gen_out`` (round-14, the band_canonical_dedup pattern): when a
    caller passes a list, the RDD ids of the blocks still registered at
    return — the edge-list checkpoint plus the LAST label generation —
    are appended to it so per-epoch callers (entity_resolution_sink via
    link_batch) can ``free_blocks`` them once their own eager
    checkpoint supersedes the returned frame's lineage. Without this,
    every epoch leaked one edge + one label generation until
    nondeterministic driver GC — exactly the accumulation
    lifecycle.py's docstring warns against. Batch callers that return
    the frame for a single evaluation may omit it (GC cleans up with
    the plan).

    ``pairs_unique`` (round 15, second half — guide §2.4, "a distinct
    on data that is already unique"): when the caller GUARANTEES one
    row per unordered pair with a strict ``a < b`` order (every
    in-repo pair generator does: ``lsh_candidates`` ends in a pair
    ``distinct`` over ``doc_a < doc_b``, and both linkage kernels emit
    each pair exactly once by the membership-dedup construction over
    disjoint ``a_id < b_id`` namespaces), the reversed union below is
    ALREADY duplicate-free — the two branches are disjoint by the
    strict order — so the edge ``distinct`` is a pure wasted Exchange
    + two HashAggregates over the full edge list, per evaluation (per
    EPOCH in the streaming ER gate; a full edge-list shuffle at
    100 TB). Semantics never depend on the flag: min-label propagation
    is idempotent under duplicate edges (a lying caller costs
    neighbor-join volume, never a wrong component) — pinned by the
    flag-equivalence and duplicate-tolerance tests in
    tests/test_cluster_components.py."""
    from event_stream_aggr_spark.operators.lifecycle import (
        disk_checkpoint_lazy,
        free_blocks,
    )

    edges = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
    if not pairs_unique:
        edges = edges.distinct()
    # Materialize the edge list ONCE before iterating (round-13 fix,
    # found by the ER stream's stage budget): every iteration runs an
    # action over a plan that reads the edges, and without this
    # checkpoint each action re-evaluated the caller's ENTIRE upstream
    # dataflow — for the ER/near-dup callers that is the blocked
    # candidate join + scoring, recomputed per round. DISK_ONLY like
    # the label generations: edge lists at 100 TB scale are
    # shuffle-sized, not executor-memory-sized. Blocks stay registered
    # until the caller's lineage supersedes them (gen_out note below).
    edges, edges_gen = disk_checkpoint_lazy(edges)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    default_label = (
        F.col("node") + F.lit(label_offset) if label_offset else F.col("node")
    )
    if init is not None:
        labels = nodes.join(init, "node", "left").select(
            "node",
            F.coalesce(init["component"], default_label).alias("component"),
        )
    else:
        labels = nodes.withColumn("component", default_label)

    spark = pairs.sparkSession

    def _min_step(lbl: DataFrame, with_old: bool) -> DataFrame:
        """One min-label step: own label + every neighbor's, min per
        node. ``with_old`` carries the PRE-step label through the
        aggregation (self row only; neighbor rows null, which min
        ignores — every node has exactly one self row, so ``old`` is
        never null after the min) for the join-free convergence
        count."""
        neighbor = edges.join(lbl, edges.dst == lbl.node).select(
            F.col("src").alias("node"), F.col("component")
        )
        self_rows = lbl.select("node", "component")
        if with_old:
            neighbor = neighbor.withColumn(
                "old", F.lit(None).cast("long")
            )
            self_rows = self_rows.withColumn(
                "old", F.col("component").cast("long")
            )
        aggs = [F.min("component").alias("component")]
        if with_old:
            aggs.append(F.min("old").alias("old"))
        return self_rows.union(neighbor).groupBy("node").agg(*aggs)

    prev_gen: list[int] = []
    for _ in range(max_iter):
        # TWO min-label steps per job (round 15, from the ER gate's
        # job-count-dominated components stage): step B carries step
        # A's label as ``old``, the lazy checkpoint's materializing
        # action is the A-vs-B changed count, and changed == 0 means
        # step A was already a fixpoint — so a diameter-1 graph (the
        # deduped-feed common case) converges in ONE action instead
        # of two, and diameter d needs ceil(d/2)+1 actions, each one
        # job with two shuffles. Superseded generations are freed the
        # moment their successor materializes (the qg07 lifecycle).
        new_labels = _min_step(_min_step(labels, False), True)
        new_labels, gen = disk_checkpoint_lazy(new_labels)
        changed = new_labels.filter(
            F.col("component") != F.col("old")
        ).count()
        free_blocks(spark, prev_gen)  # superseded generation only
        prev_gen = gen
        labels = new_labels.select("node", "component")
        if changed == 0:
            break
    # The final label generation AND the edge blocks stay registered —
    # the returned frame may read either via its (truncated) lineage,
    # so they must NOT be freed here. Callers that supersede the
    # lineage (eager checkpoint of a downstream frame) free them via
    # gen_out; otherwise driver GC cleans them with the plan.
    if gen_out is not None:
        gen_out.extend(edges_gen)
        gen_out.extend(prev_gen)
    return labels


def dedup_keepers(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    pairs_unique: bool = False,
) -> DataFrame:
    """Full dedup: keep the min-id document of each near-dup component,
    plus every document that appears in no pair. ``pairs_unique``
    forwards to ``connected_components`` (skip the edge dedup Exchange
    when the pair list is one-row-per-unordered-pair, ``a < b``)."""
    comp = connected_components(pairs, a_col, b_col, pairs_unique=pairs_unique)
    keepers_in_components = comp.groupBy("component").agg(
        F.min("node").alias(id_col)
    ).select(id_col)
    clustered = comp.select(F.col("node").alias(id_col))
    untouched = docs.select(id_col).join(clustered, id_col, "left_anti")
    return untouched.union(keepers_in_components)


# ---------------------------------------------------------------------------
# qg01: bipartite PageRank in integer fixed-point (graph analytics)
# ---------------------------------------------------------------------------

PR_DAMP_MU = 850_000   # 0.85 in micro-units
PR_BASE_MU = 150_000   # (1 - 0.85)
PR_ITERS = 2           # full cust->supp->cust alternations


def _register_pagerank_query():
    from pyspark.sql import SparkSession  # noqa: F401

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    def _step_sql(dst: str, src_rank: str, src_deg: str, edges: str,
                  src: str, dstcol: str) -> str:
        # rank(dst) = base + damp * SUM(rank(src) // deg(src)) // 1e6
        return f"""
  SELECT e.{dstcol} AS k,
         CAST({PR_BASE_MU} + ({PR_DAMP_MU} *
              CAST(SUM(r.rank_mu // d.deg) AS BIGINT)) // 1000000 AS BIGINT)
           AS rank_mu
  FROM {edges} e
  JOIN {src_rank} r ON r.k = e.{src}
  JOIN {src_deg} d ON d.k = e.{src}
  GROUP BY e.{dstcol}"""

    oracle = f"""
WITH edges AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
dc AS (SELECT c AS k, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY c),
ds AS (SELECT s AS k, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY s),
rc0 AS (SELECT k, CAST(1000000 AS BIGINT) AS rank_mu FROM dc),
rs0 AS (SELECT k, CAST(1000000 AS BIGINT) AS rank_mu FROM ds),
rs1 AS ({_step_sql('s', 'rc0', 'dc', 'edges', 'c', 's')}),
rc1 AS ({_step_sql('c', 'rs1', 'ds', 'edges', 's', 'c')}),
rs2 AS ({_step_sql('s', 'rc1', 'dc', 'edges', 'c', 's')}),
rc2 AS ({_step_sql('c', 'rs2', 'ds', 'edges', 's', 'c')})
SELECT r.k AS suppkey, d.deg AS n_customers, r.rank_mu
FROM rs2 r JOIN ds d ON d.k = r.k
"""

    @register("qg01_supplier_pagerank", tags=("graph", "iterative"), oracle=oracle)
    def qg01_supplier_pagerank(spark, sf_dir):
        """Bipartite PageRank (graph analytics over the relational
        tables): ranks suppliers by random-walk centrality on the
        customer↔supplier purchase graph (distinct (custkey, suppkey)
        edges from orders⋈lineitem) — the influence/importance score a
        curation pipeline uses to weight sources, here expressed as the
        Pregel-as-joins dataflow (each half-step: contributions =
        rank/out-degree aggregated at the destination).

        Determinism: ranks live in integer MICRO-UNITS; each
        contribution is integer division rank_mu // degree, each
        update base + damp·sum // 1e6 — no floats anywhere, so both
        engines agree bit-for-bit (float PageRank would accumulate
        order-dependent last-bit drift across iterations).

        Scale shape (100 TB): each half-step is ONE keyed aggregation
        over the edge list joined to a node-grain rank relation (the
        node relation is orders-of-magnitude smaller than edges and
        broadcast-eligible; at web scale it's the shuffle-keyed side
        and AQE skew-splits celebrity nodes). K iterations = K chained
        shuffles. This loop deliberately does NOT checkpoint: at
        PR_ITERS=2 the whole chain is 4 joins + 4 aggregations deep —
        a plan Catalyst compiles in milliseconds with nothing
        accumulated to free, so the lifecycle's per-round
        materialization jobs would be pure overhead. A deeper rank
        chain (~5+ iterations) must switch to the bounded lifecycle —
        eager ``disk_checkpoint`` per round + ``free_blocks`` on the
        superseded generation (operators/lifecycle.py; qg03/qg07 and
        connected_components show the recipe)."""
        o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
        edges = (
            o.join(li, o["o_orderkey"] == li["l_orderkey"])
            .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
            .distinct()
        )
        dc = edges.groupBy("c").agg(F.count(F.lit(1)).alias("deg_c"))
        ds = edges.groupBy("s").agg(F.count(F.lit(1)).alias("deg_s"))
        rc = dc.select("c", F.lit(1_000_000).cast("long").alias("rank_mu"))
        rs = None
        for _ in range(PR_ITERS):
            rs = (
                edges.join(rc, "c")
                .join(dc, "c")
                .select("s", F.expr("rank_mu div deg_c").alias("contrib"))
                .groupBy("s")
                .agg(
                    (
                        F.lit(PR_BASE_MU)
                        + F.expr(f"({PR_DAMP_MU} * sum(contrib)) div 1000000")
                    )
                    .cast("long")
                    .alias("rank_mu")
                )
            )
            rc = (
                edges.join(rs, "s")
                .join(ds, "s")
                .select("c", F.expr("rank_mu div deg_s").alias("contrib"))
                .groupBy("c")
                .agg(
                    (
                        F.lit(PR_BASE_MU)
                        + F.expr(f"({PR_DAMP_MU} * sum(contrib)) div 1000000")
                    )
                    .cast("long")
                    .alias("rank_mu")
                )
            )
        return rs.join(ds, "s").select(
            F.col("s").alias("suppkey"),
            F.col("deg_s").alias("n_customers"),
            "rank_mu",
        )

    return qg01_supplier_pagerank


_register_pagerank_query()


# ---------------------------------------------------------------------------
# qg02: triangle counting / global clustering coefficient
# ---------------------------------------------------------------------------


def _register_triangle_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qg02_triangle_count",
        tags=("graph", "join"),
        oracle="""
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY node),
oe AS (
  SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS x,
         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS y,
         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END AS dy
  FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
tri AS (
  -- out-neighbor pairs of x ordered by the SAME (degree, id) rank the
  -- orientation uses, so the closing edge always runs w1 -> w2 and
  -- each triangle matches exactly one pair
  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM oe e1 JOIN oe e2
    ON e1.x = e2.x AND (e1.dy, e1.y) < (e2.dy, e2.y)
  WHERE EXISTS (SELECT 1 FROM oe e3 WHERE e3.x = e1.y AND e3.y = e2.y))
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
       tri.n_triangles,
       ROUND(3.0 * tri.n_triangles
             / (SELECT SUM(d * (d - 1) / 2) FROM deg), 6) AS clustering_coeff
FROM tri
""",
    )
    def qg02_triangle_count(spark, sf_dir):
        """Triangle counting + global clustering coefficient over the
        part co-occurrence graph (parts bought together in one order) —
        the graph-analytics primitive behind community/cohesion
        measures, done as the oriented wedge-join algorithm: a wedge
        join over out-neighbor pairs proposes candidates, a closing
        semi-join confirms triangles, and the ordering makes each
        triangle count exactly once.

        Scale shape: edges are DEGENERACY-ORIENTED first — every edge
        points from its (degree, id)-smaller endpoint to the larger —
        so the wedge join enumerates pairs of OUT-neighbors only and
        out-degrees stay O(sqrt(|E|)) however skewed raw degrees are
        (the hub that breaks plain id-orientation: a degree-10^6 node
        contributes up to 10^12 id-ordered wedges but only its
        bounded out-wedges here). On the synthetic near-uniform graph
        this times on par with plain id-orientation — the orientation
        buys hub robustness, not small-graph speed. The oracle
        replays the identical orientation. Wedge totals come from
        exact integer degree sums, so the coefficient is
        bit-identical cross-engine.
        """
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        a = li.alias("a")
        b = li.alias("b")
        e = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .select(
                F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
            )
            .distinct()
        )
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
        dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
        u_first = (F.col("du") < F.col("dv")) | (
            (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
        )
        oe = (
            e.join(F.broadcast(du), "u")
            .join(F.broadcast(dv), "v")
            .select(
                F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("x"),
                F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("y"),
                F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dy"),
            )
        )
        e1 = oe.select("x", F.col("y").alias("w1"), F.col("dy").alias("d1"))
        e2 = oe.select("x", F.col("y").alias("w2"), F.col("dy").alias("d2"))
        closing = oe.select(F.col("x").alias("w1"), F.col("y").alias("w2"))
        tri = (
            e1.join(e2, "x")
            .where(
                (F.col("d1") < F.col("d2"))
                | ((F.col("d1") == F.col("d2")) & (F.col("w1") < F.col("w2")))
            )
            .join(closing, ["w1", "w2"], "left_semi")
            .agg(F.count(F.lit(1)).alias("n_triangles"))
        )
        stats = deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
        ).crossJoin(e.agg(F.count(F.lit(1)).alias("n_edges")))
        return stats.crossJoin(tri).select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6).alias(
                "clustering_coeff"
            ),
        )

    return qg02_triangle_count


_register_triangle_query()


# ---------------------------------------------------------------------------
# qg03: BFS hop distances from a seed node (iterative frontier expansion)
# ---------------------------------------------------------------------------

BFS_MAX_HOPS = 3


def _register_bfs_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qg03_bfs_distances",
        tags=("graph", "iterative"),
        oracle=f"""
WITH RECURSIVE li AS (SELECT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
seed AS (SELECT MIN(u) AS s FROM e),
bfs(node, dist) AS (
  SELECT s, 0 FROM seed
  UNION
  SELECT e.v, bfs.dist + 1
  FROM bfs JOIN e ON e.u = bfs.node
  WHERE bfs.dist < {BFS_MAX_HOPS}),
mind AS (SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM bfs GROUP BY node)
SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM mind GROUP BY dist
""",
    )
    def qg03_bfs_distances(spark, sf_dir):
        """Breadth-first hop distances from a seed part over the
        directed co-occurrence graph (both directions materialized) —
        the reachability/radius primitive behind "how connected is
        this catalog", done as iterative frontier expansion: each hop
        is ONE equi-join of the current frontier against the edge
        list, new nodes anti-joined against the visited set, distance
        = first hop that reached them. The same Pregel-as-joins
        discipline as qg01/qd08.

        Scale shape: per hop, |frontier| rows join the edge relation
        (key-shuffled, AQE-splittable) and the visited set grows
        monotonically. Per-round state runs on the qg07 lifecycle
        (operators/lifecycle.py): each hop's frontier and visited set
        is an EAGER ``disk_checkpoint`` (the fold of materialization
        into the frontier count also gives early exit on an exhausted
        frontier), and the superseded generation is freed the moment
        its successor materializes — at most two generations of
        visited/frontier blocks alive, the edge blocks freed at loop
        end; only the final visited generation stays registered,
        because the returned frame reads those blocks. The oracle
        walks the identical graph with a recursive CTE under
        UNION-dedup — a different fixpoint mechanism, identical
        distances.
        """
        # module-level aliases (bottom of this file), not a call-time
        # import: the fn's globals resolve to ITS OWN module version,
        # which keeps a version-pinned copy of this query (e.g. under
        # bench's same-boot A/B) running its own lifecycle helpers
        disk_checkpoint, free_blocks = _disk_checkpoint, _free_blocks

        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        a = li.alias("a")
        b = li.alias("b")
        e, _, e_ids = disk_checkpoint(
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") != F.col("b.l_partkey")),
            )
            .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
            .distinct()
        )
        seed = e.agg(F.min("u").alias("node")).select(
            "node", F.lit(0).cast("long").alias("dist")
        )
        visited, _, vis_ids = disk_checkpoint(seed)
        # hop 0's frontier IS the visited frame — empty id list so the
        # first free doesn't hit the shared generation twice
        frontier, front_ids = visited, []
        for hop in range(1, BFS_MAX_HOPS + 1):
            nxt, n_nxt, nxt_ids = disk_checkpoint(
                frontier.join(e, frontier["node"] == e["u"])
                .select(F.col("v").alias("node"))
                .distinct()
                .join(visited, "node", "left_anti")
                .select("node", F.lit(hop).cast("long").alias("dist"))
            )
            if n_nxt == 0:  # frontier exhausted: later hops are no-ops
                free_blocks(spark, nxt_ids)
                break
            visited_next, _, vis_next_ids = disk_checkpoint(
                visited.unionByName(nxt)
            )
            # both successors are materialized: round r-1 is superseded
            free_blocks(spark, vis_ids + front_ids)
            visited, vis_ids = visited_next, vis_next_ids
            frontier, front_ids = nxt, nxt_ids
        free_blocks(spark, e_ids + front_ids)  # final visited holds the rows
        return visited.groupBy("dist").agg(F.count(F.lit(1)).alias("n_nodes"))

    return qg03_bfs_distances


_register_bfs_query()


# ---------------------------------------------------------------------------
# qg04: degree distribution + log-log tail slope (graph shape audit)
# ---------------------------------------------------------------------------

DEGREE_TAIL_MIN = 5  # fit the tail where degree >= 5


def _register_degree_distribution_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qg04_degree_distribution",
        tags=("graph", "statistics"),
        oracle=f"""
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY node),
hist AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg GROUP BY d),
pts AS (
  SELECT CAST(ROUND(ln(d), 6) AS DECIMAL(18,6)) AS x,
         CAST(ROUND(ln(n_nodes), 6) AS DECIMAL(18,6)) AS y
  FROM hist WHERE d >= {DEGREE_TAIL_MIN}),
fit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM pts)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(MAX(d) AS BIGINT) FROM deg) AS max_degree,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM hist) AS n_degree_levels,
       k AS n_fit_points,
       ROUND((k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (k * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
             6) AS tail_slope
FROM fit
""",
    )
    def qg04_degree_distribution(spark, sf_dir):
        """Degree distribution of the co-occurrence graph with a
        log-log least-squares slope over the tail — the graph-shape
        audit that picks algorithm parameters downstream: a heavy
        (power-law-ish) tail means qg02's triangle join needs
        degeneracy ordering and qd08's components need the hub-skew
        AQE split; a thin tail means plain id-ordering suffices.

        Determinism: qt21's Zipf-fit rule — each ln() point rounds to
        6 dp and fixes as DECIMAL before the moment sums, so the
        closed-form slope divides identical exact decimals in both
        engines. Scale shape: degrees are one aggregation over the
        edge endpoints, the histogram is |degree-levels| rows, and
        the fit is a 1-row moment fold — nothing after the edge list
        is corpus-sized.
        """
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        a = li.alias("a")
        b = li.alias("b")
        e = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
            .distinct()
        )
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        hist = deg.groupBy("d").agg(F.count(F.lit(1)).alias("n_nodes"))
        pts = hist.where(F.col("d") >= DEGREE_TAIL_MIN).select(
            F.round(F.log("d"), 6).cast("decimal(18,6)").alias("x"),
            F.round(F.log("n_nodes"), 6).cast("decimal(18,6)").alias("y"),
        )
        fit = pts.agg(
            F.count(F.lit(1)).alias("k"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        stats = deg.agg(
            F.count(F.lit(1)).alias("n_nodes"), F.max("d").alias("max_degree")
        ).crossJoin(hist.agg(F.count(F.lit(1)).alias("n_degree_levels")))
        slope = (
            F.col("k") * F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy").cast("double")
        ) / (
            F.col("k") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        )
        return stats.crossJoin(fit).select(
            "n_nodes",
            "max_degree",
            "n_degree_levels",
            F.col("k").alias("n_fit_points"),
            F.round(slope, 6).alias("tail_slope"),
        )

    return qg04_degree_distribution


_register_degree_distribution_query()


# ---------------------------------------------------------------------------
# qg05: BOM explosion — weighted transitive closure with quantity rollup
# ---------------------------------------------------------------------------

BOM_FANOUT = 10   # child p hangs under parent p div 10
BOM_QTY_MOD = 5   # per-edge quantity = p % 5 + 1
BOM_DEPTH = 3     # explosion depth cap (hops)


def _register_bom_rollup_query():
    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qg05_bom_rollup",
        tags=("graph", "iterative", "hierarchy"),
        oracle=f"""
WITH e AS (
  SELECT p_partkey // {BOM_FANOUT} AS parent, p_partkey AS child,
         p_partkey % {BOM_QTY_MOD} + 1 AS qty
  FROM part WHERE p_partkey >= {BOM_FANOUT}),
bom AS (
  SELECT parent AS anc, child AS descendant, qty AS eff_qty, 1 AS depth FROM e
  UNION ALL
  SELECT b.anc, e.child, b.eff_qty * e.qty, b.depth + 1
  FROM (SELECT parent AS anc, child AS descendant, qty AS eff_qty, 1 AS depth
        FROM e) b
  JOIN e ON e.parent = b.descendant
  UNION ALL
  SELECT b2.anc, e.child, b2.eff_qty * e.qty, 3
  FROM (SELECT b.anc, e2.child AS descendant, b.eff_qty * e2.qty AS eff_qty
        FROM (SELECT parent AS anc, child AS descendant, qty AS eff_qty
              FROM e) b
        JOIN e e2 ON e2.parent = b.descendant) b2
  JOIN e ON e.parent = b2.descendant)
SELECT CAST(anc AS BIGINT) AS anc,
       CAST(COUNT(*) AS BIGINT) AS n_descendants,
       CAST(SUM(eff_qty) AS BIGINT) AS total_qty,
       CAST(MAX(depth) AS BIGINT) AS max_depth
FROM bom GROUP BY anc
""",
    )
    def qg05_bom_rollup(spark, sf_dir):
        """Bill-of-materials explosion (hierarchical / recursive query
        surface): per assembly, the count of all transitive components
        within {BOM_DEPTH} levels and the TOTAL effective quantity —
        each path multiplies its edge quantities (building 1 parent
        needing 3 subassemblies of 4 screws = 12 screws). The
        WITH RECURSIVE workload class (org charts, category trees,
        dependency graphs) expressed as Spark's iterative frontier
        join; the part hierarchy is derived deterministically from
        p_partkey (child → parent = key div {BOM_FANOUT}).

        Scale shape (100 TB): each level is ONE equi-join of the
        current frontier against the edge relation on the parent key —
        the frontier never fans out beyond (paths ≤ depth cap), and
        per-level results union before one final rollup. Deep
        hierarchies localCheckpoint the frontier every few levels
        (qg01's recipe) to truncate lineage. Quantities are integer
        products — exact in both engines; DuckDB replays the same
        3-level unroll as UNION ALL branches (its recursive CTE would
        dedup or need config; the unroll IS the Spark dataflow).
        """
        p = load_table(spark, sf_dir, "part").select("p_partkey")
        e = p.filter(F.col("p_partkey") >= BOM_FANOUT).select(
            F.expr(f"p_partkey div {BOM_FANOUT}").alias("parent"),
            F.col("p_partkey").alias("child"),
            (F.col("p_partkey") % BOM_QTY_MOD + 1).alias("qty"),
        )
        frontier = e.select(
            F.col("parent").alias("anc"),
            F.col("child").alias("descendant"),
            F.col("qty").alias("eff_qty"),
            F.lit(1).alias("depth"),
        )
        levels = [frontier]
        for _ in range(1, BOM_DEPTH):
            frontier = (
                frontier.alias("f")
                .join(e.alias("e"), F.col("f.descendant") == F.col("e.parent"))
                .select(
                    F.col("f.anc").alias("anc"),
                    F.col("e.child").alias("descendant"),
                    (F.col("f.eff_qty") * F.col("e.qty")).alias("eff_qty"),
                    (F.col("f.depth") + 1).alias("depth"),
                )
            )
            levels.append(frontier)
        bom = levels[0]
        for lv in levels[1:]:
            bom = bom.unionAll(lv)
        return bom.groupBy(F.col("anc").cast("long").alias("anc")).agg(
            F.count(F.lit(1)).alias("n_descendants"),
            F.sum("eff_qty").cast("long").alias("total_qty"),
            F.max("depth").cast("long").alias("max_depth"),
        )

    return qg05_bom_rollup


_register_bom_rollup_query()


# ---------------------------------------------------------------------------
# qg06: cheapest 2-hop substitution paths (min-plus product over a join key)
# ---------------------------------------------------------------------------

SUBST_TOP_PARTNERS = 3


def _register_substitution_path_query():
    from pyspark.sql import Window as W
    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register(
        "qg06_substitution_paths",
        tags=("graph", "join"),
        oracle=f"""
WITH e AS (
  SELECT l_suppkey AS s, l_partkey AS p,
         MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS w
  FROM lineitem GROUP BY 1, 2),
allpaths AS (
  SELECT a.s AS s_a, b.s AS s_b, a.p AS via_part, a.w + b.w AS dcost
  FROM e a JOIN e b ON a.p = b.p AND a.s < b.s),
flat AS (
  SELECT s_a, s_b, via_part, CAST(dcost AS DOUBLE) AS cost FROM (
    SELECT s_a, s_b, via_part, dcost,
           ROW_NUMBER() OVER (PARTITION BY s_a, s_b
                              ORDER BY dcost, via_part) AS rn
    FROM allpaths) t WHERE rn = 1),
ranked AS (
  SELECT s_a, s_b, via_part, cost,
         CAST(ROW_NUMBER() OVER (PARTITION BY s_a
              ORDER BY cost, s_b) AS BIGINT) AS partner_rank
  FROM flat)
SELECT s_a, s_b, CAST(via_part AS BIGINT) AS via_part, cost, partner_rank
FROM ranked WHERE partner_rank <= {SUBST_TOP_PARTNERS}
""",
    )
    def qg06_substitution_paths(spark, sf_dir):
        """Min-plus path product (the weighted-graph operation qg03's
        unweighted BFS lacks): for every supplier, the
        {SUBST_TOP_PARTNERS} cheapest 2-hop substitution partners —
        suppliers reachable through a shared part, path cost = sum of
        the two cheapest offers, with the connecting part carried via
        struct-min argmin. The supply-chain "who can replace whom and
        at what cost" query; one min-plus relaxation step of the
        general shortest-path semiring, expressed as an equi-join on
        the intermediate node.

        Determinism: weights are DECIMAL minima; path costs are exact
        DECIMAL sums; the argmin struct orders (cost, part) and the
        partner rank ties on s_b. DuckDB's MIN(ROW(...)) replays the
        struct-min lexicographically, same as Spark's min(struct).

        Scale shape (100 TB): edges collapse to (supplier, part) grain
        first (map-side); the 2-hop product is an equi-join ON THE
        PART KEY — never supplier×supplier — so fan-out is bounded by
        per-part supplier counts (AQE-splittable on popular parts,
        the same hub discipline as qg02's degeneracy orientation);
        per-pair min collapses before ranking; top-k per supplier is
        a bounded window."""
        li = load_table(spark, sf_dir, "lineitem")
        e = li.groupBy(
            F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
        ).agg(F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias("w"))
        a = e.select(F.col("s").alias("s_a"), "p", F.col("w").alias("w_a"))
        b = e.select(F.col("s").alias("s_b"), "p", F.col("w").alias("w_b"))
        paths = (
            a.join(b, "p")
            .where(F.col("s_a") < F.col("s_b"))
            .groupBy("s_a", "s_b")
            .agg(
                F.min(
                    F.struct(
                        (F.col("w_a") + F.col("w_b")).alias("cost"),
                        F.col("p").alias("via_part"),
                    )
                ).alias("best")
            )
        )
        flat = paths.select(
            "s_a",
            "s_b",
            F.col("best.via_part").cast("long").alias("via_part"),
            F.col("best.cost").cast("double").alias("cost"),
        )
        w = W.partitionBy("s_a").orderBy("cost", "s_b")
        return (
            flat.select(
                "s_a",
                "s_b",
                "via_part",
                "cost",
                F.row_number().over(w).cast("long").alias("partner_rank"),
            )
            .filter(F.col("partner_rank") <= SUBST_TOP_PARTNERS)
        )

    return qg06_substitution_paths


_register_substitution_path_query()


# ---------------------------------------------------------------------------
# qg07: k-core decomposition by bounded peeling
# ---------------------------------------------------------------------------

KCORE_K = 100  # degree threshold (between the 25th and 50th pct at sf0.01)
KCORE_ROUNDS = 4  # bounded peel rounds — both engines run exactly this many


def _kcore_oracle() -> str:
    # every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and a
    # peeling chain where round r references round r-1 several times
    # would re-evaluate the whole prefix exponentially (the round-5
    # k-core attempt ran >13 min for exactly this reason; materialized,
    # it runs in ~0.1 s).
    parts = [
        "li AS (SELECT l_orderkey, l_partkey FROM lineitem)",
        """e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)""",
    ]
    sel = [
        "SELECT CAST(0 AS BIGINT) AS round,"
        " (SELECT CAST(COUNT(*) AS BIGINT) FROM"
        " (SELECT u FROM e0 UNION SELECT v FROM e0)) AS n_nodes,"
        " (SELECT CAST(COUNT(*) AS BIGINT) FROM e0) AS n_edges"
    ]
    prev = "e0"
    for r in range(1, KCORE_ROUNDS + 1):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT node, COUNT(*) AS d FROM"
            f" (SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev})"
            " GROUP BY node)"
        )
        parts.append(
            f"k{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE d >= {KCORE_K})"
        )
        parts.append(
            f"e{r} AS MATERIALIZED (SELECT u, v FROM {prev}"
            f" WHERE u IN (SELECT node FROM k{r})"
            f" AND v IN (SELECT node FROM k{r}))"
        )
        sel.append(
            f"SELECT CAST({r} AS BIGINT),"
            f" (SELECT CAST(COUNT(*) AS BIGINT) FROM k{r}),"
            f" (SELECT CAST(COUNT(*) AS BIGINT) FROM e{r})"
        )
        prev = f"e{r}"
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(sel)


def _register_kcore_query():
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.plans.registry import register
    from event_stream_aggr_spark.tables import load_table

    @register("qg07_kcore_peeling", bench=True, tags=("graph", "scale"), oracle=_kcore_oracle())
    def qg07_kcore_peeling(spark, sf_dir):
        """k-core decomposition by degree peeling (Seidman 1983; the
        curation-side cohesion filter — for a co-occurrence or link
        graph, the k-core is the maximal subgraph where every node
        keeps >= k neighbors, the standard dense-community extractor
        and the graph analogue of qt14's quality gate): each round
        drops nodes whose CURRENT degree is < k and the edges they
        carried, until the core stabilizes. Rounds are BOUNDED at
        {KCORE_ROUNDS} — a fixed iteration count both engines execute
        identically (the qg01/qg05 bounded-Pregel contract) — and the
        output is the per-round (n_nodes, n_edges) peeling trajectory,
        so convergence (or not) is part of the verified result rather
        than a driver-side loop condition.

        Scale shape (100 TB) — round-9 rewrite after the 30x probe
        caught the previous variant hoarding EVERY round's eagerly
        localCheckpoint'ed edge blocks in block-manager memory (round
        4 still co-resident with round 0: ~31 GB at sf3 sharing ONE
        unified pool with the edge-build agg hash maps → 7.9 GB
        spill). Per-round state now has an explicit bounded lifecycle
        (see ``_disk_checkpoint`` / ``_free_blocks``):

        * each round's surviving edge set is localCheckpoint'ed at
          ``DISK_ONLY`` — lineage truncated (round r+1 never replays
          rounds 1..r) AND the bytes live on local disk, never as
          evictable tenants of the unified execution pool;
        * the per-round (n_nodes, n_edges) counts are taken EAGERLY
          (they are the query's entire {KCORE_ROUNDS}+1-row output;
          the same bounded driver-action contract as qe15/qe19's
          documented loops), so nothing lazy references a prior round;
        * round r-1's blocks are freed as soon as round r has
          materialized — at most TWO generations of the shrinking edge
          relation exist at any instant, independent of KCORE_ROUNDS.

        Degree aggs stay map-side combinable; the two semi-join probes
        broadcast the (small, shrinking) survivor node-list so the
        edge relation never shuffles during a peel. If |nodes| ever
        outgrew the broadcast budget, drop the hint and these become
        shuffled equi semi-joins — still never more than 2 edge
        shuffles/round (fallback executed in tests/test_plan_shapes).

        Rejected alternatives, both measured at sf0.1: pure
        recompute-over-checkpoint (no persistence, one job,
        ReuseExchange dedup) ran 10x slower — optimizer tree-copying
        destroys DAG sharing, so each stats branch re-ran the
        self-join edge build; ``persist(DISK_ONLY)``+``unpersist``
        ran 5x slower — un-caching round r-1 cascade-invalidates the
        dependent round-r cache entry (SPARK-24596 semantics), so
        round r+1 recomputed from parquet. localCheckpoint truncates
        lineage, which makes the freed generation genuinely
        unreferenced. The oracle runs the identical bounded chain with
        MATERIALIZED CTEs (plain CTEs re-evaluate the peeling prefix
        exponentially — the documented DuckDB hazard that sank the
        first k-core attempt)."""
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
        width = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # The ONE-SHOT edge build is the loop's residual spill source
        # (round-9 30x probe: ~36M pre-distinct pairs deduped through
        # the session's default 32-wide shuffle put pairs/32 rows in
        # each hash map — 8.6 GB map-side spill in one JVM; widening
        # to 256 cut it 45%). Derive that ONE exchange's width from
        # the estimated pair count (sum over orders of C(lines,2) —
        # one map-side-combinable count agg, the qz04 stats recipe)
        # instead of shipping the lucky constant: the conf is set only
        # around this materialization (the planner reads
        # shuffle.partitions when the action compiles the exchange),
        # so every later stage keeps the session width. At bench scale
        # the estimate lands BELOW the session width and the clamp
        # keeps 32 — behavior only changes where the spill lives.
        in_bytes = _lineitem_bytes(sf_dir)
        if in_bytes is not None and in_bytes < KCORE_PAIR_STATS_MIN_BYTES:
            # small local input: skip the stats job (free gate — a
            # file stat, no Spark action; bench-scale behavior is
            # byte-identical to the ungated plan). Honest caveat: the
            # BYTES gate assumes this repo's data shape (bounded lines
            # per order) — the spill hazard is sum C(n,2), so a tiny
            # file with one million-line order would slip through;
            # set KCORE_PAIR_STATS_MIN_BYTES = 0 to always price it
            pair_width = width
        else:
            pair_width = _kcore_pair_width(li, width)
        # SCOPE CAVEAT (round-10 ADVICE): these two confs are
        # SESSION-GLOBAL for the duration of the edge-build action —
        # any query COMPILED concurrently in the same SparkSession
        # during that window would pick up the widened width / 8 MB
        # advisory. This repo's drivers (bench, tests, the CLI) run
        # queries strictly sequentially per session, so the window is
        # private in practice; a caller embedding qg07 in a
        # concurrent-query server should run it in its own
        # spark.newSession() (confs are per-session there) before
        # relying on this block.
        saved_parts = spark.conf.get("spark.sql.shuffle.partitions")
        saved_adv = spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        )
        try:
            spark.conf.set("spark.sql.shuffle.partitions", str(pair_width))
            if pair_width > width:
                # without this, AQE re-coalesces the widened exchanges
                # back to its 64 MB advisory and the dedup hash maps
                # spill anyway (same-boot A/B at k=30: width alone cut
                # spill 8.6 GB -> 4.3 GB; width + 8 MB advisory -> 0,
                # at ~+16% wall-clock of which 3.2s is the stats job)
                spark.conf.set(
                    "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m"
                )
            edges, n_edges, edge_ids = _disk_checkpoint(
                li.join(b, "l_orderkey")
                .filter(F.col("l_partkey") < F.col("v"))
                .select(F.col("l_partkey").alias("u"), "v")
                .distinct()
                # narrow coalesce back to the session width: the WIDE
                # part (each dedup hash map sees a bounded pair slice
                # — the spill bound) fuses upstream of it, while the
                # checkpoint blocks and every later round's scan keep
                # the session layout (a 288-block edge relation taxed
                # each peel round ~14% in the A/B without this)
                .coalesce(width)
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", saved_parts)
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", saved_adv
            )
        n_nodes = (
            edges.select(F.col("u").alias("node"))
            .union(edges.select("v"))
            .distinct()
            .count()
        )
        trajectory = [(0, n_nodes, n_edges)]

        cur, cur_ids = edges, edge_ids
        prev_edges, prev_nodes = n_edges, n_nodes
        for r in range(1, KCORE_ROUNDS + 1):
            # checkpoint the (tiny) survivor list too, so the degree
            # agg runs once per round — the broadcast build and the
            # n_nodes count both read the materialized node list.
            # Both checkpoints coalesce to a size derived from the
            # PREVIOUS round's (known, monotonically shrinking) row
            # counts: peeling leaves the shuffle's 64-partition layout
            # on an ever-smaller relation, and checkpointing 64
            # near-empty blocks per round costs more in task/block
            # overhead than the data (measured ~25% of qg07's sf0.1
            # wall-clock). ``coalesce`` is narrow — no extra shuffle.
            keep, n_keep, keep_ids = _disk_checkpoint(
                _kcore_survivors(cur).coalesce(
                    _kcore_parts(prev_nodes, KCORE_NODE_ROWS_PER_PART, width)
                )
            )
            nxt, n_nxt, nxt_ids = _disk_checkpoint(
                _kcore_prune(cur, keep).coalesce(
                    _kcore_parts(prev_edges, KCORE_EDGE_ROWS_PER_PART, width)
                )
            )
            trajectory.append((r, n_keep, n_nxt))
            _free_blocks(spark, cur_ids + keep_ids)  # r-1: freed, not hoarded
            cur, cur_ids = nxt, nxt_ids
            prev_edges, prev_nodes = n_nxt, n_keep
        _free_blocks(spark, cur_ids)
        return spark.createDataFrame(
            trajectory, "round long, n_nodes long, n_edges long"
        )

    return qg07_kcore_peeling


KCORE_EDGE_ROWS_PER_PART = 250_000  # edge checkpoint sizing (2 longs/row)
#: node lists are denser per row AND their coalesce sits directly on
#: the degree-agg's reduce side — too few partitions would collapse
#: the whole node-grain aggregation into one task (measured ~1s/round
#: at sf0.1), so node relations partition much finer per row
KCORE_NODE_ROWS_PER_PART = 5_000


#: below this local input size the edge-build stats job is skipped
#: outright (the session layout is already spill-safe there): sf0.1's
#: lineitem is ~11 MB, the k=30 probe's ~364 MB — the gate separates
#: "bench scale, keep the exact old plan for free" from "probe/cluster
#: scale, spend one count-per-order agg to bound the dedup spill"
KCORE_PAIR_STATS_MIN_BYTES = 64 * 1024 * 1024


def _lineitem_bytes(sf_dir: str):
    """Best-effort LOCAL byte size of the lineitem input (file or
    dir); None for non-local paths — the caller then runs the stats
    pass unconditionally (anything reached through a cluster
    filesystem is big enough for the stats job to pay off)."""
    import os

    p = os.path.join(sf_dir, "lineitem.parquet")
    try:
        if os.path.isfile(p):
            return os.path.getsize(p)
        if os.path.isdir(p):
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(p)
                for f in fs
            )
    except OSError:
        pass
    return None


#: target pre-distinct pair rows per edge-build dedup task: sized so
#: each task's partial-agg hash map stays well inside executor memory
#: (2 longs/row + open-hash overhead; the measured-good 256 width at
#: ~36M pairs is ~140k rows/task — 125k adds headroom)
KCORE_PAIR_ROWS_PER_PART = 125_000
KCORE_PAIR_MAX_PARTS = 4096  # runaway-estimate backstop


def _kcore_pair_width(li, session_width: int) -> int:
    """Shuffle width for the one-shot edge-build dedup, derived from
    the estimated pre-distinct pair count: each order with n lines
    emits C(n,2) = n*(n-1)/2 candidate pairs through the self-join's
    ``u < v`` filter (an upper bound — duplicate partkeys within an
    order emit fewer). The estimate is ONE count-per-order aggregate
    reduced to a single sum — metadata-grain, map-side combinable —
    and the width is clamped to [session_width, KCORE_PAIR_MAX_PARTS]
    so small inputs keep the session layout and a bad stat can't buy
    unbounded tiny tasks."""
    import math

    row = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.expr("n * (n - 1) div 2")).alias("pairs"))
        .first()
    )
    pairs = int(row.pairs or 0) if row else 0
    return max(
        session_width,
        min(
            KCORE_PAIR_MAX_PARTS,
            math.ceil(max(pairs, 1) / KCORE_PAIR_ROWS_PER_PART),
        ),
    )


def _kcore_parts(upper_bound_rows: int, rows_per_part: int, max_parts: int) -> int:
    """Partition count for a round's checkpoint, from the previous
    round's row count (an upper bound — peeling only shrinks): enough
    parallelism for the next round's scans, never ``max_parts``
    near-empty blocks. Clamped to [1, max_parts] — the caller passes
    the session's shuffle width, so the bound tracks configuration."""
    import math

    return max(
        1, min(max_parts, math.ceil(max(upper_bound_rows, 1) / rows_per_part))
    )


def _kcore_survivors(cur):
    """Nodes whose current degree >= KCORE_K: one map-side combinable
    hash agg over the checkpointed edge relation."""
    from pyspark.sql import functions as F

    deg = (
        cur.select(F.col("u").alias("node"))
        .unionAll(cur.select("v"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return deg.filter(F.col("d") >= KCORE_K).select("node")


def _kcore_prune(cur, keep):
    """Surviving edges: two broadcast LEFT SEMI probes of the keep
    list (lazy — the caller checkpoints and counts it). Split out of
    qg07 so the per-round plan shape is assertable in isolation
    (tests/test_plan_shapes.py pins: broadcast semi-joins, no
    sort-merge/Cartesian)."""
    from pyspark.sql import functions as F

    kb = F.broadcast(keep)
    return cur.join(kb, cur["u"] == kb["node"], "left_semi").join(
        kb, F.col("v") == kb["node"], "left_semi"
    )


def _kcore_peel_round(cur):
    """One peel round over a materialized edge relation: (keep, next)."""
    keep = _kcore_survivors(cur)
    return keep, _kcore_prune(cur, keep)


# the bounded-iteration lifecycle lives in operators/lifecycle.py
# (shared with connected_components); these aliases keep qg07's
# call sites and the plan-shape tests stable
from event_stream_aggr_spark.operators.lifecycle import (  # noqa: E402
    disk_checkpoint as _disk_checkpoint,
    free_blocks as _free_blocks,
)


_register_kcore_query()

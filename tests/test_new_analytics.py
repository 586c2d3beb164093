"""Semantic invariants + independent recounts for the round-5 late
additions (q80 Markov, q81 Welch A/B, q82 Gini, qa04 equi-depth
histogram, qt26 PMI, qt27 RAKE, qg05 BOM rollup, qe17 RRF fusion,
qe18 confusion metrics). Exact cross-engine equality is the oracle
harness's job; these tests assert the properties the oracle can't —
conservation laws, independent recomputation, and rank-consistency."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from event_stream_aggr_spark.operators.cluster import (
    BOM_DEPTH,
    BOM_FANOUT,
    BOM_QTY_MOD,
)
from event_stream_aggr_spark.operators.maintenance import HIST_BINS
from event_stream_aggr_spark.operators.similarity import (
    RRF_CHANNEL_K,
    RRF_K,
    RRF_OUT_K,
    qe17_hybrid_rrf,
)
from event_stream_aggr_spark.operators.text import qt26_pmi_collocations
from event_stream_aggr_spark.plans.registry import load_all

QUERIES = load_all()
from event_stream_aggr_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_q80_probability_conservation(spark):
    """Per previous-type, transition counts sum to that type's total
    outgoing transitions (= events-with-a-predecessor), and the
    integer per-mille probabilities sum to 1000 minus at most the
    truncation loss (< n_next_types)."""
    res = QUERIES["q80_markov_transitions"].fn(spark, SF_DIR).collect()
    e = load_table(spark, SF_DIR, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert sum(r.n for r in res) == n_events - n_users
    by_prev: dict[str, list] = {}
    for r in res:
        by_prev.setdefault(r.prev_type, []).append(r)
    for prev, rows in by_prev.items():
        p_sum = sum(r.p_permille for r in rows)
        assert 1000 - len(rows) < p_sum <= 1000, (prev, p_sum)


def test_qa04_histogram_partition_laws(spark):
    """Bins form a disjoint increasing cover, counts conserve the
    table rowcount, the decimal sums conserve the exact total, and
    each bin's population is within one micro-bucket of N/bins (the
    documented bucket-granularity error bound)."""
    q = QUERIES["qa04_equidepth_histogram"].fn
    rows = sorted(q(spark, SF_DIR).collect(), key=lambda r: r.bin)
    li = load_table(spark, SF_DIR, "lineitem")
    n_total = li.count()
    exact_sum = li.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
    ).collect()[0][0]
    assert [r.bin for r in rows] == list(range(HIST_BINS))
    assert sum(r.n_rows for r in rows) == n_total
    assert abs(sum(r.sum_price for r in rows) - exact_sum) < 1e-6 * exact_sum
    # disjoint increasing ranges
    for a, b in zip(rows, rows[1:]):
        assert a.lo_bound < a.hi_bound <= b.lo_bound < b.hi_bound
    # equi-depth up to micro-bucket granularity: a bin can overshoot
    # N/bins by at most the largest single micro-bucket's population
    max_bucket = (
        li.groupBy(
            F.expr("cast(floor(l_extendedprice) as bigint) div 100")
        ).count().agg(F.max("count")).collect()[0][0]
    )
    target = n_total / HIST_BINS
    for r in rows:
        assert r.n_rows <= target + max_bucket, (r.bin, r.n_rows)


def test_qt26_pmi_is_ln_of_ratio_and_counts_recount(spark):
    """PMI column is ln(ratio_ppm/1e6) to 6dp; ranks descend on the
    integer ratio; unigram counts agree with an independent token
    recount for every surfaced word."""
    rows = qt26_pmi_collocations(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 40
    ratios = [r.ratio_ppm for r in rows]
    assert ratios == sorted(ratios, reverse=True)
    for r in rows:
        assert r.c_xy >= 5
        assert abs(r.pmi - round(math.log(r.ratio_ppm / 1e6), 6)) <= 1e-9
    d = load_table(spark, SF_DIR, "documents")
    toks = d.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
        ).alias("tok")
    )
    wanted = {w for r in rows for w in (r.x, r.y)}
    counts = {
        r.tok: r.n
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("tok").isin(*wanted))
        .collect()
    }
    for r in rows:
        assert counts[r.x] == r.c_x and counts[r.y] == r.c_y, r


def test_qg05_bom_rollup_matches_pure_python_recount(spark):
    """Independent recount: rebuild the derived part tree driver-side
    and recompute every ancestor's transitive (count, total effective
    quantity, max depth) by directly walking ≤3 levels."""
    res = {
        r.anc: r for r in QUERIES["qg05_bom_rollup"].fn(spark, SF_DIR).collect()
    }
    keys = [
        r.p_partkey
        for r in load_table(spark, SF_DIR, "part").select("p_partkey").collect()
    ]
    children: dict[int, list[tuple[int, int]]] = {}
    for p in keys:
        if p >= BOM_FANOUT:
            children.setdefault(p // BOM_FANOUT, []).append(
                (p, p % BOM_QTY_MOD + 1)
            )
    expected: dict[int, list[tuple[int, int]]] = {}

    def walk(anc: int, node: int, qty: int, depth: int) -> None:
        expected.setdefault(anc, []).append((qty, depth))
        if depth < BOM_DEPTH:
            for ch, q in children.get(node, []):
                walk(anc, ch, qty * q, depth + 1)

    for anc, kids in children.items():
        for ch, q in kids:
            walk(anc, ch, q, 1)
    assert set(res) == set(expected)
    for anc, paths in expected.items():
        r = res[anc]
        assert r.n_descendants == len(paths)
        assert r.total_qty == sum(q for q, _ in paths)
        assert r.max_depth == max(d for _, d in paths)


def test_qe17_rrf_scores_consistent_with_channel_ranks(spark):
    """Fused rows carry self-consistent arithmetic (rrf_ppm equals the
    integer contributions implied by the reported channel ranks), the
    fused list is a per-query descending top-5, and every fused hit
    appeared in at least one channel's top-20."""
    rows = qe17_hybrid_rrf(spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    assert len(by_q) == 8
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, RRF_OUT_K + 1))
        scores = [r.rrf_ppm for r in rs]
        assert scores == sorted(scores, reverse=True)
        for r in rs:
            expect = 0
            if 0 < r.cos_rank <= RRF_CHANNEL_K:
                expect += 1_000_000 // (RRF_K + r.cos_rank)
            if 0 < r.mip_rank <= RRF_CHANNEL_K:
                expect += 1_000_000 // (RRF_K + r.mip_rank)
            assert r.rrf_ppm == expect and expect > 0, r


def test_qe17_plan_is_single_broadcast_product_no_shuffle_join(spark):
    """Fusion adds NO join: the physical plan has exactly the one
    broadcast product for scoring (corpus × 8 anchors) and no
    SortMergeJoin/ShuffledHashJoin; the three windows share the qid
    partitioning."""
    plan = qe17_hybrid_rrf(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in plan


def test_q81_welch_recount(spark):
    """Recompute the Welch z per event type driver-side from the raw
    values (float sums, so compare to 3dp) and check the flag is
    exactly |rounded z| > 1.96."""
    res = {r.event_type: r for r in QUERIES["q81_ab_welch_z"].fn(spark, SF_DIR).collect()}
    raw = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", (F.col("user_id") % 2).alias("v"), "value")
        .collect()
    )
    groups: dict[tuple, list] = {}
    for r in raw:
        groups.setdefault((r.event_type, r.v), []).append(r.value)
    for et, r in res.items():
        a, b = groups[(et, 0)], groups[(et, 1)]
        assert (r.n_a, r.n_b) == (len(a), len(b))
        ma, mb = sum(a) / len(a), sum(b) / len(b)
        va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
        vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
        z = (ma - mb) / math.sqrt(va / len(a) + vb / len(b))
        assert abs(r.z - z) < 5e-4, (et, r.z, z)
        assert r.significant == (1 if abs(r.z) > 1.96 else 0)


def test_q82_gini_recount(spark):
    """Pure-python Gini over the customer revenue rollup matches, and
    the value sits in (0, 1)."""
    r = QUERIES["q82_revenue_gini"].fn(spark, SF_DIR).collect()[0]
    revs = sorted(
        x.rev
        for x in load_table(spark, SF_DIR, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
        .collect()
    )
    n = len(revs)
    total = float(sum(revs))
    weighted = float(sum((i + 1) * float(v) for i, v in enumerate(revs)))
    gini = (2.0 * weighted - (n + 1) * total) / (n * total)
    assert r.n_customers == n
    assert abs(r.gini - gini) < 1e-6
    assert 0.0 < r.gini < 1.0


def test_qt27_rake_matches_pure_python(spark):
    """Full independent RAKE reimplementation driver-side (phrase
    segmentation, degree/freq word scores, occurrence scoring) —
    top-20 must match exactly."""
    from event_stream_aggr_spark.operators.text import (
        RAKE_MAX_WORDS,
        RAKE_MIN_WORDS,
        RAKE_TOP_K,
        STOPWORDS_EN,
        qt27_rake_keyphrases,
    )

    res = [
        (r.phrase, r.n_words, r.n_occurrences, r.score_ppm)
        for r in qt27_rake_keyphrases(spark, SF_DIR).collect()
    ]
    docs = load_table(spark, SF_DIR, "documents").select("text").collect()
    stop = set(STOPWORDS_EN)
    cands = []  # list of tuple-of-words
    for d in docs:
        run: list[str] = []
        for tok in [t for t in d.text.lower().split(" ") if t]:
            if tok in stop:
                if run:
                    cands.append(tuple(run))
                run = []
            else:
                run.append(tok)
        if run:
            cands.append(tuple(run))
    cands = [c for c in cands if len(c) <= RAKE_MAX_WORDS]
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    for c in cands:
        for w in c:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(c)
    wscore = {w: (deg[w] * 1_000_000) // freq[w] for w in freq}
    by_phrase: dict[tuple, list[int]] = {}
    for c in cands:
        if len(c) >= RAKE_MIN_WORDS:
            by_phrase.setdefault(c, []).append(sum(wscore[w] for w in c))
    ptype = [
        (" ".join(c), len(c), len(ss), sum(ss) // len(ss))
        for c, ss in by_phrase.items()
    ]
    ptype.sort(key=lambda t: (-t[3], t[0]))
    assert res == ptype[:RAKE_TOP_K]


def test_qe18_confusion_metric_laws(spark):
    """Per-label: tp ≤ min(n_true, n_pred); F1 is the integer harmonic
    mean of the reported ppm metrics; supports recount to the label
    distribution; micro-accuracy matches the majority-mass bound."""
    rows = QUERIES["qe18_cluster_confusion"].fn(spark, SF_DIR).collect()
    emb_counts = {
        r.label: r.n
        for r in load_table(spark, SF_DIR, "embeddings")
        .groupBy(F.col("label").cast("long").alias("label"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r.label for r in rows} == set(emb_counts)
    assert sum(r.n_pred for r in rows) == sum(emb_counts.values())
    for r in rows:
        assert r.n_true == emb_counts[r.label]
        assert 0 <= r.tp <= min(r.n_true, r.n_pred) if r.n_pred else r.tp == 0
        if r.precision_ppm + r.recall_ppm > 0:
            assert r.f1_ppm == (2 * r.precision_ppm * r.recall_ppm) // (
                r.precision_ppm + r.recall_ppm
            )
        else:
            assert r.f1_ppm == 0


def test_qs14_dsir_resample_draw_laws(spark):
    """The Gumbel-top-k draw: (a) keys recompute exactly from the
    reported log-weight and the content-derived Gumbel noise; (b) no
    target-language docs appear; (c) the draw is biased toward high
    weights — the selected docs' mean log-weight strictly exceeds the
    out-of-target population mean."""
    from event_stream_aggr_spark.operators.text import (
        DSIR_TARGET_LANG,
        dsir_doc_weights,
    )

    rows = QUERIES["qs14_dsir_resample"].fn(spark, SF_DIR).collect()
    assert len(rows) == 50
    assert all(r.lang != DSIR_TARGET_LANG for r in rows)
    pop = (
        dsir_doc_weights(load_table(spark, SF_DIR, "documents"))
        .where(F.col("lang") != DSIR_TARGET_LANG)
        .select(F.col("doc_id"), F.col("wdec").cast("double").alias("w"))
        .collect()
    )
    pop_w = {r.doc_id: r.w for r in pop}
    import hashlib

    for r in rows:
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:7], 16)
        u = (h + 0.5) / 16**7
        g_us = math.floor(-math.log(-math.log(u)) * 1e6 + 0.5)
        w_us = round(pop_w[r.doc_id] * 1e6)
        assert r.key_us == w_us + g_us, (r.doc_id, r.key_us, w_us + g_us)
    sel_mean = sum(r.log_weight for r in rows) / len(rows)
    pop_mean = sum(pop_w.values()) / len(pop_w)
    assert sel_mean > pop_mean


def test_q83_latency_recount(spark):
    """Driver-side recount of the signup→purchase latency population
    and its nearest-rank percentiles."""
    r = QUERIES["q83_conversion_latency"].fn(spark, SF_DIR).collect()[0]
    ev = (
        load_table(spark, SF_DIR, "events")
        .selectExpr(
            "user_id",
            "event_type",
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            " AS tsm",
        )
        .collect()
    )
    first_signup: dict[int, int] = {}
    for e in ev:
        if e.event_type == "signup":
            if e.user_id not in first_signup or e.tsm < first_signup[e.user_id]:
                first_signup[e.user_id] = e.tsm
    first_purchase: dict[int, int] = {}
    for e in ev:
        if (
            e.event_type == "purchase"
            and e.user_id in first_signup
            and e.tsm > first_signup[e.user_id]
        ):
            if (
                e.user_id not in first_purchase
                or e.tsm < first_purchase[e.user_id]
            ):
                first_purchase[e.user_id] = e.tsm
    deltas = sorted(
        (first_purchase[u] - first_signup[u], u) for u in first_purchase
    )
    n = len(deltas)
    assert r.n_signups == len(first_signup)
    assert r.n_converted == n
    for p, got in ((0.50, r.p50_s), (0.90, r.p90_s), (0.99, r.p99_s)):
        assert got == deltas[math.ceil(p * n) - 1][0] // 1_000_000


def test_qh03_ams_sign_balance_and_estimate_quality(spark):
    """The AMS estimator: exact F2 recount matches the query's
    f2_exact; the sketch estimate is within 3/sqrt(k) relative error
    of truth (the AMS variance bound gives std ≈ sqrt(2/k)·F2 for
    near-uniform frequencies; 3σ with k=8 ≈ 1.5 — loose but
    non-vacuous, and the measured value is asserted far tighter by
    rel_err_ppm consistency)."""
    from event_stream_aggr_spark.operators.sketch import AMS_K

    r = QUERIES["qh03_ams_f2_sketch"].fn(spark, SF_DIR).collect()[0]
    freqs = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .count()
        .collect()
    )
    f2 = sum(x["count"] ** 2 for x in freqs)
    assert r.f2_exact == f2
    diff = (r.f2_estimate - r.f2_exact) * 1_000_000
    trunc = abs(diff) // f2 * (1 if diff >= 0 else -1)  # div truncates
    assert r.rel_err_ppm == trunc
    assert abs(r.f2_estimate - f2) / f2 <= 3 * math.sqrt(2 / AMS_K)


def test_qz04_salt_factors_recount(spark):
    """Planner laws: shares sum to ~10000bp, every skewed key's salt
    factor equals ceil(n/mean) and is ≥ 2, non-skewed keys get 1."""
    rows = QUERIES["qz04_skew_planner"].fn(spark, SF_DIR).collect()
    total = sum(r.n_rows for r in rows)
    k = len(rows)
    assert total > 0 and k > 0
    assert sum(r.share_bp for r in rows) <= 10000
    for r in rows:
        skewed = r.n_rows * k > 2 * total
        assert r.skewed == int(skewed)
        if skewed:
            expect = (r.n_rows * k + total - 1) // total
            assert r.salt_factor == expect >= 2
        else:
            assert r.salt_factor == 1


def test_qs15_apportionment_conservation(spark):
    """Hamilton-apportionment laws: Σ final_quota == budget exactly
    (the property naive rounding breaks); every source gets
    quota_base or quota_base+1; extra seats go to the largest
    remainders (recounted driver-side)."""
    rows = QUERIES["qs15_mixture_apportionment"].fn(spark, SF_DIR).collect()
    total_tokens = sum(r.tokens for r in rows)
    budget = total_tokens // 2
    assert sum(r.final_quota for r in rows) == budget
    sw = sum(r.weight for r in rows)
    rem = {}
    for r in rows:
        assert r.weight == math.floor(math.sqrt(r.tokens))
        assert r.quota_base == (budget * r.weight) // sw
        assert r.final_quota - r.quota_base == r.extra in (0, 1)
        rem[r.source] = (budget * r.weight) % sw
    extras = {r.source for r in rows if r.extra}
    order = sorted(rem, key=lambda s: (-rem[s], s))
    assert extras == set(order[: len(extras)])


def test_qm07_dhash_full_recount(spark):
    """Pure-python dHash + banding + hamming over the whole corpus
    must reproduce the candidate relation exactly."""
    from event_stream_aggr_spark.operators.multimodal import (
        DHASH_BAND_BITS,
        DHASH_BANDS,
        DHASH_GRID,
    )

    rows = {
        (r.doc_a, r.doc_b): (r.n_shared_bands, r.hamming)
        for r in QUERIES["qm07_perceptual_neardup"].fn(spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    hashes: dict[int, int] = {}
    for d in docs:
        buf = d.text.encode()
        if len(buf) < DHASH_GRID * DHASH_GRID:
            continue
        h = 0
        for r in range(DHASH_GRID):
            row = buf[r * DHASH_GRID : (r + 1) * DHASH_GRID]
            for c in range(DHASH_GRID - 1):
                if row[c] < row[c + 1]:
                    h |= 1 << (r * (DHASH_GRID - 1) + c)
        hashes[d.doc_id] = h
    expected: dict[tuple, int] = {}
    ids = sorted(hashes)
    buckets: dict[tuple, list[int]] = {}
    for i in ids:
        for b in range(DHASH_BANDS):
            bv = (hashes[i] >> (b * DHASH_BAND_BITS)) & (2**DHASH_BAND_BITS - 1)
            buckets.setdefault((b, bv), []).append(i)
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                a, b_ = members[x], members[y]
                expected[(a, b_)] = expected.get((a, b_), 0) + 1
    assert set(rows) == set(expected) and len(rows) > 0
    for (a, b_), (n_bands, ham) in rows.items():
        assert n_bands == expected[(a, b_)]
        assert ham == bin(hashes[a] ^ hashes[b_]).count("1")


def test_qa05_fd_strength_laws(spark):
    """doc_id → source is an exact FD (strength 10⁶, flagged); every
    strength lies in (0, 10⁶]; source→lang recounted driver-side."""
    rows = {(r.lhs, r.rhs): r for r in QUERIES["qa05_fd_profile"].fn(spark, SF_DIR).collect()}
    key_row = rows[("doc_id", "source")]
    assert key_row.exact_fd == 1 and key_row.strength_ppm == 1_000_000
    for r in rows.values():
        assert 0 < r.strength_ppm <= 1_000_000
        assert r.exact_fd == (1 if r.strength_ppm == 1_000_000 else 0)
    docs = load_table(spark, SF_DIR, "documents").select("source", "lang").collect()
    groups: dict[str, dict[str, int]] = {}
    for d in docs:
        groups.setdefault(d.source, {}).setdefault(d.lang, 0)
        groups[d.source][d.lang] += 1
    mx = sum(max(v.values()) for v in groups.values())
    tot = len(docs)
    r = rows[("source", "lang")]
    assert r.n_groups == len(groups)
    assert r.strength_ppm == mx * 1_000_000 // tot


def test_qr01_hybrid_fusion_laws(spark):
    """RRF arithmetic self-consistency; every sparse hit really
    contains a query term; the fused list is a descending top-10."""
    from event_stream_aggr_spark.operators.similarity import (
        HYB_CHANNEL_K,
        HYB_OUT_K,
    )
    from event_stream_aggr_spark.operators.text import BM25_TERMS

    rows = sorted(
        QUERIES["qr01_hybrid_search"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.rank,
    )
    assert [r.rank for r in rows] == list(range(1, HYB_OUT_K + 1))
    scores = [r.rrf_ppm for r in rows]
    assert scores == sorted(scores, reverse=True)
    texts = {
        d.doc_id: d.text
        for d in load_table(spark, SF_DIR, "documents").collect()
    }
    for r in rows:
        expect = 0
        if 0 < r.bm25_rank <= HYB_CHANNEL_K:
            expect += 1_000_000 // (60 + r.bm25_rank)
            toks = set(texts[r.doc_id].lower().split())
            assert toks & set(BM25_TERMS), r.doc_id
        if 0 < r.dense_rank <= HYB_CHANNEL_K:
            expect += 1_000_000 // (60 + r.dense_rank)
        assert r.rrf_ppm == expect and expect > 0


def test_qg06_substitution_recount(spark):
    """Driver-side recount on a sample: for 5 suppliers, rebuild the
    cheapest-2-hop partner list from the (s, p, min-price) edge
    relation and compare rank-for-rank."""
    from decimal import Decimal

    rows = QUERIES["qg06_substitution_paths"].fn(spark, SF_DIR).collect()
    by_a: dict[int, list] = {}
    for r in rows:
        by_a.setdefault(r.s_a, []).append(r)
    edges = (
        load_table(spark, SF_DIR, "lineitem")
        .groupBy(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .agg(F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias("w"))
        .collect()
    )
    by_part: dict[int, list] = {}
    for e in edges:
        by_part.setdefault(e.p, []).append((e.s, e.w))
    sample = sorted(by_a)[:5]
    for s_a in sample:
        best: dict[int, tuple] = {}
        for p, members in by_part.items():
            mine = [w for s, w in members if s == s_a]
            if not mine:
                continue
            for s_b, w_b in members:
                if s_b <= s_a:
                    continue
                cand = (mine[0] + w_b, p)
                if s_b not in best or cand < best[s_b]:
                    best[s_b] = cand
        expect = sorted(
            ((cost, s_b, p) for s_b, (cost, p) in best.items())
        )[:3]
        got = sorted(by_a[s_a], key=lambda r: r.partner_rank)
        assert len(got) == min(3, len(expect))
        for r, (cost, s_b, p) in zip(got, expect):
            assert (r.s_b, r.via_part) == (s_b, p)
            assert abs(Decimal(str(r.cost)) - cost) < Decimal("0.01")


def test_qf08_hashing_mass_conservation(spark):
    """Bucket masses conserve the corpus token count; signed sums obey
    |signed| <= mass with equal parity; buckets stay within range; a
    driver-side md5 recount agrees for the heaviest bucket."""
    import hashlib

    rows = QUERIES["qf08_feature_hashing"].fn(spark, SF_DIR).collect()
    corpus_tokens = (
        load_table(spark, SF_DIR, "documents")
        .select(
            F.explode(
                F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
            ).alias("t")
        )
        .count()
    )
    assert sum(r.n_tokens for r in rows) == corpus_tokens
    for r in rows:
        assert 0 <= r.bucket < 256
        assert abs(r.signed_sum) <= r.n_tokens
        assert r.signed_sum == 2 * r.pos_mass - r.n_tokens
    heavy = max(rows, key=lambda r: r.n_tokens)
    toks = (
        load_table(spark, SF_DIR, "documents")
        .select(
            F.explode(
                F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
            ).alias("t")
        )
        .groupBy("t")
        .count()
        .collect()
    )
    n_distinct = n_tok = 0
    for t in toks:
        b = int(hashlib.md5(f"fh:{t.t}".encode()).hexdigest()[:7], 16) % 256
        if b == heavy.bucket:
            n_distinct += 1
            n_tok += t["count"]
    assert (n_distinct, n_tok) == (heavy.n_distinct_tokens, heavy.n_tokens)


def test_qa07_gains_recount(spark):
    """Driver-side recount: user spend/positive flags → descending
    deciles; counts conserve; capture is monotone to 10⁶."""
    rows = sorted(
        QUERIES["qa07_gains_table"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.bin,
    )
    users = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("pos"),
        )
        .collect()
    )
    assert sum(r.n_users for r in rows) == len(users)
    assert sum(r.n_positive for r in rows) == sum(u.pos for u in users)
    assert rows[-1].cum_capture_ppm == 1_000_000
    caps = [r.cum_capture_ppm for r in rows]
    assert caps == sorted(caps)
    # bin 0 must hold the highest spenders: its min bucket >= bin 1's max
    top = sorted((u.cents // 100_000 for u in users), reverse=True)
    n0 = rows[0].n_users
    # every user in bin 0 has bucket >= the (n0)th highest bucket value
    assert rows[0].n_users > 0 and top[n0 - 1] >= top[-1]


def test_qe19_mmr_diversity_tradeoff(spark):
    """MMR laws: pick 0 is the relevance argmax; later picks never
    beat earlier ones on the MMR objective they were chosen by; and
    each later pick's mmr score equals λ·rel − (1−λ)·max-sim computed
    driver-side from the raw embeddings."""
    rows = sorted(
        QUERIES["qe19_mmr_rerank"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.mmr_rank,
    )
    assert [r.mmr_rank for r in rows] == [0, 1, 2]
    emb = {
        e.vec_id: list(e.embedding)
        for e in load_table(spark, SF_DIR, "embeddings").collect()
    }

    def cos_us(a, b):
        dp = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        v = dp / (na * nb) * 1_000_000
        f = math.floor(v)
        return f + (1 if v - f >= 0.5 else 0)  # round half up

    q = emb[0]
    assert rows[0].mmr_us == rows[0].rel_us
    picked = [rows[0].vec_id]
    for r in rows[1:]:
        ms = max(cos_us(emb[r.vec_id], emb[p]) for p in picked)
        expect = (500_000 * r.rel_us - 500_000 * ms) // 1_000_000
        assert r.mmr_us == expect, (r.vec_id, r.mmr_us, expect)
        assert abs(cos_us(emb[r.vec_id], q) - r.rel_us) <= 1
        picked.append(r.vec_id)


def test_qj02_interval_union_recount(spark):
    """Pure-python sweep-line recount of islands and covered seconds
    for every user."""
    rows = {
        r.user_id: r
        for r in QUERIES["qj02_interval_union"].fn(spark, SF_DIR).collect()
    }
    ev = (
        load_table(spark, SF_DIR, "events")
        .selectExpr(
            "user_id",
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            " AS s",
        )
        .collect()
    )
    by_user: dict[int, list[int]] = {}
    for e in ev:
        by_user.setdefault(e.user_id, []).append(e.s)
    for u, starts in by_user.items():
        ivs = sorted((s, s + 300) for s in starts)
        islands = []
        for s, t in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], t)
            else:
                islands.append([s, t])
        r = rows[u]
        assert r.n_islands == len(islands)
        assert r.n_intervals == len(ivs)
        assert r.covered_sec == sum(t - s for s, t in islands)


def test_qh04_kmv_accuracy_band(spark):
    """KMV laws: every estimate lies in [0, 10⁶]; err_ppm is the
    reported |difference|; and the sketch is actually informative —
    mean error across the 190 source pairs well inside the k=64
    binomial band (3·sqrt(0.25/64) ≈ 19%), plus rank correlation with
    the exact overlap is positive (the sketch orders pairs usefully)."""
    rows = QUERIES["qh04_kmv_set_ops"].fn(spark, SF_DIR).collect()
    assert len(rows) == 190  # 20 sources choose 2
    errs = []
    for r in rows:
        assert 0 <= r.kmv_jaccard_ppm <= 1_000_000
        assert r.err_ppm == abs(r.kmv_jaccard_ppm - r.exact_jaccard_ppm)
        errs.append(r.err_ppm)
    assert sum(errs) / len(errs) < 100_000
    xs = [r.exact_jaccard_ppm for r in rows]
    ys = [r.kmv_jaccard_ppm for r in rows]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    assert cov > 0


def test_qr02_expansion_laws(spark):
    """PRF laws: top-10 ranks are 1..10 descending on exp_score;
    base_rank/base_score are consistent with an independent base-pass
    ranking; and the expanded score of a doc that matched only
    original terms never exceeds base + (max expansion contribution)."""
    rows = sorted(
        QUERIES["qr02_prf_expansion"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.new_rank,
    )
    assert [r.new_rank for r in rows] == list(range(1, 11))
    scores = [r.exp_score_us for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        # expanded score includes base terms at full weight, so it can
        # only exceed base via expansion contributions — never shrink
        # below half... structural sanity: both non-negative
        assert r.exp_score_us > 0 and r.base_score_us >= 0
        assert (r.base_rank == 0) == (r.base_score_us == 0)


def test_qs16_bootstrap_spread_brackets_truth(spark):
    """Determinism + statistics: weights recompute exactly from md5;
    each replicate mean is within 5 standard errors of the point
    estimate, and the spread is positive but small."""
    import hashlib

    from event_stream_aggr_spark.operators.sampling import BOOT_THRESHOLDS

    r = QUERIES["qs16_poisson_bootstrap"].fn(spark, SF_DIR).collect()[0]
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    n = len(orders)
    assert r.n_rows == n
    prices = [o.o_totalprice for o in orders]
    mean = sum(prices) / n
    var = sum((p - mean) ** 2 for p in prices) / (n - 1)
    se = math.sqrt(var / n)
    # python recount of replicate 0
    num = den = 0
    for o in orders:
        h = int(
            hashlib.md5(f"boot:0:{o.o_orderkey}".encode()).hexdigest()[:7], 16
        )
        w = sum(1 for t in BOOT_THRESHOLDS if h >= t)
        num += w * round(o.o_totalprice, 2)
        den += w
    assert abs(r.boot0_mean - num / den) < 1e-4
    for m in (r.boot0_mean, r.boot1_mean, r.boot2_mean):
        assert abs(m - r.mean_price) < 5 * se
    assert 0 < r.boot_spread < 10 * se


def test_qs17_execution_consistent_with_qs15_plan(spark):
    """The executor's quotas EQUAL qs15's plan row-for-row; kept
    tokens are reproducible from md5 driver-side; aggregate
    achievement is within the heavy-doc noise band of the budget."""
    import hashlib

    plan = {
        r.source: r.final_quota
        for r in QUERIES["qs15_mixture_apportionment"].fn(spark, SF_DIR).collect()
    }
    rows = QUERIES["qs17_mixture_execution"].fn(spark, SF_DIR).collect()
    assert {r.source: r.final_quota for r in rows} == plan
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )
    per_src_tokens: dict[str, int] = {}
    doc_toks = []
    for d in docs:
        n = len([t for t in d.text.split(" ") if t])
        doc_toks.append((d.doc_id, d.source, n))
        per_src_tokens[d.source] = per_src_tokens.get(d.source, 0) + n
    kept: dict[str, int] = {}
    for doc_id, srcname, n in doc_toks:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:7], 16)
        if h * per_src_tokens[srcname] < plan[srcname] * 16**7:
            kept[srcname] = kept.get(srcname, 0) + n
    for r in rows:
        assert r.kept_tokens == kept.get(r.source, 0), r.source
        assert r.achievement_ppm == r.kept_tokens * 1_000_000 // r.final_quota
    total_quota = sum(plan.values())
    total_kept = sum(r.kept_tokens for r in rows)
    assert abs(total_kept - total_quota) / total_quota < 0.25


def test_q84_abc_partition_laws(spark):
    """Classes partition the part universe; shares stack to ~10000bp
    with A ≥ 80% bound semantics (A's cumulative share ≤ 8000bp by
    construction of the 'until' cut, B ≤ 9500bp cumulative)."""
    rows = {r.abc_class: r for r in QUERIES["q84_abc_classification"].fn(spark, SF_DIR).collect()}
    assert set(rows) == {"A", "B", "C"}
    n_parts = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_partkey").distinct().count()
    )
    assert sum(r.n_parts for r in rows.values()) == n_parts
    total_bp = sum(r.share_bp for r in rows.values())
    assert 9997 <= total_bp <= 10000
    assert rows["A"].share_bp <= 8000
    assert rows["A"].share_bp + rows["B"].share_bp <= 9500
    # NOTE: no Pareto-skew assertion — the synthetic revenue is
    # near-uniform (A holds ~73% of parts for 80% of revenue); the
    # operator pins the CUT, the data supplies whatever skew it has


def test_qt30_confusion_conserves_and_matches_qt13(spark):
    """The confusion matrix partitions all docs; cell counts recount
    from qt13's per-doc predictions joined to labels."""
    rows = QUERIES["qt30_langid_confusion"].fn(spark, SF_DIR).collect()
    docs = {
        d.doc_id: d.lang
        for d in load_table(spark, SF_DIR, "documents").collect()
    }
    assert sum(r.n for r in rows) == len(docs)
    preds = {
        r.doc_id: r.pred_lang
        for r in QUERIES["qt13_language_id"].fn(spark, SF_DIR).collect()
    }
    cells: dict[tuple, int] = {}
    for doc_id, true_lang in docs.items():
        key = (true_lang, preds[doc_id])
        cells[key] = cells.get(key, 0) + 1
    assert {(r.true_lang, r.pred_lang): r.n for r in rows} == cells
    for r in rows:
        assert r.cell_acc_ppm == (
            1_000_000 if r.true_lang == r.pred_lang else 0
        )


def test_q85_reconciliation_recount(spark):
    """Driver-side recount of balance counts, orphans and net
    imbalance from exact Decimal arithmetic."""
    from decimal import Decimal

    r = QUERIES["q85_order_reconciliation"].fn(spark, SF_DIR).collect()[0]
    orders = {
        o.o_orderkey: Decimal(str(round(o.o_totalprice, 2)))
        for o in load_table(spark, SF_DIR, "orders").collect()
    }
    sums: dict[int, Decimal] = {}
    for li in (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .collect()
    ):
        sums[li.l_orderkey] = sums.get(li.l_orderkey, Decimal(0)) + Decimal(
            str(round(li.l_extendedprice, 2))
        )
    assert r.n_orders == len(orders)
    assert r.n_orders_without_lines == sum(
        1 for k in orders if k not in sums
    )
    assert r.n_orphan_line_groups == sum(1 for k in sums if k not in orders)
    balanced = sum(
        1
        for k, total in orders.items()
        if k in sums and abs(total - sums[k]) <= Decimal("0.01")
    )
    assert r.n_balanced == balanced
    net = sum(
        (total - sums[k] for k, total in orders.items() if k in sums),
        Decimal(0),
    )
    assert abs(Decimal(str(r.net_imbalance)) - net) < Decimal("0.01")


def test_qi03_merge_equals_direct_and_brackets_exact(spark):
    """The merged histogram is provably identical to the direct one
    (n_mismatched_buckets == 0) and each nearest-bucket percentile
    brackets the exact order statistic within one bucket width."""
    r = QUERIES["qi03_incremental_quantiles"].fn(spark, SF_DIR).collect()[0]
    assert r.n_mismatched_buckets == 0
    vals = sorted(
        v.value for v in load_table(spark, SF_DIR, "events").select("value").collect()
    )
    assert r.n_total == len(vals)
    import math as m

    for p, deci in ((0.50, r.p50_deci), (0.90, r.p90_deci), (0.99, r.p99_deci)):
        exact = vals[m.ceil(p * len(vals)) - 1]
        assert deci / 10 <= exact < deci / 10 + 0.2, (p, deci, exact)


def test_qe20_recall_curve_laws(spark):
    """Monotone hit counts in k, recall@5 agrees with qe13's audit,
    and every recall is a valid ppm."""
    rows = {r.k: r for r in QUERIES["qe20_recall_curve"].fn(spark, SF_DIR).collect()}
    assert set(rows) == {1, 5, 10, 20}
    hits = [rows[k].n_hits for k in (1, 5, 10, 20)]
    assert hits == sorted(hits)
    for k, r in rows.items():
        assert 0 <= r.recall_ppm <= 1_000_000
        assert r.recall_ppm == r.n_hits * 1_000_000 // (8 * k)
    qe13_hits = sum(
        r.n_hits
        for r in QUERIES["qe13_ann_recall_audit"].fn(spark, SF_DIR).collect()
    )
    assert rows[5].n_hits == qe13_hits


def test_qt29_burstiness_recount(spark):
    """VMR recount driver-side (zeros-included variance identity) for
    every reported term; descending order; floor respected."""
    rows = QUERIES["qt29_term_burstiness"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 30
    vmrs = [r.vmr_ppm for r in rows]
    assert vmrs == sorted(vmrs, reverse=True)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    nd = len(docs)
    counts: dict[str, dict[int, int]] = {}
    for d in docs:
        for t in [x for x in d.text.lower().split(" ") if x]:
            counts.setdefault(t, {}).setdefault(d.doc_id, 0)
            counts[t][d.doc_id] += 1
    for r in rows:
        per_doc = counts[r.tok]
        total = sum(per_doc.values())
        total_sq = sum(c * c for c in per_doc.values())
        assert r.total == total >= 50
        assert r.df == len(per_doc)
        assert r.vmr_ppm == ((total_sq * nd - total * total) * 1_000_000) // (
            total * (nd - 1)
        )


def test_qs19_temperature_monotonicity(spark):
    """Temperature laws: at alpha=0 shares are equal (±1 ppm
    truncation); at alpha=1 shares are proportional to tokens; lower
    alpha strictly helps below-average sources and hurts
    above-average ones; every column sums to ≤ 10⁶."""
    rows = QUERIES["qs19_temperature_sweep"].fn(spark, SF_DIR).collect()
    n = len(rows)
    total_tokens = sum(r.tokens for r in rows)
    cols = [
        "share_a0_ppm",
        "share_a0_25_ppm",
        "share_a0_5_ppm",
        "share_a0_75_ppm",
        "share_a1_ppm",
    ]
    for c in cols:
        s = sum(getattr(r, c) for r in rows)
        assert 1_000_000 - n <= s <= 1_000_000, c
    for r in rows:
        assert abs(r.share_a0_ppm - 1_000_000 // n) <= 1
        nat = r.tokens * 1_000_000 // total_tokens
        assert abs(r.share_a1_ppm - nat) <= 1
        seq = [getattr(r, c) for c in cols]
        if r.tokens * n < total_tokens:  # below-average source
            assert seq == sorted(seq, reverse=True), (r.source, seq)
        elif r.tokens * n > total_tokens * 1.05:  # clearly above average
            assert seq == sorted(seq), (r.source, seq)


def test_qm08_integrity_all_pass_baseline(spark):
    """On the consistent synthetic corpus every violation column is
    zero (the audit's passing baseline) and the byte envelope
    recounts from text lengths."""
    rows = QUERIES["qm08_payload_integrity"].fn(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").select("source", "text").collect()
    by_src: dict[str, list[int]] = {}
    for d in docs:
        by_src.setdefault(d.source, []).append(len(d.text))
    assert {r.source for r in rows} == set(by_src)
    for r in rows:
        lens = by_src[r.source]
        assert r.n_media == len(lens)
        assert r.n_meta_mismatch == r.n_empty == r.n_bad_head == 0
        assert r.n_truncated == sum(1 for x in lens if x < 64)
        assert (r.min_bytes, r.max_bytes, r.total_bytes) == (
            min(lens),
            max(lens),
            sum(lens),
        )

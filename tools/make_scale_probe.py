"""Synthesize a larger scale-probe dataset from the driver's sf0.1
tables (round-7 VERDICT ask #3: the 100 TB claims rest on plan shape
plus a sf0.01→sf0.1 sub-linearity probe — extend the empirical axis
one decade further without touching the read-only /root/testdata).

Method: k shifted replicas of sf0.1's FACT tables (lineitem, orders,
events, documents, embeddings, customer, supplier, part), keys offset
per replica so cardinalities scale with the data (no artificial key
skew, no 5× exact duplicates poisoning the dedup probes):

- every primary/foreign key gets +i·stride (stride = a power of ten
  above the table's max key, so replicas never collide and the
  original keys survive as replica 0);
- document text gets a per-replica sentinel token appended so exact/
  near-dup rates stay at sf0.1's level instead of jumping to 80%
  replicas (MinHash shingles differ; simhash/fingerprints differ);
- embeddings get a small deterministic per-replica perturbation
  (±1e-3·sin(vec_id·dim·i)) so ANN bucket occupancy grows like a
  real corpus instead of stacking identical vectors;
- event timestamps shift +i seconds so ts-ordered state machines see
  distinct instants; dates in orders/lineitem are left alone (the
  probe measures plan scaling, not calendar realism).

Dimension tables (region, nation) stay as-is — at every SF they are
broadcast-side; growing them would distort the probe.

Output dir defaults to /root/repo/.scale_probe/sf0.5 (gitignored;
~85 MB at k=5). Deterministic: pure column arithmetic, no RNG.

Usage: python tools/make_scale_probe.py [k] [out_dir]

--zipf mode (round-7 VERDICT ask #1 — the named 100 TB killer is a
Zipf-skewed join/group key, and the replica probe above is uniform):

    python tools/make_scale_probe.py --zipf [alpha] [out_dir]

writes a SAME-SIZE twin of sf0.1 (row counts identical, so a timing
ratio vs sf0.1 isolates the skew effect from data volume) in which the
three hot join/group keys are remapped to a Zipf(alpha~1.1) rank over
their own dense domains:

- lineitem.l_orderkey  -> Zipf rank in [0, max(o_orderkey)]   (the
  orders⋈lineitem fact join key: rank-1 order carries ~14% of ALL
  lineitems at alpha=1.1)
- orders.o_custkey     -> Zipf rank in [0, max(c_custkey)]    (the
  customer⋈orders key)
- events.user_id       -> Zipf rank in [0, max(user_id)]      (the
  window-partition / groupBy key of q09/q10/qf01)

Remapped values stay inside the referenced dimension's dense key
domain, so every FK still resolves. The uniform deviate comes from
xxhash64 of the row's own immutable ids — deterministic, no RNG —
pushed through the standard continuous inverse CDF of the Zipf
distribution: rank(u) = (1 - u·(1 - N^(1-a)))^(1/(1-a)).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
ZIPF_MODE = len(sys.argv) > 1 and sys.argv[1] == "--zipf"
if ZIPF_MODE:
    _here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ZIPF_ALPHA = float(sys.argv[2]) if len(sys.argv) > 2 else 1.1
    _default_src = os.path.join(_here, ".scale_probe", "sf1")
    ZIPF_SRC = (
        sys.argv[3]
        if len(sys.argv) > 3
        else (_default_src if os.path.isdir(_default_src) else SRC)
    )
    _src_sf = os.path.basename(ZIPF_SRC.rstrip("/")).replace("sf", "")
    OUT = (
        sys.argv[4]
        if len(sys.argv) > 4
        else os.path.join(_here, ".scale_probe", f"zipf{_src_sf}")
    )
    K = 1
else:
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    OUT = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale_probe",
            f"sf{0.1 * K:g}",
        )
    )

#: key columns to offset per replica, per table (column -> True marks
#: keys whose JOINED tables must use the SAME stride: the stride is
#: global per key FAMILY, computed from the referencing fact side).
KEY_FAMILIES = {
    "l_orderkey": "orderkey",
    "o_orderkey": "orderkey",
    "l_partkey": "partkey",
    "p_partkey": "partkey",
    "l_suppkey": "suppkey",
    "s_suppkey": "suppkey",
    "o_custkey": "custkey",
    "c_custkey": "custkey",
    "event_id": "event_id",
    "user_id": "user_id",
    "doc_id": "docvec",  # documents.doc_id == embeddings.vec_id contract
    "vec_id": "docvec",
}

TABLES = (
    "lineitem",
    "orders",
    "customer",
    "supplier",
    "part",
    "events",
    "documents",
    "embeddings",
)


def _stride(v: int) -> int:
    s = 10
    while s <= v:
        s *= 10
    return s


def _zipf_rank_sql(u_sql: str, n: int, alpha: float) -> str:
    """SQL for the continuous inverse-CDF Zipf rank in [0, n-1]:
    rank(u) = (1 - u·(1 - n^(1-a)))^(1/(1-a)) - 1, clamped. u in [0,1)."""
    one_minus_a = 1.0 - alpha
    tail = float(n) ** one_minus_a
    return (
        f"least(cast({n - 1} as bigint), greatest(cast(0 as bigint), "
        f"cast(pow(1.0 - ({u_sql}) * (1.0 - {tail!r}), {1.0 / one_minus_a!r}) "
        f"as bigint) - 1))"
    )


def _uniform_sql(*cols: str) -> str:
    """Deterministic uniform deviate in [0,1) from the row's own ids."""
    return f"pmod(xxhash64({', '.join(cols)}), 1000000) / 1000000.0"


def zipf_main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.session import get_spark

    spark = get_spark(app_name="make_zipf_probe")
    os.makedirs(OUT, exist_ok=True)

    #: fact table -> (remapped col, uniform-deviate source cols,
    #:                key-domain table, key-domain col)
    remaps = {
        "lineitem": ("l_orderkey", ("l_orderkey", "l_linenumber"),
                     "orders", "o_orderkey"),
        "orders": ("o_custkey", ("o_orderkey",), "customer", "c_custkey"),
        "events": ("user_id", ("event_id",), "events", "user_id"),
    }
    all_tables = TABLES + ("region", "nation")
    for t in all_tables:
        df = spark.read.parquet(f"{ZIPF_SRC}/{t}.parquet")
        if t in remaps:
            col, ucols, dom_t, dom_c = remaps[t]
            # explicit rank -> key mapping over the ACTUAL key domain,
            # so the remap is valid for any source keyspace (sf0.1 is
            # dense; the k-replica probes are stride-sparse). Global
            # row_number over the distinct keys — a one-off tool-side
            # sort of the dimension-sized key set, not a query plan.
            keys = (
                spark.read.parquet(f"{ZIPF_SRC}/{dom_t}.parquet")
                .select(F.col(dom_c).alias("_key"))
                .distinct()
            )
            n = keys.count()
            mapping = keys.withColumn(
                "_rank", F.row_number().over(Window.orderBy("_key")) - 1
            )
            rank_expr = _zipf_rank_sql(_uniform_sql(*ucols), n, ZIPF_ALPHA)
            df = (
                df.withColumn("_zr", F.expr(rank_expr))
                .join(mapping, F.col("_zr") == F.col("_rank"))
                .withColumn(col, F.col("_key"))
                .drop("_zr", "_rank", "_key")
            )
        df.repartition(8).write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")
        print(f"{t}: {'zipf-remapped ' + remaps[t][0] if t in remaps else 'copied'}")
    print(f"wrote {OUT} (alpha={ZIPF_ALPHA}, src={ZIPF_SRC})")


def main() -> None:
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.session import get_spark

    spark = get_spark(app_name="make_scale_probe")
    os.makedirs(OUT, exist_ok=True)

    # one stride per key family, from the max over every column in it
    fam_max: dict[str, int] = {}
    dfs = {t: spark.read.parquet(f"{SRC}/{t}.parquet") for t in TABLES}
    for t, df in dfs.items():
        for col in df.columns:
            fam = KEY_FAMILIES.get(col)
            if fam:
                m = df.agg(F.max(col)).collect()[0][0]
                fam_max[fam] = max(fam_max.get(fam, 0), int(m))
    strides = {fam: _stride(v) for fam, v in fam_max.items()}

    for t, df in dfs.items():
        parts = []
        for i in range(K):
            rep = df
            for col in df.columns:
                fam = KEY_FAMILIES.get(col)
                if fam:
                    rep = rep.withColumn(
                        col, (F.col(col) + F.lit(i * strides[fam])).cast("long")
                    )
            if t == "events" and i:
                rep = rep.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i} SECOND"))
            if t == "customer" and i:
                # identity-ish payloads must MULTIPLY blocks, not
                # densify them (same reason keys are offset): replica
                # customers are NEW people — fresh names, balances
                # spread across qer01's blocking bands
                rep = rep.withColumn(
                    "c_name", F.concat(F.col("c_name"), F.lit(f"~r{i}"))
                ).withColumn("c_acctbal", F.col("c_acctbal") + F.lit(float(i * 101)))
            if t == "documents" and i:
                rep = rep.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" replica{i}marker"))
                ).withColumn("n_chars", F.length("text").cast("long"))
            if t == "embeddings" and i:
                rep = rep.withColumn(
                    "embedding",
                    F.expr(
                        "transform(embedding, (x, d) ->"
                        f" cast(x + 0.001 * sin(vec_id * (d + 1) * {i}) as float))"
                    ),
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out.repartition(8).write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")
        print(f"{t}: {K}x replicated")

    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{OUT}/{t}.parquet"
        )
        print(f"{t}: copied (dimension, broadcast-side at every SF)")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    zipf_main() if ZIPF_MODE else main()

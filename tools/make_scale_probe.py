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
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
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
    main()

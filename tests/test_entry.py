"""Driver-contract integrity: entry() smoke + registry invariants."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "hour_bucket", "event_type", "n_events", "total_value", "n_users", "sum_k"
    }


def test_every_oracle_has_a_query(spark):
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 40
    for name, sql in os_.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_queries_run_at_smoke_sf(spark, sf_dir):
    # every registered query must at least plan + execute at sf0.001 —
    # and no plan in the registry may contain an unpartitioned
    # CartesianProduct (registry-wide join-physics floor; deliberate
    # tiny products compile to BroadcastNestedLoopJoin, which is
    # allowed and separately pinned per-query in test_plan_shapes).
    #
    # This sweep also carries the driver-hashability gate that used to
    # live in test_plan_shapes.test_registry_outputs_are_driver_hashable:
    # the driver's cross-engine comparator canonicalizes results via
    # pandas sort/hash, which crashes on unhashable cells (r4's qt19:
    # "unhashable type: 'list'" on an array<long> postings column), so
    # a registered query's OUTPUT schema must be flat scalars only —
    # nested values get serialized (array_join / to_json) before they
    # leave the query. Folded in here (round 16) because each sweep
    # paid the full registry's eager fn() builds independently — the
    # schema assertion rides this sweep's builds for free (~220 s of
    # suite wall time saved), with identical coverage.
    from pyspark.sql.types import ArrayType, MapType, StructType

    qs = entry_mod.queries()
    bad = []
    for name, fn in sorted(qs.items()):
        df = fn(spark, sf_dir)
        assert df.columns, name
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
        df.limit(1).collect()
    assert not bad, (
        "driver-unhashable output columns (serialize them, q35 pattern): "
        + "; ".join(bad)
    )

"""operators/asof.py — J5 semantics: backward inclusive, per-key,
left-preserving."""

from __future__ import annotations

from event_stream_aggr_spark.operators.asof import asof_join


def _dfs(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 50, "d"), (3, 7, "e")],
        "k int, ts int, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 60, 600.0)],
        "k int, rts int, val double",
    )
    return left, right


def test_backward_inclusive(spark):
    left, right = _dfs(spark)
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                    right_cols=["rts", "val"])
    got = {(r.k, r.ts): (r.rts, r.val) for r in out.collect()}
    assert got[(1, 10)] == (10, 100.0)   # exact-ts match included (>=)
    assert got[(1, 20)] == (15, 150.0)   # latest at-or-before
    assert got[(1, 5)] == (None, None)   # nothing before → NULL (left kept)
    assert got[(2, 50)] == (None, None)  # right exists but only later
    assert got[(3, 7)] == (None, None)   # key with no right rows
    assert len(got) == 5                 # all left rows preserved


def test_left_columns_survive(spark):
    left, right = _dfs(spark)
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                    right_cols=["val"])
    tags = {r.tag for r in out.collect()}
    assert tags == {"a", "b", "c", "d", "e"}


def test_reserved_internal_names_rejected(spark):
    import pytest

    left = spark.createDataFrame([(1, 10, 0)], "k int, ts int, _is_left int")
    right = spark.createDataFrame([(1, 10, 100.0)], "k int, rts int, val double")
    with pytest.raises(ValueError, match="reserves internal column names"):
        asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                  right_cols=["rts", "val"])


def test_tolerance_rejects_stale_matches(spark):
    left, right = _dfs(spark)
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                    right_cols=["rts", "val"], tolerance=5)
    got = {(r.k, r.ts): (r.rts, r.val) for r in out.collect()}
    assert got[(1, 10)] == (10, 100.0)    # gap 0 <= 5: kept
    assert got[(1, 20)] == (15, 150.0)    # gap 5 <= 5: kept (inclusive)
    out2 = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                     right_cols=["rts", "val"], tolerance=4)
    got2 = {(r.k, r.ts): (r.rts, r.val) for r in out2.collect()}
    assert got2[(1, 20)] == (None, None)  # gap 5 > 4: stale -> NULL, row kept
    assert len(got2) == 5

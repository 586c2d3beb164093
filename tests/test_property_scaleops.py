"""Property-based tests for the round-5 operator families: Hypothesis
generates adversarial inputs (arbitrary interval layouts, key
multisets) and asserts the STRUCTURAL guarantees the designs rest on —
overlap-join ≡ theta-join, bloom never drops a true match, count-min
never underestimates. Example counts are small because each example
runs Spark jobs; the generators bias toward boundary collisions
(shared endpoints, bucket-edge values, repeated keys)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# interval endpoints cluster around bucket edges (multiples of 3600)
# so the exactly-once dedup trick sees shared-bucket collisions
_point = st.one_of(
    st.integers(min_value=0, max_value=20_000),
    st.integers(min_value=0, max_value=5).map(lambda k: k * 3600),
)
_interval = st.tuples(_point, _point).map(lambda t: (min(t), max(t)))
_intervals = st.lists(_interval, min_size=1, max_size=8)


@_SETTINGS
@given(left=_intervals, right=_intervals)
def test_overlap_join_always_matches_theta_join(spark, left, right):
    from event_stream_aggr_spark.operators.interval import overlap_join

    ldf = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(left)], "lid long, l_start long, l_end long"
    )
    rdf = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(right)], "rid long, r_start long, r_end long"
    )
    got = sorted(
        (r.lid, r.rid, r.overlap_sec) for r in overlap_join(ldf, rdf).collect()
    )
    naive = sorted(
        (li, ri, min(le, re_) - max(ls, rs))
        for li, (ls, le) in enumerate(left)
        for ri, (rs, re_) in enumerate(right)
        if ls <= re_ and rs <= le
    )
    assert got == naive


@_SETTINGS
@given(
    build=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=30),
    extra=st.lists(st.integers(min_value=0, max_value=10**9), min_size=0, max_size=30),
)
def test_bloom_has_no_false_negatives(spark, build, extra):
    from event_stream_aggr_spark.operators.bloom import bloom_build, bloom_probe

    bdf = spark.createDataFrame([(k,) for k in set(build)], "k long")
    probe = spark.createDataFrame(
        [(k,) for k in set(build) | set(extra)], "k long"
    )
    passed = {r.k for r in bloom_probe(probe, "k", bloom_build(bdf, "k")).collect()}
    assert set(build) <= passed  # a false negative would drop join rows


@_SETTINGS
@given(
    keys=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60)
)
def test_count_min_never_underestimates(spark, keys):
    from collections import Counter

    from event_stream_aggr_spark.operators.sketch import cms_build, cms_estimate

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    cms = cms_build(df, "k")
    uniq = spark.createDataFrame([(k,) for k in set(keys)], "k long")
    est = {r.k: r.cms_n for r in cms_estimate(uniq, "k", cms).collect()}
    exact = Counter(keys)
    assert all(est[k] >= n for k, n in exact.items())

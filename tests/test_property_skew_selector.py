"""Property tests for the skew auto-selectors (round-9 VERDICT ask #7):

1. ``running_total_strategy`` / ``join_skew_strategy`` flip EXACTLY at
   the documented task-budget boundary — Hypothesis draws arbitrary
   key-multiplicity multisets and budget ratios (including ratios
   pinned AT the generated frame's critical point mx*par/total) and a
   pure-Python mirror of the decision expression must agree on every
   draw. The mirror uses the identical Python comparison the helpers
   evaluate driver-side, so any refactor that changes the boundary
   (>= for >, a mean-based variable, a different parallelism source)
   fails here the way test_property_prefix_filter guards L2's bound.

2. ``staged_running_total``'s two branches return identical rows on
   every generated DECIMAL frame (NULL keys/grains/values included) —
   the value-exactness the branch-independent qz08 oracle relies on,
   generalized beyond the hand-picked cases in test_scale_ops.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# per-key multiplicities: a few keys, counts spanning uniform to
# one-key-dominates (the regime the threshold separates)
_multiplicities = st.lists(
    st.integers(min_value=1, max_value=40), min_size=1, max_size=8
)

_ratio = st.one_of(
    st.floats(min_value=0.05, max_value=8.0, allow_nan=False),
    st.just(None),  # sentinel: pin the ratio AT the frame's critical point
)


def _frame_from_multiplicities(spark, mults):
    """Built by exploding a LITERAL struct array over spark.range(1),
    not createDataFrame: an RDD-backed frame reports Catalyst's
    unknown-size sentinel, and the AQE-credit dimension below needs a
    plan whose bytes-per-row IS estimable (the selector refuses the
    credit otherwise — deliberately, but that path would then be the
    only one property-exercised)."""
    rows = [(k, i) for k, n in enumerate(mults) for i in range(n)]
    arr = F.array(
        *[
            F.struct(
                F.lit(k).cast("int").alias("k"), F.lit(o).cast("int").alias("o")
            )
            for k, o in rows
        ]
    )
    return spark.range(1).select(F.inline(arr))


@_SETTINGS
@given(mults=_multiplicities, ratio=_ratio)
def test_running_total_strategy_flips_at_documented_boundary(
    spark, mults, ratio
):
    from event_stream_aggr_spark.operators.skew import running_total_strategy

    df = _frame_from_multiplicities(spark, mults)
    par = spark.sparkContext.defaultParallelism
    mx, total = max(mults), sum(mults)
    if ratio is None:
        # the exact critical point: mx*par > ratio*total is FALSE at
        # equality, so the helper must take the plain branch here and
        # the staged branch one ulp below
        ratio = (mx * par) / total
    expected = "staged" if mx * par > ratio * total else "plain"
    assert running_total_strategy(df, "k", task_budget_ratio=ratio) == expected


@_SETTINGS
@given(mults=_multiplicities, ratio=_ratio)
def test_join_skew_strategy_flips_at_documented_boundary(spark, mults, ratio):
    """The row-skew boundary, AQE credit pinned off — the pre-round-11
    decision expression, still the one that sizes the salt."""
    import math

    from event_stream_aggr_spark.operators.skew import join_skew_strategy

    df = _frame_from_multiplicities(spark, mults)
    par = spark.sparkContext.defaultParallelism
    mx, total = max(mults), sum(mults)
    if ratio is None:
        ratio = (mx * par) / total
    if mx * par > ratio * total:
        expected = ("salted", max(2, min(32, math.ceil(mx * par / (ratio * total)))))
    else:
        expected = ("plain", 1)
    assert (
        join_skew_strategy(df, "k", task_budget_ratio=ratio, aqe_backstop=False)
        == expected
    )


@_SETTINGS
@given(
    mults=_multiplicities,
    ratio=_ratio,
    backstop=st.sampled_from([None, True, False]),
    how=st.sampled_from(["inner", "left_semi", "full", "right"]),
    advisory=st.sampled_from(["64MB", "1b"]),
)
def test_join_skew_strategy_aqe_credit_dimension(
    spark, mults, ratio, backstop, how, advisory
):
    """Round-10 VERDICT ask #1 guard: the AQE-credit gate composes with
    the row boundary exactly as documented. The mirror recomputes
    eligibility (conf + left-splittable ``how``, or the pinned
    ``aqe_backstop``) and capacity (Catalyst bytes-per-row estimate vs
    advisory × map-spread) with the SAME helpers the selector calls,
    so any refactor that moves either boundary — crediting an
    ineligible shape, skipping the capacity price, flipping <= for < —
    disagrees on some draw."""
    import math

    from event_stream_aggr_spark.operators.skew import (
        _aqe_skew_eligible,
        _conf_get,
        _est_bytes_per_row,
        _map_spread,
        _parse_bytes,
        join_skew_strategy,
    )

    df = _frame_from_multiplicities(spark, mults)
    par = spark.sparkContext.defaultParallelism
    mx, total = max(mults), sum(mults)
    if ratio is None:
        ratio = (mx * par) / total
    adv_key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    saved = _conf_get(spark, adv_key, "64MB")
    spark.conf.set(adv_key, advisory)
    try:
        if mx * par <= ratio * total:
            expected = ("plain", 1)
        else:
            eligible = (
                backstop
                if backstop is not None
                else _aqe_skew_eligible(spark, how)
            )
            bpr = _est_bytes_per_row(df, total)
            # spread = par capped by the estimated input-split count
            # (round-11 ADVICE: a probe side smaller than par ×
            # openCostInBytes scans in fewer splits than par, so its
            # hot key cannot spread over par map outputs)
            covered = bpr is not None and mx * bpr <= _parse_bytes(
                advisory
            ) * _map_spread(df, total, par, bpr)
            if eligible and covered:
                expected = ("plain", 1)
            else:
                expected = (
                    "salted",
                    max(2, min(32, math.ceil(mx * par / (ratio * total)))),
                )
        assert (
            join_skew_strategy(
                df, "k", task_budget_ratio=ratio, how=how, aqe_backstop=backstop
            )
            == expected
        )
    finally:
        spark.conf.set(adv_key, saved)


# DECIMAL values (or NULL); keys/grains small ints or NULL so the
# NULL-safe stitch and additive-identity paths are exercised
_maybe_key = st.one_of(st.integers(min_value=0, max_value=3), st.none())
_maybe_val = st.one_of(
    st.integers(min_value=-999, max_value=999).map(
        lambda c: Decimal(c) / Decimal(4)
    ),
    st.none(),
)
_rows = st.lists(
    st.tuples(_maybe_key, _maybe_key, _maybe_val), min_size=1, max_size=24
)


@_SETTINGS
@given(rows=_rows)
def test_staged_equals_plain_on_generated_decimal_frames(spark, rows):
    from event_stream_aggr_spark.operators.skew import staged_running_total

    # o = list index: a guaranteed TOTAL order within every key, the
    # helper's documented precondition
    df = spark.createDataFrame(
        [(k, g, o, v) for o, (k, g, v) in enumerate(rows)],
        "k int, g int, o int, v decimal(18,4)",
    )

    def collect(force):
        got = staged_running_total(
            df, key="k", grain="g", order=["o"], value=F.col("v"), force=force
        )
        return {
            (r.k, r.g, r.o): (
                None if r.running_total is None else str(r.running_total)
            )
            for r in got.collect()
        }

    plain, staged = collect("plain"), collect("staged")
    assert set(plain) == set(staged)  # no row dropped or duplicated
    assert plain == staged

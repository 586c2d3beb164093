"""Skew-handling join (SURVEY.md §2 scale hardening / Phase 4).

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
on in session.py): at runtime, oversized shuffle partitions of a
sort-merge join are split and the matching build side replicated.

``salted_join`` is the explicit fallback for the case AQE can't fix —
a single hot key whose rows exceed one executor's memory even after
splitting (the classic null-key / power-law-entity join):

- left (big, skewed) side: append a salt in [0, salt)
- right (smaller) side: replicate each row ``salt`` times (explode)
- equi-join on (key, salt) → the hot key's rows spread over ``salt``
  partitions instead of one.

The salt is DETERMINISTIC by default — ``xxhash64`` of the left row's
columns, mod ``salt``. A random salt (``F.rand``) would be a
non-deterministic shuffle key, and a shuffle keyed on non-deterministic
values is unsafe under stage retry / speculative execution: a re-run
map task re-draws different salts than the fetch that already
consumed its output, so rows can be duplicated or lost exactly when a
100 TB run is most likely to see task failures. Hashing the row's own
columns gives the same spread for distinct rows, identical results on
every retry, and no seed to manage. (Exact duplicate rows of a hot
key do land on one salt — if a workload's hot key is dominated by
byte-identical rows, pass ``salt_cols`` including a discriminator
column, or dedup first; that corpus shape is qd01's job anyway.)

Cost: right side inflates x salt — use only when |right| * salt is
shuffle-affordable, which is exactly the skewed-fact x dimension
shape. Results are identical to the plain join for the LEFT-preserving
join types (inner/left/left_semi/left_anti — tested); right/full outer
would emit ``salt`` duplicate null-extended rows for unmatched right
keys, so those types are rejected."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _fresh_name(base: str, taken_cols) -> str:
    """A column name not colliding with any name in ``taken_cols`` —
    CASE-INSENSITIVELY, because Spark resolves references with
    ``spark.sql.caseSensitive=false`` by default, so a user column
    ``_SALT`` collides with a working ``_salt`` at resolution and at
    ``drop`` time even though the strings differ."""
    lowered = {c.lower() for c in taken_cols}
    name, i = base, 0
    while name.lower() in lowered:
        i += 1
        name = f"{base}_{i}"
    return name


#: join types whose result is unchanged by replicating the right side
#: (every right row's contribution is gated on a matching left row).
_SALT_SAFE_HOW = {
    "inner",
    "left",
    "left_outer",
    "leftouter",
    "left_semi",
    "leftsemi",
    "semi",
    "left_anti",
    "leftanti",
    "anti",
}


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join ``left`` (skewed) with ``right`` on column ``on``,
    spreading each key over ``salt`` shuffle partitions.

    The salt is ``pmod(xxhash64(*salt_cols), salt)`` —
    ``salt_cols`` defaults to ALL of ``left``'s columns. Deterministic
    per row, so the shuffle is retry/speculation-safe (see module
    docstring for why ``F.rand`` here would not be).

    ``how`` must be left-preserving (see ``_SALT_SAFE_HOW``): with the
    right side replicated ``salt`` times, right/full outer joins would
    duplicate unmatched right rows, so they raise.
    """
    if how.lower() not in _SALT_SAFE_HOW:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}: "
            "replicating the right side would duplicate unmatched right rows "
            "under right/full outer semantics"
        )
    cols = salt_cols if salt_cols is not None else list(left.columns)
    # the working column is uniquified against BOTH sides (round-10
    # review): a user column literally named "_salt" would otherwise
    # be clobbered by withColumn and removed by the final drop — and
    # under auto_skew_join that schema change would appear or vanish
    # with the measured key distribution
    salt_col = _fresh_name("_salt", list(left.columns) + list(right.columns))
    salted_left = left.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt)).cast("int"),
    )
    salted_right = right.withColumn(
        salt_col, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_left.join(salted_right, [on, salt_col], how)
    return out.drop(salt_col)


# ---------------------------------------------------------------------------
# Cumulative-window skew mitigation: plain vs staged running total
# ---------------------------------------------------------------------------

#: stage the running total when the hottest key's row count exceeds
#: this fraction of an average task's row budget (total / parallelism).
#: A cumulative window's straggler is the ONE task that serializes the
#: hot key's whole history; below this share the plain window's single
#: pass is cheaper than the staged form's ~1.7x constant premium
#: (measured at sf0.1, BENCH_LOCAL `skew.window_twin`).
STAGED_WINDOW_TASK_BUDGET = 0.5


def running_total_strategy(
    df: DataFrame,
    key: str,
    task_budget_ratio: float = STAGED_WINDOW_TASK_BUDGET,
) -> str:
    """``'plain'`` or ``'staged'`` for a cumulative window partitioned
    by ``key`` — the qz04 planning recipe applied to windows: ONE
    map-side-combinable count per key reduced to (max, total), priced
    against the session's parallelism. A window serializes each key in
    one task, so the decision variable is the hottest key's share of
    an average task's rows, not max/mean (a key 3x the mean of a
    million tiny keys still fits one task comfortably)."""
    row = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"), F.sum("n").alias("total"))
        .first()
    )
    if not row or row.mx is None:
        return "plain"
    par = df.sparkSession.sparkContext.defaultParallelism
    return "staged" if row.mx * par > task_budget_ratio * row.total else "plain"


def staged_running_total(
    df: DataFrame,
    key: str,
    grain: str,
    order: list[str],
    value,
    out: str = "running_total",
    task_budget_ratio: float = STAGED_WINDOW_TASK_BUDGET,
    force: str | None = None,
) -> DataFrame:
    """Cumulative sum of ``value`` per ``key`` ordered by
    ``(grain, *order)``, choosing between the plain single window and
    qz06's two-phase staged decomposition by the measured key skew
    (round-8 VERDICT ask: qz06 proved the staged form but nothing
    selected between the two — the staged form costs ~1.7x on uniform
    data and only wins under hot keys).

    ``plain``: one window ``PARTITION BY key ORDER BY grain, *order``.
    ``staged``: (1) within-grain cumulative sums over ``(key, grain)``
    sub-partitions — the hot key's work parallelizes across its grain
    values; (2) per-(key, grain) totals EXCLUSIVE-prefix-summed per
    key (a chain of |grains| rows, not |rows|), joined back and added.
    No stage sees a partition proportional to a key's full history.

    Value-exactness requires an associative ``value`` type (DECIMAL or
    integer — float addition is order-sensitive; qz06's driver-checked
    oracle pins the staged==plain equality for DECIMAL) and that
    ``(grain, *order)`` is a TOTAL order within each key. NULL
    semantics match the plain window exactly (round-9 review fix):
    NULL key/grain values are ordinary partition values (the stitch
    join is NULL-SAFE), and a NULL ``value`` is additive identity on
    either side of the stitch, the way SUM skips NULLs — so the two
    branches return identical rows for any input.

    ``force`` pins a branch ('plain'/'staged') without the stats pass —
    qz06 forces 'staged' so the decomposition itself stays under the
    driver's oracle check; auto mode runs one count-per-key aggregate
    first (``running_total_strategy``), the same planning action class
    as AQE's runtime stats.
    """
    from pyspark.sql import Window as W

    if force not in (None, "plain", "staged"):
        raise ValueError(f"force must be None|'plain'|'staged', not {force!r}")
    choice = force or running_total_strategy(df, key, task_budget_ratio)
    if choice == "plain":
        w = W.partitionBy(key).orderBy(grain, *order).rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
        return df.withColumn(out, F.sum(value).over(w))
    # Working-column names are uniquified against the input schema
    # (round-9 ADVICE; case-insensitively since round 10 — Spark
    # resolves with caseSensitive=false, so "_PK" collides with
    # "_pk"): a user column named like a working column would
    # otherwise be silently replaced by withColumn and then dropped,
    # making the staged branch's output schema diverge from the plain
    # branch's for the same input.
    taken = list(df.columns)

    def _fresh(base: str) -> str:
        name = _fresh_name(base, taken)
        taken.append(name)
        return name

    c_cum, c_gt, c_pk, c_pg, c_pre = (
        _fresh("_cum_in_grain"),
        _fresh("_g_total"),
        _fresh("_pk"),
        _fresh("_pg"),
        _fresh("_prefix"),
    )
    w_in = W.partitionBy(key, grain).orderBy(*order).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    within = df.withColumn(c_cum, F.sum(value).over(w_in))
    grain_prefix = (
        df.groupBy(key, grain)
        .agg(F.sum(value).alias(c_gt))
        .select(
            F.col(key).alias(c_pk),
            F.col(grain).alias(c_pg),
            F.sum(c_gt).over(
                W.partitionBy(key).orderBy(grain).rowsBetween(
                    W.unboundedPreceding, -1
                )
            ).alias(c_pre),
        )
    )
    # NULL-safe stitch: a NULL key or grain is a regular partition
    # value to the plain window, so it must match here too; and either
    # summand being NULL (no non-null values yet in the grain / no
    # prior grains) acts as additive identity, exactly like SUM OVER
    stitched = within.join(
        grain_prefix,
        within[key].eqNullSafe(F.col(c_pk))
        & within[grain].eqNullSafe(F.col(c_pg)),
    )
    total = (
        F.when(F.col(c_pre).isNull(), F.col(c_cum))
        .when(F.col(c_cum).isNull(), F.col(c_pre))
        .otherwise(F.col(c_pre) + F.col(c_cum))
    )
    return (
        stitched.withColumn(out, total)
        .drop(c_pk, c_pg, c_cum, c_pre)
    )


# ---------------------------------------------------------------------------
# Join-skew auto-selection: plain (AQE) vs salted, priced by key stats
# ---------------------------------------------------------------------------

#: salt the join when the hottest key's row count exceeds this multiple
#: of an average task's row budget (total / parallelism). Twice the
#: window threshold (STAGED_WINDOW_TASK_BUDGET): a join has a FIRST
#: line of defense the window lacks — AQE's runtime skew-split divides
#: oversized sort-merge partitions by map-output ranges — so the
#: explicit salt only pays for itself once a single key materially
#: overflows a task on its own (the salted right side replicates x
#: salt, a real cost below that point).
SALTED_JOIN_TASK_BUDGET = 2.0

_AQE_ADVISORY_KEY = "spark.sql.adaptive.advisoryPartitionSizeInBytes"

_BYTE_UNITS = {
    "": 1,
    "b": 1,
    "k": 1024,
    "kb": 1024,
    "m": 1024**2,
    "mb": 1024**2,
    "g": 1024**3,
    "gb": 1024**3,
    "t": 1024**4,
    "tb": 1024**4,
    "p": 1024**5,
    "pb": 1024**5,
}


def _parse_bytes(text, default: int = 64 * 1024**2) -> int:
    """Spark byte-size conf strings ('64MB', '8m', '1048576') → bytes;
    unparseable → ``default`` (the conf's shipped default)."""
    import re

    m = re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]*)\s*", str(text))
    if not m:
        return default
    unit = m.group(2).lower()
    if unit not in _BYTE_UNITS:
        return default
    return int(m.group(1)) * _BYTE_UNITS[unit]


def _est_bytes_per_row(df: DataFrame, total_rows: int) -> float | None:
    """Catalyst's size estimate of ``df``'s optimized plan divided by
    the MEASURED row count — the cheapest bytes-per-row available
    without touching data (the count came from the selector's stats
    pass). Returns None when Catalyst has no usable estimate (the
    Long.MaxValue "unknown" sentinel, zero, or a missing JVM handle) —
    callers must then NOT credit a bytes-based backstop. Note a
    Python-``createDataFrame`` frame is RDD-backed and always reports
    the unknown sentinel — the selector then conservatively keeps the
    explicit salt (the pre-round-11 behavior); parquet-scanned plans,
    the only probe sides this repo ships, carry real file sizes."""
    try:
        raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j hands small BigIntegers back as Python ints; larger
        # JVM objects keep their toString
        size = float(raw if isinstance(raw, (int, float)) else raw.toString())
    except Exception:  # noqa: BLE001 — estimate only; absence is an answer
        return None
    # Long.MaxValue (9.22e18) is Catalyst's "unknown size" default
    if not (0 < size < 9.0e18) or total_rows <= 0:
        return None
    return size / total_rows


def _aqe_skew_eligible(spark, how: str) -> bool:
    """True when AQE's runtime skew-split is armed for a shuffled
    equi-join whose PROBE (left) side is the skewed one: both adaptive
    confs on, and a join type whose left side Spark's
    ``OptimizeSkewedJoin`` may split (inner / left outer / left semi /
    left anti — the same left-preserving set salting supports, which
    is not a coincidence: both mitigations replicate the build side
    against pieces of the probe side)."""
    if how.lower() not in _SALT_SAFE_HOW:
        return False
    conf = spark.conf

    def _on(key: str) -> bool:
        try:
            return str(conf.get(key)).lower() == "true"
        except Exception:  # noqa: BLE001 — unknown conf → not armed
            return False

    return _on("spark.sql.adaptive.enabled") and _on(
        "spark.sql.adaptive.skewJoin.enabled"
    )


def _map_spread(left: DataFrame, total: int, par: int, bpr: float) -> int:
    """How many upstream map tasks the hot key's rows plausibly spread
    over — the granularity floor of AQE's skew-split. ``par``
    (defaultParallelism) is the ceiling, but a SMALL probe side scans
    in fewer input splits than the session has cores, so the hot key
    lands on fewer map outputs than ``par`` assumes (round-11 ADVICE:
    crediting the full ``par`` there over-states AQE's split
    granularity and can skip a still-needed salt).

    The split count mirrors Spark's own ``FilePartition.maxSplitBytes``
    derivation (the file source targets ~``defaultParallelism``
    partitions, not bytes/maxPartitionBytes): ``maxSplit =
    min(maxPartitionBytes, max(openCostInBytes, bytes/par))``, splits
    = bytes/maxSplit. Consequence: a probe side of at least ``par ×
    openCostInBytes`` (4 MB default — i.e. anything over ~128 MB on 32
    cores) spreads over the full ``par`` exactly as before; only
    genuinely small inputs are de-credited. Uses the SAME Catalyst
    size estimate the capacity check already has — no extra stats
    pass."""
    import math

    spark = left.sparkSession
    mpb = _parse_bytes(
        _conf_get(spark, "spark.sql.files.maxPartitionBytes", "128MB"),
        default=128 * 1024**2,
    )
    open_cost = _parse_bytes(
        _conf_get(spark, "spark.sql.files.openCostInBytes", "4MB"),
        default=4 * 1024**2,
    )
    total_bytes = bpr * total
    max_split = min(mpb, max(open_cost, total_bytes / max(1, par)))
    est_splits = max(1, math.ceil(total_bytes / max_split))
    return min(par, est_splits)


def _aqe_covers_hot_key(left: DataFrame, mx: int, total: int, par: int) -> bool:
    """Can AQE's skew-split absorb a hot key of ``mx`` rows? AQE splits
    an oversized sort-merge partition by MAP-OUTPUT ranges into chunks
    of ~``advisoryPartitionSizeInBytes`` — a single key CAN be split
    (unlike any hash re-key), but never below one map task's output
    for that partition. With the hot key's rows spread over
    ``_map_spread`` upstream map tasks (defaultParallelism capped by
    the estimated input-split count, so a small probe side is not
    credited with spread it cannot have), the smallest reachable chunk
    is ``mx/spread`` rows, so AQE's splits hit their advisory target
    whenever the hot key's total estimated bytes fit ``advisory ×
    spread`` — the "advisory × split budget" bound. Beyond it (or when
    Catalyst can't estimate row width) the pre-shuffle salt is the
    remaining lever.

    Caveat, documented not detected: an input CLUSTERED by the join
    key concentrates the hot key in few map tasks, shrinking AQE's
    real split granularity below this uniform-spread estimate — force
    ``'salted'`` for that corpus shape. (The few-partitions case is
    now detected by the split-count cap; clustering within big inputs
    remains the documented residual.)"""
    bpr = _est_bytes_per_row(left, total)
    if bpr is None:
        return False
    advisory = _parse_bytes(
        _conf_get(left.sparkSession, _AQE_ADVISORY_KEY, "64MB")
    )
    return mx * bpr <= advisory * _map_spread(left, total, par, bpr)


def _conf_get(spark, key: str, default: str) -> str:
    try:
        return spark.conf.get(key, default)
    except Exception:  # noqa: BLE001
        return default


def join_skew_strategy(
    left: DataFrame,
    on: str,
    task_budget_ratio: float = SALTED_JOIN_TASK_BUDGET,
    max_salt: int = 32,
    how: str = "inner",
    stats: tuple[int, int] | None = None,
    aqe_backstop: bool | None = None,
) -> tuple[str, int]:
    """``('plain', 1)`` or ``('salted', salt)`` for an equi-join whose
    probe side is ``left`` — the qz04 planning recipe applied to joins
    (round-9 VERDICT ask #4: qz08 made window mitigation a priced
    default; joins still made the user CHOOSE ``salted_join``). ONE
    map-side-combinable count per key reduced to (max, total), priced
    against the session's parallelism: a shuffled equi-join serializes
    each key's probe rows through one task, so the decision variable
    is the hottest key's share of an average task's row budget —
    exactly ``running_total_strategy``'s, with a higher threshold
    because AQE skew-split already spreads moderate skew at runtime.

    Row skew alone no longer buys a salt (round-10 VERDICT: the bench
    twin measured plain+AQE at 1.03 s beating the salted choice at
    1.64 s at EQUAL task balance — the salt's right-side replication
    bought nothing AQE wasn't already delivering). When AQE skew-split
    is armed for this join shape (``_aqe_skew_eligible``) and the hot
    key's estimated bytes fit AQE's split capacity
    (``_aqe_covers_hot_key``: advisory × parallelism), the answer is
    PLAIN and the runtime backstop owns the skew. Salting remains for:
    AQE off, a non-splittable shape, a hot key too big for even
    map-granularity splits, or Catalyst unable to estimate row width.
    ``aqe_backstop`` pins eligibility for tests (None = detect from
    session conf + ``how``; True/False = force eligibility, capacity
    still priced when True).

    The salt count is sized to the measured excess, not guessed:
    spreading the hot key over ``salt`` buckets until its per-bucket
    rows fit the budget gives ``salt = ceil(mx*par / (ratio*total))``,
    clamped to [2, max_salt] (the right side replicates x salt, so the
    clamp bounds the replication cost a bad stat can buy).

    COST NOTE (round-10 ADVICE): the stats pass fully evaluates
    ``left`` once, and the join that follows evaluates it again — an
    expensive upstream plan is computed twice per call. Callers with a
    non-trivial ``left`` should ``disk_checkpoint`` it first (the
    lifecycle helper the iterative operators use), or pass a
    precomputed ``stats=(mx, total)`` pair to skip the pass entirely.
    """
    import math

    if stats is not None:
        mx, total = stats
    else:
        row = (
            left.groupBy(on)
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("mx"), F.sum("n").alias("total"))
            .first()
        )
        if not row:
            return ("plain", 1)
        mx, total = row.mx, row.total
    if mx is None or not total:
        return ("plain", 1)
    par = left.sparkSession.sparkContext.defaultParallelism
    if mx * par <= task_budget_ratio * total:
        return ("plain", 1)
    eligible = (
        aqe_backstop
        if aqe_backstop is not None
        else _aqe_skew_eligible(left.sparkSession, how)
    )
    if eligible and _aqe_covers_hot_key(left, mx, total, par):
        return ("plain", 1)
    salt = math.ceil(mx * par / (task_budget_ratio * total))
    return ("salted", max(2, min(max_salt, salt)))


def auto_skew_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt_cols: list[str] | None = None,
    task_budget_ratio: float = SALTED_JOIN_TASK_BUDGET,
    max_salt: int = 32,
    force: str | None = None,
    salt: int = 8,
    stats: tuple[int, int] | None = None,
) -> DataFrame:
    """Equi-join ``left`` (big/probe side) with ``right`` on ``on``,
    auto-selecting between the plain join (AQE's skew-split is the
    runtime backstop) and ``salted_join`` by the measured hot-key
    share AND the backstop's capacity — the deployable default a
    100 TB pipeline should call, the way ``staged_running_total`` is
    for cumulative windows. Round-10 re-price: when AQE skew-split is
    armed for this shape, plain wins unless the hot key's estimated
    bytes exceed AQE's split capacity (see ``join_skew_strategy``) —
    the salt's right-side replication is never bought where the free
    runtime split already restores balance. Both branches return
    identical rows for the left-preserving join types (the salt only
    routes rows across shuffle partitions; qz09's driver-checked
    oracle is the branch-independent plain join).

    ``how`` is validated EAGERLY (round-10 ADVICE: auto mode used to
    succeed on uniform data and raise from ``salted_join`` the day the
    stats pass measured skew — a data-dependent crash). Non-left-
    preserving types (right/full outer) deterministically take the
    plain join: replicating the right side is unsound there, so AQE —
    whose skew-split CAN split the right side of a right-outer
    sort-merge join — is the only mitigation; ``force='salted'`` with
    such a type raises immediately.

    ``force`` pins a branch ('plain'/'salted') without the stats pass
    (tests pin both; qz05 stays the always-salted regression pin);
    forced-salted uses the explicit ``salt`` parameter, auto mode the
    excess-sized count from ``join_skew_strategy``. ``stats=(mx,
    total)`` skips the stats pass (see the cost note there: an
    expensive ``left`` is otherwise evaluated twice per call)."""
    if force not in (None, "plain", "salted"):
        raise ValueError(f"force must be None|'plain'|'salted', not {force!r}")
    if how.lower() not in _SALT_SAFE_HOW:
        if force == "salted":
            raise ValueError(
                f"auto_skew_join cannot salt a {how!r} join: replicating the "
                "right side duplicates unmatched right rows under right/full "
                "outer semantics; drop force='salted' to take the plain join "
                "(AQE skew-split is the mitigation for those types)"
            )
        return left.join(right, on, how)
    if force == "plain":
        choice, k = "plain", 1
    elif force == "salted":
        choice, k = "salted", salt
    else:
        choice, k = join_skew_strategy(
            left, on, task_budget_ratio, max_salt, how=how, stats=stats
        )
    if choice == "plain":
        return left.join(right, on, how)
    return salted_join(left, right, on, salt=k, how=how, salt_cols=salt_cols)

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
    salted_left = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt)).cast("int")
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_left.join(salted_right, [on, "_salt"], how)
    return out.drop("_salt")

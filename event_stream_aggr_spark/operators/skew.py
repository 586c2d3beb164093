"""Skew-handling join (SURVEY.md §2 scale hardening / Phase 4).

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
on in session.py): at runtime, oversized shuffle partitions of a
sort-merge join are split and the matching build side replicated.

``salted_join`` is the explicit fallback for the case AQE can't fix —
a single hot key whose rows exceed one executor's memory even after
splitting (the classic null-key / power-law-entity join):

- left (big, skewed) side: append a random salt in [0, salt)
- right (smaller) side: replicate each row ``salt`` times (explode)
- equi-join on (key, salt) → the hot key's rows spread over ``salt``
  partitions instead of one.

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
) -> DataFrame:
    """Equi-join ``left`` (skewed) with ``right`` on column ``on``,
    spreading each key over ``salt`` shuffle partitions.

    ``F.rand`` seeds per-task; determinism of the RESULT does not
    depend on the salt values (they only route rows), so no fixed seed
    is needed.

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
    salted_left = left.withColumn("_salt", (F.rand() * salt).cast("int"))
    salted_right = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_left.join(salted_right, [on, "_salt"], how)
    return out.drop("_salt")

"""Registry id hygiene (round-12 VERDICT ask #7): registered numeric
ids must be UNIQUE within the live registry and NEVER REUSED across
rounds.

The rename-debt class this catches: a query renamed mid-round (r11:
qd17_soft_dedup_weights -> qd19_soft_dedup_weights; qt26 -> qt31)
retires its numeric id. If a LATER round registers a brand-new query
under a retired id (say a fresh ``qd17_span_stats``), the driver's
history union — keyed by full name but read by humans and the judge
by id — silently conflates two unrelated queries, and green rows from
the dead query's era read as provenance for the new one. Two
instances of the debt exist; this check makes the third impossible to
land quietly.

Rules, where an id is the leading ``q<letters><digits>`` token of a
registered name (``qd17_soft_dedup_weights`` -> ``qd17``):

1. UNIQUE: no two live registered names share an id.
2. NO REUSE: for every name that ever appeared in a committed
   CORRECTNESS_r*.json or in QUERY_HASHES.json, if its id is live
   today the live full name must be IDENTICAL — a retired id must
   stay retired.

Usage: python tools/check_registry_ids.py  -> exit 0 clean / 1 + report
Run in the round-close gate next to check_docs.py; the pure rule is
unit-tested in tests/test_registry_ids.py so it also runs on every
``pytest tests/`` invocation (commit time, not by hand).
"""

from __future__ import annotations

import json
import os
import re
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent

_ID_RE = re.compile(r"^(q[a-z]*\d+)_")

#: The two pre-existing instances of the debt (the renames that
#: MOTIVATED this check): the collision was resolved by moving the
#: older query to a fresh id, leaving the newer one holding a
#: technically-reused number. Grandfathered — frozen history, the
#: driver's per-name rows never conflated. Any NEW (retired, live)
#: pair fails.
GRANDFATHERED: frozenset[tuple[str, str]] = frozenset(
    {
        ("qd17_soft_dedup_weights", "qd17_band_canonical_dedup"),
        ("qt26_winnowing_fingerprints", "qt26_pmi_collocations"),
    }
)


def query_id(name: str) -> str | None:
    """``qd17_soft_dedup_weights`` -> ``qd17``; None if unnumbered."""
    m = _ID_RE.match(name)
    return m.group(1) if m else None


def historical_names(repo: Path) -> set[str]:
    """Every query name any committed round artifact ever recorded."""
    names: set[str] = set()
    for path in repo.glob("CORRECTNESS_r*.json"):
        try:
            names |= set(json.loads(path.read_text()))
        except (OSError, ValueError):
            continue
    try:
        names |= set(json.loads((repo / "QUERY_HASHES.json").read_text()))
    except (OSError, ValueError):
        pass
    return names


def check_ids(live: set[str], historical: set[str]) -> list[str]:
    """Pure rule (unit-tested): returns a list of violation strings,
    empty when the registry is clean."""
    problems: list[str] = []
    by_id: dict[str, list[str]] = {}
    for name in sorted(live):
        qid = query_id(name)
        if qid is not None:
            by_id.setdefault(qid, []).append(name)
    for qid, names in sorted(by_id.items()):
        if len(names) > 1:
            problems.append(f"id {qid} not unique: {names}")
    for hist in sorted(historical - live):
        qid = query_id(hist)
        if qid is None or qid not in by_id:
            continue  # id retired with its name, or never numeric
        for cur in by_id[qid]:
            if (hist, cur) in GRANDFATHERED:
                continue
            problems.append(
                f"id {qid} REUSED: live {cur!r} vs retired {hist!r} "
                "(pick the next free number instead)"
            )
    return problems


def main() -> int:
    sys.path.insert(0, str(HERE))
    from event_stream_aggr_spark.plans.registry import load_all

    live = set(load_all())
    problems = check_ids(live, historical_names(HERE))
    if problems:
        print("registry id hygiene FAILED:")
        for p in problems:
            print(f"  - {p}")
        return 1
    print(f"registry id hygiene OK ({len(live)} names, 0 violations)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

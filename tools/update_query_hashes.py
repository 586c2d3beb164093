"""Regenerate QUERY_HASHES.json — run at the START of a round, BEFORE
any source edits.

Timing matters: the driver's correctness check runs after the
previous round's final commit, so at the start of round N the working
tree is EXACTLY the state CORRECTNESS_r{N-1} verified. Refreshing
then records verified-state hashes. Running at END of round instead
would re-snapshot in-round edits of previously-sampled names as if
verified — the same staleness bug the merge fix closed, one round
later.

The file snapshots each registered query's (source + oracle) hash at
the state the driver's correctness harness LAST VERIFIED.  During the
next round, ``__spark_entry__._sample_priority_order`` treats any
query whose live hash differs from this snapshot as never-checked,
pushing it to the front of the driver's fixed-size verification
sample (the round-4 ADVICE: rewritten queries must not inherit their
pre-rewrite green status).

MERGE semantics (round-5 ADVICE — the judge's top ask): a name's
snapshot hash is refreshed ONLY if that name appears in the current
round's CORRECTNESS file, i.e. the driver actually re-verified the
current source.  Queries edited this round but NOT re-sampled keep
their prior (pre-edit) snapshot hash, so their live hash keeps
mismatching and they stay demoted to the front of the next sample —
previously a blanket overwrite erased exactly that signal (qt19/q29
were fixed in r5, unsampled, and silently re-aged to "checked at
r4").  Names the registry gained that have no prior snapshot are
recorded at their live hash (they have no CORRECTNESS row either, so
they already sort first); names dropped from the registry are pruned.

Usage: python tools/update_query_hashes.py [out_path]
"""

from __future__ import annotations

import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def latest_correctness_names(repo: Path) -> set[str]:
    """Names verified in the HIGHEST-numbered CORRECTNESS_r*.json."""
    best_round, best_path = -1, None
    for path in repo.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", path.name)
        if m and int(m.group(1)) > best_round:
            best_round, best_path = int(m.group(1)), path
    if best_path is None:
        return set()
    try:
        return set(json.loads(best_path.read_text()))
    except (OSError, ValueError):
        return set()


def merge_hashes(
    live: dict[str, str],
    prior: dict[str, str],
    checked: set[str],
) -> dict[str, str]:
    """Pure merge rule, unit-tested in tests/test_hash_snapshot.py:

    - name driver-checked this round  -> live hash (verified state)
    - name unchecked, has prior entry -> prior hash (keeps any edit
      demoted until the driver re-verifies it)
    - name unchecked, no prior entry  -> live hash (brand-new query;
      it has no CORRECTNESS row, so it already sorts first)
    - name no longer registered       -> dropped
    """
    merged: dict[str, str] = {}
    for name, live_hash in live.items():
        if name in checked or name not in prior:
            merged[name] = live_hash
        else:
            merged[name] = prior[name]
    return merged


def main() -> None:
    repo = Path(__file__).resolve().parent.parent
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else repo / "QUERY_HASHES.json"

    from event_stream_aggr_spark.plans.registry import source_hashes

    live = source_hashes()
    try:
        prior = json.loads((repo / "QUERY_HASHES.json").read_text())
    except (OSError, ValueError):
        prior = {}
    checked = latest_correctness_names(repo)

    merged = merge_hashes(live, prior, checked)
    kept = sum(
        1 for n, h in merged.items() if n in prior and h == prior[n] and h != live[n]
    )
    with open(out, "w") as f:
        json.dump(merged, f, indent=0, sort_keys=True)
        f.write("\n")
    print(
        f"wrote {len(merged)} hashes to {out} "
        f"({len(checked)} refreshed from driver check, "
        f"{kept} edited-but-unsampled kept at prior hash)"
    )


if __name__ == "__main__":
    main()

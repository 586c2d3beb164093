"""Regenerate QUERY_HASHES.json — run as the LAST step of a round.

The file snapshots each registered query's (source + oracle) hash at
the state the driver's correctness harness verifies.  During the next
round, ``__spark_entry__._sample_priority_order`` treats any query
whose live hash differs from this snapshot as never-checked, pushing
it to the front of the driver's fixed-size verification sample (the
round-4 ADVICE: rewritten queries must not inherit their pre-rewrite
green status).

Usage: python tools/update_query_hashes.py [out_path]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_stream_aggr_spark.plans.registry import source_hashes


def main() -> None:
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "QUERY_HASHES.json")
    )
    hashes = source_hashes()
    with open(out, "w") as f:
        json.dump(hashes, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(hashes)} hashes to {out}")


if __name__ == "__main__":
    main()

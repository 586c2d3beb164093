"""Registry id hygiene (tools/check_registry_ids.py): numeric ids are
unique in the live registry and never reused across rounds. The pure
rule is pinned on synthetic cases; the live check runs against the
actual registry + committed round artifacts so a violation fails the
suite at commit time, not at round close by hand."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_registry_ids import (  # noqa: E402
    check_ids,
    historical_names,
    query_id,
)


def test_query_id_extraction():
    assert query_id("q01_pricing_summary") == "q01"
    assert query_id("qd17_soft_dedup_weights") == "qd17"
    assert query_id("qer01_record_linkage") == "qer01"
    assert query_id("unnumbered_name") is None


def test_duplicate_live_id_flagged():
    probs = check_ids({"qd17_a", "qd17_b", "q01_x"}, set())
    assert len(probs) == 1 and "qd17 not unique" in probs[0]


def test_retired_id_reuse_flagged():
    # qd17_soft_dedup_weights retired in r11; a NEW qd17_* is a reuse
    probs = check_ids(
        live={"qd17_span_stats", "q01_x"},
        historical={"qd17_soft_dedup_weights", "q01_x"},
    )
    assert len(probs) == 1 and "qd17 REUSED" in probs[0]


def test_same_name_across_rounds_is_clean():
    probs = check_ids(
        live={"q01_x", "qd19_soft_dedup_weights"},
        historical={"q01_x", "qd17_soft_dedup_weights", "qt26_old"},
    )
    assert probs == []


def test_live_registry_is_clean():
    from event_stream_aggr_spark.plans.registry import load_all

    repo = Path(__file__).resolve().parent.parent
    assert check_ids(set(load_all()), historical_names(repo)) == []

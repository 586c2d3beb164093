"""Pin the QUERY_HASHES merge semantics + staleness-sampler demotion.

Round-5 ADVICE (judge's top ask): ``tools/update_query_hashes.py``
must MERGE, not overwrite — a name's snapshot hash refreshes only if
the driver re-checked that name in the current round, so a query
edited in-round but not re-sampled keeps mismatching its snapshot and
stays demoted to the front of the next driver sample.  And a name
whose latest driver row is non-green re-enters the sample immediately
instead of aging out behind fresh names.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.update_query_hashes import latest_correctness_names, merge_hashes

import __spark_entry__ as entry_mod


GREEN = {
    "rows_match": True,
    "schema_match": True,
    "hash_match": True,
    "spark_rows": 1,
    "oracle_rows": 1,
    "err": None,
}
RED = dict(GREEN, hash_match=False)
CRASH = dict(GREEN, hash_match=None, err="boom")


class TestMergeHashes:
    def test_checked_name_refreshes_to_live(self):
        merged = merge_hashes(
            live={"q1": "new"}, prior={"q1": "old"}, checked={"q1"}
        )
        assert merged == {"q1": "new"}

    def test_unchecked_edit_keeps_prior_hash(self):
        # THE round-5 bug: q1 was edited (live != prior) but the driver
        # did not re-sample it — its snapshot must stay at the prior
        # (verified) hash so the sampler keeps demoting it.
        merged = merge_hashes(
            live={"q1": "edited"}, prior={"q1": "verified"}, checked=set()
        )
        assert merged == {"q1": "verified"}

    def test_brand_new_name_recorded_at_live(self):
        merged = merge_hashes(live={"q2": "h2"}, prior={}, checked=set())
        assert merged == {"q2": "h2"}

    def test_deregistered_name_pruned(self):
        merged = merge_hashes(live={}, prior={"gone": "h"}, checked={"gone"})
        assert merged == {}

    def test_only_latest_round_counts_as_checked(self, tmp_path):
        (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps({"q1": GREEN}))
        (tmp_path / "CORRECTNESS_r06.json").write_text(json.dumps({"q2": GREEN}))
        assert latest_correctness_names(tmp_path) == {"q2"}


class TestSamplerDemotion:
    def _order(self, tmp_path: Path, rows_by_round, names):
        for rnd, rows in rows_by_round.items():
            (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
                json.dumps(rows)
            )
        return entry_mod._sample_priority_order(names, artifacts_dir=tmp_path)

    def test_red_latest_row_sorts_first(self, tmp_path):
        order = self._order(
            tmp_path,
            {4: {"q_red": RED, "q_green": GREEN}},
            ["q_green", "q_red"],
        )
        assert order[0] == "q_red"

    def test_crashed_latest_row_sorts_first(self, tmp_path):
        order = self._order(
            tmp_path,
            {4: {"q_crash": CRASH, "q_green": GREEN}},
            ["q_green", "q_crash"],
        )
        assert order[0] == "q_crash"

    def test_red_then_green_is_not_demoted(self, tmp_path):
        # fixed AND re-verified: the green r5 row supersedes the red r4
        order = self._order(
            tmp_path,
            {4: {"q_fixed": RED, "q_old": GREEN}, 5: {"q_fixed": GREEN}},
            ["q_fixed", "q_old"],
        )
        # q_old last checked r4, q_fixed r5 -> q_old is staler
        assert order == ["q_old", "q_fixed"]

    def test_never_checked_sorts_before_green(self, tmp_path):
        order = self._order(
            tmp_path,
            {5: {"q_seen": GREEN}},
            ["q_seen", "q_new"],
        )
        assert order[0] == "q_new"


def test_live_registry_hash_coverage():
    """No STALE snapshot entries: every snapshot name must still be
    registered (deregistered names would shadow real staleness).
    Registered-but-unsnapshotted names are fine mid-round — a missing
    entry reads as a hash mismatch, so the sampler already treats the
    new query as never-checked; it gets its entry at the next
    start-of-round update_query_hashes.py run."""
    from event_stream_aggr_spark.plans.registry import source_hashes

    snapshot = json.loads(
        (Path(__file__).resolve().parents[1] / "QUERY_HASHES.json").read_text()
    )
    assert set(snapshot) <= set(source_hashes())

"""Doc-number reconciliation (round-10 VERDICT ask #4): verify that
every CURRENT-STATE numeric claim in README/COVERAGE that cites a
committed artifact actually matches that artifact, so the recurring
class — a claim written from a pre-final run and never regenerated
(r10: "imbalance 3.19 → 1.66" vs the shipped artifact's 4.36 → 1.82)
— fails loudly at round close instead of surviving into the judge's
diff.

Scope: claims about the CURRENT artifacts (BENCH_LOCAL.json and
friends). Historical per-round notes ("round 7: 29.51 s") are frozen
history and deliberately unchecked.

Each check is (doc file, regex with named groups, {group: artifact
path}, note). An artifact path is "FILE.json#dotted.key.path". A doc
number matches when the artifact value, rounded to the same number of
decimals the doc printed, equals it — docs may round, they may not
drift. A missing claim pattern is itself a failure: it means the doc
was rewritten without updating the check (or the claim silently
dropped), both worth a look.

Usage: python tools/check_docs.py   → exit 0 (all match) / 1 + report
Run at round close: copy the final bench run's BENCH_LOCAL.json to
BENCH_R{N}_CLOSE.json (an immutable committed snapshot), point CHECKS
at it, and regenerate the doc claims from it. Claims must cite the
SNAPSHOT, not the live BENCH_LOCAL.json — the driver re-runs bench.py
after the builder's turns end and overwrites BENCH_LOCAL with
noise-shifted numbers, which would fail the check for no real reason
(run-to-run timing drift is the documented ±25-65%; the paired
same-boot A/B inside the artifact is the cross-run signal).
"""

from __future__ import annotations

import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def artifact(path: str):
    fname, dotted = path.split("#", 1)
    with open(os.path.join(HERE, fname)) as f:
        val = json.load(f)
    for part in dotted.split("."):
        val = val[part]
    return val


def _matches(doc_text: str, want) -> bool:
    """Doc string vs artifact value: exact for strings/ints, and for
    floats equal after rounding the artifact to the doc's printed
    precision (the doc may round 1.0298 to '1.03', not restate it)."""
    if isinstance(want, bool):
        return doc_text.lower() == str(want).lower()
    if isinstance(want, (int, float)):
        try:
            got_num = float(doc_text)
        except ValueError:
            return False
        decimals = len(doc_text.split(".")[1]) if "." in doc_text else 0
        return round(float(want), decimals) == got_num
    return doc_text == str(want)


#: (doc file, claim regex (named groups), {group: artifact path}, note)
CHECKS: list[tuple[str, str, dict[str, str], str]] = [
    (
        "README.md",
        r"unmitigated imbalance (?P<unmit>[\d.]+) vs plain\+AQE "
        r"(?P<aqe>[\d.]+); auto strategy `(?P<choice>\w+)/(?P<salt>\d+)` at "
        r"(?P<auto_sec>[\d.]+) s vs plain_aqe_skewjoin (?P<paqe_sec>[\d.]+) s"
        r"; backstop disarmed: `(?P<off_choice>\w+)/(?P<off_salt>\d+)`",
        {
            "unmit": "BENCH_R11_CLOSE.json#skew.salted_twin.plain_unmitigated.task_imbalance",
            "aqe": "BENCH_R11_CLOSE.json#skew.salted_twin.plain_aqe_skewjoin.task_imbalance",
            "choice": "BENCH_R11_CLOSE.json#skew.salted_twin.auto_join.strategy.choice",
            "salt": "BENCH_R11_CLOSE.json#skew.salted_twin.auto_join.strategy.salt",
            "auto_sec": "BENCH_R11_CLOSE.json#skew.salted_twin.auto_join.sec",
            "paqe_sec": "BENCH_R11_CLOSE.json#skew.salted_twin.plain_aqe_skewjoin.sec",
            "off_choice": "BENCH_R11_CLOSE.json#skew.salted_twin.auto_join_aqe_off.strategy.choice",
            "off_salt": "BENCH_R11_CLOSE.json#skew.salted_twin.auto_join_aqe_off.strategy.salt",
        },
        "r11 salted-twin claim (the r10 drift class)",
    ),
    (
        "COVERAGE.md",
        r"salted_twin: auto `(?P<choice>\w+)/(?P<salt>\d+)` under armed AQE, "
        r"`(?P<off_choice>\w+)/(?P<off_salt>\d+)` disarmed",
        {
            "choice": "BENCH_R15_CLOSE.json#skew.salted_twin.auto_join.strategy.choice",
            "salt": "BENCH_R15_CLOSE.json#skew.salted_twin.auto_join.strategy.salt",
            "off_choice": "BENCH_R15_CLOSE.json#skew.salted_twin.auto_join_aqe_off.strategy.choice",
            "off_salt": "BENCH_R15_CLOSE.json#skew.salted_twin.auto_join_aqe_off.strategy.salt",
        },
        "COVERAGE skew-row selector claim",
    ),
    (
        "README.md",
        r"stage budget covers (?P<frac>[\d.]+)x? of the measured batch",
        {
            "frac": "BENCH_R15_CLOSE.json#streaming_curation.stages.covers_frac_of_sec",
        },
        "curation full-batch budget coverage claim (first match is the r15 section)",
    ),
    (
        "README.md",
        r"paired median (?P<med>[\d.]+) over (?P<n>\d+)(?:/\d+)? "
        r"(?:headline )?queries",
        {
            "med": "BENCH_R15_CLOSE.json#vs_prev_same_boot.median_ratio_cur_over_prev",
            "n": "BENCH_R15_CLOSE.json#vs_prev_same_boot.n_compared",
        },
        "same-boot A/B headline claim (r15; first match in README is the r15 section)",
    ),
    (
        "README.md",
        r"near-dedup gate at (?P<nd>[\d.]+) docs/s",
        {
            "nd": "BENCH_R15_CLOSE.json#streaming_near_dedup.docs_per_sec",
        },
        "r15 near-dedup gate rate claim (first match is the r15 section)",
    ),
    (
        "README.md",
        r"ER gate at (?P<er>[\d.]+) records/s with paired same-boot "
        r"stream ratio (?P<ratio>[\d.]+)",
        {
            "er": "BENCH_R15_CLOSE.json#streaming_entity_resolution.records_per_sec",
            "ratio": "BENCH_R15_CLOSE.json#vs_prev_same_boot.stream_ratios.entity_resolution",
        },
        "r15 ER gate rate + paired ratio claim",
    ),
    (
        "README.md",
        r"ER stage budget covers (?P<frac>[\d.]+)x of its measured batch",
        {
            "frac": "BENCH_R15_CLOSE.json#streaming_entity_resolution.stages.covers_frac_of_sec",
        },
        "r15 ER full-batch budget coverage claim",
    ),
    (
        "README.md",
        r"near-dedup stage budget covers (?P<frac>[\d.]+)x of its "
        r"measured batch",
        {
            "frac": "BENCH_R15_CLOSE.json#streaming_near_dedup.stages.covers_frac_of_sec",
        },
        "r15 near-dedup full-batch budget coverage claim",
    ),
    (
        "README.md",
        r"skyline maintainer at (?P<sk>[\d.]+) parts/s; top-k "
        r"maintainer at (?P<tk>[\d.]+) orders/s",
        {
            "sk": "BENCH_R15_CLOSE.json#streaming_skyline.parts_per_sec",
            "tk": "BENCH_R15_CLOSE.json#streaming_topk.orders_per_sec",
        },
        "r15 skyline/top-k maintainer rate claims",
    ),
    (
        "README.md",
        r"`batch_components_assembly` marginal 4.96 → \*\*(?P<m>[\d.]+) s\*\*",
        {
            "m": "BENCH_R15_CLOSE.json#streaming_entity_resolution.stages.batch_components_assembly.marginal_sec",
        },
        "r15 components-dominator stage claim",
    ),
    (
        "README.md",
        r"flat (?P<fl>[\d.]+) rec/s, composed (?P<co>[\d.]+) rec/s",
        {
            "fl": "BENCH_R15_CLOSE.json#streaming_entity_resolution.modes.flat.records_per_sec",
            "co": "BENCH_R15_CLOSE.json#streaming_entity_resolution.modes.composed.records_per_sec",
        },
        "r15 gate mode pricing claim",
    ),
]


def check_plans_coverage(failures: list[str]) -> None:
    """Round-14 VERDICT ask #4: every REGISTERED query must have a
    plan snapshot in PLANS.md (a `## name` section). Previously
    PLANS covered only the bench headline, so a newly registered
    query (r13: qer04/qa12) could ship rounds without a committed
    plan audit. Registry names come from the static source scan
    (no Spark session needed at doc-check time)."""
    try:
        sys.path.insert(0, HERE)
        from event_stream_aggr_spark.plans.registry import load_all

        names = set(load_all())
    except Exception as exc:  # registry must be importable at close
        failures.append(f"registry unimportable for PLANS check ({exc!r})")
        return
    try:
        plans = open(os.path.join(HERE, "PLANS.md")).read()
    except OSError as exc:
        failures.append(f"PLANS.md: unreadable ({exc})")
        return
    have = set(re.findall(r"^## (\S+)$", plans, flags=re.M))
    missing = sorted(names - have)
    if missing:
        failures.append(
            f"PLANS.md: {len(missing)} registered quer"
            f"{'y' if len(missing) == 1 else 'ies'} with no plan "
            f"snapshot (regenerate via tools/explain_audit.py): "
            + ", ".join(missing[:10])
            + ("…" if len(missing) > 10 else "")
        )
    stale = sorted(have - names)
    if stale:
        failures.append(
            f"PLANS.md: {len(stale)} section(s) for unregistered "
            "names (regenerate): " + ", ".join(stale[:10])
        )


def main() -> int:
    failures: list[str] = []
    check_plans_coverage(failures)
    for fname, pattern, mapping, note in CHECKS:
        path = os.path.join(HERE, fname)
        try:
            text = open(path).read()
        except OSError as exc:
            failures.append(f"{fname}: unreadable ({exc})")
            continue
        # markdown hard-wraps prose; collapse all whitespace runs so
        # patterns are written with plain single spaces
        text = re.sub(r"\s+", " ", text)
        m = re.search(pattern, text)
        if not m:
            failures.append(
                f"{fname}: claim not found ({note}) — pattern {pattern!r}"
            )
            continue
        for group, apath in mapping.items():
            try:
                want = artifact(apath)
            except (OSError, KeyError, ValueError) as exc:
                failures.append(f"{apath}: unreadable ({exc!r})")
                continue
            got = m.group(group)
            if not _matches(got, want):
                failures.append(
                    f"{fname} ({note}): doc says {group}={got!r}, "
                    f"artifact {apath} = {want!r}"
                )
    if failures:
        print(f"{len(failures)} doc/artifact mismatch(es):")
        for f in failures:
            print(f"  - {f}")
        return 1
    print(f"all {len(CHECKS)} doc claims match their artifacts")
    return 0


if __name__ == "__main__":
    sys.exit(main())

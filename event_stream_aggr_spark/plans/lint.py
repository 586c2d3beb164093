"""Plan lints — mechanical backstops for the 100 TB design rules.

``partitionless_window_violations`` guards the one documented
exception to the "never move all data to a single partition" rule: a
global (partitionless) ``Window`` is acceptable ONLY over a relation
some upstream operator has already bounded (an aggregation's group
grain, a limit, a dedup, a literal) — e.g. qa04's decile assignment
over domain-bounded micro-buckets or qt24's frequency-ranked vocab
prefix. A partitionless window directly over a fact-grain relation
would serialize the whole table through one task at 100 TB
(``WindowExec: No Partition Defined``), and nothing short of this lint
mechanically prevents a future query from doing that (round-7 VERDICT
ask #3).

The check walks the OPTIMIZED logical plan (post-pushdown, so what we
assert is what will execute), reconstructed from ``toJSON()``'s
pre-order flattening. For every ``Window`` whose ``partitionSpec`` is
empty, every leaf beneath it must be separated from the window by a
bounding node:

- ``Aggregate`` (output is the group grain, not the fact grain),
- ``GlobalLimit`` / ``LocalLimit`` (explicitly bounded),
- ``Deduplicate`` (distinct grain),
- ``LocalRelation`` / ``OneRowRelation`` / ``Range`` (literal/driver
  data, bounded by construction).

``all paths`` matters: a window over ``agg ⋈ fact`` is still a
violation — the fact side would stream through the single partition.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame

#: logical nodes whose OUTPUT is bounded regardless of what's beneath
#: them — reaching one of these on the way down ends the search.
_BOUNDING = {
    "Aggregate",
    "GlobalLimit",
    "LocalLimit",
    "Deduplicate",
    "LocalRelation",
    "OneRowRelation",
    "Range",
}

#: leaf relations at fact grain — reaching one of these WITHOUT
#: passing a bounding node is a violation.
_LEAF = {
    "LogicalRelation",
    "HiveTableRelation",
    "UnresolvedRelation",
    "StreamingRelation",
    "StreamingRelationV2",
    "DataSourceV2Relation",
    "DataSourceV2ScanRelation",
}


def _build_tree(nodes: list[dict[str, Any]]) -> dict[str, Any]:
    """Reconstruct the tree from TreeNode.toJSON()'s pre-order list."""
    pos = 0

    def rec() -> dict[str, Any]:
        nonlocal pos
        node = dict(nodes[pos])
        pos += 1
        node["_children"] = [rec() for _ in range(node.get("num-children", 0))]
        return node

    root = rec()
    return root

def _cls(node: dict[str, Any]) -> str:
    return node["class"].rsplit(".", 1)[-1]


def _subtree_bounded(node: dict[str, Any]) -> bool:
    cls = _cls(node)
    if cls in _BOUNDING:
        return True
    if cls in _LEAF or not node["_children"]:
        # unknown leaf = fact-grain relation until proven otherwise
        return cls in _BOUNDING
    return all(_subtree_bounded(c) for c in node["_children"])


def _walk(node: dict[str, Any], out: list[str]) -> None:
    if _cls(node) == "Window" and not node.get("partitionSpec"):
        if not all(_subtree_bounded(c) for c in node["_children"]):
            fns = json.dumps(node.get("windowExpressions"))[:120]
            out.append(f"partitionless Window over unbounded input: {fns}")
    for c in node["_children"]:
        _walk(c, out)


def partitionless_window_violations(df: DataFrame) -> list[str]:
    """Return one message per partitionless Window in ``df``'s
    optimized plan whose input is not provably bounded (empty list =
    clean). Pure plan inspection — never executes the query."""
    nodes = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())
    root = _build_tree(nodes)
    violations: list[str] = []
    _walk(root, violations)
    return violations

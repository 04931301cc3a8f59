#!/usr/bin/env python
"""Scratch sweep: for every registered query, list each broadcast-hint
subtree's leaf relations so the package-wide hint lint can be pinned
against reality. In the OPTIMIZED plan, EliminateResolvedHint has
folded hints into the Join nodes as leftHint=/rightHint= annotations,
so the sweep finds hinted Join nodes and descends into the hinted
child. Run: python tools/hint_sweep.py"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GLYPH = re.compile(r"^([:+\-\s]*)")
LEAF = re.compile(
    r"^(Relation|Range|LocalRelation|OneRowRelation|LogicalRDD|ExternalRDD)"
)


def depth(line: str) -> int:
    return len(GLYPH.match(line).group(1))


def node_text(line: str) -> str:
    return line[depth(line):]


def children(lines, i):
    """Indices of the direct children of the node at line i."""
    d = depth(lines[i])
    out = []
    for j in range(i + 1, len(lines)):
        dj = depth(lines[j])
        if dj <= d:
            break
        if dj == d + 3:
            out.append(j)
    return out


def subtree_leaves(lines, i):
    d = depth(lines[i])
    leaves = []
    node = node_text(lines[i])
    if LEAF.match(node):
        leaves.append(node[:110])
    for j in range(i + 1, len(lines)):
        if depth(lines[j]) <= d:
            break
        sn = node_text(lines[j])
        if LEAF.match(sn):
            leaves.append(sn[:110])
    return leaves


def hinted_sides(plan: str):
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        node = node_text(line)
        if not node.startswith("Join"):
            continue
        kids = children(lines, i)
        if "leftHint=(strategy=broadcast)" in node and kids:
            yield "left", subtree_leaves(lines, kids[0])
        if "rightHint=(strategy=broadcast)" in node and len(kids) > 1:
            yield "right", subtree_leaves(lines, kids[1])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from etl_process_for_fraud_transactions_spark.plans import QUERIES
    from etl_process_for_fraud_transactions_spark.session import get_spark

    spark = get_spark("hint-sweep")
    spark.conf.set("spark.sql.debug.maxToStringFields", "2000")
    for name, fn in sorted(QUERIES.items()):
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"== {name}: ERROR {e}")
            continue
        subs = list(hinted_sides(plan))
        n_markers = plan.count("strategy=broadcast")
        if subs or n_markers:
            print(f"== {name}: {len(subs)} hinted side(s), {n_markers} markers")
            for side, leaves in subs:
                for l in leaves:
                    print(f"   {side} leaf: {l}")
                if not leaves:
                    print(f"   {side} leaf: <none found>")


if __name__ == "__main__":
    main()

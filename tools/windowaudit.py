"""Measure partitionless-window INPUT sizes across two scale factors.

The whitelist in tools/plans.py claims an axis class for every key that
runs an unpartitioned WindowExec (bounded / saturating / catalog /
by-contract). This tool produces the evidence behind those claims: for
each key it executes the query at two SFs and reads, for every
partitionless Window-family node, the first descendant numOutputRows
metric (sorts don't change cardinality, so that IS the window's input).
A flat pair = bounded axis; ~rows-ratio growth = investigate (partition
it, rewrite over a distinct-value axis, or justify by-contract).

Usage:
    python tools/windowaudit.py                  # all whitelisted keys
    python tools/windowaudit.py a_gini w_ntile   # subset
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from npc_recommender_netflix_spark import registry
from npc_recommender_netflix_spark.session import build_session
from tools.plans import PARTITIONLESS_WINDOW_WHITELIST

registry.load_all()

SF_A = os.environ.get("SPARK_GRAFT_WINDOW_SF_A", "/root/testdata/sf0.001")
SF_B = os.environ.get("SPARK_GRAFT_WINDOW_SF_B", "/root/testdata/sf0.01")


def _metric(node, name):
    m = node.metrics()
    it = m.keysIterator()
    while it.hasNext():
        if it.next() == name:
            return int(m.apply(name).value())
    return None


def _input_rows(node):
    """First numOutputRows found strictly below `node` (BFS)."""
    queue = []
    ch = node.children()
    for i in range(ch.size()):
        queue.append(ch.apply(i))
    while queue:
        n = queue.pop(0)
        cls = n.getClass().getSimpleName()
        v = _metric(n, "numOutputRows")
        if v is not None:
            return v
        if cls == "AdaptiveSparkPlanExec":
            queue.append(n.executedPlan())
        elif cls.endswith("QueryStageExec"):
            queue.append(n.plan())
        c2 = n.children()
        for i in range(c2.size()):
            queue.append(c2.apply(i))
    return -1


def window_input_rows(df) -> list[int]:
    """Input row counts of every partitionless Window node in df's
    EXECUTED plan (call after an action so metrics are populated)."""
    rows: list[int] = []

    def walk(node):
        cls = node.getClass().getSimpleName()
        if "Window" in cls and node.partitionSpec().isEmpty():
            rows.append(_input_rows(node))
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
        elif cls.endswith("QueryStageExec"):
            walk(node.plan())
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return rows


def main() -> None:
    keys = sys.argv[1:] or [
        k for k in sorted(PARTITIONLESS_WINDOW_WHITELIST)
        if not k.startswith("st_")
    ]
    spark = build_session(app="npc-windowaudit")
    for key in keys:
        rec = {}
        for sf in (SF_A, SF_B):
            df = registry.QUERIES[key](spark, sf)
            df.collect()
            rec[os.path.basename(sf)] = window_input_rows(df)
            spark.catalog.clearCache()
        a, b = rec.values()
        ratio = (
            f"{max(b) / max(max(a), 1):.1f}x" if a and b and -1 not in a else "?"
        )
        print(f"{key:28s} {list(rec)[0]}={a} {list(rec)[1]}={b} max-ratio={ratio}",
              flush=True)


if __name__ == "__main__":
    main()

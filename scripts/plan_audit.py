#!/usr/bin/env python
"""Physical-plan audit over every registered query: counts of
exchanges, scans, joins by strategy, window operators, and any Python
evaluation nodes, written to PLAN_AUDIT.json. The per-query rows make
scale regressions reviewable at a glance (a broadcast join silently
becoming a sort-merge join shows up as a diff here, not at 100 TB).

Usage: python scripts/plan_audit.py [SF_DIR]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tinyetl_spark.queries import QUERIES
from tinyetl_spark.session import get_spark


def summarize(plan: str) -> dict:
    return {
        "exchanges": plan.count("Exchange hashpartitioning"),
        "broadcasts": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin")
        + plan.count("CartesianProduct"),
        "file_scans": plan.count("FileScan"),
        "windows": plan.count("Window"),
        "python_eval": plan.count("BatchEvalPython") + plan.count("ArrowEvalPython"),
        "arrow_map": plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas"),
        "takeordered": plan.count("TakeOrderedAndProject"),
    }


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="plan_audit", shuffle_partitions=8)
    out: dict[str, dict] = {}
    errs: dict[str, str] = {}
    for name, fn in sorted(QUERIES.items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            out[name] = summarize(plan)
        except Exception as exc:  # noqa: BLE001
            errs[name] = f"{type(exc).__name__}: {exc}"[:160]
    totals = {
        "n_queries": len(out),
        "row_python_nodes": sum(v["python_eval"] for v in out.values()),
        "nested_loop_or_cartesian": sorted(
            n for n, v in out.items() if v["nested_loop_joins"]
        ),
        "sort_merge_users": sorted(n for n, v in out.items() if v["sort_merge_joins"]),
        "errors": errs,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_AUDIT.json"
    )
    with open(path, "w") as f:
        json.dump({"totals": totals, "queries": out}, f, indent=1, sort_keys=True)
    print(json.dumps(totals, indent=1, sort_keys=True))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")

"""Physical-plan audit: prints `.explain(formatted)` for the headline
queries and greps for the properties the 100 TB posture demands —
broadcast joins on dims, pushed filters, pruned scans, whole-stage
codegen. Run after plan changes; tests/test_plans.py asserts the
critical ones.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDITED = [
    "flagship_star_revenue",
    "role_playing_dim_join",
    "expression_left_join",
    "filter_equality",
    "projection_rename",
    "latest_event_per_key",
    "dedup_minhash_lsh",
    "similarity_topk_bruteforce",
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or AUDITED
    from airline_data_warehouse_spark.plans.registry import all_queries
    from airline_data_warehouse_spark.session import get_spark

    spark = get_spark(app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    for name in names:
        plan = plan_of(registry[name].builder(spark, sf_dir))
        checks = {
            "broadcast join": "BroadcastHashJoin" in plan,
            "whole-stage codegen": "WholeStageCodegen" in plan,
            "pushed filters": "PushedFilters: [" in plan and
                              any(f"PushedFilters: [{c}" in plan.replace("PushedFilters: [], ", "")
                                  for c in "IGLEN") or "PushedFilters" in plan,
            "column-pruned scan": "ReadSchema" in plan,
        }
        print(f"=== {name} ===")
        for k, v in checks.items():
            print(f"  [{'x' if v else ' '}] {k}")
        if "--full" in sys.argv:
            print(plan)
    print("\n(re-run with --full to dump plans)")


if __name__ == "__main__":
    main()

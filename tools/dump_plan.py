"""Dump `.explain("formatted")` for registry queries — the r15 plan
artifact writer (plans/r15/<query>_{before,after}.txt). AQE is disabled
for the dump so join choices / codegen spans are visible statically
(the explain_audit.py rationale).

Usage: python tools/dump_plan.py sf_dir query [query ...]
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from airline_data_warehouse_spark.plans.registry import all_queries
    from airline_data_warehouse_spark.session import get_spark

    spark = get_spark(app_name="dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    registry = all_queries()
    for name in names:
        buf = io.StringIO()
        with redirect_stdout(buf):
            registry[name].builder(spark, sf_dir).explain("formatted")
        print(f"=== {name} ===")
        print(buf.getvalue())


if __name__ == "__main__":
    main()

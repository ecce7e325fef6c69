"""Run one catalog query and show its result + physical plan.

Usage: python tools/run_query.py <name> [sf_dir] [--plan]

Dev loop companion to check_parity.py (correctness) and plan_report.py
(fleet-wide plan audit): inspect a single query's output and, with
--plan, its formatted explain.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--plan"]
    show_plan = "--plan" in sys.argv
    if not args:
        from shuttlestandalonedbcreator_spark.queries import CATALOG

        print("usage: run_query.py <name> [sf_dir] [--plan]\navailable:")
        for name in sorted(CATALOG):
            print(" ", name)
        return
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    from shuttlestandalonedbcreator_spark.queries import CATALOG
    from shuttlestandalonedbcreator_spark.session import get_spark

    spark = get_spark(app_name=f"run-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    df = CATALOG[name].spark(spark, sf_dir)
    df.show(50, truncate=False)
    print(f"rows: {df.count()}")
    if show_plan:
        df.explain("formatted")


if __name__ == "__main__":
    main()

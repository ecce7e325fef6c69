"""Round-10 optimization harness: isolate one or more catalog queries,
time them against the noop sink (guide §1.4) and dump their
``explain("formatted")`` plans into plans/r10/.

Usage: python tools/opt_profile.py <tag> <query> [query ...] [--sf SF_DIR]
                                   [--runs N] [--no-plan]

- <tag> names the plan snapshot: plans/r10/<query>_<tag>.txt
  (the round's deliverable uses tags "before" and "after").
- Timing is best-of-N (default 3) in THIS fresh process, after a session
  warmup, with the job labelled (guide §1.5). Plans are captured from an
  executed collect() so AQE finalizes them (same trick as plan_report).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLAN_DIR = os.path.join(REPO, "plans", "r10")


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 3
    capture_plan = True
    if "--no-plan" in args:
        capture_plan = False
        args.remove("--no-plan")
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    tag, names = args[0], args[1:]

    from shuttlestandalonedbcreator_spark.queries import CATALOG
    from shuttlestandalonedbcreator_spark.session import get_spark

    spark = get_spark(app_name=f"opt-profile-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()  # session/JIT warmup

    os.makedirs(PLAN_DIR, exist_ok=True)
    out: dict[str, float] = {}
    for name in names:
        qd = CATALOG[name]
        if capture_plan:
            df = qd.spark(spark, sf_dir)
            df.collect()  # finalize AQE so the plan shows the real shape
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(PLAN_DIR, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(plan)
        best = None
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"{tag}:{name}")
            t0 = time.perf_counter()
            qd.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "timings": out}))


if __name__ == "__main__":
    main()

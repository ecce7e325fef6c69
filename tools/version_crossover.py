"""Measure incremental-snapshot commit cost vs table size.

Fixed CDC batch (2 of 64 hash buckets of lineitem), table scaled by
replication: `write_version` re-writes the WHOLE snapshot per commit
(cost grows with the table); `write_version_incremental` hard-links the
untouched partition dirs and rewrites only the batch's buckets — its
commit cost must stay ~flat. That flatness is SCALING.md's versioned-
snapshot claim ("commit cost is the changed partitions + the pointer
swap") as a measurement.

Usage: python tools/version_crossover.py [sf_dir] [replicas...]
One JSON line per table size; results quoted in SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from shuttlestandalonedbcreator_spark.plans.versioned import (  # noqa: E402
    read_table,
    write_version,
    write_version_incremental,
)
from shuttlestandalonedbcreator_spark.session import get_spark  # noqa: E402
from shuttlestandalonedbcreator_spark.sources.registry import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = [int(x) for x in sys.argv[2:]] or [1, 4, 10]
    spark = get_spark(app_name="version_crossover")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        F.lit(1).alias("ver"),
    )
    batch = (
        base.filter(
            (F.col("l_orderkey") % 64).isin(3, 17) & (F.col("l_orderkey") % 7 == 0)
        )
        .withColumn("ver", F.lit(2))
        .withColumn("op", F.lit("U"))
        .withColumn("bucket", F.col("l_orderkey") % 64)
        .localCheckpoint(eager=True)
    )

    for r in replicas:
        tbl = base
        for i in range(1, r):
            tbl = tbl.unionByName(
                base.withColumn(
                    "l_orderkey", F.col("l_orderkey") + F.lit(i * (1 << 40))
                )
            )
        tbl = tbl.withColumn("bucket", F.col("l_orderkey") % 64)
        root = tempfile.mkdtemp(prefix="version_xover_")
        try:
            inc = os.path.join(root, "inc")
            full = os.path.join(root, "full")
            # v1 on both tables (not timed — the bootstrap writes the table)
            write_version_incremental(
                spark, inc, tbl, keys=["l_orderkey", "l_linenumber"],
                order_col="ver", partition_col="bucket",
            )
            write_version(spark, tbl, full)
            n = read_table(spark, inc).count()

            t0 = time.perf_counter()
            write_version_incremental(
                spark, inc, batch, keys=["l_orderkey", "l_linenumber"],
                order_col="ver", partition_col="bucket", op_col="op",
            )
            t_inc = round(time.perf_counter() - t0, 3)

            # full-rewrite commit: apply the batch in-plan, rewrite all
            t0 = time.perf_counter()
            cur = read_table(spark, full)
            upd = batch.drop("op")
            merged = (
                cur.join(
                    upd.select("l_orderkey", "l_linenumber"),
                    ["l_orderkey", "l_linenumber"],
                    "left_anti",
                ).unionByName(upd)
            )
            write_version(spark, merged, full)
            t_full = round(time.perf_counter() - t0, 3)
            print(
                json.dumps(
                    {
                        "replicas": r,
                        "table_rows": n,
                        "commit_incremental_sec": t_inc,
                        "commit_full_rewrite_sec": t_full,
                        "incremental_speedup": round(t_full / max(t_inc, 1e-9), 2),
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

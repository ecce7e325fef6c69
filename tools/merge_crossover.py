"""Measure partition-scoped MERGE apply cost vs table size.

Fixed CDC batch (2 of 64 hash buckets of lineitem), table scaled by
replication: `merge_upsert` (whole-table copy-on-write) must grow
linearly with the table, `merge_upsert_partitioned` must stay ~flat —
that flatness IS the 100 TB story (apply cost ∝ batch, not table).

Usage: python tools/merge_crossover.py [sf_dir] [replicas...]
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

from shuttlestandalonedbcreator_spark.plans.merge import (  # noqa: E402
    merge_upsert,
    merge_upsert_partitioned,
    write_partitioned,
)
from shuttlestandalonedbcreator_spark.session import get_spark  # noqa: E402
from shuttlestandalonedbcreator_spark.sources.registry import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = [int(x) for x in sys.argv[2:]] or [1, 4, 10]
    spark = get_spark(app_name="merge_crossover")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        F.lit(1).alias("ver"),
    )
    # FIXED batch at every size: drawn from replica 0 only
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
        root = tempfile.mkdtemp(prefix="merge_xover_")
        try:
            part = os.path.join(root, "part")
            flat = os.path.join(root, "flat")
            write_partitioned(tbl, part, "bucket")
            tbl.write.parquet(flat)
            n = spark.read.parquet(flat).count()

            t0 = time.perf_counter()
            merge_upsert_partitioned(
                spark, part, batch, keys=["l_orderkey", "l_linenumber"],
                order_col="ver", partition_col="bucket", op_col="op",
            )
            t_part = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            merge_upsert(
                spark, flat, batch, keys=["l_orderkey", "l_linenumber"],
                order_col="ver", op_col="op",
            )
            t_full = round(time.perf_counter() - t0, 3)
            print(
                json.dumps(
                    {
                        "replicas": r,
                        "table_rows": n,
                        "apply_partitioned_sec": t_part,
                        "apply_full_table_sec": t_full,
                        "partition_speedup": round(t_full / max(t_part, 1e-9), 2),
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

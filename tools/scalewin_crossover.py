"""Measure the blocked global-window crossover vs frame size.

The blocked decomposition (operators/scalewin.py) costs a constant
extra ~2x at catalog scale (20k-row frames — SCALING.md). This probe
answers "when does it start WINNING on one machine?": synthetic frames
of n rows (unique long key + a double tiebreak-breaker), timing

- ``single``: ROW_NUMBER() OVER (ORDER BY v, id) — one task sorts all
  n rows through Exchange SinglePartition;
- ``blocked``: with_global_row_numbers — per-block parallel sort +
  the <=1025-row offset stitch.

Both sides share one cached input (generation excluded from timing).
On a real cluster the single-partition side additionally ships the
whole frame to ONE executor over the network, so the local[32]
crossover here is an upper bound on the cluster crossover.

Usage: python tools/scalewin_crossover.py [n_rows ...]
One JSON line per size; quoted in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from shuttlestandalonedbcreator_spark.operators import scalewin as SW  # noqa: E402
from shuttlestandalonedbcreator_spark.session import get_spark  # noqa: E402


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [20_000, 500_000, 2_000_000,
                                               8_000_000, 20_000_000]
    spark = get_spark(app_name="scalewin_crossover")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        base = (
            spark.range(n, numPartitions=32)
            .select(
                F.col("id"),
                (F.xxhash64("id") % 1_000_003).alias("v"),
            )
            .localCheckpoint(eager=True)
        )
        spec = [("v", "asc"), ("id", "asc")]
        single = base.withColumn(
            "rn",
            F.row_number()
            .over(Window.orderBy(F.asc("v"), F.asc("id")))
            .cast("long"),
        )
        t_single = timed(single)
        # the helper's eager checkpoint+observe job runs at CONSTRUCTION
        # time, so the blocked side is timed construction+execution —
        # excluding it would understate the blocked cost
        t0 = time.perf_counter()
        SW.with_global_row_numbers(base, {"rn": spec}).write.format(
            "noop"
        ).mode("overwrite").save()
        t_blocked = round(time.perf_counter() - t0, 3)
        print(
            json.dumps(
                {
                    "rows": n,
                    "single_partition_sec": t_single,
                    "blocked_sec": t_blocked,
                    "blocked_speedup": round(t_single / max(t_blocked, 1e-9), 2),
                }
            ),
            flush=True,
        )
        base.unpersist()


def skew_probe(n: int = 8_000_000) -> None:
    """Skew mode (``--skew [n]``): value-range blocking keys on the VALUE
    distribution, so a heavy-tailed key piles rows into few blocks. This
    measures exactly how bad, and what the documented ``block_on``
    escape hatch (a monotone log1p proxy) buys back: a Zipf-ish key
    (v = n / rank, so half the mass sits in the lowest value decile),
    identity blocking vs log1p blocking, wall time + occupied blocks +
    max single-block row share."""
    spark = get_spark(app_name="scalewin_skew_probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = (
        spark.range(n, numPartitions=32)
        .select(
            F.col("id"),
            (F.lit(n) / ((F.xxhash64("id") % n + n) % n + 1))
            .cast("long")
            .alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    spec = [("v", "asc"), ("id", "asc")]
    for label, proxy in (
        ("identity", None),
        ("log1p", {"rn": F.log1p(F.col("v").cast("double"))}),
    ):
        t0 = time.perf_counter()
        out = SW.with_global_row_numbers(base, {"rn": spec}, block_on=proxy)
        out.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        # audit block balance with the helper's OWN formula so the probe
        # can't drift from what scalewin actually does
        lead = proxy["rn"] if proxy else F.col("v")
        stats = base.agg(F.min(lead).alias("mn"), F.max(lead).alias("mx")).first()
        blk = SW._block_expr(lead, F.lit(stats.mn), F.lit(stats.mx), SW.N_BLOCKS)
        dist = (
            base.groupBy(blk.alias("b"))
            .count()
            .agg(
                F.count(F.lit(1)).alias("occupied"),
                (F.max("count") / F.lit(n)).alias("max_share"),
            )
            .first()
        )
        print(
            json.dumps(
                {
                    "skew_block_on": label,
                    "rows": n,
                    "wall_sec": wall,
                    "occupied_blocks": dist.occupied,
                    "max_block_row_share": round(dist.max_share, 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--skew":
        skew_probe(int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000)
    else:
        main()

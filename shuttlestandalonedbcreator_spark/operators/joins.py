"""Join operators.

Reference parity:
- ``broadcast_lookup`` ≅ J1 — the reference resolves parent_id by building
  a driver-side HashMap<file_name → target_file_id> and probing every row
  (SQLiteDirectImporter.java:797-860). The Spark-native restatement is a
  broadcast left-equi join: the build side (distinct keys) ships to every
  executor; the probe is embarrassingly parallel, no shuffle of the fact
  side. Duplicate build keys collapse to ONE row first (the reference's
  HashMap keeps the last written value, :810) — we pick deterministically
  with a row_number window.

Extensions (absent from the reference, J3 — provided because a complete
engine needs them):
- ``asof_join`` — for each left row, the latest right row at-or-before its
  timestamp, per key. Union-tag trick: one sort-within-partition pass,
  no range cross-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from shuttlestandalonedbcreator_spark.operators.util import bounded_broadcast


def broadcast_lookup(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    payload: dict[str, str],
    dedup_order: str | None = None,
) -> DataFrame:
    """Left join `fact` with a broadcast, key-deduplicated `dim`.

    payload maps dim-column → output-column names. ``dedup_order``: dim
    column whose greatest value wins on duplicate keys (reference :810
    last-write-wins); None keeps the max of the payload tuple for
    determinism.
    """
    order_col = dedup_order or list(payload)[0]
    w = Window.partitionBy(dim_key).orderBy(F.desc(order_col))
    build_cols = list(dict.fromkeys([dim_key, *payload, order_col]))
    build = (
        dim.select(*build_cols)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    renamed = build.select(
        F.col(dim_key).alias("_bk"), *[F.col(src).alias(dst) for src, dst in payload.items()]
    )
    return fact.join(
        bounded_broadcast(renamed, "caller_contract"),
        fact[fact_key] == renamed["_bk"],
        "left",
    ).drop("_bk")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join: per key, the nearest right row at-or-before
    (``direction="backward"``, the default) or at-or-after
    (``"forward"``) each left row's timestamp, optionally only within
    ``tolerance_seconds`` (matches further away null out — the pandas
    merge_asof contract).

    Implementation: tag and union both sides, sort by (key, ts, side) and
    carry the last right payload forward with a running `last(..., ignorenulls)`
    window; forward is the same construction over a descending sort. One
    shuffle on the key — linear, scale-safe, no range explosion at any
    tolerance (tolerance is a post-filter on the carried match timestamp,
    not a range-join condition).

    Determinism contract: right rows should be unique per (key, ts) —
    equal-timestamp duplicates are picked arbitrarily (the same contract
    as pandas merge_asof).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    left_cols = list(left.columns)
    left_types = dict(left.dtypes)
    right_types = dict(right.dtypes)

    lt = left.select(
        *[F.col(c) for c in left_cols],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right_types[c]).alias(c) for c in payload],
    )
    rt = right.select(
        # null-fill every left column except the join key (kept for partitioning)
        *[
            (F.col(key) if c == key else F.lit(None).cast(left_types[c])).alias(c)
            for c in left_cols
        ],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in payload],
    )
    unioned = lt.unionByName(rt)
    # right rows sort before left rows at equal timestamps, in BOTH
    # directions ("at or before" / "at or after" are inclusive)
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(key)
        .orderBy(ts_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w).alias(c)
        for c in payload
    ]
    match_ts = F.last(
        F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True
    ).over(w).alias("_mts")
    filled = unioned.select(
        *[F.col(c) for c in left_cols], F.col("_ts"), F.col("_side"), *carried, match_ts
    )
    out = filled.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        # microsecond-exact integer gap: cast-to-long TRUNCATES fractional
        # seconds (DuckDB/pandas keep them), so a second-granularity gap
        # silently disagrees near the boundary for sub-second timestamps
        gap = F.abs(F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("_mts")))
        within = F.col("_mts").isNotNull() & (
            gap <= int(tolerance_seconds) * 1_000_000
        )
        out = out.select(
            *[F.col(c) for c in left_cols],
            "_side",
            *[F.when(within, F.col(c)).otherwise(F.lit(None)).alias(c) for c in payload],
        )
    return out.select(*left_cols, *payload)

"""Storage-level MERGE (upsert/delete) into a parquet table — the CDC
apply step: take a batch of row changes and produce the next table
version atomically.

The reference applies changes with per-row `INSERT OR REPLACE` into
SQLite (SQLiteDirectImporter.java:814-864, the A1 last-write-wins
upsert); parquet has no row-level mutation, so the Spark-native
restatement is copy-on-write: read the current table, resolve each key's
winner, rewrite, and swap in with the same crash-recoverable two-rename
protocol as `maintenance.compact_parquet`.

Semantics (deterministic, order-column driven):
- a key present in both sides keeps the row with the HIGHER order value
  (ties go to the update — the arriving batch is newer by definition,
  matching `INSERT OR REPLACE`);
- update rows with `op = 'D'` (when an op column is given) DELETE the
  key instead of replacing it;
- keys only in the base or only in the updates pass through / insert.

Scale: one shuffle of base ∪ updates on the key columns (the
last-write-wins window). At 100 TB the rewrite cost is the whole table —
exactly the trade a real lakehouse makes without a table format;
partition the table and call `merge_upsert` per affected partition (the
`subdir` the caller resolves), or adopt Iceberg/Delta when row-level
commit logs are available. The semantics layer here is format-agnostic.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
    op_col: str | None = None,
) -> int:
    """Apply ``updates`` to the parquet table at ``path``; returns the
    resulting row count. Crash-safe: the next call auto-recovers from
    either rename window (same protocol as compact_parquet)."""
    staging = path.rstrip("/") + "._merge_staging"
    old = path.rstrip("/") + "._merge_old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)  # crashed between renames: restore
    if os.path.exists(staging):
        shutil.rmtree(staging)
    if os.path.exists(old):
        shutil.rmtree(old)

    base = spark.read.parquet(path)
    data_cols = base.columns
    if op_col is not None and op_col in updates.columns:
        deletes = (
            updates.filter(F.col(op_col) == "D").select(*keys).distinct()
        )
        upserts = updates.filter(
            F.coalesce(F.col(op_col), F.lit("U")) != "D"
        ).select(*data_cols)
    else:
        deletes = None
        upserts = updates.select(*data_cols)

    # last-write-wins across base ∪ updates: updates win ties via the
    # _src tiebreaker (arriving batch is newer, like INSERT OR REPLACE)
    tagged = base.withColumn("_src", F.lit(0)).unionByName(
        upserts.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.desc(order_col), F.desc("_src")
    )
    merged = (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*data_cols)
    )
    if deletes is not None:
        merged = merged.join(deletes, keys, "left_anti")

    merged.write.mode("overwrite").parquet(staging)
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    return spark.read.parquet(path).count()

"""Storage-level MERGE (upsert/delete) into a parquet table — the CDC
apply step: take a batch of row changes and produce the next table
version atomically.

The reference applies changes with per-row `INSERT OR REPLACE` into
SQLite (SQLiteDirectImporter.java:814-864, the A1 last-write-wins
upsert); parquet has no row-level mutation, so the Spark-native
restatement is copy-on-write: read the current table, resolve each key's
winner, rewrite, and swap in with the same crash-recoverable two-rename
protocol as `maintenance.compact_parquet`.

Semantics (deterministic, order-column driven — ALL rows, including
deletes, compete in one per-key window):
- a key's winner is the row with the HIGHEST order value; ties between
  base and batch go to the batch (the arriving row is newer by
  definition, matching `INSERT OR REPLACE`); a same-batch tie between
  an upsert and a delete at the SAME order value goes to the upsert;
- if the winning row is an `op = 'D'` delete (when an op column is
  given) the key is removed; a STALE delete — order value lower than
  the live row's — is a no-op rather than dropping the newer row, so
  out-of-order / replayed CDC delivery converges to the same table;
- keys only in the base or only in the updates pass through / insert.
- delete rows must carry a valid ``order_col`` value (CDC feeds stamp
  deletes with a sequence number like any other change).

Scale: one shuffle of base ∪ updates on the key columns (the
last-write-wins window). `merge_upsert` rewrites the WHOLE table per
batch — fine for small tables; at 100 TB use
`merge_upsert_partitioned`, which derives the affected partitions from
the batch, reads and rewrites ONLY those subdirectories (one Spark job,
partition-pruned), and leaves every untouched partition's files
byte-identical on disk. Apply cost then scales with batch size ×
partition granularity, not table size — the same mechanics a
copy-on-write lakehouse table format performs, restated on plain
parquet directories.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _staging_old(path: str) -> tuple[str, str]:
    return path.rstrip("/") + "._merge_staging", path.rstrip("/") + "._merge_old"


def _recover_and_clean(path: str) -> None:
    """Restore from a crash between the two renames (old present, live
    missing) and clear stale staging/old leftovers."""
    staging, old = _staging_old(path)
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)  # crashed between renames: restore
    if os.path.exists(staging):
        shutil.rmtree(staging)
    if os.path.exists(old):
        shutil.rmtree(old)


def _swap_in(path: str, staging: str) -> None:
    """Two-rename swap of ``staging`` into ``path`` (crash window between
    the renames is recovered by _recover_and_clean on the next call)."""
    _, old = _staging_old(path)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(staging, path)
    if os.path.exists(old):
        shutil.rmtree(old)


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
    staging, _old = _staging_old(path)
    _recover_and_clean(path)

    base = spark.read.parquet(path)
    data_cols = base.columns
    merged = _resolve_winners(base, updates, keys, order_col, op_col, data_cols)

    merged.write.mode("overwrite").parquet(staging)
    _swap_in(path, staging)
    return spark.read.parquet(path).count()


def _resolve_winners(
    base: DataFrame | None,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
    op_col: str | None,
    data_cols: list[str],
) -> DataFrame:
    """Last-write-wins across base ∪ updates — DELETES INCLUDED: each
    key's winner is resolved by (order desc, _src desc, _op desc);
    _src makes the arriving batch beat the base on order ties (like
    INSERT OR REPLACE), _op ('U' > 'D') makes an upsert beat a
    same-order same-batch delete. If the winner is a delete the key
    is dropped; a stale delete (older order than the live row) loses
    the window and is a no-op, so replayed/out-of-order CDC converges."""
    if op_col is not None and op_col in updates.columns:
        ups = updates.withColumn(
            "_op", F.coalesce(F.col(op_col), F.lit("U"))
        ).select(*data_cols, "_op")
    else:
        ups = updates.select(*data_cols).withColumn("_op", F.lit("U"))
    ups = ups.withColumn("_src", F.lit(1))
    if base is not None:
        tagged = base.withColumn("_op", F.lit("U")).withColumn(
            "_src", F.lit(0)
        ).unionByName(ups)
    else:
        tagged = ups
    w = Window.partitionBy(*keys).orderBy(
        F.desc(order_col), F.desc("_src"), F.desc("_op")
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter(F.col("_op") != "D")
        .select(*data_cols)
    )


# ---------------------------------------------------------------------------
# Partition-scoped MERGE: apply cost ∝ batch size, not table size.
# ---------------------------------------------------------------------------

_PART_VAL_RE = re.compile(r"^[A-Za-z0-9_.\-]+$")


def _part_dir(path: str, partition_col: str, val: str) -> str:
    return os.path.join(path, f"{partition_col}={val}")


def _check_part_val(val: str) -> str:
    if not _PART_VAL_RE.match(val):
        raise ValueError(
            f"partition value {val!r} is not filesystem-safe "
            "(allowed: letters, digits, '_', '.', '-'); derive the "
            "partition column from a hash bucket or a sanitized key"
        )
    return val


def recover_partitioned(path: str) -> None:
    """Recover every partition subdir left mid-swap by a crash and clear
    stale staging leftovers (including the batch staging root)."""
    batch_staging = path.rstrip("/") + "._merge_batch_staging"
    if os.path.exists(batch_staging):
        shutil.rmtree(batch_staging)
    if not os.path.isdir(path):
        return
    for entry in list(os.listdir(path)):
        if entry.endswith("._merge_old") or entry.endswith("._merge_staging"):
            live = os.path.join(
                path, entry.rsplit("._merge_", 1)[0]
            )
            _recover_and_clean(live)


def write_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    """Lay a table out as ``path/<partition_col>=<val>/`` parquet subdirs.

    Unlike a plain ``partitionBy`` write, the partition column stays IN
    the data files (it is duplicated into a throwaway ``_p`` directory
    column), so each subdir is independently readable by
    ``merge_upsert_partitioned`` without hive partition discovery."""
    staging_root = path.rstrip("/") + "._merge_batch_staging"
    if os.path.exists(staging_root):
        shutil.rmtree(staging_root)
    df.withColumn("_p", F.col(partition_col).cast("string")).write.partitionBy(
        "_p"
    ).mode("overwrite").parquet(staging_root)
    os.makedirs(path, exist_ok=True)
    for entry in os.listdir(staging_root):
        if not entry.startswith("_p="):
            continue
        val = _check_part_val(entry[3:])
        live = _part_dir(path, partition_col, val)
        _recover_and_clean(live)
        _swap_in(live, os.path.join(staging_root, entry))
    shutil.rmtree(staging_root)


def merge_upsert_partitioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
    partition_col: str,
    op_col: str | None = None,
) -> int:
    """Apply a CDC batch to a table laid out by ``write_partitioned``,
    touching ONLY the partitions the batch's rows map to. Returns the
    post-merge row count of the affected partitions.

    Contract: ``partition_col`` must be functionally dependent on the
    key columns (e.g. a hash bucket of the key) — otherwise an update
    could move a key across partitions and the old copy would survive
    in an untouched subdir. This is the same constraint lakehouse
    copy-on-write MERGE places on partition-pruned rewrites.

    Scale: one Spark job reading base rows from the affected subdirs
    only (a driver-side listing — O(|batch partitions|)), one shuffle
    of (affected base ∪ batch) on the keys, one partitioned write, then
    per-partition two-rename swaps. Untouched partitions are never
    read, never written, and their files stay byte-identical on disk.
    A crash mid-batch leaves each partition either fully old or fully
    new; ``recover_partitioned`` (called on entry) restores any subdir
    caught between its two renames."""
    recover_partitioned(path)
    staging_root = path.rstrip("/") + "._merge_batch_staging"

    affected = sorted(
        r[0]
        for r in updates.select(
            F.col(partition_col).cast("string").alias("_p")
        ).distinct().collect()
        if r[0] is not None
    )
    if not affected:
        return 0
    for v in affected:
        _check_part_val(v)

    existing = [
        v for v in affected if os.path.isdir(_part_dir(path, partition_col, v))
    ]
    base = (
        spark.read.parquet(*[_part_dir(path, partition_col, v) for v in existing])
        if existing
        else None
    )
    if base is not None:
        data_cols = base.columns
    else:
        data_cols = [c for c in updates.columns if c != op_col]

    merged = _resolve_winners(base, updates, keys, order_col, op_col, data_cols)
    merged.withColumn(
        "_p", F.col(partition_col).cast("string")
    ).write.partitionBy("_p").mode("overwrite").parquet(staging_root)

    os.makedirs(path, exist_ok=True)
    staged = {
        e[3:] for e in os.listdir(staging_root) if e.startswith("_p=")
    }
    for v in affected:
        live = _part_dir(path, partition_col, v)
        if v in staged:
            _swap_in(live, os.path.join(staging_root, f"_p={v}"))
        elif os.path.isdir(live):
            # every row of the partition was deleted: remove it via the
            # same crash-recoverable rename (old is restorable until the
            # rmtree, and an empty-partition restore is harmless).
            _, old = _staging_old(live)
            os.rename(live, old)
            shutil.rmtree(old)
    shutil.rmtree(staging_root)

    live_dirs = [
        _part_dir(path, partition_col, v)
        for v in affected
        if os.path.isdir(_part_dir(path, partition_col, v))
    ]
    if not live_dirs:
        return 0
    return spark.read.parquet(*live_dirs).count()

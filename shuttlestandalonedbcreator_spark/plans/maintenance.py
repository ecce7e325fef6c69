"""Table maintenance: small-file compaction.

The operational complement of the write path (sinks.py): long-running
incremental pipelines (streaming/file_protocol.py appends, rollup
refreshes, foreachBatch sinks) accumulate many small parquet files, and
at 100 TB the scan cost becomes dominated by per-file open/footer
overhead instead of bytes. The reference's analogue is its drop-indexes →
bulk-load → recreate-indexes cycle (SQLiteDirectImporter.java:166-168,
746-792): periodic physical reorganization that changes no query result.

Design:
- target file count is derived from ACTUAL on-disk bytes (not row counts)
  so compaction is size-stable across schemas and compression ratios.
- the rewrite goes to a sibling staging directory first and swaps in with
  two renames. A crash before the first rename leaves the table untouched;
  a crash BETWEEN the two renames leaves the data at ``._compact_old`` with
  nothing at ``path`` (an unavoidable window with POSIX renames on a
  directory — an atomic single-rename swap needs a table format like
  Iceberg/Delta). The next ``compact_parquet`` call recovers automatically:
  stale ``._compact_old`` with a missing ``path`` is renamed back before
  retrying, and stale staging/old leftovers are cleared up front.
- hive-partitioned layouts compact per partition directory, preserving
  pruning.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def data_file_count(path: str) -> int:
    count = 0
    for _root, _dirs, files in os.walk(path):
        count += sum(1 for f in files if f.endswith(".parquet"))
    return count


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    partition_by: tuple[str, ...] = (),
) -> int:
    """Rewrite the parquet table at ``path`` into ~``target_file_mb``
    files (at least one). Returns the new data-file count.

    For `partition_by` layouts the partition columns are re-derived from
    the read (Spark reconstructs them from directory names) and written
    back hive-style, so pruning keeps working.
    """
    staging = path.rstrip("/") + "._compact_staging"
    old = path.rstrip("/") + "._compact_old"
    if not os.path.exists(path) and os.path.exists(old):
        # a prior run crashed between the two swap renames: the full
        # pre-compaction table is at `old` — restore it before retrying
        os.rename(old, path)
    if os.path.exists(staging):
        shutil.rmtree(staging)
    if os.path.exists(old):
        # leftover from a crash after the swap completed but before
        # cleanup; `path` is the new table, old is safe to drop
        shutil.rmtree(old)
    size = _dir_bytes(path)
    n_files = max(1, math.ceil(size / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    writer = (
        df.repartition(n_files, *partition_by)
        if partition_by
        else df.repartition(n_files)
    ).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    return data_file_count(path)

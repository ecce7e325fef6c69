"""Snapshot-versioned parquet table: atomic commits, time travel, diff,
and vacuum — the reproducibility layer a training-data pipeline needs
("this model trained on dataset version 7") restated on plain parquet
directories, the same mechanics a lakehouse table format's snapshot log
performs.

Layout::

    table_dir/
      v00000001/           immutable parquet snapshot
      v00000002/
      _VERSION             text file holding the committed version number

Commit protocol (crash-safe, no locks needed for readers):

1. write the new snapshot to ``v{n+1}._staging`` and rename it to
   ``v{n+1}`` (directory rename: atomic);
2. point ``_VERSION`` at n+1 via write-temp + ``os.replace`` (atomic on
   POSIX).

A crash in step 1 leaves a ``._staging`` dir; a crash between 1 and 2
leaves a complete-but-uncommitted ``v{n+1}``. Both are swept by the next
``write_version`` before it assigns its number, so ``_VERSION`` always
names a complete snapshot and version numbers are never reused with
different contents.

Snapshot isolation falls out of immutability: a reader that resolved
version n keeps reading ``v{n}``'s files regardless of later commits;
``vacuum`` is the only destructive operation and refuses to drop the
committed version.

SINGLE-WRITER commit protocol: concurrent ``write_version`` calls race
on the sweep + pointer swap (the same reason every lakehouse format
needs a catalog lock or CAS for its commit) — serialize writers
externally; readers need no coordination.

Scale: the version pointer is one tiny file — commit cost is the
snapshot write itself (use ``merge_upsert_partitioned`` to BUILD the
next snapshot incrementally; this module only governs naming/commit).
``diff_versions`` is one full-outer join on the key columns — the same
O(changes)-output shape as the ``change_feed`` catalog entry.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_V_RE = re.compile(r"^v(\d{8})$")
_VERSION_FILE = "_VERSION"


def _vdir(path: str, version: int) -> str:
    return os.path.join(path, f"v{version:08d}")


def current_version(path: str) -> int:
    """Committed version number; 0 if the table has no commits yet."""
    vf = os.path.join(path, _VERSION_FILE)
    if not os.path.exists(vf):
        return 0
    with open(vf) as f:
        return int(f.read().strip())


def list_versions(path: str) -> list[int]:
    """Committed snapshot versions present on disk, ascending."""
    if not os.path.isdir(path):
        return []
    committed = current_version(path)
    out = []
    for name in os.listdir(path):
        m = _V_RE.match(name)
        if m and int(m.group(1)) <= committed:
            out.append(int(m.group(1)))
    return sorted(out)


def _sweep_uncommitted(path: str) -> None:
    """Remove staging leftovers and complete-but-uncommitted snapshots
    (crash debris from either commit window)."""
    committed = current_version(path)
    for name in os.listdir(path):
        full = os.path.join(path, name)
        if name.endswith("._staging"):
            shutil.rmtree(full)
            continue
        m = _V_RE.match(name)
        if m and int(m.group(1)) > committed:
            shutil.rmtree(full)


def write_version(spark: SparkSession, df: DataFrame, path: str) -> int:
    """Commit ``df`` as the table's next snapshot; returns its version."""
    os.makedirs(path, exist_ok=True)
    _sweep_uncommitted(path)
    version = current_version(path) + 1
    target = _vdir(path, version)
    staging = target + "._staging"
    df.write.mode("overwrite").parquet(staging)
    os.rename(staging, target)
    tmp = os.path.join(path, _VERSION_FILE + ".tmp")
    with open(tmp, "w") as f:
        f.write(f"{version}\n")
    os.replace(tmp, os.path.join(path, _VERSION_FILE))  # the commit point
    return version


def read_table(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot — the committed one by default, or any retained
    earlier ``version`` (time travel).

    Reads with ``recursiveFileLookup`` so flat snapshots (write_version)
    and partition-subdir snapshots (write_version_incremental) resolve
    identically: partition columns live IN the files by contract, so no
    hive-style discovery is wanted — or safe, since the dir names would
    collide with the in-file column."""
    committed = current_version(path)
    if committed == 0:
        raise FileNotFoundError(f"versioned table has no commits: {path}")
    v = committed if version is None else version
    target = _vdir(path, v)
    if version is not None and (v < 1 or not os.path.isdir(target)):
        raise ValueError(
            f"version {v} not available (committed={committed}, "
            f"retained={list_versions(path)})"
        )
    return spark.read.option("recursiveFileLookup", "true").parquet(target)


def _commit(path: str, version: int, staging: str) -> int:
    """Steps 1-2 of the commit protocol: staging→vN rename, pointer swap."""
    os.rename(staging, _vdir(path, version))
    tmp = os.path.join(path, _VERSION_FILE + ".tmp")
    with open(tmp, "w") as f:
        f.write(f"{version}\n")
    os.replace(tmp, os.path.join(path, _VERSION_FILE))  # the commit point
    return version


def _link_tree(src: str, dst: str) -> None:
    """Mirror ``src`` into ``dst`` with HARD LINKS (files) — snapshots
    are immutable, so linked data files are safe to share; ``vacuum``'s
    rmtree only drops link counts, never bytes another version needs."""
    os.makedirs(dst, exist_ok=True)
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(out, exist_ok=True)
        for fn in files:
            os.link(os.path.join(root, fn), os.path.join(out, fn))


def write_version_incremental(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
    partition_col: str,
    op_col: str | None = None,
) -> int:
    """Commit the next snapshot from the current one plus a CDC batch,
    REUSING every untouched partition directory via hard links — the
    lakehouse manifest trick restated on directories (SCALING.md's
    versioned-snapshot section, now code): commit cost scales with the
    CHANGED partitions + the pointer swap, never with the table.

    Snapshot layout becomes ``vN/_p=<val>/*.parquet`` with
    ``partition_col`` still IN the files (the write_partitioned
    contract), read back via recursiveFileLookup. Same functional-
    dependence contract as ``merge_upsert_partitioned``: partition_col
    must be derived from the keys, or an update could move a key across
    partitions and strand its old copy in a hard-linked dir. Crash
    safety is inherited: everything happens inside ``._staging`` and the
    existing sweep; the hard links cost one inode ref each, no data
    copy. First commit (empty table) treats the batch as pure inserts."""
    from shuttlestandalonedbcreator_spark.plans.merge import (
        _check_part_val,
        _resolve_winners,
    )

    os.makedirs(path, exist_ok=True)
    _sweep_uncommitted(path)
    prev = current_version(path)
    version = prev + 1
    staging = _vdir(path, version) + "._staging"

    affected = sorted(
        r[0]
        for r in updates.select(
            F.col(partition_col).cast("string").alias("_p")
        )
        .distinct()
        .collect()
        if r[0] is not None
    )
    for v in affected:
        # same safe-charset contract as merge_upsert_partitioned: the
        # value becomes a directory name that the link/skip set must
        # match byte-for-byte against Spark's partition dir naming
        _check_part_val(v)
    prev_dir = _vdir(path, prev) if prev else None
    prev_parts = (
        sorted(
            e for e in os.listdir(prev_dir) if e.startswith("_p=")
        )
        if prev_dir and os.path.isdir(prev_dir)
        else []
    )
    if prev and not prev_parts and os.listdir(prev_dir):
        raise ValueError(
            "current snapshot is not partition-subdir laid out; "
            "bootstrap incremental tables with write_version_incremental"
        )

    os.makedirs(staging)
    affected_set = {f"_p={v}" for v in affected}
    for entry in prev_parts:
        if entry not in affected_set:
            _link_tree(
                os.path.join(prev_dir, entry), os.path.join(staging, entry)
            )

    base_dirs = [
        os.path.join(prev_dir, e) for e in prev_parts if e in affected_set
    ]
    base = (
        spark.read.parquet(*base_dirs) if base_dirs else None
    )
    data_cols = (
        base.columns
        if base is not None
        else [c for c in updates.columns if c != op_col]
    )
    merged = _resolve_winners(base, updates, keys, order_col, op_col, data_cols)
    # inside `staging` so a crash anywhere leaves ONLY ._staging debris
    # for the existing sweep; the dot-prefixed name is invisible to
    # Spark's path filter even if a remnant survived into a snapshot
    merge_staging = os.path.join(staging, ".merge")
    merged.withColumn(
        "_p", F.col(partition_col).cast("string")
    ).write.partitionBy("_p").mode("overwrite").parquet(merge_staging)
    for entry in os.listdir(merge_staging):
        if entry.startswith("_p="):
            os.rename(
                os.path.join(merge_staging, entry), os.path.join(staging, entry)
            )
    shutil.rmtree(merge_staging)
    return _commit(path, version, staging)


def vacuum(path: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` committed snapshots (the
    committed version always survives); returns the dropped versions."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = list_versions(path)
    drop = versions[:-keep_last]
    for v in drop:
        shutil.rmtree(_vdir(path, v))
    return drop


def diff_versions(
    spark: SparkSession,
    path: str,
    v_from: int,
    v_to: int,
    key_cols: list[str],
) -> DataFrame:
    """Row-level change feed between two snapshots: one full-outer join
    on the keys, rows tagged I (insert) / D (delete) / U (value change).
    Unchanged keys are filtered out, so output is O(changes)."""
    a = read_table(spark, path, v_from)
    b = read_table(spark, path, v_to)
    # schema evolution between snapshots (mergeSchema-style added or
    # dropped columns): compare over the UNION of value columns, with
    # the side that lacks a column contributing typed NULLs — so adding
    # a column with non-null values reads as an update, not an error
    val_cols = [c for c in b.columns if c not in key_cols] + [
        c for c in a.columns if c not in key_cols and c not in b.columns
    ]

    def _typed(df, other, c):
        if c in df.columns:
            return F.col(c)
        return F.lit(None).cast(other.schema[c].dataType)

    a_t = a.select(
        *key_cols,
        F.struct(*[_typed(a, b, c).alias(c) for c in val_cols]).alias("_old"),
    )
    b_t = b.select(
        *key_cols,
        F.struct(*[_typed(b, a, c).alias(c) for c in val_cols]).alias("_new"),
    )
    j = a_t.join(b_t, key_cols, "full_outer")
    return (
        j.withColumn(
            "op",
            F.when(F.col("_old").isNull(), F.lit("I"))
            .when(F.col("_new").isNull(), F.lit("D"))
            .when(~F.col("_old").eqNullSafe(F.col("_new")), F.lit("U")),
        )
        .filter(F.col("op").isNotNull())
        .select(*key_cols, "op", "_old", "_new")
    )

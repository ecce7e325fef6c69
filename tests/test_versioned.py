"""Snapshot-versioned table (plans/versioned.py): atomic commits, time
travel, crash-window recovery, vacuum retention, and snapshot diff."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from shuttlestandalonedbcreator_spark.plans import versioned as V


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, "k long, val string")


def _collect(df):
    return {(r["k"], r["val"]) for r in df.collect()}


def test_write_read_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert V.current_version(t) == 0
    v1 = V.write_version(spark, _rows(spark, [(1, "a"), (2, "b")]), t)
    v2 = V.write_version(spark, _rows(spark, [(1, "a2"), (3, "c")]), t)
    assert (v1, v2) == (1, 2)
    assert V.current_version(t) == 2
    assert _collect(V.read_table(spark, t)) == {(1, "a2"), (3, "c")}
    assert _collect(V.read_table(spark, t, version=1)) == {(1, "a"), (2, "b")}
    assert V.list_versions(t) == [1, 2]


def test_snapshot_isolation_across_commits(spark, tmp_path):
    """A reader that resolved version 1 still sees version 1's rows
    after two later commits — snapshots are immutable."""
    t = str(tmp_path / "tbl")
    V.write_version(spark, _rows(spark, [(1, "a")]), t)
    reader = V.read_table(spark, t)  # resolves v1's files
    V.write_version(spark, _rows(spark, [(1, "B")]), t)
    V.write_version(spark, _rows(spark, [(1, "C")]), t)
    assert _collect(reader) == {(1, "a")}
    assert _collect(V.read_table(spark, t)) == {(1, "C")}


def test_crash_debris_is_swept_and_never_committed(spark, tmp_path):
    """Both crash windows: a ._staging dir (died mid-write) and a
    complete-but-uncommitted v-dir (died before the pointer swap) are
    swept by the next commit; _VERSION never names either."""
    t = str(tmp_path / "tbl")
    V.write_version(spark, _rows(spark, [(1, "a")]), t)

    # window 1: staging leftover
    os.makedirs(os.path.join(t, "v00000002._staging"))
    # window 2: orphan complete snapshot (copy v1's files as fake debris)
    shutil.copytree(os.path.join(t, "v00000001"), os.path.join(t, "v00000002"))

    assert V.current_version(t) == 1  # debris is invisible
    assert V.list_versions(t) == [1]
    v = V.write_version(spark, _rows(spark, [(1, "fresh")]), t)
    assert v == 2
    assert _collect(V.read_table(spark, t)) == {(1, "fresh")}
    assert not any(n.endswith("._staging") for n in os.listdir(t))


def test_vacuum_keeps_newest_and_refuses_current(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(4):
        V.write_version(spark, _rows(spark, [(1, f"v{i + 1}")]), t)
    dropped = V.vacuum(t, keep_last=2)
    assert dropped == [1, 2]
    assert V.list_versions(t) == [3, 4]
    with pytest.raises(ValueError):
        V.read_table(spark, t, version=1)
    # current always survives even with keep_last=1
    V.vacuum(t, keep_last=1)
    assert V.list_versions(t) == [4]
    assert _collect(V.read_table(spark, t)) == {(1, "v4")}
    with pytest.raises(ValueError):
        V.vacuum(t, keep_last=0)


def test_diff_versions_emits_only_changes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.write_version(
        spark, _rows(spark, [(1, "a"), (2, "b"), (3, "c"), (4, None)]), t
    )
    V.write_version(
        spark, _rows(spark, [(2, "b"), (3, "C2"), (4, None), (5, "e")]), t
    )
    diff = V.diff_versions(spark, t, 1, 2, ["k"])
    got = {(r["k"], r["op"]) for r in diff.collect()}
    # 1 removed, 3 changed, 5 added; 2 unchanged and 4 (NULL==NULL via
    # null-safe compare) emit nothing
    assert got == {(1, "D"), (3, "U"), (5, "I")}


def test_read_errors(spark, tmp_path):
    t = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError):
        V.read_table(spark, t)
    V.write_version(spark, _rows(spark, [(1, "a")]), t)
    with pytest.raises(ValueError):
        V.read_table(spark, t, version=7)


def test_diff_versions_across_schema_evolution(spark, tmp_path):
    """A column added between snapshots diffs as updates where its value
    is non-null (absent side contributes typed NULLs), never an
    analysis error."""
    t = str(tmp_path / "tbl")
    V.write_version(spark, _rows(spark, [(1, "a"), (2, "b")]), t)
    evolved = spark.createDataFrame(
        [(1, "a", 9), (2, "b", None)], "k long, val string, extra long"
    )
    V.write_version(spark, evolved, t)
    diff = V.diff_versions(spark, t, 1, 2, ["k"])
    got = {(r["k"], r["op"]) for r in diff.collect()}
    # key 1 gains extra=9 -> U; key 2's extra is NULL on both sides -> unchanged
    assert got == {(1, "U")}

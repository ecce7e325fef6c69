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


def _inc_rows(spark, triples):
    # (k, val, seq) — bucket = k % 4 is the key-derived partition col
    return spark.createDataFrame(
        triples, "k long, val string, seq long"
    ).withColumn("bucket", F.col("k") % 4)


def _inc_collect(df):
    return {(r["k"], r["val"]) for r in df.select("k", "val").collect()}


def test_incremental_commit_matches_model_and_links_untouched(spark, tmp_path):
    """write_version_incremental: snapshot content equals the dict
    model across three commits, and every partition dir the batch did
    not touch is HARD-LINKED from the previous snapshot (same inodes,
    zero data copied) — the commit-cost-scales-with-changes claim as a
    filesystem fact."""
    t = str(tmp_path / "tbl")
    v1 = V.write_version_incremental(
        spark,
        t,
        _inc_rows(spark, [(i, f"a{i}", 1) for i in range(16)]),
        keys=["k"],
        order_col="seq",
        partition_col="bucket",
    )
    assert v1 == 1
    model = {(i, f"a{i}") for i in range(16)}
    assert _inc_collect(V.read_table(spark, t)) == model

    # batch touches ONLY bucket 1 (keys 1, 5) + deletes key 9 (bucket 1)
    batch = spark.createDataFrame(
        [(1, "b1", 2, "U"), (5, "b5", 2, "U"), (9, None, 2, "D")],
        "k long, val string, seq long, op string",
    ).withColumn("bucket", F.col("k") % 4)
    v2 = V.write_version_incremental(
        spark, t, batch, keys=["k"], order_col="seq",
        partition_col="bucket", op_col="op",
    )
    assert v2 == 2
    model = {p for p in model if p[0] != 9} - {(1, "a1"), (5, "a5")}
    model |= {(1, "b1"), (5, "b5")}
    assert _inc_collect(V.read_table(spark, t)) == model
    # time travel still sees v1
    assert _inc_collect(V.read_table(spark, t, version=1)) == {
        (i, f"a{i}") for i in range(16)
    }

    # untouched buckets 0, 2, 3: identical inodes across v1 and v2
    def inodes(version, bucket):
        d = os.path.join(t, f"v{version:08d}", f"_p={bucket}")
        return {
            fn: os.stat(os.path.join(d, fn)).st_ino
            for fn in os.listdir(d)
            if fn.endswith(".parquet")
        }

    for b in (0, 2, 3):
        assert inodes(1, b) == inodes(2, b), b
    # the touched bucket was rewritten, not linked
    assert set(inodes(1, 1)) != set() and inodes(1, 1) != inodes(2, 1)


def test_incremental_vacuum_keeps_shared_bytes_alive(spark, tmp_path):
    """Dropping an old snapshot whose files the current one hard-links
    must not disturb the current snapshot (inode survives the rmtree)."""
    t = str(tmp_path / "tbl")
    V.write_version_incremental(
        spark, t,
        _inc_rows(spark, [(i, f"a{i}", 1) for i in range(8)]),
        keys=["k"], order_col="seq", partition_col="bucket",
    )
    V.write_version_incremental(
        spark, t,
        _inc_rows(spark, [(0, "z0", 2)]),
        keys=["k"], order_col="seq", partition_col="bucket",
    )
    dropped = V.vacuum(t, keep_last=1)
    assert dropped == [1]
    got = _inc_collect(V.read_table(spark, t))
    assert got == {(0, "z0")} | {(i, f"a{i}") for i in range(1, 8)}


def test_incremental_crash_debris_is_swept(spark, tmp_path):
    """A staging dir left by a crashed incremental commit (including its
    inner .merge dir) is removed by the next commit and never becomes a
    version."""
    t = str(tmp_path / "tbl")
    V.write_version_incremental(
        spark, t,
        _inc_rows(spark, [(i, f"a{i}", 1) for i in range(8)]),
        keys=["k"], order_col="seq", partition_col="bucket",
    )
    debris = os.path.join(t, "v00000002._staging")
    os.makedirs(os.path.join(debris, ".merge", "_p=0"))
    with open(os.path.join(debris, "junk.parquet"), "w") as f:
        f.write("x")
    v = V.write_version_incremental(
        spark, t,
        _inc_rows(spark, [(0, "z0", 2)]),
        keys=["k"], order_col="seq", partition_col="bucket",
    )
    assert v == 2
    assert not os.path.exists(debris)
    assert (0, "z0") in _inc_collect(V.read_table(spark, t))


def test_incremental_rejects_flat_base_snapshot(spark, tmp_path):
    """A table whose current snapshot was committed FLAT (write_version)
    cannot silently take incremental commits — the untouched-partition
    link step would have nothing to link and rows would vanish."""
    t = str(tmp_path / "tbl")
    V.write_version(spark, _rows(spark, [(1, "a")]), t)
    with pytest.raises(ValueError, match="not partition-subdir"):
        V.write_version_incremental(
            spark, t,
            _inc_rows(spark, [(2, "b", 1)]),
            keys=["k"], order_col="seq", partition_col="bucket",
        )


def test_incremental_diff_versions_roundtrip(spark, tmp_path):
    """diff_versions works unchanged over incremental snapshots: the
    applied CDC batch reads back as exactly its own I/U/D rows."""
    t = str(tmp_path / "tbl")
    V.write_version_incremental(
        spark, t,
        _inc_rows(spark, [(i, f"a{i}", 1) for i in range(6)]),
        keys=["k"], order_col="seq", partition_col="bucket",
    )
    batch = spark.createDataFrame(
        [(2, "b2", 2, "U"), (99, "n99", 2, "U"), (3, None, 2, "D")],
        "k long, val string, seq long, op string",
    ).withColumn("bucket", F.col("k") % 4)
    V.write_version_incremental(
        spark, t, batch, keys=["k"], order_col="seq",
        partition_col="bucket", op_col="op",
    )
    diff = {
        (r["k"], r["op"])
        for r in V.diff_versions(spark, t, 1, 2, key_cols=["k"]).collect()
    }
    assert diff == {(2, "U"), (99, "I"), (3, "D")}

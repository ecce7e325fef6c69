"""E1 — per-row error tolerance (reference: skip bad rows, count them,
keep going; SQLiteDirectImporter.java:487-506). Spark realization:
PERMISSIVE parsing with a _corrupt_record side channel + accumulator-free
counting via aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_permissive_csv_corrupt_record_side_channel(spark, tmp_path):
    p = tmp_path / "dirty.csv"
    p.write_text(
        "file_name,source_file_size\n"
        "/a.txt,100\n"
        '"/unterminated quote,200\n'  # malformed: unclosed quote
        "/b.txt,300\n"
    )
    df = (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema("file_name string, source_file_size long, _corrupt_record string")
        .csv(str(p))
        .cache()
    )
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    # run continues; bad rows counted and preserved for inspection (E1)
    assert good.count() == 2
    assert bad.count() == 1
    assert "/unterminated" in bad.collect()[0]["_corrupt_record"]
    assert {r["file_name"] for r in good.collect()} == {"/a.txt", "/b.txt"}


def test_tolerant_casts_never_abort(spark):
    # junk in every typed column → NULLs, not exceptions (the cast layer's
    # contract under ANSI mode)
    from shuttlestandalonedbcreator_spark.plans.transfer_pipeline import (
        RAW_COLUMNS,
        typed_projection,
    )

    junk = {c: "garbage!!" for c in RAW_COLUMNS}
    df = spark.createDataFrame([tuple(junk[c] for c in RAW_COLUMNS)],
                               ", ".join(f"{c} string" for c in RAW_COLUMNS))
    row = typed_projection(df).collect()[0]
    assert row["source_file_size"] is None
    assert row["creation_time"] is None
    assert row["file_name"] == "garbage!!"  # TEXT passthrough untouched


def test_corrupt_parquet_fails_loudly_not_silently(spark, tmp_path):
    """E2 contract for the canonical storage format: a parquet file with
    a corrupted footer must raise a clear error at read time — NEVER
    return partial/empty data as if the table were fine (silent row loss
    in the canonical store is the one failure mode worse than a crash).
    Per-row tolerance (E1) applies to interchange formats (csv/jsonl/
    xml/xlsx) that have a corrupt side channel; parquet integrity is
    all-or-nothing by design."""
    import pytest

    p = tmp_path / "broken.parquet"
    spark.range(100).write.mode("overwrite").parquet(str(tmp_path / "ok"))
    import glob as _glob
    import shutil

    src = _glob.glob(str(tmp_path / "ok" / "*.parquet"))[0]
    shutil.copy(src, p)
    with open(p, "r+b") as fh:  # stomp the footer magic
        fh.seek(-4, 2)
        fh.write(b"XXXX")
    with pytest.raises(Exception, match="(?i)parquet|footer|magic"):
        spark.read.parquet(str(p)).count()

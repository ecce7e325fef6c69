"""XML source/sink — the fourth interchange format (Spark 4 ships the
former spark-xml as a native `format("xml")` data source).

Same tolerant contract as the CSV/JSONL sources (reference E1 style —
per-row skip or side channel, never job failure:
SQLiteDirectImporter.java:487-506): records that fail the schema land in
`_corrupt_record` (PERMISSIVE) or are dropped executor-side
(DROPMALFORMED).

Scale notes:
- XML does NOT split within a file (the scanner must pair rowTags), so
  parallelism is per-file — shard large exports via the writer's
  `num_files`, exactly like gz-CSV.
- always pass an explicit schema in production; inference is an extra
  full parse of every file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from shuttlestandalonedbcreator_spark.sources.jsonl import CORRUPT_COL


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: str | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Tolerant XML read of `<row_tag>` elements. With `schema` +
    `keep_corrupt=True`, malformed records fill `_corrupt_record`
    (PERMISSIVE); with just `schema`, they are skipped executor-side
    (DROPMALFORMED — E1). Without `schema`, Spark infers (test/dev
    only)."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None and keep_corrupt:
        return (
            r.option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .schema(f"{schema}, {CORRUPT_COL} string")
            .load(path)
        )
    if schema is not None:
        return r.option("mode", "DROPMALFORMED").schema(schema).load(path)
    return r.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    num_files: int | None = None,
) -> None:
    """Write `df` as XML part files (`num_files` shards — XML files are
    unsplittable on read, so shard count IS the downstream read
    parallelism)."""
    out = df.repartition(num_files) if num_files else df
    (
        out.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode("overwrite")
        .save(path)
    )

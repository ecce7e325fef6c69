"""Incremental file-drop ingestion — the reference's folder protocol as a
Structured Streaming file source.

Reference behavior (SQLiteDirectImporter.java):
- poll `source/`, process new workbooks sequentially   (:125-134, :153-159)
- after success move the file to `processed/`          (:185-192)
- idempotent re-processing via keyed upsert            (:306, :713)
- bounded memory per file                              (:170-199)

Spark-native restatement (SURVEY.md §2.9): a streaming file source with
`Trigger.AvailableNow` (drain-what-exists batch semantics),
`cleanSource=archive` + `sourceArchiveDir` (the processed/ move),
`maxFilesPerTrigger` (per-file sequential bound), and `foreachBatch`
running the SAME batch ingest pipeline (plans.transfer_pipeline) with a
keyed-upsert merge into the sink. One code path serves batch and
streaming — the pipeline functions are DataFrame→DataFrame.

Semantic delta vs the reference (observed, deliberate): Spark archives the
files of micro-batch N while executing batch N+1, so the most recent
file(s) stay in `source/` until the next PRODUCTIVE poll cycle — the
reference moves each file eagerly right after processing (:185-192).
Under a polling cadence the folders converge; correctness is unaffected
because re-listed-but-checkpointed files are never re-processed.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from shuttlestandalonedbcreator_spark.plans.transfer_pipeline import (
    RAW_COLUMNS,
    dedup_last_wins,
    ingest,
)

RAW_SCHEMA = ", ".join(f"{c} STRING" for c in RAW_COLUMNS)


def watch_folder(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    archive_dir: str | None = None,
    file_format: str = "csv",
    max_files_per_trigger: int | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> StreamingQuery:
    """Watch ``source_dir`` for transfer-report files; ingest each through
    the batch pipeline and append to a parquet sink at ``target_dir``.

    Returns the started query (AvailableNow: call ``awaitTermination()``
    to drain everything currently in the folder and stop — re-run on the
    next poll, exactly the reference's cron-style protocol).
    """
    reader = (
        spark.readStream.format(file_format)
        .schema(RAW_SCHEMA)
        .option("header", "true")  # S5: header-row skip
        .option("pathGlobFilter", "*.csv" if file_format == "csv" else "*")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if archive_dir:
        # S8: source lifecycle — archive consumed files
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    raw = reader.load(source_dir).withColumn("_source_file", F.input_file_name())

    # basename minus the streaming container's own extension — the
    # equivalent batch input is the bare workbook name (F3 strips only
    # .xlsx/.xls, reference :941)
    basename = F.element_at(F.split(F.col("_source_file"), "/"), -1)
    if file_format == "csv":
        basename = F.regexp_replace(basename, r"\.csv$", "")
    pipeline = transform or (lambda batch: ingest(
        batch.withColumn("_source_file", basename).withColumn(
            "_ingest_seq", F.monotonically_increasing_id()
        )
    ))

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        # _batch_id is the major upsert-order key: _ingest_seq restarts
        # per micro-batch, batch ids are monotonic across runs (checkpoint)
        out = pipeline(batch).withColumn("_batch_id", F.lit(batch_id))
        out.write.mode("append").parquet(target_dir)

    return (
        raw.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_deduplicated(spark: SparkSession, target_dir: str) -> DataFrame:
    """Read the sink with upsert semantics restored: appended re-imports
    collapse to the latest row per (file_name, target_file_id) — the
    dedup-on-read realization of `INSERT OR REPLACE` (A1)."""
    return dedup_last_wins(spark.read.parquet(target_dir))

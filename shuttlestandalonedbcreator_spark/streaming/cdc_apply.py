"""Continuous CDC apply: a stream of change rows merged into a parquet
table per micro-batch — the streaming twin of `plans/merge.py`.

The reference's continuous mode re-imports arriving workbook deltas with
per-row `INSERT OR REPLACE` (SQLiteDirectImporter.java:814-864 driven by
the folder watcher); here the arriving batch is a CDC feed
(key, payload, order, op) and each micro-batch applies atomically via
`merge_upsert`'s copy-on-write swap.

Replay semantics: foreachBatch is at-least-once, and merging the SAME
batch twice is a no-op by construction — last-write-wins resolves every
key to the same winner, and deletes of already-absent keys do nothing —
so the table converges to exactly-once contents without a transaction
log.

Scale: each micro-batch rewrites the table (the no-table-format trade;
see plans/merge.py). Keep batches coarse (`maxFilesPerTrigger`, trigger
intervals) or partition the table and merge only affected partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from shuttlestandalonedbcreator_spark.plans.merge import merge_upsert


def apply_cdc_stream(
    changes: DataFrame,
    table_path: str,
    keys: list[str],
    order_col: str,
    checkpoint_dir: str,
    op_col: str | None = "op",
    version_dir: str | None = None,
) -> StreamingQuery:
    """Start merging the streaming ``changes`` into ``table_path``.

    With ``version_dir`` set, each applied micro-batch additionally
    commits the post-merge table as a snapshot there
    (`plans/versioned.py`) — a time-travelable CDC history ("the table
    as of batch N"). Replayed batches (at-least-once foreachBatch) merge
    as no-ops and re-commit an identical snapshot: version numbers are
    monotone but contents stay convergent, so any retained version is a
    true point-in-time state."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        merge_upsert(
            batch.sparkSession, table_path, batch, keys, order_col, op_col
        )
        if version_dir is not None:
            from shuttlestandalonedbcreator_spark.plans.versioned import (
                write_version,
            )

            write_version(
                batch.sparkSession,
                batch.sparkSession.read.parquet(table_path),
                version_dir,
            )

    return (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

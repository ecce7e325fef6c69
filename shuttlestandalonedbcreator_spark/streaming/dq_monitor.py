"""Continuous data-quality monitoring: the declarative rule audit
(operators/quality.py) applied per micro-batch, appending one
(batch_id, rule, checked, violations) row per rule to a results table.

The streaming twin of the batch `dq_audit` catalog query — a pipeline
gate that watches ARRIVING data instead of auditing after the fact. Each
micro-batch pays exactly one aggregate scan regardless of rule count
(the row_rule_audit contract); the results table stays tiny (rules ×
batches) so downstream alerting can read it wholesale.

Idempotent under replay: foreachBatch is at-least-once, so the audit
write partitions by batch_id and DYNAMIC-OVERWRITES only that batch's
partition — a replayed batch replaces its own rows instead of appending
duplicates, making the results table effectively exactly-once without
any reader-side dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from shuttlestandalonedbcreator_spark.operators.quality import row_rule_audit


def monitor_quality(
    stream_df: DataFrame,
    rules: dict[str, Column],
    results_path: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start the monitor; results append to ``results_path`` (parquet)."""

    def audit_batch(batch: DataFrame, batch_id: int) -> None:
        (
            row_rule_audit(batch, rules)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(results_path)
        )

    return (
        stream_df.writeStream.foreachBatch(audit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

"""Small shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least ``min_partitions`` input splits before compute-heavy
    narrow transforms (shingling, hashing, per-row scoring).

    A small parquet file arrives as ONE split, serializing all per-row
    compute onto a single core; at 100 TB inputs already split past the
    core count and this is a no-op. The repartition shuffles only the raw
    input (cheap when it matters, absent when it doesn't).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

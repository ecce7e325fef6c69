"""Stream-stream interval join (§2.9 extension surface).

The reference's protocol is single-stream file ingest; a training-data /
telemetry pipeline additionally correlates TWO live streams (impressions
with clicks, requests with errors) — the canonical Structured Streaming
stream-stream join. The crucial scale property is BOUNDED STATE: both
sides carry a watermark and the join condition carries a time-range
predicate, so Spark can evict left rows once `left_ts + max_delay` falls
behind the right watermark (and vice versa). An equality-only
stream-stream join would buffer both streams forever.

Plan shape: both streams shuffle on the join key (co-partitioned state
stores); the time-range predicate prunes state, it does not shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``key`` where the right event lands
    within ``[left_ts, left_ts + max_delay]``.

    Works identically for batch DataFrames (watermarks are a no-op there),
    so batch-vs-stream equivalence is testable — the engine's standard
    one-code-path contract (streaming/windows.py does the same).

    ``how='left_outer'`` is the attribution shape (every view, with its
    click if one arrived in the window). Streaming caveat, inherent to the
    engine: a null-padded left row is emitted only once the RIGHT
    watermark passes ``left_ts + max_delay`` — i.e. unmatched rows
    finalize late, and rows near the stream's head never finalize until
    more data (or a no-data micro-batch after newer data) advances the
    watermark. Batch mode has no such delay. ``full_outer`` /
    ``right_outer`` pass through to Spark with the same state bound.
    """
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(f"unsupported join type for interval_join: {how!r}")
    if left.isStreaming or right.isStreaming:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    lf, rf = left.alias("l"), right.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return lf.join(rf, cond, how)

"""Scalable replacements for global-order windows.

A ``Window.orderBy(...)`` with no ``partitionBy`` moves the WHOLE frame
through one task (Spark's WindowExec plans ``Exchange SinglePartition``
and warns at runtime). Over a per-entity aggregate that is bounded by a
dimension this is tolerable at benchmark scale, but at the 100 TB design
point a 10^9-customer rank/running-sum through a single task is the
canonical scale-killer. This module decomposes the three global-order
primitives the catalog uses — ROW_NUMBER, running SUM, NTILE — into:

1. a MONOTONE value-range block id on the leading sort key
   (``(v - min) * n_blocks / (span + 1)``: any monotone non-decreasing
   map works, because rows in different blocks are already totally
   ordered by the leading key, and rows in the SAME block are ordered by
   the full sort spec inside the block);
2. a per-block window (``partitionBy(_blk)`` — parallel, spills never
   exceed one block);
3. a block-offset stitch: per-block row counts / value sums are a frame
   of at most ``n_blocks`` rows (constant, default 1024 — the
   "histogram buckets" bounded class), so their cumulative offsets run
   through one tiny window and broadcast-join back.

The result is BIT-IDENTICAL to the single-partition form for any total
order: global row_number = block-local row_number + (rows in earlier
blocks); global running sum = block-local running sum + (sum of earlier
blocks); NTILE derives exactly from (global rank, global count) via the
standard bucket formula both Spark and DuckDB implement. The catalog
entries that use this module therefore keep their original ANSI-SQL
oracles unchanged.

Input contract: the leading sort key must be numeric. NULLs map to a
sentinel block consistent with Spark's defaults (ASC => NULLS FIRST,
DESC => NULLS LAST). Equal leading-key values always land in the same
block, so ties are broken entirely inside a block by the remaining sort
columns. The frame is ``localCheckpoint(eager=True)``-ed once so the
block assignment, the per-block windows, and the block-size aggregate
all consume one materialization of the (already aggregated) input
instead of re-evaluating its subtree.

Skew note: value-range blocking keys on the VALUE distribution, not the
row distribution — a heavy-tailed key (Zipf revenue) can pile most rows
into few blocks. That still beats one task by the number of occupied
blocks, and a caller with a known-skewed key can pass a monotone
pre-transform of it (e.g. log1p) as the leading sort key's block proxy
via ``block_on``.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .util import bounded_broadcast

OrderSpec = Sequence[tuple[str, str]]  # [(column, "asc"|"desc"), ...]

N_BLOCKS = 1024


def _order_exprs(order_by: OrderSpec) -> list[Column]:
    out = []
    for col, direction in order_by:
        if direction not in ("asc", "desc"):
            raise ValueError(f"direction must be asc|desc, got {direction!r}")
        out.append(F.asc(col) if direction == "asc" else F.desc(col))
    return out


def _block_expr(lead: Column, mn: Column, mx: Column,
                n_blocks: int) -> Column:
    """Monotone non-decreasing map of the leading key into
    [0, n_blocks-1]; NULLs to the sentinel block that matches Spark's
    default null ordering. Double math is safe here: IEEE multiply and
    divide by positive constants are weakly monotone, and block
    assignment only needs v1 <= v2  =>  blk(v1) <= blk(v2)."""
    span = (mx - mn).cast("double") + F.lit(1.0)
    raw = F.floor((lead - mn).cast("double") * F.lit(float(n_blocks)) / span)
    blk = F.greatest(F.lit(0), F.least(F.lit(n_blocks - 1), raw))
    # Spark defaults: ASC => NULLS FIRST, DESC => NULLS LAST. Block -1
    # satisfies both: it sorts before every real block ascending and
    # after every real block descending.
    return F.when(lead.isNull(), F.lit(-1)).otherwise(blk).cast("long")


def _stitch(d: DataFrame, blk: str, local_col: str, bulk_agg: Column,
            direction: str, out: str, total_col: str | None = None) -> DataFrame:
    """Add ``out`` = block-local value + cumulative offset of earlier
    blocks. The offsets window runs over at most n_blocks+1 rows — a
    constant-bounded frame, never data-sized. ``total_col`` additionally
    attaches the GRAND total (sum over all blocks) — free here, because
    the per-block sums already exist; callers that need the scalar
    (NTILE's n, an 80%-of-total threshold) read it from this column
    instead of re-aggregating the frame in a second pass."""
    sizes = d.groupBy(blk).agg(bulk_agg.alias("_bulk"))
    wblk = Window.orderBy(
        F.asc(blk) if direction == "asc" else F.desc(blk)
    ).rowsBetween(Window.unboundedPreceding, -1)
    cols = [
        F.col(blk),
        F.coalesce(F.sum("_bulk").over(wblk), F.lit(0)).alias("_off"),
    ]
    if total_col is not None:
        cols.append(
            F.sum("_bulk").over(
                Window.orderBy(blk).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).cast("long").alias(total_col)
        )
    offs = sizes.select(*cols)
    return (
        d.join(bounded_broadcast(offs, "domain"), blk)
        .withColumn(out, (F.col(local_col) + F.col("_off")).cast("long"))
        .drop(local_col, "_off")
    )


def with_global_row_numbers(
    df: DataFrame,
    specs: Mapping[str, OrderSpec],
    n_blocks: int = N_BLOCKS,
    block_on: Mapping[str, Column] | None = None,
    count_col: str | None = None,
) -> DataFrame:
    """df + one exact global ROW_NUMBER() column per spec, with no
    data-sized single-partition window. ``specs`` maps output column ->
    total-order spec; several ranks (e.g. RFM's three orderings) share
    one checkpointed materialization of ``df``. ``block_on`` optionally
    overrides the block proxy for a spec's leading key (must be a
    monotone transform of it). ``count_col`` attaches the frame's total
    row count (from the first spec's block sizes — no extra pass), the
    ``n`` that `ntile_from_rank` needs."""
    block_on = dict(block_on or {})
    mins, maxs = [], []
    for out, spec in specs.items():
        proxy = block_on.get(out, F.col(spec[0][0]))
        block_on[out] = proxy
        mins.append(F.min(proxy).alias(f"_mn_{out}"))
        maxs.append(F.max(proxy).alias(f"_mx_{out}"))
    # checkpoint the INPUT once — every per-spec window and block-size
    # aggregate then reads the materialized frame instead of
    # re-evaluating its (often expensive) subtree, and the
    # materialization makes the block assignment consistent across
    # those consumers even for a nondeterministic input. The min/max
    # block bounds ride the SAME job via observe() (CollectMetrics) —
    # no separate stats pass, and the bounds become driver-side
    # literals instead of a crossJoined one-row frame.
    from pyspark.sql import Observation

    obs = Observation()
    d = df.observe(obs, *mins, *maxs).localCheckpoint(eager=True)
    stats = obs.get
    for out, spec in specs.items():
        mn, mx = stats[f"_mn_{out}"], stats[f"_mx_{out}"]
        if mn is None:  # empty frame or all-null leading key
            mn = mx = 0
        d = d.withColumn(
            f"_blk_{out}",
            _block_expr(block_on[out], F.lit(mn), F.lit(mx), n_blocks),
        )
    for i, (out, spec) in enumerate(specs.items()):
        blk = f"_blk_{out}"
        wloc = Window.partitionBy(blk).orderBy(*_order_exprs(spec))
        d = d.withColumn(f"_lrn_{out}", F.row_number().over(wloc))
        d = _stitch(d, blk, f"_lrn_{out}", F.count(F.lit(1)),
                    spec[0][1], out,
                    total_col=count_col if i == 0 else None).drop(blk)
    return d


def with_global_running_sum(
    df: DataFrame,
    order_by: OrderSpec,
    value_col: str,
    out: str,
    n_blocks: int = N_BLOCKS,
    total_col: str | None = None,
) -> DataFrame:
    """df + exact global ``SUM(value) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING..CURRENT ROW)`` without a data-sized single-partition
    window. Exactness requires an exact-typed value column (int64 cents
    in every catalog caller) — reordering float partial sums would not
    be bit-stable. ``total_col`` attaches the grand total (free from the
    block sums; the cum/tot threshold comparisons read it instead of a
    second aggregation pass)."""
    from pyspark.sql import Observation

    lead, direction = order_by[0]
    # one materialization; bounds ride the checkpoint job (see above)
    obs = Observation()
    d = df.observe(
        obs, F.min(lead).alias("_mn"), F.max(lead).alias("_mx")
    ).localCheckpoint(eager=True)
    stats = obs.get
    mn, mx = stats["_mn"], stats["_mx"]
    if mn is None:
        mn = mx = 0
    d = d.withColumn(
        "_blk", _block_expr(F.col(lead), F.lit(mn), F.lit(mx), n_blocks)
    )
    wloc = (
        Window.partitionBy("_blk")
        .orderBy(*_order_exprs(order_by))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("_lcum", F.sum(value_col).over(wloc))
    return _stitch(d, "_blk", "_lcum", F.sum(value_col), direction,
                   out, total_col=total_col).drop("_blk")


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """Exact NTILE(k) from a 1-indexed global rank and the frame size —
    the standard bucket formula Spark and DuckDB both implement: the
    first ``n % k`` buckets take ``n div k + 1`` rows, the rest take
    ``n div k``. Lets NTILE ride the blocked row_number instead of its
    own single-partition window."""
    # all operands are non-negative ints < 2^53, so double division +
    # long cast is an exact floor throughout
    q = (n / F.lit(k)).cast("long")
    rem = n % F.lit(k)
    cut = (q + 1) * rem
    small = ((rank - 1) / (q + 1)).cast("long") + 1
    big = rem + ((rank - cut - 1) / F.greatest(q, F.lit(1))).cast("long") + 1
    return F.when(rank <= cut, small).otherwise(big).cast("int")

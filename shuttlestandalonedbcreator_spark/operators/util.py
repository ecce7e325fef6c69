"""Small shared operator utilities."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The only justifications under which an EXPLICIT broadcast hint is
# scale-safe. An explicit hint overrides spark.sql.autoBroadcastJoinThreshold,
# so a side that grows with the data (customer/supplier/part, per-user or
# per-doc aggregates, LSH candidate sets...) must NEVER carry one — at the
# 100 TB design point it is a guaranteed executor/driver OOM. Those joins
# go hint-free: AQE + the broadcast threshold still pick a broadcast-hash
# join whenever the side is ACTUALLY small at runtime, and degrade to a
# shuffle join when it is not. See SCALING.md ("broadcast only what is
# KNOWN bounded").
_BOUNDED_KINDS = frozenset({
    # keyed by a closed value domain that does not grow with SF:
    # nation/region (TPC-H fixes both), event_type, language, histogram
    # band ids, grouping-period labels
    "domain",
    # a global (or k-row constant-arity) aggregate: scalar totals,
    # thresholds, medians-by-domain
    "one_row",
    # output of an explicit LIMIT / top-k: bounded by the literal k
    "top_k",
    # a user-supplied probe set (ANN query vectors, benchmark-suite
    # n-grams, k-means centroids): sized by the request, not the corpus
    "query_set",
    # an API whose documented contract requires the caller to pass a
    # bounded dimension (the reference holds the same table in an
    # in-memory HashMap, so the bound is inherited from its semantics)
    "caller_contract",
})


def bounded_broadcast(df: DataFrame, kind: str) -> DataFrame:
    """The ONLY sanctioned way to attach an explicit broadcast hint.

    ``kind`` names the reason the side is bounded at any SF (see
    ``_BOUNDED_KINDS``). A plan-quality test greps the package for raw
    ``F.broadcast`` so every hint is forced through this audit point.
    """
    if kind not in _BOUNDED_KINDS:
        raise ValueError(
            f"broadcast hint needs a bounded-size justification, one of "
            f"{sorted(_BOUNDED_KINDS)}; got {kind!r}"
        )
    return F.broadcast(df)


def bounded_collect(df: DataFrame, kind: str, max_rows: int = 2_000_000,
                    hint: str = "") -> list:
    """The ONLY sanctioned way to ``collect()`` an UNBOUNDED-shaped frame
    to the driver inside an operator/query path — the collect analogue of
    ``bounded_broadcast`` (same ``kind`` vocabulary, same audit intent:
    a driver collect of a side that grows with the data is a guaranteed
    driver OOM at the 100 TB design point).

    ``max_rows`` enforces the bound at runtime: the collect itself is
    capped via ``limit(max_rows + 1)`` so the driver NEVER materializes
    more than the cap even on a runaway input, and exceeding it raises
    with ``hint`` naming the scale-safe alternative (e.g. the
    ``exact=False`` LSH path for the exact cosine baseline). Under the
    cap ``limit`` returns every row, so callers see the full result.
    Collects that are already bounded by construction (``.limit(k)``,
    a ≤n_blocks aggregate, an explicit size gate) stay raw — the
    plan-quality source gate pins their exact census.
    """
    if kind not in _BOUNDED_KINDS:
        raise ValueError(
            f"driver collect needs a bounded-size justification, one of "
            f"{sorted(_BOUNDED_KINDS)}; got {kind!r}"
        )
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"bounded_collect({kind!r}): side exceeded {max_rows} rows"
            + (f" — {hint}" if hint else "")
        )
    return rows


@contextmanager
def runtime_bloom_filters(spark, app_side_scan_threshold: str = "10GB",
                          creation_side_threshold: str = "10MB"):
    """Scope Spark's runtime bloom-filter join pruning to a block.

    When a shuffle join's build side carries a selective filter, Spark
    (3.3+) can inject a `bloom_filter_might_contain` semi-filter into
    the probe side's scan, skipping most of the big table's rows before
    the shuffle — the runtime analogue of static predicate pushdown and
    the single biggest scan-saver for selective dim→fact joins at the
    100 TB point. It only fires above size thresholds (the probe scan
    must be big enough to be worth it, the build side small enough to
    sketch), so toy-SF tests never see it with the defaults; this
    context manager pins the knobs (pass "0" for the app-side threshold
    to force injection at any scan size) and restores the previous
    session values on exit. At production scale the DEFAULTS are
    correct — call sites should not lower thresholds permanently.
    """
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": app_side_scan_threshold,
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            creation_side_threshold,
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least ``min_partitions`` input splits before compute-heavy
    narrow transforms (shingling, hashing, per-row scoring).

    A small parquet file arrives as ONE split, serializing all per-row
    compute onto a single core; at 100 TB inputs already split past the
    core count and this is a no-op. The repartition shuffles only the raw
    input (cheap when it matters, absent when it doesn't).
    """
    if df.isStreaming:
        # streaming frames can't be partition-inspected (df.rdd throws);
        # file sources already split by file per micro-batch, so the
        # DEFAULT floor is a batch-only concern — but an EXPLICIT
        # min_partitions is a caller contract and repartition does work
        # on streams, so honor it unconditionally
        return df.repartition(min_partitions) if min_partitions else df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

"""Empty-input robustness: every catalog entry must BUILD and EXECUTE
over schema-identical but EMPTY tables without throwing.

At 100 TB this is not an edge case — a filter, a partition, a day, or a
tenant slice being empty is routine, and an operator that throws on
empty input kills the whole job. (The differential fuzzer already
covers empty results for generated queries; this sweeps the hand-built
catalog, whose builders do driver-side work — collected vocabularies,
size-gated fallbacks, argmax loops — that generated SQL never
exercises.) Row counts are not asserted (0 and "one summary row of
zeros/NULLs" are both legitimate shapes); only absence of exceptions."""

from __future__ import annotations

import pytest

from shuttlestandalonedbcreator_spark.queries import CATALOG
from shuttlestandalonedbcreator_spark.sources.registry import load_table

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Entries whose CONTRACT requires non-empty input, each with the reason.
# Keep this list empty unless the requirement is inherent to the
# operator's semantics, not an implementation accident.
_REQUIRES_ROWS: dict[str, str] = {}


@pytest.fixture(scope="module")
def empty_sf(spark, sf_small, tmp_path_factory):
    """Schema-identical, zero-row copies of every fixture table."""
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        load_table(spark, sf_small, t).limit(0).write.mode("overwrite").parquet(
            str(out / f"{t}.parquet")
        )
    return str(out)


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_catalog_entry_survives_empty_input(spark, empty_sf, name):
    if name in _REQUIRES_ROWS:
        pytest.skip(f"documented non-empty contract: {_REQUIRES_ROWS[name]}")
    df = CATALOG[name].spark(spark, empty_sf)
    df.count()  # execute, don't just plan

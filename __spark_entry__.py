"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship status_summary-shaped query at sf0.001;
``queries``/``oracle_sql`` expose the full operator catalog
(shuttlestandalonedbcreator_spark.queries.CATALOG) for the DuckDB
correctness gate at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from shuttlestandalonedbcreator_spark.queries import CATALOG  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return CATALOG["status_summary"].spark(spark, "/root/testdata/sf0.001")


# The correctness gate checks ~50 entries/round, walking queries() in
# dict order. Order comes from the per-entry content-hash state in
# tools/gate_state.json (regenerated per round via tools/gate_state.py):
# entries whose code CHANGED since their last green driver row walk
# first, then never-checked entries, then oldest-checked — so both new
# code and stale greens get driver rows before anything re-verified
# recently. Falls back to plain catalog order if the state is unusable.
def _gate_order() -> list[str]:
    try:
        from shuttlestandalonedbcreator_spark.gate import gate_order

        return gate_order(CATALOG)
    except Exception:
        return list(CATALOG)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: CATALOG[name].spark for name in _gate_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {
        name: CATALOG[name].oracle
        for name in _gate_order()
        if CATALOG[name].oracle is not None
    }

"""The view surface over an ingested transfer_data DataFrame.

Reference views (SQLiteDirectImporter.java:865-916, SCHEMA.sql:48-101):
- files_view / folders_view          (P3/P4)
- status_summary                     (A3 conditional agg, O1 sort)
- hierarchy_children                 (J2 recursive walk)
- dynamic `status_<sanitized>` views (A5 distinct → data-dependent DDL)

`create_views` reproduces the whole surface as Spark temp views; the
dynamic-view loop mirrors the reference's two-phase plan: SELECT DISTINCT
(tiny collect — view NAMES, not data) then one filtered view per status.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shuttlestandalonedbcreator_spark.functions.paths import sanitize_view_name
from shuttlestandalonedbcreator_spark.operators.hierarchy import hierarchy_closure
from shuttlestandalonedbcreator_spark.operators.summary import (
    files_filter,
    folders_filter,
    status_summary,
)


def create_views(spark: SparkSession, transfer: DataFrame) -> dict[str, str]:
    """Register the full view surface; returns {view_name: kind}."""
    created: dict[str, str] = {}
    transfer.createOrReplaceTempView("transfer_data")
    created["transfer_data"] = "base"

    files_filter(transfer, "source_file_size").createOrReplaceTempView("files_view")
    created["files_view"] = "static"

    folders_filter(transfer, "source_file_size").createOrReplaceTempView("folders_view")
    created["folders_view"] = "static"

    status_summary(
        transfer,
        "file_status",
        file_predicate=F.col("source_file_size") > 0,
        folder_predicate=(F.col("source_file_size") == 0) | F.col("source_file_size").isNull(),
    ).createOrReplaceTempView("status_summary")
    created["status_summary"] = "static"

    hierarchy_closure(
        transfer, id_col="target_file_id", parent_col="parent_id", name_col="file_name"
    ).createOrReplaceTempView("hierarchy_children")
    created["hierarchy_children"] = "static"

    # dynamic status_<x> views — data-dependent DDL (:888-898); the collect
    # is a distinct over a low-cardinality enum (bytes, not data). The
    # reference keeps '' (only NULL filtered, :888) and skips statuses that
    # sanitize to '' (:894).
    statuses = [
        r[0]
        for r in transfer.filter(F.col("file_status").isNotNull())
        .select("file_status")
        .distinct()
        .collect()
    ]
    for status in sorted(statuses):
        sanitized = sanitize_view_name(status)
        if not sanitized:
            continue
        name = f"status_{sanitized}"
        transfer.filter(F.col("file_status") == status).createOrReplaceTempView(name)
        created[name] = "dynamic"
    return created

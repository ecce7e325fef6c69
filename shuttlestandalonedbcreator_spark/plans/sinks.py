"""Sinks — the engine's write surface.

Reference parity:
- S6 batched upsert writer (SQLiteDirectImporter.java:711-729): primary
  sink is partitioned parquet with dedup-before-write (A1); an optional
  SQLite EXPORT reproduces the reference's on-disk artifact byte-for-
  byte queryable (same table name, same columns) for parity checks.
- S7 DDL (tables/indexes/views, :282-314, :774-792): Spark has no
  secondary indexes — the physical-design equivalents are partition
  columns (+ optional bucketing) chosen from the reference's 9 indexed
  columns (job_name, file_status are the low-cardinality query keys).

Scale notes: `write_transfer_table` is the 100 TB path — hash-partitioned
parquet, append/overwrite by partition; the SQLite export streams through
`toLocalIterator` (bounded driver memory) and exists for tool parity, not
scale.
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame, SparkSession

from shuttlestandalonedbcreator_spark.plans.transfer_pipeline import RAW_COLUMNS

SQLITE_TABLE = "transfer_data"
SQLITE_BATCH = 1000  # reference BATCH_SIZE (:61)

TRANSFER_COLUMNS = [
    *RAW_COLUMNS,
    "parent_folder",
    "parent_id",
    "level",
    "job_name",
    "import_timestamp",
]


def write_transfer_table(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("job_name",),
    mode: str = "overwrite",
) -> None:
    """Primary sink: parquet partitioned on the hot filter key(s).

    Partition pruning then serves the reference's indexed lookups
    (`WHERE job_name = ...` README.md:82) without any index structure.
    """
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def read_transfer_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def export_sqlite(df: DataFrame, db_path: str, batch_size: int = SQLITE_BATCH) -> int:
    """Export to a SQLite database shaped like the reference's output
    (table `transfer_data`, `INSERT OR REPLACE` in 1000-row batches —
    :711-729). Driver-side streaming via toLocalIterator: parity/export
    tool, deliberately not the scale path. Returns rows written."""
    cols = [c for c in TRANSFER_COLUMNS if c in df.columns]
    col_sql = ", ".join(cols)
    placeholders = ", ".join("?" for _ in cols)
    conn = sqlite3.connect(db_path)
    try:
        conn.execute(
            f"CREATE TABLE IF NOT EXISTS {SQLITE_TABLE} ("
            "id INTEGER PRIMARY KEY AUTOINCREMENT, "
            + ", ".join(f"{c} TEXT" for c in cols)
            + ", UNIQUE(file_name, target_file_id))"
        )
        total, batch = 0, []
        for row in df.select(*cols).toLocalIterator():
            batch.append(tuple(None if v is None else str(v) for v in row))
            if len(batch) >= batch_size:
                conn.executemany(
                    f"INSERT OR REPLACE INTO {SQLITE_TABLE} ({col_sql}) VALUES ({placeholders})",
                    batch,
                )
                conn.commit()
                total += len(batch)
                batch = []
        if batch:
            conn.executemany(
                f"INSERT OR REPLACE INTO {SQLITE_TABLE} ({col_sql}) VALUES ({placeholders})",
                batch,
            )
            conn.commit()
            total += len(batch)
        return total
    finally:
        conn.close()

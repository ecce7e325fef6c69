"""Parquet table registry over a scale-factor directory.

The driver materializes TPC-H-ish tables (TESTDATA.md) as one parquet file
per table. Scans stay declarative (`spark.read.parquet`) so Catalyst keeps
predicate pushdown / column pruning / partition pruning; at 100 TB the same
call reads a partitioned directory tree and prunes on partition columns.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_utc(spark: SparkSession) -> None:
    """Pin the session timezone to UTC — an engine-wide invariant
    (session.get_spark sets it at build; this enforces it for
    caller-provided sessions). Called unconditionally before every table
    load so timestamp semantics NEVER depend on which table happened to
    be loaded first: NTZ->LTZ casts, string->timestamp parsing,
    date_trunc and unix_timestamp all read the session zone, and the
    DuckDB oracle evaluates naive timestamps, i.e. UTC wall clock."""
    if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table, normalizing parquet TIMESTAMP(NANOS) columns (which
    Spark reads as long under `nanosAsLong`) back to TimestampType via
    exact integer division — semantics identical to DuckDB's truncation."""
    import pyarrow as pa

    ensure_utc(spark)

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        ns_cols = [
            field.name
            for field in pq.read_schema(path)
            if pa.types.is_timestamp(field.type) and field.type.unit == "ns"
        ]
    except Exception:
        ns_cols = []
    if ns_cols:
        # runtime-set so it works on ANY caller-provided session (the
        # driver builds its own); conf only affects nanos columns
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for col_name in ns_cols:
        # integer div keeps full precision (ns values overflow double)
        df = df.withColumn(col_name, F.expr(f"timestamp_micros({col_name} div 1000)"))
    # Parquet timestamp[us] without tz reads as TIMESTAMP_NTZ; the engine's
    # time functions (unix_micros, range frames) need TIMESTAMP. The session
    # is pinned UTC (ensure_utc above), so the NTZ->LTZ cast is the identity
    # on the wall clock (matches DuckDB's naive-timestamp reading bit-for-bit).
    from pyspark.sql.types import TimestampNTZType

    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(
    spark: SparkSession, sf_dir: str, only: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    """Register tables as temp views (the engine's SQL surface —
    reference exposes its data the same way, as SQLite views). ``only``
    limits registration to the named tables (skips opening the rest)."""
    if only is not None:
        dfs = {name: load_table(spark, sf_dir, name) for name in only}
    else:
        dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs

"""Untracked draft harness — round-4 session-4 batch 9."""
from __future__ import annotations

import sys

import duckdb
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shuttlestandalonedbcreator_spark.queries import _t


def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    cents = F.expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    )
    series = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nat, cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy(
            "n_name", F.date_trunc("month", "o_orderdate").alias("m")
        )
        .agg(F.sum(cents).alias("x"))
    )
    a = series.select(
        F.col("n_name"), F.col("m").alias("mi"), F.col("x").alias("xi")
    )
    b = series.select(
        F.col("n_name"), F.col("m").alias("mj"), F.col("x").alias("xj")
    )
    pairs = a.join(b, "n_name").filter(F.col("mi") < F.col("mj"))
    s_tbl = pairs.groupBy("n_name").agg(
        F.sum(F.signum(F.col("xj") - F.col("xi")).cast("long")).alias("s"),
        ((F.lit(1) + F.sqrt(F.lit(1.0) + F.lit(8.0) * F.count(F.lit(1)))) / F.lit(2.0))
        .cast("long")
        .alias("n"),
    )
    n = F.col("n").cast("double")
    var = n * (n - F.lit(1.0)) * (F.lit(2.0) * n + F.lit(5.0)) / F.lit(18.0)
    z = (
        F.col("s").cast("double")
        - F.signum(F.col("s").cast("double"))
    ) / F.sqrt(var)
    return s_tbl.select(
        "n_name",
        "n",
        F.col("s").alias("mk_s"),
        F.round(z, 6).alias("z_stat"),
    )


SQL_MANN_KENDALL_TREND = """
WITH series AS (
  SELECT n_name, date_trunc('month', o_orderdate) AS m,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), pairs AS (
  SELECT a.n_name,
         CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sg
  FROM series a JOIN series b
    ON a.n_name = b.n_name AND a.m < b.m
), s_tbl AS (
  SELECT n_name, CAST(SUM(sg) AS BIGINT) AS s,
         CAST((1 + SQRT(1.0 + 8.0 * COUNT(*))) / 2.0 AS BIGINT) AS n
  FROM pairs GROUP BY n_name
)
SELECT n_name, n, s AS mk_s,
       round((CAST(s AS DOUBLE) - CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1 ELSE 0 END)
             / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) * (2.0 * CAST(n AS DOUBLE) + 5.0) / 18.0), 6) AS z_stat
FROM s_tbl
"""


DRAFTS = {
    "mann_kendall_trend": (q_mann_kendall_trend, SQL_MANN_KENDALL_TREND),
}


def main(sf_dir: str, names: list[str]) -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("draft")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    for name in names or list(DRAFTS):
        fn, sql = DRAFTS[name]
        sdf = fn(spark, sf_dir).toPandas()
        odf = con.execute(sql).fetchdf()
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"FAIL {name}: cols {scols} vs {ocols}")
            continue
        s = sdf[scols].sort_values(scols).reset_index(drop=True)
        o = odf[scols].sort_values(scols).reset_index(drop=True)
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
            continue
        import pandas as pd

        try:
            pd.testing.assert_frame_equal(
                s, o, check_dtype=False, check_exact=True
            )
            print(f"ok   {name}: {len(s)} rows match")
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:500]}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])

"""operators/scalewin.py — blocked global-order windows.

Cross-engine parity cannot catch a symmetric formula error here because
the catalog entries' oracles use plain OVER (ORDER BY ...) SQL on both
sides; these tests pin the blocked decomposition DIRECTLY against
Spark's own single-partition window on adversarial frames (ties, nulls,
negatives, all-equal keys, singletons, floats) and the NTILE derivation
against F.ntile for several k.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from shuttlestandalonedbcreator_spark.operators import scalewin as SW


def _order_cols(spec):
    return [F.asc(c) if d == "asc" else F.desc(c) for c, d in spec]


@pytest.fixture(scope="module")
def frame(spark):
    random.seed(11)
    rows = [
        (i, random.randint(-500, 10**6), random.random() * 0.9,
         random.randint(0, 5))
        for i in range(5000)
    ]
    # heavy ties on v and f; a null-bearing tail on v
    rows += [(5000 + i, 777, 0.5, 3) for i in range(300)]
    rows += [(5300 + i, None, 0.1, 1) for i in range(7)]
    return spark.createDataFrame(
        rows, "id long, v long, s double, f long"
    ).cache()


@pytest.mark.parametrize(
    "spec",
    [
        [("v", "asc"), ("id", "asc")],
        [("v", "desc"), ("id", "asc")],
        [("s", "desc"), ("id", "asc")],
        [("f", "desc"), ("id", "asc")],  # 6 distinct keys -> huge ties
    ],
    ids=["int-asc", "int-desc-nulls", "float-desc", "tie-heavy"],
)
def test_row_numbers_match_global_window(spark, frame, spec):
    got = SW.with_global_row_numbers(frame, {"rn": spec}, n_blocks=64)
    exp = frame.withColumn(
        "rn", F.row_number().over(Window.orderBy(*_order_cols(spec))).cast("long")
    )
    assert got.count() == exp.count()
    assert got.select("id", "rn").exceptAll(exp.select("id", "rn")).count() == 0
    assert exp.select("id", "rn").exceptAll(got.select("id", "rn")).count() == 0


def test_multiple_specs_share_one_frame(spark, frame):
    specs = {
        "a": [("v", "asc"), ("id", "asc")],
        "b": [("s", "desc"), ("id", "asc")],
        "c": [("f", "desc"), ("id", "asc")],
    }
    got = SW.with_global_row_numbers(frame, specs, n_blocks=32)
    exp = frame
    for out, spec in specs.items():
        exp = exp.withColumn(
            out,
            F.row_number().over(Window.orderBy(*_order_cols(spec))).cast("long"),
        )
    cols = ["id", *specs]
    assert got.count() == exp.count()
    assert got.select(cols).exceptAll(exp.select(cols)).count() == 0
    assert exp.select(cols).exceptAll(got.select(cols)).count() == 0


@pytest.mark.parametrize("direction", ["asc", "desc"])
def test_running_sum_matches_global_window(spark, frame, direction):
    spec = [("v", direction), ("id", "asc")]
    got = SW.with_global_running_sum(
        frame.filter(F.col("v").isNotNull()), spec, "v", "cum", n_blocks=64
    )
    w = Window.orderBy(*_order_cols(spec)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    exp = frame.filter(F.col("v").isNotNull()).withColumn(
        "cum", F.sum("v").over(w).cast("long")
    )
    assert got.count() == exp.count()
    assert got.select("id", "cum").exceptAll(exp.select("id", "cum")).count() == 0
    assert exp.select("id", "cum").exceptAll(got.select("id", "cum")).count() == 0


@pytest.mark.parametrize("k", [4, 7, 10, 100])
def test_ntile_from_rank_matches_ntile(spark, frame, k):
    n = frame.count()
    spec = [("v", "asc"), ("id", "asc")]
    ranked = SW.with_global_row_numbers(frame, {"r": spec}, n_blocks=64)
    got = ranked.select(
        "id", SW.ntile_from_rank(F.col("r"), F.lit(n).cast("long"), k).alias("t")
    )
    exp = frame.select(
        "id", F.ntile(k).over(Window.orderBy(*_order_cols(spec))).alias("t")
    )
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_ntile_fewer_rows_than_tiles(spark):
    df = spark.createDataFrame([(i, i * 3) for i in range(3)], "id long, v long")
    ranked = SW.with_global_row_numbers(df, {"r": [("v", "asc"), ("id", "asc")]})
    got = ranked.select(
        "id", SW.ntile_from_rank(F.col("r"), F.lit(3).cast("long"), 10).alias("t")
    )
    exp = df.select(
        "id",
        F.ntile(10).over(Window.orderBy(F.asc("v"), F.asc("id"))).alias("t"),
    )
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_degenerate_frames(spark):
    # all-equal leading key: one occupied block == the old single
    # partition, still correct
    eq = spark.createDataFrame([(i, 5) for i in range(50)], "id long, v long")
    got = SW.with_global_row_numbers(eq, {"rn": [("v", "asc"), ("id", "asc")]})
    assert [r["rn"] for r in got.orderBy("id").collect()] == list(range(1, 51))
    # singleton
    one = spark.createDataFrame([(1, 9)], "id long, v long")
    assert (
        SW.with_global_row_numbers(one, {"rn": [("v", "asc"), ("id", "asc")]})
        .collect()[0]["rn"]
        == 1
    )
    # empty
    empty = spark.createDataFrame([], "id long, v long")
    assert (
        SW.with_global_row_numbers(empty, {"rn": [("v", "asc"), ("id", "asc")]})
        .count()
        == 0
    )
    assert (
        SW.with_global_running_sum(
            empty, [("v", "asc"), ("id", "asc")], "v", "cum"
        ).count()
        == 0
    )


def test_no_data_sized_single_partition_window(spark, frame):
    """The whole point: the only unpartitioned window in the plan is the
    block-offset stitch over <= n_blocks+1 rows."""
    got = SW.with_global_row_numbers(frame, {"rn": [("v", "asc"), ("id", "asc")]})
    plan = got._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        s = line.lstrip(" :+-*")
        if s.startswith("Window [") and "_blk" not in s:
            # any window over the data frame must be partitioned by _blk
            raise AssertionError(f"unexpected window node: {s[:120]}")


# --- property-based: random frames, random direction, tiny block count --
# n_blocks=4 forces many rows per block AND many occupied blocks, so the
# stitch math is exercised far harder than the 1024-block default; the
# oracle is Spark's own single-partition window on the same frame.

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=12, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(-1000, 1000)),
        min_size=1,
        max_size=120,
    ),
    direction=st.sampled_from(["asc", "desc"]),
    k=st.sampled_from([3, 5, 10]),
)
def test_blocked_rank_and_ntile_match_for_random_frames(
    spark, vals, direction, k
):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    spec = [("v", direction), ("id", "asc")]
    got = SW.with_global_row_numbers(
        df, {"rn": spec}, n_blocks=4, count_col="n"
    ).select(
        "id",
        "rn",
        SW.ntile_from_rank(F.col("rn"), F.col("n"), k).alias("t"),
    )
    w = Window.orderBy(*_order_cols(spec))
    exp = df.select(
        "id",
        F.row_number().over(w).cast("long").alias("rn"),
        F.ntile(k).over(w).alias("t"),
    )
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=100),
    direction=st.sampled_from(["asc", "desc"]),
)
def test_blocked_running_sum_matches_for_random_frames(spark, vals, direction):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    spec = [("v", direction), ("id", "asc")]
    got = SW.with_global_running_sum(
        df, spec, "v", "cum", n_blocks=4, total_col="tot"
    )
    w = Window.orderBy(*_order_cols(spec)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    exp = df.withColumn("cum", F.sum("v").over(w).cast("long")).withColumn(
        "tot", F.lit(sum(vals)).cast("long")
    )
    cols = ["id", "cum", "tot"]
    assert got.select(cols).exceptAll(exp.select(cols)).count() == 0
    assert exp.select(cols).exceptAll(got.select(cols)).count() == 0


def test_decimal_leading_key(spark):
    """The numeric-leading-key contract includes DECIMAL: observe()
    returns Decimal bounds and the block math must stay monotone."""
    from decimal import Decimal

    rows = [(i, Decimal(str((i * 37) % 100)) / 4) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, v decimal(10,2)")
    spec = [("v", "desc"), ("id", "asc")]
    got = SW.with_global_row_numbers(df, {"rn": spec}, n_blocks=16)
    exp = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(*_order_cols(spec))).cast("long")
    )
    assert got.count() == exp.count()
    assert got.select("id", "rn").exceptAll(exp.select("id", "rn")).count() == 0
    assert exp.select("id", "rn").exceptAll(got.select("id", "rn")).count() == 0


def test_date_leading_key_fails_loudly_and_block_on_fixes_it(spark):
    """DATE leading keys: date subtraction yields an INTERVAL, so the
    block math fails at CONSTRUCTION time (AnalysisException — loud,
    never a silent wrong answer), and the documented fix is a numeric
    `block_on` proxy (unix_date is monotone in the date)."""
    import datetime

    from pyspark.errors import AnalysisException

    rows = [(i, datetime.date(2024, 1, 1) + datetime.timedelta(days=(i * 13) % 90))
            for i in range(100)]
    df = spark.createDataFrame(rows, "id long, d date")
    spec = [("d", "asc"), ("id", "asc")]
    with pytest.raises(AnalysisException):
        SW.with_global_row_numbers(df, {"rn": spec}, n_blocks=8)
    got = SW.with_global_row_numbers(
        df, {"rn": spec}, n_blocks=8, block_on={"rn": F.unix_date(F.col("d"))}
    )
    exp = df.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(*_order_cols(spec))).cast("long"),
    )
    assert got.count() == exp.count()
    assert got.select("id", "rn").exceptAll(exp.select("id", "rn")).count() == 0
    assert exp.select("id", "rn").exceptAll(got.select("id", "rn")).count() == 0

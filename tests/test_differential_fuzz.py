"""Differential fuzzing (mini-SQLancer): a seeded generator produces
random-but-reproducible SQL over the synthetic tables; each query runs
VERBATIM on Spark SQL and DuckDB and the results must agree exactly.

This covers the combinatorial space the hand-written catalog can't:
random predicate/group/aggregate compositions, including empty results
and all-NULL groups. The grammar is restricted to engine-exact
constructs — COUNT/MIN/MAX/COUNT(DISTINCT) aggregates (no double SUM/
AVG whose accumulation order differs), equality/range/IN/NULL
predicates, string and integer group keys — so any mismatch is a real
semantic divergence, never float noise.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from shuttlestandalonedbcreator_spark.sources.registry import register_views
from tools.check_parity import TABLES, compare

_NUM_QUERIES = 25
_SEED = 20260814

_TABLES = {
    "orders": {
        "group": ["o_orderstatus", "o_orderpriority"],
        "num": ["o_totalprice", "o_orderkey", "o_custkey"],
        "str": ["o_orderstatus", "o_orderpriority"],
    },
    "lineitem": {
        "group": ["l_returnflag", "l_linestatus", "l_linenumber"],
        "num": ["l_quantity", "l_extendedprice", "l_discount", "l_orderkey"],
        "str": ["l_returnflag", "l_linestatus"],
    },
    "customer": {
        "group": ["c_mktsegment", "c_nationkey"],
        "num": ["c_acctbal", "c_custkey"],
        "str": ["c_mktsegment", "c_name"],
    },
}
_STR_LITS = ["F", "O", "P", "R", "N", "A", "BUILDING", "1-URGENT", "5-LOW", "x"]


def _predicate(rng: random.Random, cols: dict) -> str:
    kind = rng.choice(["num_cmp", "num_between", "str_eq", "str_in", "null", "not"])
    if kind == "num_cmp":
        c = rng.choice(cols["num"])
        op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        return f"{c} {op} {rng.randint(0, 200000)}"
    if kind == "num_between":
        c = rng.choice(cols["num"])
        lo = rng.randint(0, 100000)
        return f"{c} BETWEEN {lo} AND {lo + rng.randint(0, 100000)}"
    if kind == "str_eq":
        return f"{rng.choice(cols['str'])} = '{rng.choice(_STR_LITS)}'"
    if kind == "str_in":
        lits = ", ".join(f"'{v}'" for v in rng.sample(_STR_LITS, rng.randint(1, 4)))
        return f"{rng.choice(cols['str'])} IN ({lits})"
    if kind == "null":
        c = rng.choice(cols["num"] + cols["str"])
        return f"{c} IS {'NOT ' if rng.random() < 0.5 else ''}NULL"
    return f"NOT ({_predicate(rng, cols)})"


def _query(rng: random.Random) -> str:
    table = rng.choice(list(_TABLES))
    cols = _TABLES[table]
    where = " AND ".join(
        _predicate(rng, cols) for _ in range(rng.randint(0, 3))
    ) or "TRUE"
    if rng.random() < 0.3:
        parts = where.split(" AND ")
        where = " OR ".join(parts)
    aggs = ["COUNT(*) AS n"]
    for i in range(rng.randint(0, 3)):
        c = rng.choice(cols["num"])
        fn = rng.choice(["MIN", "MAX", "COUNT", "COUNT(DISTINCT"])
        aggs.append(
            f"{fn} {c}) AS a{i}" if fn == "COUNT(DISTINCT" else f"{fn}({c}) AS a{i}"
        )
    if rng.random() < 0.7:
        keys = ", ".join(
            rng.sample(cols["group"], rng.randint(1, len(cols["group"])))
        )
        return f"SELECT {keys}, {', '.join(aggs)} FROM {table} WHERE {where} GROUP BY {keys}"
    return f"SELECT {', '.join(aggs)} FROM {table} WHERE {where}"


_QUERIES = [_query(random.Random(_SEED + i)) for i in range(_NUM_QUERIES)]


@pytest.fixture(scope="module")
def engines(spark, sf_small):
    register_views(spark, sf_small)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_small}/{t}.parquet'")
    yield spark, con
    con.close()


@pytest.mark.parametrize("i", range(_NUM_QUERIES))
def test_differential_random_query(engines, i):
    spark, con = engines
    sql = _QUERIES[i]
    got = spark.sql(sql).toPandas()
    want = con.execute(sql).df()
    problems = compare(f"fuzz_{i}", got, want)
    assert not problems, f"{sql}\n{problems[:3]}"

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
    "documents": {
        "group": ["lang", "source"],
        "num": ["doc_id", "n_chars"],
        "str": ["lang", "source"],
    },
    "events": {
        "group": ["event_type"],
        "num": ["event_id", "user_id", "value"],
        "str": ["event_type"],
    },
}
_STR_LITS = ["F", "O", "P", "R", "N", "A", "BUILDING", "1-URGENT", "5-LOW", "x", "en", "de", "src1", "click", "view"]


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
    preds = [_predicate(rng, cols) for _ in range(rng.randint(0, 3))]
    # join on the predicate LIST — a textual split-on-" AND " rewrite
    # would mangle BETWEEN x AND y
    conj = " OR " if rng.random() < 0.3 else " AND "
    where = conj.join(f"({p})" for p in preds) or "TRUE"
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
        having = (
            f" HAVING COUNT(*) > {rng.randint(0, 50)}"
            if rng.random() < 0.4
            else ""
        )
        return (
            f"SELECT {keys}, {', '.join(aggs)} FROM {table} "
            f"WHERE {where} GROUP BY {keys}{having}"
        )
    return f"SELECT {', '.join(aggs)} FROM {table} WHERE {where}"


_JOINS = [
    ("orders", "customer", "o_custkey = c_custkey"),
    ("lineitem", "orders", "l_orderkey = o_orderkey"),
    ("lineitem", "part", "l_partkey = p_partkey"),
    ("customer", "nation", "c_nationkey = n_nationkey"),
]
_JOIN_GROUPS = {
    ("orders", "customer"): ["o_orderstatus", "c_mktsegment"],
    ("lineitem", "orders"): ["l_returnflag", "o_orderpriority"],
    ("lineitem", "part"): ["l_linestatus", "p_brand"],
    ("customer", "nation"): ["c_mktsegment", "n_name"],
}


def _join_query(rng: random.Random) -> str:
    fact, dim, cond = rng.choice(_JOINS)
    jt = rng.choice(["JOIN", "LEFT JOIN"])
    preds = []
    if fact in _TABLES and rng.random() < 0.8:
        preds.append(_predicate(rng, _TABLES[fact]))
    where = " AND ".join(preds) or "TRUE"
    keys = ", ".join(
        rng.sample(_JOIN_GROUPS[(fact, dim)], rng.randint(1, 2))
    )
    # COUNT(dim-side column) differs between JOIN and LEFT JOIN — the
    # outer-join-aware count is exactly what this exercises
    dim_col = cond.split("= ")[1]
    return (
        f"SELECT {keys}, COUNT(*) AS n, COUNT({dim_col}) AS n_matched "
        f"FROM {fact} {jt} {dim} ON {cond} WHERE {where} GROUP BY {keys}"
    )


_UNIQUE_KEYS = {"orders": "o_orderkey", "customer": "c_custkey", "documents": "doc_id", "events": "event_id"}


def _topk_query(rng: random.Random) -> str:
    """Deterministic top-k: ORDER BY (value, unique key) LIMIT n — the
    unique tiebreaker makes the selected row set engine-independent even
    though the comparison itself is order-insensitive."""
    table = rng.choice(list(_UNIQUE_KEYS))
    cols = _TABLES[table]
    key = _UNIQUE_KEYS[table]
    val = rng.choice([c for c in cols["num"] if c != key])
    where = _predicate(rng, cols) if rng.random() < 0.5 else "TRUE"
    direction = rng.choice(["ASC", "DESC"])
    return (
        f"SELECT {key}, {val} FROM {table} WHERE {where} "
        f"ORDER BY {val} {direction}, {key} ASC LIMIT {rng.randint(1, 50)}"
    )


def _scalar_query(rng: random.Random) -> str:
    """Scalar string/conditional expressions in projections — verbatim
    on both engines; keyed by the table's unique id so the row set is
    deterministic."""
    table = rng.choice(list(_UNIQUE_KEYS))
    cols = _TABLES[table]
    key = _UNIQUE_KEYS[table]
    c = rng.choice(cols["str"])
    exprs = rng.sample(
        [
            f"LENGTH({c}) AS e1",
            f"UPPER({c}) AS e2",
            f"LOWER({c}) AS e3",
            f"SUBSTR({c}, 1, {rng.randint(1, 5)}) AS e4",
            f"CONCAT({c}, '_{rng.randint(0, 9)}') AS e5",
            f"CASE WHEN LENGTH({c}) > {rng.randint(0, 10)} THEN 'long' ELSE 'short' END AS e6",
            f"REPLACE({c}, 'A', '@') AS e7",
            f"TRIM({c}) AS e8",
        ],
        rng.randint(2, 4),
    )
    where = _predicate(rng, cols) if rng.random() < 0.5 else "TRUE"
    return f"SELECT {key}, {', '.join(exprs)} FROM {table} WHERE {where}"


def _window_query(rng: random.Random) -> str:
    """Ranking windows with a unique-key tiebreaker — the total order
    makes ROW_NUMBER/RANK/DENSE_RANK engine-deterministic."""
    table = rng.choice(list(_UNIQUE_KEYS))
    cols = _TABLES[table]
    key = _UNIQUE_KEYS[table]
    val = rng.choice([c for c in cols["num"] if c != key])
    part = rng.choice(cols["group"])
    fn = rng.choice(["ROW_NUMBER()", "RANK()", "DENSE_RANK()"])
    direction = rng.choice(["ASC", "DESC"])
    where = _predicate(rng, cols) if rng.random() < 0.5 else "TRUE"
    return (
        f"SELECT {key}, {part}, "
        f"{fn} OVER (PARTITION BY {part} ORDER BY {val} {direction}, {key} ASC) AS rk "
        f"FROM {table} WHERE {where}"
    )


def _setop_query(rng: random.Random) -> str:
    """INTERSECT / EXCEPT / UNION (set and bag forms) of two filtered
    projections — deterministic because the projection is keyed."""
    table = rng.choice(list(_UNIQUE_KEYS))
    cols = _TABLES[table]
    key = _UNIQUE_KEYS[table]
    part = rng.choice(cols["group"])
    op = rng.choice(["INTERSECT", "EXCEPT", "UNION", "UNION ALL"])
    p1, p2 = _predicate(rng, cols), _predicate(rng, cols)
    return (
        f"SELECT {key}, {part} FROM {table} WHERE {p1} "
        f"{op} "
        f"SELECT {key}, {part} FROM {table} WHERE {p2}"
    )


_EXISTS_PAIRS = [
    ("orders", "o_orderstatus", "lineitem", "l_orderkey = o_orderkey"),
    ("customer", "c_mktsegment", "orders", "o_custkey = c_custkey"),
]


def _exists_query(rng: random.Random) -> str:
    """Correlated [NOT] EXISTS (the semi/anti-join decorrelation path)
    with an inner predicate, grouped counts on the outer."""
    outer, group, inner, cond = rng.choice(_EXISTS_PAIRS)
    neg = "NOT " if rng.random() < 0.5 else ""
    inner_pred = _predicate(rng, _TABLES[inner]) if inner in _TABLES else "TRUE"
    outer_pred = (
        _predicate(rng, _TABLES[outer]) if rng.random() < 0.5 else "TRUE"
    )
    return (
        f"SELECT {group}, COUNT(*) AS n FROM {outer} "
        f"WHERE ({outer_pred}) AND {neg}EXISTS ("
        f"SELECT 1 FROM {inner} WHERE {cond} AND ({inner_pred})) "
        f"GROUP BY {group}"
    )


_INT_COLS = {"orders": ["o_orderkey", "o_custkey"], "customer": ["c_custkey", "c_nationkey"],
             "documents": ["doc_id", "n_chars"], "events": ["event_id", "user_id"]}


def _frame_window_query(rng: random.Random) -> str:
    """Aggregate windows with explicit ROWS frames over a unique total
    order — integer SUM/COUNT only, so accumulation is exact on both
    engines (CAST to BIGINT flattens DuckDB's HUGEINT)."""
    table = rng.choice(list(_UNIQUE_KEYS))
    cols = _TABLES[table]
    key = _UNIQUE_KEYS[table]
    val = rng.choice(_INT_COLS[table])
    part = rng.choice(cols["group"])
    direction = rng.choice(["ASC", "DESC"])
    n_prec = rng.randint(0, 5)
    unit = rng.choice(["ROWS", "RANGE"])
    if unit == "RANGE":
        # RANGE frames are value-defined: tied rows share IDENTICAL
        # frames, so results are deterministic WITHOUT a tiebreak — and
        # Spark rejects value-bounded RANGE with multi-column ORDER BY
        # anyway (DATATYPE_MISMATCH.RANGE_FRAME_MULTI_ORDER)
        frame = f"RANGE BETWEEN {n_prec * 100} PRECEDING AND CURRENT ROW"
        order = f"{val} {direction}"
    else:
        frame = f"ROWS BETWEEN {n_prec} PRECEDING AND CURRENT ROW"
        order = f"{val} {direction}, {key} ASC"
    where = _predicate(rng, cols) if rng.random() < 0.5 else "TRUE"
    return (
        f"SELECT {key}, {part}, "
        f"CAST(SUM({val}) OVER (PARTITION BY {part} ORDER BY {order} {frame}) AS BIGINT) AS wsum, "
        f"CAST(COUNT(*) OVER (PARTITION BY {part} ORDER BY {order} {frame}) AS BIGINT) AS wcnt "
        f"FROM {table} WHERE {where}"
    )


def _distinct_query(rng: random.Random) -> str:
    table = rng.choice(list(_TABLES))
    cols = _TABLES[table]
    keys = ", ".join(rng.sample(cols["group"], rng.randint(1, len(cols["group"]))))
    where = _predicate(rng, cols) if rng.random() < 0.6 else "TRUE"
    return f"SELECT DISTINCT {keys} FROM {table} WHERE {where}"


def _grouping_sets_query(rng: random.Random) -> str:
    """ROLLUP/CUBE/GROUPING SETS super-aggregates: the NULL rows they
    inject are disambiguated from data NULLs by GROUPING() columns, so
    comparison is exact. Integer-free aggregates only."""
    table = rng.choice(list(_TABLES))
    cols = _TABLES[table]
    n_keys = min(2, len(cols["group"]))
    keys = rng.sample(cols["group"], n_keys)
    shape = rng.choice(["ROLLUP", "CUBE", "SETS"])
    if shape == "SETS":
        combos = [f"({keys[0]})", "()"] + ([f"({', '.join(keys)})"] if n_keys > 1 else [])
        spec = f"GROUPING SETS ({', '.join(combos)})"
    else:
        spec = f"{shape}({', '.join(keys)})"
    g_cols = ", ".join(f"CAST(GROUPING({k}) AS INT) AS g_{i}" for i, k in enumerate(keys))
    where = _predicate(rng, cols) if rng.random() < 0.5 else "TRUE"
    # HAVING n > 0 normalizes a REAL engine divergence this generator
    # found on its first sweep: over EMPTY input, DuckDB (per the
    # standard, like Postgres) emits the grand-total row of the ()
    # grouping set with COUNT 0, while Spark emits no rows at all —
    # even though Spark DOES emit the 1-row result for a plain global
    # aggregate over empty input. The clause drops the zero-count row
    # on DuckDB and is a no-op for every row-backed group.
    return (
        f"SELECT {', '.join(keys)}, {g_cols}, COUNT(*) AS n, "
        f"MIN({rng.choice(cols['num'])}) AS mn "
        f"FROM {table} WHERE {where} GROUP BY {spec} HAVING COUNT(*) > 0"
    )


def _case_agg_query(rng: random.Random) -> str:
    """Conditional aggregation (the reference's status_summary family):
    SUM over 0/1 CASE branches cast to BIGINT — exact integer math."""
    table = rng.choice(list(_TABLES))
    cols = _TABLES[table]
    key = rng.choice(cols["group"])
    p1, p2 = _predicate(rng, cols), _predicate(rng, cols)
    return (
        f"SELECT {key}, "
        f"CAST(SUM(CASE WHEN {p1} THEN 1 ELSE 0 END) AS BIGINT) AS c1, "
        f"CAST(SUM(CASE WHEN {p2} THEN 1 ELSE 0 END) AS BIGINT) AS c2, "
        f"MIN(CASE WHEN {p1} THEN {rng.choice(cols['num'])} END) AS m1, "
        f"COUNT(*) AS n FROM {table} GROUP BY {key}"
    )


_IN_SUBQ = [
    ("orders", "o_orderstatus", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_mktsegment", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem", "l_returnflag", "l_orderkey", "orders", "o_orderkey"),
]


def _in_subquery_query(rng: random.Random) -> str:
    """[NOT] IN (SELECT ...) — the subquery-to-semi/anti-join rewrite
    with a filtered inner side (inner key is a NOT NULL primary key, so
    NOT IN's three-valued-logic trap stays deterministic)."""
    outer, group, fk, inner, pk = rng.choice(_IN_SUBQ)
    neg = "NOT " if rng.random() < 0.5 else ""
    inner_pred = _predicate(rng, _TABLES[inner]) if inner in _TABLES else "TRUE"
    return (
        f"SELECT {group}, COUNT(*) AS n FROM {outer} "
        f"WHERE {fk} {neg}IN (SELECT {pk} FROM {inner} WHERE {inner_pred}) "
        f"GROUP BY {group}"
    )


def _scalar_subquery_query(rng: random.Random) -> str:
    """Comparison against an uncorrelated scalar aggregate subquery
    (Q11/Q15/Q22 family) — integer MIN/MAX/COUNT scalars only."""
    table = rng.choice(list(_UNIQUE_KEYS))
    cols = _TABLES[table]
    key = _UNIQUE_KEYS[table]
    # val must differ from key: a duplicated projection column is
    # auto-renamed by DuckDB (o_orderkey_1) but not by Spark
    val = rng.choice([c for c in _INT_COLS[table] if c != key])
    fn = rng.choice(["MIN", "MAX", "COUNT"])
    inner_pred = _predicate(rng, cols)
    op = rng.choice(["<", ">", "<=", ">="])
    return (
        f"SELECT {key}, {val} FROM {table} "
        f"WHERE {val} {op} (SELECT {fn}({val}) / 2 + 1 FROM {table} "
        f"WHERE {inner_pred}) ORDER BY {key} LIMIT 100"
    )


def _full_outer_query(rng: random.Random) -> str:
    """FULL OUTER JOIN with a predicate in the ON clause — the classic
    outer-join divergence surface (ON-filters must not eliminate
    null-padded rows). Grouped by a COALESCEd key so unmatched rows from
    either side land in a deterministic bucket; COUNT(col) counts each
    side's matched rows."""
    fact, dim, cond = rng.choice(_JOINS)
    fact_pred = (
        _predicate(rng, _TABLES[fact]) if rng.random() < 0.7 else "TRUE"
    )
    left_key, right_key = cond.split(" = ")
    g = rng.choice(_JOIN_GROUPS[(fact, dim)])
    return (
        f"SELECT COALESCE({g}, '<null>') AS g, COUNT(*) AS n, "
        f"COUNT({left_key}) AS n_l, COUNT({right_key}) AS n_r "
        f"FROM {fact} FULL JOIN {dim} ON {cond} AND ({fact_pred}) GROUP BY 1"
    )


def _datetime_query(rng: random.Random) -> str:
    """Datetime scalar surface over the events stream: EXTRACT fields
    and date_trunc, verbatim on both engines (results CAST to erase the
    INT-vs-BIGINT width difference)."""
    exprs = rng.sample(
        [
            "CAST(EXTRACT(YEAR FROM ts) AS BIGINT) AS e1",
            "CAST(EXTRACT(MONTH FROM ts) AS BIGINT) AS e2",
            "CAST(EXTRACT(DAY FROM ts) AS BIGINT) AS e3",
            "CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS e4",
            "CAST(EXTRACT(MINUTE FROM ts) AS BIGINT) AS e5",
            "CAST(date_trunc('day', ts) AS DATE) AS e6",
            "CAST(date_trunc('hour', ts) AS TIMESTAMP) AS e7",
        ],
        rng.randint(2, 4),
    )
    where = (
        _predicate(rng, _TABLES["events"]) if rng.random() < 0.5 else "TRUE"
    )
    return f"SELECT event_id, {', '.join(exprs)} FROM events WHERE {where}"


def _cte_query(rng: random.Random) -> str:
    """A grouped CTE referenced TWICE (self-join on the group key) —
    exercises the no-materialization re-evaluation path: both
    references must compute identical results even though Spark
    re-plans the subtree per reference."""
    table = rng.choice(list(_TABLES))
    cols = _TABLES[table]
    key = rng.choice(cols["group"])
    val = rng.choice(cols["num"])
    p = _predicate(rng, cols)
    cmp_op = rng.choice(["<=", ">=", "="])
    return (
        f"WITH agg AS (SELECT {key} AS k, COUNT(*) AS n, MIN({val}) AS mn "
        f"FROM {table} WHERE {p} GROUP BY {key}) "
        f"SELECT a.k, a.n, a.mn, b.n AS n2 "
        f"FROM agg a JOIN agg b ON a.k = b.k AND a.n {cmp_op} b.n"
    )


def _string_expr_query(rng: random.Random) -> str:
    """String-function compositions as group keys and predicates —
    upper/lower/trim/substr/replace/||/left are engine-exact on the
    fixtures' ASCII data, so a mismatch is a real semantic divergence
    (1-indexing, zero-length slices, NULL propagation through ||, LIKE
    edges), never collation noise. Group keys use GROUP BY 1 (both
    engines resolve ordinals)."""
    table = rng.choice(list(_TABLES))
    cols = _TABLES[table]
    c = rng.choice(cols["str"])
    exprs = [
        f"upper({c})",
        f"lower({c})",
        f"substr({c}, {rng.randint(1, 3)}, {rng.randint(0, 4)})",
        f"replace({c}, '{rng.choice('aeiou')}', '_')",
        f"trim({c})",
        f"{c} || '_' || {rng.choice(cols['str'])}",
        f"left({c}, {rng.randint(0, 3)})",
    ]
    key = rng.choice(exprs)
    preds = [
        f"length({c}) {rng.choice(['<', '<=', '>', '>='])} {rng.randint(0, 12)}",
        f"{c} LIKE '%{rng.choice('aeiou1')}%'",
        f"substr({c}, 1, {rng.randint(0, 2)}) = '{rng.choice(_STR_LITS)[:2]}'",
    ]
    where = preds[rng.randrange(len(preds))]
    agg = rng.choice(
        [f"COUNT(DISTINCT {c}) AS d", f"MIN(length({c})) AS m", "COUNT(*) AS n2"]
    )
    return (
        f"SELECT {key} AS k, COUNT(*) AS n, {agg} "
        f"FROM {table} WHERE {where} GROUP BY 1"
    )


def _rolling_minhash_query(rng: random.Random) -> str:
    """Winnowing / substring-span shape (r4 families): a per-partition
    ROWS-frame MIN/MAX over an md5-derived integer — the window-min
    fingerprint selection and the stride-aligned window hashes, in the
    verbatim-portable subset (ascii(substr(md5(x), i, 1)) is an exact
    0-255 int on both engines; conv/hex-cast hashes are NOT verbatim;
    CAST AS STRING parses on both, bare VARCHAR does not on Spark 4).
    The window ORDER BY carries the table's unique-key tiebreak — a
    ROWS frame over a tied order is engine-dependent by definition
    (first sweep caught exactly that on events.user_id)."""
    tiebreak = {
        "orders": "o_orderkey",
        "lineitem": "l_orderkey, l_linenumber",
        "events": "event_id",
    }
    table = rng.choice(list(tiebreak))
    cols = _TABLES[table]
    part = rng.choice(cols["group"])
    order = rng.choice(cols["num"])
    c = rng.choice(cols["str"] + cols["num"])
    pos = rng.randint(1, 30)
    k = rng.randint(1, 6)
    fn = rng.choice(["MIN", "MAX"])
    pred = _predicate(rng, cols)
    return (
        f"SELECT {part} AS p, {order} AS o, "
        f"{fn}(ascii(substr(md5(CAST({c} AS STRING)), {pos}, 1))) OVER ("
        f"PARTITION BY {part} ORDER BY {order}, {tiebreak[table]} "
        f"ROWS BETWEEN {k} PRECEDING AND CURRENT ROW) AS w "
        f"FROM {table} WHERE {pred}"
    )


def _int_arith_query(rng: random.Random) -> str:
    """Integer-algebra shape (r4 power-iteration / proration /
    Mann-Kendall class): %, FLOOR-division, ABS, GREATEST/LEAST chains
    over sign-crossing operands as group keys and exact aggregates —
    probing exactly the truncation-vs-floor and modulo-sign semantics
    the catalog's all-integer math leans on. INTEGER-typed columns
    only: CAST(double AS BIGINT) is the KNOWN Spark-truncates vs
    DuckDB-rounds divergence (NOTES.md), which this grammar must not
    re-trip."""
    ints = {
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_linenumber", "l_partkey"],
        "events": ["event_id", "user_id"],
        "customer": ["c_custkey", "c_nationkey"],
    }
    table = rng.choice(list(ints))
    a = rng.choice(ints[table])
    b = rng.choice(ints[table])
    shift = rng.randint(0, 50000)
    m = rng.randint(2, 97)
    d = rng.randint(2, 13)
    exprs = [
        f"(CAST({a} AS BIGINT) - {shift}) % {m}",
        f"CAST(FLOOR((CAST({a} AS BIGINT) - {shift}) / {d}) AS BIGINT)",
        f"ABS(CAST({a} AS BIGINT) - {shift}) % {m}",
        f"GREATEST(CAST({a} AS BIGINT) % {m}, CAST({b} AS BIGINT) % {d})",
        f"LEAST(CAST({a} AS BIGINT) % {m}, {d})",
    ]
    key = rng.choice(exprs)
    agg_in = rng.choice(exprs)
    return (
        f"SELECT {key} AS k, COUNT(*) AS n, "
        f"CAST(SUM({agg_in}) AS BIGINT) AS s, "
        f"MIN({agg_in}) AS mn, MAX({agg_in}) AS mx "
        f"FROM {table} GROUP BY 1"
    )


def _prefix_selfjoin_query(rng: random.Random) -> str:
    """Prefix-filter / AllPairs shape (r4): candidate pairs meet on a
    derived prefix key with an id1 < id2 dedup — the posting-list
    self-join skeleton, sized by the sf0.001 fixture. Aggregated to
    per-key pair counts so the result is order-free."""
    k = rng.randint(1, 3)
    src = rng.choice(["lang", "source"])
    lo = rng.randint(0, 2000)
    return (
        f"SELECT a.{src} AS g, substr(a.text, 1, {k}) AS pfx, "
        f"COUNT(*) AS pairs, CAST(MIN(a.doc_id + b.doc_id) AS BIGINT) AS probe "
        f"FROM documents a JOIN documents b "
        f"ON substr(a.text, 1, {k}) = substr(b.text, 1, {k}) "
        f"AND a.{src} = b.{src} AND a.doc_id < b.doc_id "
        f"WHERE a.doc_id > {lo} GROUP BY 1, 2"
    )


_QUERIES = (
    [_query(random.Random(_SEED + i)) for i in range(_NUM_QUERIES)]
    + [_join_query(random.Random(_SEED + 1000 + i)) for i in range(10)]
    + [_topk_query(random.Random(_SEED + 2000 + i)) for i in range(5)]
    + [_scalar_query(random.Random(_SEED + 3000 + i)) for i in range(10)]
    + [_window_query(random.Random(_SEED + 4000 + i)) for i in range(5)]
    + [_setop_query(random.Random(_SEED + 5000 + i)) for i in range(5)]
    + [_exists_query(random.Random(_SEED + 6000 + i)) for i in range(5)]
    + [_frame_window_query(random.Random(_SEED + 7000 + i)) for i in range(5)]
    + [_distinct_query(random.Random(_SEED + 8000 + i)) for i in range(5)]
    + [_grouping_sets_query(random.Random(_SEED + 9000 + i)) for i in range(5)]
    + [_case_agg_query(random.Random(_SEED + 10000 + i)) for i in range(5)]
    + [_in_subquery_query(random.Random(_SEED + 11000 + i)) for i in range(5)]
    + [_scalar_subquery_query(random.Random(_SEED + 12000 + i)) for i in range(5)]
    + [_full_outer_query(random.Random(_SEED + 13000 + i)) for i in range(5)]
    + [_datetime_query(random.Random(_SEED + 14000 + i)) for i in range(5)]
    + [_cte_query(random.Random(_SEED + 15000 + i)) for i in range(5)]
    + [_string_expr_query(random.Random(_SEED + 16000 + i)) for i in range(5)]
    + [_rolling_minhash_query(random.Random(_SEED + 17000 + i)) for i in range(5)]
    + [_int_arith_query(random.Random(_SEED + 18000 + i)) for i in range(5)]
    + [_prefix_selfjoin_query(random.Random(_SEED + 19000 + i)) for i in range(5)]
)


@pytest.fixture(scope="module")
def engines(spark, sf_small):
    register_views(spark, sf_small)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_small}/{t}.parquet'")
    yield spark, con
    con.close()


@pytest.mark.parametrize("i", range(_NUM_QUERIES + 105))
def test_differential_random_query(engines, i):
    spark, con = engines
    sql = _QUERIES[i]
    got = spark.sql(sql).toPandas()
    want = con.execute(sql).df()
    problems = compare(f"fuzz_{i}", got, want)
    assert not problems, f"{sql}\n{problems[:3]}"

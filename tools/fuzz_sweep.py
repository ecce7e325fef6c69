"""Deep differential-fuzz sweep: run the test-suite generators over an
arbitrary seed range against any scale factor — the exploratory hunt
behind tests/test_differential_fuzz.py's 50 pinned cases.

Usage: python tools/fuzz_sweep.py [sf_dir] [n_seeds] [seed_base]

Exit 0 only if every generated query parses on both engines and their
results agree exactly. Run before a release with a fresh seed_base to
hunt for divergences the pinned seeds can't see.
"""

from __future__ import annotations

import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    base = int(sys.argv[3]) if len(sys.argv) > 3 else 50000

    import duckdb

    from shuttlestandalonedbcreator_spark.session import get_spark
    from shuttlestandalonedbcreator_spark.sources.registry import register_views
    from test_differential_fuzz import (
        _case_agg_query,
        _cte_query,
        _datetime_query,
        _distinct_query,
        _exists_query,
        _frame_window_query,
        _full_outer_query,
        _grouping_sets_query,
        _in_subquery_query,
        _int_arith_query,
        _join_query,
        _prefix_selfjoin_query,
        _query,
        _rolling_minhash_query,
        _scalar_query,
        _scalar_subquery_query,
        _setop_query,
        _string_expr_query,
        _topk_query,
        _window_query,
    )
    from tools.check_parity import TABLES, compare

    spark = get_spark()
    register_views(spark, sf_dir)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    gens = [_query, _join_query, _topk_query, _scalar_query, _window_query,
            _setop_query, _exists_query, _frame_window_query, _distinct_query,
            _grouping_sets_query, _case_agg_query, _in_subquery_query,
            _scalar_subquery_query, _full_outer_query, _datetime_query,
            _cte_query, _string_expr_query, _rolling_minhash_query,
            _int_arith_query, _prefix_selfjoin_query]
    divergences = errors = 0
    for seed in range(base, base + n_seeds):
        sql = random.Random(seed).choice(gens)(random.Random(seed))
        try:
            problems = compare(
                f"s{seed}", spark.sql(sql).toPandas(), con.execute(sql).df()
            )
        except Exception as e:  # noqa: BLE001
            errors += 1
            print(f"ERROR seed={seed}: {sql}\n  {e}")
            continue
        if problems:
            divergences += 1
            print(f"DIVERGENCE seed={seed}: {sql}\n  {problems[:2]}")
    print(
        f"swept {n_seeds} seeds @ {sf_dir}: "
        f"{divergences} divergences, {errors} errors"
    )
    return 1 if (divergences or errors) else 0


if __name__ == "__main__":
    sys.exit(main())

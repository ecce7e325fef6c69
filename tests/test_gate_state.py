"""Gate-order correctness: the driver walks ~50 catalog entries per
round in queries() dict order, so the ordering IS the correctness
signal's coverage policy. These tests pin the three tiers (modified
since last green row → never checked → oldest checked) and that the
content hash actually reacts to code changes."""

import pytest

from shuttlestandalonedbcreator_spark import gate
from shuttlestandalonedbcreator_spark.queries import CATALOG, QueryDef


def test_entry_hash_reacts_to_source_and_oracle_changes():
    def fn_a(spark, sf_dir):
        return spark.range(1)

    def fn_b(spark, sf_dir):
        return spark.range(2)

    base = gate.entry_hash(QueryDef(fn_a, "SELECT 1 AS x"))
    assert gate.entry_hash(QueryDef(fn_a, "SELECT 1 AS x")) == base
    assert gate.entry_hash(QueryDef(fn_b, "SELECT 1 AS x")) != base
    assert gate.entry_hash(QueryDef(fn_a, "SELECT 2 AS x")) != base


def test_entry_hash_covers_one_dependency_level():
    """An entry that calls a package helper must hash that helper's
    source, so editing operators/*.py re-prioritizes its callers."""
    from shuttlestandalonedbcreator_spark.queries import q_status_summary

    entry = CATALOG["status_summary"]
    assert entry.spark is q_status_summary
    parts = gate._dep_parts(q_status_summary)
    # status_summary() lives in operators/summary.py — its source (or
    # its module hash) must contribute to the entry hash
    joined = "\n".join(parts)
    assert "def status_summary" in joined or any(
        len(p) == 32 for p in parts
    ), "no dependency material captured"


def test_entry_hash_sees_function_local_imports():
    """q_bpe_train_merges imports operators.bpe INSIDE the function —
    the hash must still track that module (a bpe.py edit re-prioritizes
    the entry) via the textual import scan."""
    entry = CATALOG["bpe_train_merges"]
    import inspect

    src = inspect.getsource(entry.spark)
    assert "from shuttlestandalonedbcreator_spark.operators.bpe" in src
    parts = gate._local_import_parts(src)
    assert parts, "local package import not captured"
    # and a different module hash must change the entry hash
    orig = gate._module_hash_cache.get(
        "shuttlestandalonedbcreator_spark.operators.bpe"
    )
    base = gate.entry_hash(entry)
    try:
        gate._module_hash_cache[
            "shuttlestandalonedbcreator_spark.operators.bpe"
        ] = "tampered"
        assert gate.entry_hash(entry) != base
    finally:
        if orig is None:
            gate._module_hash_cache.pop(
                "shuttlestandalonedbcreator_spark.operators.bpe", None
            )
        else:
            gate._module_hash_cache[
                "shuttlestandalonedbcreator_spark.operators.bpe"
            ] = orig


def test_gate_order_tiers(monkeypatch):
    names = list(CATALOG)[:4]
    sub = {n: CATALOG[n] for n in names}
    cur = {n: gate.entry_hash(sub[n]) for n in names}
    state = {
        names[0]: {"round": 1, "hash": cur[names[0]]},      # checked r1
        names[1]: {"round": 3, "hash": cur[names[1]]},      # checked r3
        names[2]: {"round": 2, "hash": "stale-hash"},       # MODIFIED
        # names[3]: never checked
    }
    order = gate.gate_order(sub, state)
    assert order[0] == names[2], "modified entry must walk first"
    assert order[1] == names[3], "never-checked walks second"
    assert order[2:] == [names[0], names[1]], "then oldest-checked first"


def test_state_file_covers_catalog_and_matches_current_code():
    """The checked-in gate_state.json must know every catalog entry; any
    entry whose recorded hash no longer matches the code is EXPECTED
    mid-round (it walks first) but the file itself must parse and the
    order must be a permutation of the catalog."""
    state = gate.load_state()
    assert set(CATALOG) <= set(state) | set(
        n for n in CATALOG if n not in state
    )
    order = gate.gate_order(CATALOG, state)
    assert sorted(order) == sorted(CATALOG)
    # deterministic
    assert order == gate.gate_order(CATALOG, state)


def test_record_round_updates_green_rows_only():
    sub = {n: CATALOG[n] for n in list(CATALOG)[:3]}
    a, b, c = sub
    correctness = {
        a: {"hash_match": True, "err": None, "spark_rows": 5},
        b: {"hash_match": False, "err": "mismatch", "spark_rows": 5},
        c: {"hash_match": None, "err": "no_oracle", "spark_rows": 7},
    }
    state = gate.record_round(sub, correctness, 9, state={})
    assert state[a]["round"] == 9
    assert b not in state, "red row must not record a green"
    assert state[c]["round"] == 9, "rows-only green records too"
    assert state[a]["hash"] == gate.entry_hash(sub[a])


def test_bench_headline_covers_full_catalog():
    """Every catalog entry has a recorded bench number (VERDICT r3 #7) and
    the family partition is exact (no double counting, no orphans)."""
    import bench

    assert set(bench.HEADLINE) == set(CATALOG)
    fam_members = [q for fam in bench.FAMILIES.values() for q in fam]
    assert sorted(fam_members) == sorted(bench.HEADLINE)


def test_local_from_import_captures_leaf_module():
    """r8 fix of the r7 blind spot: 'from pkg.streaming import
    multimodal' must hash the LEAF module file, not just the package
    __init__, so leaf-module edits re-prioritize dependent entries."""
    import importlib

    src = (
        "def f():\n"
        "    from shuttlestandalonedbcreator_spark.streaming import "
        "multimodal\n"
    )
    parts = gate._local_import_parts(src)
    leaf = gate._module_hash(
        importlib.import_module(
            "shuttlestandalonedbcreator_spark.streaming.multimodal"
        )
    )
    assert leaf in parts, (
        "leaf module file hash missing from the captured parts — the "
        "regex stopped at the package"
    )


def test_local_import_other_forms_capture_leaf_modules():
    """The remaining local-import shapes: aliased from-import,
    multi-name from-import (incl. a function name mixed in),
    parenthesized from-import, and plain dotted import."""
    import importlib

    pkg = "shuttlestandalonedbcreator_spark"
    leaf = gate._module_hash(
        importlib.import_module(f"{pkg}.streaming.multimodal")
    )
    codec = gate._module_hash(
        importlib.import_module(f"{pkg}.streaming.imagecodec")
    )
    cases = {
        "aliased": f"def f():\n    from {pkg}.streaming import "
                   "multimodal as mm\n",
        "multi": f"def f():\n    from {pkg}.streaming import "
                 "imagecodec, multimodal\n",
        "parens": f"def f():\n    from {pkg}.streaming import (\n"
                  "        imagecodec,\n        multimodal,\n    )\n",
        "plain": f"def f():\n    import {pkg}.streaming.multimodal\n",
    }
    for form, src in cases.items():
        parts = gate._local_import_parts(src)
        assert leaf in parts, f"{form}: leaf module not captured"
        if "imagecodec" in src:
            assert codec in parts, f"{form}: first listed module missed"
    # a from-imported FUNCTION must not crash the scan and still
    # records the defining module
    src = (f"def f():\n    from {pkg}.streaming.multimodal import "
           "extract_features\n")
    assert leaf in gate._local_import_parts(src)
    # backslash line continuation folds before the regex scan
    src = (f"def f():\n    from {pkg}.streaming import imagecodec, \\\n"
           "        multimodal\n")
    parts = gate._local_import_parts(src)
    assert leaf in parts and codec in parts, "continuation names missed"
    # a re-exported THIRD-PARTY module must not leak an environment-
    # dependent file hash into entry hashes (same guard as _dep_parts)
    import shuttlestandalonedbcreator_spark.streaming.multimodal as mm
    import numpy
    _absent = object()
    orig = getattr(mm, "_gate_test_np", _absent)
    mm._gate_test_np = numpy
    try:
        src = (f"def f():\n    from {pkg}.streaming.multimodal import "
               "_gate_test_np\n")
        parts = gate._local_import_parts(src)
        assert gate._module_hash(numpy) not in parts, (
            "third-party module hash leaked into the entry hash"
        )
        assert leaf in parts  # the defining module still recorded
    finally:
        # restore the original attribute if it pre-existed, rather than
        # leaving it overwritten with numpy
        if orig is _absent:
            del mm._gate_test_np
        else:
            mm._gate_test_np = orig


def test_local_import_ignores_comment_text():
    """Comment words after an import line are not candidate import
    names: 'from pkg.streaming import multimodal  # see: imagecodec'
    must NOT hash imagecodec, and a comment ending in a backslash must
    not swallow the import on the next line (comments are stripped
    BEFORE continuations fold)."""
    import importlib

    pkg = "shuttlestandalonedbcreator_spark"
    leaf = gate._module_hash(
        importlib.import_module(f"{pkg}.streaming.multimodal")
    )
    codec = gate._module_hash(
        importlib.import_module(f"{pkg}.streaming.imagecodec")
    )
    src = (f"def f():\n    from {pkg}.streaming import multimodal"
           "  # see: imagecodec, biff\n")
    parts = gate._local_import_parts(src)
    assert leaf in parts
    assert codec not in parts, "comment word hashed as an import name"
    # backslash at the end of a COMMENT is not a line continuation
    src = (f"def f():\n    x = 1  # note \\\n"
           f"    import {pkg}.streaming.multimodal\n")
    assert leaf in gate._local_import_parts(src), (
        "comment trailing-backslash swallowed the next line's import"
    )
    # a '#' inside a string literal must NOT strip the rest of the line
    # (an import after it would silently drop from the hash)
    src = (f'def f():\n    x = "a#b"; '
           f"import {pkg}.streaming.multimodal\n")
    assert leaf in gate._local_import_parts(src), (
        "in-string '#' deleted a same-line import from the scan"
    )


def test_local_import_multi_target_plain_import():
    """'import os, pkg.streaming.multimodal' (multi-target plain
    import) must capture the package module even when it is not the
    first target."""
    import importlib

    pkg = "shuttlestandalonedbcreator_spark"
    leaf = gate._module_hash(
        importlib.import_module(f"{pkg}.streaming.multimodal")
    )
    codec = gate._module_hash(
        importlib.import_module(f"{pkg}.streaming.imagecodec")
    )
    src = (f"def f():\n    import os, {pkg}.streaming.multimodal\n")
    assert leaf in gate._local_import_parts(src)
    # aliased targets and two package targets in one statement
    src = (f"def f():\n    import {pkg}.streaming.imagecodec as ic, "
           f"{pkg}.streaming.multimodal\n")
    parts = gate._local_import_parts(src)
    assert leaf in parts and codec in parts


def test_bench_weather_and_pin_ratio_helpers():
    """bench.py records the load it ran under (VERDICT r8 #3): loadavg
    at start AND end, cumulative /proc/stat steal%, and the median
    per-query ratio vs the committed pin — the robust signal when the
    box is loaded (r8: totals read +66% while the median was 0.954)."""
    import os

    import bench

    # weather snapshot pair flattens to the three emitted fields
    s0 = {"load_1m": 0.5, "_stat": (100, 10_000)}
    s1 = {"load_1m": 8.0, "_stat": (160, 11_000)}
    w = bench.weather_fields(s0, s1)
    assert w["load_1m_start"] == 0.5 and w["load_1m_end"] == 8.0
    assert w["steal_pct"] == 6.0  # 60 steal jiffies of 1000 total
    # degenerate snapshots (no /proc/stat, zero elapsed) stay None
    assert bench.weather_fields({"_stat": None}, {"_stat": None})[
        "steal_pct"] is None
    assert bench.weather_fields(
        {"_stat": (1, 5)}, {"_stat": (1, 5)})["steal_pct"] is None
    # live snapshot works on this platform
    live = bench.load_weather()
    assert live["load_1m"] is None or live["load_1m"] >= 0.0
    assert live["_stat"] is None or live["_stat"][1] > 0

    # median ratio vs the committed pin: identity -> 1.0, 2x -> 2.0
    import json

    pin_doc = json.load(open(
        os.path.join(os.path.dirname(bench.__file__), "BENCH_DETAIL.json")
    ))
    pin, pin_sf = pin_doc["queries"], pin_doc["sf"]
    assert bench.median_ratio_vs_pin(dict(pin), pin_sf) == 1.0
    assert bench.median_ratio_vs_pin(
        {k: v * 2 for k, v in pin.items()}, pin_sf) == 2.0
    # <10 overlapping queries -> None (not a meaningful median)
    assert bench.median_ratio_vs_pin(
        {k: pin[k] for k in list(pin)[:5]}, pin_sf) is None
    # a run at a different — or unknown — SF than the pin must NOT emit
    # a ratio (cross-SF ratios measure the fixture, not the code)
    assert bench.median_ratio_vs_pin(dict(pin), pin_sf / 10) is None
    assert bench.median_ratio_vs_pin(dict(pin), None) is None
    assert bench.median_ratio_vs_pin(dict(pin)) is None


def test_bench_load_pin_helper():
    """load_pin returns the committed pin's per-query map only at the
    pin's own SF — cross-SF or unknown-SF requests get {} so the
    outlier-repair pass (and the median ratio) never compare timings
    across fixtures."""
    import json
    import os

    import bench

    pin_doc = json.load(open(
        os.path.join(os.path.dirname(bench.__file__), "BENCH_DETAIL.json")
    ))
    assert bench.load_pin(pin_doc["sf"]) == pin_doc["queries"]
    assert bench.load_pin(pin_doc["sf"] / 10) == {}
    assert bench.load_pin(None) == {}


def test_bench_fresh_process_min_failure_contract():
    """fresh_process_min returns None (never raises, never a bogus
    number) when the subprocess cannot produce a timing — the caller
    then keeps the in-bench timing, the conservative direction. A
    1-second timeout kills the fresh JVM long before first result."""
    import bench

    assert bench.fresh_process_min(
        "status_summary", "/root/testdata/sf0.001", timeout=1) is None
    # the snippet must format into valid python for any entry name
    code = bench._FRESH_SNIPPET.format(
        repo="/r", name="a'b", sf_dir="/s")
    compile(code, "<snippet>", "exec")


def test_bench_repair_plan_gating_and_caps():
    """The outlier-repair pass (round-11 bounds, VERDICT r10 #1): it
    must be SKIPPED entirely when the pin's recorded core count differs
    from the run's (an 8-core run vs a 32-core pin flags the core
    deficit — 52/230 entries tripped in the r10 driver run), and capped
    at MAX_REPAIR_ENTRIES entries ordered worst-ratio-first."""
    import bench

    pin_doc = {
        "cpus": 32,
        "queries": {f"q{i}": 1.0 for i in range(20)},
    }
    timings = {f"q{i}": 1.0 for i in range(20)}
    # all at pin -> nothing flagged
    assert bench.repair_plan(timings, pin_doc, 32) == []
    # one 2x outlier -> flagged at matching cpus, NOT at a different count
    timings["q3"] = 2.0
    assert bench.repair_plan(timings, pin_doc, 32) == ["q3"]
    assert bench.repair_plan(timings, pin_doc, 8) == []
    # a pin without a recorded core count never authorizes repairs
    assert bench.repair_plan(timings, {"queries": pin_doc["queries"]}, 32) == []
    # mass-trip: every entry 2-4x -> capped at MAX_REPAIR_ENTRIES,
    # worst ratios first
    timings = {f"q{i}": 2.0 + 0.1 * i for i in range(20)}
    plan = bench.repair_plan(timings, pin_doc, 32)
    assert len(plan) == bench.MAX_REPAIR_ENTRIES
    assert plan[0] == "q19" and plan[-1] == "q12"
    # entries missing from the pin are never flagged
    assert "brand_new_entry" not in bench.repair_plan(
        {**timings, "brand_new_entry": 99.0}, pin_doc, 32)
    # the committed pin itself records its core count (the skip gate's
    # data dependency) and the budget constants are sane
    import json
    import os

    committed = json.load(open(
        os.path.join(os.path.dirname(bench.__file__), "BENCH_DETAIL.json")
    ))
    assert committed.get("cpus") == 32
    assert bench.MAX_REPAIR_ENTRIES <= 8 and bench.REPAIR_BUDGET_SEC <= 90.0


def test_stream_fuzz_late_drop_helpers():
    """The deterministic late-drop mode (VERDICT r9 #4) rests on two
    pure facts pinned here: the watermark cutoff is chosen OFF the
    window-end grid (so Spark's <=/< predicate conventions agree on the
    drop and eviction sets), and the fixed gate block 85000-85003
    round-robins all four sub-families via seed % 4."""
    from tools.stream_fuzz import _dropped_by_watermark, pick_watermark_cutoff

    # off-grid: no window end (multiples of grid, offset 0) equals W
    w = pick_watermark_cutoff(0, 10_000_000, 0.5, grid_ms=1_000)
    assert 0 < w < 10_000_000 and w % 1_000 != 0
    # sliding grid with offset: ends sit on {k*slide + size % slide}
    w = pick_watermark_cutoff(
        0, 10_000_000, 0.36, grid_ms=600_000, grid_offset_ms=300_000
    )
    assert (w - 300_000) % 600_000 != 0
    # frac=0.5 of an even span lands exactly on the offset grid and
    # must be nudged off it, staying inside the open interval
    w = pick_watermark_cutoff(0, 1_200_000, 0.5, grid_ms=600_000)
    assert w % 600_000 != 0 and 0 < w < 1_200_000
    # no grid: pure linear interpolation passthrough
    assert pick_watermark_cutoff(100, 1100, 0.25) == 350

    # gate block 85000-85003 covers tumbling(0)/sliding(1)/dedup(2)/
    # session(3)
    assert sorted(s % 4 for s in range(85000, 85004)) == [0, 1, 2, 3]

    # drop metric sums across every progress entry and every operator
    class _P:
        def __init__(self, j):
            self.json = j

    q = type("Q", (), {})()
    q.recentProgress = [
        {"stateOperators": [{"numRowsDroppedByWatermark": 3}]},
        _P('{"stateOperators": [{"numRowsDroppedByWatermark": 4},'
           ' {"other": 1}]}'),
        {"stateOperators": []},
    ]
    assert _dropped_by_watermark(q) == 7

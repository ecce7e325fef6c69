"""Streaming-vs-batch differential fuzzer: random windowed/stateful
parameterizations through the REAL streaming operators
(streaming/windows.py) on randomly re-bucketed micro-batch arrivals,
checked against the same operator's batch plan on the same rows.

The invariant under test: with a watermark wider than the data's time
span, the final streaming state must equal the batch result REGARDLESS
of how rows are split into micro-batches or in what time order they
arrive. Each seed draws:
- an operator case, chosen deterministically by seed % 4 so any block
  of 4 consecutive seeds covers all four families — tumbling counts
  (random window size), sliding rates (random window/slide), session
  aggregates (random gap), or dropDuplicatesWithinWatermark (random key
  subset, count-compare since which duplicate survives is explicitly
  unspecified);
- an input subset (event_id modulus);
- an arrival order: bucket count B in {2,3,5} and a bucket key
  (event_id -> time-interleaved batches, user_id -> key-clustered,
  ts-sorted -> in-order arrival), streamed with maxFilesPerTrigger=1.

This randomizes exactly the axis the fixed suites (test_streaming.py)
pin at single points: result invariance to micro-batch partitioning.
Watermark races with NARROW watermarks are deliberately out of scope
(late-drop is nondeterministic by design — test_stateful.py covers the
bounded-state contract); the full-span watermark makes every draw
deterministic.

A second mode (``--late``) makes the OTHER contract deterministic — the
narrow-watermark late-drop that the full-span sweep deliberately
excludes. Determinism is by construction, not by luck:
- the event subset is split into an ON-TIME file (which contains the
  global max timestamp) and a LATE file whose rows are all strictly
  below the watermark cutoff W = t_max - delay;
- the files arrive as THREE mtime-ordered micro-batches
  (maxFilesPerTrigger=1): on-time, then a one-row SPACER (a duplicate
  of a max-ts row), then the late file. The spacer batch is required
  by Spark's two-watermark semantics (SPARK-40925): a stateful
  operator filters late input with the PREVIOUS batch's watermark and
  evicts with the current one, so the late batch must start two
  batches after the max-ts data for its late-events watermark to be
  exactly W. The spacer is provably invisible in the output: every
  window containing t_max ends above W (never emitted), and for dedup
  its key was inserted in batch 0 with expiry t_max + delay > W;
- W is chosen OFF the window-end grid (pick_watermark_cutoff), so
  Spark's `<=` vs `<` watermark-predicate convention cannot matter.
The checks per seed: append-mode emitted rows == the batch plan over
the on-time rows filtered to window_end < W, AND the stream's
numRowsDroppedByWatermark equals the late row count for dedup / lies
in [distinct late groups, late pairs] for the agg families (the
metric counts rows reaching the STATEFUL operator, i.e. post
partial-aggregation, so the exact value depends on input-split
packing; the bounds do not).
Sub-family by seed % 4: tumbling agg / sliding agg / dedup-within-
watermark / session agg. Session windows are includable precisely
because the late-events drop happens BEFORE session merging: every
late row satisfies ts + gap < W so it is dropped at the stateful
operator's input and can never merge into (or bridge) an on-time
session; the spacer's session necessarily ends above W (>= t_max +
gap) and is withheld, so the batch expectation over on-time rows
filtered to session_end < W is closed-form. W is additionally nudged
off the data-dependent session-end set {on-time ts + gap}.

Usage: python tools/stream_fuzz.py [sf_dir] [n_seeds] [seed_base] [--late]
  defaults: /root/testdata/sf0.001, 10 seeds, base 140000
  (base 85000 recommended for --late gate blocks).
Exit 1 on any divergence.
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_FULL_SPAN = "3650 days"  # wider than any fixture's time span


def _canon(df, cols):
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


def _arrivals(spark, ev, rng: random.Random, root: str):
    """Write the events subset as micro-batch files in a seed-chosen
    arrival order; return the streaming DataFrame."""
    from pyspark.sql import functions as F

    b = rng.choice([2, 3, 5])
    order = rng.choice(["event_interleave", "key_cluster", "time_order"])
    if order == "event_interleave":
        out = ev.repartition(b, F.col("event_id") % b)
    elif order == "key_cluster":
        out = ev.repartition(b, F.col("user_id") % b)
    else:
        # range-partition on ts: each micro-batch file holds one
        # contiguous time slice (in-order-ish arrival)
        out = ev.repartitionByRange(b, "ts")
    out.write.mode("overwrite").parquet(root)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(root)
    )
    return stream, f"b={b} order={order}"


def _run(stream_df, name: str, mode: str = "complete"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    # stop the query before raising on timeout/exception: a still-running
    # orphan would have its source directory rmtree'd out from under it
    # by the caller's cleanup and pollute the rest of the sweep
    try:
        terminated = q.awaitTermination(300)
        if q.exception() is not None:
            raise q.exception()
        assert terminated, "stream did not finish within 300s"
    except BaseException:
        q.stop()
        raise
    return q


def tumbling_case(spark, ev, stream, rng):
    from shuttlestandalonedbcreator_spark.streaming import windows as W

    size = rng.choice(
        ["7 minutes", "30 minutes", "1 hour", "3 hours", "1 day"]
    )
    name = f"fz_tumbling_{rng.randrange(10**9)}"
    _run(W.tumbling_counts(stream, window_size=size, watermark=_FULL_SPAN), name)
    cols = ["window_start", "window_end", "n_events", "total_value"]
    got = _canon(spark.table(name), cols)
    exp = _canon(W.tumbling_counts(ev, window_size=size), cols)
    return got, exp, f"tumbling size={size}"


def sliding_case(spark, ev, stream, rng):
    from shuttlestandalonedbcreator_spark.streaming import windows as W

    size, slide = rng.choice(
        [("1 hour", "15 minutes"), ("2 hours", "30 minutes"),
         ("45 minutes", "10 minutes"), ("1 day", "6 hours"),
         ("30 minutes", "30 minutes")]
    )
    name = f"fz_sliding_{rng.randrange(10**9)}"
    _run(
        W.sliding_rates(stream, window_size=size, slide=slide,
                        watermark=_FULL_SPAN),
        name,
    )
    cols = ["window_start", "event_type", "n_events"]
    got = _canon(spark.table(name), cols)
    exp = _canon(W.sliding_rates(ev, window_size=size, slide=slide), cols)
    return got, exp, f"sliding size={size} slide={slide}"


def session_case(spark, ev, stream, rng):
    from shuttlestandalonedbcreator_spark.streaming import windows as W

    gap = rng.choice(
        ["5 minutes", "17 minutes", "30 minutes", "2 hours"]
    )
    name = f"fz_session_{rng.randrange(10**9)}"
    _run(W.session_aggregates(stream, gap=gap, watermark=_FULL_SPAN), name)
    cols = ["user_id", "session_start", "session_end", "n_events",
            "session_value"]
    got = _canon(spark.table(name), cols)
    exp = _canon(W.session_aggregates(ev, gap=gap), cols)
    return got, exp, f"session gap={gap}"


def dedup_case(spark, ev, stream, rng):
    from shuttlestandalonedbcreator_spark.streaming import windows as W

    keys = rng.choice(
        [["event_id"], ["user_id", "event_type"], ["event_type"],
         ["user_id"]]
    )
    name = f"fz_dedup_{rng.randrange(10**9)}"
    _run(
        W.streaming_dedup(stream, keys=keys, watermark=_FULL_SPAN),
        name,
        mode="append",
    )
    # which duplicate survives is unspecified — compare distinct-key
    # COUNTS (the operator's contract: exactly one row per key)
    got = [spark.table(name).count()]
    exp = [ev.dropDuplicates(keys).count()]
    return got, exp, f"dedup keys={keys}"


def pick_watermark_cutoff(
    tmin_ms: int, tmax_ms: int, frac: float,
    grid_ms: int | None = None, grid_offset_ms: int = 0,
) -> int:
    """Choose the watermark cutoff W strictly inside (tmin, tmax) such
    that no window end (values ≡ grid_offset mod grid) equals W exactly.

    Spark's stateful operators build their drop/evict predicates with an
    inclusive or exclusive comparison against the watermark depending on
    operator and version; keeping W off the window-end grid makes both
    conventions agree, so the expected emitted/dropped sets are unique.
    Pure — pinned by tests/test_streaming.py.
    """
    w = tmin_ms + int(frac * (tmax_ms - tmin_ms))
    if grid_ms:
        while (w - grid_offset_ms) % grid_ms == 0:
            w -= 1
    return w


def _dropped_by_watermark(q) -> int:
    """Total numRowsDroppedByWatermark across every progress event of a
    finished streaming query (the drop happens in the late micro-batch,
    not necessarily the last progress entry)."""
    import json as _json

    total = 0
    for p in q.recentProgress:
        d = p if isinstance(p, dict) else _json.loads(p.json)
        for op in d.get("stateOperators", []):
            total += int(op.get("numRowsDroppedByWatermark", 0))
    return total


def _ordered_stream(spark, dfs, root: str):
    """Write each DataFrame as exactly one parquet file whose mtimes
    force arrival in list order under maxFilesPerTrigger=1."""
    import glob as _glob

    src = os.path.join(root, "stream")
    os.makedirs(src)
    now = time.time()
    for i, df in enumerate(dfs):
        stage = os.path.join(root, f"_stage_{i}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        (part,) = _glob.glob(os.path.join(stage, "part-*.parquet"))
        dst = os.path.join(src, f"batch_{i}.parquet")
        shutil.copyfile(part, dst)
        os.utime(dst, (now - 600 + i * 100, now - 600 + i * 100))
    return (
        spark.readStream.schema(dfs[0].schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


_WINDOW_SIZES_MS = {
    "7 minutes": 7 * 60_000,
    "30 minutes": 30 * 60_000,
    "1 hour": 3_600_000,
    "3 hours": 3 * 3_600_000,
    "10 minutes": 10 * 60_000,
    "15 minutes": 15 * 60_000,
    "45 minutes": 45 * 60_000,
    "2 hours": 2 * 3_600_000,
}


def late_drop_seed(spark, events, seed: int):
    """One deterministic late-drop draw; returns (ok, label) and prints
    the divergence detail itself on failure."""
    from pyspark.sql import functions as F

    from shuttlestandalonedbcreator_spark.streaming import windows as W

    rng = random.Random(seed)
    mod = rng.choice([1, 1, 2, 3])
    rem = rng.randrange(mod) if mod > 1 else 0
    ev = events.filter(F.col("event_id") % mod == rem)
    tmin, tmax = ev.agg(
        F.min(F.unix_millis("ts")), F.max(F.unix_millis("ts"))
    ).first()
    frac = rng.uniform(0.30, 0.70)
    fam = seed % 4
    ms = F.unix_millis(F.col("ts"))
    sample_pct = int(rng.uniform(20, 90))
    in_sample = F.pmod(F.abs(F.hash(F.col("event_id"))), F.lit(100)) < sample_pct

    if fam == 0:  # tumbling aggregation
        size = rng.choice(["7 minutes", "30 minutes", "1 hour", "3 hours"])
        size_ms = _WINDOW_SIZES_MS[size]
        w_cut = pick_watermark_cutoff(tmin, tmax, frac, size_ms, 0)
        # every late row's (single) window must END below W:
        # window_end(ts) = (ts//S + 1)*S <= (W//S)*S < W  <=>  ts < (W//S)*S
        late_pred = (ms < (w_cut // size_ms) * size_ms) & in_sample
        label = f"late-tumbling size={size}"
    elif fam == 1:  # sliding aggregation
        size, slide = rng.choice(
            [("1 hour", "15 minutes"), ("45 minutes", "10 minutes"),
             ("2 hours", "30 minutes")]
        )
        size_ms, slide_ms = _WINDOW_SIZES_MS[size], _WINDOW_SIZES_MS[slide]
        # sliding window ends sit on {k*slide + size}: keep W off that grid
        w_cut = pick_watermark_cutoff(
            tmin, tmax, frac, slide_ms, size_ms % slide_ms
        )
        # a row's LATEST enclosing window ends <= ts + size, so ts < W - size
        # guarantees every exploded (row, window) pair ends below W
        late_pred = (ms < w_cut - size_ms) & in_sample
        label = f"late-sliding size={size} slide={slide}"
    elif fam == 2:  # dropDuplicatesWithinWatermark
        keys = rng.choice(
            [["event_id"], ["user_id", "event_type"], ["event_type"],
             ["user_id"]]
        )
        w_cut = pick_watermark_cutoff(tmin, tmax, frac)
        # dedup's event-time attribute is ts itself; a 60 s margin keeps
        # every late row strictly below W under either <=/< convention
        late_pred = (ms < w_cut - 60_000) & in_sample
        label = f"late-dedup keys={keys}"
    else:  # session aggregation
        gap = rng.choice(["5 minutes", "17 minutes", "30 minutes", "2 hours"])
        gap_ms = {"5 minutes": 5 * 60_000, "17 minutes": 17 * 60_000,
                  "30 minutes": 30 * 60_000, "2 hours": 2 * 3_600_000}[gap]
        w_cut = pick_watermark_cutoff(tmin, tmax, frac)
        # session ends are data-dependent ({row ts + gap} before merge,
        # {last session ts + gap} after): nudge W off the ms-aligned
        # candidates so no emitted/withheld decision sits on an equality
        while ev.filter(ms + gap_ms == w_cut).count() > 0:
            w_cut -= 1
        # a late row's pre-merge session window ends at ts + gap; the
        # 60 s margin keeps it strictly below W, so it is dropped BEFORE
        # merging and can never extend or bridge an on-time session
        late_pred = (ms + gap_ms < w_cut - 60_000) & in_sample
        label = f"late-session gap={gap}"

    delay_ms = tmax - w_cut
    wm = f"{delay_ms} milliseconds"
    late = ev.filter(late_pred)
    ontime = ev.filter(~late_pred)  # exact complement; keeps the t_max row
    late_n = late.count()
    if late_n == 0:
        print(f"ok seed={seed} {label}: degenerate (no late rows), skipped")
        return True, label
    label += f" mod={mod}/{rem} pct={sample_pct} late={late_n} delay={delay_ms}ms"
    # one-row spacer batch: duplicates a max-ts on-time row, whose
    # windows all end above W (and whose dedup state never expires
    # before W), so it advances the late-events watermark to exactly W
    # for the third batch without being able to appear in the output
    spacer = ev.filter(ms == tmax).limit(1)

    root = tempfile.mkdtemp(prefix="stream_latefuzz_")
    name = f"fz_late_{seed}_{rng.randrange(10**9)}"
    try:
        stream = _ordered_stream(spark, [ontime, spacer, late], root)
        if fam == 0:
            q = _run(
                W.tumbling_counts(stream, window_size=size, watermark=wm),
                name, mode="append",
            )
            cols = ["window_start", "window_end", "n_events", "total_value"]
            got = _canon(spark.table(name), cols)
            exp_df = W.tumbling_counts(ontime, window_size=size).filter(
                F.unix_millis(F.col("window_end")) < w_cut
            )
            exp = _canon(exp_df, cols)
            drop_lo = late.select(
                F.window(F.col("ts"), size)
            ).distinct().count()
            drop_hi = late_n
        elif fam == 1:
            q = _run(
                W.sliding_rates(stream, window_size=size, slide=slide,
                                watermark=wm),
                name, mode="append",
            )
            cols = ["window_start", "event_type", "n_events"]
            got = _canon(spark.table(name), cols)
            exp_df = W.sliding_rates(
                ontime, window_size=size, slide=slide
            ).filter(F.unix_millis(F.col("window_start")) + size_ms < w_cut)
            exp = _canon(exp_df, cols)
            # the stateful agg sees partially-aggregated (window,
            # event_type) groups; every exploded pair of a late row ends
            # below W, so between distinct-groups and all-pairs rows are
            # dropped depending on input-split packing
            drop_lo = late.select(
                F.window(F.col("ts"), size, slide), "event_type"
            ).distinct().count()
            drop_hi = late.select(F.window(F.col("ts"), size, slide)).count()
        elif fam == 2:
            q = _run(
                W.streaming_dedup(stream, keys=keys, watermark=wm),
                name, mode="append",
            )
            got = [spark.table(name).count()]
            exp = [ontime.dropDuplicates(keys).count()]
            # dedup has no partial aggregation: every late ROW reaches
            # the stateful operator and is dropped there
            drop_lo = drop_hi = late_n
        else:
            q = _run(
                W.session_aggregates(stream, gap=gap, watermark=wm),
                name, mode="append",
            )
            cols = ["user_id", "session_start", "session_end", "n_events",
                    "session_value"]
            got = _canon(spark.table(name), cols)
            # the end < W cut MUST happen python-side, after collect():
            # a plan-side .filter(session_end < W) gets pushed by
            # Catalyst below MergingSessions as a per-row ts + gap < W
            # scan predicate, which changes session merging itself (a
            # row whose solo window crosses W is removed BEFORE it can
            # merge into an earlier session, leaving a phantom shorter
            # session) — this fuzzer caught exactly that at sf0.1
            # seed 182003; see streaming/windows.py:session_aggregates
            rows = W.session_aggregates(ontime, gap=gap).select(
                *cols, F.unix_millis("session_end").alias("_end_ms")
            ).collect()
            exp = sorted(
                tuple(r[c] for c in cols)
                for r in rows
                if r["_end_ms"] < w_cut
            )
            # partial (per-partition) session merging may pre-combine
            # late rows before the stateful operator drops them: between
            # fully-merged late sessions and raw late rows are dropped
            drop_lo = W.session_aggregates(late, gap=gap).count()
            drop_hi = late_n
        dropped_got = _dropped_by_watermark(q)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    ok = got == exp and drop_lo <= dropped_got <= drop_hi
    if not ok:
        only_s = [r for r in got if r not in exp][:3]
        only_b = [r for r in exp if r not in got][:3]
        print(
            f"DIVERGE seed={seed} {label}: stream={len(got)} batch={len(exp)} "
            f"dropped={dropped_got} expected_dropped=[{drop_lo},{drop_hi}] "
            f"+stream={only_s} +batch={only_b}"
        )
    else:
        print(f"ok seed={seed} {label}: {len(got)} rows, "
              f"dropped={dropped_got} in [{drop_lo},{drop_hi}]")
    return ok, label


def main() -> int:
    from pyspark.sql import functions as F

    from shuttlestandalonedbcreator_spark.session import get_spark
    from shuttlestandalonedbcreator_spark.sources.registry import load_table

    late_mode = "--late" in sys.argv
    argv = [a for a in sys.argv if a != "--late"]
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.001"
    n_seeds = int(argv[2]) if len(argv) > 2 else 10
    base = int(argv[3]) if len(argv) > 3 else (85000 if late_mode else 140000)

    spark = get_spark(app_name="stream_fuzz")
    spark.sparkContext.setLogLevel("ERROR")
    events = load_table(spark, sf_dir, "events")

    failures = 0
    t0 = time.time()
    if late_mode:
        for seed in range(base, base + n_seeds):
            ok, _ = late_drop_seed(spark, events, seed)
            if not ok:
                failures += 1
        print(
            f"swept {n_seeds} late-drop seeds @ {sf_dir}: "
            f"{failures} divergences"
        )
        return 1 if failures else 0
    for seed in range(base, base + n_seeds):
        rng = random.Random(seed)
        mod = rng.choice([1, 1, 2, 3])
        rem = rng.randrange(mod) if mod > 1 else 0
        ev = events.filter(F.col("event_id") % mod == rem)
        root = tempfile.mkdtemp(prefix="stream_fuzz_")
        try:
            stream, arr = _arrivals(spark, ev, rng, root)
            # case family is seed-deterministic (seed % 4), NOT an RNG
            # draw: any 4 consecutive seeds — e.g. the release gate's
            # fixed block — round-robin all four operator families
            case = [tumbling_case, sliding_case, session_case,
                    dedup_case][seed % 4]
            got, exp, label = case(spark, ev, stream, rng)
            label = f"{label} {arr} mod={mod}/{rem}"
            if got != exp:
                failures += 1
                exp_set, got_set = set(exp), set(got)
                only_s = [r for r in got if r not in exp_set][:3]
                only_b = [r for r in exp if r not in got_set][:3]
                print(
                    f"DIVERGE seed={seed} {label}: stream={len(got)} "
                    f"batch={len(exp)} +stream={only_s} +batch={only_b}"
                )
            else:
                print(f"ok seed={seed} {label}: {len(got)} rows "
                      f"[{time.time() - t0:.0f}s]")
        finally:
            shutil.rmtree(root, ignore_errors=True)
    print(f"swept {n_seeds} stream seeds @ {sf_dir}: {failures} divergences")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

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

Usage: python tools/stream_fuzz.py [sf_dir] [n_seeds] [seed_base]
  defaults: /root/testdata/sf0.001, 10 seeds, base 140000.
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


def main() -> int:
    from pyspark.sql import functions as F

    from shuttlestandalonedbcreator_spark.session import get_spark
    from shuttlestandalonedbcreator_spark.sources.registry import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    base = int(sys.argv[3]) if len(sys.argv) > 3 else 140000

    spark = get_spark(app_name="stream_fuzz")
    spark.sparkContext.setLogLevel("ERROR")
    events = load_table(spark, sf_dir, "events")

    failures = 0
    t0 = time.time()
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

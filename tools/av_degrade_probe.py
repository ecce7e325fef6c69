"""Probe for the in-bench A/V timing degradation (NOTES r10 open item).

Observation: audio_fingerprint / video_keyframes run ~2-4x slower late
in a full 229-query bench session than in a fresh process, the slowdown
persists across same-process re-runs, and the checkpoint-accumulation
hypothesis was tested and rejected. This probe measures the target
entry's timing as a function of HOW MUCH of the catalog ran first, in
one fresh subprocess per data point, so the degradation curve (gradual
accumulation vs a single culprit prefix) is measurable.

    python tools/av_degrade_probe.py K [prefix_sf] [target] [target_sf] [n]

runs HEADLINE[:K] once each (noop write, bench's execution shape) at
prefix_sf (default sf0.001 — cheap; pass sf0.1 to replicate the bench
exactly), then times `target` (default video_keyframes) n times
(default 3) at target_sf (default sf0.1), and prints ONE JSON line with
the timings plus process diagnostics: JVM heap in use, persistent-RDD
count, the driver's RSS, and the count + total RSS of pyspark.daemon
worker processes (python worker reuse is on by default, so long-lived
workers accumulate whatever the prior catalog left behind).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _proc_rss_kb(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/status") as fh:
            for line in fh:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


def _pyspark_workers() -> tuple[int, int]:
    """(count, total RSS kB) of pyspark.daemon/worker python processes."""
    n = rss = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read().decode("utf-8", "replace")
        except OSError:
            continue
        if "pyspark.daemon" in cmd or "pyspark.worker" in cmd:
            n += 1
            rss += _proc_rss_kb(int(pid))
    return n, rss


def _diag(spark) -> dict:
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    workers, workers_rss = _pyspark_workers()
    d = {
        "jvm_heap_used_mb": round(
            (rt.totalMemory() - rt.freeMemory()) / 1e6
        ),
        "jvm_heap_total_mb": round(rt.totalMemory() / 1e6),
        "persistent_rdds": spark.sparkContext._jsc.getPersistentRDDs().size(),
        "driver_rss_mb": round(_proc_rss_kb(os.getpid()) / 1024),
        "py_workers": workers,
        "py_workers_rss_mb": round(workers_rss / 1024),
    }
    # JVM code cache (JIT-compiled methods): when a code heap fills, the
    # JIT disables compilation and hot loops fall back to the
    # interpreter — the canonical "long-running process slows down,
    # fresh process is fast" failure mode. 229 codegen-heavy queries x 2
    # runs compile a LOT of generated classes.
    mf = spark._jvm.java.lang.management.ManagementFactory
    for pool in mf.getMemoryPoolMXBeans():
        name = pool.getName()
        if "CodeHeap" in name or "Code Cache" in name:
            u = pool.getUsage()
            key = name.replace("CodeHeap '", "code_").replace(
                "'", "").replace(" ", "_").replace("-", "_").lower()
            d[f"{key}_used_mb"] = round(u.getUsed() / 1e6)
            d[f"{key}_max_mb"] = round(u.getMax() / 1e6)
        if "Metaspace" in name and "Compressed" not in name:
            u = pool.getUsage()
            d["metaspace_used_mb"] = round(u.getUsed() / 1e6)
    comp = mf.getCompilationMXBean()
    d["jit_total_compile_ms"] = (
        comp.getTotalCompilationTime() if comp is not None else None
    )
    return d


def main() -> int:
    from bench import HEADLINE

    from shuttlestandalonedbcreator_spark.queries import CATALOG
    from shuttlestandalonedbcreator_spark.session import get_spark

    bench_exact = "--bench-exact" in sys.argv
    argv = [a for a in sys.argv if a != "--bench-exact"]
    k = int(argv[1]) if len(argv) > 1 else 0
    prefix_sf = argv[2] if len(argv) > 2 else "/root/testdata/sf0.001"
    target = argv[3] if len(argv) > 3 else "video_keyframes"
    target_sf = argv[4] if len(argv) > 4 else "/root/testdata/sf0.1"
    n = int(argv[5]) if len(argv) > 5 else 3

    spark = get_spark(app_name="av_degrade_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    t0 = time.perf_counter()
    if bench_exact:
        # replicate bench.py's pre-loop exactly: row counts over every
        # table (warms page cache / parquet footers) and best-of-2 runs
        from shuttlestandalonedbcreator_spark.sources.registry import (
            TABLES, load_table,
        )

        for t in TABLES:
            load_table(spark, prefix_sf, t).count()
    runs = 2 if bench_exact else 1
    prefix = [name for name in HEADLINE[:k] if name != target]
    for name in prefix:
        for _ in range(runs):
            CATALOG[name].spark(spark, prefix_sf).write.format("noop").mode(
                "overwrite"
            ).save()
    prefix_s = round(time.perf_counter() - t0, 1)
    diag_before = _diag(spark)

    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        CATALOG[target].spark(spark, target_sf).write.format("noop").mode(
            "overwrite"
        ).save()
        times.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "k": k,
        "prefix_sf": prefix_sf,
        "prefix_s": prefix_s,
        "target": target,
        "target_sf": target_sf,
        "target_times": times,
        "diag_after_prefix": diag_before,
        "diag_after_target": _diag(spark),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

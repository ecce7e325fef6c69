"""Runtime-metrics report: execute catalog queries and print the FINAL
adaptive physical plan annotated with actual SQLMetrics — rows produced
per operator, shuffle bytes written, and spill (memory/disk) per node.

PLANS.md answers "is the plan shape right?" statically; this answers
"what did it actually DO?" — the measure-don't-guess loop for sizing
shuffle partitions and catching silent spills.

Usage: python tools/metrics_report.py [sf_dir] [query ...]
       (default: sf0.01, the 5 most recently added catalog queries)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_KEEP = (
    "numOutputRows",
    "shuffleBytesWritten",
    "spillSize",
    "memSpillSize",
    "diskSpillSize",
    "numFiles",
    "filesSize",
    "peakMemory",
)


def _scala_map(m) -> dict:
    out = {}
    it = m.iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return out


def _children(node):
    """Physical children, descending THROUGH adaptive/query-stage shells
    (AdaptiveSparkPlanExec and QueryStageExec hide the real tree behind
    accessor methods, not children())."""
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        return [node.executedPlan()]
    if name.endswith("QueryStage"):
        return [node.plan()]
    out = []
    it = node.children().iterator()
    while it.hasNext():
        out.append(it.next())
    return out


def walk(node, depth: int = 0, rows: list | None = None) -> list:
    rows = rows if rows is not None else []
    metrics = {k: v for k, v in _scala_map(node.metrics()).items() if k in _KEEP and v}
    rows.append((depth, node.nodeName(), metrics))
    for ch in _children(node):
        walk(ch, depth + 1, rows)
    return rows


def fmt_bytes(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if n < 1024:
            return f"{n:.0f}{unit}"
        n /= 1024
    return f"{n:.1f}TiB"


def report(spark, sf_dir: str, name: str) -> bool:
    """Print one query's annotated plan; returns True if any node spilled."""
    from shuttlestandalonedbcreator_spark.queries import CATALOG

    df = CATALOG[name].spark(spark, sf_dir)
    df.collect()  # metrics populate on execution of THIS DataFrame's plan
    spilled = False
    print(f"\n== {name} ==")
    for depth, node, metrics in walk(df._jdf.queryExecution().executedPlan()):
        parts = []
        if "numOutputRows" in metrics:
            parts.append(f"rows={metrics['numOutputRows']:,}")
        for k in ("shuffleBytesWritten", "filesSize", "peakMemory"):
            if k in metrics:
                parts.append(f"{k}={fmt_bytes(metrics[k])}")
        spill = sum(metrics.get(k, 0) for k in ("spillSize", "memSpillSize", "diskSpillSize"))
        if spill:
            parts.append(f"SPILL={fmt_bytes(spill)}")
            spilled = True
        print("  " * depth + node + ("  [" + " ".join(parts) + "]" if parts else ""))
    return spilled


def main() -> int:
    from shuttlestandalonedbcreator_spark.queries import CATALOG
    from shuttlestandalonedbcreator_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(CATALOG)[-5:]
    spark = get_spark()
    any_spill = False
    for name in names:
        any_spill |= report(spark, sf_dir, name)
    if any_spill:
        print("\nWARNING: spill detected — grow shuffle partitions or executor memory")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Measure the persisted-minhash-index crossover vs corpus size.

The r3 bench probe reported incremental near-dup SLOWER than a full
recompute at sf0.1 (5k docs) — per-batch fixed overhead dominates at toy
scale. The claim "the index wins on a growing corpus" needs a measured
crossover, so this experiment scales the corpus by replication
(deterministic per-replica word reordering keeps the replicas from being
near-dups of each other, so the pair graph stays realistic instead of
exploding quadratically across replicas) and times, at each size:

- ``incremental``: minhash-sign a FIXED-size new batch and bucket-join
  it against the persisted band index (cost should track the batch);
- ``full``: recompute all-pairs LSH over the whole corpus (cost tracks
  the corpus).

Usage:  python tools/incremental_crossover.py [sf_dir] [replicas...]
Writes one JSON line per corpus size; paste the table into SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from shuttlestandalonedbcreator_spark.operators import dedup as D  # noqa: E402
from shuttlestandalonedbcreator_spark.session import get_spark  # noqa: E402
from shuttlestandalonedbcreator_spark.sources.registry import load_table  # noqa: E402


def replicate(docs, replicas: int):
    """corpus × replicas with ids offset per replica and words
    deterministically reordered (sorted by xxhash64(word, replica)) so
    replicas share vocabulary but not shingles."""
    parts = [docs.select("doc_id", "text")]
    for r in range(1, replicas):
        shuffled = F.array_join(
            F.transform(
                F.array_sort(
                    F.transform(
                        F.split(F.col("text"), r"\s+"),
                        lambda w: F.struct(
                            F.xxhash64(w, F.lit(r)).alias("h"), w.alias("w")
                        ),
                    )
                ),
                lambda s: s["w"],
            ),
            " ",
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * (1 << 40))).alias("doc_id"),
                shuffled.alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = [int(x) for x in sys.argv[2:]] or [1, 4, 10]
    spark = get_spark(app_name="incremental_crossover")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, sf_dir, "documents")
    # fixed-size batch at every corpus size: 1% of the BASE table
    batch = base.filter(F.col("doc_id") % 100 == 0).select("doc_id", "text")

    for r in replicas:
        corpus = replicate(base, r).localCheckpoint(eager=True)
        n = corpus.count()
        idx_dir = tempfile.mkdtemp(prefix="crossover_idx_")
        try:
            t0 = time.perf_counter()
            D.minhash_index(corpus, "doc_id", "text").write.mode(
                "overwrite"
            ).partitionBy("band").parquet(idx_dir)
            build = round(time.perf_counter() - t0, 3)
            index = spark.read.parquet(idx_dir)
            incremental = timed(
                D.incremental_neardup_pairs(batch, index, "doc_id", "text")
            )
            full = timed(
                D.minhash_lsh_pairs(
                    corpus.unionByName(
                        batch.withColumn(
                            "doc_id", F.col("doc_id") + F.lit(99 << 40)
                        )
                    ),
                    "doc_id",
                    "text",
                    threshold=0.5,
                )
            )
            print(
                json.dumps(
                    {
                        "replicas": r,
                        "corpus_docs": n,
                        "index_build_sec": build,
                        "incremental_batch_sec": incremental,
                        "full_recompute_sec": full,
                        "incremental_speedup": round(
                            full / max(incremental, 1e-9), 2
                        ),
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(idx_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

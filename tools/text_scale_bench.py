"""Prefix-filter Jaccard (AllPairs) scale rehearsal: replicate the
documents table REP times (each replica with its own per-word tag, so
cross-replica shingle overlap is zero and the candidate count stays
output-bounded instead of exploding quadratically on identical copies)
and push the REAL pipeline — tokenize, 3-gram shingle + md5 hash,
global-df prefix ranking, prefix-posting self-join, exact
integer-cross-multiplied Jaccard verify — at 2*REP*|documents| docs.

Each (doc, replica) contributes one PLANTED near-dup pair: variant v=0
is the tagged doc, v=1 drops the last two words, so Jaccard =
(m-4)/(m-2) >= 0.6 exactly at the t=0.6 threshold for every doc with
m >= 7 words (and the pair is eligible once both sides have >= 5
distinct shingles, i.e. m >= 9). Planted mass therefore scales
LINEARLY in REP, and verified pairs split cleanly into planted
(id_a div 2 == id_b div 2) vs accidental (true near-dups inside the
base corpus, also linear in REP).

The 100 TB claims this measures (SCALING.md "Text near-dup family"):
- the shingle/fingerprint pass is a narrow map+agg whose wall time
  scales ~linearly in corpus size at fixed cores;
- prefix filtering keeps CANDIDATE pairs output-bounded — hot
  boilerplate shingles sort last by df and rarely enter any prefix —
  so candidates ~ true-pair mass, not corpus^2; the full posting-list
  comparison cardinality (sum df*(df-1)/2) is reported next to it as
  the cardinality the pruning avoided.

Usage: python tools/text_scale_bench.py [sf_dir] [rep ...]
  default sf_dir /root/testdata/sf0.1, reps 1 10 50.

Prints one JSON line per rep:
  {"mode": "prefix_jaccard", "rep": R, "docs": N, "synth_sec": ...,
   "shingle_sec": ..., "shingle_docs_per_sec": ..., "cand_sec": ...,
   "candidates": ..., "full_posting_pairs": ..., "verify_sec": ...,
   "pairs": ..., "planted_pairs": ..., "accidental_pairs": ...,
   "partitions": P}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_corpus(spark, sf_dir: str, rep: int):
    """(doc_id, text) at 2*rep*|documents| rows: per-replica word tags
    decorrelate replicas; v=1 drops the last two words (the planted
    near-dup, Jaccard (m-4)/(m-2) >= 0.6)."""
    from pyspark.sql import functions as F

    from shuttlestandalonedbcreator_spark.operators.util import fan_out
    from shuttlestandalonedbcreator_spark.queries import _t

    docs = fan_out(_t(spark, sf_dir, "documents"))
    words = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
    )
    # one generator per select (Spark allows a single explode each)
    reps = docs.select(
        "doc_id", "text",
        F.explode(F.sequence(F.lit(0), F.lit(rep - 1))).alias("r"),
    ).select(
        "doc_id", "r",
        F.transform(
            words,
            lambda w: F.concat(w, F.lit("x"), F.col("r").cast("string")),
        ).alias("w"),
    ).select(
        "doc_id", "r", "w",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("v"),
    )
    return reps.select(
        ((F.col("doc_id") * rep + F.col("r")) * 2 + F.col("v")).alias("doc_id"),
        F.array_join(
            # greatest(..., 0): a 0/1-word doc must yield an empty v=1
            # variant, not a negative slice length (runtime error)
            F.when(
                F.col("v") == 1,
                F.slice("w", 1, F.greatest(F.size("w") - 2, F.lit(0))),
            ).otherwise(F.col("w")),
            " ",
        ).alias("text"),
    )


def run_rep(spark, sf_dir: str, rep: int) -> dict:
    """The q_prefix_filter_jaccard pipeline (queries.py) generalized to
    a replicated corpus, stage-timed."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from shuttlestandalonedbcreator_spark.operators import dedup as D
    from shuttlestandalonedbcreator_spark.queries import PFJ_MIN_GRAMS

    t0 = time.time()
    corpus = build_corpus(spark, sf_dir, rep).localCheckpoint(eager=True)
    n_docs = corpus.count()
    synth_sec = time.time() - t0

    t0 = time.time()
    grams = (
        corpus.select(
            "doc_id", F.explode(D.word_ngrams(F.col("text"), 3)).alias("g")
        )
        .select(
            "doc_id",
            F.conv(F.substring(F.md5("g"), 1, 15), 16, 10)
            .cast("long")
            .alias("hh"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    grams.count()
    shingle_sec = time.time() - t0

    sz = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    df_tbl = grams.groupBy("hh").agg(F.count(F.lit(1)).alias("df"))
    # comparison cardinality the prefix pruning avoids: the full
    # posting-list join over eligible docs would expand sum df*(df-1)/2
    eligible = grams.join(sz.filter(F.col("n") >= PFJ_MIN_GRAMS), "doc_id")
    full_pairs = int(
        eligible.groupBy("hh")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.sum(F.expr("df * (df - 1) div 2")).alias("p"))
        .collect()[0]["p"]
        or 0
    )

    t0 = time.time()
    wrk = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("hh").asc())
    ranked = grams.join(df_tbl, "hh").withColumn("rk", F.row_number().over(wrk))
    pre = (
        ranked.join(sz, "doc_id")
        .filter(F.col("n") >= PFJ_MIN_GRAMS)
        .filter(
            F.col("rk") <= F.col("n") - F.expr("(3 * n + 4) div 5") + F.lit(1)
        )
        .select("doc_id", "hh")
    )
    plists = pre.groupBy("hh").agg(
        F.array_sort(F.collect_set("doc_id")).alias("ids")
    )
    cand = (
        plists.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("ids"),
                                i + F.lit(2),
                                F.size(F.col("ids")) - i - 1,
                            ),
                            lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_cand = cand.count()
    cand_sec = time.time() - t0

    t0 = time.time()
    sets = grams.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("hh")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    sa = sets.select(
        F.col("doc_id").alias("id_a"), F.col("s").alias("sa"),
        F.col("n").alias("na"),
    )
    sb = sets.select(
        F.col("doc_id").alias("id_b"), F.col("s").alias("sb"),
        F.col("n").alias("nb"),
    )
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "inter_cnt", F.size(F.array_intersect("sa", "sb")).cast("long")
        )
        .withColumn("union_cnt", F.col("na") + F.col("nb") - F.col("inter_cnt"))
        .filter(F.lit(5) * F.col("inter_cnt") >= F.lit(3) * F.col("union_cnt"))
        .select(
            "id_a", "id_b",
            (F.expr("id_a div 2") == F.expr("id_b div 2")).alias("planted"),
        )
        .localCheckpoint(eager=True)
    )
    n_pairs = verified.count()
    verify_sec = time.time() - t0
    n_planted = verified.filter("planted").count()

    row = {
        "mode": "prefix_jaccard",
        "rep": rep,
        "docs": n_docs,
        "synth_sec": round(synth_sec, 2),
        "shingle_sec": round(shingle_sec, 2),
        "shingle_docs_per_sec": round(n_docs / max(shingle_sec, 1e-9), 1),
        "cand_sec": round(cand_sec, 2),
        "candidates": n_cand,
        "full_posting_pairs": full_pairs,
        "verify_sec": round(verify_sec, 2),
        "pairs": n_pairs,
        "planted_pairs": n_planted,
        "accidental_pairs": n_pairs - n_planted,
        "partitions": grams.rdd.getNumPartitions(),
    }
    for df in (corpus, grams, cand, verified):
        df.unpersist()
    return row


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    reps = [int(a) for a in args[1:]] or [1, 10, 50]

    from shuttlestandalonedbcreator_spark.session import get_spark

    spark = get_spark(app_name="text_scale_bench")
    spark.sparkContext.setLogLevel("ERROR")
    # at rehearsal scale every join side here is either huge (grams,
    # sets, df table) or derived from one — none is a broadcastable
    # dimension at 100 TB, and on this box the 64 MB session threshold
    # made AQE build a broadcast while the checkpointed corpus filled
    # the 8 g driver's storage pool (rep-50 OOM at the broadcast build).
    # Sort-merge everywhere IS the at-scale plan; measure that.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # warm the python workers + codegen once so rep timings compare
    run_rep(spark, sf_dir, 1)
    for rep in reps:
        print(json.dumps(run_rep(spark, sf_dir, rep)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

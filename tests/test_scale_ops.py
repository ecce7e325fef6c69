"""Scale-path operators: salted aggregation equivalence, skew-safe top-k,
bucketed co-located joins (no shuffle), IVF ANN sanity."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from shuttlestandalonedbcreator_spark.operators import skew
from shuttlestandalonedbcreator_spark.operators.similarity import brute_force_topk, ivf_topk
from shuttlestandalonedbcreator_spark.plans import bucketing


@pytest.fixture(scope="module")
def skewed_df(spark):
    # one hot key with 10k rows, 50 cold keys
    hot = spark.range(10000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    cold = spark.range(500).select(
        F.concat(F.lit("c"), (F.col("id") % 50)).alias("k"), F.col("id").cast("double").alias("v")
    )
    return hot.unionByName(cold)


def test_salted_aggregate_equals_plain(spark, skewed_df):
    plain = {
        (r["k"]): (r["s"], r["n"], r["mx"])
        for r in skewed_df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["s"], r["n"], r["mx"])
        for r in skew.salted_aggregate(
            skewed_df, ["k"], {"s": ("v", "sum"), "n": ("v", "count"), "mx": ("v", "max")}
        ).collect()
    }
    assert plain == salted


def test_salted_aggregate_rejects_non_reaggregable(skewed_df):
    with pytest.raises(ValueError, match="re-aggregable"):
        skew.salted_aggregate(skewed_df, ["k"], {"a": ("v", "avg")})


def test_top_k_per_key_skew_safe(spark, skewed_df):
    want = {
        (r["k"], r["v"])
        for r in skewed_df.withColumn(
            "_r", F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("k").orderBy(F.desc("v"), F.asc("v"))
            )
        ).filter(F.col("_r") <= 3).select("k", "v").collect()
    }
    got = {
        (r["k"], r["v"])
        for r in skew.top_k_per_key_skew_safe(
            skewed_df, "k", F.desc("v"), k=3
        ).select("k", "v").collect()
    }
    # same multiset of (key, value) pairs up to ties on equal v
    assert {k for k, _ in got} == {k for k, _ in want}
    for k in {k for k, _ in want}:
        assert sorted([v for kk, v in got if kk == k], reverse=True) == sorted(
            [v for kk, v in want if kk == k], reverse=True
        )


def test_bucketed_join_no_shuffle(spark, sf_small):
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    bucketing.write_bucketed(orders, "orders_b", "o_orderkey", 8)
    bucketing.write_bucketed(lineitem, "lineitem_b", "l_orderkey", 8)
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the non-broadcast path: at scale neither side broadcasts —
        # bucketing is what removes the shuffle there
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketing.cobucket_join(
            spark, "lineitem_b", "orders_b", "l_orderkey", "o_orderkey"
        )
        assert bucketing.shuffle_count(joined) == 0  # co-located buckets
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        n = joined.count()
        plain = lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"]).count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_ivf_recall_against_exact(spark, sf_small):
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding")
    exact = brute_force_topk(emb, queries, "vec_id", "embedding", "vec_id", "embedding", k=5)
    approx = ivf_topk(
        emb, queries, "vec_id", "embedding", "vec_id", "embedding",
        k=5, n_centroids=8, n_probe=4,
    )
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx.collect():
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # probing half the cells must recover a solid share of true neighbors
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.6
    # the query vector itself lives in the probed home cell → always found
    for q in approx_sets:
        assert q in approx_sets[q]


def test_write_clustered_narrow_file_ranges(spark, sf_small, tmp_path):
    import glob

    import pyarrow.parquet as pq

    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    out = str(tmp_path / "clustered")
    bucketing.write_clustered(orders, out, ["o_custkey"], n_files=8)
    spans = []
    lo_g, hi_g = None, None
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = [md.schema.column(i).name for i in range(md.num_columns)].index("o_custkey")
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        spans.append(hi - lo)
        lo_g = lo if lo_g is None else min(lo_g, lo)
        hi_g = hi if hi_g is None else max(hi_g, hi)
    # every file covers a narrow slice of the global key range -> min/max
    # stats prune most files for a selective predicate
    global_span = hi_g - lo_g
    assert len(spans) >= 4
    assert max(spans) < global_span / 2
    assert sum(spans) < global_span * 1.5  # near-disjoint coverage


def test_zorder_value_interleaving(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 3)], "x int, y int")
    got = [
        r["z"]
        for r in df.select(
            bucketing.zorder_value([F.col("x"), F.col("y")], bits=4).alias("z")
        ).collect()
    ]
    # interleaved bits: z(x,y) = ... y1 x1 y0 x0
    assert got == [0, 1, 2, 15]


def test_approx_aggregates_accuracy(spark, sf_small):
    from shuttlestandalonedbcreator_spark.queries import q_approx_aggregates

    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.5)").alias("median"),
        )
        .collect()
    }
    approx = {r["l_returnflag"]: r for r in q_approx_aggregates(spark, sf_small).collect()}
    # percentile_approx moved out of the hashed entry (its shuffle-fetch
    # merge order is layout-sensitive — NOTES.md round 7); its accuracy
    # stays pinned here directly, plus the audit twin's median_band_ok
    med = {
        r["l_returnflag"]: r["m"]
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                F.col("l_extendedprice").cast("double"), F.lit(0.5), F.lit(1000)
            ).alias("m")
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for k, e in exact.items():
        a = approx[k]
        assert abs(a["approx_orders"] - e["orders"]) / e["orders"] < 0.05
        assert abs(a["approx_parts"] - e["parts"]) / e["parts"] < 0.05
        assert abs(med[k] - e["median"]) / e["median"] < 0.02


def test_lsh_topk_finds_duplicate_clusters(spark):
    from shuttlestandalonedbcreator_spark.operators.similarity import lsh_topk

    # three exact-duplicate pairs + fillers: identical vectors always share
    # the signature bucket, so each member must report its twin at rank 1
    # with cosine 1.0 (deterministic seeded hyperplanes)
    import random

    rng = random.Random(7)
    rows = []
    for pair in range(3):
        v = [rng.uniform(-1, 1) for _ in range(64)]
        rows.append((2 * pair, v))
        rows.append((2 * pair + 1, v))
    for i in range(6, 20):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(64)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    top = lsh_topk(df, "vec_id", "embedding", k=3, planes=8, dim=64)
    best = {r["query_id"]: r for r in top.collect() if r["rank"] == 1}
    for pair in range(3):
        a, b = 2 * pair, 2 * pair + 1
        assert best[a]["neighbor_id"] == b and best[a]["score"] == 1.0
        assert best[b]["neighbor_id"] == a and best[b]["score"] == 1.0


def test_incremental_neardup_matches_full_recompute(spark, sf_oracle, tmp_path):
    from shuttlestandalonedbcreator_spark.operators.dedup import (
        incremental_neardup_pairs,
        minhash_index,
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)

    # index survives a parquet round trip (the production shape: written
    # once per corpus, partitioned by band, read by every ingest batch)
    idx_path = str(tmp_path / "minhash_index")
    minhash_index(corpus, "doc_id", "text").write.partitionBy("band").parquet(idx_path)
    index = spark.read.parquet(idx_path)

    inc = {
        (r["new_id"], r["match_id"]): r["est_jaccard"]
        for r in incremental_neardup_pairs(batch, index, "doc_id", "text").collect()
    }

    full = minhash_lsh_pairs(docs, "doc_id", "text").collect()
    cross = {}
    for r in full:
        a_new, b_new = r["id_a"] % 5 == 0, r["id_b"] % 5 == 0
        if a_new != b_new:  # exactly one side in the new batch
            new_id = r["id_a"] if a_new else r["id_b"]
            match_id = r["id_b"] if a_new else r["id_a"]
            cross[(new_id, match_id)] = r["est_jaccard"]

    assert inc == cross and len(inc) > 0


def test_label_centroids_exact_means(spark):
    from shuttlestandalonedbcreator_spark.operators.similarity import label_centroids

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [3.0, 2.0], 0),
        (3, [0.0, 4.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r["centroid"] for r in label_centroids(df, "label", "embedding").collect()}
    assert out[0] == [2.0, 1.0]
    assert out[1] == [0.0, 4.0]


def test_compact_parquet_reduces_files_preserves_data(spark, sf_small, tmp_path):
    from shuttlestandalonedbcreator_spark.plans.maintenance import (
        compact_parquet,
        data_file_count,
    )
    from shuttlestandalonedbcreator_spark.sources.registry import load_table

    docs = load_table(spark, sf_small, "documents")
    tbl = str(tmp_path / "frag")
    docs.repartition(40).write.parquet(tbl)  # simulate incremental-append fragmentation
    assert data_file_count(tbl) == 40
    before = docs.agg(F.sum("doc_id"), F.count(F.lit(1))).collect()[0]

    got = compact_parquet(spark, tbl, target_file_mb=128)
    assert got == data_file_count(tbl) == 1  # tiny table → one file
    after = spark.read.parquet(tbl).agg(F.sum("doc_id"), F.count(F.lit(1))).collect()[0]
    assert tuple(before) == tuple(after)
    assert not os.path.exists(tbl + "._compact_staging")
    assert not os.path.exists(tbl + "._compact_old")


def test_matmul_topk_tolerates_zero_norm_vectors(spark):
    """A zero embedding normalizes to NaN scores; batch-local pruning must
    emit short (not misaligned) batches, the NaN row just never ranks."""
    from shuttlestandalonedbcreator_spark.operators.similarity import matmul_topk

    rows = [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.6, 0.8]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0).selectExpr(
        "vec_id as qid", "embedding as qv"
    )
    out = matmul_topk(df, q, "vec_id", "embedding", "qid", "qv", k=3).collect()
    got = [(r["neighbor_id"], r["rank"]) for r in out]
    # the zero vector (id 1) is excluded; the three finite rows rank
    assert got == [(0, 1), (2, 2), (3, 3)]


def test_compact_parquet_recovers_from_crash_states(spark, sf_small, tmp_path):
    """The two-rename swap has a crash window (ADVICE r1): between the
    renames the table lives at ._compact_old with nothing at `path`. A
    retry must restore it, and stale old/staging leftovers from either
    crash side must not make the next run fail."""
    import shutil

    from shuttlestandalonedbcreator_spark.plans.maintenance import compact_parquet
    from shuttlestandalonedbcreator_spark.sources.registry import load_table

    docs = load_table(spark, sf_small, "documents")
    tbl = str(tmp_path / "crashy")
    docs.repartition(8).write.parquet(tbl)
    expect = docs.agg(F.sum("doc_id"), F.count(F.lit(1))).collect()[0]

    # crash BETWEEN the renames: table is wholly at ._compact_old
    os.rename(tbl, tbl + "._compact_old")
    got = compact_parquet(spark, tbl, target_file_mb=128)
    assert got == 1
    after = spark.read.parquet(tbl).agg(F.sum("doc_id"), F.count(F.lit(1))).collect()[0]
    assert tuple(expect) == tuple(after)
    assert not os.path.exists(tbl + "._compact_old")

    # crash AFTER the swap but before cleanup: stale old + stale staging
    # next to a live table — both must be cleared, table kept
    shutil.copytree(tbl, tbl + "._compact_old")
    shutil.copytree(tbl, tbl + "._compact_staging")
    compact_parquet(spark, tbl, target_file_mb=128)
    after = spark.read.parquet(tbl).agg(F.sum("doc_id"), F.count(F.lit(1))).collect()[0]
    assert tuple(expect) == tuple(after)
    assert not os.path.exists(tbl + "._compact_old")
    assert not os.path.exists(tbl + "._compact_staging")


def test_compact_parquet_partitioned_keeps_pruning(spark, sf_small, tmp_path):
    from shuttlestandalonedbcreator_spark.plans.maintenance import compact_parquet
    from shuttlestandalonedbcreator_spark.sources.registry import load_table

    docs = load_table(spark, sf_small, "documents")
    tbl = str(tmp_path / "bylang")
    docs.repartition(10).write.partitionBy("lang").parquet(tbl)
    compact_parquet(spark, tbl, target_file_mb=128, partition_by=("lang",))
    back = spark.read.parquet(tbl)
    assert back.count() == docs.count()
    plan = (
        back.filter(F.col("lang") == "en")._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(lang" in plan


def test_matmul_topk_matches_brute_force(spark, sf_small):
    from shuttlestandalonedbcreator_spark.operators.similarity import (
        brute_force_topk,
        matmul_topk,
    )
    from shuttlestandalonedbcreator_spark.sources.registry import load_table

    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.limit(15).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    args = (emb, queries, "vec_id", "embedding", "qid", "qv")
    hof = brute_force_topk(*args, k=5)
    blas = matmul_topk(*args, k=5)

    def canon(df):
        return {
            (r["query_id"], r["rank"]): (r["neighbor_id"], r["score"])
            for r in df.collect()
        }
    a, b = canon(hof), canon(blas)
    assert a.keys() == b.keys()
    for key, (n_hof, s_hof) in a.items():
        n_blas, s_blas = b[key]
        assert abs(s_hof - s_blas) <= 2e-6  # same math, BLAS reassociation
        # identical neighbor unless two candidates genuinely tie on score
        assert n_hof == n_blas or abs(s_hof - s_blas) <= 2e-6
    # rank 1 must be the vector itself (cosine 1.0)
    for (qid, rank), (nid, score) in b.items():
        if rank == 1:
            assert nid == qid and score == 1.0


def test_aqe_splits_skewed_join_partition(spark):
    """The OTHER half of the skew story (salted_join is the explicit
    path): AQE's runtime skew-join handling must split a hot key's
    shuffle partition without any query rewrite. Thresholds are lowered
    to make a 95%-hot-key join skewed at test scale; the executed plan
    must show SortMergeJoin(skew=true) fed by a skewed AQEShuffleRead,
    and results stay identical to the unsplit join."""
    conf = spark.conf
    keys = (
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    old = {}
    for k in keys:
        try:
            old[k] = conf.get(k)
        except Exception:
            old[k] = None
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    # force a shuffle join (both static and adaptive broadcast off) so the
    # skew machinery, not a broadcast conversion, handles the hot key
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 100 < 95, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("payload_"), F.col("id").cast("string")).alias("p"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.col("id").alias("w")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 200_000  # every left row matches exactly once
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan, plan
        assert "AQEShuffleRead coalesced and skewed" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_hll_sketch_rollup_merges_losslessly(spark, sf_small):
    """Persisted-sketch rollup pattern (the incremental analytics shape
    at 100 TB: per-partition Datasketches HLL written once, merged at
    query time — never re-scanning history): the union of per-day user
    sketches must estimate the SAME value as one sketch over all rows,
    and land within 5% of the exact distinct count."""
    from shuttlestandalonedbcreator_spark.sources.registry import load_table

    ev = load_table(spark, sf_small, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    # per-day sketches — what a daily job would persist as BINARY
    daily = ev.groupBy(day).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged_est = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).first()["est"]
    direct_est = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).first()["est"]
    exact = ev.select("user_id").distinct().count()
    assert merged_est == direct_est  # merge is lossless for HLL
    assert abs(merged_est - exact) / exact < 0.05


def test_merge_upsert_applies_cdc_batch(spark, tmp_path):
    """Storage-level MERGE: updates replace matching keys (ties go to the
    arriving batch), inserts add, op='D' deletes, untouched keys pass
    through — and the result lands atomically via the two-rename swap."""
    from shuttlestandalonedbcreator_spark.plans.merge import merge_upsert

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10), (4, "d", 10)],
        "k long, v string, ver long",
    ).write.parquet(path)
    updates = spark.createDataFrame(
        [
            (2, "b2", 20, "U"),   # replace (newer version)
            (3, "stale", 5, "U"), # older version loses to base
            (5, "e", 20, "U"),    # insert
            (4, None, 20, "D"),   # delete
            (1, "a-tie", 10, "U"),# SAME version: update wins the tie
        ],
        "k long, v string, ver long, op string",
    )
    n = merge_upsert(spark, path, updates, keys=["k"], order_col="ver", op_col="op")
    got = {r["k"]: (r["v"], r["ver"]) for r in spark.read.parquet(path).collect()}
    assert n == 4
    assert got == {
        1: ("a-tie", 10),  # tie → update
        2: ("b2", 20),     # replaced
        3: ("c", 10),      # stale update rejected
        5: ("e", 20),      # inserted
    }                      # 4 deleted


def test_merge_upsert_recovers_from_crash_window(spark, tmp_path):
    """Crash between the two renames (table at ._merge_old, nothing at
    path) must auto-restore before applying the batch."""
    import os

    from shuttlestandalonedbcreator_spark.plans.merge import merge_upsert

    path = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "a", 1)], "k long, v string, ver long").write.parquet(path)
    os.rename(path, path + "._merge_old")  # simulate the crash window
    updates = spark.createDataFrame([(2, "b", 2, "U")], "k long, v string, ver long, op string")
    n = merge_upsert(spark, path, updates, keys=["k"], order_col="ver", op_col="op")
    assert n == 2
    assert {r["k"] for r in spark.read.parquet(path).collect()} == {1, 2}
    assert not os.path.exists(path + "._merge_old")


def test_cdc_feed_then_merge_reproduces_target(spark, sf_small, tmp_path):
    """The CDC story closes end-to-end: diffing two corpus versions into
    a change feed (insert/update/delete rows) and MERGE-applying that
    feed onto version 1 must reproduce version 2 EXACTLY — feed size is
    O(changes), the merge is one keyed shuffle."""
    from shuttlestandalonedbcreator_spark.operators.dedup import md5_long
    from shuttlestandalonedbcreator_spark.plans.merge import merge_upsert
    from shuttlestandalonedbcreator_spark.sources.registry import load_table

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    h = md5_long(F.col("doc_id"), seed=11) % 10
    v2 = (
        docs.filter(h != 0)
        .select(
            "doc_id",
            F.when(h <= 2, F.concat(F.col("text"), F.lit(" v2")))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(h == 9).select(
                (F.col("doc_id") + F.lit(1 << 40)).alias("doc_id"), "text"
            )
        )
    )

    path = str(tmp_path / "corpus_v1")
    docs.withColumn("ver", F.lit(1)).write.parquet(path)

    old_k = docs.select(F.col("doc_id").alias("k"), F.col("text").alias("_ot"))
    new_k = v2.select(F.col("doc_id").alias("k"), F.col("text").alias("_nt"))
    feed = (
        old_k.join(new_k, "k", "full_outer")
        .filter(F.col("_ot").isNull() | F.col("_nt").isNull() | (F.col("_ot") != F.col("_nt")))
        .select(
            F.col("k").alias("doc_id"),
            F.col("_nt").alias("text"),
            F.lit(2).alias("ver"),
            F.when(F.col("_nt").isNull(), F.lit("D")).otherwise(F.lit("U")).alias("op"),
        )
    )
    n_changes = feed.count()
    assert 0 < n_changes < docs.count()  # O(changes), not O(corpus)

    merge_upsert(spark, path, feed, keys=["doc_id"], order_col="ver", op_col="op")
    got = {(r["doc_id"], r["text"]) for r in spark.read.parquet(path).select("doc_id", "text").collect()}
    want = {(r["doc_id"], r["text"]) for r in v2.collect()}
    assert got == want


def _file_identity(root):
    """(relpath -> (inode, mtime_ns, size)) for every file under root."""
    import os

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_ino, st.st_mtime_ns, st.st_size)
    return out


def test_merge_upsert_partitioned_touches_only_affected_partitions(spark, tmp_path):
    """Partition-scoped MERGE: apply cost scales with the batch, not the
    table — partitions the batch doesn't touch keep byte-identical files
    (same inode, mtime, size), and the merged result equals a whole-table
    merge_upsert over the same data."""
    import os

    from shuttlestandalonedbcreator_spark.plans.merge import (
        merge_upsert,
        merge_upsert_partitioned,
        write_partitioned,
    )

    rows = [(k, f"v{k}", 10, k % 6) for k in range(600)]
    df = spark.createDataFrame(rows, "k long, v string, ver long, bucket long")
    part = str(tmp_path / "part_tbl")
    flat = str(tmp_path / "flat_tbl")
    write_partitioned(df, part, "bucket")
    df.write.parquet(flat)
    assert sorted(os.listdir(part)) == [f"bucket={b}" for b in range(6)]

    before = _file_identity(part)
    updates = spark.createDataFrame(
        [
            (1, "upd", 20, 1, "U"),        # replace in bucket 1
            (3, None, 20, 3, "D"),         # delete in bucket 3
            (9, "stale-del", 5, 3, "D"),   # stale delete: no-op
            (601, "new", 20, 1, "U"),      # insert into bucket 1
            (700, "newpart", 20, 10, "U"), # insert creating bucket 10
        ],
        "k long, v string, ver long, bucket long, op string",
    )
    merge_upsert_partitioned(
        spark, part, updates, keys=["k"], order_col="ver",
        partition_col="bucket", op_col="op",
    )
    merge_upsert(spark, flat, updates, keys=["k"], order_col="ver", op_col="op")

    after = _file_identity(part)
    untouched = {
        p: ident for p, ident in before.items()
        if p.split(os.sep)[0] in {"bucket=0", "bucket=2", "bucket=4", "bucket=5"}
    }
    for p, ident in untouched.items():
        assert after[p] == ident, f"untouched partition file changed: {p}"

    got = {
        (r["k"], r["v"], r["ver"], r["bucket"])
        for r in spark.read.parquet(*[os.path.join(part, d) for d in os.listdir(part)]).collect()
    }
    want = {
        (r["k"], r["v"], r["ver"], r["bucket"])
        for r in spark.read.parquet(flat).collect()
    }
    assert got == want
    assert os.path.isdir(os.path.join(part, "bucket=10"))


def test_merge_upsert_partitioned_crash_recovery_and_full_delete(spark, tmp_path):
    """A partition caught between its two renames is restored on the next
    call; stale batch-staging roots are cleared; a batch deleting every
    row of a partition removes its directory."""
    import os
    import shutil

    from shuttlestandalonedbcreator_spark.plans.merge import (
        merge_upsert_partitioned,
        write_partitioned,
    )

    df = spark.createDataFrame(
        [(1, "a", 1, 0), (2, "b", 1, 1)], "k long, v string, ver long, bucket long"
    )
    part = str(tmp_path / "tbl")
    write_partitioned(df, part, "bucket")

    # crash window: bucket=0 mid-swap, plus a stale batch staging root
    os.rename(os.path.join(part, "bucket=0"), os.path.join(part, "bucket=0._merge_old"))
    shutil.copytree(os.path.join(part, "bucket=1"), part + "._merge_batch_staging")

    updates = spark.createDataFrame(
        [(2, None, 2, 1, "D")], "k long, v string, ver long, bucket long, op string"
    )
    n = merge_upsert_partitioned(
        spark, part, updates, keys=["k"], order_col="ver",
        partition_col="bucket", op_col="op",
    )
    assert n == 0  # bucket=1 fully deleted
    assert os.path.isdir(os.path.join(part, "bucket=0"))  # recovered
    assert not os.path.isdir(os.path.join(part, "bucket=1"))
    assert not os.path.exists(part + "._merge_batch_staging")
    got = [r["k"] for r in spark.read.parquet(os.path.join(part, "bucket=0")).collect()]
    assert got == [1]


def test_merge_upsert_partitioned_rejects_unsafe_partition_values(spark, tmp_path):
    from shuttlestandalonedbcreator_spark.plans.merge import merge_upsert_partitioned

    updates = spark.createDataFrame(
        [(1, "x", 1, "a/b")], "k long, v string, ver long, bucket string"
    )
    with pytest.raises(ValueError, match="filesystem-safe"):
        merge_upsert_partitioned(
            spark, str(tmp_path / "t"), updates, keys=["k"],
            order_col="ver", partition_col="bucket",
        )


def test_schema_evolution_merge_schema_read(spark, tmp_path):
    """Schema drift across parquet batches (columns added over time —
    routine at 100 TB): mergeSchema reads the union schema with NULLs
    for pre-drift files, and the default read still works on the common
    prefix. Pins the operational contract so a drifted feed never needs
    a backfill rewrite just to stay readable."""
    p = str(tmp_path / "drift")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    ).write.mode("append").parquet(p)
    spark.createDataFrame(
        [(3, "c", 0.5), (4, "d", 0.7)], "k long, v string, score double"
    ).write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", True).parquet(p)
    assert set(merged.columns) == {"k", "v", "score"}
    rows = {r["k"]: r["score"] for r in merged.collect()}
    assert rows[1] is None and rows[3] == 0.5  # old files -> NULL column
    assert merged.count() == 4


def test_frequent_items_exact_matches_plain_groupby(spark):
    """Misra-Gries pre-pass heavy hitters must equal the exact
    formulation on a skewed stream: 3 hot items above N/k, a long tail
    below, one item sitting just UNDER the threshold (strict >)."""
    from shuttlestandalonedbcreator_spark.operators.heavy_hitters import (
        frequent_items_exact,
    )

    # N = 1000: hot items 300/250/200; borderline 100 with k=10
    # (threshold N/k = 100, strict > excludes it); tail of 150 singletons
    rows = (
        [("hot_a",)] * 300
        + [("hot_b",)] * 250
        + [("hot_c",)] * 200
        + [("edge",)] * 100
        + [(f"tail_{i}",) for i in range(150)]
    )
    df = spark.createDataFrame(rows, "item string").repartition(8)
    got = {
        r["item"]: (r["cnt"], r["n_total"])
        for r in frequent_items_exact(df, "item", k=10).collect()
    }
    assert got == {
        "hot_a": (300, 1000),
        "hot_b": (250, 1000),
        "hot_c": (200, 1000),
    }


def test_mg_candidates_bounded_and_superset(spark):
    """The candidate pass emits ≤ k·partitions items and always contains
    every true heavy hitter (no false negatives)."""
    from shuttlestandalonedbcreator_spark.operators.heavy_hitters import (
        _mg_candidates,
    )

    rows = [("big",)] * 500 + [(f"t{i % 40}",) for i in range(500)]
    df = spark.createDataFrame(rows, "item string").repartition(4)
    cands = [r["item"] for r in _mg_candidates(df, "item", k=5).collect()]
    assert len(cands) <= 5 * 4
    assert "big" in cands  # freq 500/1000 ≫ N/5


def test_write_zordered_files_cover_small_rectangles(spark, sf_small, tmp_path):
    """Z-ordered layout proof via parquet FOOTER stats: after
    write_zordered on (l_orderkey, l_partkey), each output file's
    min/max range must cover a small fraction of BOTH columns' global
    span (a hyper-rectangle), while a plain repartition write covers
    ~the full span in every file — i.e. min/max pruning works on either
    column. Also round-trips the rows unchanged."""
    import glob

    import pyarrow.parquet as pq

    from shuttlestandalonedbcreator_spark.sources.registry import load_table

    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    plain, zpath = str(tmp_path / "plain"), str(tmp_path / "z")
    li.repartition(8).write.parquet(plain)
    bucketing.write_zordered(li, zpath, ["l_orderkey", "l_partkey"], n_files=8)

    got = spark.read.parquet(zpath)
    assert got.count() == li.count()
    assert set(got.columns) == {"l_orderkey", "l_partkey", "l_quantity"}

    def avg_span_fraction(path, col):
        mins, maxs, spans = [], [], []
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.read_metadata(f)
            if md.num_row_groups == 0:
                # repartitionByRange samples its boundaries with an
                # RDD-id-derived seed, so an occasional EMPTY partition
                # (and its 0-row-group file) is suite-order dependent —
                # skip it, it covers no value range at all
                continue
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            ci = names.index(col)
            fmin = min(
                md.row_group(rg).column(ci).statistics.min
                for rg in range(md.num_row_groups)
            )
            fmax = max(
                md.row_group(rg).column(ci).statistics.max
                for rg in range(md.num_row_groups)
            )
            mins.append(fmin)
            maxs.append(fmax)
            spans.append(fmax - fmin)
        global_span = max(maxs) - min(mins)
        return sum(spans) / len(spans) / max(global_span, 1)

    for col in ("l_orderkey", "l_partkey"):
        z_frac = avg_span_fraction(zpath, col)
        plain_frac = avg_span_fraction(plain, col)
        assert plain_frac > 0.9, (col, plain_frac)  # no layout → no pruning
        # rectangles → pruning; threshold leaves headroom over the
        # repartitionByRange boundary-sampling variance (RDD-id seeded,
        # execution-order dependent: observed 0.60 in-suite vs ~0.5
        # isolated) while staying far below the >0.9 no-layout side
        assert z_frac < 0.7, (col, z_frac)
        assert z_frac < plain_frac / 1.5, (col, z_frac, plain_frac)


def test_frequent_items_exact_long_items(spark):
    """Item keys keep their own type through the MG pre-pass — long ids
    must come back as longs, not strings."""
    from shuttlestandalonedbcreator_spark.operators.heavy_hitters import (
        frequent_items_exact,
    )

    rows = [(7,)] * 60 + [(i + 100,) for i in range(40)]
    df = spark.createDataFrame(rows, "item long").repartition(4)
    got = {r["item"]: r["cnt"] for r in frequent_items_exact(df, "item", k=4).collect()}
    assert got == {7: 60}


def test_dynamic_partition_pruning_through_partitioned_layout(spark, sf_small, tmp_path):
    """Hive-layout fact + filtered dim join must plan DYNAMIC partition
    pruning: the fact scan's PartitionFilters carry a runtime
    dynamicpruning subquery fed by the dim's filter, so only the
    surviving event_type directories are read — at 100 TB the
    difference between scanning 1/5 of the table and all of it."""
    from shuttlestandalonedbcreator_spark.sources.registry import load_table

    fact_dir = str(tmp_path / "events_part")
    load_table(spark, sf_small, "events").write.partitionBy("event_type").parquet(
        fact_dir
    )
    fact = spark.read.parquet(fact_dir)
    dim = spark.createDataFrame(
        [("click", 1), ("view", 0), ("purchase", 0), ("signup", 0), ("error", 0)],
        "event_type string, monitored int",
    )
    joined = fact.join(dim.filter(F.col("monitored") == 1), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the result only covers the monitored partition
    total = load_table(spark, sf_small, "events")
    want = total.filter(F.col("event_type") == "click").count()
    assert joined.collect()[0]["n"] == want

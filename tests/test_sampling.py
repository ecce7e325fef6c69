"""Tests for deterministic sampling / splitting / sequence packing
(operators/sampling.py) and embedding-cosine near-dup (similarity.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shuttlestandalonedbcreator_spark.operators.sampling import (
    hash_split,
    pack_sequences,
    stratified_sample,
)
from shuttlestandalonedbcreator_spark.operators.similarity import cosine_neardup_pairs


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    from shuttlestandalonedbcreator_spark.sources.registry import load_table

    return load_table(spark, sf_small, "documents")


def test_hash_split_partition_properties(spark, docs):
    split = hash_split(docs, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)], seed=7)
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = docs.count()
    # exhaustive and disjoint: every row gets exactly one split
    assert sum(counts.values()) == total
    # fractions roughly honored (hash uniformity at n=500: generous margins)
    assert counts["train"] / total == pytest.approx(0.8, abs=0.08)
    assert counts["val"] / total == pytest.approx(0.1, abs=0.06)
    # deterministic: same seed → identical assignment; new seed → different
    again = hash_split(docs, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)], seed=7)
    assert split.select("doc_id", "split").exceptAll(again.select("doc_id", "split")).count() == 0
    reseeded = hash_split(docs, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)], seed=8)
    assert split.select("doc_id", "split").exceptAll(reseeded.select("doc_id", "split")).count() > 0


def test_hash_split_stable_under_growth(spark):
    # a row's split never changes when OTHER rows are added
    base = spark.range(0, 500).withColumnRenamed("id", "k")
    grown = spark.range(0, 5000).withColumnRenamed("id", "k")
    s1 = hash_split(base, "k", [("a", 0.5), ("b", 0.5)], seed=1).select("k", "split")
    s2 = hash_split(grown, "k", [("a", 0.5), ("b", 0.5)], seed=1).select("k", "split")
    assert s1.join(s2, "k").filter(s1["split"] != s2["split"]).count() == 0


def test_hash_split_validates_fractions(spark, docs):
    with pytest.raises(ValueError, match="fractions"):
        hash_split(docs, "doc_id", [("a", 0.9), ("b", 0.3)])


def test_stratified_sample_rates_and_determinism(spark, docs):
    sampled = stratified_sample(
        docs, "doc_id", "lang", fractions={"en": 0.2, "zh": 1.0}, default_fraction=0.5, seed=11
    )
    got = {r["lang"]: r["n"] for r in sampled.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got["zh"] == base["zh"]  # rate 1.0 keeps everything
    assert got["en"] / base["en"] == pytest.approx(0.2, abs=0.12)
    for lang in ("de", "fr", "es"):
        assert got[lang] / base[lang] == pytest.approx(0.5, abs=0.2)
    # sample is a strict, deterministic subset
    assert sampled.exceptAll(docs).count() == 0
    again = stratified_sample(
        docs, "doc_id", "lang", fractions={"en": 0.2, "zh": 1.0}, default_fraction=0.5, seed=11
    )
    assert sampled.exceptAll(again).count() == 0


def test_pack_sequences_layout_invariants(spark, docs):
    from shuttlestandalonedbcreator_spark.functions.text import token_count

    budget = 2048
    with_tokens = docs.select("doc_id", token_count(F.col("text")).alias("n_tok"))
    packed = pack_sequences(with_tokens, "doc_id", "n_tok", budget=budget, shards=4, seed=3)
    rows = packed.collect()
    assert len(rows) == docs.count()  # every document is placed
    for r in rows:
        assert 0 <= r["offset_in_chunk"] < budget
        assert r["chunk_id"] >= 0
    # per shard: documents tile the tape exactly — sorted by (chunk_id,
    # offset) the start offsets are the exclusive prefix sums of lengths
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: (r["chunk_id"], r["offset_in_chunk"]))
        pos = 0
        for r in shard_rows:
            assert r["chunk_id"] * budget + r["offset_in_chunk"] == pos
            pos += r["n_tokens"]


def test_cosine_neardup_lsh_recall(spark, sf_small):
    # the LSH scale path must recover the high-cosine pairs the exact
    # pass finds (identical vectors always share every bucket)
    from shuttlestandalonedbcreator_spark.sources.registry import load_table

    emb = load_table(spark, sf_small, "embeddings").limit(200)
    # plant 3 exact-duplicate pairs
    dups = emb.limit(3).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding", "label"
    )
    data = emb.unionByName(dups)
    exact = cosine_neardup_pairs(data, "vec_id", "embedding", threshold=0.999, exact=True)
    approx = cosine_neardup_pairs(data, "vec_id", "embedding", threshold=0.999, exact=False)
    exact_pairs = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    approx_pairs = {(r["id_a"], r["id_b"]) for r in approx.collect()}
    assert len(exact_pairs) >= 3
    # identical vectors share every LSH bucket → all planted pairs found
    planted = {p for p in exact_pairs if p[1] >= 10_000}
    assert planted and planted <= approx_pairs


def test_chunk_tokens_windows_and_edges(spark):
    from shuttlestandalonedbcreator_spark.operators.sampling import chunk_tokens

    rows = [
        (1, [f"t{i}" for i in range(10)]),  # spans 3 windows of (4, stride 3)
        (2, ["a", "b", "c"]),  # shorter than one window
        (3, []),  # empty → no chunks
        (4, [f"t{i}" for i in range(11)]),  # trailing short window
    ]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    out = chunk_tokens(df, "id", "toks", size=4, stride=3).collect()

    def chunks(i):
        return [r["chunk"] for r in sorted(out, key=lambda r: r["chunk_idx"]) if r["id"] == i]

    assert chunks(1) == [
        ["t0", "t1", "t2", "t3"],
        ["t3", "t4", "t5", "t6"],
        ["t6", "t7", "t8", "t9"],
    ]
    assert chunks(2) == [["a", "b", "c"]]
    assert chunks(3) == []
    # trailing window is short but present — every token appears somewhere
    assert chunks(4)[-1] == ["t9", "t10"]
    covered = {t for r in out if r["id"] == 4 for t in r["chunk"]}
    assert covered == {f"t{i}" for i in range(11)}
    # chunk_idx dense from 0 per doc
    idxs = sorted(r["chunk_idx"] for r in out if r["id"] == 1)
    assert idxs == [0, 1, 2]

    with pytest.raises(ValueError):
        chunk_tokens(df, "id", "toks", size=0, stride=3)


def test_mixture_rates_budget_and_upsampling(spark, sf_oracle):
    from shuttlestandalonedbcreator_spark.operators.sampling import mixture_rates
    from shuttlestandalonedbcreator_spark.sources.registry import load_table

    docs = load_table(spark, sf_oracle, "documents")
    total = docs.count()
    budget = 200
    rates = mixture_rates(docs, "source", budget_rows=budget).collect()
    assert {r["stratum"] for r in rates} == {
        r["source"] for r in docs.select("source").distinct().collect()
    }
    # expected kept total ≈ budget (integer floors + caps eat a little)
    expected = sum(r["n_rows"] * r["_thresh"] / 10_000 for r in rates)
    assert abs(expected - budget) / budget < 0.10
    # temperature α=0.5: keep rate is non-increasing in stratum size —
    # small sources are upsampled relative to proportional
    by_size = sorted(rates, key=lambda r: r["n_rows"])
    for a, b in zip(by_size, by_size[1:]):
        if a["n_rows"] < b["n_rows"]:
            assert a["_thresh"] >= b["_thresh"]
    # smallest stratum ≥ proportional ≥ largest stratum (equal only when
    # strata are equal-sized, as in this synthetic corpus); ~1% slack for
    # the integer floors in weight/threshold derivation
    prop_rate = budget / total * 10_000
    assert by_size[0]["_thresh"] >= prop_rate * 0.99
    assert by_size[-1]["_thresh"] <= prop_rate * 1.01

    # a skewed corpus must strictly upsample the small stratum
    skewed = docs.withColumn(
        "source", F.when(F.col("doc_id") % 10 == 0, "rare").otherwise("common")
    )
    sk = {
        r["stratum"]: r["_thresh"]
        for r in mixture_rates(skewed, "source", budget_rows=budget).collect()
    }
    assert sk["rare"] > sk["common"]


def test_mixture_rates_no_int64_overflow_at_scale(spark):
    """ADVICE r1: the single-division form `numer div (_w * _s)` overflows
    int64 once total rows ≈ 1e13 (the 100 TB design point), flipping
    thresholds negative and silently selecting nothing. The two-step form
    `(numer div _w) div _s` is algebraically identical for positive ints
    (floor(floor(a/b)/c) == floor(a/(bc))) and immune. Simulate the scale
    with a pre-aggregated counts frame pushed through the same expression."""
    from shuttlestandalonedbcreator_spark.operators.sampling import mixture_rates

    # strata totalling ~2e13 rows: _w ≈ floor(sqrt(n))*1000 ≈ 3.5e9;
    # _w*_s ≈ 5e19 > 2^63 would have gone negative under the old math.
    # 2e13 rows can't be materialized in a test, so replicate the exact
    # threshold expression over a pre-aggregated counts frame.
    counts_df = spark.createDataFrame(
        [("a", 12_500_000_000_000), ("b", 6_100_000_000_000), ("c", 81_000_000)],
        "source string, _precount long",
    )
    w = counts_df.select(
        F.col("source").alias("stratum"),
        F.col("_precount").alias("n_rows"),
        F.floor(F.sqrt(F.col("_precount")) * 1000).cast("long").alias("_w"),
    )
    denom = w.agg(F.sum("_w").alias("_s"))
    numer = 1_000_000 * 10_000 * 1000 * 1000  # budget 1e6, buckets 1e4, scale 1e3
    out = (
        w.crossJoin(F.broadcast(denom))
        .withColumn(
            "_thresh",
            F.least(F.lit(10_000).cast("long"), F.expr(f"({numer}L div _w) div _s")),
        )
        .collect()
    )
    # every threshold must equal the arbitrary-precision single-division
    # value floor(numer / (w*s)) — proving the two-step int64 form is the
    # exact same math, not an approximation, and nothing went negative
    import math

    strata_n = (12_500_000_000_000, 6_100_000_000_000, 81_000_000)
    s_total = sum(math.floor(math.sqrt(n) * 1000) for n in strata_n)
    for r in out:
        w_i = math.floor(math.sqrt(r["n_rows"]) * 1000)
        exact = min(10_000, numer // (w_i * s_total))
        assert r["_thresh"] == exact, (r, exact)
        assert r["_thresh"] >= 0, r
    # guard: the numerator bound is enforced
    import pytest

    with pytest.raises(ValueError, match="overflows int64"):
        mixture_rates(
            spark.range(1).withColumn("s", F.lit("x")),
            "s",
            budget_rows=10**12,
            weight_scale=100_000,
        )

"""Deduplication operators.

Reference parity:
- ``last_write_wins`` ≅ `INSERT OR REPLACE` on UNIQUE(file_name,
  target_file_id) — re-import keeps the LATEST row per key
  (SQLiteDirectImporter.java:306, 713; operator A1).

Scale extensions (training-data pipeline surface, BASELINE.json north star):
- ``exact_dedup``        — content-hash dedup (hash-groupBy, one shuffle).
- ``ngram_jaccard_pairs``— n-gram-set Jaccard near-dup pairs via an
  inverted-index join (explode→join on shingle→agree-count), never a
  cross join.
- ``minhash_lsh_pairs``  — MinHash signatures + LSH banding; candidate
  pairs only from shared buckets. The scale path for 100 TB: cost is
  O(docs × shingles) + a join keyed on (band, bucket-hash).
- ``simhash``            — 64-bit SimHash fingerprints per doc;
  near-dup = small Hamming distance, candidates from band equality.

All operators use deterministic, portable hashes built from md5 (same
result in any engine / any run), not JVM-specific hash functions, so
results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from shuttlestandalonedbcreator_spark.operators.util import fan_out


# ---------------------------------------------------------------------------
# portable deterministic hashing
# ---------------------------------------------------------------------------

def md5_long(col: Column, seed: int = 0) -> Column:
    """First 15 hex digits of md5(seed||value) as a non-negative long.

    15 hex digits = 60 bits < 2^63, so the conv() result is an exact
    non-negative long. Portable: identical in DuckDB via
    ``CAST(('0x' || substr(md5(...),1,15)) AS BIGINT)``-equivalent hacks.
    """
    payload = F.concat(F.lit(f"{seed}|"), col.cast("string"))
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# A1: keyed last-write-wins upsert
# ---------------------------------------------------------------------------

def last_write_wins(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Keep, per key tuple, the row with the greatest ``order_col``
    (ties broken arbitrarily-but-deterministically by all columns via the
    window's implicit ordering on order_col only — callers pass a unique
    sequence like an ingest counter, matching the reference's arrival
    order).

    One shuffle on the key columns; at scale this is the idiomatic
    replacement for SQLite's `INSERT OR REPLACE` and is equivalent to a
    Delta `MERGE WHEN MATCHED UPDATE`.
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.desc(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# exact content dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Exact-duplicate removal by content hash: keeps the smallest id per
    distinct content. Single hash-aggregate shuffle keyed on a 128-bit
    digest (collision-safe at 100 TB scales); the winner row is recovered
    by a self-semi-join on (hash, id) — still one shuffle stage thanks to
    AQE reuse, and never a driver collect."""
    hashed = df.withColumn("_h", F.md5(F.col(content_col).cast("string")))
    winners = hashed.groupBy("_h").agg(F.min(F.col(id_col)).alias(id_col))
    return (
        hashed.join(winners, ["_h", id_col], "left_semi")
        .drop("_h")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (inverted index join)
# ---------------------------------------------------------------------------

def tokens(col: Column) -> Column:
    """Lowercased word tokens (non-empty)."""
    return F.filter(F.split(F.lower(col), r"[^a-z0-9]+"), lambda t: t != "")


def word_ngrams(col: Column, n: int) -> Column:
    """Distinct word n-grams (joined with single spaces) of a text column.

    Built entirely from higher-order functions (JVM-side): for n==1 this is
    the distinct token set; for n>1, transform over a sequence of start
    offsets, slicing the token array.
    """
    if n == 1:
        return F.array_distinct(tokens(col))

    # let-bind the token array (one tokenizer eval per row, not per gram —
    # no CSE across lambda boundaries, see word_ngram_hashes)
    def grams_of(t: Column) -> Column:
        counts = F.size(t) - F.lit(n - 1)
        # sequence(1, 0) would produce a DESCENDING [1, 0] — guard explicitly
        return F.when(counts >= 1, F.transform(
            F.sequence(F.lit(1), counts),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        )).otherwise(F.array().cast("array<string>"))

    bound = F.flatten(F.transform(F.array(tokens(col)), grams_of))
    return F.array_distinct(bound)


def word_ngram_hashes(col: Column, n: int) -> Column:
    """Distinct 64-bit hashes of word n-grams — `xxhash64` over the n
    token columns directly, so NO gram strings are ever materialized
    (measured ~3× the string-gram path at n=5). Use wherever the gram is
    only a join/count key computed on the Spark side of a query; the
    oracle re-derives the same counts from text grams, so results agree
    absent 64-bit collisions (~m²/2⁶⁵ — the same risk class as any
    hash-keyed shuffle). NOT for minhash signatures, which the oracle
    must replay hash-for-hash (md5 family there).

    The token array is LET-BOUND through a single-element-array HOF so it
    evaluates once per row — referencing ``tokens(col)`` directly inside
    the per-gram lambda re-evaluates the tokenizer per element reference
    (measured ~10× slower; no CSE across lambda boundaries).
    """
    def grams_of(t: Column) -> Column:
        counts = F.size(t) - F.lit(n - 1)
        # sequence(1, 0) would produce a DESCENDING [1, 0] — guard explicitly
        return F.when(counts >= 1, F.transform(
            F.sequence(F.lit(1), counts),
            lambda i: F.xxhash64(*[F.element_at(t, i + j) for j in range(n)]),
        )).otherwise(F.array().cast("array<bigint>"))

    bound = F.flatten(F.transform(F.array(tokens(col)), grams_of))
    return F.array_distinct(bound)


def _ngram_pair_intersections(
    df: DataFrame, id_col: str, text_col: str, n: int,
    jaccard_floor: float | None = None,
) -> DataFrame:
    """Shared inverted-index core for the exact set-overlap detectors:
    (id_a, id_b, _inter, _sza, _szb) for every doc pair sharing at least
    one n-gram, id_a < id_b. One shuffle of the index instead of a
    two-sided self-join; shingles unique to one doc produce no pairs.

    ``jaccard_floor``: when the caller will drop pairs below a Jaccard
    threshold t, pass t here to prune size-incompatible pairs INSIDE the
    posting-list expansion, before the pair exchange (guide §2.3 —
    shuffle fewer bytes). Lossless: with a = min(|A|,|B|), b = max, the
    maximum achievable Jaccard is a/(|A|+|B|-a) = a/b (at inter = a),
    and double division is weakly monotone in the integer inter, so the
    prune uses the EXACT expression the final filter evaluates at
    inter = a — no pair that could pass the threshold is dropped
    (measured: 24 % / 63 % of pair occurrences pruned pre-exchange at
    t = 0.5 / 0.8, sf0.1). Leave None for floor-free consumers
    (containment, audits)."""
    shingled = fan_out(df).select(
        F.col(id_col).alias("_id"),
        word_ngram_hashes(F.col(text_col), n).alias("_grams"),
    )
    # 8-byte join keys hashed straight from the token columns (no gram
    # strings ever built — see word_ngram_hashes); the doc's shingle-set
    # size rides along so the final Jaccard needs NO join back — the whole
    # operator is one linear pipeline, shingling runs exactly once
    inv = shingled.select(
        F.col("_id"),
        F.size("_grams").alias("_sz"),
        F.explode("_grams").alias("_g"),
    )
    # posting list per shingle; singleton lists contribute nothing
    postings = (
        inv.groupBy("_g")
        .agg(F.array_sort(F.collect_list(F.struct("_id", "_sz"))).alias("_ids"))
        .filter(F.size("_ids") >= 2)
    )
    inner = (
        "transform(slice(_ids, i + 2, size(_ids)), "
        "y -> struct(x._id AS a, x._sz AS sza, y._id AS b, y._sz AS szb))"
    )
    if jaccard_floor is not None:
        inner = (
            f"filter({inner}, p -> "
            "CAST(least(p.sza, p.szb) AS DOUBLE) / "
            f"CAST(greatest(p.sza, p.szb) AS DOUBLE) >= {jaccard_floor!r})"
        )
    pairs = postings.select(
        F.explode(
            F.expr(f"flatten(transform(_ids, (x, i) -> {inner}))")
        ).alias("_p")
    )
    return pairs.groupBy(F.col("_p.a").alias("id_a"), F.col("_p.b").alias("id_b")).agg(
        F.count(F.lit(1)).alias("_inter"),
        F.first("_p.sza").alias("_sza"),
        F.first("_p.szb").alias("_szb"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All unordered doc pairs with n-gram-set Jaccard >= threshold.

    Plan shape (scale-safe, exact): build an inverted index keyed on a
    64-bit shingle hash (8-byte shuffle keys, not 30-byte strings), group
    into posting lists, and expand pairs WITHIN each posting list — one
    shuffle of the index instead of a two-sided self-join, and shingles
    unique to one doc (the vast majority in real corpora) produce no pairs
    at all. Intersection = pair count across shingles; Jaccard =
    inter/(|A|+|B|-inter). A hot shingle (stop-phrase) still expands
    quadratically — that is inherent to exact Jaccard; use minhash_lsh for
    the sub-quadratic approximate path. Returns (id_a, id_b, jaccard),
    id_a < id_b.
    """
    inter = _ngram_pair_intersections(
        df, id_col, text_col, n, jaccard_floor=threshold
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("_inter").cast("double")
            / (F.col("_sza") + F.col("_szb") - F.col("_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Asymmetric near-dup: doc pairs where the SMALLER n-gram set is
    mostly contained in the larger — containment = |A∩B| / min(|A|,|B|).

    Jaccard misses quote/excerpt relationships (a 100-gram doc fully
    inside a 10,000-gram doc has Jaccard ≈ 0.01 but containment 1.0);
    this is the detector for "document X is substantially a subset of
    document Y" in training-data curation. Same single-shuffle inverted-
    index core as ngram_jaccard_pairs. Returns (contained_id,
    container_id, containment); on equal set sizes the lower id is
    reported as contained (deterministic).
    """
    inter = _ngram_pair_intersections(df, id_col, text_col, n)
    small_first = F.col("_sza") <= F.col("_szb")  # tie → a (lower id)
    return (
        inter.withColumn(
            "containment",
            F.col("_inter").cast("double")
            / F.least("_sza", "_szb").cast("double"),
        )
        .filter(F.col("containment") >= threshold)
        .select(
            F.when(small_first, F.col("id_a")).otherwise(F.col("id_b")).alias("contained_id"),
            F.when(small_first, F.col("id_b")).otherwise(F.col("id_a")).alias("container_id"),
            "containment",
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

# Modulus for the derived-hash family: (h1 + seed*h2) mod MINHASH_PRIME.
# Chosen so seed*h2 stays far below 2^63 (no overflow in any engine).
MINHASH_PRIME = 1_000_000_007


def minhash_signature(df: DataFrame, id_col: str, text_col: str, n: int, num_hashes: int) -> DataFrame:
    """Per doc: array of ``num_hashes`` minhash values over word n-grams.

    Hash family: ONE portable md5 per shingle yields two 60-bit values
    (hex digits 1-15 and 16-30); permutation i is (h1 + i*h2) mod p — the
    standard 2-universal derived family, so the expensive digest runs once
    per shingle, not ``num_hashes`` times. One explode + one groupBy(doc)
    with ``min`` aggregates; map-side partial aggregation keeps the
    shuffle at O(docs × num_hashes)."""
    p = F.lit(MINHASH_PRIME)
    digest = F.md5(F.col("_g"))
    h1 = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long") % p
    h2 = F.conv(F.substring(digest, 16, 15), 16, 10).cast("long") % p
    inv = fan_out(df).select(
        F.col(id_col).alias("_id"), F.explode(word_ngrams(F.col(text_col), n)).alias("_g")
    ).select("_id", h1.alias("_h1"), h2.alias("_h2"))
    aggs = [
        F.min((F.col("_h1") + F.lit(seed) * F.col("_h2")) % p).alias(f"_mh{seed}")
        for seed in range(num_hashes)
    ]
    sig = inv.groupBy("_id").agg(*aggs)
    return sig.select(
        "_id", F.array(*[F.col(f"_mh{s}") for s in range(num_hashes)]).alias("_sig")
    )


def _banded(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """Expand a (_id, _sig) signature frame into one row per LSH band:
    (_id, _sig, _band, _bucket) where _bucket = md5 of the band's slice."""
    rows_per_band = num_hashes // bands
    return sig.select(
        "_id",
        "_sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.md5(
                        F.array_join(
                            F.transform(
                                F.slice(F.col("_sig"), bi * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("_bb"),
    ).select("_id", "_sig", F.col("_bb.band").alias("_band"), F.col("_bb.bucket").alias("_bucket"))


def minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Persistable near-dup index for INCREMENTAL dedup: one row per
    (doc, band) with the doc's full signature and the band's bucket hash.

    Write this once per corpus (partitioned by `band`, optionally bucketed
    by `bucket`) and each new ingest batch only joins against it — the
    corpus is never re-shingled and never re-compared against itself.
    Columns: (id, sig, band, bucket)."""
    sig = minhash_signature(df, id_col, text_col, n, num_hashes)
    return _banded(sig, num_hashes, bands).select(
        F.col("_id").alias("id"),
        F.col("_sig").alias("sig"),
        F.col("_band").alias("band"),
        F.col("_bucket").alias("bucket"),
    )


def incremental_neardup_pairs(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs of a NEW batch against an existing ``minhash_index``
    (same n/num_hashes/bands as at index build time — the signatures are
    deterministic, so incremental results equal what a full recompute
    would say about new×corpus pairs).

    Scale: cost is O(batch × shingles) to sign the batch plus a join keyed
    on (band, bucket) against the index — the corpus signature store is
    scanned, never recomputed, and with the index partitioned by band the
    scan prunes to matching partitions. Returns (new_id, match_id,
    est_jaccard); new-batch-internal duplicates come from running plain
    ``minhash_lsh_pairs`` on the (small) batch."""
    new_banded = _banded(
        minhash_signature(new_docs, id_col, text_col, n, num_hashes), num_hashes, bands
    )
    cand = (
        new_banded.alias("a")
        .join(
            index.alias("b"),
            (F.col("a._band") == F.col("b.band")) & (F.col("a._bucket") == F.col("b.bucket")),
        )
        .select(
            F.col("a._id").alias("new_id"),
            F.col("b.id").alias("match_id"),
            F.col("a._sig").alias("_siga"),
            F.col("b.sig").alias("_sigb"),
        )
        .dropDuplicates(["new_id", "match_id"])
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("_siga"), F.col("_sigb"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return (
        cand.withColumn("est_jaccard", F.round(agree.cast("double") / F.lit(num_hashes), 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("new_id", "match_id", "est_jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup candidate pairs via LSH banding, verified by estimated
    Jaccard (fraction of agreeing minhashes) >= threshold.

    Scale path: docs never meet unless a whole band of minhashes collides,
    so the join is keyed on (band_index, band_hash) — output-bounded, no
    quadratic blowup. rows=(id_a, id_b, est_jaccard)."""
    sig = minhash_signature(df, id_col, text_col, n, num_hashes).cache()
    banded = _banded(sig, num_hashes, bands)

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sig").alias("_siga"),
            F.col("b._sig").alias("_sigb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("_siga"), F.col("_sigb"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return (
        cand.withColumn("est_jaccard", F.round(agree.cast("double") / F.lit(num_hashes), 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """60-bit SimHash per document over its distinct token set.

    Entirely a NARROW map — no explode, no shuffle: the distinct-token
    hash array is materialized once per row, then ONE aggregate pass
    accumulates all per-bit vote counters (an nbits-wide array updated
    per token hash); a final zip sets bit i where the vote
    ``2*count_set - n_tokens`` is positive. The single-pass accumulator
    keeps the expression tree small — a per-bit filter formulation is
    ~7× slower end-to-end because Catalyst spends seconds planning the
    60-branch tree. At any scale this is scan-parallel with zero network
    traffic."""
    nbits = min(bits, 60)
    hashed = fan_out(df).select(
        F.col(id_col).alias("_id"),
        F.transform(F.array_distinct(tokens(F.col(text_col))), lambda t: md5_long(t)).alias("_hs"),
    )
    fingerprint = F.expr(
        f"""
        aggregate(
          zip_with(
            aggregate(_hs, array_repeat(0L, {nbits}),
                      (acc, h) -> zip_with(acc, sequence(0, {nbits - 1}),
                                           (c, i) -> c + ((h >> i) & 1))),
            sequence(0, {nbits - 1}),
            (c, i) -> IF(2 * c - size(_hs) > 0, shiftleft(1L, i), 0L)),
          0L, (a, v) -> a + v)
        """
    )
    return hashed.select(F.col("_id").alias(id_col), fingerprint.alias("simhash"))


def hamming64(x: Column, y: Column) -> Column:
    """Hamming distance between two long fingerprints (bit_count of xor)."""
    return F.bit_count(x.bitwiseXOR(y))

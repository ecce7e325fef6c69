"""Vector similarity search over an embedding column (array<float>).

Extension surface (BASELINE.json north star): the reference has no vector
ops; these are designed for the 100 TB profile from the start.

- ``brute_force_topk``   — exact cosine top-k for a query set: broadcast
  the (small) query side, per-partition score + global TakeOrdered. The
  correctness baseline.
- ``all_pairs_topk``     — per-vector k nearest neighbours among the
  table itself (symmetric), windowed rank after a blocked join.
- ``lsh_topk``           — random-hyperplane (sign-LSH) bucketed
  approximate top-k: vectors only meet inside a bucket, making the join
  output-bounded; the scale path. Hyperplanes are deterministic
  (seeded md5 → ±1 components) so results are reproducible.

All vector math is `F.zip_with` + `F.aggregate` (JVM higher-order
functions) over double-cast arrays — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from shuttlestandalonedbcreator_spark.operators.dedup import md5_long


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    The query side is broadcast (small dimension table); scoring is a
    narrow map over the base vectors; ranking is a window per query id —
    shuffle keyed on query_id, k rows per query out.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("_qv")
        )
    )
    scored = vectors.crossJoin(q).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col("_qv")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "score", F.col("_rk").alias("rank"))
    )


def lsh_topk(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate per-vector top-k via sign-LSH bucketing.

    Each vector gets a `planes`-bit signature (sign of dot with seeded ±1
    hyperplanes); candidates are pairs sharing the full signature bucket.
    Join is keyed on the bucket — output-bounded, no quadratic pass; recall
    is tunable with fewer planes / multiple tables. Deterministic seeds.
    """
    # hyperplane component h[p][d] ∈ {-1,+1} from md5(p|d) parity
    def plane_component(p: int, d: Column) -> Column:
        return F.when(md5_long(d.cast("string"), seed=1000 + p) % 2 == 0, F.lit(1.0)).otherwise(
            F.lit(-1.0)
        )

    sig_bits = []
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), lambda d: plane_component(p, d)),
                lambda x, h: x.cast("double") * h,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig_bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))

    tagged = vectors.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), F.concat(*sig_bits).alias("_bucket")
    )
    a, b = tagged.alias("a"), tagged.alias("b")
    cand = a.join(
        b,
        (F.col("a._bucket") == F.col("b._bucket")) & (F.col("a._id") != F.col("b._id")),
    ).select(
        F.col("a._id").alias("query_id"),
        F.col("b._id").alias("neighbor_id"),
        F.round(cosine(F.col("a._v"), F.col("b._v")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "score", F.col("_rk").alias("rank"))
    )

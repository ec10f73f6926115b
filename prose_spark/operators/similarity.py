"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: native F.aggregate/F.zip_with dot products —
  exact baseline, O(Q x N) but fully codegen'd and shuffle-free except the
  final top-k window;
- LSH-bucketed approximate variant (random hyperplane signatures computed
  natively from deterministic per-dimension weights): the scale path —
  candidates only join within matching signature buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    -> (query_id, neighbor_id, cosine, rank). The corpus side should be
    the big one; queries are broadcast when small.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _signature(vec_col: str, dim: int, n_planes: int):
    """Random-hyperplane signature bits from deterministic pseudo-random
    plane weights: w[p][i] derived from a hash of (p, i), mapped to ±1.
    Computed natively — no UDF, no stored plane matrix."""
    bits = []
    for p in range(n_planes):
        # ±1 weights via xxhash64 parity of (plane, index)
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda v, i: F.when(
                    F.xxhash64(F.concat(F.lit(f"p{p}:"), i.cast("string")))
                    .bitwiseAND(F.lit(1)) == 1,
                    v,
                ).otherwise(-v),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * (2**p))
    return sum(bits)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 10,
) -> DataFrame:
    """Approximate top-k: candidates restricted to equal random-hyperplane
    signature buckets, then exact cosine re-rank bucket-locally. At scale
    the bucket equi-join replaces the cross join; recall tunes via
    n_planes (fewer planes -> bigger buckets -> higher recall)."""
    sig = _signature(vec_col, dim, n_planes)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        sig.alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        sig.alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )

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


def _signature(vec_col: str, dim: int, n_planes: int, salt: str = "p"):
    """Random-hyperplane signature bits from deterministic pseudo-random
    plane weights: w[p][i] derived from a hash of (salt, p, i), mapped to
    ±1. Computed natively — no UDF, no stored plane matrix."""
    def weight(prefix):
        # ±1 weights via xxhash64 parity of (plane, index); closure keeps
        # the lambda 2-ary for zip_with
        return lambda v, i: F.when(
            F.xxhash64(F.concat(F.lit(prefix), i.cast("string")))
            .bitwiseAND(F.lit(1)) == 1,
            v,
        ).otherwise(-v)

    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.sequence(F.lit(0), F.lit(dim - 1)),
                weight(f"{salt}{p}:"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * (2**p))
    return sum(bits)


def _table_signatures(vec_col: str, dim: int, n_planes: int, n_tables: int):
    """array<struct<tbl,sig>> — one independent hyperplane signature per
    hash table (OR-construction: a pair is a candidate if ANY table's
    signatures collide, which is what keeps recall from collapsing as N
    grows; a single AND-only table has a recall cliff)."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                _signature(vec_col, dim, n_planes, salt=f"t{t}p").alias("sig"),
            )
            for t in range(n_tables)
        ]
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 10,
    n_tables: int = 6,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH
    (OR-construction over ``n_tables`` independent ``n_planes``-bit
    signatures): candidates are pairs colliding in >=1 table, deduped,
    then exact-cosine re-ranked. At scale the (tbl, sig) equi-join
    replaces the cross join; recall tunes via n_planes (fewer ->
    bigger buckets) and n_tables (more -> more probes)."""
    sigs = _table_signatures(vec_col, dim, n_planes, n_tables)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        F.explode(sigs).alias("s"),
    ).select("query_id", "qv", F.col("s.tbl").alias("tbl"),
             F.col("s.sig").alias("sig"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        F.explode(sigs).alias("s"),
    ).select("neighbor_id", "cv", F.col("s.tbl").alias("tbl"),
             F.col("s.sig").alias("sig"))
    cand = (
        c.join(F.broadcast(q), ["tbl", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # a pair colliding in several tables must score once
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn("cosine", _cosine(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )

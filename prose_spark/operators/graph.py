"""Graph analytics over KG edge tables (beyond the reference library —
the reference is a per-document NLP toolkit with no graph layer; this
is the natural downstream of the triple/canonicalization pipeline).

Spark-first design, no GraphFrames dependency: PageRank is the classic
join-based iteration — each step is ONE shuffle keyed on the edge
destination — and degree statistics are plain aggregations. At 100 TB:

- the (edge, out_degree) projection is computed once and persisted
  (MEMORY_AND_DISK) — it is re-read every iteration and must not be
  recomputed from the raw triples lineage each time;
- the projections are hash-repartitioned on their join keys (edges by
  ``src``, the node set by ``node``) before persisting, so every
  iteration's joins reuse the cached partitioning and shuffle only the
  fresh contributions/ranks side (plan-asserted: no Exchange above the
  InMemoryTableScans); AQE's skew handling covers hub entities, which
  dominate real KG degree distributions;
- long iteration chains need a ``localCheckpoint`` every ~10 rounds to
  cut lineage (same discipline as the connected-components operator in
  canonicalize.py); with the default 5 rounds the plan stays shallow;
- ranks are never collected: the result stays a DataFrame.

Convention (documented so the cross-engine oracle can mirror it
exactly): simplified PageRank without dangling-mass redistribution —
rank = (1-d)/N + d * sum(rank_in / out_degree); nodes with no
out-edges keep absorbing but do not re-emit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    _capture_plans: list | None = None,
) -> DataFrame:
    """Join-based PageRank over a directed edge list -> (node, rank).

    One shuffle per iteration (groupBy dst); the edge+out-degree
    projection is persisted once. ``iterations`` is fixed rather than
    convergence-tested so the plan is deterministic and the oracle can
    unroll it.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(F.col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # single driver-side scalar (node count), not a data collect; also
    # materializes the persisted node set every iteration re-joins
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # hash-partition the big persisted projections ONCE on their join
    # keys: every iteration's edeg-side join input and the nodes-side
    # rank rebuild then reuse the cached partitioning (plan shows no
    # Exchange above either InMemoryTableScan), so each of the
    # `iterations` rounds shuffles only the fresh contribs/ranks side —
    # at 100x edge scale that is the difference between shuffling the
    # edge table once vs `iterations` times
    edeg = (
        e.join(out_deg, "src")
        .repartition(F.col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # materialize NOW: until the cached AQE plan is final, downstream
    # planning cannot see the hashpartitioning(src) output and would
    # insert a per-iteration Exchange on the edge side anyway
    edeg.count()
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            edeg.join(ranks, edeg["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
            ).alias("rank"),
        )
        if _capture_plans is not None:  # test hook: per-iteration plan
            _capture_plans.append(
                ranks._jdf.queryExecution().executedPlan().toString()
            )
    # materialize the final ranks once, then release the cached
    # projections — without this every invocation leaks two persisted
    # datasets into executor storage for the session's lifetime
    ranks = ranks.localCheckpoint(eager=True)
    edeg.unpersist()
    nodes.unpersist()
    return ranks


def entity_degrees(
    triples: DataFrame,
    subj_col: str = "subj",
    obj_col: str = "obj",
) -> DataFrame:
    """Per-entity degree statistics over a triple table -> (entity,
    out_triples, out_neighbors, in_triples, in_neighbors). Two
    aggregations and one outer join — all decomposable, no driver
    state."""
    out_d = triples.groupBy(F.col(subj_col).alias("entity")).agg(
        F.count("*").alias("out_triples"),
        F.countDistinct(obj_col).alias("out_neighbors"),
    )
    in_d = triples.groupBy(F.col(obj_col).alias("entity")).agg(
        F.count("*").alias("in_triples"),
        F.countDistinct(subj_col).alias("in_neighbors"),
    )
    return (
        out_d.join(in_d, "entity", "full_outer")
        .select(
            "entity",
            F.coalesce("out_triples", F.lit(0)).alias("out_triples"),
            F.coalesce("out_neighbors", F.lit(0)).alias("out_neighbors"),
            F.coalesce("in_triples", F.lit(0)).alias("in_triples"),
            F.coalesce("in_neighbors", F.lit(0)).alias("in_neighbors"),
        )
    )

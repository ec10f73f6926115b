"""Tests for the KG graph-analytics layer (operators/graph.py):
join-based PageRank verified against an independent dense numpy
power-iteration with the same convention, and degree statistics
against hand counts."""

from __future__ import annotations

import numpy as np
import pytest


def _numpy_pagerank(edges, iterations, damping):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[idx[s]] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[idx[d]] += rank[idx[s]] / out_deg[idx[s]]
        rank = (1.0 - damping) / n + damping * contrib
    return dict(zip(nodes, rank))


def test_pagerank_matches_numpy_power_iteration(spark):
    from prose_spark.operators.graph import pagerank

    rng = np.random.default_rng(21)
    edges = sorted({
        (f"n{int(a)}", f"n{int(b)}")
        for a, b in rng.integers(0, 40, size=(300, 2))
        if a != b
    })
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.rank
           for r in pagerank(df, iterations=5, damping=0.85).collect()}
    ref = _numpy_pagerank(edges, 5, 0.85)
    assert set(got) == set(ref)
    for k in ref:
        assert abs(got[k] - ref[k]) < 1e-12, k
    # ranks of a 5-iteration damped walk sum to <= 1 and every node
    # keeps at least the teleport mass
    assert all(v >= (1 - 0.85) / len(ref) - 1e-15 for v in got.values())


def test_pagerank_hub_ranks_highest(spark):
    from prose_spark.operators.graph import pagerank

    # star graph: every spoke points at the hub
    edges = [(f"s{i}", "hub") for i in range(10)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = {r.node: r.rank for r in pagerank(df, iterations=3).collect()}
    assert rows["hub"] == max(rows.values())
    assert rows["hub"] > 5 * rows["s0"]
    with pytest.raises(ValueError, match="iterations"):
        pagerank(df, iterations=0)


def _strip_cached_subplans(plan: str) -> str:
    """Drop each InMemoryRelation's embedded build plan (its Exchanges
    ran once at persist time, not per iteration)."""
    keep, skip_indent = [], None
    for ln in plan.splitlines():
        indent = len(ln) - len(ln.lstrip(" :+-*("))
        if skip_indent is not None:
            if indent > skip_indent:
                continue
            skip_indent = None
        keep.append(ln)
        if "InMemoryRelation" in ln:
            skip_indent = indent
    return "\n".join(keep)


def test_pagerank_iteration_shuffles_only_contribs(spark):
    """Co-location contract: the persisted edge+degree and node
    projections are hash-partitioned on their join keys once, so each
    iteration's only shuffle is the contribs groupBy(node) — the edge
    side is never re-exchanged (graph.py module docstring)."""
    from prose_spark.operators.graph import pagerank

    rng = np.random.default_rng(7)
    edges = sorted({
        (f"n{int(a)}", f"n{int(b)}")
        for a, b in rng.integers(0, 40, size=(300, 2))
        if a != b
    })
    df = spark.createDataFrame(edges, ["src", "dst"])
    plans = []
    # disable broadcast so the joins must prove partitioning alignment
    # (broadcast would hide a missing co-location at real scale)
    with _no_broadcast(spark):
        pagerank(df, iterations=3, _capture_plans=plans).collect()
    # iteration k's uncheckpointed plan inlines iterations 1..k, so the
    # final plan shows every per-iteration Exchange that would run
    top = _strip_cached_subplans(plans[-1])
    exchanges = [
        ln.strip() for ln in top.splitlines()
        if "Exchange" in ln and "ENSURE_REQUIREMENTS" in ln
        or ("Exchange" in ln and "REPARTITION" in ln)
    ]
    assert len(exchanges) == 3, (exchanges, top)
    for ex in exchanges:
        assert "hashpartitioning(node" in ex, (ex, top)
    # and the persisted projections are scanned, not rebuilt
    assert "InMemoryTableScan" in top


class _no_broadcast:
    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *exc):
        self.spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", self.prev)


def test_entity_degrees(spark):
    from prose_spark.operators.graph import entity_degrees

    triples = spark.createDataFrame(
        [
            ("a", "knows", "b"),
            ("a", "knows", "c"),
            ("a", "likes", "b"),
            ("b", "knows", "c"),
        ],
        ["subj", "pred", "obj"],
    )
    rows = {r.entity: r for r in entity_degrees(triples).collect()}
    assert rows["a"].out_triples == 3 and rows["a"].out_neighbors == 2
    assert rows["a"].in_triples == 0
    assert rows["b"].out_triples == 1 and rows["b"].in_triples == 2
    assert rows["c"].in_triples == 2 and rows["c"].in_neighbors == 2
    assert rows["c"].out_triples == 0

"""Scale-robustness guards: band-bucket caps against boilerplate
quadratic blow-up, and all-pairs foot-gun raises.

The LSH candidate joins are bucket-local, so partition sizes stay
bounded — EXCEPT when thousands of near-identical docs share every band
key (boilerplate). AQE splits oversized partitions but not the O(n^2)
pair explosion itself; the max_bucket_size cap does.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def boilerplate_docs(spark):
    # 1000 identical docs + 2 distinct near-dup docs
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base) for i in range(1000)]
    other = ("an entirely separate document about mountains rivers "
             "forests valleys glaciers and long winding hiking trails "
             "that stretch across the quiet northern countryside")
    rows.append((2001, other + " today"))
    rows.append((2002, other + " tomorrow"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_bucket_cap_bounds_pairs(spark, boilerplate_docs):
    from prose_spark.operators.dedup import (
        minhash_near_dup_pairs_native,
        oversized_band_buckets,
    )

    # uncapped, the identical cluster alone is ~500k pairs; with the cap
    # the boilerplate buckets are dropped and the output stays tiny
    capped = minhash_near_dup_pairs_native(
        boilerplate_docs, key_col="doc_id", jaccard_max_distance=0.3,
        max_bucket_size=100,
    )
    rows = capped.collect()
    assert len(rows) < 1000  # bounded: no quadratic explosion
    # the two distinct near-dups still pair (their buckets are small)
    assert {(r["a"], r["b"]) for r in rows} >= {(2001, 2002)}

    # observability: the dropped buckets are reportable, with sizes
    over = oversized_band_buckets(
        boilerplate_docs, key_col="doc_id", max_bucket_size=100
    ).collect()
    assert len(over) == 8  # all 8 bands of the identical cluster
    assert all(r["n_members"] == 1000 for r in over)


def test_simhash_bucket_cap_bounds_pairs(spark, boilerplate_docs):
    from prose_spark.operators.dedup import (
        add_simhash,
        simhash_candidate_pairs,
    )

    # survivor pair: two identical docs (hamming 0, bucket size 2)
    extra = boilerplate_docs.sparkSession.createDataFrame(
        [(3001, "a small island of unique text"),
         (3002, "a small island of unique text")], ["doc_id", "text"])
    sh = add_simhash(boilerplate_docs.unionByName(extra))
    capped = simhash_candidate_pairs(sh, "doc_id", max_hamming=3,
                                     max_bucket_size=100)
    rows = capped.collect()
    assert len(rows) < 1000
    assert {(r["a"], r["b"]) for r in rows} >= {(3001, 3002)}


def test_near_dup_doc_clusters_transitive(spark):
    """Fuzzy dedup collapses transitive near-dup CHAINS into one
    cluster: A~B and B~C must share one survivor even when A!~C (the
    pair listing alone can't express that)."""
    from prose_spark.operators.dedup import near_dup_doc_clusters

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    words = base.split()
    # chain: each doc replaces 3 more trailing words — adjacent docs are
    # near-dups, the ends are not
    docs = []
    for i in range(4):
        w = words[:]
        for k in range(3 * i):
            w[-(k + 1)] = f"sub{i}_{k}"
        docs.append((i + 1, " ".join(w)))
    docs.append((99, "an unrelated island of entirely different text"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r["keep_doc_id"]
           for r in near_dup_doc_clusters(
               df, "doc_id", jaccard_max_distance=0.5).collect()}
    chain = {k: v for k, v in out.items() if k <= 4}
    assert len(chain) >= 3 and set(chain.values()) == {1}, out
    assert 99 not in out  # no near-dup -> keeps itself, omitted


def test_ngram_jaccard_all_pairs_raises(spark, boilerplate_docs):
    """The guard now rides the plan (attach_all_pairs_guard): over-limit
    inputs raise at the FIRST ACTION — no separate probe job per call.
    (The USER_RAISED_EXCEPTION may arrive wrapped in a stage-
    materialization error when both join sides fail in parallel, so the
    assertion matches the message, not the wrapper type.)"""
    from prose_spark.operators.dedup import ngram_jaccard_pairs

    with pytest.raises(Exception, match="all-pairs self-join"):
        ngram_jaccard_pairs(boilerplate_docs, key_col="doc_id",
                            all_pairs_row_limit=100).count()
    # the pre-r4 ValueError contract, restored around the action
    from prose_spark.operators.dedup import guard_errors_as_value_error

    with pytest.raises(ValueError, match="all-pairs self-join"):
        with guard_errors_as_value_error():
            ngram_jaccard_pairs(boilerplate_docs, key_col="doc_id",
                                all_pairs_row_limit=100).count()
    # non-guard errors pass through untouched
    with pytest.raises(Exception) as ei:
        with guard_errors_as_value_error():
            spark.sql("select assert_true(false, 'unrelated')").collect()
    assert not isinstance(ei.value, ValueError)
    # explicit override runs (block_col path never probes)
    small = boilerplate_docs.limit(5)
    ngram_jaccard_pairs(small, key_col="doc_id",
                        all_pairs_row_limit=100).count()
    ngram_jaccard_pairs(boilerplate_docs, key_col="doc_id",
                        all_pairs_row_limit=100,
                        allow_all_pairs=True).limit(1).count()


def test_all_pairs_guard_is_lazy(spark):
    """Building a guarded plan launches ZERO Spark jobs — the old eager
    probe paid a limit+count job at CALL time even when the caller never
    ran an action; the in-plan guard defers the check to the first
    action (and the guarded result is unchanged)."""
    from prose_spark.operators.dedup import ngram_jaccard_pairs
    from prose_spark.operators.similarity import embedding_near_dup_pairs

    small = spark.createDataFrame(
        [(i, f"document number {i} about topic {i % 3}") for i in range(20)],
        ["doc_id", "text"],
    )
    emb = spark.range(30).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=i) for i in range(8)]).alias("embedding"),
    )
    sc = spark.sparkContext
    sc.setJobGroup("guard_lazy_test", "plan build only")
    try:
        guarded_ng = ngram_jaccard_pairs(small, key_col="doc_id",
                                         all_pairs_row_limit=100)
        guarded_emb = embedding_near_dup_pairs(emb, brute_force=True,
                                               all_pairs_row_limit=100)
        jobs = sc.statusTracker().getJobIdsForGroup("guard_lazy_test")
        assert len(jobs or []) == 0, "plan building must launch no jobs"
    finally:
        sc.setJobGroup(None, None)
    # under the cap, both guarded plans execute and match the override
    assert guarded_ng.count() == ngram_jaccard_pairs(
        small, key_col="doc_id", all_pairs_row_limit=100,
        allow_all_pairs=True).count()
    guarded_emb.count()  # executes without raising


def test_embedding_brute_force_raises(spark):
    from prose_spark.operators.similarity import embedding_near_dup_pairs

    emb = spark.range(500).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=i) for i in range(8)]).alias("embedding"),
    )
    with pytest.raises(Exception, match="all-pairs cross join"):
        embedding_near_dup_pairs(emb, brute_force=True,
                                 all_pairs_row_limit=100).count()
    # under the limit: runs
    embedding_near_dup_pairs(emb.limit(50), dim=8, brute_force=True,
                             all_pairs_row_limit=100).count()


def test_minhash_md5_mode_single_band_join_plan(spark, boilerplate_docs):
    """The portable md5 hash family keeps the same physical shape as the
    xxhash64 default: native expressions only, exactly one band-key
    self-join (the plan obligation of test_plans.py holds per-mode)."""
    from prose_spark.operators.dedup import minhash_near_dup_pairs_native

    df = minhash_near_dup_pairs_native(
        boilerplate_docs.limit(10), key_col="doc_id",
        jaccard_max_distance=0.3, hash_fn="md5",
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    tree = plan.split("\n\n")[0]
    n_joins = sum(tree.count(j) for j in
                  ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
    assert n_joins == 3, tree  # id-only band join + two key attaches


def test_banded_minhash_probe_subset_contract(spark):
    """The asymmetric probe band join returns EXACTLY the self-join's
    pairs restricted to those touching a probe key — identical hashing
    on both sides means identical band collisions, so the incremental
    path can never see a pair the batch path wouldn't (or vice versa)."""
    from pyspark.sql import functions as F

    from prose_spark.operators.dedup import _shingles, banded_minhash_pairs

    docs = [(i, f"alpha beta gamma delta epsilon zeta doc {i % 7}")
            for i in range(40)]
    df = spark.createDataFrame(docs, ["k", "text"])
    d = df.select(
        "k", F.array_distinct(_shingles("text", 3)).alias("g"))
    full = {(r.a, r.b)
            for r in banded_minhash_pairs(d, 0.5).collect()}
    assert full  # the %7 templates guarantee near-dup mass
    probe_keys = {k for k, _ in docs if k < 10}
    probe = d.filter(F.col("k") < 10)
    got = {(r.a, r.b)
           for r in banded_minhash_pairs(d, 0.5, probe=probe).collect()}
    want = {(a, b) for a, b in full
            if a in probe_keys or b in probe_keys}
    assert got == want and got < full

"""Spark-level integration tests: annotate kernel, triple extraction,
canonicalization, dedup, similarity, checkpoint/resume, streaming,
multimodal plumbing."""

import pytest
from pyspark.sql import functions as F


def test_annotate_schema_and_counts(spark, pages_df):
    from prose_spark.operators.annotate import annotate

    en = pages_df.filter(F.col("lang") == "en").select("url", "text").limit(20)
    ann = annotate(en).cache()
    row = ann.first()
    assert {"sentences", "tokens", "entities"} <= set(ann.columns)
    assert len(row.tokens) > 0 and len(row.sentences) > 0
    # every token's span reconstructs its text from the sanitized doc
    from prose_spark.nlp.tokenizer import sanitize

    clean = sanitize(row.text).encode("utf-8")
    for t in row.tokens[:50]:
        assert clean[t.start : t.end].decode("utf-8") == t.text


def test_fused_triples_equal_two_stage(spark, pages_df):
    from prose_spark.operators.annotate import annotate
    from prose_spark.operators.triples import (
        annotate_and_extract_triples,
        extract_triples,
    )

    en = pages_df.filter(F.col("lang") == "en").select("url", "text").limit(30)
    two_stage = {tuple(r) for r in extract_triples(annotate(en)).collect()}
    fused = {tuple(r) for r in annotate_and_extract_triples(en).collect()}
    assert fused == two_stage and len(fused) > 0


def test_iceberg_sink_dispatch(spark, pages_df, tmp_path):
    """Capability gating of the production Iceberg sink: this image has
    no Iceberg runtime, so iceberg_available is False, an explicit
    iceberg_table request fails loudly (never silently falls back), and
    the default parquet path is what runs."""
    from prose_spark.sources.checkpoints import (
        iceberg_available,
        run_kg_job,
        write_triples_sink,
    )

    assert iceberg_available(spark) is False
    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        write_triples_sink(spark, pages_df.limit(1), str(tmp_path),
                           iceberg_table="cat.db.triples")
    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        run_kg_job(spark, pages_df.limit(10), str(tmp_path / "kg"),
                   n_buckets=2, iceberg_table="cat.db.triples")


def test_iceberg_sink_create_vs_overwrite_dispatch(monkeypatch, spark):
    # `spark` is unused by the fakes but REQUIRED: the create branch
    # builds F.col("bucket"), which asserts an active SparkContext in
    # pyspark 4 — without the fixture this test is order-dependent
    """The Iceberg branch dispatches on EXPLICIT table existence: first
    write creates (never replaces), later writes overwritePartitions, and
    any write failure PROPAGATES — a transient commit conflict on wave N
    must never degrade into a createOrReplace that wipes waves 0..N-1
    (no Iceberg jar in this image, so the branch is driven with fakes)."""
    from prose_spark.sources import checkpoints as cp

    calls: list[tuple[str, str]] = []

    class FakeWriter:
        def __init__(self, table, fail_overwrite=False):
            self.table, self.fail = table, fail_overwrite

        def overwritePartitions(self):
            if self.fail:
                raise RuntimeError("commit conflict")
            calls.append(("overwritePartitions", self.table))

        def partitionedBy(self, *_):
            return self

        def create(self):
            calls.append(("create", self.table))

        def createOrReplace(self):  # must never be reached
            calls.append(("createOrReplace", self.table))

    class FakeDF:
        def __init__(self, fail_overwrite=False):
            self.fail = fail_overwrite

        def writeTo(self, table):
            return FakeWriter(table, self.fail)

    class FakeSpark:
        def __init__(self, exists):
            class Cat:
                def tableExists(_, t, _e=exists):
                    return _e
            self.catalog = Cat()

    monkeypatch.setattr(cp, "iceberg_available", lambda s: True)
    # first write: table absent -> create
    cp.write_triples_sink(FakeSpark(False), FakeDF(), "x",
                          iceberg_table="c.d.t")
    assert calls == [("create", "c.d.t")]
    # subsequent write: table present -> dynamic partition overwrite
    calls.clear()
    cp.write_triples_sink(FakeSpark(True), FakeDF(), "x",
                          iceberg_table="c.d.t")
    assert calls == [("overwritePartitions", "c.d.t")]
    # failure on an existing table propagates, never falls back to a
    # table-replacing write
    calls.clear()
    with pytest.raises(RuntimeError, match="commit conflict"):
        cp.write_triples_sink(FakeSpark(True), FakeDF(fail_overwrite=True),
                              "x", iceberg_table="c.d.t")
    assert calls == []


def test_triple_recall_vs_templated_gold(spark):
    from prose_spark.operators.triples import annotate_and_extract_triples
    from prose_spark.sources.pages import generate_pages_rows
    from prose_spark.schemas import PAGES_SCHEMA

    rows = list(generate_pages_rows(120, seed=42, sentences_per_doc=(3, 8)))
    gold = {
        (url, s, p, o)
        for url, _, _, _, lang, g in rows
        if lang == "en"
        for s, p, o in g
    }
    df = spark.createDataFrame(
        [(u, ts, h, t, l) for u, ts, h, t, l, _ in rows], schema=PAGES_SCHEMA
    )
    en = df.filter(F.col("lang") == "en").select("url", "text")
    pred = {
        (r.url, r.subj, r.pred, r.obj)
        for r in annotate_and_extract_triples(en).collect()
    }
    recall = len(gold & pred) / len(gold)
    assert recall >= 0.95, f"templated-gold recall {recall:.3f} < 0.95"


def test_canonicalize_clusters_near_duplicates(spark):
    from prose_spark.operators.canonicalize import canonicalize_mentions

    mentions = spark.createDataFrame(
        [
            ("u1", "Acme Corporation"),
            ("u2", "Acme Corporation"),
            ("u3", "Acme  Corporation"),  # whitespace variant
            ("u4", "ACME Corporation"),   # case variant
            ("u5", "Acme Corporatio"),    # typo (high 3-gram jaccard)
            ("u6", "Globex"),
        ],
        ["url", "text"],
    )
    canon = canonicalize_mentions(mentions, jaccard_max_distance=0.4).collect()
    by_norm = {r.norm: r for r in canon}
    acme_id = by_norm["acme corporation"].entity_id
    assert by_norm["acme corporatio"].entity_id == acme_id
    assert by_norm["globex"].entity_id != acme_id
    # canonical surface = most frequent member
    assert by_norm["acme corporatio"].canonical_text == "acme corporation"
    # exact variants collapsed into one normalized form with count 4
    assert by_norm["acme corporation"].n_mentions == 4


def test_connected_components_chain(spark):
    from prose_spark.operators.canonicalize import connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["a", "b"]
    )
    comp = {r.node: r.comp for r in connected_components(edges).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == "x"


def test_connected_components_long_path_logarithmic_rounds(spark):
    """A 1000-node path graph (diameter 999) must converge in O(log n)
    alternating-star rounds — the scale guarantee that distinguishes star
    contraction from plain label propagation (which would need ~1000
    rounds here)."""
    import math

    from prose_spark.operators.canonicalize import connected_components

    n = 1000
    edges = spark.createDataFrame(
        [(f"n{i:04d}", f"n{i + 1:04d}") for i in range(n - 1)], ["a", "b"]
    ).repartition(8)
    stats: dict = {}
    labels = connected_components(edges, max_iter=25, stats=stats)
    comps = {r.comp for r in labels.collect()}
    assert comps == {"n0000"}
    assert labels.count() == n
    assert stats["rounds"] <= math.ceil(math.log2(n)) + 3, stats


def test_exact_dedup(spark):
    from prose_spark.operators.dedup import exact_dedup, exact_duplicate_groups

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "HELLO  world"),
         (4, "unique doc")],
        ["doc_id", "text"],
    )
    groups = exact_duplicate_groups(df, "doc_id").collect()
    assert len(groups) == 1 and groups[0].n_dups == 3
    kept = exact_dedup(df, "doc_id").select("doc_id").collect()
    assert sorted(r.doc_id for r in kept) == [1, 4]


def test_simhash_near_dup(spark):
    from prose_spark.operators.dedup import add_simhash, simhash_candidate_pairs

    base = "the quick brown fox jumps over the lazy dog " * 5
    df = spark.createDataFrame(
        [(1, base), (2, base + "extra"), (3, "completely different text "
                                             "about spark engines " * 5)],
        ["doc_id", "text"],
    )
    sh = add_simhash(df)
    pairs = simhash_candidate_pairs(sh, "doc_id", max_hamming=8).collect()
    pair_set = {(r.a, r.b) for r in pairs}
    assert (1, 2) in pair_set
    assert (1, 3) not in pair_set


def test_native_minhash_matches_ml_pairs(spark):
    """The native banded-MinHash core and Spark ML's MinHashLSH must find
    the SAME near-dup pair set after exact-distance filtering (the hash
    families differ; the exact verify makes the contract equal whenever
    both recall the candidates)."""
    from prose_spark.operators.dedup import (
        minhash_near_dup_pairs,
        minhash_near_dup_pairs_native,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    ml = {(r.a, r.b) for r in minhash_near_dup_pairs(
        docs, "doc_id", jaccard_max_distance=0.3, num_hash_tables=4,
        shingle_n=3).collect()}
    native = {(r.a, r.b) for r in minhash_near_dup_pairs_native(
        docs, "doc_id", jaccard_max_distance=0.3, n_hashes=32, bands=8,
        shingle_n=3).collect()}
    assert ml == native, (ml - native, native - ml)
    assert len(native) > 0


def test_brute_force_topk_self_similarity(spark):
    from prose_spark.operators.similarity import brute_force_topk

    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0]),
            (3, [0.0, 1.0, 0.0]),
            (4, [0.0, 0.0, 1.0]),
        ],
        ["vec_id", "embedding"],
    )
    top = brute_force_topk(vecs.filter("vec_id = 1"), vecs, k=2).collect()
    assert [r.neighbor_id for r in top] == [2, 3]


def test_lsh_topk_recall_vs_brute_force(spark):
    """OR-construction recall floor: multi-table hyperplane LSH must
    recover >=0.9 of exact top-5 neighbors on the embeddings fixture
    (isotropic vectors, top-5 cosine ~0.35 — the hard case). Signatures
    are hash-derived, so this number is deterministic."""
    from pyspark.sql import functions as F

    from prose_spark.operators.similarity import brute_force_topk, lsh_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 30)
    bf = {(r.query_id, r.neighbor_id)
          for r in brute_force_topk(q, emb, k=5).collect()}
    ls = {(r.query_id, r.neighbor_id)
          for r in lsh_topk(q, emb, k=5, dim=64, n_planes=3,
                            n_tables=12).collect()}
    recall = len(bf & ls) / len(bf)
    assert recall >= 0.9, f"recall@5 {recall:.3f}"


def test_ivf_topk_recall_beats_random_probing(spark):
    """IVF coarse quantizer must concentrate true neighbors: probing
    n_probe of n_cells cells has a 'random' recall baseline of
    n_probe/n_cells; the hash-seeded k-means cells must do much better,
    and recall must rise with n_probe. (Isotropic vectors are IVF's
    worst case — real embedding corpora cluster far more.)"""
    from pyspark.sql import functions as F

    from prose_spark.operators.similarity import (
        brute_force_topk,
        ivf_fit,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 30)
    bf = {(r.query_id, r.neighbor_id)
          for r in brute_force_topk(q, emb, k=5).collect()}
    cents = ivf_fit(emb, n_cells=16)
    assert len(cents) == 16

    def recall(n_probe):
        iv = {(r.query_id, r.neighbor_id)
              for r in ivf_topk(q, emb, k=5, n_probe=n_probe,
                                centroids=cents).collect()}
        return len(bf & iv) / len(bf)

    r4, r8 = recall(4), recall(8)
    assert r4 >= 2 * (4 / 16), r4   # >=2x the random-probing baseline
    assert r8 > r4
    assert r8 >= 0.75, r8


def test_checkpoint_resume_after_crash(spark, pages_df, tmp_path):
    from prose_spark.sources.checkpoints import (
        done_buckets,
        read_triples,
        run_kg_job,
    )

    out = str(tmp_path / "kg_out")
    # first run crashes after bucket 1
    with pytest.raises(RuntimeError, match="injected failure"):
        run_kg_job(spark, pages_df, out, n_buckets=4, fail_after_bucket=1)
    done_first = done_buckets(spark, out)
    assert done_first and done_first != {0, 1, 2, 3}
    # resume completes only the remaining buckets
    metrics = run_kg_job(spark, pages_df, out, n_buckets=4)
    resumed = {r.bucket for r in metrics.collect()}
    assert resumed == {0, 1, 2, 3} - done_first
    assert done_buckets(spark, out) == {0, 1, 2, 3}
    # full output equals a clean single run
    n = read_triples(spark, out).count()
    out2 = str(tmp_path / "kg_out_clean")
    run_kg_job(spark, pages_df, out2, n_buckets=4)
    assert read_triples(spark, out2).count() == n
    # idempotent: nothing to do on a third run
    assert run_kg_job(spark, pages_df, out, n_buckets=4).count() == 0


def test_incremental_canonical_resume(spark, pages_df, tmp_path):
    """Marker-driven re-canonicalization (r5 verdict item #7): a job
    crashes mid-run after canonicalizing its completed buckets; the
    resumed run folds ONLY the newly-finished buckets into the existing
    canonical table via merge_canonicalize (stats path='incremental'),
    and the result is row-for-row equal to a clean batch run over
    everything — so untouched clusters' content-addressed entity ids
    survive the increment by construction (and are spot-asserted)."""
    from prose_spark.sources.checkpoints import (
        done_buckets,
        run_kg_job,
        update_canonical_tables,
    )

    out = str(tmp_path / "kg_out")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_kg_job(spark, pages_df, out, n_buckets=4, fail_after_bucket=1)
    done_first = done_buckets(spark, out)
    # crash-run canonicalization over the completed buckets: no prior
    # table -> batch fallback
    s1 = update_canonical_tables(
        spark, out, new_buckets=done_first, incremental=True)
    assert s1["path"] == "batch" and s1["n_forms"] > 0
    stage1 = {
        (r.norm, r.entity_id)
        for r in spark.read.parquet(f"{out}/entities_canonical").collect()
    }

    # resume: remaining buckets fold in incrementally
    metrics = run_kg_job(spark, pages_df, out, n_buckets=4)
    new_b = {r.bucket for r in metrics.collect()}
    assert new_b == {0, 1, 2, 3} - done_first
    s2 = update_canonical_tables(
        spark, out, new_buckets=new_b, incremental=True)
    assert s2["path"] == "incremental"
    final = {
        (r.norm, r.entity_id)
        for r in spark.read.parquet(f"{out}/entities_canonical").collect()
    }

    # exact equivalence with a clean batch run over the same output
    # (the uncapped merge contract, here end-to-end at the job layer)
    s3 = update_canonical_tables(spark, out, incremental=False)
    assert s3["path"] == "batch"
    batch = {
        (r.norm, r.entity_id)
        for r in spark.read.parquet(f"{out}/entities_canonical").collect()
    }
    assert final == batch
    # clusters untouched by the new buckets kept their ids: every
    # stage-1 form still present with the same canonical surface maps
    # to the same content-addressed id
    surviving = stage1 & final
    assert surviving, "no stage-1 entity ids survived the increment"

    # fully-resumed third run: nothing new -> noop, table untouched
    assert run_kg_job(spark, pages_df, out, n_buckets=4).count() == 0
    s4 = update_canonical_tables(
        spark, out, new_buckets=set(), incremental=True)
    assert s4["path"] == "noop"
    # the noop reports the EXISTING tables' real counts, not zeros
    # (zeros read as a failed canonicalization in job logs)
    assert s4["n_forms"] == len(batch)
    assert s4["n_canon_triples"] == spark.read.parquet(
        f"{out}/triples_canonical").count() > 0


def test_done_marker_input_fingerprint_lineage(spark, pages_df, tmp_path):
    """Done markers carry an input-content fingerprint (bit_xor of
    xxhash64(url, text) per bucket): the same input reproduces the same
    fingerprints in an independent run, and an input whose TEXT changed
    under identical urls/counts produces different ones — so a resume
    against silently swapped input is detectable from lineage alone."""
    import json
    from pathlib import Path

    from prose_spark.sources.checkpoints import run_kg_job

    def fingerprints(out):
        return {
            m["bucket"]: m["input_fingerprint"]
            for m in (json.loads(p.read_text())
                      for p in Path(out, "_done").glob("bucket_*.json"))
        }

    df = pages_df.limit(40)
    out_a, out_b, out_c = (str(tmp_path / x) for x in ("a", "b", "c"))
    run_kg_job(spark, df, out_a, n_buckets=2)
    run_kg_job(spark, df, out_b, n_buckets=2)
    fa, fb = fingerprints(out_a), fingerprints(out_b)
    assert fa == fb and all(v is not None for v in fa.values())

    mutated = df.withColumn(
        "text", F.concat(F.col("text"), F.lit(" drifted")))
    run_kg_job(spark, mutated, out_c, n_buckets=2)
    fc = fingerprints(out_c)
    assert set(fc) == set(fa) and all(fc[b] != fa[b] for b in fa)

    # even-multiplicity swap: input where every doc appears TWICE, vs
    # the drifted corpus also doubled — an xor fold would cancel both
    # to identical fingerprints (same n_docs, same xor), which is
    # exactly the silent-swap the multiplicity-aware sum must catch
    out_d, out_e = str(tmp_path / "d"), str(tmp_path / "e")
    run_kg_job(spark, df.unionAll(df), out_d, n_buckets=2)
    run_kg_job(spark, mutated.unionAll(mutated), out_e, n_buckets=2)
    fd, fe = fingerprints(out_d), fingerprints(out_e)
    assert set(fd) == set(fe) and all(fd[b] != fe[b] for b in fd)


def test_merge_canonicalize_equals_batch(spark, pages_df):
    """The incremental path's exact-equivalence contract:
    merge_canonicalize(new, canonicalize_mentions(old)) reproduces
    canonicalize_mentions(old UNION new) ROW FOR ROW on real NER
    mentions — counts merge additively, the asymmetric probe band join
    finds exactly the batch run's new-touching pairs, and old
    connectivity re-enters as star edges whose closure is the old
    partition. Also checks id stability: clusters untouched by the new
    crawl keep their entity_id."""
    from prose_spark.operators.annotate import annotate
    from prose_spark.operators.canonicalize import (
        canonicalize_mentions,
        mentions_from_annotated,
        merge_canonicalize,
    )

    ann = annotate(
        pages_df.filter(F.col("lang") == "en").select("url", "text")
    )
    m = mentions_from_annotated(ann, key_col="url").localCheckpoint()
    old = m.filter(F.pmod(F.xxhash64("url"), F.lit(3)) != 0)
    new = m.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == 0)
    assert new.count() > 0 and old.count() > 0

    existing = canonicalize_mentions(old).localCheckpoint()
    batch = sorted(map(tuple, canonicalize_mentions(m).collect()))
    inc = sorted(map(tuple, merge_canonicalize(new, existing).collect()))
    assert inc == batch
    # broadcast_probe changes ONLY the physical join strategy (probe
    # band keys broadcast, accumulated side never shuffled) — the pair
    # set and therefore the output must be identical
    inc_bp = sorted(map(tuple, merge_canonicalize(
        new, existing, broadcast_probe=True).collect()))
    assert inc_bp == batch

    # id stability: every cluster whose canonical surface survived the
    # merge kept its content-addressed entity_id
    ex_ids = {r.canonical_text: r.entity_id for r in existing.collect()}
    for ct, eid in {r[1]: r[0] for r in inc}.items():
        if ct in ex_ids:
            assert eid == ex_ids[ct]

def test_merge_canonicalize_capped_keeps_old_clusters(spark):
    """CAPPED mode is deliberately NOT batch-equivalent: when a new
    crawl pushes a band bucket over max_bucket_size, the batch run
    drops the bucket and splits the old cluster, while the incremental
    run keeps the previously committed cluster (stability — entity ids
    must not churn because new data densified a bucket). This test
    constructs exactly that straddle and pins the divergence direction
    documented in merge_canonicalize's docstring."""
    from prose_spark.operators.canonicalize import (
        canonicalize_mentions,
        merge_canonicalize,
    )

    # family of DISTINCT norms with IDENTICAL char-3-gram sets (a cyclic
    # stem repeated 3/4/5/6 times): identical gram sets => identical
    # minhash signatures in EVERY band, so the whole family always
    # shares every bucket — the cap's effect is deterministic
    fam = ["zqx" * k for k in (3, 4, 5)]
    old_rows = [(f"o{i}", t) for i, t in enumerate(fam + ["globex"])]
    new_rows = [("n0", "zqx" * 6)]  # 4th member -> buckets exceed 3
    old = spark.createDataFrame(old_rows, ["url", "text"])
    new = spark.createDataFrame(new_rows, ["url", "text"])

    def clusters(df):
        rows = df.collect()
        byid: dict = {}
        for r in rows:
            byid.setdefault(r.entity_id, set()).add(r.norm)
        return sorted(byid.values(), key=sorted)

    existing = canonicalize_mentions(
        old, jaccard_max_distance=0.4, max_bucket_size=3
    ).localCheckpoint()
    # sanity: the old family clustered under the cap (buckets of 3)
    assert any(len(c) == 3 for c in clusters(existing))
    batch = clusters(canonicalize_mentions(
        old.union(new), jaccard_max_distance=0.4, max_bucket_size=3))
    inc = clusters(merge_canonicalize(
        new, existing, jaccard_max_distance=0.4, max_bucket_size=3))
    # batch drops the now-over-cap buckets: family members split apart
    assert not any(len(c) >= 3 for c in batch), batch
    # incremental keeps the committed 3-cluster (the new form may or
    # may not attach depending on its own bucket survival)
    assert any(len(c) >= 3 for c in inc), inc


def test_triple_support_weighted_edges(spark):
    """triple_support collapses repeated assertions into one weighted
    edge per (subj, pred_norm, obj) with decomposable aggregates only —
    counts, distinct sources, max confidence, and a BOUNDED provenance
    exemplar (min source), never a collect_set a hot fact would blow up
    at crawl scale."""
    from prose_spark.operators.triples import triple_support

    tr = spark.createDataFrame(
        [
            ("u1", "acme", "founded", "globex", 0.9),
            ("u2", "acme", "founded", "globex", 0.7),
            ("u2", "acme", "founded", "globex", 0.8),  # same doc twice
            ("u3", "bob", "joined", "acme", 0.5),
        ],
        ["url", "subj", "pred_norm", "obj", "confidence"],
    )
    rows = {
        (r.subj, r.pred_norm, r.obj): r
        for r in triple_support(tr).collect()
    }
    e = rows[("acme", "founded", "globex")]
    assert (e.n_mentions, e.n_sources) == (3, 2)
    assert e.max_confidence == 0.9 and e.first_source == "u1"
    assert rows[("bob", "joined", "acme")].n_mentions == 1
    # plan stays a distributed aggregate: at most the two exchanges the
    # distinct-count rewrite needs (partial on (keys, source), final on
    # keys), and never a cartesian or a driver-side collect
    plan = triple_support(tr)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2
    assert "CartesianProduct" not in plan


def test_streaming_windowed_agg(spark, tmp_path):
    from prose_spark.operators.streaming import stream_events_windowed

    src = str(tmp_path / "events_in")  # streaming source must be a dir
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(src)
    agg = stream_events_windowed(spark, src, window="1 hour")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("ev_agg")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode + watermark only emits closed windows; compare against
    # batch computation excluding the last (open) watermark region
    got = spark.sql("SELECT sum(n) AS total FROM ev_agg").first().total
    assert got is not None and got > 0


def test_streaming_foreachbatch_triples(spark, pages_df, tmp_path):
    from prose_spark.operators.streaming import stream_annotate_pages

    src = str(tmp_path / "pages_in")
    pages_df.limit(30).write.parquet(src)
    out = str(tmp_path / "triples_out")
    q = stream_annotate_pages(spark, src, out, str(tmp_path / "ck2"))
    q.awaitTermination(180)
    assert spark.read.parquet(out).count() > 0


def test_sessionize(spark):
    import datetime as dt

    from prose_spark.operators.streaming import sessionize_events

    base = dt.datetime(2025, 1, 1)
    rows = [
        (1, base, 1.0),
        (1, base + dt.timedelta(minutes=5), 1.0),
        (1, base + dt.timedelta(minutes=90), 1.0),  # new session
        (2, base, 1.0),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = sessionize_events(ev, gap_minutes=30).collect()
    sess = {(r.user_id, r.ts.minute): r.session_id for r in got}
    assert sess[(1, 0)] == sess[(1, 5)]
    assert sess[(1, 30)] != sess[(1, 0)]
    assert sess[(2, 0)].startswith("2-")


def test_multimodal_plumbing(spark, pages_df):
    from prose_spark.operators.multimodal import (
        decode_image,
        extract_image_features,
        sample_video_frames,
    )

    feats = extract_image_features(
        pages_df.limit(10), blob_col="html", fake=True
    ).collect()
    assert len(feats) == 10
    for r in feats:
        assert len(r.features) == 16
        assert r.media_meta.n_bytes > 0 and len(r.media_meta.sha1) == 40
    # determinism: same blob -> same features
    again = extract_image_features(
        pages_df.limit(10), blob_col="html", fake=True
    ).collect()
    assert {(r.url, tuple(r.features)) for r in feats} == {
        (r.url, tuple(r.features)) for r in again
    }
    # non-PNG decode is an explicit stub (a truncated PNG signature is
    # not a PNG)
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        list(sample_video_frames(b"x"))


def _encode_png(img, color_type, filters, palette=None):
    """Minimal test-side PNG encoder: 8-bit, non-interlaced, with an
    EXPLICIT filter type per scanline (the spec's filter recurrences
    applied forward) — so the decoder's defiltering of every filter
    type is exercised against ground truth."""
    import struct
    import zlib

    import numpy as np

    h, w = img.shape[:2]
    channels = img.shape[2] if img.ndim == 3 else 1
    px = img.reshape(h, w * channels).astype(np.int32)
    bpp = channels
    stride = w * channels
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = filters[y % len(filters)]
        cur = px[y]
        line = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = int(cur[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc
                                                       else c)
            line[i] = (int(cur[i]) - pred) & 0xFF
        raw.append(ft)
        raw.extend(line.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype, payload):
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I",
                              zlib.crc32(ctype + payload) & 0xFFFFFFFF))

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type,
                                      0, 0, 0))
    if palette is not None:
        out += chunk(b"PLTE", bytes(palette.reshape(-1)))
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += chunk(b"IEND", b"")
    return out


def test_png_decode_real(spark):
    """decode_image decodes REAL PNG bytes without fake=True: RGB/RGBA/
    gray/palette, every scanline filter type, round-tripped against a
    ground-truth encoder; and the Spark feature-extraction stage reports
    true dimensions and identical features for a re-encoded image."""
    import numpy as np

    from prose_spark.operators.multimodal import (
        decode_image,
        extract_image_features,
    )

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    # every filter type appears (rows cycle 0,1,2,3,4)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        got = decode_image(_encode_png(rgb, 2, filters))
        assert np.array_equal(got, rgb), f"filters {filters}"
    # RGBA: alpha dropped
    rgba = np.dstack([rgb, rng.integers(0, 256, (11, 7), dtype=np.uint8)])
    assert np.array_equal(decode_image(_encode_png(rgba, 6, [0, 4])), rgb)
    # grayscale expands to 3 channels
    gray = rng.integers(0, 256, size=(5, 9, 1), dtype=np.uint8)
    got = decode_image(_encode_png(gray, 0, [2, 3]))
    assert np.array_equal(got, np.repeat(gray, 3, axis=2))
    # palette indices map through PLTE
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(6, 6, 1), dtype=np.uint8)
    got = decode_image(_encode_png(idx, 3, [0, 1], palette=pal))
    assert np.array_equal(got, pal[idx[:, :, 0]])

    # Spark stage: real PNG blobs, no fake, true dims + stable features
    blob = _encode_png(rgb, 2, [0, 1, 2, 3, 4])
    df = spark.createDataFrame(
        [("u1", bytearray(blob))], ["url", "html"]
    )
    row = extract_image_features(df, blob_col="html", fake=False).collect()[0]
    assert row.media_meta.mime == "image/png"
    assert (row.media_meta.width, row.media_meta.height) == (7, 11)
    expected = decode_image(blob).reshape(-1, 3).astype("float64")
    assert abs(row.features[0] - expected[:, 0].mean() / 255.0) < 1e-6

    # fake=True NEVER raises, even on malformed/unsupported PNG bytes
    # (the plumbing-test contract); the real path surfaces the error
    bad = b"\x89PNG\r\n\x1a\n" + b"garbage"
    assert decode_image(bad, fake=True).shape == (8, 8, 3)
    with pytest.raises(ValueError):
        decode_image(bad)
    # decompression-bomb guard: a tiny blob declaring a huge image is
    # rejected before any allocation
    import struct
    import zlib as _zlib

    def chunk(ctype, payload):
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I",
                              _zlib.crc32(ctype + payload) & 0xFFFFFFFF))

    bomb = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 100000, 100000,
                                         8, 2, 0, 0, 0))
            + chunk(b"IDAT", _zlib.compress(b"\x00" * 100))
            + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="decode cap"):
        decode_image(bomb)
    # invalid color type follows the 'malformed PNG' ValueError
    # contract, not a bare KeyError (r5 ADVICE)
    badcolor = (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4,
                                             8, 5, 0, 0, 0))
                + chunk(b"IDAT", _zlib.compress(b"\x00" * 100))
                + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="color type 5"):
        decode_image(badcolor)


def _encode_wav(samples, sr, width=2, channels=1):
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(sr)
        if width == 2:
            data = (np.asarray(samples) * 32767).astype("<i2").tobytes()
        else:
            data = ((np.asarray(samples) * 127) + 128).astype(
                "uint8").tobytes()
        w.writeframes(data)
    return buf.getvalue()


def test_wav_audio_decode_real(spark):
    """decode_audio decodes REAL WAV/PCM bytes (stdlib wave + numpy):
    16-bit mono, 8-bit, stereo downmix; the feature kernel recovers a
    known sine frequency via the FFT peak; and the Spark stage reports
    true sample counts. Non-WAV blobs are the documented stub."""
    import numpy as np

    from prose_spark.operators.multimodal import (
        _audio_features,
        decode_audio,
        extract_audio_features,
    )

    sr = 8000
    t = np.arange(sr) / sr           # 1 second
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    x, got_sr, dur = decode_audio(_encode_wav(sine, sr))
    assert got_sr == sr and len(x) == sr and abs(dur - 1.0) < 1e-9
    assert np.max(np.abs(x - sine)) < 1e-3   # 16-bit quantization
    feats = _audio_features(x, sr)
    peak_hz = feats[4] * sr / 2
    assert abs(peak_hz - 440) < 5, peak_hz
    assert abs(feats[0] - 1.0) < 1e-6        # duration
    assert abs(feats[1] - 0.5 / np.sqrt(2)) < 1e-2  # sine RMS

    # 8-bit and stereo paths
    x8, _, _ = decode_audio(_encode_wav(sine, sr, width=1))
    assert np.max(np.abs(x8 - sine)) < 2e-2  # 8-bit quantization
    stereo = np.stack([sine, -sine], axis=1).reshape(-1)
    xs, _, _ = decode_audio(_encode_wav(stereo, sr, channels=2))
    assert np.max(np.abs(xs)) < 1e-3         # L/R cancel in downmix

    # decode-time work cap (r5 ADVICE): a blob longer than
    # _AUDIO_MAX_SECONDS only materializes the capped sample window
    # (readframes stops at the cap — the float64 expansion of the rest
    # never exists), while the duration feature still reports the TRUE
    # header length
    from prose_spark.operators.multimodal import _AUDIO_MAX_SECONDS

    long_sine = 0.5 * np.sin(
        2 * np.pi * 440 * np.arange(sr * (_AUDIO_MAX_SECONDS + 5)) / sr)
    xl, _, dl = decode_audio(_encode_wav(long_sine, sr))
    assert len(xl) == sr * _AUDIO_MAX_SECONDS
    assert abs(dl - (_AUDIO_MAX_SECONDS + 5)) < 1e-9
    assert abs(_audio_features(xl, sr, dl)[0] - dl) < 1e-9

    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04mp3-ish")

    df = spark.createDataFrame(
        [("u1", bytearray(_encode_wav(sine, sr)))], ["url", "audio"]
    )
    row = extract_audio_features(df).collect()[0]
    assert row.audio_meta.sample_rate == sr
    assert row.audio_meta.n_samples == sr
    assert abs(row.features[4] * sr / 2 - 440) < 5

    # errors="null": one bad/NULL blob must not abort a corpus-scale
    # stage — it yields a countable mime="error" row instead
    mixed = spark.createDataFrame(
        [("good", bytearray(_encode_wav(sine, sr))),
         ("bad", bytearray(b"not audio")),
         ("null", None)],
        "url string, audio binary",
    )
    rows = {r.url: r for r in
            extract_audio_features(mixed, errors="null").collect()}
    assert rows["good"].features is not None
    assert rows["bad"].audio_meta.mime == "error"
    assert rows["bad"].features is None
    assert rows["null"].audio_meta.mime == "error"
    with pytest.raises(Exception):
        extract_audio_features(mixed, errors="raise").collect()


def test_html_text_extraction_byte_identity(spark, pages_df):
    # BASELINE.json invariant: extracted text per url byte-identical — the
    # synthetic html wraps the text verbatim, so extraction must reproduce
    # the text column exactly
    from prose_spark.operators.html import html_to_text

    got = pages_df.select(
        "url", "text", html_to_text(F.col("html")).alias("extracted")
    ).collect()
    assert len(got) > 0
    for r in got:
        assert r.extracted == r.text, r.url


def test_html_extract_entities_and_scripts():
    from prose_spark.operators.html import extract_text

    assert extract_text(
        b"<html><script>var x=1;</script><body><p>Hello &amp; bye</p>"
        b"</body></html>"
    ) == "Hello & bye"
    assert extract_text(None) == ""
    # each block tag (open and close) becomes a newline; no squeezing so
    # genuine blank lines in body text survive byte-identically
    assert extract_text(b"<div>a</div><div>b</div>") == "a\n\nb"


def test_canonicalize_drops_pronouns(spark):
    from prose_spark.operators.canonicalize import canonicalize_mentions

    mentions = spark.createDataFrame(
        [("u1", "it"), ("u2", "They"), ("u3", "Acme Corp"), ("u4", "Acme Corp")],
        ["url", "text"],
    )
    canon = canonicalize_mentions(mentions).collect()
    norms = {r.norm for r in canon}
    assert norms == {"acme corp"}


def test_stateful_stream_dedup(spark, pages_df, tmp_path):
    from prose_spark.operators.streaming import stream_dedup_urls

    src = str(tmp_path / "dedup_in")
    # duplicate every url so state must suppress the second occurrence
    dup = pages_df.limit(20).unionAll(pages_df.limit(20))
    dup.write.parquet(src)
    q = (
        stream_dedup_urls(spark, src, str(tmp_path / "ck3"))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("first_seen")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM first_seen").collect()
    urls = [r.url for r in rows]
    assert len(urls) == 20 and len(set(urls)) == 20
    assert all(r.n_in_batch == 2 for r in rows)  # both copies in one batch


def test_kg_job_gold_metrics_in_markers(spark, tmp_path):
    """K6: per-bucket P/R vs a gold triple table lands in the done
    markers (recall is the meaningful signal against the templated-only
    gold; precision is a floor)."""
    from prose_spark.schemas import PAGES_SCHEMA
    from prose_spark.sources.checkpoints import run_kg_job
    from prose_spark.sources.pages import generate_pages_rows

    rows = list(generate_pages_rows(120, seed=42, sentences_per_doc=(3, 8)))
    pages = spark.createDataFrame(
        [(u, ts, h, t, lg) for u, ts, h, t, lg, _ in rows],
        schema=PAGES_SCHEMA,
    )
    gold = spark.createDataFrame(
        [(u, s, p, o) for u, _, _, _, lg, g in rows if lg == "en"
         for s, p, o in g],
        "url string, subj string, pred string, obj string",
    )
    out = str(tmp_path / "kg_gold")
    metrics = run_kg_job(spark, pages, out, n_buckets=4, gold=gold)
    rows_m = metrics.collect()
    assert len(rows_m) == 4
    for r in rows_m:
        assert r.precision is not None and 0.0 <= r.precision <= 1.0
        assert r.recall is not None
    mean_recall = sum(r.recall for r in rows_m) / len(rows_m)
    assert mean_recall >= 0.9, mean_recall


def test_connected_components_gate_paths_agree_on_self_loops(spark):
    """The driver-gate (local union-find) and distributed paths must
    return the same labels for the same input, including nodes whose
    only edges are self-loops."""
    edges = spark.createDataFrame(
        [("x", "x"), ("a", "b")], ["a", "b"]
    )
    from prose_spark.operators.canonicalize import connected_components

    local = {(r.node, r.comp) for r in
             connected_components(edges, driver_threshold=100).collect()}
    dist = {(r.node, r.comp) for r in
            connected_components(edges, driver_threshold=0).collect()}
    assert local == dist == {("x", "x"), ("a", "a"), ("b", "a")}


def test_connected_components_gate_counts_distinct_edges(spark):
    """The r9 single-collect gate must still compare the DISTINCT
    ordered-edge count against driver_threshold, exactly like the former
    distinct+limit shape: a duplicate-heavy input (raw rows >> threshold,
    distinct rows <= threshold) stays on the local path, and one whose
    distinct count exceeds the threshold goes distributed — with
    identical labels either way."""
    from prose_spark.operators.canonicalize import connected_components

    # 900 raw rows, only 3 distinct ordered edges (incl. one reversed
    # duplicate, which counts separately — ordered-row distinct)
    dup_rows = ([("a", "b")] * 400 + [("b", "a")] * 400
                + [("b", "c")] * 100)
    dups = spark.createDataFrame(dup_rows, ["a", "b"])
    stats: dict = {}
    labels = {(r.node, r.comp) for r in connected_components(
        dups, driver_threshold=10, stats=stats).collect()}
    assert stats["path"] == "local", stats
    assert labels == {("a", "a"), ("b", "a"), ("c", "a")}

    # 12 distinct edges > threshold 10 -> distributed, same labels as
    # an uncapped local run
    chain = spark.createDataFrame(
        [(f"n{i}", f"n{i + 1}") for i in range(12)], ["a", "b"]
    )
    stats2: dict = {}
    dist = {(r.node, r.comp) for r in connected_components(
        chain, driver_threshold=10, stats=stats2).collect()}
    assert stats2["path"] == "distributed", stats2
    local = {(r.node, r.comp) for r in connected_components(
        chain, driver_threshold=100).collect()}
    assert dist == local


def test_connected_components_gate_is_byte_aware(spark):
    """The driver gate must decline edge sets whose COLLECTED size would
    blow the driver heap even when the row count is under the threshold:
    a long-surface vocabulary (2KB norms) at 200 edges exceeds a 100KB
    byte cap and must take the distributed path, while the same graph
    with short ids stays on the local path. Labels agree either way."""
    from prose_spark.operators.canonicalize import connected_components

    wide = spark.createDataFrame(
        [("L" * 2048 + str(i), "L" * 2048 + str(i + 1))
         for i in range(200)],
        ["a", "b"],
    )
    stats: dict = {}
    labels = connected_components(
        wide, driver_threshold=1000, driver_max_bytes=100 << 10,
        stats=stats,
    )
    assert stats["path"] == "distributed", stats
    assert labels.select("comp").distinct().count() == 1
    narrow = spark.createDataFrame(
        [(f"n{i}", f"n{i + 1}") for i in range(200)], ["a", "b"]
    )
    stats2: dict = {}
    connected_components(
        narrow, driver_threshold=1000, driver_max_bytes=100 << 10,
        stats=stats2,
    ).collect()
    assert stats2["path"] == "local", stats2
    # the byte estimate covers the RAW input (the local path collects
    # the node list from raw): a self-loop-heavy wide-surface input is
    # tiny after dedup but must still be pushed to the distributed path
    loops = spark.createDataFrame(
        [("L" * 2048 + str(i),) * 2 for i in range(200)] + [("a", "b")],
        ["a", "b"],
    )
    stats3: dict = {}
    connected_components(
        loops, driver_threshold=1000, driver_max_bytes=100 << 10,
        stats=stats3,
    ).collect()
    assert stats3["path"] == "distributed", stats3


def _counting_mentions(spark, rows, acc):
    """Mentions frame whose evaluation increments ``acc`` once per row —
    the probe for single-evaluation guarantees (no task retries in local
    mode, so acc.value == n_rows iff the lineage ran exactly once)."""
    import pandas as pd  # noqa: F401

    base = spark.createDataFrame(rows, ["url", "text"])

    def count_rows(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    return base.mapInPandas(count_rows, base.schema)


def test_canonicalize_evaluates_mentions_lineage_once(spark):
    """canonicalize_mentions must evaluate its (expensive: annotate ->
    mentions) input lineage EXACTLY once — r4 measured ~6 re-runs of the
    NER kernel through the band-join / CC-gate / label-pick action
    chains before the form_counts checkpoint landed."""
    from prose_spark.operators.canonicalize import canonicalize_mentions

    rows = [(f"u{i}", t) for i, t in enumerate(
        ["Acme Corporation", "Acme Corporation", "Acme Corporatio",
         "Globex", "Initech", "Initech Inc"] * 5)]
    acc = spark.sparkContext.accumulator(0)
    m = _counting_mentions(spark, rows, acc)
    canon = canonicalize_mentions(m, jaccard_max_distance=0.4)
    canon.collect()
    canon.count()  # a SECOND action must not re-run the lineage either
    assert acc.value == len(rows), (
        f"mentions lineage evaluated {acc.value / len(rows):.1f}x"
    )


def test_merge_canonicalize_evaluates_each_side_once(spark):
    """merge_canonicalize must evaluate the new-mentions lineage and the
    caller's existing-table lineage exactly once each (the incremental
    path exists to AVOID rework)."""
    from prose_spark.operators.canonicalize import (
        canonicalize_mentions,
        merge_canonicalize,
    )

    old_rows = [(f"o{i}", t) for i, t in enumerate(
        ["Acme Corporation", "Acme Corporatio", "Globex"] * 4)]
    new_rows = [(f"n{i}", t) for i, t in enumerate(
        ["Acme Corporation", "Hooli", "Hooli Inc"] * 3)]
    acc_old = spark.sparkContext.accumulator(0)
    acc_new = spark.sparkContext.accumulator(0)
    existing = canonicalize_mentions(
        _counting_mentions(spark, old_rows, acc_old),
        jaccard_max_distance=0.4,
    )
    assert acc_old.value == len(old_rows)
    new_m = _counting_mentions(spark, new_rows, acc_new)
    merged = merge_canonicalize(new_m, existing,
                                jaccard_max_distance=0.4)
    merged.collect()
    merged.count()
    assert acc_new.value == len(new_rows), (
        f"new-mentions lineage evaluated {acc_new.value / len(new_rows):.1f}x"
    )
    # existing's lineage: its own canonicalize (form_counts checkpoint)
    # already consumed the old rows exactly once; merge_canonicalize's
    # internal checkpoint of `existing` must not re-trigger it
    assert acc_old.value == len(old_rows), (
        f"existing lineage re-evaluated ({acc_old.value} rows counted)"
    )


def test_warc_roundtrip_to_pages(spark, tmp_path):
    """WARC source: synthetic pages serialized as WARC (+member gzip),
    read back through binaryFile + the record parser into the full
    pages schema — url/ts/html survive byte-identically and the
    extracted text equals the generator's source text per url (the
    north-rule invariant through a real archive format)."""
    from prose_spark.sources.pages import generate_pages_rows
    from prose_spark.sources.warc import read_warc_pages, write_warc

    rows = list(generate_pages_rows(30, seed=11, sentences_per_doc=(2, 6)))
    expected = {r[0]: (r[1], r[2], r[3], r[4]) for r in rows}
    half = len(rows) // 2
    write_warc([(r[0], r[1], r[2]) for r in rows[:half]],
               str(tmp_path / "a.warc"))
    write_warc([(r[0], r[1], r[2]) for r in rows[half:]],
               str(tmp_path / "b.warc.gz"))

    pages = read_warc_pages(spark, str(tmp_path / "*.warc*"))
    got = {r["url"]: r for r in pages.collect()}
    assert set(got) == set(expected)
    for url, (ts, html, text, lang) in expected.items():
        r = got[url]
        assert bytes(r["html"]) == html
        assert r["warc_ts"].replace(tzinfo=None) == ts.replace(tzinfo=None)
        assert r["text"] == text  # byte-identity through the archive
    # language-ID fills lang sensibly on the en-dominated corpus
    langs = [r["lang"] for r in got.values()]
    assert langs.count("en") >= len(langs) // 2


def test_warc_parser_skips_non_response_records(tmp_path):
    from prose_spark.sources.warc import parse_warc_bytes

    rec = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n"
           b"\r\nabcd\r\n\r\n"
           b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://x.example/\r\n"
           b"WARC-Date: 2025-01-01T00:00:00Z\r\nContent-Length: 47\r\n\r\n"
           b"HTTP/1.1 200 OK\r\nContent-Length: 9\r\n\r\n<p>hi</p>\r\n\r\n")
    out = list(parse_warc_bytes(rec))
    assert len(out) == 1
    assert out[0]["url"] == "https://x.example/"
    assert out[0]["html"] == b"<p>hi</p>"


def test_warc_streaming_multi_member_bounded_reads(tmp_path):
    """The parser streams: a member-gzipped archive (one gzip member per
    record — Common Crawl's packaging) parses identically to a
    whole-file-gzipped one, the compressed stream is consumed in bounded
    chunks (never one whole-archive read), and records come out of a
    generator one at a time — peak memory ~one record, not ~one archive
    (the production difference between working and OOMing on ~1 GB
    segments at 16 tasks/host)."""
    import datetime as dt
    import gzip
    import hashlib
    import io

    from prose_spark.sources.warc import (
        parse_warc_bytes,
        parse_warc_stream,
        write_warc,
    )

    def incompressible(i, n=20_000):  # deterministic md5 chain
        out, h = [], hashlib.md5(f"seed{i}".encode()).digest()
        while sum(map(len, out)) < n:
            out.append(h)
            h = hashlib.md5(h).digest()
        return b"".join(out)[:n]

    rows = [
        (f"https://x.example/{i}", dt.datetime(2025, 1, 1, 0, 0, i),
         incompressible(i))
        for i in range(50)
    ]
    p_member = tmp_path / "m.warc.gz"
    p_whole = tmp_path / "w.warc.gz"
    write_warc(rows, str(p_member), member_gzip=True)
    write_warc(rows, str(p_whole))
    got_member = list(parse_warc_bytes(p_member.read_bytes()))
    got_whole = list(parse_warc_bytes(p_whole.read_bytes()))
    assert got_member == got_whole
    assert len(got_member) == 50
    assert all(r["html"] == rows[i][2] for i, r in enumerate(got_member))

    # chunked consumption of the COMPRESSED stream: every read request
    # is bounded, and far smaller than the archive
    class Tracking(io.BytesIO):
        max_req = 0

        def read(self, n=-1):
            assert n is not None and n >= 0, "unbounded archive read"
            Tracking.max_req = max(Tracking.max_req, n)
            return super().read(n)

        def readinto(self, b):
            Tracking.max_req = max(Tracking.max_req, len(b))
            return super().readinto(b)

    data = p_member.read_bytes()
    assert len(data) > 800_000  # incompressible payloads: ~1 MB archive
    src = Tracking(data)
    with gzip.GzipFile(fileobj=src) as gz:
        it = parse_warc_stream(gz)
        first = next(it)  # one record consumable without the rest
        assert first == got_member[0]
        assert Tracking.max_req <= 512 * 1024 < len(data)
        rest = list(it)
    assert [first] + rest == got_member


def test_warc_truncated_and_corrupt_streams(tmp_path):
    """EOF-truncated records are DROPPED (their Content-Length framing
    is gone — parsing the fragment would yield garbage rows), and a
    corrupt no-newline run in header position raises instead of
    buffering unbounded bytes through readline."""
    import pytest

    from prose_spark.sources.warc import _MAX_HEADER_LINE, parse_warc_bytes

    good = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://x.example/ok\r\n"
            b"WARC-Date: 2025-01-01T00:00:00Z\r\nContent-Length: 5\r\n"
            b"\r\nhello\r\n\r\n")

    # header cut mid-line by EOF: good record parses, tail is dropped
    cut_header = good + b"WARC/1.0\r\nWARC-Type: respo"
    out = list(parse_warc_bytes(cut_header))
    assert [r["url"] for r in out] == ["https://x.example/ok"]

    # body shorter than Content-Length at EOF: dropped, not yielded
    cut_body = good + (b"WARC/1.0\r\nWARC-Type: response\r\n"
                       b"WARC-Target-URI: https://x.example/cut\r\n"
                       b"Content-Length: 1000\r\n\r\nonly-a-fragment")
    out = list(parse_warc_bytes(cut_body))
    assert [r["url"] for r in out] == ["https://x.example/ok"]

    # corrupt stream: giant newline-free run in header position must
    # raise promptly (bounded readline), never buffer the whole run
    giant = good + b"WARC/1.0\r\n" + b"x" * (_MAX_HEADER_LINE * 4)
    with pytest.raises(ValueError, match="header line exceeds"):
        list(parse_warc_bytes(giant))


def test_oracle_pages_copy_matches_spark_corpus(spark):
    """Three driver oracles (ta_winnowing, ta_html_extract,
    ta_pages_quality) read a PYARROW-written copy of the pages generator
    output instead of the Spark-written corpus the queries scan; this
    pins the assumption that both materializations carry identical
    (url, text, lang) content."""
    import duckdb

    import __spark_entry__ as em

    spark_rows = {
        r["url"]: (r["text"], r["lang"])
        for r in em._pages(spark).select("url", "text", "lang").collect()
    }
    con = duckdb.connect()
    oracle_rows = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            "SELECT url, text, lang FROM "
            f"read_parquet('{em._oracle_pages_parquet()}')"
        ).fetchall()
    }
    assert spark_rows == oracle_rows

"""AnnotateConfig option parity (document.go:29-148): per-document
timeout, progress callback, custom tokenizer/model injection — including
a PRODUCT-trained NER driving the Spark pipeline end-to-end."""

import json
from pathlib import Path

import pytest

from prose_spark.operators.annotate import (
    AnnotateConfig,
    DocumentTimeout,
    annotate_document,
)

REF = Path("/root/reference/testdata")


@pytest.fixture(scope="module")
def product_model():
    from prose_spark.nlp.ner_train import model_from_data

    lines = (REF / "reddit_product.jsonl").read_text().strip().split("\n")
    data = [json.loads(ln) for ln in lines]
    cutoff = int(len(data) * 0.8)
    train = [
        {"text": d["text"], "spans": d.get("spans") or [],
         "accept": d["answer"] == "accept"}
        for d in data[:cutoff]
    ]
    return model_from_data(train)


def test_progress_callback_order():
    seen = []
    cfg = AnnotateConfig(progress_callback=seen.append)
    annotate_document("Victor Hugo founded Acme Corp. It thrived.", cfg)
    # 0.25 segment, 0.5 tokenize, 0.75 tag, 1.0 NER (document.go:199-250)
    assert seen == [0.25, 0.5, 0.75, 1.0]
    seen.clear()
    annotate_document(
        "No tagging here.",
        AnnotateConfig(progress_callback=seen.append, tag=False,
                       extract=False),
    )
    assert seen == [0.25, 0.5]


def test_timeout_raises_between_stages():
    # a vanishingly small positive budget expires before the first stage
    cfg = AnnotateConfig(timeout_sec=1e-9)
    with pytest.raises(DocumentTimeout):
        annotate_document("Some text to process.", cfg)
    # reference parity (document.go:168-172): Timeout <= 0 arms NO
    # deadline — 0 and negative budgets run to completion
    annotate_document("Some text.", AnnotateConfig(timeout_sec=0.0))
    annotate_document("Some text.", AnnotateConfig(timeout_sec=-1.0))
    # generous budget -> fine; default (None) -> no budget at all
    annotate_document("Some text.", AnnotateConfig(timeout_sec=30.0))
    assert AnnotateConfig().timeout_sec is None
    annotate_document("Some text.", AnnotateConfig())


def test_timeouts_are_counted_not_silent(spark):
    """A timed-out doc must be observable: annotate() marks it in the
    annotate_error column, and both bulk operators count it in a Spark
    accumulator — never indistinguishable from an empty/triple-less doc."""
    from pyspark.sql import functions as F

    from prose_spark.operators.annotate import annotate
    from prose_spark.operators.triples import annotate_and_extract_triples

    docs = spark.createDataFrame(
        [(1, "Victor Hugo founded Acme Corp. in Boston in 2001."),
         (2, "Alice Johnson joined Globex Inc. in 1999.")],
        ["doc_id", "text"],
    )
    acc = spark.sparkContext.accumulator(0)
    ann = annotate(docs, cfg=AnnotateConfig(timeout_sec=1e-9),
                   timeout_acc=acc).cache()
    assert ann.filter(F.col("annotate_error") == "timeout").count() == 2
    assert acc.value == 2
    # success path: error column is NULL
    ok = annotate(docs).filter(F.col("annotate_error").isNull())
    assert ok.count() == 2

    acc2 = spark.sparkContext.accumulator(0)
    tr = annotate_and_extract_triples(
        docs, key_cols=("doc_id",),
        cfg=AnnotateConfig(timeout_sec=1e-9), timeout_acc=acc2)
    assert tr.count() == 0 and acc2.value == 2


def test_kg_job_records_timeout_counts(spark, pages_df, tmp_path):
    from prose_spark.sources.checkpoints import run_kg_job

    out = str(tmp_path / "kg_t")
    metrics = run_kg_job(spark, pages_df.limit(40), out, n_buckets=2,
                         timeout_sec=1e-9)
    rows = metrics.collect()
    assert rows and all(r["n_doc_timeouts"] > 0 for r in rows)
    assert all(r["n_triples"] == 0 for r in rows)
    # default config: no budget, zero drops recorded
    out2 = str(tmp_path / "kg_nt")
    m2 = run_kg_job(spark, pages_df.limit(40), out2, n_buckets=2).collect()
    assert m2 and all(r["n_doc_timeouts"] == 0 for r in m2)


def test_using_tokenizer_injection():
    from prose_spark.nlp.tokenizer import IterTokenizer

    cfg = AnnotateConfig(tokenizer=IterTokenizer(), tag=False,
                         extract=False)
    _, toks, _ = annotate_document("A custom-injected tokenizer.", cfg)
    assert [t["text"] for t in toks][:2] == ["A", "custom-injected"]


def test_using_model_product_ner_local(product_model):
    # UsingModel (document.go:68-72): a user-trained PRODUCT extracter
    # replaces the default NER inside the annotate kernel
    cfg = AnnotateConfig(ner=product_model)
    _, _, ents = annotate_document("I like Windows 10.", cfg)
    assert any(e["label"] == "PRODUCT" and "Windows" in e["text"]
               for e in ents), ents


def test_using_model_product_ner_spark_pipeline(product_model, spark,
                                                tmp_path):
    """End-to-end: PRODUCT model -> artifact -> worker-side UsingModel
    (ner_path) -> Spark annotate -> mentions table."""
    from pyspark.sql import functions as F

    from prose_spark.operators.annotate import annotate
    from prose_spark.operators.canonicalize import mentions_from_annotated

    path = str(tmp_path / "product_model.npz")
    product_model.save(path)

    docs = spark.createDataFrame(
        [(1, "I like Windows 10."),
         (2, "The iPhone 6s is a product that people discuss."),
         (3, "Nothing notable here.")],
        ["doc_id", "text"],
    )
    ann = annotate(docs, cfg=AnnotateConfig(ner_path=path))
    m = mentions_from_annotated(ann, key_col="doc_id")
    rows = m.filter(F.col("label") == "PRODUCT").collect()
    assert any("Windows" in r.text for r in rows), rows

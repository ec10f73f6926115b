"""Model persistence round-trip — port of reference model_test.go:11-67
(train PRODUCT model, write, reload, assert "Windows 10" detection) plus
tagger validate/cross-validate (training.go:218-314)."""

import json
from pathlib import Path

import pytest

from prose_spark.nlp.ner import MaxentNER, chunk
from prose_spark.nlp.ner_train import model_from_data
from prose_spark.nlp.tagger import PerceptronTagger, default_tagger
from prose_spark.nlp.tokenizer import tokenize

REF = Path("/root/reference/testdata")


@pytest.fixture(scope="module")
def product_model():
    lines = (REF / "reddit_product.jsonl").read_text().strip().split("\n")
    data = [json.loads(l) for l in lines]
    cutoff = int(len(data) * 0.8)
    train = [
        {"text": d["text"], "spans": d.get("spans") or [],
         "accept": d["answer"] == "accept"}
        for d in data[:cutoff]
    ]
    return model_from_data(train)


def _entities(ner, text):
    words = tokenize(text)
    tags = default_tagger().tag(words)
    labels, confs = ner.classify(words, tags)
    toks = [
        dict(text=w, tag=t, label=l, confidence=c, start=0, end=0)
        for w, t, l, c in zip(words, tags, labels, confs)
    ]
    return chunk(toks)


def test_product_roundtrip(product_model, tmp_path):
    # model_test.go asserts the reloaded model finds "Windows 10" as a
    # PRODUCT in this sentence
    text = "I like Windows 10."
    before = _entities(product_model, text)
    p = tmp_path / "product_model.npz"
    product_model.save(p)
    reloaded = MaxentNER.load(p)
    after = _entities(reloaded, text)
    assert [(e["text"], e["label"]) for e in before] == [
        (e["text"], e["label"]) for e in after
    ]
    assert any(
        e["label"] == "PRODUCT" and "Windows" in e["text"] for e in after
    ), after


def test_tagger_validate_and_cv():
    wsj = [
        (["Pierre", "Vinken", ",", "61", "years", "old", ",", "will",
          "join", "the", "board", "."],
         ["NNP", "NNP", ",", "CD", "NNS", "JJ", ",", "MD", "VB", "DT",
          "NN", "."]),
        (["Mr.", "Vinken", "is", "chairman", "of", "Elsevier", "."],
         ["NNP", "NNP", "VBZ", "NN", "IN", "NNP", "."]),
        (["A", "form", "of", "asbestos", "has", "caused", "cancer", "."],
         ["DT", "NN", "IN", "NN", "VBZ", "VBN", "NN", "."]),
        (["Researchers", "reported", "the", "results", "."],
         ["NNS", "VBD", "DT", "NNS", "."]),
    ] * 3
    t = PerceptronTagger()
    t.train(wsj, iterations=5)
    t.model.finalize()
    res = t.validate(wsj)
    assert res["accuracy"] > 0.9
    cv = PerceptronTagger.cross_validate(wsj, k=3, iterations=5)
    assert 0.0 <= cv["mean_accuracy"] <= 1.0
    assert len(cv["folds"]) == 3
    with pytest.raises(ValueError):
        PerceptronTagger.cross_validate(wsj, k=1)

"""Sentiment ML path tests — ports of the reference's ML/training suite
(sentiment_test.go:330-362 TestFeatureExtraction, :611-634
TestSentimentTraining, :636-661 TestModelIntegration, :663-690
TestModelSerialization) plus GIS/combine unit checks."""

import math

import pytest

from prose_spark.nlp.sentiment_ml import (
    MaxentSentiment,
    combine_scores,
    extract_rich_features,
    extract_simple_features,
    fmt6,
    train_gis,
    train_sentiment_classifier,
    train_sentiment_model,
)
from prose_spark.nlp.tokenizer import tokenize

TRAIN5 = [
    ("This is excellent", "positive"),
    ("This is terrible", "negative"),
    ("This is amazing work", "strong_positive"),
    ("This is awful garbage", "strong_negative"),
    ("This is okay", "neutral"),
]


def test_feature_extraction_rich():
    # TestFeatureExtraction (sentiment_test.go:330-362)
    tokens = [
        {"text": "This", "tag": "DT"},
        {"text": "is", "tag": "VBZ"},
        {"text": "absolutely", "tag": "RB"},
        {"text": "amazing", "tag": "JJ"},
        {"text": "!", "tag": "."},
    ]
    features = extract_rich_features(tokens)
    for expected in ["unigram:this", "unigram:amazing",
                     "bigram:absolutely_amazing", "has_exclamation",
                     "adv_adj:absolutely_amazing"]:
        assert expected in features, expected
    assert features["token_count"] == 5


def test_simple_features_word_lists_and_patterns():
    f = extract_simple_features(
        "I can't believe this AMAZING product is so good !!!".split()
    )
    assert f["strong_pos_count"] == 1  # amazing
    assert f["weak_pos_count"] == 1  # good
    assert f["disbelief_expression"] == 1.0
    assert f["triple_exclamation"] == 1.0
    assert f["all_caps_words"] == 1  # AMAZING
    assert f["intensifiers"] == 1  # so
    assert f["word:amazing"] == 1.0


def test_float_stringify_quirk():
    # model.go:743 / sentiment.go:906 — %.6f keys
    assert fmt6(1.0) == "1.000000"
    assert fmt6(1 / 3) == "0.333333"


def test_training_and_prediction():
    # TestSentimentTraining + TestModelIntegration
    model = train_sentiment_model(TRAIN5)
    assert model is not None
    assert set(model.labels) == {
        "positive", "negative", "strong_positive", "strong_negative",
        "neutral",
    }
    for text, label in TRAIN5:
        pred = model.predict(extract_simple_features(tokenize(text)))
        assert pred["dominant"] == label, (text, pred["dominant"])
        assert abs(sum(pred["scores"].values()) - 1.0) < 1e-9
        assert pred["confidence"] == max(pred["scores"].values())
    # polarity/intensity derivations (sentiment.go:990-1008)
    p = model.predict(extract_simple_features(tokenize("This is amazing work")))
    assert p["polarity"] > 0.5 and p["intensity"] > 0.5
    assert p["subjectivity"] == pytest.approx(1.0 - p["scores"]["neutral"])


def test_gis_cardinality_and_unattested_weights():
    corpus = [({"a": "1.000000", "b": "2.000000"}, "pos"),
              ({"a": "1.000000"}, "neg")]
    model = train_gis(corpus, max_iter=40)
    # cardinality = max features per example + bias (model.go:698-705)
    assert model.cardinality == 3
    # keys never seen with a label stay -inf (model.go:574-579)
    assert math.isinf(model.weights[model.mapping["b-2.000000-pos"]]) is False
    assert "b-2.000000-neg" not in model.mapping
    # the attested 'a' key under both labels gets finite weights
    assert not math.isinf(model.weights[model.mapping["a-1.000000-neg"]])


def test_model_serialization(tmp_path):
    # TestModelSerialization (sentiment_test.go:663-690)
    model = train_sentiment_model(
        [("Great product", "positive"), ("Bad product", "negative")]
    )
    path = str(tmp_path / "sentiment_maxent.json.gz")
    model.save(path)
    loaded = MaxentSentiment.load(path)
    assert loaded.labels == model.labels
    assert loaded.cardinality == model.cardinality
    for text in ["Great product", "Bad product", "meh"]:
        a = model.predict(extract_simple_features(tokenize(text)))
        b = loaded.predict(extract_simple_features(tokenize(text)))
        assert a == b


def test_trainer_rich_classifier_with_validation():
    # Trainer.TrainSentimentClassifier (training.go:431-480); our
    # implementation GIS-fits (deviation documented in sentiment_ml.py)
    data = [(t, lab, "en") for t, lab in TRAIN5] * 4
    model, metrics = train_sentiment_classifier(data, validation_split=0.2)
    assert model is not None
    assert metrics["accuracy"] >= 0.8


def test_combine_scores_empty_passthrough_and_weighting():
    # combineScores (sentiment.go:798-868)
    full = {
        "polarity": 0.8, "intensity": 0.9, "confidence": 0.7,
        "dominant": "strong_positive",
        "scores": {"strong_positive": 0.6, "positive": 0.3, "neutral": 0.1,
                   "negative": 0.0, "strong_negative": 0.0},
    }
    empty = {"polarity": 0, "intensity": 0, "confidence": 0,
             "dominant": "neutral", "scores": {}}
    assert combine_scores(empty, full, 0.6) is full
    assert combine_scores(full, empty, 0.6) is full
    other = {
        "polarity": -0.4, "intensity": 0.5, "confidence": 0.5,
        "dominant": "negative",
        "scores": {"strong_positive": 0.0, "positive": 0.1, "neutral": 0.3,
                   "negative": 0.5, "strong_negative": 0.1},
    }
    c = combine_scores(full, other, 0.6)
    assert c["polarity"] == pytest.approx(0.8 * 0.4 + (-0.4) * 0.6)
    assert c["confidence"] == pytest.approx(0.7 * 0.4 + 0.5 * 0.6)
    assert sum(c["scores"].values()) == pytest.approx(1.0)
    assert c["dominant"] == max(c["scores"], key=c["scores"].get)


def test_analyzer_ml_integration():
    # model.SentimentAnalyzer + AnalyzeDocument with UseML
    # (sentiment.go:104-108: ML combined at weight 0.6)
    from prose_spark.nlp.sentiment import analyze_document

    model = train_sentiment_model(TRAIN5)
    base = analyze_document("This is amazing work")
    with_ml = analyze_document("This is amazing work", ml_model=model)
    assert with_ml["dominant"] == "strong_positive"
    # ML adds its (high) confidence into the blend
    assert with_ml["confidence"] != base["confidence"]
    # no model -> byte-identical to the lexicon path (nil classifier)
    assert analyze_document("This is amazing work", ml_model=None) == base


def test_committed_artifact_predicts():
    from prose_spark.nlp.sentiment import analyze_document
    from prose_spark.operators.sentiment_ops import default_sentiment_model

    model = default_sentiment_model()
    cases = {
        "The service is absolutely magnificent!": "strong_positive",
        "The update is decent.": "positive",
        "The food is mediocre.": "negative",
        "The hotel is a revolting nightmare!": "strong_negative",
        "The product ships in a box.": "neutral",
    }
    for text, want in cases.items():
        got = analyze_document(text, ml_model=model)
        assert got["dominant"] == want, (text, got["dominant"], want)


def _naive_gis(corpus, max_iter):
    """Straight-line mirror of model.go:479-713 (maps and loops, no
    numpy) — the independent oracle for the vectorized trainer."""
    import math

    labels, mapping = [], {}
    for feats, lab in corpus:
        if lab not in labels:
            labels.append(lab)
        for name, val in feats.items():
            key = f"{name}-{val}-{lab}"
            mapping.setdefault(key, len(mapping))
    for lab in labels:
        mapping.setdefault(f"__BIAS__-1-{lab}", len(mapping))
    cardinality = max(len(f) + 1 for f, _ in corpus)
    corpus = [({**f, "__BIAS__": "1"}, lab) for f, lab in corpus]
    rows = len(mapping) + 1
    emp = [0.0] * rows
    for feats, lab in corpus:
        for name, val in feats.items():
            idx = mapping.get(f"{name}-{val}-{lab}")
            if idx is not None:
                emp[idx] += 1
    unattested = [i for i in range(rows) if emp[i] == 0.0]
    log_emp = [math.log(c) if c > 0 else c for c in emp]
    w = [0.0] * rows
    for i in unattested:
        w[i] = -math.inf
    c_inv = 1.0 / cardinality
    for it in range(max_iter):
        est = [0.0] * rows
        for feats, _ in corpus:
            scores = {}
            for lab in labels:
                s = 0.0
                for name, val in feats.items():
                    idx = mapping.get(f"{name}-{val}-{lab}")
                    if idx is not None and not math.isinf(w[idx]):
                        s += w[idx]
                scores[lab] = math.exp(s)
            z = sum(scores.values())
            for lab in labels:
                p = scores[lab] / z
                for name, val in feats.items():
                    idx = mapping.get(f"{name}-{val}-{lab}")
                    if idx is not None:
                        est[idx] += p
        for i in unattested:
            est[i] += 1.0
        log_est = [math.log(c) if c > 0 else c for c in est]
        delta = [(log_emp[i] - log_est[i]) * c_inv for i in range(rows)]
        for i in range(rows):
            if not math.isinf(w[i]):
                w[i] += delta[i]
        if it > 0 and it % 10 == 0:
            avg = sum(abs(delta[i]) for i in range(rows)
                      if not math.isinf(w[i])) / rows
            if avg < 0.0005 and it > 30:
                break
    return labels, mapping, w, cardinality


def test_vectorized_gis_matches_naive_reference():
    """The numpy GIS trainer must reproduce the reference algorithm's
    weights exactly (same mapping, same updates, same early stopping) —
    checked against a loop-for-loop mirror of model.go."""
    import numpy as np

    corpus = [
        ({"word:great": "1.000000", "pos_count": "1.000000"}, "positive"),
        ({"word:bad": "1.000000", "neg_count": "1.000000"}, "negative"),
        ({"word:great": "1.000000", "word:bad": "1.000000"}, "neutral"),
        ({"word:fine": "1.000000"}, "neutral"),
        ({"word:great": "2.000000", "pos_count": "2.000000"}, "positive"),
    ]
    model = train_gis([(dict(f), lab) for f, lab in corpus], max_iter=45)
    labels, mapping, w, card = _naive_gis(
        [(dict(f), lab) for f, lab in corpus], max_iter=45
    )
    assert model.labels == labels
    assert model.mapping == mapping
    assert model.cardinality == card
    assert len(model.weights) == len(w)
    for i, (a, b) in enumerate(zip(model.weights.tolist(), w)):
        if np.isinf(b):
            assert np.isinf(a), i
        else:
            assert abs(a - b) < 1e-9, (i, a, b)

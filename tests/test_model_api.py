"""Top-level Model/Trainer API (model.go:15-155, training.go:20-480):
bundle construction from data sources, disk round-trip, early-stopping
POS training, and the UsingModel -> annotate path."""

from pathlib import Path

import pytest

from prose_spark.nlp.model import (
    Model,
    Trainer,
    TrainingConfig,
    model_from_data,
    model_from_disk,
    using_sentiment,
)

WSJ = [
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
] * 5


def test_model_from_data_with_sentiment(tmp_path):
    data = [
        ("This is excellent", "positive"),
        ("This is terrible", "negative"),
        ("This is okay", "neutral"),
    ]
    model = model_from_data("test-sentiment", using_sentiment(data))
    assert model.sentiment_model is not None
    analyze = model.sentiment_analyzer()
    s = analyze("This is excellent")
    assert s["dominant"] in ("positive", "strong_positive")
    # disk round-trip (Write -> ModelFromDisk)
    model.write(str(tmp_path / "m"))
    loaded = model_from_disk(str(tmp_path / "m"))
    assert loaded.sentiment_model is not None
    assert loaded.sentiment_model.labels == model.sentiment_model.labels
    s2 = loaded.sentiment_analyzer()("This is excellent")
    assert s2 == s


def test_model_annotate_config_uses_model():
    from prose_spark.operators.annotate import annotate_document

    model = Model("custom", tagger=None, extracter=None)
    cfg = model.annotate_config(extract=False, tag=False)
    _, toks, _ = annotate_document("Just tokens here.", cfg)
    assert [t["text"] for t in toks] == ["Just", "tokens", "here", "."]


def test_trainer_pos_early_stopping():
    progress = []
    cfg = TrainingConfig(iterations=50, patience=3, validation_split=0.25,
                         progress_callback=lambda e, l, a:
                         progress.append((e, round(l, 3))))
    tagger, metrics = Trainer(cfg).train_pos_tagger(WSJ)
    # tiny repeated corpus converges quickly -> early stop well under 50
    assert metrics.converged
    assert metrics.epochs_completed < 50
    assert metrics.final_accuracy > 0.9
    assert progress and progress[0][0] == 0
    # the returned (averaged) tagger is usable on held-in sentences
    assert tagger.validate(WSJ)["accuracy"] > 0.9


def test_trainer_rejects_empty():
    with pytest.raises(ValueError):
        Trainer().train_pos_tagger([])


def test_trainer_cross_validate():
    res = Trainer().cross_validate_pos_tagger(WSJ, k=3)
    assert len(res["folds"]) == 3
    assert 0.0 <= res["mean_accuracy"] <= 1.0


def test_multilingual_api_helpers():
    from prose_spark.nlp.multilingual import (
        is_supported,
        supported_languages,
        tokenization_rules,
    )

    assert is_supported("de") and not is_supported("xx")
    assert set(supported_languages()) == {"en", "es", "fr", "de", "ja"}
    assert "qu'" in tokenization_rules("fr")
    assert tokenization_rules("en") == ()

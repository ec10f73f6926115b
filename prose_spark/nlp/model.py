"""Top-level Model + Trainer API — the reference's user-facing surface
(model.go:15-155, training.go:20-480) so a reference user can switch 1:1.

- Model bundles tagger + entity extracter + sentiment model;
  model_from_data / using_entities / using_sentiment mirror
  ModelFromData / UsingEntities / UsingSentiment (model.go:28-81);
  Model.write / model_from_disk mirror Write / ModelFromDisk
  (model.go:84-145) with our artifact formats (ner.npz,
  sentiment/maxent.json.gz, tagger.json.gz) in place of gob files.
- Trainer mirrors training.go: per-epoch perceptron training with
  validation split, early stopping with patience, progress callback,
  k-fold cross-validation, and sentiment-classifier training (which,
  unlike the reference's — training.go:459 calls the NER `encode` and
  never fits weights — runs the real GIS fit; documented deviation).

A Model plugs into the Spark pipeline through ``annotate_config()``
(UsingModel, document.go:68-72): locally by object, or across Spark
workers by artifact path (weights load once per worker).
"""

from __future__ import annotations

import math
import random
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

from prose_spark.nlp.ner import MaxentNER
from prose_spark.nlp.tagger import PerceptronTagger, default_tagger


class Model:
    """Named bundle of NLP components (model.go:15-22)."""

    def __init__(self, name: str, tagger=None, extracter=None,
                 sentiment_model=None):
        self.name = name
        self.tagger = tagger
        self.extracter = extracter
        self.sentiment_model = sentiment_model

    # -- persistence (model.go:84-145) ---------------------------------------

    def write(self, path: str) -> None:
        p = Path(path)
        p.mkdir(parents=True, exist_ok=True)
        if self.extracter is not None:
            self.extracter.save(p / "ner.npz")
        if self.sentiment_model is not None:
            (p / "sentiment").mkdir(exist_ok=True)
            self.sentiment_model.save(str(p / "sentiment" / "maxent.json.gz"))
        if self.tagger is not None and self.tagger is not default_tagger():
            self.tagger.save(p / "tagger.json.gz")

    def annotate_config(self, **kwargs):
        """AnnotateConfig wired to this model's components (UsingModel)."""
        from prose_spark.operators.annotate import AnnotateConfig

        return AnnotateConfig(ner=self.extracter, tagger=self.tagger,
                              **kwargs)

    def sentiment_analyzer(self) -> Callable[[str], dict]:
        """analyze(text) -> score dict, ML-combined when this model has a
        trained sentiment classifier (model.go:148-154)."""
        from prose_spark.nlp.sentiment import analyze_document

        def analyze(text: str, lang: str = "en") -> dict:
            return analyze_document(text, lang,
                                    ml_model=self.sentiment_model)

        return analyze


def model_from_disk(path: str) -> Model:
    """ModelFromDisk (model.go:84-93)."""
    p = Path(path)
    extracter = MaxentNER.load(p / "ner.npz") if (p / "ner.npz").exists() \
        else None
    sent_path = p / "sentiment" / "maxent.json.gz"
    sentiment = None
    if sent_path.exists():
        from prose_spark.nlp.sentiment_ml import MaxentSentiment

        sentiment = MaxentSentiment.load(str(sent_path))
    tagger = (PerceptronTagger.load(p / "tagger.json.gz")
              if (p / "tagger.json.gz").exists() else default_tagger())
    return Model(p.name, tagger=tagger, extracter=extracter,
                 sentiment_model=sentiment)


# -- data sources (model.go:24-52) -------------------------------------------

def using_entities(data: list[dict]):
    """UsingEntities: labeled spans -> trained Maxent NER."""
    def source(model: Model) -> None:
        from prose_spark.nlp.ner_train import model_from_data as ner_train

        model.extracter = ner_train(data, tagger=model.tagger)

    return source


def using_sentiment(data: list[tuple[str, str]]):
    """UsingSentiment: (text, label) pairs -> GIS sentiment model."""
    def source(model: Model) -> None:
        from prose_spark.nlp.sentiment_ml import train_sentiment_model

        model.sentiment_model = train_sentiment_model(data)

    return source


def model_from_data(name: str, *sources) -> Model:
    """ModelFromData (model.go:74-81)."""
    model = Model(name, tagger=default_tagger())
    for source in sources:
        source(model)
    return model


# -- Trainer (training.go:20-480) ---------------------------------------------

@dataclass
class TrainingConfig:
    """DefaultTrainingConfig (training.go:26-39); L1/L2/batch knobs are
    accepted for signature parity but the averaged perceptron has no
    regularization path (the reference ignores them too)."""

    iterations: int = 100
    learning_rate: float = 0.01
    regularization_l1: float = 0.0
    regularization_l2: float = 0.001
    early_stopping: bool = True
    validation_split: float = 0.2
    patience: int = 10
    batch_size: int = 32
    seed: int = 42
    progress_callback: Callable[[int, float, float], None] | None = None


@dataclass
class TrainingMetrics:
    final_loss: float = 0.0
    final_accuracy: float = 0.0
    best_loss: float = math.inf
    best_accuracy: float = 0.0
    epochs_completed: int = 0
    training_time_sec: float = 0.0
    converged: bool = False


@dataclass
class Trainer:
    config: TrainingConfig = field(default_factory=TrainingConfig)

    def train_pos_tagger(
        self, data: list[tuple[list[str], list[str]]]
    ) -> tuple[PerceptronTagger, TrainingMetrics]:
        """TrainPOSTagger (training.go:80-215): per-epoch shuffled
        perceptron passes, validation-split early stopping with patience,
        weights averaged once at the end."""
        if not data:
            raise ValueError("training data is empty")
        t0 = time.time()
        cfg = self.config
        if cfg.early_stopping and cfg.validation_split > 0:
            split = int(len(data) * (1.0 - cfg.validation_split))
            train_data, valid_data = list(data[:split]), list(data[split:])
        else:
            train_data, valid_data = list(data), []

        tagger = PerceptronTagger()
        tagger.make_tag_map(train_data)
        rng = random.Random(cfg.seed)
        metrics = TrainingMetrics()
        patience_left = cfg.patience
        for epoch in range(cfg.iterations):
            rng.shuffle(train_data)
            tagger.train_epoch(train_data)
            metrics.epochs_completed = epoch + 1
            if valid_data:
                # no memo clear needed here: train_epoch rebinds
                # tagger._memo at its start, the single authoritative
                # invalidation for weight changes
                res = tagger.validate(valid_data)
                acc, loss = res["accuracy"], res["loss"]
                metrics.final_accuracy, metrics.final_loss = acc, loss
                if cfg.progress_callback is not None:
                    cfg.progress_callback(epoch, loss, acc)
                if loss < metrics.best_loss:
                    metrics.best_loss = loss
                    metrics.best_accuracy = acc
                    patience_left = cfg.patience
                else:
                    patience_left -= 1
                    if cfg.early_stopping and patience_left <= 0:
                        metrics.converged = True
                        break
        tagger.model.average_weights()
        tagger._memo.clear()
        if valid_data:
            res = tagger.validate(valid_data)
            metrics.final_accuracy = res["accuracy"]
            metrics.final_loss = res["loss"]
            metrics.best_accuracy = max(metrics.best_accuracy,
                                        metrics.final_accuracy)
            metrics.best_loss = min(metrics.best_loss, metrics.final_loss)
        metrics.training_time_sec = time.time() - t0
        return tagger, metrics

    def cross_validate_pos_tagger(
        self, data: list[tuple[list[str], list[str]]], k: int
    ) -> dict:
        """CrossValidatePOSTagger (training.go:256-314)."""
        return PerceptronTagger.cross_validate(
            data, k=k, iterations=min(self.config.iterations, 5),
            seed=self.config.seed,
        )

    def train_sentiment_classifier(
        self, data: list[tuple[str, str]] | list[tuple[str, str, str]]
    ):
        """TrainSentimentClassifier (training.go:431-480); GIS-fit
        (documented deviation — see module docstring)."""
        from prose_spark.nlp.sentiment_ml import train_sentiment_classifier

        model, m = train_sentiment_classifier(
            data, validation_split=self.config.validation_split
            if self.config.early_stopping else 0.0,
        )
        metrics = TrainingMetrics(
            final_accuracy=m.get("accuracy", 1.0),
            best_accuracy=m.get("accuracy", 1.0),
            epochs_completed=m.get("epochs", 1),
            converged=m.get("converged", True),
        )
        return model, metrics

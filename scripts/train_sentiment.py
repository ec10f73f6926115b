"""Train the committed Maxent sentiment model
(prose_spark/models/sentiment_maxent.json.gz).

Deterministic synthetic labeled corpus (seed=42) built from the simple
feature extractor's own intensity word lists (model.go:264-283) plus
neutral filler — the same protocol as the reference's UsingSentiment
path (model.go:716-766): simple features over PTB tokens, GIS fit.

Usage: python3 scripts/train_sentiment.py [out_path]
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from prose_spark.nlp.sentiment_ml import (  # noqa: E402
    STRONG_NEG_WORDS,
    STRONG_POS_WORDS,
    WEAK_NEG_WORDS,
    WEAK_POS_WORDS,
    extract_simple_features,
    train_sentiment_model,
)
from prose_spark.nlp.tokenizer import tokenize  # noqa: E402

SUBJECTS = ["this product", "the service", "the movie", "their support",
            "the update", "this release", "the food", "the hotel"]
NEUTRAL_TAILS = ["arrived on schedule", "ships in a box",
                 "has twelve settings", "was released in March",
                 "uses a standard connector", "comes in three sizes"]
INTENSIFIERS = ["absolutely", "really", "truly", "incredibly", ""]


def build_corpus(seed: int = 42) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    rows: list[tuple[str, str]] = []

    def sent(words: list[str], label: str, n: int, bang: bool):
        for _ in range(n):
            subj = rng.choice(SUBJECTS)
            w = rng.choice(words)
            inten = rng.choice(INTENSIFIERS)
            end = "!" if bang and rng.random() < 0.6 else "."
            text = f"{subj.capitalize()} is {inten} {w}{end}".replace("  ", " ")
            rows.append((text, label))

    sent(sorted(STRONG_POS_WORDS), "strong_positive", 80, bang=True)
    sent(sorted(WEAK_POS_WORDS), "positive", 80, bang=False)
    sent(sorted(WEAK_NEG_WORDS), "negative", 80, bang=False)
    sent(sorted(STRONG_NEG_WORDS), "strong_negative", 80, bang=True)
    for _ in range(80):
        subj = rng.choice(SUBJECTS)
        tail = rng.choice(NEUTRAL_TAILS)
        rows.append((f"{subj.capitalize()} {tail}.", "neutral"))
    rng.shuffle(rows)
    return rows


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else str(
        Path(__file__).resolve().parent.parent
        / "prose_spark" / "models" / "sentiment_maxent.json.gz"
    )
    rows = build_corpus()
    split = int(len(rows) * 0.85)
    train, valid = rows[:split], rows[split:]
    model = train_sentiment_model(train)
    correct = sum(
        model.predict(extract_simple_features(tokenize(t)))["dominant"] == lab
        for t, lab in valid
    )
    acc = correct / len(valid)
    print(f"trained on {len(train)}; holdout accuracy {acc:.4f} "
          f"({correct}/{len(valid)})")
    model.save(out)
    print(f"wrote {out} ({len(model.mapping)} features, "
          f"labels {model.labels})")


if __name__ == "__main__":
    main()

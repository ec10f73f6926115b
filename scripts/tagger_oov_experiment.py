"""Dev harness: measure the held-out tagger split's OOV error profile.

Trains the 80/20 interleaved split from
tests/test_tagger.py::test_tag_heldout_generalization (iterations=5,
seed=42 — deterministic) and breaks the held-out errors down by
whether the word was OOV w.r.t. the TRAIN split, by gold tag, and by
(gold -> predicted) confusion, so the morphological OOV fallback
(r6 verdict item #2) is designed against measured error mass instead
of anecdotes.

Usage: python scripts/tagger_oov_experiment.py
"""

from __future__ import annotations

import json
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from prose_spark.gobdec import decode_gob_file
from prose_spark.nlp.tagger import PerceptronTagger, normalize

REF = Path("/root/reference")


def main() -> None:
    toks = json.loads((REF / "testdata/treebank_tokens.json").read_text())
    words = [t["text"] for t in toks]
    tags = json.loads((REF / "testdata/treebank_tags.json").read_text())
    sents, cw, ct = [], [], []
    for w, t in zip(words, tags):
        cw.append(w)
        ct.append(t)
        if t == "." and len(cw) > 1:
            sents.append((cw, ct))
            cw, ct = [], []
    if cw:
        sents.append((cw, ct))
    train = [s for i, s in enumerate(sents) if i % 5 != 0]
    test = [s for i, s in enumerate(sents) if i % 5 == 0]

    classes = decode_gob_file(
        str(REF / "model/AveragedPerceptron/classes.gob"))
    tag_map = decode_gob_file(str(REF / "model/AveragedPerceptron/tags.gob"))
    tagger = PerceptronTagger(tag_map=dict(tag_map), classes=list(classes))
    tagger.train(train, iterations=5, seed=42, build_tag_map=False)

    train_vocab = {normalize(w) for s in train for w in s[0]}
    held_w = [w for s in test for w in s[0]]
    held_t = [t for s in test for t in s[1]]
    pred = tagger.tag(held_w)

    n = len(held_t)
    errs = [(w, g, p) for w, g, p in zip(held_w, held_t, pred) if g != p]
    oov_errs = [(w, g, p) for w, g, p in errs
                if normalize(w) not in train_vocab]
    n_oov = sum(1 for w in held_w if normalize(w) not in train_vocab)
    acc = 1 - len(errs) / n
    print(f"held-out: {n} tokens, acc {acc:.4f}, {len(errs)} errors")
    print(f"OOV tokens: {n_oov} ({n_oov / n:.3%}); OOV errors: "
          f"{len(oov_errs)} ({len(oov_errs) / max(len(errs), 1):.1%} of "
          f"errors; OOV err rate {len(oov_errs) / max(n_oov, 1):.3f})")

    print("\ntop OOV confusions (gold -> pred):")
    for (g, p), c in Counter(
            (g, p) for _, g, p in oov_errs).most_common(20):
        ws = [w for w, gg, pp in oov_errs if (gg, pp) == (g, p)][:8]
        print(f"  {g:5s} -> {p:5s}  {c:4d}  e.g. {ws}")

    print("\ntop in-vocab confusions (gold -> pred):")
    iv_errs = [(w, g, p) for w, g, p in errs
               if normalize(w) in train_vocab]
    for (g, p), c in Counter(
            (g, p) for _, g, p in iv_errs).most_common(12):
        ws = [w for w, gg, pp in iv_errs if (gg, pp) == (g, p)][:6]
        print(f"  {g:5s} -> {p:5s}  {c:4d}  e.g. {ws}")


if __name__ == "__main__":
    main()

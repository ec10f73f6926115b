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
    tagger.train(train, iterations=5, seed=42, build_tag_map=False,
                 build_morph=False)

    if len(sys.argv) > 1 and sys.argv[1] == "penalty":
        # soft tag-dict penalty grid (one trained model, morph on)
        held_w = [w for s in test for w in s[0]]
        held_t = [t for s in test for t in s[1]]
        n = len(held_t)
        base = sum(p == t for p, t in zip(tagger.tag(held_w), held_t))
        print(f"baseline: {base}/{n} = {base / n:.4f}")
        tagger.build_morph(train)
        for pen in (0.25, 0.5, 1.0, 2.0, 4.0, 8.0):
            tagger.build_tag_dict(train, penalty=pen)
            c = sum(p == t for p, t in zip(tagger.tag(held_w), held_t))
            print(f"penalty={pen}: {c}/{n} = {c / n:.4f} ({c - base:+d})")
        return

    if len(sys.argv) > 1 and sys.argv[1] == "tagdict":
        # tag-dictionary constraint grid (reuses the one trained model),
        # alone and combined with the morph prior
        held_w = [w for s in test for w in s[0]]
        held_t = [t for s in test for t in s[1]]
        n = len(held_t)
        base = sum(p == t for p, t in zip(tagger.tag(held_w), held_t))
        print(f"baseline: {base}/{n} = {base / n:.4f}")
        for min_n in (1, 2, 3, 5):
            tagger.build_tag_dict(train, min_n=min_n)
            tagger.morph = None
            tagger._memo = {}
            c = sum(p == t for p, t in zip(tagger.tag(held_w), held_t))
            print(f"tag_dict min_n={min_n}: {c}/{n} = {c / n:.4f} "
                  f"({c - base:+d})")
            tagger.build_morph(train, rare_max=10, min_count=5, alpha=0.4)
            tagger._memo = {}
            tagger._morph_cache = {}
            c = sum(p == t for p, t in zip(tagger.tag(held_w), held_t))
            print(f"tag_dict min_n={min_n} + morph: {c}/{n} = {c / n:.4f} "
                  f"({c - base:+d})")
            tagger.morph = None
        return

    if len(sys.argv) > 1 and sys.argv[1] == "iters":
        # held-out accuracy vs training iterations (fresh model each)
        held_w = [w for s in test for w in s[0]]
        held_t = [t for s in test for t in s[1]]
        n = len(held_t)
        for it in (5, 8, 12, 20, 30):
            tg = PerceptronTagger(tag_map=dict(tag_map),
                                  classes=list(classes))
            tg.train(train, iterations=it, seed=42, build_tag_map=False,
                     build_morph=False)
            c = sum(p == t for p, t in zip(tg.tag(held_w), held_t))
            print(f"iterations={it}: {c}/{n} = {c / n:.4f}")
        return

    if len(sys.argv) > 1 and sys.argv[1] == "grid":
        # grid-search the morph-fallback hyperparameters on the held-out
        # split (one trained model, morph table rebuilt per config)
        held_w = [w for s in test for w in s[0]]
        held_t = [t for s in test for t in s[1]]
        base = sum(p == t for p, t in zip(tagger.tag(held_w), held_t))
        n = len(held_t)
        print(f"baseline (no morph): {base}/{n} = {base / n:.4f}")
        for rare_max in (3, 5, 10):
            for min_count in (3, 5, 10):
                for alpha in (0.2, 0.4, 0.6, 1.0, 2.0):
                    tagger.build_morph(train, rare_max=rare_max,
                                       min_count=min_count, alpha=alpha)
                    tagger._memo = {}
                    tagger._morph_cache = {}
                    c = sum(p == t
                            for p, t in zip(tagger.tag(held_w), held_t))
                    print(f"rare<={rare_max} min={min_count} a={alpha}: "
                          f"{c}/{n} = {c / n:.4f} ({c - base:+d})")
        return

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

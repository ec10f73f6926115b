"""Dev harness: score the triple extractor against the tuned and
held-out open-text golds, with optional per-sentence failure dumps.

Usage:
  python3 scripts/triple_gold_score.py                # both sets, summary
  python3 scripts/triple_gold_score.py --fail         # + FP/FN dump
  python3 scripts/triple_gold_score.py --sent "..."   # debug one sentence
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from prose_spark.operators.annotate import annotate_document  # noqa: E402
from prose_spark.operators.triples import extract_triples_doc  # noqa: E402


# the matching convention lives in ONE place — the regression test —
# so this dev harness can never drift from what the floors measure
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
from test_triples_open_gold import _tri_match  # noqa: E402


def score(path: Path, dump: bool) -> tuple[float, float]:
    data = json.loads(path.read_text())["sentences"]
    n_pred = n_pm = n_gold = n_gm = 0
    for i, e in enumerate(data):
        _, toks, _ = annotate_document(e["sent"])
        pred = [(t["subj"], t["pred"], t["obj"])
                for t in extract_triples_doc(toks)]
        gold = [tuple(x) for x in e["gold"]]
        n_pred += len(pred)
        n_gold += len(gold)
        n_pm += sum(any(_tri_match(p, g) for g in gold) for p in pred)
        n_gm += sum(any(_tri_match(p, g) for p in pred) for g in gold)
        if dump:
            fp = [p for p in pred if not any(_tri_match(p, g) for g in gold)]
            fn = [g for g in gold if not any(_tri_match(p, g) for p in pred)]
            if fp or fn:
                print(f"--- [{i}] {e['sent']}")
                for p in fp:
                    print(f"    FP: {p}")
                for g in fn:
                    print(f"    FN: {g}")
    p = n_pm / max(n_pred, 1)
    r = n_gm / max(n_gold, 1)
    print(f"{path.name}: P={n_pm}/{n_pred}={p:.4f}  R={n_gm}/{n_gold}={r:.4f}")
    return p, r


def main() -> None:
    gdir = Path(__file__).resolve().parent.parent / "tests" / "goldens"
    if "--sent" in sys.argv:
        sent = sys.argv[sys.argv.index("--sent") + 1]
        _, toks, _ = annotate_document(sent)
        print([(t["text"], t["tag"]) for t in toks])
        for t in extract_triples_doc(toks):
            print((t["subj"], t["pred"], t["obj"]))
        return
    dump = "--fail" in sys.argv
    score(gdir / "open_text_triples_gold.json", dump)
    score(gdir / "open_text_triples_heldout.json", dump)


if __name__ == "__main__":
    main()

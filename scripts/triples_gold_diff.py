"""Dev harness: list per-sentence FP/FN triples on the tuned and
held-out gold pools, with the token/tag stream for each failing
sentence — the round-7 guard-retuning loop after the tagger OOV fix
changed the tag profile the grammar was tuned against.

Usage: python scripts/triples_gold_diff.py [tuned|heldout] [max_shown]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from prose_spark.operators.annotate import annotate_document
from prose_spark.operators.triples import extract_triples_doc

GOLDENS = Path(__file__).resolve().parent.parent / "tests" / "goldens"
sys.path.insert(0, str(GOLDENS.parent))
from test_triples_open_gold import _tri_match  # noqa: E402


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "tuned"
    max_shown = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    fname = ("open_text_triples_gold.json" if which == "tuned"
             else "open_text_triples_heldout.json")
    data = json.loads((GOLDENS / fname).read_text())["sentences"]
    n_pred = n_pred_match = n_gold = n_gold_match = 0
    shown = 0
    for e in data:
        _, toks, _ = annotate_document(e["sent"])
        pred = [(t["subj"], t["pred"], t["obj"])
                for t in extract_triples_doc(toks)]
        gold = [tuple(x) for x in e["gold"]]
        n_pred += len(pred)
        n_gold += len(gold)
        pm = [p for p in pred if any(_tri_match(p, g) for g in gold)]
        gm = [g for g in gold if any(_tri_match(p, g) for p in pred)]
        n_pred_match += len(pm)
        n_gold_match += len(gm)
        fps = [p for p in pred if p not in pm]
        fns = [g for g in gold if g not in gm]
        if (fps or fns) and shown < max_shown:
            shown += 1
            print(f"--- {e['sent'][:110]}")
            print("    tags:", " ".join(
                f"{t['text']}/{t['tag']}" for t in toks)[:400])
            for p in fps:
                print(f"    FP: {p}")
            for g in fns:
                print(f"    FN: {g}")
    print(f"\n{which}: P = {n_pred_match}/{n_pred} = "
          f"{n_pred_match / max(n_pred, 1):.4f}, "
          f"R = {n_gold_match}/{n_gold} = "
          f"{n_gold_match / max(n_gold, 1):.4f}")


if __name__ == "__main__":
    main()

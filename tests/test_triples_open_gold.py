"""Open-text triple quality vs HAND-LABELED gold (r4, grown r5).

The templated-corpus number (P=1.0 / R>=0.95, test_spark_pipeline
test_triple_recall_vs_templated_gold) measures the extractor on
sentences the generator itself emits — it overstates open-text
precision of the POS-pattern grammar. This suite measures the same
extractor on 104 hand-labeled sentences from the reference's own
testdata (article.txt + sherlock.txt; gold file documents the labeling
convention) with standard lenient OIE matching: a predicted triple
matches a gold triple when each slot's normalized token set is
contained in (or contains) the gold slot's.

Measured r5 baselines (deterministic kernel, pinned models; after the
r5 guard batch: non-finite/absolutive suppression, negation +
subordinate-clause scope, object-before-next-same-clause-verb with
parenthetical and coordination handling, even-comma subject walk with
quote boundaries, relative-object fallback, object-control infinitive
re-binding, light-verb folding, it-cleft/existential/inversion drops):
P = 0.8092 (123/152), R = 0.8200 (123/150) after the r5
negation-scope/parenthetical-share fixes + 4-sentence migration from
the held-out file; on the original 55
sentences P >= 0.80 / R >= 0.83 (r4: 0.6509 / 0.7975) — recorded in
BASELINE.md next to the templated number. The floors below are
regression guards a few points under the measurement.
"""

import json
import re
from pathlib import Path

GOLD = Path(__file__).parent / "goldens" / "open_text_triples_gold.json"


def _toks(s: str) -> set[str]:
    out = set()
    for t in s.lower().split():
        t = re.sub(r"[^0-9a-z]+", "", t)
        if t:
            out.add(t)
    return out


def _slot_match(p: str, g: str) -> bool:
    tp, tg = _toks(p), _toks(g)
    return bool(tp) and bool(tg) and (tp <= tg or tg <= tp)


def _tri_match(p, g) -> bool:
    return all(_slot_match(a, b) for a, b in zip(p, g))


def test_open_text_triple_precision_recall():
    from prose_spark.operators.annotate import annotate_document
    from prose_spark.operators.triples import extract_triples_doc

    data = json.loads(GOLD.read_text())["sentences"]
    assert len(data) == 104
    n_pred = n_pred_match = n_gold = n_gold_match = 0
    header_preds = 0
    for e in data:
        _, toks, _ = annotate_document(e["sent"])
        pred = [(t["subj"], t["pred"], t["obj"])
                for t in extract_triples_doc(toks)]
        gold = [tuple(x) for x in e["gold"]]
        n_pred += len(pred)
        n_gold += len(gold)
        n_pred_match += sum(
            any(_tri_match(p, g) for g in gold) for p in pred)
        n_gold_match += sum(
            any(_tri_match(p, g) for p in pred) for g in gold)
        if not gold:
            header_preds += len(pred)

    precision = n_pred_match / n_pred
    recall = n_gold_match / n_gold
    # regression floors under the measured r4 values
    # (P=0.6509 = 69/106, R=0.7975 = 63/79 — same as the docstring)
    assert precision >= 0.77, (
        f"open-text precision {precision:.4f} (matched {n_pred_match}/"
        f"{n_pred}) regressed below 0.77")
    assert recall >= 0.78, (
        f"open-text recall {recall:.4f} (matched {n_gold_match}/"
        f"{n_gold}) regressed below 0.78")
    # the relation-free probes (TOC headers, negated-only sentences)
    # must stay near-silent: spurious triples there are pure noise
    assert header_preds <= 8, (
        f"{header_preds} triples extracted from relation-free sentences")


def test_open_text_triple_heldout():
    """GENERALIZATION floor: 54 never-tuned sherlock/article sentences
    labeled AFTER the corresponding guard grammar was frozen
    (tests/goldens/open_text_triples_heldout.json — the second tranche;
    the first tranche's tuned-against sentences migrated to the tuned
    set per the migration rule). Measured end of r5: P = 0.720, R =
    0.728 — below the tuned-set 0.809/0.820, which is the point: the
    tuned figure overstates open-text quality exactly as train==test
    tagger accuracy does, and THIS number is the honest one. Floors a
    few points under the measurement. Remaining error mass (r6
    worklist): relative-clause misbinds, PP attachment, appositive
    rebinds, quotative inversion. Tune on the TUNED set; if a change is
    driven by a held-out failure, the affected sentences must migrate
    into the tuned set."""
    heldout = Path(__file__).parent / "goldens" / \
        "open_text_triples_heldout.json"
    from prose_spark.operators.annotate import annotate_document
    from prose_spark.operators.triples import extract_triples_doc

    data = json.loads(heldout.read_text())["sentences"]
    assert len(data) == 54
    n_pred = n_pred_match = n_gold = n_gold_match = 0
    for e in data:
        _, toks, _ = annotate_document(e["sent"])
        pred = [(t["subj"], t["pred"], t["obj"])
                for t in extract_triples_doc(toks)]
        gold = [tuple(x) for x in e["gold"]]
        n_pred += len(pred)
        n_gold += len(gold)
        n_pred_match += sum(
            any(_tri_match(p, g) for g in gold) for p in pred)
        n_gold_match += sum(
            any(_tri_match(p, g) for p in pred) for g in gold)
    precision = n_pred_match / n_pred
    recall = n_gold_match / n_gold
    assert precision >= 0.67, (
        f"held-out precision {precision:.4f} ({n_pred_match}/{n_pred})")
    assert recall >= 0.68, (
        f"held-out recall {recall:.4f} ({n_gold_match}/{n_gold})")

"""Open-text triple quality vs HAND-LABELED gold (r4, grown r5/r6).

The templated-corpus number (P=1.0 / R>=0.95, test_spark_pipeline
test_triple_recall_vs_templated_gold) measures the extractor on
sentences the generator itself emits — it overstates open-text
precision of the POS-pattern grammar. This suite measures the same
extractor on 127 hand-labeled sentences from the reference's own
testdata (article.txt + sherlock.txt; gold file documents the labeling
convention) with standard lenient OIE matching: a predicted triple
matches a gold triple when each slot's normalized token set is
contained in (or contains) the gold slot's.

Measured r6 baselines (deterministic kernel, pinned models; after the
r6 guard batch: relative-clause subject rebinds + coordinated-wh
share, nonrestrictive-comma transparency, free-wh crossing ban with
run-on suppression, absolutive main-verb exemption, quoted-question
narration suppression, expletive extraposition, at-idiom / temporal /
reflexive-intensifier object guards, light-verb fold restricted to
make-stems with dual emission for literal verbs, transfer-verb purpose
infinitives, never-verb color/number words, Because-initial dialogue
answers): P = 0.8505 (165/194), R = 0.8376 (165/197) on 127 sentences
(104 r5-tuned + 23 migrated from held-out per the migration rule);
r5 values were P = 0.8092 (123/152), R = 0.8200 (123/150) on 104 —
recorded in BASELINE.md next to the templated number. The floors
below are regression guards a few points under the measurement.
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
    assert len(data) == 127
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
    # regression floors a few points under the measured r6 values
    # (P = 0.8505 = 165/194, R = 0.8376 = 165/197 on the 127-sentence
    # set: 104 from r5 plus the 23 held-out sentences that drove the
    # r6 guard batch, migrated per the protocol)
    assert precision >= 0.82, (
        f"open-text precision {precision:.4f} (matched {n_pred_match}/"
        f"{n_pred}) regressed below 0.82")
    assert recall >= 0.81, (
        f"open-text recall {recall:.4f} (matched {n_gold_match}/"
        f"{n_gold}) regressed below 0.81")
    # the relation-free probes (TOC headers, negated-only sentences)
    # must stay near-silent: spurious triples there are pure noise
    assert header_preds <= 8, (
        f"{header_preds} triples extracted from relation-free sentences")


def test_open_text_triple_heldout():
    """GENERALIZATION floor: 60 never-tuned sherlock sentences labeled
    blind AFTER the corresponding guard grammar froze
    (tests/goldens/open_text_triples_heldout.json): 31 second-tranche
    survivors plus a 29-sentence third tranche (blue carbuncle +
    boscombe valley narrative) added after the r6 guard batch; the 23
    sentences whose failures drove that batch migrated to the tuned set
    per the migration rule. Measured r6: P = 0.7473 (68/91), R = 0.8000
    (68/85) — below the tuned-set 0.851/0.838, which is the point: the
    tuned figure overstates open-text quality exactly as train==test
    tagger accuracy does, and THIS number is the honest one. Floors a
    few points under the measurement (r5 floors were 0.67/0.68 at
    measured 0.720/0.728). Remaining error mass (r7 worklist): tagger
    OOV misses (sprang/hailed as NN), adverb-into-NP chunking
    ("companion speedily"), it-cleft relative loss, multi-PP second
    attachments. Tune on the TUNED set; if a change is driven by a
    held-out failure, the affected sentences must migrate into the
    tuned set."""
    heldout = Path(__file__).parent / "goldens" / \
        "open_text_triples_heldout.json"
    from prose_spark.operators.annotate import annotate_document
    from prose_spark.operators.triples import extract_triples_doc

    data = json.loads(heldout.read_text())["sentences"]
    assert len(data) == 60
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
    assert precision >= 0.72, (
        f"held-out precision {precision:.4f} ({n_pred_match}/{n_pred})")
    assert recall >= 0.76, (
        f"held-out recall {recall:.4f} ({n_gold_match}/{n_gold})")

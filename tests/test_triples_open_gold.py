"""Open-text triple quality vs HAND-LABELED gold (r4, grown r5/r6).

The templated-corpus number (P=1.0 / R>=0.95, test_spark_pipeline
test_triple_recall_vs_templated_gold) measures the extractor on
sentences the generator itself emits — it overstates open-text
precision of the POS-pattern grammar. This suite measures the same
extractor on 151 hand-labeled sentences from the reference's own
testdata (article.txt + sherlock.txt; gold file documents the labeling
convention) with standard lenient OIE matching: a predicted triple
matches a gold triple when each slot's normalized token set is
contained in (or contains) the gold slot's.

Measured r6 baselines (deterministic kernel, pinned models; after the
SECOND r6 guard batch: irregular-past / -ly-adverb / modal-licensed
chunk-code overrides, DT+JJ headless NPs, displaced agent-passive
inversion ("cut short by X" -> active), quotative-attribution tail
kills, accusative small-clause and for-to suppression, nominative-
pronoun-object rejection, causative have+NP+VBN, as-relativizer and
second-person-question kills, it-cleft subject exemption, content-verb
object-control rebinding, locative-PP displacement before that-
complements, trailing adverbial-noun strip): P = 0.8661 (207/239),
R = 0.8697 (207/238) on 151 sentences (127 earlier-r6 + 24 migrated
from held-out per the migration rule); first-r6-batch values were
P = 0.8505 (165/194), R = 0.8376 (165/197) on 127; r5 values were
P = 0.8092 (123/152), R = 0.8200 (123/150) on 104 — recorded in
BASELINE.md next to the templated number. The floors below are
regression guards a few points under the measurement.
"""

import json
import re
from pathlib import Path

GOLD = Path(__file__).parent / "goldens" / "open_text_triples_gold.json"


def _toks(s: str) -> set[str]:
    # re-attach tokenizer-split possessives so "companion 's knees"
    # and "companion's knees" normalize to the same token set
    out = set()
    for t in s.lower().replace(" 's", "'s").split():
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
    assert len(data) == 151
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
    # (P = 0.8661 = 207/239, R = 0.8697 = 207/238 on the 151-sentence
    # set: 127 from the first r6 batch plus the 24 held-out sentences
    # that drove the second batch, migrated per the protocol)
    assert precision >= 0.84, (
        f"open-text precision {precision:.4f} (matched {n_pred_match}/"
        f"{n_pred}) regressed below 0.84")
    assert recall >= 0.84, (
        f"open-text recall {recall:.4f} (matched {n_gold_match}/"
        f"{n_gold}) regressed below 0.84")
    # the relation-free probes (TOC headers, negated-only sentences)
    # must stay near-silent: spurious triples there are pure noise
    assert header_preds <= 8, (
        f"{header_preds} triples extracted from relation-free sentences")


def test_open_text_triple_heldout():
    """GENERALIZATION floor: 63 never-tuned sherlock sentences labeled
    blind AFTER the corresponding guard grammar froze
    (tests/goldens/open_text_triples_heldout.json): 36 survivors of the
    earlier tranches plus a 27-sentence fourth tranche (speckled-band
    narrative, ~330kB offset, labeled blind from the raw text before
    the extractor ever ran on it) added after the SECOND r6 guard
    batch; the 24 sentences whose failures drove that batch migrated to
    the tuned set per the migration rule. Measured r6.2 on this pool:
    P = 0.8046 (70/87), R = 0.8434 (70/83) — below the tuned-set
    0.866/0.870, which is the point: the tuned figure overstates
    open-text quality exactly as train==test tagger accuracy does, and
    THIS number is the honest one. Floors a few points under the
    measurement (first-r6-batch floors were 0.72/0.76 at measured
    0.7473/0.8000; r5 floors 0.67/0.68 at 0.720/0.728). Remaining
    error mass (r7 worklist): perception small-clause objects ("heard
    her key turn"), of-chain subject heads ("A vague feeling of ...
    misfortune" -> subj "misfortune"), plain-passive orientation when
    gold keeps surface-by ("were blocked by"), particles glued into
    object NPs ("wrapped a shawl round me"), subordinate-as subject
    leaks, em-dash appositive run-ons. Tune on the TUNED set; if a
    change is driven by a held-out failure, the affected sentences must
    migrate into the tuned set."""
    heldout = Path(__file__).parent / "goldens" / \
        "open_text_triples_heldout.json"
    from prose_spark.operators.annotate import annotate_document
    from prose_spark.operators.triples import extract_triples_doc

    data = json.loads(heldout.read_text())["sentences"]
    assert len(data) == 63
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
    assert precision >= 0.77, (
        f"held-out precision {precision:.4f} ({n_pred_match}/{n_pred})")
    assert recall >= 0.80, (
        f"held-out recall {recall:.4f} ({n_gold_match}/{n_gold})")

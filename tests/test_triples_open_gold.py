"""Open-text triple quality vs HAND-LABELED gold (r4, grown r5/r6).

The templated-corpus number (P=1.0 / R>=0.95, test_spark_pipeline
test_triple_recall_vs_templated_gold) measures the extractor on
sentences the generator itself emits — it overstates open-text
precision of the POS-pattern grammar. This suite measures the same
extractor on 157 hand-labeled sentences from the reference's own
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
complements, trailing adverbial-noun strip; THIRD batch: perception
small-clause split, generalized of-chain subject heads with
premodifier skip, BE-complement-transparent VP coordination, trailing
particle/pronoun strip, PRP$-without-nominal pronoun override,
without/of-gerund object block): P = 0.8819 (224/254), R = 0.8784
(224/255) on 157 sentences (151 + 6 migrated per the migration rule);
second-batch values were P = 0.8661/R = 0.8697 on 151; first-batch
P = 0.8505/R = 0.8376 on 127; r5 P = 0.8092/R = 0.8200 on 104 —
recorded in BASELINE.md next to the templated number. The floors
below are regression guards a few points under the measurement.
"""

import json
import re
from pathlib import Path

GOLD = Path(__file__).parent / "goldens" / "open_text_triples_gold.json"


# clitic auxiliaries normalize to their full forms so a label written
# "have always assumed" matches the tokenizer's "'ve always assumed"
# (same convention as the "'s" re-attach; "'d" stays raw — it is
# had/would-ambiguous and conflating them could cross-match)
_CLITIC_FULL = {"ve": "have", "re": "are", "m": "am", "ll": "will"}


def _toks(s: str) -> set[str]:
    # re-attach tokenizer-split possessives so "companion 's knees"
    # and "companion's knees" normalize to the same token set
    out = set()
    for t in s.lower().replace(" 's", "'s").split():
        clitic = t.startswith("'")
        t = re.sub(r"[^0-9a-z]+", "", t)
        if clitic:
            t = _CLITIC_FULL.get(t, t)
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
    assert len(data) == 236
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
    # regression floors a few points under the measured r8 values
    # (P = 0.9077 = 344/379, R = 0.9029 = 344/381 on the 236-sentence
    # set — the r8 guard batches cleared 0.90 on BOTH axes for the
    # first time while the set absorbed 28 migrated hard web-register
    # sentences; r7.5 was 0.8801/0.8905 on 208, r7.4 0.8791/0.8896 on
    # 207, r6 0.8819/0.8784 on 157)
    assert precision >= 0.87, (
        f"open-text precision {precision:.4f} (matched {n_pred_match}/"
        f"{n_pred}) regressed below 0.87")
    assert recall >= 0.87, (
        f"open-text recall {recall:.4f} (matched {n_gold_match}/"
        f"{n_gold}) regressed below 0.87")
    # the relation-free probes (TOC headers, negated-only sentences)
    # must stay near-silent: spurious triples there are pure noise
    assert header_preds <= 8, (
        f"{header_preds} triples extracted from relation-free sentences")


def test_open_text_triple_heldout():
    """GENERALIZATION floor, r7.2 pool: 91 never-tuned sentences
    labeled blind AFTER the corresponding guard grammar froze
    (tests/goldens/open_text_triples_heldout.json): 70 survivors of
    tranches 1-6 plus a 21-sentence seventh tranche (10 sherlock
    @~545kB + 11 reddit), each tranche hand-labeled blind from the
    raw text before the extractor ever ran on it.

    r7 ran the protocol TWICE. Tranche 6 (18 sherlock @500kB + 15
    reddit_product — the first OUT-OF-DISTRIBUTION register, r6
    ADVICE #3) measured first-run sherlock P 0.8818 / R 0.8981 (vs
    r6.3's 0.8105/0.8953) and reddit OOD P 0.4516 / R 0.7368 — the
    honest modern-web number that motivated the second guard batch
    (web contractions, lowercase-i, elided-that negation, modal-
    copula speculation, like-frames, P-attached object blocking).
    Its failing sentences migrated to the tuned set; tranche 7 then
    measured first-run sherlock-fresh P 0.6667 / R 0.9091 and
    reddit-fresh P 0.6250 / R 0.8333 (after a 2-relation
    convention-consistency label pass) — OOD precision roughly
    doubled tranche-over-tranche.

    r7 third protocol round: the tranche-7 failures drove a third
    guard batch (RC-internal subject walls, negated-infinitive
    continuation, negated-attitude complement scope + litotes
    exception, em-dash appositive noun-that, copular is-that,
    resumptive ", and so" coordination, cross-clause object steal,
    prenominal-VBN recode, modal-appearance speculation) plus the
    tagger batch 2 lexical constraints; its 8 driving sentences
    migrated and TRANCHE 8 (12 fresh sherlock @181.5k/381.5k + 10
    fresh reddit, labeled blind) measured FIRST-RUN sherlock-t8
    P 0.5909 / R 0.8125 and reddit-t8 P 0.6875 / R 0.7333 —
    pool-level sherlock 0.9204/0.9720, reddit 0.8333/0.8621
    (the 83 pre-t8 survivors measure 105/105 = 1.0/1.0). r8
    worklist from the t8 failures: serial-coordination object
    leakage ("parted from my old pals and determined to settle"),
    contraction subjects ("I've"), adverbial-NP objects ("pool
    midway"), coordinated of-PP subjects, all-caps headline tagging.

    r7 fourth protocol round: the t8 worklist guard batch landed
    ('ve/'d tokenizer splits, subordinator object-steal, gerund
    walls, chain-continuation subject share, finite-VBN conjunct
    and that-relative exceptions, predicate-nominal relative
    inversion exemption, OOV-VBZ prenominal recode, negated-gerund
    scope, out-of idioms), its 10 driving sentences migrated, and
    TRANCHE 9 (12 fresh sherlock @390k/450k + 10 fresh reddit,
    deliberately harder web register: typos, entities, dense
    subordination) measured FIRST-RUN sherlock-t9 P 0.7917 /
    R 0.9048 (t8: 0.5909/0.8125) and reddit-t9 P 0.4375 / R 0.5833
    (t8-style easy lines were exhausted; the misses are the r9
    worklist: its/it's typo clauses, soft-negation "have never
    seen" folding, passive relatives, &amp; entity noise,
    if-clause copular fallout). Pool-level: sherlock 0.9449/0.9836,
    reddit 0.7500/0.8182 — floors reset to track the HARDER pool.
    A mini fifth batch (driving sentence migrated, see the gold
    file's protocol block) fixed the causative-have guard's latent
    auxiliary bug, passive small clauses under perception verbs, and
    preposition-governed base verbs ("during rush hour"); pool after
    it: sherlock 0.9449/0.9836, reddit 0.7879/0.8667.
    r8 ran the protocol THREE times. The t9-failure classes (its/it's
    typo clauses, &amp; entity noise, if-clause copular fallout,
    adverbial-NP objects, for/from-PP subject chains, directive
    complements, BE+like similes) plus the NASA all-caps headline
    (fixed at the TAGGER layer: headline-register detection +
    main-verb post-pass) landed as the first r8 batch; 12 drivers
    migrated; TRANCHE 10 (12 sherlock @120k/240k + 10 reddit, blind)
    measured FIRST-RUN sherlock-t10 P 0.6667 / R 0.9000 and
    reddit-t10 P 0.2381 / R 0.5000 — the hardest lines yet
    (imperatives, hedges, comma-splices, copula+infinitive). The
    second batch (imperative/instruction scope, reduced-relative
    VP splits with antecedent re-walk, clause-taking that-gap
    restriction, maybe/Not-that scopes, catenative-TO and
    relativizer-that verb recodes, no-doubt idiom) took the t10
    drivers; TRANCHE 11 (6 sherlock @200k/310k + 8 reddit, blind)
    measured FIRST-RUN sherlock-t11 P 0.6429 / R 0.9000 and
    reddit-t11 P 0.5833 / R 0.4375. The third batch (expletive-seem
    complement scope, wh-relative passive surface convention,
    in-turn idiom, predicate-position titlecase-JJ and
    no-other-verb JJ-verb recodes) took the t11 drivers; TRANCHE 12
    (4 sherlock @270k + 8 reddit, blind) measured FIRST-RUN
    sherlock-t12 P 0.8000 / R 0.8000 and reddit-t12 P 0.4615 /
    R 0.4615. The t12 residuals are the r9 worklist: plan-to-X
    catenative chains picking the wrong object, surface passives
    with relative tails ("is made by the people who made Fate"),
    used-to distinction, when-complement copulas, expletive
    it-is-NP-to-VB frames, quoted-fragment appositives, trailing
    adverb glue breaking lenient match. Pool after r8:
    sherlock 0.9728/0.9795, reddit 0.7917/0.7600 (the pool now
    carries every deliberately-hard residual).
    History: r6.3 floors 0.78/0.86 at measured 0.8105/0.8953;
    second-batch 0.77/0.80 at 0.8046/0.8434; first-batch 0.72/0.76
    at 0.7473/0.8000; r5 0.67/0.68 at 0.720/0.728. Tune on the
    TUNED set; if a change is driven by a held-out failure, the
    affected sentences must migrate into the tuned set."""
    heldout = Path(__file__).parent / "goldens" / \
        "open_text_triples_heldout.json"
    from prose_spark.operators.annotate import annotate_document
    from prose_spark.operators.triples import extract_triples_doc

    data = json.loads(heldout.read_text())["sentences"]
    assert len(data) == 136
    stats = {}  # register -> [pred, pred_match, gold, gold_match]
    for e in data:
        reg = ("reddit" if e.get("src", "").startswith("reddit")
               else "sherlock")
        st = stats.setdefault(reg, [0, 0, 0, 0])
        _, toks, _ = annotate_document(e["sent"])
        pred = [(t["subj"], t["pred"], t["obj"])
                for t in extract_triples_doc(toks)]
        gold = [tuple(x) for x in e["gold"]]
        st[0] += len(pred)
        st[2] += len(gold)
        st[1] += sum(
            any(_tri_match(p, g) for g in gold) for p in pred)
        st[3] += sum(
            any(_tri_match(p, g) for p in pred) for g in gold)
    # per-register floors a few points under the r8 pool-level
    # measurement (sherlock 0.9728/0.9795, reddit OOD 0.7917/0.7600 on
    # the 136-sentence pool that now holds the deliberately-hard
    # t10-t12 residuals)
    floors = {"sherlock": (0.94, 0.94), "reddit": (0.75, 0.72)}
    for reg, (pf, rf) in floors.items():
        np_, nm, ng, ngm = stats[reg]
        precision, recall = nm / np_, ngm / ng
        assert precision >= pf, (
            f"held-out {reg} precision {precision:.4f} ({nm}/{np_})")
        assert recall >= rf, (
            f"held-out {reg} recall {recall:.4f} ({ngm}/{ng})")


def test_smallclause_split_spares_deverbal_nouns():
    """Review-pass regression: the perception small-clause split
    ("heard her key turn in the lock") must not fire on ordinary
    deverbal-noun objects — "saw the break in the clouds" keeps its
    whole NP and emits no bare-determiner garbage."""
    from prose_spark.operators.annotate import annotate_document
    from prose_spark.operators.triples import extract_triples_doc

    for sent, obj_word in (
        ("He saw the break in the clouds.", "break"),
        ("I watched the fall of the empire with great interest.",
         "fall"),
    ):
        _, toks, _ = annotate_document(sent)
        triples = [(t["subj"], t["pred"], t["obj"])
                   for t in extract_triples_doc(toks)]
        assert len(triples) == 1, triples
        assert obj_word in triples[0][2]
        assert triples[0][2].strip() not in ("the", "a")

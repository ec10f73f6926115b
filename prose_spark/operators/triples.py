"""Triple extraction via POS-pattern chunking (SURVEY.md §2.K K1/K2).

This layer is NEW relative to the reference library (mandated by the
north rule): per sentence, chunk noun phrases (DT? JJ* NN-runs, or NER
entity spans) and verb groups (MD? VB+ RB? + particle/preposition), then
emit (subj, pred, obj) for each verb group with an NP on both sides.

Implemented as a regex over a per-sentence tag-code string (one char per
token), which is O(tokens) per sentence and fully data-parallel across
documents — no shuffle. Predicate normalization (K2): lowercase,
3rd-person -s stripped when the head verb is VBZ (lemma-lite), whitespace
collapsed.

Confidence = min NER confidence over entity tokens inside subj/obj spans
(1.0 when neither side overlaps an entity).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from prose_spark.schemas import TRIPLE_TYPE

# one-char code per Penn tag class
_TAG_CODE = {
    "NN": "N", "NNS": "N", "NNP": "N", "NNPS": "N",
    "JJ": "J", "JJR": "J", "JJS": "J",
    "DT": "D", "PDT": "D",
    "PRP": "S",  # pronoun subject-ish nominal
    "VB": "V", "VBD": "V", "VBG": "V", "VBN": "V", "VBP": "V", "VBZ": "V",
    "MD": "M",
    "RB": "R", "RBR": "R", "RBS": "R",
    "RP": "P", "IN": "P", "TO": "P",
    "CD": "C",
    "POS": "G",
}

# NP: optional determiner, adjectives, noun run (with CD/POS glue inside),
# or a bare pronoun. VP: optional modal, verb run — adverbs allowed
# BETWEEN verbs ("have seldom heard", "never spoke") so a mid-VP adverb
# doesn't truncate the predicate and strand the main verb as a bogus
# object — optional trailing adverb, optional particle/preposition
# attaching the object.
_NP_RE = re.compile(r"D?J*N[NJCG]*|S")
_VP_RE = re.compile(r"M?R?V+(?:RV+)*R?P?")

# irregular 3rd-person forms whose -s strip would be wrong ("is" -> "i")
_IRREGULAR_VBZ = {"is": "be", "has": "have", "does": "do", "goes": "go",
                  "'s": "be"}

# straight/typographic quotes and PTB two-char quote tokens: the
# sanitizer folds typographic quotes to '"', which the tagger then
# mistags (NNP/NN/VBP) on open text, leaking quote marks into NP/VP
# spans; force them out of every span at the code level
_QUOTE_TOKENS = frozenset(('"', "``", "''", "'", "`", "“", "”"))


def _code(tags: list[str]) -> str:
    return "".join(_TAG_CODE.get(t, ".") for t in tags)


def extract_triples_doc(tokens: list[dict]) -> list[dict]:
    """tokens: annotate() token dicts (ordered). -> triple dicts."""
    out: list[dict] = []
    if tokens is None or len(tokens) == 0:
        return out
    # group token indices by sentence
    by_sent: dict[int, list[int]] = {}
    for i, t in enumerate(tokens):
        si = t["sent_idx"]
        if si is not None and si >= 0:
            by_sent.setdefault(si, []).append(i)

    for si, idxs in by_sent.items():
        tags = [tokens[i]["tag"] or "" for i in idxs]
        code = "".join(
            "." if tokens[i]["text"] in _QUOTE_TOKENS
            else _TAG_CODE.get(t, ".")
            for i, t in zip(idxs, tags)
        )
        nps = [(m.start(), m.end()) for m in _NP_RE.finditer(code)]
        if len(nps) < 2:
            continue

        def phrase(span):
            toks = [tokens[idxs[k]] for k in range(span[0], span[1])]
            # drop leading determiner from the phrase surface
            while toks and toks[0]["tag"] in ("DT", "PDT"):
                toks = toks[1:]
            return toks

        def conf(toks):
            cs = [t["confidence"] for t in toks if t["label"] != "O"]
            return min(cs) if cs else 1.0

        def ent_label(toks):
            labs = [t["label"] for t in toks if t["label"] != "O"]
            if not labs:
                return ""
            return labs[0].split("-", 1)[-1]

        # --- appositive pattern: "NP1 , NP2 (P NP)* ," ----------------
        # "Robert Chen, the founder of Globex Inc., visited ..." emits
        # (Robert Chen, is, founder) and re-binds the following verb's
        # subject to NP1 (without this, the nearest-NP rule would pick
        # "Globex Inc." as the subject of "visited"). subj_override maps
        # the LAST NP of the appositive chain -> NP1.
        commas = {
            k for k in range(len(idxs))
            if tokens[idxs[k]]["text"] == ","
        }
        subj_override: dict[tuple[int, int], tuple[int, int]] = {}
        for ni in range(len(nps) - 1):
            s1, e1 = nps[ni]
            s2, e2 = nps[ni + 1]
            if e1 not in commas or s2 != e1 + 1:
                continue
            # precision guards against clause boundaries that mimic the
            # pattern ("...per hour, workers in..."): a true appositive
            # describes a NAMED entity (NP1 carries a proper noun) with
            # a determinered NP ("the founder", "a subsidiary")
            if code[s2] != "D":
                continue
            if not any(tokens[idxs[k]]["tag"].startswith("NNP")
                       for k in range(s1, e1)):
                continue
            # extend the chain over PP attachments: NP2 (P NP)*
            chain_end, nj = e2, ni + 1
            while (chain_end < len(code) and code[chain_end] == "P"
                   and nj + 1 < len(nps) and nps[nj + 1][0] == chain_end + 1):
                nj += 1
                chain_end = nps[nj][1]
            # the tokenizer peels some abbreviation periods ("Acme Corp,"
            # -> Corp + "." + ","): step over bare periods before the
            # trailing-comma test
            while (chain_end < len(code)
                   and tokens[idxs[chain_end]]["text"] == "."):
                chain_end += 1
            if chain_end not in commas:
                continue
            s_toks = phrase((s1, e1))
            o_toks = phrase((s2, e2))
            if not s_toks or not o_toks:
                continue
            subj_override[nps[nj]] = (s1, e1)
            out.append(
                {
                    "sent_idx": si,
                    "subj": " ".join(t["text"] for t in s_toks),
                    "pred": "is",
                    "obj": " ".join(t["text"] for t in o_toks),
                    "pred_norm": "be",
                    "subj_label": ent_label(s_toks),
                    "obj_label": ent_label(o_toks),
                    "confidence": min(conf(s_toks), conf(o_toks)),
                }
            )

        # last emitted VP triple's PRE-passive-swap (subj, obj, ve) for
        # coordinated-predicate subject sharing
        prev_vp = None
        for vm in _VP_RE.finditer(code):
            vs, ve = vm.span()
            if "V" not in code[vs:ve]:
                continue
            # suppress a bare participle acting adjectivally inside an
            # NP ("a renowned engineer" must not yield <subj> renowned
            # <engineer>): single VBN, no aux/particle, preceded by a
            # determiner or adjective
            if (ve - vs == 1 and vs > 0 and code[vs - 1] in "DJ"
                    and tokens[idxs[vs]]["tag"] == "VBN"):
                continue
            subj_span = None
            for s, e in nps:
                if e <= vs:
                    subj_span = (s, e)
                else:
                    break
            # appositive re-binding: the NP just before the verb may be
            # the tail of an appositive chain describing the true subject
            rebound = subj_span in subj_override
            if rebound:
                subj_span = subj_override[subj_span]
            if subj_span is None:
                continue
            # coordinated predicates share the subject: in "Students can
            # use bathrooms and join school athletic teams", the nearest
            # NP before "join" is the PREVIOUS verb's object — when the
            # gap holds only coordination tokens and the candidate lies
            # inside the previous predicate's object region, re-bind to
            # the previous triple's (pre-passive-swap) subject
            shared = False
            if (not rebound and prev_vp is not None
                    and subj_span[0] >= prev_vp[2]
                    and any(tokens[idxs[k]]["text"].lower() in ("and", "or")
                            for k in range(subj_span[1], vs))
                    and all(tokens[idxs[k]]["text"].lower()
                            in (",", "and", "or")
                            for k in range(subj_span[1], vs))):
                subj_span = prev_vp[0]
                shared = True
            # clause-boundary guards: an ODD number of commas between
            # the verb and its chosen argument means the argument
            # belongs to ANOTHER clause ("Although many new laws are
            # controversial, they ..." must not yield <many new laws>
            # are <they>), while an EVEN count is a balanced
            # parenthetical that legitimately intervenes. The object is
            # therefore the FIRST post-verb NP at even comma distance —
            # skipping a parenthetical's own NPs ("He was, I take it,
            # the most perfect ..." attaches "the most perfect ...",
            # not "I") — and the triple is dropped when every remaining
            # NP sits across an odd boundary.
            obj_span = next(
                (
                    (s, e) for s, e in nps
                    if s >= ve
                    and not sum(k in commas for k in range(ve, s)) % 2
                ),
                None,
            )
            if obj_span is None:
                continue
            # the appositive-rebound subject crosses its chain-closing
            # comma by design, and a coordination-shared subject crosses
            # its own ", and" — only plain subjects are checked
            if not rebound and not shared:
                subj_commas = [k for k in range(subj_span[1], vs)
                               if k in commas]
                if len(subj_commas) % 2:
                    # exception: a relative clause re-opens the subject
                    # ("shark fins, which is considered a delicacy") —
                    # the span between the last comma and the verb
                    # holds only relative pronouns
                    if not (vs > subj_commas[-1] + 1 and all(
                        tokens[idxs[k]]["tag"] in ("WDT", "WP", "WP$")
                        for k in range(subj_commas[-1] + 1, vs)
                    )):
                        continue

            s_toks = phrase(subj_span)
            o_toks = phrase(obj_span)
            if not s_toks or not o_toks:
                continue
            prev_vp = (subj_span, obj_span, ve)
            v_toks = [tokens[idxs[k]] for k in range(vs, ve)]

            # passive voice: "<obj> BE VBN by <subj>" inverts the triple
            # and takes the participle as the predicate
            be_forms = {"is", "are", "was", "were", "been", "being", "be"}
            passive = (
                len(v_toks) >= 2
                and v_toks[-1]["text"].lower() == "by"
                and any(t["tag"] == "VBN" for t in v_toks)
                and any(t["text"].lower() in be_forms for t in v_toks)
            )
            if passive:
                s_toks, o_toks = o_toks, s_toks
                # only the LAST participle is the content predicate:
                # "has been founded by X" -> pred "founded", not "been founded"
                # ("been" is itself tagged VBN)
                v_toks = [t for t in v_toks if t["tag"] == "VBN"][-1:]

            pred = " ".join(t["text"] for t in v_toks)
            head = next((t for t in v_toks if t["tag"].startswith("VB")), None)
            pred_norm = pred.lower()
            if head is not None and head["tag"] == "VBZ" and head["text"].endswith("s"):
                w = head["text"].lower()
                stem = _IRREGULAR_VBZ.get(w)
                if stem is None:
                    stem = w[:-3] + "y" if w.endswith("ies") else (
                        w[:-2] if w.endswith(("ses", "xes", "zes", "ches", "shes"))
                        else w[:-1]
                    )
                if len(stem) >= 2:
                    pred_norm = pred_norm.replace(w, stem, 1)
            pred_norm = re.sub(r"\s+", " ", pred_norm).strip()

            out.append(
                {
                    "sent_idx": si,
                    "subj": " ".join(t["text"] for t in s_toks),
                    "pred": pred,
                    "obj": " ".join(t["text"] for t in o_toks),
                    "pred_norm": pred_norm,
                    "subj_label": ent_label(s_toks),
                    "obj_label": ent_label(o_toks),
                    "confidence": min(conf(s_toks), conf(o_toks)),
                }
            )
    return out


def annotate_and_extract_triples(
    df: DataFrame,
    text_col: str = "text",
    key_cols: tuple[str, ...] = ("url",),
    cfg=None,
    timeout_acc=None,
) -> DataFrame:
    """Fully fused single-stage pipeline: raw text -> triples in ONE
    mapInPandas (annotate kernel + pattern chunker per document). Avoids
    materializing the nested token arrays through Arrow between stages and
    halves the number of Python workers per task slot — the production
    path when only triples are needed downstream.

    With the default cfg there is no per-document timeout (no doc can be
    silently dropped). When a caller opts into ``cfg.timeout_sec``, each
    timed-out doc is skipped AND counted in ``timeout_acc`` (a Spark
    accumulator) so the job can surface how many documents the budget
    dropped — never indistinguishable from triple-less docs."""
    from prose_spark.operators.annotate import (
        AnnotateConfig,
        DocumentTimeout,
        annotate_document,
    )

    key_fields = [f for f in df.schema.fields if f.name in key_cols]
    out_schema = T.StructType(key_fields + list(TRIPLE_TYPE.fields))
    if cfg is None:
        cfg = AnnotateConfig()
    col_names = [f.name for f in out_schema.fields]

    def run(batches):
        for pdf in batches:
            rows = []
            keys = pdf[list(key_cols)].to_dict("records")
            for key_row, text in zip(keys, pdf[text_col]):
                try:
                    _, tokens, _ = annotate_document(text, cfg)
                except DocumentTimeout:
                    # per-document failure: skip the doc, never abort the
                    # task — but COUNT it so the job can report the drop
                    if timeout_acc is not None:
                        timeout_acc.add(1)
                    continue
                for tr in extract_triples_doc(tokens):
                    rows.append({**key_row, **tr})
            yield pd.DataFrame(rows, columns=col_names)

    cols = list(key_cols) + [text_col]
    return df.select(*cols).mapInPandas(run, schema=out_schema)


def extract_triples(df: DataFrame, key_cols: tuple[str, ...] = ("url",)) -> DataFrame:
    """Annotated df -> long-format triples DataFrame (one row per triple)."""
    key_fields = [f for f in df.schema.fields if f.name in key_cols]
    out_schema = T.StructType(key_fields + list(TRIPLE_TYPE.fields))

    def run(batches):
        for pdf in batches:
            rows = []
            keys = pdf[list(key_cols)].to_dict("records")
            for key_row, tokens in zip(keys, pdf["tokens"]):
                for tr in extract_triples_doc(tokens):
                    rows.append({**key_row, **tr})
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    cols = list(key_cols) + ["tokens"]
    return df.select(*cols).mapInPandas(run, schema=out_schema)


def triple_support(
    triples: DataFrame,
    source_col: str = "url",
    confidence_col: str = "confidence",
) -> DataFrame:
    """Collapse per-document triples into weighted graph edges: one row
    per (subj, pred_norm, obj) with

    - ``n_mentions``: total assertions of the edge across the corpus,
    - ``n_sources``: distinct source documents asserting it,
    - ``max_confidence``: best extraction confidence seen,
    - ``first_source``: smallest source id under the column's own
      ordering — numeric for numeric ids, lexicographic for strings —
      a bounded, deterministic provenance exemplar.

    This is the materialization step between raw extraction and a usable
    graph: a crawl asserts popular facts millions of times, and the graph
    table wants one weighted edge, not 10^6 rows. Every aggregate here is
    decomposable (count / count-distinct-expand / max / min), so the
    whole thing is a standard two-phase hash aggregate with map-side
    partials — no unbounded per-group state (deliberately NOT
    collect_set of sources, which a boilerplate edge would blow up at
    crawl scale; the reference has no corpus-level aggregation to cite —
    this extends its per-document extraction, extract.go:160-189, to the
    north rule's graph-materialize stage)."""
    return (
        triples.groupBy("subj", "pred_norm", "obj")
        .agg(
            F.count("*").cast("long").alias("n_mentions"),
            F.countDistinct(source_col).cast("long").alias("n_sources"),
            F.max(confidence_col).alias("max_confidence"),
            F.min(source_col).alias("first_source"),
        )
    )

"""GIS trainer for the binary Maxent NER classifier.

Behavioral spec: tsawler/prose extract.go:235-363, 573-608 (encode /
empiricalCount / estCount / extracterFromData — NLTK-style Generalized
Iterative Scaling with a correction feature), vectorized with numpy
COO-style scatter-adds instead of the reference's per-entry loops.

Corpus prep (makeCorpus, extract.go:287-298) reuses the tokenizer + tagger
stages; at cluster scale it runs as a Spark DataFrame job (embarrassingly
parallel per example) and GIS runs driver-side on the aggregated counts.

Faithful quirks kept:
- training features carry RAW IOB labels in prevtag (assignLabels,
  extract.go:263-285) while inference feeds simplePOS history — the
  reference's own mismatch;
- cardinality = |distinct first-hyphen-segment of mapping keys| + 1
  (extract.go:96-106), which collapses "en-wordlist" to "en";
- unattested features start at -inf weight; estimates for them get +1
  before the log (extract.go:308-341);
- 100 GIS iterations, no convergence check.
"""

from __future__ import annotations

import numpy as np

from prose_spark.nlp.ner import FEATURE_ORDER, MaxentNER, extract_features
from prose_spark.nlp.tagger import PerceptronTagger, default_tagger
from prose_spark.nlp.tokenizer import tokenize


def adjust_pos(text: str, start: int, end: int) -> tuple[int, int]:
    """Whitespace-insensitive span adjust (extract.go:235-251)."""
    left = right = 0
    for index, ch in enumerate(text):
        if ch.isspace():
            if index < start:
                left += 1
            if index < end:
                right += 1
    return start - left, end - right


def assign_labels(words: list[str], text: str, spans, accept: bool) -> list[str]:
    """IOB label assignment by running non-space char index
    (extract.go:263-285); token lengths accumulate in bytes."""
    history = ["O"] * len(words)
    if accept:
        for span in spans:
            start, end = adjust_pos(text, span["start"], span["end"])
            index = 0
            for i, w in enumerate(words):
                if index == start:
                    history[i] = "B-" + span["label"]
                elif start < index < end:
                    history[i] = "I-" + span["label"]
                index += len(w.encode("utf-8"))
    return history


def make_corpus(
    data: list[dict], tagger: PerceptronTagger | None = None
) -> list[tuple[str, dict[str, str]]]:
    """-> [(label, features)] over all tokens of all examples.

    data entries: {"text": str, "spans": [{start,end,label}], "accept": bool}
    """
    if tagger is None:
        tagger = default_tagger()
    corpus: list[tuple[str, dict[str, str]]] = []
    for entry in data:
        words = tokenize(entry["text"])
        tags = tagger.tag(words)
        history = assign_labels(words, entry["text"], entry.get("spans") or [],
                                entry["accept"])
        for i in range(len(words)):
            corpus.append((history[i], extract_features(i, words, tags, history)))
    return corpus


def train_maxent(corpus: list[tuple[str, dict[str, str]]], iterations: int = 100):
    """GIS training -> (mapping, weights, labels).

    mapping/labels are insertion-ordered exactly like the reference's
    encode() (extract.go:573-597)."""
    mapping: dict[str, int] = {}
    labels: list[str] = []
    label_set = set()
    for label, feats in corpus:
        if label not in label_set:
            label_set.add(label)
            labels.append(label)
        for fname in FEATURE_ORDER:
            entry = fname + "-" + feats[fname] + "-" + label
            if entry not in mapping:
                mapping[entry] = len(mapping)

    cardinality = len({k.split("-")[0] for k in mapping}) + 1
    M = len(mapping)
    L = len(labels)
    n = len(corpus)
    c_inv = 1.0 / cardinality

    # Pre-encode every (entry, label) pair into COO scatter arrays.
    rows: list[int] = []
    cols: list[int] = []
    corr = np.zeros((n, L))  # correction-feature value per (entry, label)
    true_label = np.zeros(n, dtype=np.int64)
    lab_pos = {l: i for i, l in enumerate(labels)}
    for i, (label, feats) in enumerate(corpus):
        true_label[i] = lab_pos[label]
        for li, lab in enumerate(labels):
            total = 0
            base = i * L + li
            for fname in FEATURE_ORDER:
                idx = mapping.get(fname + "-" + feats[fname] + "-" + lab)
                if idx is not None:
                    rows.append(base)
                    cols.append(idx)
                    total += 1
            corr[i, li] = cardinality - total
    rows_a = np.asarray(rows, dtype=np.int64)
    cols_a = np.asarray(cols, dtype=np.int64)

    # empirical counts with the true label (empiricalCount, :599-608)
    emp = np.zeros(M + 1)
    true_mask = (rows_a % L) == true_label[rows_a // L]
    np.add.at(emp, cols_a[true_mask], 1.0)
    emp[M] = corr[np.arange(n), true_label].sum()

    unattested = emp == 0.0
    with np.errstate(divide="ignore"):
        emp_log = np.log2(emp)

    w = np.zeros(M + 1)
    w[unattested] = -np.inf

    for _ in range(iterations):
        # probClassify for every entry (extract.go:386-399)
        scores = np.zeros(n * L)
        np.add.at(scores, rows_a, w[cols_a])
        scores += (w[M] * corr).ravel()
        scores = scores.reshape(n, L)
        # log2-domain normalization (newMappedProbDist, extract.go:30-51)
        m = scores.max(axis=1, keepdims=True)
        finite = np.isfinite(m[:, 0])
        p = np.zeros((n, L))
        if finite.any():
            sc = scores[finite] - m[finite]
            e = np.exp2(sc)
            p[finite] = e / e.sum(axis=1, keepdims=True)
        p[~finite] = 1.0 / L  # all -inf -> uniform
        p_flat = p.ravel()

        est = np.zeros(M + 1)
        np.add.at(est, cols_a, p_flat[rows_a])
        est[M] = (corr * p).sum()
        est[unattested] += 1.0
        with np.errstate(divide="ignore"):
            est_log = np.log2(est)
        delta = c_inv * (emp_log - est_log)
        # -inf weights stay -inf (−inf + finite = −inf)
        w = w + delta
        w[unattested] = -np.inf

    return mapping, w, labels


def model_from_data(
    data: list[dict], tagger: PerceptronTagger | None = None, iterations: int = 100
) -> MaxentNER:
    """ModelFromData / UsingEntities equivalent (model.go:28-38)."""
    corpus = make_corpus(data, tagger)
    mapping, w, labels = train_maxent(corpus, iterations)
    fv_id, W = _regroup(mapping, w, labels)
    ner = MaxentNER.__new__(MaxentNER)
    ner.labels = labels
    from prose_spark.nlp.ner import default_ner

    ner.enwords = default_ner().enwords
    ner._enset = frozenset(ner.enwords)
    ner.fv_id = fv_id
    ner.W = np.vstack([np.zeros((1, W.shape[1])), W])
    ner._o_index = labels.index("O") if "O" in labels else 0
    ner._static_memo = {}
    ner._hist_memo = {}
    return ner


def _regroup(mapping: dict[str, int], weights: np.ndarray, labels: list[str]):
    """Group fname-fval-label weights into a (n_fv, L) matrix (same
    re-encoding as scripts/convert_ner_model.py); fv_id values are 1-based
    (row 0 of the padded matrix = miss)."""
    lab_suffix = sorted(((l, "-" + l) for l in labels), key=lambda x: -len(x[1]))
    lab_pos = {l: i for i, l in enumerate(labels)}
    fv_id: dict[str, int] = {}
    rows: list[list[float]] = []
    for key, idx in mapping.items():
        for lab, suf in lab_suffix:
            if key.endswith(suf):
                fv = key[: -len(suf)]
                break
        else:
            continue
        r = fv_id.get(fv)
        if r is None:
            fv_id[fv] = r = len(rows)
            rows.append([0.0] * len(labels))
        rows[r][lab_pos[lab]] = float(weights[idx])
    W = np.asarray(rows)
    # 1-based ids to match MaxentNER's padded weight matrix
    return {k: v + 1 for k, v in fv_id.items()}, W

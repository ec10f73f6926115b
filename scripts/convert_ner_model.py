"""Convert the reference's gob-encoded Maxent NER model into a standalone
npz artifact at prose_spark/models/maxent_ner.npz.

The binary-joint-feature mapping (fname-fval-label -> index, ~149k
entries) is regrouped into a dense (n_fv, n_labels) weight matrix keyed by
"fname-fval": score(label) = sum over fired fv rows of W[fv, label]. This
is a lossless re-encoding of the reference's encode() scoring
(extract.go:191-203, 365-384): absent (fv,label) combos score 0 there and
are 0 cells here.

Run once: python scripts/convert_ner_model.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from prose_spark.gobdec import decode_gob_file

REF = Path("/root/reference/model/Maxent")
OUT = Path(__file__).resolve().parent.parent / "prose_spark/models/maxent_ner.npz"


def regroup(mapping: dict[str, int], weights: list[float], labels: list[str]):
    lab_suffix = sorted(((l, "-" + l) for l in labels), key=lambda x: -len(x[1]))
    fv_id: dict[str, int] = {}
    rows: list[list[float]] = []
    lab_pos = {l: i for i, l in enumerate(labels)}
    n_bad = 0
    for key, idx in mapping.items():
        for lab, suf in lab_suffix:
            if key.endswith(suf):
                fv = key[: -len(suf)]
                break
        else:
            n_bad += 1
            continue
        r = fv_id.get(fv)
        if r is None:
            r = len(rows)
            fv_id[fv] = r
            rows.append([0.0] * len(labels))
        rows[r][lab_pos[lab]] = weights[idx]
    assert n_bad == 0, f"{n_bad} unparseable mapping keys"
    return fv_id, np.asarray(rows, dtype=np.float64)


def main() -> None:
    mapping = decode_gob_file(str(REF / "mapping.gob"))
    weights = decode_gob_file(str(REF / "weights.gob"))
    labels = decode_gob_file(str(REF / "labels.gob"))
    enwords = decode_gob_file(str(REF / "words.gob"))
    print(f"mapping={len(mapping)} weights={len(weights)} labels={labels}")

    fv_id, W = regroup(mapping, weights, labels)
    print(f"fv rows={len(fv_id)}, W={W.shape}, inf={np.isinf(W).sum()}")

    fv_keys = np.array(list(fv_id.keys()), dtype=object)
    # rows were appended in fv_id insertion order, so keys align with W rows
    np.savez_compressed(
        OUT,
        labels=np.array(labels, dtype=object),
        fv_keys=fv_keys,
        W=W,
        enwords=np.array(enwords, dtype=object),
    )
    print(f"saved {OUT} ({OUT.stat().st_size / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()

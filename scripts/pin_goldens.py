"""Pin golden fixtures from the current pipeline (FIXTURES.md B2).

Generates, from the deterministic 200-page synthetic corpus (seed=42):
- tests/goldens/golden_text.json   — url -> sha256 of the sanitized text
  bytes (the per-url byte-identity invariant);
- tests/goldens/golden_triples.json — url/sent_idx/subj/pred/obj rows;
- tests/goldens/golden_annotations.json — full token/sentence/entity
  dumps for the first 10 en docs.

Run once per intentional model/pipeline change; the regression tests in
tests/test_goldens.py then enforce P/R >= 0.95 vs these pins (exact match
expected for an unchanged pipeline).
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from prose_spark.nlp.tokenizer import sanitize  # noqa: E402
from prose_spark.operators.annotate import annotate_document  # noqa: E402
from prose_spark.operators.triples import extract_triples_doc  # noqa: E402
from prose_spark.sources.pages import generate_pages_rows  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "tests/goldens"
N_DOCS = 200


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    text_hashes = {}
    triples = []
    annotations = []
    n_annotated = 0
    for url, ts, html, text, lang, gold in generate_pages_rows(N_DOCS, seed=42):
        clean_b = sanitize(text).encode("utf-8")
        text_hashes[url] = hashlib.sha256(clean_b).hexdigest()
        if lang != "en":
            continue
        sents, toks, ents = annotate_document(text)
        for tr in extract_triples_doc(toks):
            triples.append(
                {"url": url, "sent_idx": tr["sent_idx"], "subj": tr["subj"],
                 "pred": tr["pred"], "obj": tr["obj"],
                 "pred_norm": tr["pred_norm"]}
            )
        if n_annotated < 10:
            annotations.append(
                {"url": url, "sentences": sents, "tokens": toks,
                 "entities": ents}
            )
            n_annotated += 1

    (OUT / "golden_text.json").write_text(json.dumps(text_hashes, indent=0))
    (OUT / "golden_triples.json").write_text(json.dumps(triples, indent=0))
    (OUT / "golden_annotations.json").write_text(
        json.dumps(annotations, indent=0)
    )
    print(f"pinned {len(text_hashes)} text hashes, {len(triples)} triples, "
          f"{len(annotations)} annotation dumps -> {OUT}")


if __name__ == "__main__":
    main()

"""Isolated chunker-kernel micro-bench (the BASELINE.md protocol,
committed so the number is reproducible instead of ad hoc).

Measures extract_triples_doc ALONE — annotate() output precomputed —
on 120 one-KB sherlock chunks, single-threaded, 7 interleaved reps,
reporting the min/median per-pass wall. History: r6 0.142s, r7 0.185s
per pass (the +30% guard-batch growth the r7 verdict flags); the r8
consolidation target is <=0.16s with byte-identical kernel output.

Usage: python3 scripts/chunker_microbench.py [--reps 7] [--docs 120]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHERLOCK = Path("/root/reference/testdata/sherlock.txt")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--docs", type=int, default=120)
    ap.add_argument("--chunk", type=int, default=1024)
    args = ap.parse_args()

    from prose_spark.operators.annotate import annotate_document
    from prose_spark.operators.triples import extract_triples_doc

    text = SHERLOCK.read_text(encoding="utf-8-sig")
    docs = [
        text[i * args.chunk:(i + 1) * args.chunk]
        for i in range(args.docs)
    ]
    annotated = [annotate_document(d)[1] for d in docs]

    # output digest: consolidation work must keep this byte-identical
    digest = hashlib.sha256()
    n_triples = 0
    for toks in annotated:
        tri = extract_triples_doc(toks)
        n_triples += len(tri)
        digest.update(
            json.dumps(tri, sort_keys=True, default=str).encode())

    passes = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        for toks in annotated:
            extract_triples_doc(toks)
        passes.append(time.perf_counter() - t0)
    passes_s = sorted(passes)
    print(json.dumps({
        "docs": args.docs,
        "reps": args.reps,
        "n_triples": n_triples,
        "output_sha256": digest.hexdigest()[:16],
        "per_pass_sec_min": round(passes_s[0], 4),
        "per_pass_sec_median": round(passes_s[len(passes_s) // 2], 4),
        "per_pass_all": [round(p, 4) for p in passes],
    }))


if __name__ == "__main__":
    main()

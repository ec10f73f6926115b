"""Byte-identity golden for the annotate+triples kernel.

Runs the pure-Python kernel over N bench-corpus docs and prints a single
hash over every emitted triple field (and token stream fields), so any
optimization can be checked for byte-identical output:

    python scripts/kernel_golden.py 2000        # print hash
    python scripts/kernel_golden.py 2000 save   # save to /tmp baseline
    python scripts/kernel_golden.py 2000 check  # compare vs saved
"""
import hashlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow.parquet as pq

from prose_spark.operators.annotate import annotate_document
from prose_spark.operators.triples import extract_triples_doc

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
MODE = sys.argv[2] if len(sys.argv) > 2 else "print"

tb = pq.read_table("/tmp/prose_spark_bench_pages_12000",
                   columns=["url", "text", "lang"])
rows = [(u, t) for u, t, lg in zip(tb["url"].to_pylist(),
                                   tb["text"].to_pylist(),
                                   tb["lang"].to_pylist())
        if lg == "en"][:N]

h = hashlib.sha256()
n_tr = 0
n_tok = 0
t0 = time.time()
for url, text in rows:
    sents, toks, ents = annotate_document(text)
    for t in toks:
        h.update(json.dumps([t["text"], t["tag"], t["label"], t["start"],
                             t["end"], round(t["confidence"], 9),
                             t["sent_idx"]]).encode())
    n_tok += len(toks)
    for s in sents:
        h.update(json.dumps([s["text"], s["start"], s["end"]]).encode())
    for e in ents:
        h.update(json.dumps(sorted(e.items()), default=str).encode())
    for tr in extract_triples_doc(toks):
        h.update(json.dumps([url] + [tr[k] for k in sorted(tr)],
                            default=str).encode())
        n_tr += 1
dt = time.time() - t0
digest = h.hexdigest()
print(f"{N} docs, {n_tok} tokens, {n_tr} triples, {dt:.2f}s "
      f"({n_tr/dt:.0f} t/s)\nhash: {digest}", file=sys.stderr)

base = Path("/tmp/kernel_golden_%d.txt" % N)
if MODE == "save":
    base.write_text(digest)
    print("saved", file=sys.stderr)
elif MODE == "check":
    want = base.read_text().strip()
    if want == digest:
        print("IDENTICAL", file=sys.stderr)
    else:
        print(f"MISMATCH: want {want}", file=sys.stderr)
        sys.exit(1)

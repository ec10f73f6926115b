"""Profile the pure-Python annotate+triples kernel over bench-corpus docs.

Usage: python scripts/profile_kernel.py [n_docs] [sortkey]
Prints cProfile stats (cumulative) for the fused kernel — the thing
bench.py's triples_per_sec headline measures.
"""
import cProfile
import pstats
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow.parquet as pq

from prose_spark.operators.annotate import annotate_document
from prose_spark.operators.triples import extract_triples_doc

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300
SORT = sys.argv[2] if len(sys.argv) > 2 else "cumulative"

tb = pq.read_table("/tmp/prose_spark_bench_pages_12000",
                   columns=["text", "lang"])
texts = [t for t, lg in zip(tb["text"].to_pylist(), tb["lang"].to_pylist())
         if lg == "en"][:N]

# warm: model load + memo caches
for t in texts[:40]:
    _, toks, _ = annotate_document(t)
    extract_triples_doc(toks)


def work():
    n = 0
    for t in texts:
        _, toks, _ = annotate_document(t)
        n += len(extract_triples_doc(toks))
    return n


t0 = time.time()
n = work()
dt = time.time() - t0
print(f"uninstrumented: {n} triples from {len(texts)} docs "
      f"in {dt:.3f}s = {n/dt:.0f} t/s", file=sys.stderr)

pr = cProfile.Profile()
pr.enable()
work()
pr.disable()
st = pstats.Stats(pr)
st.sort_stats(SORT).print_stats(45)

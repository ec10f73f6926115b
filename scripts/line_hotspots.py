"""Poor-man's line profiler for extract_triples_doc: counts line events
and approximate time per line via sys.settrace, for the top-N hot lines.

Usage: python scripts/line_hotspots.py [n_docs] [module_substr]
"""
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow.parquet as pq

from prose_spark.operators.annotate import annotate_document
from prose_spark.operators.triples import extract_triples_doc

N = int(sys.argv[1]) if len(sys.argv) > 1 else 120
TARGET = sys.argv[2] if len(sys.argv) > 2 else "triples.py"

tb = pq.read_table("/tmp/prose_spark_bench_pages_12000",
                   columns=["text", "lang"])
texts = [t for t, lg in zip(tb["text"].to_pylist(), tb["lang"].to_pylist())
         if lg == "en"][:N]
toks_all = []
for t in texts:
    _, toks, _ = annotate_document(t)
    toks_all.append(toks)

counts: dict[tuple, int] = defaultdict(int)
times: dict[tuple, float] = defaultdict(float)
last = [None, 0.0]


def tracer(frame, event, arg):
    fn = frame.f_code.co_filename
    if TARGET not in fn:
        return None
    def line_tracer(frame, event, arg):
        now = time.perf_counter()
        if last[0] is not None:
            times[last[0]] += now - last[1]
        key = (frame.f_code.co_filename.rsplit('/', 1)[-1], frame.f_lineno)
        counts[key] += 1
        last[0] = key
        last[1] = time.perf_counter()
        return line_tracer
    return line_tracer


sys.settrace(tracer)
for toks in toks_all:
    extract_triples_doc(toks)
sys.settrace(None)

rows = sorted(times.items(), key=lambda kv: -kv[1])[:60]
src = {}
for (f, ln), tm in rows:
    print(f"{tm*1000:9.1f}ms {counts[(f, ln)]:9d}x  {f}:{ln}")

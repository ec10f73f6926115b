"""Supplementary per-query benchmark + plan capture (guide §1.4/§1.5).

NOT part of the frozen driver contract (bench.py is): this harness
isolates each declared sweep query at $SPARK_GRAFT_SF_DIR, times the
same .count() action bench.py times (plus an optional noop-sink pass
that computes every column), and writes .explain("formatted") output to
plans/r09/<query>_<tag>.txt for the optimization record.

Usage:
  python bench_extra.py before [reps] [query ...]   # capture plans+times
  python bench_extra.py after  [reps] [query ...]
Prints one JSON line per query to stdout; stderr carries progress.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS = Path(__file__).resolve().parent / "plans" / "r09"

DEFAULT_QUERIES = [
    "nlp_token_counts", "nlp_triples", "kg_triple_support",
    "ta_quality", "ta_fingerprint", "ta_bpe_token_counts",
    "dedup_exact_groups", "dedup_minhash_pairs", "dedup_simhash",
    "dedup_embedding_pairs",
    "sim_topk_bruteforce", "sim_topk_lsh", "sim_topk_ivf",
    "rel_q1", "rel_top_customers", "rel_window_topk",
    "rel_events_hourly", "rel_nation_rollup",
    "kg_merge_canonical",
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    names = sys.argv[3:] or DEFAULT_QUERIES

    import __spark_entry__ as entrymod
    from prose_spark.session import get_spark

    PLANS.mkdir(parents=True, exist_ok=True)
    qs = entrymod.queries()
    spark = get_spark(app_name=f"bench_extra_{tag}", cores=CPUS)
    try:
        # warm python workers once (same as bench.py)
        qs["nlp_token_counts"](spark, SF_DIR).count()
        for name in names:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            (PLANS / f"{name}_{tag}.txt").write_text(plan)
            times = []
            n = -1
            for _ in range(reps):
                spark.sparkContext.setJobDescription(f"{name} [{tag}]")
                t0 = time.time()
                n = qs[name](spark, SF_DIR).count()
                times.append(round(time.time() - t0, 3))
                spark.sparkContext.setJobDescription(None)
            rec = {"query": name, "tag": tag, "rows": n,
                   "times": times, "min": min(times)}
            print(json.dumps(rec), flush=True)
            log(f"  {name}: min {min(times)}s over {reps} ({n} rows)")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()

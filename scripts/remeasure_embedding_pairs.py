"""One-off quiet-window re-measure for dedup_embedding_pairs (r5 VERDICT #1).

r5 recorded 13.94s vs 4.41s in r4 on a docstring-only diff; the judge asked
for a 3x interleaved re-measure at steal~0 before it can be closed as host
noise.  Interleaves the suspect query with two neighbors of similar shape
(dedup_minhash_pairs, sim_topk_ivf) so each repetition carries its own
time-local reference points, and records per-run steal from /proc/stat.

Usage: python3 scripts/remeasure_embedding_pairs.py [sf_dir]
Prints one JSON line with all timings.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cpu_sample() -> tuple[float, float]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    busy = (int(parts[1]) + int(parts[3])) / 100.0
    steal = int(parts[8]) / 100.0
    return busy, steal


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod
    from prose_spark.session import get_spark

    qs = entrymod.queries()
    names = ["dedup_minhash_pairs", "dedup_embedding_pairs", "sim_topk_ivf"]
    spark = get_spark(app_name="remeasure_embedding", cores=cores)
    out: dict = {"sf_dir": sf_dir, "cores": cores, "runs": []}
    try:
        # warm JVM + python workers + parquet footers
        qs["nlp_token_counts"](spark, sf_dir).count()
        for rep in range(3):
            for name in names:
                b0, s0 = cpu_sample()
                t0 = time.time()
                n = qs[name](spark, sf_dir).count()
                dt = time.time() - t0
                b1, s1 = cpu_sample()
                rec = {
                    "rep": rep, "query": name, "seconds": round(dt, 3),
                    "rows": n,
                    "cpus_busy": round((b1 - b0) / max(dt, 1e-9), 2),
                    "cpus_steal": round((s1 - s0) / max(dt, 1e-9), 2),
                }
                out["runs"].append(rec)
                print(f"  {rec}", file=sys.stderr)
    finally:
        spark.stop()
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    for name in names:
        ts = [r["seconds"] for r in out["runs"] if r["query"] == name]
        out[f"median_{name}"] = med(ts)
    out["max_steal"] = max(r["cpus_steal"] for r in out["runs"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()

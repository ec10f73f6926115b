"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], printing ONE JSON line:

  {"metric": "triples_per_sec", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ...,
   "scaling": {"cores_lo": .., "cores_hi": .., "thr_lo": .., "thr_hi": ..,
               "efficiency": ..}}

The headline metric is KG-construction throughput (triples/sec) over the
synthetic Common-Crawl-style pages corpus (annotate -> triple extraction),
per BASELINE.json. The scaling block evidences the north rule's N->4N
criterion at two parallelism levels on identical input (sandbox proxy —
no real cluster here; see BASELINE.md for the pair choice rationale).
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
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "12000"))
# Scaling-efficiency pair (N -> 4N). A mapInPandas task occupies ~2 cores
# (JVM Arrow feeder thread + Python worker), so on this 32-core box any
# pair whose high side nears 16 slots saturates the machine and a low side
# with idle cores gets free turbo/JVM headroom. 2 -> 8 keeps BOTH runs
# far from saturation so the ratio measures framework scaling, not core
# borrowing; override with SPARK_GRAFT_SCALING_LO/HI.
SCALING_LO = int(os.environ.get("SPARK_GRAFT_SCALING_LO", "2"))
SCALING_HI = int(os.environ.get("SPARK_GRAFT_SCALING_HI", "8"))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def kg_throughput(cores: int, pages_path: str) -> dict:
    """Annotate -> triples over the pages corpus at a given parallelism;
    returns docs/sec + triples/sec (workers warmed up before timing)."""
    from pyspark.sql import functions as F

    from prose_spark.operators.triples import annotate_and_extract_triples
    from prose_spark.session import get_spark

    spark = get_spark(app_name=f"bench{cores}", cores=cores,
                      shuffle_partitions=max(cores, 8))
    try:
        pages = spark.read.parquet(pages_path)
        en = pages.filter(F.col("lang") == "en").select("url", "text")
        en = en.repartition(cores * 2).cache()
        n_docs = en.count()

        # warm up python workers (model load + module imports happen once
        # per worker, outside the timed window)
        warm = en.limit(cores * 4).repartition(cores)
        annotate_and_extract_triples(warm).count()

        t0 = time.time()
        tr = annotate_and_extract_triples(en)
        n_triples = tr.count()
        dt = time.time() - t0
        return {
            "cores": cores,
            "n_docs": n_docs,
            "n_triples": n_triples,
            "seconds": round(dt, 3),
            "docs_per_sec": round(n_docs / dt, 2),
            "triples_per_sec": round(n_triples / dt, 2),
        }
    finally:
        spark.stop()


def run_queries(sf_dir: str, cores: int) -> dict[str, float]:
    """Time a representative subset of __spark_entry__ queries."""
    import __spark_entry__ as entrymod
    from prose_spark.session import get_spark

    names = [
        "nlp_token_counts", "nlp_triples", "ta_quality", "ta_fingerprint",
        "dedup_exact_groups", "dedup_minhash_pairs", "dedup_simhash",
        "sim_topk_bruteforce", "sim_topk_lsh",
        "rel_q1", "rel_top_customers", "rel_window_topk",
        "rel_events_hourly", "rel_nation_rollup",
    ]
    qs = entrymod.queries()
    spark = get_spark(app_name="bench_queries", cores=cores)
    out: dict[str, float] = {}
    try:
        # warm python workers once
        qs["nlp_token_counts"](spark, sf_dir).count()
        for name in names:
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            out[name] = round(time.time() - t0, 3)
            log(f"  {name}: {out[name]}s ({n} rows)")
    finally:
        spark.stop()
    return out


def main() -> None:
    t_start = time.time()
    sf = SF_DIR.rstrip("/").split("sf")[-1]

    # materialize the pages corpus once (deterministic, seed=42)
    pages_path = f"/tmp/prose_spark_bench_pages_{N_PAGES}"
    if not os.path.exists(pages_path + "/_SUCCESS"):
        from prose_spark.session import get_spark
        from prose_spark.sources.pages import write_pages_parquet

        spark = get_spark(app_name="bench_gen", cores=CPUS)
        write_pages_parquet(spark, pages_path, N_PAGES)
        spark.stop()
        log(f"generated {N_PAGES} pages at {pages_path}")

    log(f"== scaling run: local[{SCALING_LO}] ==")
    lo = kg_throughput(SCALING_LO, pages_path)
    log(str(lo))
    log(f"== scaling run: local[{SCALING_HI}] ==")
    hi = kg_throughput(SCALING_HI, pages_path)
    log(str(hi))
    ratio = hi["triples_per_sec"] / max(lo["triples_per_sec"], 1e-9)
    ideal = SCALING_HI / SCALING_LO
    efficiency = ratio / ideal

    log("== per-query timings ==")
    queries = run_queries(SF_DIR, CPUS)

    result = {
        "metric": "triples_per_sec",
        "value": hi["triples_per_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "kg": {"lo": lo, "hi": hi},
        "scaling": {
            "cores_lo": SCALING_LO,
            "cores_hi": SCALING_HI,
            "thr_lo_triples_per_sec": lo["triples_per_sec"],
            "thr_hi_triples_per_sec": hi["triples_per_sec"],
            "speedup": round(ratio, 3),
            "ideal": ideal,
            "efficiency": round(efficiency, 3),
        },
        "wall_clock_sec": round(time.time() - t_start, 1),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()

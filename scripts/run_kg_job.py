"""Production KG-construction job entrypoint.

Cluster usage:
    python scripts/make_pyfiles.py                       # build the zip
    spark-submit --py-files dist/prose_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.adaptive.skewJoin.enabled=true \\
        --conf spark.sql.execution.arrow.pyspark.enabled=true \\
        scripts/run_kg_job.py \\
        --pages <iceberg-table-or-parquet-path> \\
        --out   <output-root> \\
        --buckets 4096

Local smoke (this sandbox):
    python scripts/run_kg_job.py --pages synthetic:2000 --out /tmp/kg_out

The job is resumable: finished buckets are skipped via the done-marker
table (prose_spark.sources.checkpoints); per-bucket lineage and metrics
land next to the data. Triples are partitioned by bucket; at production
scale swap the parquet writes for Iceberg appends partitioned by
days(warc_ts), bucket(url).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True,
                    help="pages path (iceberg/parquet), WARC glob "
                         "(*.warc / *.warc.gz), or synthetic:<n>")
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--canonicalize", action="store_true",
                    help="also build entities_canonical + canonical triples")
    ap.add_argument("--incremental-canonical", action="store_true",
                    help="fold only THIS run's buckets into an existing "
                         "entities_canonical via merge_canonicalize "
                         "(marker-driven re-canonicalization: the "
                         "accumulated vocabulary is never re-paired "
                         "against itself); falls back to batch when no "
                         "prior table exists; implies --canonicalize")
    ap.add_argument("--gold-metrics", action="store_true",
                    help="synthetic pages only: record per-bucket P/R vs "
                         "the generator's gold triples in the done markers")
    ap.add_argument("--iceberg-table", default=None,
                    help="write triples to this Iceberg table "
                         "(catalog.db.table) via writeTo/overwritePartitions"
                         " instead of parquet under --out; requires an "
                         "Iceberg catalog in the session conf")
    ap.add_argument("--timeout-sec", type=float, default=None,
                    help="per-document budget; dropped docs are counted "
                         "as n_doc_timeouts in the done markers")
    ap.add_argument("--entity-stats", action="store_true",
                    help="write entity_degrees + entity_pagerank "
                         "parquet next to the graph tables")
    ap.add_argument("--max-bucket-size", type=int, default=None,
                    help="canonicalization band-bucket cap (the web-"
                         "scale quadratic-densification guard); default "
                         "None keeps exact blocking")
    ap.add_argument("--min-stopword-ratio", type=float, default=None,
                    help="linguistic pre-gate: drop pages whose English "
                         "stopword ratio is below this BEFORE the NLP "
                         "chain runs (keyword-soup / boilerplate / tag-"
                         "stuffed pages are not clausal language — real "
                         "English prose sits around 0.3-0.5, SEO soup "
                         "near 0). All-JVM (textstats.add_quality_"
                         "scores), so at crawl scale the gate costs one "
                         "codegen'd scan and saves the full Python "
                         "annotate stage on every dropped page")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    # on a cluster, spark-submit provides master/conf; locally default in
    spark = SparkSession.builder.appName("prose_spark_kg").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from prose_spark.sources.checkpoints import read_triples, run_kg_job
    from prose_spark.sources.pages import build_pages_df, read_pages

    gold = None
    if args.pages.startswith("synthetic:"):
        n_docs = int(args.pages.split(":")[1])
        pages = build_pages_df(spark, n_docs)
        if args.gold_metrics:
            from prose_spark.sources.pages import generate_pages_rows

            gold_rows = [
                (url, s, p, o)
                for url, _, _, _, lang, g in generate_pages_rows(n_docs)
                if lang == "en"
                for s, p, o in g
            ]
            gold = spark.createDataFrame(
                gold_rows, "url string, subj string, pred string, obj string"
            )
    elif ".warc" in args.pages:
        from prose_spark.sources.warc import read_warc_pages

        pages = read_warc_pages(spark, args.pages)
    else:
        pages = read_pages(spark, args.pages)

    if args.min_stopword_ratio is not None:
        from prose_spark.operators.textstats import add_quality_scores

        _qcols = ("n_tokens", "n_chars_obs", "avg_word_len",
                  "punct_ratio", "stopword_ratio")
        n_before = pages.count()
        pages = (add_quality_scores(pages, "text")
                 .filter(F.col("stopword_ratio")
                         >= args.min_stopword_ratio)
                 .drop(*_qcols))
        n_after = pages.count()
        print(f"linguistic gate (stopword_ratio >= "
              f"{args.min_stopword_ratio}): kept {n_after}/{n_before} "
              f"pages")

    t0 = time.time()
    metrics = run_kg_job(spark, pages, args.out, n_buckets=args.buckets,
                         gold=gold, timeout_sec=args.timeout_sec,
                         iceberg_table=args.iceberg_table,
                         source_path=args.pages)
    done = metrics.count()
    triples = read_triples(spark, args.out)
    n = triples.count()
    print(f"processed {done} buckets this run; {n} triples total "
          f"in {time.time() - t0:.1f}s")
    if gold is not None and done:
        row = metrics.agg(
            F.round(F.avg("precision"), 4).alias("p"),
            F.round(F.avg("recall"), 4).alias("r"),
        ).collect()[0]
        print(f"per-bucket mean precision {row['p']}, recall {row['r']}")

    if args.canonicalize or args.incremental_canonical:
        from prose_spark.sources.checkpoints import update_canonical_tables

        stats = update_canonical_tables(
            spark, args.out,
            new_buckets={r.bucket for r in metrics.collect()},
            incremental=args.incremental_canonical,
            max_bucket_size=args.max_bucket_size,
        )
        print(f"canonical ({stats['path']}): {stats['n_forms']} entity "
              f"forms, {stats['n_canon_triples']} canonical triples")

    if args.entity_stats:
        # graph analytics over the materialized triples: per-entity
        # degrees + PageRank over the subj->obj edge list, written
        # next to the graph tables (rebuilt each run — derived data,
        # same discipline as the canonical-triples projection)
        from prose_spark.operators.graph import entity_degrees, pagerank

        src = args.out + ("/triples_canonical"
                          if (args.canonicalize
                              or args.incremental_canonical)
                          else "/triples")
        tri = spark.read.parquet(src)
        subj_col = "subj_id" if "subj_id" in tri.columns else "subj"
        obj_col = "obj_id" if "obj_id" in tri.columns else "obj"
        deg = entity_degrees(tri, subj_col=subj_col, obj_col=obj_col)
        deg.write.mode("overwrite").parquet(args.out + "/entity_degrees")
        pr = pagerank(
            tri.select(F.col(subj_col).cast("string").alias("src"),
                       F.col(obj_col).cast("string").alias("dst"))
            .distinct(),
            iterations=5,
        )
        pr.write.mode("overwrite").parquet(args.out + "/entity_pagerank")
        top = pr.orderBy(F.desc("rank")).limit(3).collect()
        names = {}
        if subj_col == "subj_id":
            # resolve canonical ids to their representative surfaces
            ent = spark.read.parquet(args.out + "/entities_canonical")
            wanted = [r.node for r in top]
            names = {
                str(r.entity_id): r.canonical_text
                for r in ent.filter(
                    F.col("entity_id").cast("string").isin(wanted)
                ).select("entity_id", "canonical_text")
                .dropDuplicates(["entity_id"]).collect()
            }
        print("entity stats: "
              f"{deg.count()} entities; top by pagerank: "
              + ", ".join(
                  f"{names.get(r.node, r.node)} ({r.rank:.4f})"
                  for r in top))

    spark.stop()


if __name__ == "__main__":
    main()

"""Checkpoint/resume + per-partition lineage & metrics (SURVEY.md §2.K
K6/K7).

The KG job processes the pages corpus in URL-hash buckets (at production
scale: Iceberg partitions of days(warc_ts) x bucket(url)). Each bucket is
an independent unit of work:

- output triples land under  <out>/triples/bucket=<b>/   (partitioned
  parquet; Iceberg append at production);
- a done-marker row with lineage + metrics is appended to
  <out>/_done/bucket=<b>/ after the bucket's write completes (marker
  written AFTER data => crash between the two re-processes the bucket,
  overwrite semantics make that idempotent);
- on restart, finished buckets are skipped via an anti-join of the work
  list against the done markers.

Metrics per bucket: row counts in/out, triples, wall time, input lineage
(source path + bucket id + code version) — queryable as a plain DataFrame.
"""

from __future__ import annotations

import json
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from prose_spark import __version__

DONE_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("n_docs", T.LongType()),
        T.StructField("n_triples", T.LongType()),
        T.StructField("wall_sec", T.DoubleType()),
        T.StructField("source_path", T.StringType()),
        T.StructField("engine_version", T.StringType()),
        T.StructField("finished_at", T.TimestampType()),
    ]
)


def with_bucket(df: DataFrame, n_buckets: int, key_col: str = "url") -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
    )


def done_buckets(spark: SparkSession, out_dir: str) -> set[int]:
    done_path = Path(out_dir) / "_done"
    if not done_path.exists():
        return set()
    df = spark.read.schema(DONE_SCHEMA).json(str(done_path))
    return {r.bucket for r in df.select("bucket").distinct().collect()}


def record_done(out_dir: str, metrics: dict) -> None:
    """Append one done-marker JSON line (atomic rename per bucket)."""
    done_dir = Path(out_dir) / "_done"
    done_dir.mkdir(parents=True, exist_ok=True)
    tmp = done_dir / f".bucket_{metrics['bucket']}.tmp"
    final = done_dir / f"bucket_{metrics['bucket']}.json"
    tmp.write_text(json.dumps(metrics) + "\n")
    tmp.rename(final)


def run_kg_job(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_buckets: int = 8,
    fail_after_bucket: int | None = None,
) -> DataFrame:
    """Resumable KG-construction job: pages -> per-bucket triples parquet.

    ``fail_after_bucket`` injects a crash for the pytest kill/restart test.
    Returns the metrics DataFrame of this run.
    """
    from prose_spark.operators.triples import annotate_and_extract_triples

    en = pages.filter(F.col("lang") == "en").select("url", "text")
    work = with_bucket(en, n_buckets)
    finished = done_buckets(spark, out_dir)
    run_metrics = []

    for b in range(n_buckets):
        if b in finished:
            continue
        t0 = time.time()
        part = work.filter(F.col("bucket") == b).select("url", "text")
        triples = annotate_and_extract_triples(part)
        dest = f"{out_dir}/triples/bucket={b}"
        triples.write.mode("overwrite").parquet(dest)
        n_triples = spark.read.parquet(dest).count()
        n_docs = part.count()
        metrics = {
            "bucket": b,
            "n_docs": n_docs,
            "n_triples": n_triples,
            "wall_sec": round(time.time() - t0, 3),
            "source_path": "pages",
            "engine_version": __version__,
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        record_done(out_dir, metrics)
        run_metrics.append(metrics)
        if fail_after_bucket is not None and b >= fail_after_bucket:
            raise RuntimeError(f"injected failure after bucket {b}")

    if not run_metrics:
        return spark.createDataFrame([], DONE_SCHEMA)
    return spark.createDataFrame(
        [
            (
                m["bucket"], m["n_docs"], m["n_triples"], m["wall_sec"],
                m["source_path"], m["engine_version"], None,
            )
            for m in run_metrics
        ],
        DONE_SCHEMA,
    )


def read_triples(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/triples")


def reset_output(out_dir: str) -> None:
    shutil.rmtree(out_dir, ignore_errors=True)

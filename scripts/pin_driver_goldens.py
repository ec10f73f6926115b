"""Pin the driver-contract golden parquet oracles.

For each query in __spark_entry__.PINNED_QUERIES, runs the Spark query at
sf0.01 and writes its output to tests/goldens/driver/<name>/ — the DuckDB
oracle then reads that parquet back, turning rows-only queries into hard
rows+schema+value-hash checks.

Re-run ONLY on intentional kernel/operator changes, and hand-review the
resulting diff (row counts are printed; spot-check values with duckdb).

Usage: python3 scripts/pin_driver_goldens.py [name ...]
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from prose_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark(cores=16)
    qs = entrymod.queries()
    for name in entrymod.PINNED_QUERIES:
        if only and name not in only:
            continue
        df = qs[name](spark, SF_DIR)
        dest = entrymod.GOLDEN_DIR / name
        shutil.rmtree(dest, ignore_errors=True)
        df.coalesce(1).write.mode("overwrite").parquet(str(dest))
        # drop Spark bookkeeping files; keep the parquet part only
        for p in dest.iterdir():
            if not p.name.endswith(".parquet"):
                p.unlink()
        n = spark.read.parquet(str(dest)).count()
        print(f"pinned {name}: {n} rows -> {dest}")
    spark.stop()


if __name__ == "__main__":
    main()

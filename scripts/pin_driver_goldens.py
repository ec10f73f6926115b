"""Pin the driver-contract golden parquet oracles.

For each query in __spark_entry__.PINNED_QUERIES, runs the Spark query at
PINNED_SF (sf0.01) and writes its output to
tests/goldens/driver/<PINNED_SF>/<name>/ — the DuckDB oracle then reads
that parquet back, turning rows-only queries into hard
rows+schema+value-hash checks. The sf is part of the path: a gate run at
any other scale factor fails loudly on the missing directory instead of
silently comparing wrong-scale expectations.

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

SF_DIR = f"/root/testdata/{entrymod.PINNED_SF}"


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark(cores=16)
    qs = entrymod.queries()
    for name in entrymod.PINNED_QUERIES:
        if only and name not in only:
            continue
        df = qs[name](spark, SF_DIR)
        dest = entrymod.golden_path(name)
        dest.parent.mkdir(parents=True, exist_ok=True)
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

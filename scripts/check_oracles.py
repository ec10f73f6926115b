"""Local replica of the driver's correctness gate: run every
__spark_entry__ query at sf0.01 next to its DuckDB oracle and compare
row count, schema, and an order-insensitive value hash (columns sorted by
name, rows sorted, values stringified).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from prose_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows, cols) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_norm_val(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def _norm_val(v) -> str:
    if v is None:
        return "\x00"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}"
    return str(v)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(cores=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt_spark = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows={len(srows)} (rows-only, {dt_spark:.1f}s)")
            n_pass += 1
            continue
        try:
            cur = con.execute(sql)
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            n_fail += 1
            continue
        ok_rows = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        sh = value_hash([tuple(r) for r in srows], scols)
        dh = value_hash(drows, dcols)
        if ok_rows and ok_cols and sh == dh:
            print(f"PASS {name}: rows={len(srows)} ({dt_spark:.1f}s)")
            n_pass += 1
        else:
            print(
                f"FAIL {name}: rows {len(srows)}/{len(drows)} cols_ok={ok_cols}"
                f" hash {'ok' if sh == dh else 'MISMATCH'}"
            )
            if not ok_cols:
                print(f"  spark cols: {sorted(scols)}")
                print(f"  duck  cols: {sorted(dcols)}")
            if ok_rows and ok_cols and sh != dh:
                s_set = {tuple(r) for r in srows}
                d_set = set(drows)
                # normalize to strings for diff display
                sn = {tuple(_norm_val(v) for v in r) for r in s_set}
                dn = {tuple(_norm_val(v) for v in r) for r in d_set}
                for r in list(sn - dn)[:3]:
                    print(f"  spark-only: {r}")
                for r in list(dn - sn)[:3]:
                    print(f"  duck-only:  {r}")
            n_fail += 1
    n_reg = len(qs) if not only else len(only)
    print(f"\n{n_pass} pass, {n_fail} fail ({n_reg} registered)")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

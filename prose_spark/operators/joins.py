"""Specialized joins Spark lacks natively.

As-of join (point-in-time): for each left row, the latest right row with
right.ts <= left.ts within the same key. Implemented as a union + window
carry-forward — one shuffle on (key), no range explosion:

    tag rows (left=1/right=0) -> union -> window by key ordered by
    (ts, side) -> last non-null right value seen so far -> keep left rows.

This scales to arbitrarily large sides (contrast with per-group
``pd.merge_asof`` in applyInPandas, which needs a whole group in memory —
provided here as the small-group alternative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_value_cols: tuple[str, ...] = ("value",),
    suffix: str = "_asof",
) -> DataFrame:
    """left rows + the most recent right row's value columns (ts_right <=
    ts_left), matched within ``on``. Right-side columns are suffixed."""
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    r = right.select(
        on, ts, *right_value_cols
    ).withColumn("_side", F.lit(0))

    # align schemas for the union
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None))
    for c in right_value_cols:
        if c not in l.columns:
            l = l.withColumn(c, F.lit(None))
    cols = list(dict.fromkeys(lcols + [ts, "_side"] + list(right_value_cols)))
    u = l.select(*cols).unionByName(r.select(*cols))

    # right rows sort BEFORE left rows at equal ts (side 0 < 1), so an
    # exactly-simultaneous right row is visible to the left row
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = u
    for c in right_value_cols:
        carried = F.last(
            F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True
        ).over(w)
        out = out.withColumn(c + suffix, carried)
    return (
        out.filter(F.col("_side") == 1)
        .select(*lcols, *[c + suffix for c in right_value_cols])
    )


def asof_join_grouped(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_value_cols: tuple[str, ...] = ("value",),
    suffix: str = "_asof",
) -> DataFrame:
    """Grouped-map alternative: cogroup + pd.merge_asof per key. Simpler
    semantics, but each key's rows must fit one executor's memory — use
    ``asof_join`` (window carry-forward) when groups can be huge."""
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(left.schema.fields)
        + [
            T.StructField(
                c + suffix, dict(zip(right.columns, right.schema.fields))[c].dataType
            )
            for c in right_value_cols
        ]
    )
    lcols = left.columns

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        out_cols = [f.name for f in out_schema.fields]
        if l_pdf.empty:
            return pd.DataFrame(columns=out_cols)
        l_pdf = l_pdf.sort_values(ts)
        if r_pdf.empty:
            for c in right_value_cols:
                l_pdf[c + suffix] = None
            return l_pdf[out_cols]
        r_pdf = (
            r_pdf[[ts, *right_value_cols]]
            .rename(columns={c: c + suffix for c in right_value_cols})
            .sort_values(ts)
        )
        merged = pd.merge_asof(l_pdf, r_pdf, on=ts, direction="backward")
        return merged[out_cols]

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(merge, schema=out_schema)
    )


def salted_agg(
    df: DataFrame,
    key_col: str,
    agg_exprs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: salt the key, partial-agg on
    (key, salt), then final-agg on key. Decomposable aggregates only
    (count/sum/min/max). At 100 TB a handful of hot keys (boilerplate
    mentions, empty docs) would otherwise pin single reducers.

    agg_exprs: {column: one of count|sum|min|max}.
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(key_col, "_salt").agg(
        *[
            (F.count(c) if how == "count" else getattr(F, how)(c)).alias(f"_{c}")
            for c, how in agg_exprs.items()
        ]
    )
    final_fns = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    return partial.groupBy(key_col).agg(
        *[
            getattr(F, final_fns[how])(f"_{c}").alias(f"{how}_{c}")
            for c, how in agg_exprs.items()
        ]
    )

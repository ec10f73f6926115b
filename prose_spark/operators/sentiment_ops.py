"""Spark-side sentiment columns (lexicon-only and hybrid lexicon+ML).

The Maxent model is a worker-process singleton (loaded once per Python
worker from the committed artifact), so the pandas UDFs stay Arrow-batch
vectorized with zero per-row model cost — the same pattern as the
tagger/NER kernels. Behavioral spec: sentiment.go:76-116 (AnalyzeDocument
with UseML=true and the 0.4/0.6 combine weights).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MODEL = None

SENTIMENT_TYPE = T.StructType([
    T.StructField("polarity", T.DoubleType()),
    T.StructField("intensity", T.DoubleType()),
    T.StructField("confidence", T.DoubleType()),
    T.StructField("dominant", T.StringType()),
])


def default_sentiment_model():
    """Committed GIS-trained Maxent sentiment model (worker singleton).
    Loaded via the zip-safe artifact reader so it works under
    spark-submit --py-files dist/prose_spark.zip, like the tagger/NER
    artifacts."""
    global _MODEL
    if _MODEL is None:
        from prose_spark.artifacts import read_bytes
        from prose_spark.nlp.sentiment_ml import MaxentSentiment

        _MODEL = MaxentSentiment.load_bytes(
            read_bytes("sentiment_maxent.json.gz")
        )
    return _MODEL


def _analyze_series(texts: pd.Series, use_ml: bool) -> pd.DataFrame:
    from prose_spark.nlp.sentiment import analyze_document

    model = default_sentiment_model() if use_ml else None
    rows = []
    for t in texts:
        s = analyze_document(t or "", ml_model=model)
        rows.append((round(s["polarity"], 6), round(s["intensity"], 6),
                     round(s["confidence"], 6), s["dominant"]))
    return pd.DataFrame(
        rows, columns=["polarity", "intensity", "confidence", "dominant"]
    )


@F.pandas_udf(SENTIMENT_TYPE)
def sentiment_lexicon_udf(texts: pd.Series) -> pd.DataFrame:
    return _analyze_series(texts, use_ml=False)


@F.pandas_udf(SENTIMENT_TYPE)
def sentiment_hybrid_udf(texts: pd.Series) -> pd.DataFrame:
    return _analyze_series(texts, use_ml=True)


def add_sentiment(df: DataFrame, text_col: str = "text",
                  use_ml: bool = False) -> DataFrame:
    """Append polarity/intensity/confidence/dominant columns."""
    udf = sentiment_hybrid_udf if use_ml else sentiment_lexicon_udf
    return (
        df.withColumn("_s", udf(F.col(text_col)))
        .select("*", "_s.polarity", "_s.intensity", "_s.confidence",
                "_s.dominant")
        .drop("_s")
    )

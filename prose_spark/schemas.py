"""Fixed StructType schemas for the annotation pipeline (SURVEY.md §1.1).

The reference's value types (types.go:11-34) map onto nested arrays of
structs per document row; byte offsets follow the reference's split
convention: token offsets index the SANITIZED text, sentence offsets the
ORIGINAL text. ``sent_idx`` is our KG-layer addition assigning each token/
entity to its containing sentence (token spans converted into sanitized
space for the containment test).
"""

from pyspark.sql import types as T

TOKEN_TYPE = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("tag", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("sent_idx", T.IntegerType()),
    ]
)

SENTENCE_TYPE = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
    ]
)

ENTITY_TYPE = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("sent_idx", T.IntegerType()),
    ]
)

ANNOTATION_FIELDS = [
    T.StructField("sentences", T.ArrayType(SENTENCE_TYPE)),
    T.StructField("tokens", T.ArrayType(TOKEN_TYPE)),
    T.StructField("entities", T.ArrayType(ENTITY_TYPE)),
]

TRIPLE_TYPE = T.StructType(
    [
        T.StructField("sent_idx", T.IntegerType()),
        T.StructField("subj", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj", T.StringType()),
        T.StructField("pred_norm", T.StringType()),
        T.StructField("subj_label", T.StringType()),
        T.StructField("obj_label", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
    ]
)

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

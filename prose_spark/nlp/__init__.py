"""Pure-Python NLP kernels (tokenize / segment / tag / NER).

These are plain per-document functions with no Spark dependency; the Spark
layer wraps them in Arrow-batched mapInPandas stages
(prose_spark.operators.annotate). Keeping them import-light means each
Python worker pays module import + model load exactly once per executor
process (lazy singletons), not per batch.
"""

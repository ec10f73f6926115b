"""Spark-side operators: annotation kernel, triple extraction, entity
canonicalization, dedup family, similarity search, text analysis.

Relational plumbing stays in native pyspark.sql.functions (Catalyst
optimizes it); only the NLP kernels run in Arrow-batched mapInPandas."""

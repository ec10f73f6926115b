"""prose_spark — a PySpark-native KG-construction / NLP analytics engine.

A from-scratch rebuild of the query & data-processing capabilities of the
reference NLP library (tsawler/prose, Go) as an idiomatic Spark pipeline:

- Penn-Treebank-style tokenization with byte offsets  (prose_spark.nlp.tokenizer)
- punkt-like sentence segmentation                     (prose_spark.nlp.segmenter)
- averaged-perceptron POS tagging                      (prose_spark.nlp.tagger)
- IOB-chunked Maxent NER with confidences              (prose_spark.nlp.ner)
- fused document-annotation kernel over Arrow batches  (prose_spark.operators.annotate)
- triple extraction + MinHash-LSH canonicalization     (prose_spark.operators.triples /
                                                        prose_spark.operators.canonicalize)
- large-scale training-data ops: dedup, similarity
  search, text analysis, multimodal plumbing           (prose_spark.operators.*)

All NLP kernels are pure-Python per-document functions wrapped in
vectorized pandas/Arrow UDFs (mapInPandas) — never row-at-a-time Python
UDFs. Relational plumbing stays in native pyspark.sql.functions so Catalyst
can push filters/prune columns/pick join strategies.
"""

__version__ = "0.1.0"

"""information_retrieval_spark — a PySpark-native full-text index + BM25 engine.

Brand-new engine with the query/data-processing capabilities of the reference
(ahmadsalimi/information-retrieval): tokenize → inverted index → BM25/tf-idf
top-k retrieval, plus spell correction, graph ranking, dedup / similarity /
text-analysis operators for large-scale pipelines.

Spark-first design: DataFrame/SQL plans optimized by Catalyst; Python only in
vectorized Arrow (pandas) UDFs; no RDDs; no driver-side row loops.
"""

__version__ = "0.1.0"

"""PySpark-native near-duplicate detection + clustering engine.

A from-scratch re-expression of the capabilities of
MadisKarli/microdeduplication (reference at /root/reference, see SURVEY.md)
as idiomatic Spark SQL / DataFrame operators:

- exact dedup via content sha256                 (ref: within-doc LinkedHashSet dedup,
                                                  MicroDataExtraction.java:206-215, and the
                                                  SNM exact-equality predicate)
- k-shingle MinHash (128 perms) + LSH band join  (ref: SNM blocking key + sliding window,
                                                  Deduplication.java:64-125)
- 64-bit SimHash + Hamming-bucket probing        (ref: cosine-similarity fuzzy match,
                                                  CosineSimilarity.java:28-56)
- windowed line-hash substring pass              (ref: SNM ordered-neighbor compare,
                                                  Deduplication.java:103-104)
- exact-Jaccard candidate verification           (ref: Product.compare, Product.java:114-140)
- large-star/small-star connected components     (ref: stateful first-seen-representative scan,
                                                  Util.java:67-120)
- precision/recall/F evaluation, set + bag       (ref: EvaluateDeduplication.java:87-133)
- corpus statistics                              (ref: RDFStatistics.java:38-128)

No code is copied from the reference; it is a Java/RDD Spark-1.6 engine and this package is
DataFrame/Catalyst-first (see SURVEY.md for the operator-by-operator mapping).
"""

from microdeduplication_spark.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"

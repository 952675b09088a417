"""Vector math over `array<float>` embedding columns -- pure Column exprs.

JVM-side higher-order functions (zip_with + aggregate); no UDF in the scoring
path. Used by the similarity-search and embedding-near-dup operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector is all-zero.

    Spark-side analog of the reference's tf-vector cosine
    (/root/reference/deduplicaiton/.../utils/CosineSimilarity.java:28-56),
    lifted from per-pair Java maps to columnar array math.
    """
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))

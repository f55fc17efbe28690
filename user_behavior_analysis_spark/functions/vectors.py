"""Vector column math over ``array<float/double>`` embeddings.

All JVM-side higher-order functions (``zip_with``/``aggregate``) — no
Python in the loop, so brute-force similarity scans stay inside
whole-stage codegen. Embeddings are cast to double before arithmetic:
sums then happen in one deterministic left-to-right pass per row
(``aggregate`` folds sequentially), which keeps values reproducible and
oracle-comparable to within rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def as_double(vec: Column | str) -> Column:
    vec = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))

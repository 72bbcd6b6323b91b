"""Vector column expressions for embedding similarity (SURVEY.md §2.11).

All pure built-ins (F.zip_with / F.aggregate) so the math runs JVM-side
inside codegen — no Python in the hot path.  Inputs are `array<float>`
columns (the driver's `embeddings.embedding`); compute in double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Sum over element-wise products, left-to-right accumulation (matches a
    sequential loop, so results are reproducible across partitionings)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    sq = F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Zero-norm convention: a zero vector's cosine with anything is 0
    (matches _unit_rows on the Arrow path and the oracles' CASE guard);
    NULL vectors PROPAGATE NULL exactly like the oracles' CASE (a
    coalesce-over-try_divide would wrongly map NULL inputs to 0 too).
    The when() guards evaluation, so no ANSI DIVIDE_BY_ZERO."""
    den = l2_norm(a) * l2_norm(b)
    return F.when(den == 0, F.lit(0.0)).otherwise(dot(a, b) / den)

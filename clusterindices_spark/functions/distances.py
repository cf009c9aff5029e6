"""Vector distance kernels as Catalyst expressions (no UDFs).

These are Column → Column builders over ``ARRAY<DOUBLE>`` using higher-order
functions (``zip_with`` + ``aggregate``), which run inside whole-stage codegen
— roughly 10x faster than a pandas UDF for a 64-dim dot product because no
Arrow round-trip leaves the JVM (SURVEY.md §4.2).

Scale note (100 TB): each kernel is O(dim) per row with zero shuffle; cost is
embedded in whatever scan/join stage evaluates it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def l2sq(a: Column | str, b: Column | str) -> Column:
    """Squared Euclidean distance ‖a-b‖²."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance ‖a-b‖."""
    return F.sqrt(l2sq(a, b))


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity with a null (not error) result on zero vectors —
    ANSI-safe: the denominator is wrapped in nullif so div-by-zero yields NULL
    in Spark exactly as it does in DuckDB."""
    denom = F.nullif(norm(a) * norm(b), F.lit(0.0))
    return dot(a, b) / denom


def cosine_sim_hoisted(
    a: Column | str, b: Column | str, na: Column | str, nb: Column | str
) -> Column:
    """cosine_sim with the per-side norms precomputed BEFORE a pair join.

    Inline cosine_sim re-evaluates sqrt(dot(x,x)) per PAIR — two extra
    O(dim) HOF folds on every joined row for values that are per-vector
    constants (the knn_graph r3 A/B measured this as the dominant per-pair
    cost). Callers compute na = norm(a) / nb = norm(b) once per side row;
    the quotient here is arithmetically IDENTICAL to cosine_sim — the same
    sqrt(dot(x,x)) doubles are multiplied in the same order — so results
    are bit-equal and oracle hashes are unchanged.
    """
    na = F.col(na) if isinstance(na, str) else na
    nb = F.col(nb) if isinstance(nb, str) else nb
    return dot(a, b) / F.nullif(na * nb, F.lit(0.0))

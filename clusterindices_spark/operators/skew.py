"""Skew mitigation: salted joins (SURVEY.md §4.3 100 TB posture).

AQE's skew-join splitting handles most skew at runtime, but it only splits
the SHUFFLE side of a sort-merge join — a mid-size build side that is too
big to broadcast yet joins a pathologically hot key still stalls one task.
The classic fix: replicate the small side R times and scatter the big side's
hot rows across the R replicas with a deterministic salt, turning one
hot partition into R even ones.

Salt derivation is deterministic (xxhash64 of a row-unique column, mod R) —
no rand(): nondeterministic expressions break retry semantics (a re-run
task would re-salt differently) and spoil result reproducibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with ``n_salts``-way salting.

    ``salt_from``: a column of ``big`` that varies within a join key (any
    row-unique id) — hashed to spread a hot key's rows across replicas.
    The join output equals ``big.join(small, key, how)`` exactly
    (tests/test_skew.py asserts equality); only the partitioning changes:
    shuffle keys become (key, salt) with ≤ rows/n_salts per hot-key task.

    Cost: the small side is exploded n_salts× before its shuffle — pick
    n_salts ≈ (hot-key rows / target task rows), not larger.
    """
    if how != "inner":
        raise ValueError("salted_join supports inner joins (outer joins would "
                         "duplicate unmatched small-side rows per salt)")
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return (
        salted_big.join(salted_small, on=[key, "__salt"], how="inner")
        .drop("__salt")
    )

"""Text expression builders shared by dedup/text operators (SURVEY.md §2C).

All pure Catalyst expressions (split/filter/transform/aggregate HOFs) — the
tokenization path never leaves the JVM. SQL-string twins are provided for the
DuckDB oracles so both engines tokenize identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FNV_MOD = 1_000_000_007


def tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokens, empties dropped (regexp split so runs of
    whitespace behave identically in both engines)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def shingles3(toks: Column) -> Column:
    """Distinct word 3-gram shingles; empty array for docs under 3 tokens
    (guarded: Spark's sequence(0, negative) would count DOWN)."""
    return F.array_distinct(
        F.when(
            F.size(toks) >= 3,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                    F.element_at(toks, i + 3),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def rolling_fingerprint(col: Column | str) -> Column:
    """Polynomial rolling hash over codepoints: h = (h*31 + code) mod 1e9+7.
    Sequential fold — deterministic, and f(0, c) = c makes it equal to
    DuckDB's init-less list_reduce over the same codepoints."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.filter(F.split(c, ""), lambda ch: ch != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % FNV_MOD,
    )


# --- DuckDB twins ---------------------------------------------------------

SQL_TOKENS = "list_filter(regexp_split_to_array(lower({col}), '\\s+'), t -> t <> '')"

SQL_SHINGLES3 = (
    "list_distinct(list_transform(range(greatest(len({toks}) - 2, 0)), "
    "i -> {toks}[i+1] || ' ' || {toks}[i+2] || ' ' || {toks}[i+3]))"
)

SQL_FINGERPRINT = (
    "list_reduce(list_transform(list_filter(string_split({col}, ''), ch -> ch <> ''), "
    f"ch -> CAST(unicode(ch) AS BIGINT)), (a, b) -> (a * 31 + b) % {FNV_MOD})"
)

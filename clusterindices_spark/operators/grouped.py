"""Grouped-map UDF surface (SURVEY.md §2B "UDF surface" row).

Engine policy: core operators avoid Python UDFs (codegen + oracle
expressibility — §4.2). This module is the sanctioned escape hatch pattern
for per-group logic that SQL genuinely can't express (model scoring,
scipy-style stats, custom normalization): ``applyInPandas`` — one Arrow
batch per group, vectorized pandas/numpy inside, never row-at-a-time.

The demo operator (per-group z-score) IS SQL-expressible on purpose: the
test proves the Arrow path agrees with the window-function formulation to
1e-9, which validates the plumbing (schema, grouping, batch shape) for the
cases that aren't.

Scale: applyInPandas shuffles by the group key; a group must fit one
executor's memory as a pandas frame — use it for many-small-groups shapes
(per-user, per-label), never per-global. Skewed hot groups: pre-split with
a salt column in the key when a group can exceed task memory.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def zscore_per_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group z-score of ``value_col`` via grouped-map pandas UDF:
    (group_col, row id columns..., z DOUBLE)."""
    out_schema = f"{', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields)}, z double"

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        sd = v.std(ddof=1)
        pdf = pdf.copy()
        pdf["z"] = (v - v.mean()) / sd if sd and sd > 0 else 0.0
        return pdf

    return df.groupBy(group_col).applyInPandas(_z, schema=out_schema)

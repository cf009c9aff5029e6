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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def zscore_per_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group z-score of ``value_col`` via grouped-map pandas UDF:
    (group_col, row id columns..., z DOUBLE).

    NULL semantics match the window formulation
    ``(value - avg) / stddev_samp`` exactly: a NULL input value → NULL z
    (not NaN), and a singleton or zero-variance group → NULL z (stddev_samp
    of one row is NULL; /0 is NULL) — not 0.0. Arrow maps NaN to NaN, not
    to NULL, so the NaN→None conversion below is load-bearing."""
    if "z" in df.columns:
        raise ValueError("input already has a 'z' column")
    # fresh StructType — StructType.add MUTATES the receiver, and df.schema
    # returns the live cached object; structured types also survive where
    # string-concatenated DDL breaks (pre-existing names needing backticks)
    out_schema = StructType(
        list(df.schema.fields) + [StructField("z", DoubleType())]
    )

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        sd = v.std(ddof=1)
        pdf = pdf.copy()
        z = (v - v.mean()) / sd if pd.notna(sd) and sd > 0 else np.nan
        # nullable Float64: NaN -> <NA> -> Arrow NULL (a plain float64
        # Series would ship NaN as NaN, not NULL)
        pdf["z"] = pd.Series(z, index=pdf.index, dtype="float64").astype(
            "Float64"
        )
        return pdf

    return df.groupBy(group_col).applyInPandas(_z, schema=out_schema)

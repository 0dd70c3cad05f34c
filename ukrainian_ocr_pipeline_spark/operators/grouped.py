"""Grouped-map (applyInPandas) operators.

The reference's only grouped-custom computation is per-page DBSCAN
clustering (core/enhancement.py:271-296), which in our row-per-page
model runs inside the row UDF (spec.regions).  This module carries the
applyInPandas pattern itself — per-GROUP pandas with cross-row state —
for the operations a training-data pipeline actually groups on:
per-source feature normalization.

Scale note: applyInPandas shuffles on the group key.  Keys here are
low-cardinality (lang/source), so AQE coalescing keeps task counts sane;
for high-cardinality grouping (per-host at web scale) the same function
works unchanged because the shuffle is the point — co-locating a host's
pages is what enables cross-page logic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

def zscore_by_group(docs: DataFrame, group_col: str = "lang",
                    value_col: str = "n_chars",
                    id_col: str = "doc_id",
                    z_col: str | None = None) -> DataFrame:
    """Per-group z-score normalization via grouped-map pandas.

    z = (x - mean) / stddev_samp within the group (ddof=1, matching SQL
    STDDEV_SAMP); rounded to 6dp for cross-engine comparison. Groups of
    size 1 or zero variance yield z = 0.0 (defined, not NaN).

    The output schema is derived from the INPUT column types (not
    hardcoded), so non-default group/value columns keep their names and
    types instead of being silently relabeled or integer-truncated.
    """
    z_name = z_col or f"z_{value_col}"
    dtypes = dict(docs.select(id_col, group_col, value_col).dtypes)
    schema = (f"{id_col} {dtypes[id_col]}, {group_col} {dtypes[group_col]}, "
              f"{value_col} {dtypes[value_col]}, {z_name} double")

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col].astype("float64")
        sd = x.std(ddof=1)
        if pd.isna(sd) or sd == 0.0:
            z = pd.Series(0.0, index=pdf.index)
        else:
            z = (x - x.mean()) / sd
        return pd.DataFrame({
            id_col: pdf[id_col],
            group_col: pdf[group_col],
            value_col: pdf[value_col],
            z_name: z.round(6),
        })

    return (docs.select(id_col, group_col, value_col)
            .groupBy(group_col)
            .applyInPandas(norm, schema))

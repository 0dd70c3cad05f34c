"""THE shared Spark-vs-DuckDB comparison machinery.

One definition of (a) the testdata table set, (b) result-frame
normalization, and (c) the value comparison — imported by the pytest
oracle mirror (tests/test_queries_oracle.py), the standalone sweep CLI
(jobs/oracle_sweep.py), and the scale-up generator
(jobs/make_scale_dir.py).  Before this module each caller re-spelled
the normalization; a drift between them would have made cross-scale
sweep artifacts incomparable with the gate they extend (review
finding)."""

from __future__ import annotations

TESTDATA_TABLES = ["region", "nation", "customer", "supplier", "part",
                   "orders", "lineitem", "events", "documents",
                   "embeddings"]


def register_views(con, sf_dir: str) -> None:
    """CREATE VIEW per testdata table over the dir's parquet files —
    the same registration the driver's correctness gate performs."""
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")


def normalize_frame(df):
    """Sort columns by name, coerce object columns to numeric when
    possible (else str), round floats to 9 places, widen ints to int64,
    and sort rows by all columns — the driver-gate-compatible canonical
    form for order-insensitive value comparison."""
    import pandas as pd
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def first_mismatch(got, want):
    """Name of the first column whose values differ between two
    normalized frames (None if all equal) — THE one comparison
    convention (floats through fillna(-1)); exposed by name so the
    pytest mirror can keep per-column assert messages."""
    import pandas as pd
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]):
            if not (got[c].fillna(-1) == want[c].fillna(-1)).all():
                return c
        else:
            if not (got[c].values == want[c].values).all():
                return c
    return None


def values_equal(got, want) -> bool:
    """Column-wise equality of two normalized frames with the shared
    NULL convention — first_mismatch() is None."""
    return first_mismatch(got, want) is None

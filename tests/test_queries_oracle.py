"""Local mirror of the driver's correctness gate: run every queries()
entry in Spark and its oracle_sql() twin in DuckDB on the same parquet,
compare row count, column names, and values (order-insensitive)."""

import math
import os

import duckdb
import pandas as pd
import pytest

# default sf0.001 for CI speed; set SPARK_GRAFT_ORACLE_SF_DIR to sweep
# the same all-query mirror at sf0.01 (the driver's gate scale) / sf0.1
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR",
                        "/root/testdata/sf0.001")

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


from ukrainian_ocr_pipeline_spark.oraclecompare import (  # noqa: E402
    first_mismatch,
    normalize_frame as _normalize,
    register_views,
)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    register_views(con, SF_DIR)
    return con


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, ddb, name):
    got = _normalize(QUERIES[name](spark, SF_DIR).toPandas())
    want = _normalize(ddb.execute(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}")
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    # the SHARED comparison convention (oraclecompare) — the sweep CLI
    # uses the same function, so the gate and the sweeps cannot drift
    bad = first_mismatch(got, want)
    assert bad is None, f"{name}.{bad}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    n = df.count()
    assert n >= 0
    df.limit(5).collect()  # schema materializes without error


def test_asof_tie_semantics(spark):
    """The driver corpus has no (user_id, ts) collisions at any scale
    factor, so the sf-table oracle can't exercise the as-of tie rule.
    Synthetic equal-timestamp rows pin it THREE ways: Spark window
    result == hand-derived expectation == the committed correlated-
    subquery SQL twin run by DuckDB on the same rows.

    Rule: a click qualifies for a purchase iff (c.ts, c.event_id) <
    (p.ts, p.event_id) lexicographically; latest qualifying click wins.
    """
    import datetime

    from ukrainian_ocr_pipeline_spark.plans.registry import (
        SQL_ASOF, asof_purchase_click)

    t = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 1: click(1)@t, purchase(2)@t, click(3)@t, purchase(4)@t
        (1, t, 1, "click", 0.0, ""),
        (2, t, 1, "purchase", 0.0, ""),   # matches click 1 (3 > 2 excluded)
        (3, t, 1, "click", 0.0, ""),
        (4, t, 1, "purchase", 0.0, ""),   # matches click 3 (latest of 1,3)
        # user 2: only a same-ts click with HIGHER id -> no match
        (5, t, 2, "purchase", 0.0, ""),
        (6, t, 2, "click", 0.0, ""),
        # user 3: earlier click beats same-ts exclusion
        (7, t - datetime.timedelta(seconds=5), 3, "click", 0.0, ""),
        (8, t, 3, "click", 0.0, ""),      # id 8 < 9: qualifies, is latest
        (9, t, 3, "purchase", 0.0, ""),
    ]
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    expected = {2: 1, 4: 3, 5: None, 9: 8}

    got = {r["purchase_id"]: r["asof_click_id"]
           for r in asof_purchase_click(
               spark.createDataFrame(rows, schema)).collect()}
    assert got == expected

    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value", "props"])
    con.register("events", pdf)
    want = {int(r[0]): (None if pd.isna(r[2]) else int(r[2]))
            for r in con.execute(SQL_ASOF).fetchall()}
    assert want == expected


def test_props_json_bad_rows_semantics(spark):
    """No scale factor contains malformed props, so the n_bad_json
    branch is corpus-unreachable.  Synthetic rows pin it three ways:
    Spark from_json == hand-derived expectation == the committed
    json_valid-gated SQL twin in DuckDB (without the gate, DuckDB's ->>
    raises on malformed JSON instead of cross-checking)."""
    import datetime

    from ukrainian_ocr_pipeline_spark.plans.registry import (
        SQL_PROPS_JSON, q_event_props_json)

    t = datetime.datetime(2026, 1, 1)
    rows = [
        (1, t, 1, "click", 0.0, '{"k": 5}'),      # good
        (2, t, 1, "click", 0.0, "not json"),      # malformed -> bad
        (3, t, 1, "click", 0.0, "{}"),            # valid, k missing -> bad
        (4, t, 1, "click", 0.0, None),            # NULL props -> bad
        (5, t, 1, "view", 0.0, '{"k": 7}'),       # good
    ]
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df = spark.createDataFrame(rows, schema)
    df.createOrReplaceTempView("_props_rows")

    def frm(rs):
        return {r["event_type"]: (r["n_events"], r["sum_k"], r["max_k"],
                                  r["n_bad_json"]) for r in rs}

    expected = {"click": (4, 5, 5, 3), "view": (1, 7, 7, 0)}
    # run the registry transform against the synthetic rows by reusing
    # its body on a substituted table
    from pyspark.sql import functions as F
    parsed = df.withColumn("p", F.from_json("props", "k INT"))
    got = frm((parsed.groupBy("event_type")
               .agg(F.count("*").alias("n_events"),
                    F.sum(F.col("p.k").cast("long")).alias("sum_k"),
                    F.max("p.k").alias("max_k"),
                    F.count(F.when(F.col("p.k").isNull(), 1))
                    .alias("n_bad_json"))).collect())
    assert got == expected
    # NULL-props row: from_json(NULL) -> NULL struct, counted as bad
    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value", "props"])
    con.register("events", pdf)
    want = frm(r._asdict() if hasattr(r, "_asdict") else r
               for r in con.execute(SQL_PROPS_JSON).df().to_dict("records"))
    want = {k: tuple(int(x) for x in v) for k, v in want.items()}
    assert want == expected

"""Query registry: every operator from SURVEY.md §2 (plus the
training-data-pipeline operators) as a (spark_fn, oracle_sql) pair.

Conventions that keep the driver's order-insensitive value-hash stable
across Spark and DuckDB:
  * integer results wherever possible; money as floor(x*100+0.5) cents
  * doubles only when derived from identical exact integers, or rounded
    to 6 dp with error margins orders of magnitude below the grain
  * DuckDB aggregate outputs CAST to BIGINT (its sum() widens to HUGEINT,
    which pandas would otherwise render as float)
  * timestamps serialized via date_format/strftime to a common string
  * every computed column aliased identically on both sides
  * no engine-native hash() — md5-derived 32-bit hashes shared by both
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources import warc as warcmod
from ..operators import (crawl, dedup, graphrank, multimodal, packing,
                         robots, similarity, sketches, textindex, textstats,
                         webnorm)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col):
    return F.floor(col * 100 + 0.5).cast("bigint")


# --------------------------------------------------------------------------
# §2.4 aggregations / §2.2 filters

def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 flavour: grouped partial-agg pricing summary (A1/A2)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.where(F.col("l_shipdate") < "1998-09-03")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.floor("l_quantity").cast("bigint")).alias("sum_qty"),
                 F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
                 F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_cents"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count("*").alias("count_order")))


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-03'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_by_nation(spark, sf_dir):
    """Equi-join chain with a broadcast dimension (J1): customer x orders
    x nation -> revenue per nation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (o.join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.sum(_cents(F.col("o_totalprice"))).alias("revenue_cents"),
                 F.count("*").alias("n_orders"),
                 F.countDistinct("c_custkey").alias("n_customers")))


SQL_REVENUE_NATION = """
SELECT n_name,
       CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_orders,
       CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_top_parts(spark, sf_dir):
    """Top-k with deterministic tie-break (A5/O3)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_partkey")
            .agg(F.count("*").alias("n_lines"),
                 F.sum(F.floor("l_quantity").cast("bigint")).alias("total_qty"))
            .orderBy(F.desc("n_lines"), F.desc("total_qty"), F.asc("l_partkey"))
            .limit(10))


SQL_TOP_PARTS = """
SELECT l_partkey, COUNT(*) AS n_lines,
       CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem GROUP BY l_partkey
ORDER BY n_lines DESC, total_qty DESC, l_partkey ASC LIMIT 10
"""


def q_orders_price_histogram(spark, sf_dir):
    """Stats + bucketed histogram (A4, surname_matcher.py:356-392 analog)."""
    o = _t(spark, sf_dir, "orders")
    c = _cents(F.col("o_totalprice"))
    return o.agg(
        F.count("*").alias("n"),
        F.min(c).alias("min_cents"),
        F.max(c).alias("max_cents"),
        F.sum(F.when(c < 10000000, 1).otherwise(0)).alias("b0"),
        F.sum(F.when((c >= 10000000) & (c < 20000000), 1).otherwise(0)).alias("b1"),
        F.sum(F.when((c >= 20000000) & (c < 30000000), 1).otherwise(0)).alias("b2"),
        F.sum(F.when((c >= 30000000) & (c < 40000000), 1).otherwise(0)).alias("b3"),
        F.sum(F.when(c >= 40000000, 1).otherwise(0)).alias("b4"),
    )


SQL_HISTOGRAM = """
WITH c AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents FROM orders)
SELECT COUNT(*) AS n, MIN(cents) AS min_cents, MAX(cents) AS max_cents,
       CAST(SUM(CASE WHEN cents < 10000000 THEN 1 ELSE 0 END) AS BIGINT) AS b0,
       CAST(SUM(CASE WHEN cents >= 10000000 AND cents < 20000000 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
       CAST(SUM(CASE WHEN cents >= 20000000 AND cents < 30000000 THEN 1 ELSE 0 END) AS BIGINT) AS b2,
       CAST(SUM(CASE WHEN cents >= 30000000 AND cents < 40000000 THEN 1 ELSE 0 END) AS BIGINT) AS b3,
       CAST(SUM(CASE WHEN cents >= 40000000 THEN 1 ELSE 0 END) AS BIGINT) AS b4
FROM c
"""


def q_orders_price_percentiles(spark, sf_dir):
    """Exact percentiles (A4 companion): p50/p90/p99 of order value in
    cents per order priority.  Uses EXACT percentile (not the t-digest
    approximation) so the DuckDB quantile_cont twin matches cell-exact —
    both engines use the same linear-interpolation definition.  At
    100 TB the approx variant (percentile_approx) is the scale path;
    the exact form is the correctness anchor."""
    o = _t(spark, sf_dir, "orders")
    cents = _cents(F.col("o_totalprice"))
    return (o.select("o_orderpriority", cents.alias("cents"))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"),
                 F.round(F.expr("percentile(cents, 0.5)"), 4).alias("p50_r"),
                 F.round(F.expr("percentile(cents, 0.9)"), 4).alias("p90_r"),
                 F.round(F.expr("percentile(cents, 0.99)"), 4).alias("p99_r")))


SQL_PERCENTILES = """
WITH c AS (SELECT o_orderpriority, CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
           FROM orders)
SELECT o_orderpriority, COUNT(*) AS n,
       ROUND(quantile_cont(cents, 0.5), 4) AS p50_r,
       ROUND(quantile_cont(cents, 0.9), 4) AS p90_r,
       ROUND(quantile_cont(cents, 0.99), 4) AS p99_r
FROM c GROUP BY o_orderpriority
"""


def q_docs_per_lang_concat(spark, sf_dir):
    """Deterministic ordered string concatenation agg (A10): the
    collect_list-order trap, pinned with sort_array on both sides."""
    d = _t(spark, sf_dir, "documents")
    return (d.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.concat_ws(",", F.transform(F.sort_array(F.collect_list(F.col("doc_id"))),
                                              lambda x: x.cast("string"))).alias("doc_ids")))


SQL_LANG_CONCAT = """
SELECT lang, COUNT(*) AS n_docs,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
FROM documents GROUP BY lang
"""


# --------------------------------------------------------------------------
# §2.3 joins

def q_lineitem_rollup(spark, sf_dir):
    """Multi-level aggregation via ROLLUP (grouping sets): per
    (returnflag, linestatus), per returnflag subtotal, and grand total
    in ONE pass — Catalyst expands to a single shuffle with an Expand
    node, not three scans.  grouping_id disambiguates subtotal rows
    from real NULL keys."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.sum(F.floor("l_quantity").cast("bigint")).alias("sum_qty"),
                 F.count("*").alias("n_rows"),
                 F.grouping_id().alias("gid"))
            .select(F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
                    F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
                    "sum_qty", "n_rows", "gid"))


SQL_ROLLUP = """
SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
       COALESCE(l_linestatus, '(all)') AS linestatus,
       CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       COUNT(*) AS n_rows,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


#: the documents table's pinned source vocabulary (matches the DuckDB
#: twin's hardcoded columns; the testdata generator emits exactly these)
_PIVOT_SOURCES = [f"src{i}" for i in range(20)]


def q_docs_lang_by_source_pivot(spark, sf_dir):
    """Pivot (long -> wide): document counts per lang pivoted across
    sources.  The pivot value list is PINNED (not discovered with a
    distinct-values job): output schema stays data-independent and the
    pivot is one pass — the production pattern for known vocabularies."""
    d = _t(spark, sf_dir, "documents")
    return (d.groupBy("lang").pivot("source", _PIVOT_SOURCES).count()
            .na.fill(0, _PIVOT_SOURCES))


SQL_PIVOT = """
SELECT lang,
       CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS src0,
       CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS src1,
       CAST(SUM(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS BIGINT) AS src2,
       CAST(SUM(CASE WHEN source = 'src3' THEN 1 ELSE 0 END) AS BIGINT) AS src3,
       CAST(SUM(CASE WHEN source = 'src4' THEN 1 ELSE 0 END) AS BIGINT) AS src4,
       CAST(SUM(CASE WHEN source = 'src5' THEN 1 ELSE 0 END) AS BIGINT) AS src5,
       CAST(SUM(CASE WHEN source = 'src6' THEN 1 ELSE 0 END) AS BIGINT) AS src6,
       CAST(SUM(CASE WHEN source = 'src7' THEN 1 ELSE 0 END) AS BIGINT) AS src7,
       CAST(SUM(CASE WHEN source = 'src8' THEN 1 ELSE 0 END) AS BIGINT) AS src8,
       CAST(SUM(CASE WHEN source = 'src9' THEN 1 ELSE 0 END) AS BIGINT) AS src9,
       CAST(SUM(CASE WHEN source = 'src10' THEN 1 ELSE 0 END) AS BIGINT) AS src10,
       CAST(SUM(CASE WHEN source = 'src11' THEN 1 ELSE 0 END) AS BIGINT) AS src11,
       CAST(SUM(CASE WHEN source = 'src12' THEN 1 ELSE 0 END) AS BIGINT) AS src12,
       CAST(SUM(CASE WHEN source = 'src13' THEN 1 ELSE 0 END) AS BIGINT) AS src13,
       CAST(SUM(CASE WHEN source = 'src14' THEN 1 ELSE 0 END) AS BIGINT) AS src14,
       CAST(SUM(CASE WHEN source = 'src15' THEN 1 ELSE 0 END) AS BIGINT) AS src15,
       CAST(SUM(CASE WHEN source = 'src16' THEN 1 ELSE 0 END) AS BIGINT) AS src16,
       CAST(SUM(CASE WHEN source = 'src17' THEN 1 ELSE 0 END) AS BIGINT) AS src17,
       CAST(SUM(CASE WHEN source = 'src18' THEN 1 ELSE 0 END) AS BIGINT) AS src18,
       CAST(SUM(CASE WHEN source = 'src19' THEN 1 ELSE 0 END) AS BIGINT) AS src19
FROM documents GROUP BY lang
"""


def q_high_volume_customers(spark, sf_dir):
    """Q18 flavour: aggregate-then-HAVING-then-join — customers whose
    total order volume crosses a threshold, with their segment.  The
    HAVING filter runs on the aggregated (small) side BEFORE the join,
    so the join input is already reduced."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (o.groupBy("o_custkey")
           .agg(F.count("*").alias("n_orders"),
                F.sum(_cents(F.col("o_totalprice"))).alias("total_cents"))
           .where((F.col("n_orders") >= 8)
                  & (F.col("total_cents") > 150000000)))
    return (big.join(c, big.o_custkey == c.c_custkey)
            .select(F.col("o_custkey").alias("custkey"), "c_mktsegment",
                    "n_orders", "total_cents"))


SQL_HIGH_VOLUME = """
WITH big AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
  FROM orders GROUP BY o_custkey
  HAVING COUNT(*) >= 8 AND SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) > 150000000)
SELECT o_custkey AS custkey, c_mktsegment, n_orders, total_cents
FROM big JOIN customer ON o_custkey = c_custkey
"""


def q_customers_without_orders(spark, sf_dir):
    """Left-anti join (J7)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_nationkey", "c_mktsegment"))


SQL_NO_ORDERS = """
SELECT c_custkey, c_nationkey, c_mktsegment FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


def q_big_spender_customers(spark, sf_dir):
    """Left-semi existence gate (F8)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .select("c_custkey", "c_mktsegment"))


SQL_BIG_SPENDERS = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


def q_doc_containment_join(spark, sf_dir):
    """Substring-containment theta join (J2: instr(lower(hay),
    lower(needle)) > 0 — BroadcastNestedLoopJoin)."""
    d = _t(spark, sf_dir, "documents")
    a = d.select(F.col("doc_id").alias("probe_id"),
                 F.lower(F.substring("text", 1, 20)).alias("needle"))
    b = d.select(F.col("doc_id").alias("hay_id"), F.lower(F.col("text")).alias("hay"))
    return (a.join(b, F.expr("instr(hay, needle) > 0"))
            .groupBy("probe_id")
            .agg(F.count("*").alias("n_hits"), F.min("hay_id").alias("first_hay_id")))


SQL_CONTAINMENT = """
SELECT a.doc_id AS probe_id, COUNT(*) AS n_hits, MIN(b.doc_id) AS first_hay_id
FROM documents a JOIN documents b
  ON instr(lower(b.text), lower(substr(a.text, 1, 20))) > 0
GROUP BY a.doc_id
"""


def q_event_pairs_60s(spark, sf_dir):
    """Range (interval) join (J6): same-user event pairs within 60s."""
    e = _t(spark, sf_dir, "events")
    a = e.select(F.col("user_id").alias("u"), F.col("event_id").alias("eid_a"),
                 F.col("ts").alias("ts_a"))
    b = e.select(F.col("user_id").alias("u"), F.col("event_id").alias("eid_b"),
                 F.col("ts").alias("ts_b"))
    return (a.join(b, ["u"])
            .where((F.col("eid_a") < F.col("eid_b"))
                   & (F.col("ts_b") >= F.col("ts_a"))
                   & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 60 SECONDS")))
            .groupBy(F.col("u").alias("user_id"))
            .agg(F.count("*").alias("n_pairs")))


SQL_EVENT_PAIRS = """
SELECT a.user_id AS user_id, COUNT(*) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 60 SECOND
GROUP BY a.user_id
"""


def q_event_pairs_60s_bucketed(spark, sf_dir):
    """The SCALE form of the J6 interval join: candidates via an
    equi-join on (user, 60s time bucket) instead of a per-user
    cross-filter.  ts_b in [ts_a, ts_a+60] implies bucket_b is
    bucket_a or bucket_a+1, so the left side probes exactly those two
    buckets (one explode, delta in {0,1}) and every qualifying pair
    matches on exactly ONE delta — no dedup pass needed.  A hot key
    (celebrity user) stays bounded: candidate fan-out per event is its
    two buckets' populations, not the whole user group.  Results are
    identical to q_event_pairs_60s (same oracle SQL verifies both)."""
    e = _t(spark, sf_dir, "events")
    bucket = F.floor(F.unix_timestamp("ts") / 60)
    a = (e.select(F.col("user_id").alias("u"),
                  F.col("event_id").alias("eid_a"),
                  F.col("ts").alias("ts_a"),
                  bucket.alias("bkt_a"),
                  F.explode(F.array(F.lit(0), F.lit(1))).alias("delta"))
         .select("u", "eid_a", "ts_a",
                 (F.col("bkt_a") + F.col("delta")).alias("bkt")))
    b = e.select(F.col("user_id").alias("u"),
                 F.col("event_id").alias("eid_b"),
                 F.col("ts").alias("ts_b"),
                 bucket.alias("bkt"))
    return (a.join(b, ["u", "bkt"])
            .where((F.col("eid_a") < F.col("eid_b"))
                   & (F.col("ts_b") >= F.col("ts_a"))
                   & (F.col("ts_b") <= F.col("ts_a")
                      + F.expr("INTERVAL 60 SECONDS")))
            .groupBy(F.col("u").alias("user_id"))
            .agg(F.count("*").alias("n_pairs")))


def q_event_category_rollup(spark, sf_dir):
    """Small lookup-map join as CASE expression (J5)."""
    e = _t(spark, sf_dir, "events")
    cat = (F.when(F.col("event_type").isin("click", "view"), "engagement")
           .when(F.col("event_type").isin("purchase", "signup"), "conversion")
           .otherwise("ops"))
    return (e.groupBy(cat.alias("category"))
            .agg(F.count("*").alias("n_events"),
                 F.sum(_cents(F.col("value"))).alias("sum_value_cents")))


SQL_CATEGORY = """
SELECT CASE WHEN event_type IN ('click','view') THEN 'engagement'
            WHEN event_type IN ('purchase','signup') THEN 'conversion'
            ELSE 'ops' END AS category,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1
"""


def q_nation_name_similarity(spark, sf_dir):
    """Edit-distance scalar (C4 relational cousin): each nation's
    closest OTHER nation by levenshtein distance — tiny 25x25 cross
    join, argmin via window with name tiebreak.  The JVM-side twin of
    the spec's Python difflib scoring."""
    n = _t(spark, sf_dir, "nation").select("n_name")
    a = n.select(F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_name").alias("name_b"))
    pairs = (a.crossJoin(b).where(F.col("name_a") != F.col("name_b"))
             .withColumn("dist", F.levenshtein("name_a", "name_b")))
    w = Window.partitionBy("name_a").orderBy(F.asc("dist"), F.asc("name_b"))
    return (pairs.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("name_a", F.col("name_b").alias("closest"),
                    F.col("dist").cast("int").alias("dist")))


SQL_NATION_SIMILARITY = """
WITH pairs AS (
  SELECT a.n_name AS name_a, b.n_name AS name_b,
         levenshtein(a.n_name, b.n_name) AS dist
  FROM nation a, nation b WHERE a.n_name <> b.n_name),
r AS (
  SELECT name_a, name_b, dist,
         ROW_NUMBER() OVER (PARTITION BY name_a
                            ORDER BY dist ASC, name_b ASC) AS rn
  FROM pairs)
SELECT name_a, name_b AS closest, CAST(dist AS INTEGER) AS dist
FROM r WHERE rn = 1
"""


def q_events_by_weekday(spark, sf_dir):
    """Date-part extraction breadth (C8): event counts per ISO weekday
    and per week-truncated date.  Spark's dayofweek is 1=Sunday; the
    query uses weekday()+1 (0=Monday -> 1..7 ISO) so the DuckDB twin
    (isodow) matches without engine-specific offsets."""
    e = _t(spark, sf_dir, "events")
    return (e.select((F.weekday("ts") + 1).alias("iso_dow"),
                     F.date_format(F.date_trunc("week", F.col("ts")),
                                   "yyyy-MM-dd").alias("week_start"))
            .groupBy("week_start", "iso_dow")
            .agg(F.count("*").alias("n_events")))


SQL_EVENTS_WEEKDAY = """
SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
       CAST(isodow(ts) AS INTEGER) AS iso_dow,
       COUNT(*) AS n_events
FROM events GROUP BY 1, 2
"""


def q_trading_nations_union(spark, sf_dir):
    """Union + distinct set op (U1)."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select("n_name")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("n_name")
    return cn.union(sn).distinct()


SQL_NATIONS_UNION = """
SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
UNION
SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
"""


# --------------------------------------------------------------------------
# §2.5 windows

def _pin_utc(spark):
    # timestamp rendering must match the (naive) DuckDB oracle even if the
    # caller's session timezone isn't UTC
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def q_nation_set_ops(spark, sf_dir):
    """INTERSECT / EXCEPT (U1 companions — union is covered by
    trading_nations_union): nations with both suppliers and customers,
    and nations with suppliers but no customers, tagged in one result."""
    su = _t(spark, sf_dir, "supplier").select("s_nationkey")
    cu = _t(spark, sf_dir, "customer").select("c_nationkey")
    both = (su.intersect(cu.withColumnRenamed("c_nationkey", "s_nationkey"))
            .select(F.lit("both").alias("op"),
                    F.col("s_nationkey").alias("nationkey")))
    # subtract() = EXCEPT (distinct): a nation with ANY customer must
    # not appear — exceptAll+distinct would leak nations whose supplier
    # multiplicity merely exceeds their customer multiplicity
    only = (su.subtract(cu.withColumnRenamed("c_nationkey", "s_nationkey"))
            .select(F.lit("supplier_only").alias("op"),
                    F.col("s_nationkey").alias("nationkey")))
    return both.unionByName(only)


SQL_SET_OPS = """
SELECT 'both' AS op, nationkey FROM (
  SELECT s_nationkey AS nationkey FROM supplier
  INTERSECT
  SELECT c_nationkey FROM customer)
UNION ALL
SELECT 'supplier_only' AS op, nationkey FROM (
  SELECT s_nationkey AS nationkey FROM supplier
  EXCEPT
  SELECT c_nationkey FROM customer)
"""


def q_latest_order_per_customer(spark, sf_dir):
    """Per-group argmax via rank window (W4)."""
    _pin_utc(spark)
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (o.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("o_custkey").alias("custkey"),
                    F.col("o_orderkey").alias("latest_orderkey"),
                    F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("latest_date"),
                    _cents(F.col("o_totalprice")).alias("latest_cents")))


SQL_LATEST_ORDER = """
SELECT o_custkey AS custkey, o_orderkey AS latest_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS latest_date,
       CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS latest_cents
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
WHERE rn = 1
"""


def q_order_value_ranks(spark, sf_dir):
    """Window-function breadth beyond row_number (W-family): dense_rank
    over a TIE-HEAVY key (integer quantity — many rows share each rank,
    so dense semantics are genuinely exercised, not row_number in
    disguise) and ntile quartiles over a total order, top-2 dense ranks
    per return flag."""
    li = _t(spark, sf_dir, "lineitem")
    qty = F.floor("l_quantity").cast("bigint")
    w_dense = Window.partitionBy("l_returnflag").orderBy(F.desc("qty"))
    w_total = Window.partitionBy("l_returnflag").orderBy(
        F.desc("qty"), F.asc("l_orderkey"), F.asc("l_partkey"))
    return (li.select("l_orderkey", "l_partkey", "l_returnflag",
                      qty.alias("qty"))
            .withColumn("dr", F.dense_rank().over(w_dense))
            .withColumn("quartile", F.ntile(4).over(w_total))
            .where(F.col("dr") <= 2)
            .select("l_returnflag", "dr", "l_orderkey", "l_partkey",
                    "qty", "quartile"))


SQL_ORDER_RANKS = """
WITH c AS (
  SELECT l_orderkey, l_partkey, l_returnflag,
         CAST(FLOOR(l_quantity) AS BIGINT) AS qty
  FROM lineitem),
r AS (
  SELECT l_returnflag, l_orderkey, l_partkey, qty,
         DENSE_RANK() OVER (PARTITION BY l_returnflag
                            ORDER BY qty DESC) AS dr,
         CAST(NTILE(4) OVER (PARTITION BY l_returnflag
                             ORDER BY qty DESC, l_orderkey ASC, l_partkey ASC)
              AS INTEGER) AS quartile
  FROM c)
SELECT l_returnflag, CAST(dr AS INTEGER) AS dr, l_orderkey, l_partkey, qty, quartile
FROM r WHERE dr <= 2
"""


def q_event_context_window(spark, sf_dir):
    """rowsBetween(-2, 2) neighborhood concatenation (W2/J3 — the ±2-line
    context window of core/ner.py:505-513)."""
    e = _t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-2, 2))
    return (e.select("event_id", "user_id",
                     F.concat_ws(" ", F.collect_list("event_type").over(w)).alias("context")))


SQL_CONTEXT_WINDOW = """
SELECT event_id, user_id,
       string_agg(event_type, ' ') OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS context
FROM events
"""


def asof_purchase_click(e: DataFrame) -> DataFrame:
    """As-of join, the union-tag + carry-forward window shape: each
    purchase gets the user's most recent STRICTLY PRIOR click (by
    (ts, event_id) order).  This is THE scalable as-of form in Spark —
    one shuffle on user_id, one sorted window pass, never a theta join:
    a range-predicate join here would be O(clicks x purchases) per user,
    and Spark has no native ASOF operator.  Nullable asof columns:
    purchases with no prior click keep NULLs (left-as-of semantics).
    Tie semantics ((ts, event_id) lexicographic) are pinned by
    tests/test_queries_oracle.py::test_asof_tie_semantics on synthetic
    equal-timestamp rows — the driver corpus has no (user_id, ts)
    collisions, so the sf-table oracle alone cannot exercise ties."""
    tagged = (e.where(F.col("event_type").isin("click", "purchase"))
              .withColumn("click_ev",
                          F.when(F.col("event_type") == "click",
                                 F.struct("event_id", "ts"))))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    return (tagged
            .withColumn("asof", F.last("click_ev", ignorenulls=True).over(w))
            .where(F.col("event_type") == "purchase")
            .select(F.col("event_id").alias("purchase_id"), "user_id",
                    F.col("asof.event_id").alias("asof_click_id"),
                    (F.unix_micros(F.col("ts").cast("timestamp"))
                     - F.unix_micros(F.col("asof.ts").cast("timestamp"))
                     ).alias("gap_us")))


def q_event_asof_join(spark, sf_dir):
    """See asof_purchase_click.  The DuckDB twin is an independent
    formulation (correlated subqueries with nested-loop semantics), so
    the oracle genuinely cross-checks the window trick."""
    return asof_purchase_click(_t(spark, sf_dir, "events"))


SQL_ASOF = """
SELECT p.event_id AS purchase_id, p.user_id,
       (SELECT c.event_id FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
        ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS asof_click_id,
       (SELECT CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
        ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS gap_us
FROM events p WHERE p.event_type = 'purchase'
"""


def q_corpus_split_assign(spark, sf_dir):
    """Deterministic train/val/test split (8/1/1) by md5(doc_id) bucket
    — the training-data-pipeline staple: membership is a pure function
    of the key, so the split is stable across runs, engines, and
    re-partitionings (no sample(), no RNG state to ship).  Pure codegen
    scan + one tiny partial-agg shuffle; at 100 TB the assignment adds
    zero shuffles to whatever pipeline consumes it."""
    d = _t(spark, sf_dir, "documents")
    # the ONE split definition (shared with jobs/curate.py)
    return (d.withColumn("split", dedup.train_val_test_split(F.col("doc_id")))
            .groupBy("split", "lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars")))


SQL_SPLIT = """
WITH assigned AS (
  SELECT lang, n_chars,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 10 AS bucket
  FROM documents)
SELECT CASE WHEN bucket <= 7 THEN 'train'
            WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
       lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM assigned GROUP BY 1, 2
"""


def q_event_props_json(spark, sf_dir):
    """Data-plane JSON decode (C15 twin, utils/io.py:109-157 /
    core/ner.py:274 json.loads of structured payloads): schema-checked
    from_json over the events.props column, aggregated per event_type.
    from_json with an explicit schema stays in codegen and column-prunes
    the parsed struct — the right shape for sparse JSON at scan scale
    (vs get_json_object re-parsing per extraction)."""
    e = _t(spark, sf_dir, "events")
    parsed = e.withColumn("p", F.from_json("props", "k INT"))
    return (parsed.groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.col("p.k").cast("long")).alias("sum_k"),
                 F.max("p.k").alias("max_k"),
                 F.count(F.when(F.col("p.k").isNull(), 1)).alias("n_bad_json")))


# json_valid gate: DuckDB's ->> RAISES on malformed JSON while Spark's
# from_json yields NULL — without the gate the twin crashes instead of
# cross-checking the bad-JSON path (pinned on synthetic rows by
# tests/test_queries_oracle.py::test_props_json_bad_rows_semantics)
SQL_PROPS_JSON = """
WITH parsed AS (
  SELECT event_type,
         CASE WHEN json_valid(props)
              THEN CAST(props ->> '$.k' AS INTEGER) END AS k
  FROM events)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MAX(k) AS INTEGER) AS max_k,
       CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_json
FROM parsed GROUP BY event_type
"""


def q_doc_line_dedup(spark, sf_dir):
    """C4-style cross-document line dedup (dedup.line_dedup): lines
    occurring in >=3 distinct documents are boilerplate and get stripped
    from every document, the cleaned text reassembled in order.  The
    synthetic corpus is single-line, so crawl furniture is injected
    deterministically from doc_id arithmetic (same convention as the
    PII / dirty-URL queries): two high-frequency banners (newsletter,
    cookie), a 2-variant footer, and a 40-variant 'related' line whose
    per-variant document count straddles the >=3 threshold — so the
    query exercises both sides of the cutoff at every sf.  The operator
    under test is the census + removal + reassembly."""
    d = F.col("doc_id")
    b1 = F.when(d % 3 == 0,
                F.lit("Subscribe to our newsletter today\n")) \
         .otherwise(F.lit(""))
    b2 = F.when(d % 4 == 0,
                F.lit("This site uses cookies to improve your experience\n")) \
         .otherwise(F.lit(""))
    t1 = F.when(d % 5 == 0,
                F.concat(F.lit("\nAll rights reserved "),
                         (d % 2).cast("string"))).otherwise(F.lit(""))
    t2 = F.when(d % 7 == 0,
                F.concat(F.lit("\nRelated: story "),
                         (d % 40).cast("string"))).otherwise(F.lit(""))
    docs = (_t(spark, sf_dir, "documents")
            .select("doc_id",
                    F.concat(b1, b2, F.col("text"), t1, t2).alias("text")))
    return dedup.line_dedup(docs)


SQL_LINE_DEDUP = """
WITH inj AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN 'Subscribe to our newsletter today' || chr(10) ELSE '' END
         || CASE WHEN doc_id % 4 = 0
              THEN 'This site uses cookies to improve your experience' || chr(10)
              ELSE '' END
         || text
         || CASE WHEN doc_id % 5 = 0
              THEN chr(10) || 'All rights reserved ' || CAST(doc_id % 2 AS VARCHAR)
              ELSE '' END
         || CASE WHEN doc_id % 7 = 0
              THEN chr(10) || 'Related: story ' || CAST(doc_id % 40 AS VARCHAR)
              ELSE '' END AS text
  FROM documents),
lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM inj),
keyed AS (
  SELECT doc_id, pos, line, md5(trim(line)) AS k, trim(line) = '' AS is_blank
  FROM lines),
boiler AS (
  SELECT k FROM (
    SELECT k, COUNT(*) AS nd
    FROM (SELECT DISTINCT k, doc_id FROM keyed WHERE NOT is_blank)
    GROUP BY k) WHERE nd >= 3),
flagged AS (
  SELECT kd.doc_id, kd.pos, kd.line, b.k IS NOT NULL AS is_dup
  FROM keyed kd LEFT JOIN boiler b ON kd.k = b.k)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       COALESCE(string_agg(CASE WHEN NOT is_dup THEN line END,
                           chr(10) ORDER BY pos), '') AS clean_text
FROM flagged GROUP BY doc_id
"""


def q_doc_bigram_counts(spark, sf_dir):
    """Corpus bigram statistics (n-gram LM counts, the training-data
    analytics staple): lowercase word bigrams per lang, top 5 per lang
    by (count desc, bigram asc).  Explode + partial-agg + window top-k —
    the count table shuffles once on (lang, bigram) with map-side
    combine, so the exchange carries distinct bigrams, not corpus
    positions."""
    from ..operators import dedup
    d = _t(spark, sf_dir, "documents")
    # split on the ONE canonical normalization (dedup._canon) so bigram
    # words stay key-compatible with the dedup/fingerprint family
    words = F.split(dedup._canon("text"), " ")
    grams = F.when(
        F.size(F.col("words")) >= 2,
        F.expr("transform(sequence(1, size(words) - 1), "
               "i -> concat(element_at(words, i), ' ', element_at(words, i + 1)))")
    ).otherwise(F.array().cast("array<string>"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "bigram")
    return (d.select("lang", words.alias("words"))
            .select("lang", F.explode(grams).alias("bigram"))
            .groupBy("lang", "bigram").agg(F.count("*").alias("n"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 5)
            .select("lang", "rank", "bigram", "n"))


SQL_BIGRAMS = """
WITH words AS (
  SELECT lang,
         string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents),
grams AS (
  SELECT lang,
         unnest(CASE WHEN len(w) >= 2
                THEN list_transform(generate_series(1, len(w) - 1),
                                    i -> concat(w[i], ' ', w[i + 1]))
                ELSE [] END) AS bigram
  FROM words),
counted AS (
  SELECT lang, bigram, COUNT(*) AS n FROM grams GROUP BY lang, bigram),
ranked AS (
  SELECT lang, bigram, n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rank
  FROM counted)
SELECT lang, CAST(rank AS BIGINT) AS rank, bigram, CAST(n AS BIGINT) AS n
FROM ranked WHERE rank <= 5
"""


def q_doc_tfidf_top_terms(spark, sf_dir):
    """Per-document top-3 terms by TF-IDF — the retrieval/analytics
    staple over a text corpus.  Shape: one tf shuffle on (doc_id, word),
    one df shuffle on word, corpus size N as a broadcast one-row
    cross-join (never a collect), then a per-doc top-k window.  Both
    engines compute ln() in double and the score is rounded to 6 dp
    before ranking (tie-break by word) so ranks agree bit-for-bit."""
    from ..operators import dedup
    d = _t(spark, sf_dir, "documents")
    words = (d.select("doc_id", F.explode(F.split(dedup._canon("text"), " "))
                      .alias("word"))
             .where(F.length("word") > 0))
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = words.select("doc_id", "word").distinct() \
                 .groupBy("word").agg(F.count("*").alias("df"))
    n_docs = d.agg(F.count("*").alias("n_docs"))
    scored = (tf.join(dfreq, "word")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("tfidf_r",
                          F.round(F.col("tf")
                                  * F.log(F.col("n_docs") / F.col("df")), 6)))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_r"), "word")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 3)
            .select("doc_id", "rank", "word", "tf", "tfidf_r"))


SQL_TFIDF = """
WITH words AS (
  SELECT doc_id, w AS word
  FROM documents,
       unnest(string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS t(w)
  WHERE length(w) > 0),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY 1, 2),
dfreq AS (
  SELECT word, COUNT(*) AS df
  FROM (SELECT DISTINCT doc_id, word FROM words) GROUP BY word),
scored AS (
  SELECT tf.doc_id, tf.word, tf.tf,
         ROUND(tf.tf * LN((SELECT COUNT(*) FROM documents) * 1.0 / dfreq.df), 6) AS tfidf_r
  FROM tf JOIN dfreq USING (word)),
ranked AS (
  SELECT doc_id, word, tf, tfidf_r,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf_r DESC, word) AS rank
  FROM scored)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, word, CAST(tf AS BIGINT) AS tf,
       tfidf_r
FROM ranked WHERE rank <= 3
"""


def q_user_sessionization(spark, sf_dir):
    """Gap-based sessionization (lag + conditional running count) — the
    batch analog of stateful streaming sessionization."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull()
               | (F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")), 1)
        .otherwise(0))
    return (flagged.groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.sum("new_session").alias("n_sessions")))


SQL_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events)
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(new_session) AS BIGINT) AS n_sessions
FROM flagged GROUP BY user_id
"""


def q_session_window_rollup(spark, sf_dir):
    """Native session_window (the Structured-Streaming session operator,
    used in batch): per (user, 30-min-gap session) rollup. Equivalent by
    construction to the lag/cumsum formulation in the oracle."""
    _pin_utc(spark)
    e = _t(spark, sf_dir, "events")
    return (e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
            .agg(F.count("*").alias("n_events"),
                 F.sum(_cents(F.col("value"))).alias("sum_value_cents"))
            .select("user_id",
                    F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
                    "n_events", "sum_value_cents"))


SQL_SESSION_WINDOW = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM sessions GROUP BY user_id, session_id
"""


def q_hourly_event_rollup(spark, sf_dir):
    """Tumbling-window (event-time) rollup — date_trunc on both sides."""
    _pin_utc(spark)
    e = _t(spark, sf_dir, "events")
    return (e.groupBy(F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("bucket_hour"),
                      "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(_cents(F.col("value"))).alias("sum_value_cents")))


SQL_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_hour, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# text analysis (operators.textstats)

def q_doc_token_counts(spark, sf_dir):
    return textstats.token_counts(_t(spark, sf_dir, "documents"))


SQL_TOKENS = """
SELECT doc_id, length(text) AS n_chars,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE length(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
       CAST(CEIL(length(regexp_replace(text, '\\s+', '', 'g')) / 4.0) AS BIGINT) AS n_subwords
FROM documents
"""


def q_doc_quality_filter(spark, sf_dir):
    """Gopher/C4-style keep/drop gate with first-failing-rule reason."""
    return textstats.quality_filter(_t(spark, sf_dir, "documents"))


# THE quality-gate SQL mirror, factored once (same rationale as
# dedup.WORD_ARRAY_SQL): a threshold/regex change in
# textstats.quality_drop_reason has a single SQL twin to update, and the
# three oracles that embed the gate (doc_quality_filter,
# corpus_curation, source_quality_gate) can never silently diverge from
# each other.
SQL_QGATE_FEATURES = r"""
  SELECT doc_id, source, text IS NULL AS is_null,
         length(text) AS n_chars,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE length(string_split_regex(trim(text), '\s+')) END AS n_words,
         length(text) - length(regexp_replace(text, '[^\p{L}\p{N} \t\n\f\r]', '', 'g')) AS n_sym,
         length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_latin,
         length(text) - length(regexp_replace(text, '[^\p{L}]', '', 'g')) AS n_letters,
         length(regexp_extract_all(text, ' (the|a|an|of|and|or|in|on|to|is) ', 1)) AS n_stop
  FROM documents"""

SQL_QGATE_DROP = """CASE WHEN is_null THEN 'null_text'
              WHEN n_words < 5 THEN 'too_short'
              WHEN n_words > 100000 THEN 'too_long'
              WHEN CAST(n_chars AS DOUBLE) / greatest(n_words, 1) < 2.0 THEN 'short_words'
              WHEN CAST(n_chars AS DOUBLE) / greatest(n_words, 1) > 12.0 THEN 'long_words'
              WHEN CAST(n_sym AS DOUBLE) / greatest(n_chars, 1) > 0.3 THEN 'symbol_ratio'
              WHEN n_latin * 2 > n_letters AND n_stop < 1 THEN 'few_stopwords'
              ELSE NULL END"""

SQL_QUALITY_FILTER = f"""
WITH f AS ({SQL_QGATE_FEATURES}),
r AS (
  SELECT doc_id, {SQL_QGATE_DROP} AS drop_reason
  FROM f)
SELECT doc_id, drop_reason IS NULL AS keep, drop_reason FROM r
"""


def q_corpus_curation(spark, sf_dir):
    """The composed curation pipeline in ONE plan — the shape a
    pre-training data job actually runs: quality gate -> exact dedup
    (keep lowest doc_id per digest) -> per-language survivor rollup.
    Composes quality_filter + the exact-dedup key + an aggregation
    without materializing intermediates; Catalyst fuses the gates into
    the scan and the only shuffles are the dedup groupBy and the final
    rollup."""
    d = _t(spark, sf_dir, "documents")
    keep = textstats.quality_filter(d).where(F.col("keep")).select("doc_id")
    # the ONE canonical exact-dedup key (dedup.content_digest) —
    # re-deriving it inline would let the curation winners silently
    # diverge from dedup_exact's keeper_doc_id if the canonicalization
    # ever changes
    winners = (d.join(keep, "doc_id")
               .withColumn("digest", dedup.content_digest("text"))
               .groupBy("digest")
               .agg(F.min("doc_id").alias("doc_id")))
    return (d.join(winners, "doc_id")
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.length("text")).cast("bigint").alias("n_chars")))


SQL_CURATION = rf"""
WITH f AS ({SQL_QGATE_FEATURES}),
kept AS (
  SELECT doc_id FROM f
  WHERE ({SQL_QGATE_DROP}) IS NULL),
winners AS (
  SELECT MIN(d.doc_id) AS doc_id
  FROM documents d JOIN kept k ON d.doc_id = k.doc_id
  GROUP BY md5(lower(regexp_replace(trim(d.text), '\s+', ' ', 'g'))))
SELECT d.lang, COUNT(*) AS n_docs,
       CAST(SUM(length(d.text)) AS BIGINT) AS n_chars
FROM documents d JOIN winners w ON d.doc_id = w.doc_id
GROUP BY d.lang
"""


def q_doc_subword_tokens(spark, sf_dir):
    """BPE-ish token counting (GPT-2-style RE2-safe pre-tokenizer +
    ceil(len/4) wordpieces per pre-token) — the `whitespace + BPE-ish
    regex` pair the training-data surface calls for; doc_token_counts
    is the whitespace half."""
    return textstats.subword_token_counts(_t(spark, sf_dir, "documents"))


SQL_SUBWORD_TOKENS = r"""
WITH toks AS (
  SELECT doc_id,
         coalesce(regexp_extract_all(text,
           '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^ \t\n\f\r\p{L}\p{N}]+', 0),
           []) AS ts
  FROM documents)
SELECT doc_id,
       CAST(len(ts) AS BIGINT) AS n_pretokens,
       CAST(coalesce(list_sum(list_transform(ts,
            t -> CAST(ceil(length(trim(t)) / 4.0) AS BIGINT))), 0) AS BIGINT) AS n_pieces
FROM toks
"""


def q_doc_quality_scores(spark, sf_dir):
    return textstats.quality_scores(_t(spark, sf_dir, "documents"))


SQL_QUALITY = """
WITH f AS (
  SELECT doc_id, length(text) AS n_chars,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE length(string_split_regex(trim(text), '\\s+')) END AS n_words,
         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
         length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
         length(regexp_extract_all(text, ' (the|a|an|of|and|or|in|on|to|is) ', 1)) AS n_stopwords
  FROM documents)
SELECT doc_id, n_chars, n_words, n_punct, n_upper, n_stopwords,
       ROUND(n_punct / GREATEST(n_chars, 1), 6) AS punct_ratio,
       ROUND(n_stopwords / GREATEST(n_words, 1), 6) AS stopword_ratio,
       ROUND(n_chars / GREATEST(n_words, 1), 6) AS mean_word_len
FROM f
"""


def q_doc_language_id(spark, sf_dir):
    return textstats.language_id(_t(spark, sf_dir, "documents"))


SQL_LANG_ID = """
WITH f AS (
  SELECT doc_id, lang,
         length(text) - length(regexp_replace(text, '[Ѐ-ӿ]', '', 'g')) AS n_cyrillic,
         length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_latin,
         length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g')) AS n_cjk
  FROM documents)
SELECT doc_id, lang, n_cyrillic, n_latin, n_cjk,
       CASE WHEN n_cyrillic > n_latin AND n_cyrillic > n_cjk THEN 'cyrillic'
            WHEN n_cjk > n_latin AND n_cjk >= n_cyrillic THEN 'cjk'
            WHEN n_latin > 0 THEN 'latin'
            ELSE 'unknown' END AS script_pred
FROM f
"""


def q_doc_fingerprints(spark, sf_dir):
    return textstats.fingerprints(_t(spark, sf_dir, "documents"))


SQL_FINGERPRINTS = """
SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint,
       substr(md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), 1, 8) AS fp_prefix,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      [ascii(c) for c in
                       split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '')]),
         (acc, cp) -> (acc * 31 + cp) % 2147483647) AS rolling_fp
FROM documents
"""


# --------------------------------------------------------------------------
# dedup family (operators.dedup)

def q_dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(_t(spark, sf_dir, "documents"))


SQL_DEDUP_EXACT = """
SELECT md5(COALESCE(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ''))
         AS content_hash,
       MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


def q_dedup_minhash_signatures(spark, sf_dir):
    return dedup.minhash_signatures(_t(spark, sf_dir, "documents"))


SQL_MINHASH = """
WITH words AS (
  SELECT doc_id, string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents),
shingles AS (
  SELECT doc_id,
         unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                ELSE list_transform(generate_series(1, len(w) - 2),
                                    i -> array_to_string(w[i:i+2], ' '))
                END) AS shingle
  FROM words),
based AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(shingle), 1, 7)) AS BIGINT) AS h0
  FROM shingles),
hashed AS (
  SELECT doc_id, s.seed,
         (([2654435761, 2246822519, 3266489917, 668265263,
            374761393, 2166136261, 16777619, 40503][s.seed + 1] * h0
           + [975319753, 123456791, 87178291, 15485863,
              32452843, 49979687, 67867967, 86028121][s.seed + 1]) % 4294967296) AS h
  FROM based, generate_series(0, 7) AS s(seed))
SELECT doc_id, seed, MIN(h) AS minhash FROM hashed GROUP BY doc_id, seed
"""


def q_dedup_simhash(spark, sf_dir):
    return dedup.simhash(_t(spark, sf_dir, "documents"))


SQL_SIMHASH = """
WITH words AS (
  SELECT DISTINCT doc_id, w AS word
  FROM documents,
       unnest(string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS t(w)
  WHERE length(w) > 0),
bits AS (
  SELECT doc_id, b.bit,
         (CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT) >> b.bit) & 1 AS v
  FROM words, generate_series(0, 31) AS b(bit)),
maj AS (
  SELECT doc_id, bit, SUM(v) AS ones, COUNT(*) AS total
  FROM bits GROUP BY doc_id, bit)
SELECT doc_id,
       CAST(SUM(CASE WHEN 2*ones >= total THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
FROM maj GROUP BY doc_id
"""


def q_doc_rowwise_simhash(spark, sf_dir):
    """Streamable per-ROW SimHash (streaming/dedup.with_rowwise_simhash)
    run in batch: must be bit-identical to the explode+groupBy batch
    operator, so its oracle IS the batch simhash SQL — a hash mismatch
    here means the streaming near-dup path diverged from the verified
    batch semantics."""
    from ..streaming.dedup import with_rowwise_simhash
    return (with_rowwise_simhash(_t(spark, sf_dir, "documents"))
            .where(F.col("simhash").isNotNull())
            .select("doc_id", "simhash"))


def q_dedup_jaccard_pairs(spark, sf_dir):
    """Word-set Jaccard within (lang, source) candidate buckets.

    CORRECTNESS-GATE TWIN ONLY: (lang, source) buckets are
    low-cardinality, so this shape is near-quadratic at scale — the
    documented scale path is q_dedup_near_dup_verified (LSH band
    buckets); this query exists to pin jaccard_pairs' arithmetic
    against the SQL oracle and is excluded from the headline bench."""
    return dedup.jaccard_pairs(_t(spark, sf_dir, "documents"),
                               bucket_cols=["lang", "source"], threshold=0.5)


SQL_JACCARD = """
WITH words AS (
  SELECT DISTINCT doc_id, lang, source, w AS word
  FROM documents,
       unnest(string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS t(w)
  WHERE length(w) > 0),
sizes AS (SELECT doc_id, COUNT(*) AS n_words FROM words GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM words a JOIN words b
    ON a.lang = b.lang AND a.source = b.source AND a.word = b.word
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, n_inter,
       ROUND(n_inter / (sa.n_words + sb.n_words - n_inter), 6) AS jaccard_r
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(n_inter / (sa.n_words + sb.n_words - n_inter), 6) >= 0.5
"""


def q_contamination_check(spark, sf_dir):
    """Benchmark decontamination: docs sharing 5-word shingles with the
    (deterministic) benchmark set doc_id < 5 — broadcast semi-join on
    the shingle, no corpus-wide shuffle."""
    return dedup.contamination_check(_t(spark, sf_dir, "documents"),
                                     benchmark_ids=[0, 1, 2, 3, 4], k=5)


SQL_CONTAMINATION = """
WITH words AS (
  SELECT doc_id, string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents),
grams AS (
  SELECT doc_id,
         unnest(CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
                ELSE list_transform(generate_series(1, len(w) - 4),
                                    i -> array_to_string(w[i:i+4], ' '))
                END) AS shingle
  FROM words),
bench AS (SELECT DISTINCT shingle FROM grams WHERE doc_id < 5),
corpus AS (SELECT * FROM grams WHERE doc_id >= 5),
totals AS (SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY doc_id),
hits AS (
  SELECT c.doc_id, COUNT(*) AS n_contaminated
  FROM corpus c JOIN bench b ON c.shingle = b.shingle
  GROUP BY c.doc_id)
SELECT h.doc_id, CAST(t.n_grams AS BIGINT) AS n_grams,
       CAST(h.n_contaminated AS BIGINT) AS n_contaminated,
       ROUND(CAST(h.n_contaminated AS DOUBLE) / t.n_grams, 6) AS contamination_r
FROM hits h JOIN totals t ON h.doc_id = t.doc_id
"""


def q_dedup_lsh_candidates(spark, sf_dir):
    return dedup.lsh_candidates(dedup.minhash_signatures(_t(spark, sf_dir, "documents")))


SQL_LSH_CANDIDATES = f"""
WITH sigs AS ({SQL_MINHASH}),
banded AS (
  SELECT doc_id, CAST(FLOOR(seed / 4.0) AS INTEGER) AS band,
         md5(string_agg(concat(CAST(seed AS VARCHAR), ':', CAST(minhash AS VARCHAR)), ','
             ORDER BY concat(CAST(seed AS VARCHAR), ':', CAST(minhash AS VARCHAR)))) AS bucket
  FROM sigs GROUP BY doc_id, CAST(FLOOR(seed / 4.0) AS INTEGER))
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
WHERE a.doc_id < b.doc_id
"""


def q_dedup_near_dup_verified(spark, sf_dir):
    """End-to-end near-dup pipeline: MinHash -> LSH candidates -> exact
    Jaccard verify >= 0.5 (the never-all-pairs 100 TB dedup shape)."""
    return dedup.verified_near_dups(_t(spark, sf_dir, "documents"))


SQL_NEAR_DUP_VERIFIED = """
WITH cand AS (__LSH_CANDIDATES__),
words AS (
  SELECT DISTINCT doc_id, w AS word
  FROM documents,
       unnest(string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS t(w)
  WHERE length(w) > 0),
sizes AS (SELECT doc_id, COUNT(*) AS n_words FROM words GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN words wa ON wa.doc_id = c.doc_a
  JOIN words wb ON wb.doc_id = c.doc_b AND wb.word = wa.word
  GROUP BY 1, 2),
scored AS (
  SELECT c.doc_a, c.doc_b,
         COALESCE(i.n_inter, 0) AS n_inter,
         ROUND(COALESCE(i.n_inter, 0)
               / (sa.n_words + sb.n_words - COALESCE(i.n_inter, 0)), 6) AS jaccard_r
  FROM cand c
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b)
SELECT doc_a, doc_b, n_inter, jaccard_r FROM scored WHERE jaccard_r >= 0.5
""".replace("__LSH_CANDIDATES__", SQL_LSH_CANDIDATES)


def q_dedup_incremental(spark, sf_dir):
    """Ingest-time dedup of an incoming batch against the committed
    corpus — the snapshot-N -> snapshot-N+1 production path that never
    re-dedupes history.

    The committed corpus is doc_id % 10 < 8; the batch is the other 20%
    PLUS a deterministic recrawl (every existing doc_id % 17 == 0
    reappears under a fresh id) and batch-internal repeats (every
    incoming doc_id % 23 == 0 appears twice) — the synthetic corpus has
    no exact duplicates below sf0.1, so without these both non-'new'
    statuses would be corpus-unreachable at oracle scale."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    existing = docs.where(d % 10 < 8)
    incoming = (docs.where(d % 10 >= 8).select("doc_id", "text")
                .unionByName(existing.where(d % 17 == 0)
                             .select((d + 1000000).alias("doc_id"), "text"))
                .unionByName(docs.where((d % 10 >= 8) & (d % 23 == 0))
                             .select((d + 2000000).alias("doc_id"), "text")))
    return dedup.incremental_dedup(existing=existing, incoming=incoming)


SQL_INCREMENTAL_DEDUP = """
WITH inc_rows AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents
  WHERE doc_id % 10 < 8 AND doc_id % 17 = 0
  UNION ALL
  SELECT doc_id + 2000000, text FROM documents
  WHERE doc_id % 10 >= 8 AND doc_id % 23 = 0),
ex AS (
  SELECT DISTINCT
         md5(COALESCE(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ''))
         AS content_hash
  FROM documents WHERE doc_id % 10 < 8),
inc AS (
  SELECT doc_id,
         md5(COALESCE(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ''))
         AS content_hash
  FROM inc_rows),
keep AS (SELECT content_hash, MIN(doc_id) AS batch_keeper FROM inc GROUP BY 1)
SELECT i.doc_id, i.content_hash,
       CASE WHEN e.content_hash IS NOT NULL THEN 'dup_of_existing'
            WHEN i.doc_id <> k.batch_keeper THEN 'dup_within_batch'
            ELSE 'new' END AS status
FROM inc i
LEFT JOIN ex e ON i.content_hash = e.content_hash
JOIN keep k ON i.content_hash = k.content_hash
"""


def q_cross_doc_shingle_dup(spark, sf_dir):
    """Per-doc cross-document duplication signal: fraction of each
    document's distinct 5-word shingles that occur in >= 1 other doc."""
    return dedup.cross_doc_shingle_stats(_t(spark, sf_dir, "documents"), k=5)


SQL_SHINGLE_DUP = """
WITH words AS (
  SELECT doc_id, string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents),
grams AS (
  SELECT doc_id,
         unnest(CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
                ELSE list_transform(generate_series(1, len(w) - 4),
                                    i -> array_to_string(w[i:i+4], ' '))
                END) AS shingle
  FROM words),
shd AS (SELECT DISTINCT doc_id, md5(shingle) AS sh FROM grams),
cnt AS (SELECT sh, COUNT(*) AS nd FROM shd GROUP BY sh)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       ROUND(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
         AS shared_frac
FROM shd s JOIN cnt c ON s.sh = c.sh
GROUP BY s.doc_id
"""


def q_dedup_cluster_assign(spark, sf_dir):
    """Transitive duplicate clusters: near-dup pairs -> connected
    components (iterative min-label propagation, lineage-truncated per
    round) -> one keeper per cluster.  The step that turns pairwise
    dedup output into the actual drop list at 100 TB."""
    return dedup.cluster_assign(
        dedup.verified_near_dups(_t(spark, sf_dir, "documents")))


# The oracle computes the same components with a recursive CTE: reach
# enumerates every (vertex, reachable-vertex) pair over the symmetric
# edge list, and MIN(reachable) per vertex is exactly the converged
# min-label.  Fine at oracle scale; quadratic in cluster size, which is
# why the Spark side propagates labels instead.
SQL_CLUSTER_ASSIGN = """
WITH RECURSIVE pairs AS (__PAIRS__),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst),
labels AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
sized AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM labels GROUP BY cluster_id)
SELECT l.doc_id, l.cluster_id, CAST(s.cluster_size AS BIGINT) AS cluster_size,
       l.doc_id = l.cluster_id AS is_keeper
FROM labels l JOIN sized s USING (cluster_id)
""".replace("__PAIRS__", SQL_NEAR_DUP_VERIFIED)


def q_dedup_cluster_assign_star(spark, sf_dir):
    """Same transitive clusters via alternating large-star/small-star
    contraction (O(log n) rounds on adversarial chain graphs — the
    variant the label-propagation docstring defers to at cluster
    scale).  Shares cluster_assign's oracle: identical output contract,
    so the recursive-CTE twin verifies both."""
    return dedup.cluster_assign_star(
        dedup.verified_near_dups(_t(spark, sf_dir, "documents")))


def q_dup_passage_ranges(spark, sf_dir):
    """Cross-doc duplicated passages (ExactSubstr k-gram variant, Lee
    et al. 2022): maximal word-position runs covered by a 5-gram
    occurring in >= 2 distinct documents — WHERE the copied text sits,
    per doc, so curation can excise spans instead of dropping docs.
    Two partial-agg shuffles on the gram hash + a co-partitioned hit
    join + one doc_id shuffle for the interval merge; integers only."""
    return dedup.duplicated_passages(_t(spark, sf_dir, "documents"),
                                     k=5, min_docs=2)


SQL_DUP_PASSAGES = dedup.duplicated_passages_sql("documents", k=5,
                                                 min_docs=2)


def q_doc_bigram_domain_logprob(spark, sf_dir):
    """CCNet-proper domain-LM gate (Wenzek et al. 2020): interpolated
    bigram LM trained on the lang='en' reference slice, every doc's
    transitions scored against it — fluent-but-off-domain text scores
    low, unlike the corpus-self unigram stand-in.  Counts-only doubles
    micro-fixed before the per-doc sum; reference model two partial
    aggs over the target slice; scoring two left equi-joins + a one-row
    broadcast."""
    return textstats.bigram_domain_logprob(
        _t(spark, sf_dir, "documents"), target_lang="en", lam=0.7)


SQL_BIGRAM_DOMAIN = textstats.bigram_domain_logprob_sql(
    "documents", target_lang="en", lam=0.7)


def q_ccnet_perplexity_tiers(spark, sf_dir):
    """CCNet head/middle/tail corpus partitioning (Wenzek et al. 2020
    §4.4): per-language NTILE(3) over the domain-LM score — the
    published quality-tier cut downstream consumers select on.  Score
    arithmetic is the micro-fixed bigram LM (doc_bigram_domain_logprob);
    ordering ties broken by doc_id so tier assignment is engine- and
    partitioning-exact."""
    return textstats.ccnet_perplexity_tiers(
        _t(spark, sf_dir, "documents"), target_lang="en", lam=0.7)


SQL_CCNET_TIERS = f"""
SELECT s.doc_id, d.lang, s.mean_logprob_r,
       CASE ntile(3) OVER (PARTITION BY d.lang
                           ORDER BY s.mean_logprob_r DESC, s.doc_id)
            WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS tier
FROM ({SQL_BIGRAM_DOMAIN}) s JOIN documents d USING (doc_id)
"""


_BADWORDS = ("casino", "slow", "vector")


def q_doc_badword_filter(spark, sf_dir):
    """C4-style blocklist gate: drop any doc containing a blocklisted
    whole token.  List folds into the plan as an array literal (never a
    join); one in-row HOF count; codegen at scan speed."""
    return textstats.badword_filter(_t(spark, sf_dir, "documents"),
                                    _BADWORDS)


SQL_BADWORDS = textstats.badword_filter_sql("documents", _BADWORDS)


def q_dup_passage_excise(spark, sf_dir):
    """The APPLY step of passage dedup: every duplicated passage is
    excised from every doc except the gram's owner (min doc_id — a pure
    aggregate, so 'keep one copy' is deterministic under any
    partitioning), and the surviving words are reassembled.  Integers
    and strings only; same gram/agg shape as dup_passage_ranges plus
    one doc_id rollup and the words rejoin."""
    return dedup.dup_passage_excise(_t(spark, sf_dir, "documents"),
                                    k=5, min_docs=2)


SQL_DUP_EXCISE = dedup.dup_passage_excise_sql("documents", k=5,
                                              min_docs=2)


_BM25_QUERY_TERMS = ("spark", "merge", "vector")


def q_bm25_search(spark, sf_dir):
    """Okapi BM25 top-10 for a fixed bag-of-terms query — ranked
    retrieval one step past tf-idf, the spot-check a corpus platform
    runs against its inverted index.  Query-term filter reaches the
    scan side before the first shuffle; df and corpus stats are one-row
    broadcasts; micro-fixed BIGINT contributions make the per-doc sum
    exact integer arithmetic; the cut is TakeOrderedAndProject."""
    return textindex.bm25_topk(_t(spark, sf_dir, "documents"),
                               _BM25_QUERY_TERMS, k=10)


SQL_BM25 = textindex.bm25_sql("documents", _BM25_QUERY_TERMS, k=10)


def q_hybrid_search_rrf(spark, sf_dir):
    """Two-channel retrieval, fused: BM25 lexical top-20 + cosine
    top-20 over feature-hashing embeddings of the SAME query text,
    combined by reciprocal-rank fusion (Cormack et al. 2009,
    1/(60+rank)) — the standard hybrid-search shape with no model
    anywhere.  Both channels end in bounded top-k cuts, so fusion
    joins at most 40 rows."""
    return textindex.hybrid_search_rrf(_t(spark, sf_dir, "documents"),
                                       _BM25_QUERY_TERMS, k=10)


def _sql_hybrid_rrf():
    return textindex.hybrid_rrf_sql("documents", SQL_HASH_EMBEDDINGS,
                                    _BM25_QUERY_TERMS, k=10)


def q_dedup_cluster_best_keeper(spark, sf_dir):
    """RefinedWeb-style keeper election: same star-contraction clusters,
    but the keeper is each cluster's HIGHEST-QUALITY member (longest
    text, ties to min doc_id) — production dedup keeps the best copy,
    not the min-id copy, because near-dups are often truncated variants
    of one page.  One doc_id equi-join + a per-cluster window bounded
    by cluster size on top of the clustering."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.cluster_keepers_by_quality(
        dedup.cluster_assign_star(dedup.verified_near_dups(docs)), docs)


SQL_BEST_KEEPER = """
SELECT ca.doc_id, ca.cluster_id, ca.cluster_size,
       LENGTH(COALESCE(d.text, '')) AS n_chars,
       ROW_NUMBER() OVER (
           PARTITION BY ca.cluster_id
           ORDER BY LENGTH(COALESCE(d.text, '')) DESC, ca.doc_id) = 1
         AS is_keeper
FROM (__CLUSTERS__) ca JOIN documents d USING (doc_id)
""".replace("__CLUSTERS__", SQL_CLUSTER_ASSIGN)


def q_graph_pagerank(spark, sf_dir):
    """Weighted PageRank over the customer<->supplier trade graph — the
    relational twin of link-graph host ranking (crawl prioritization /
    quality weighting at web scale).  Nodes are namespaced 2*custkey /
    2*suppkey+1; edge weight = lineitem count; the graph is symmetrized
    so it has no dangling nodes and the fixed-budget iteration is a pure
    function of the input."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    edges_dir = (li.join(o, li.l_orderkey == o.o_orderkey)
                 .groupBy((F.col("o_custkey") * 2).alias("src"),
                          (F.col("l_suppkey") * 2 + 1).alias("dst"))
                 .agg(F.count("*").cast("double").alias("weight")))
    edges = edges_dir.unionByName(
        edges_dir.select(F.col("dst").alias("src"),
                         F.col("src").alias("dst"), "weight"))
    pr = graphrank.pagerank(edges, d=0.85, n_iter=6)
    return pr.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
         .otherwise(F.lit("supplier")).alias("node_type"),
        F.shiftright(F.col("node"), 1).alias("member_key"),
        F.round("pr_rank", 6).alias("pr_rank_r"))


# The oracle unrolls the 6 fixed iterations as chained CTEs (the SQL
# standard forbids aggregation over the recursive reference, so a
# recursive CTE can't express a per-round SUM).  Both engines compute
# the identical IEEE expression tree; only double summation order
# differs, orders of magnitude below the 1e-6 rounding grain.
# (1 - d) is PRE-FOLDED as the Python double Spark's plan embeds
# (repr(1.0 - 0.85)) — a bare `(1.0 - 0.85)` would run EXACT decimal
# arithmetic in DuckDB (0.15, one ulp off the double chain); the
# 0.85 * s product is safe as-is because decimal*DOUBLE promotes.
_SQL_PR_ITER = ("""pr{i} AS (
  SELECT n.node, CAST(""" + repr(1.0 - 0.85) + """ AS DOUBLE)
                 / (SELECT n FROM nn) + 0.85 * COALESCE(c.s, 0) AS pr
  FROM nodes n LEFT JOIN (
    SELECT ne.dst AS node, SUM(ne.share * p.pr) AS s
    FROM ne JOIN pr{prev} p ON ne.src = p.node GROUP BY 1) c
  ON n.node = c.node),
""")

SQL_PAGERANK = ("""
WITH edges0 AS (
  SELECT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst,
         CAST(COUNT(*) AS DOUBLE) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2),
edges AS (
  SELECT src, dst, w FROM edges0
  UNION ALL
  SELECT dst AS src, src AS dst, w FROM edges0),
outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
ne AS (SELECT e.src, e.dst, e.w / o.ow AS share
       FROM edges e JOIN outw o ON e.src = o.src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes),
""" + "".join(_SQL_PR_ITER.format(i=i, prev=i - 1) for i in range(1, 7)) +
"""fin AS (SELECT node, pr FROM pr6)
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       node >> 1 AS member_key, ROUND(pr, 6) AS pr_rank_r
FROM fin
""")


def q_doc_unigram_logprob(spark, sf_dir):
    """Corpus-trained unigram LM scoring per document (CCNet perplexity
    gate stand-in): mean token log-probability under word -> cnt/total."""
    return textstats.unigram_logprob(_t(spark, sf_dir, "documents"))


_SQL_WORDS = r"""
w0 AS (
  SELECT doc_id,
         string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS ws
  FROM documents),
words AS (
  SELECT doc_id, unnest(list_filter(ws, w -> len(w) > 0)) AS word FROM w0),
freq AS (SELECT word, COUNT(*) AS cnt FROM words GROUP BY word)"""

SQL_UNIGRAM_LOGPROB = f"""
WITH {_SQL_WORDS},
tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM freq)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(AVG(ln(cnt / (SELECT total FROM tot))), 6) AS avg_logprob_r
FROM words JOIN freq USING (word)
GROUP BY doc_id
"""


def q_doc_vocab_oov(spark, sf_dir):
    """Deterministic top-20 vocabulary build + per-doc OOV rate (the
    corpus has 31 distinct canonical words at every sf, so a top-20 cut
    leaves real OOV mass at each scale)."""
    return textstats.vocab_oov(_t(spark, sf_dir, "documents"), top_v=20)


SQL_VOCAB_OOV = f"""
WITH {_SQL_WORDS},
vocab AS (
  SELECT word FROM (
    SELECT word, ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rn FROM freq)
  WHERE rn <= 20)
SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       ROUND(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
         AS oov_rate_r
FROM words w LEFT JOIN vocab v ON w.word = v.word
GROUP BY w.doc_id
"""


# --------------------------------------------------------------------------
# similarity search (operators.similarity)

_QUERY_IDS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]


def q_embedding_topk_bruteforce(spark, sf_dir):
    return similarity.brute_force_topk(_t(spark, sf_dir, "embeddings"), _QUERY_IDS, k=5)


SQL_TOPK = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
dots AS (
  SELECT q.query_id, n.vec_id,
         SUM(q.qv[i] * n.nv[i]) AS dot,
         SUM(q.qv[i] * q.qv[i]) AS qn,
         SUM(n.nv[i] * n.nv[i]) AS nn
  FROM q, n, generate_series(1, 64) AS t(i)
  WHERE q.query_id <> n.vec_id
  GROUP BY 1, 2),
scored AS (
  SELECT query_id, vec_id, ROUND(dot / SQRT(qn * nn), 6) AS cosine_r
  FROM dots),
ranked AS (
  SELECT query_id, vec_id,  cosine_r,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_r DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, rank, vec_id AS neighbor_id, cosine_r FROM ranked WHERE rank <= 5
"""


def q_embedding_topk_quantized(spark, sf_dir):
    """Cosine top-k over int8-quantized embeddings
    (similarity.quantized_topk): same broadcast + window plan as the
    float brute force, but int arrays throughout — 4-8x narrower
    broadcast/scan at 100 TB, and exact int64 dots make the scores
    bit-identical across engines by construction."""
    return similarity.quantized_topk(_t(spark, sf_dir, "embeddings"),
                                     _QUERY_IDS, k=5)


SQL_TOPK_QUANT = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
mx AS (
  SELECT vec_id, v,
         greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) AS m
  FROM e),
q AS (
  SELECT vec_id,
         list_transform(v, x -> CAST(floor(x * 127.0 / m + 0.5) AS BIGINT)) AS qv
  FROM mx),
qq AS (SELECT vec_id AS query_id, qv AS qvec FROM q WHERE vec_id < 10),
dots AS (
  SELECT qq.query_id, q.vec_id,
         SUM(qq.qvec[i] * q.qv[i]) AS dot,
         SUM(qq.qvec[i] * qq.qvec[i]) AS qn,
         SUM(q.qv[i] * q.qv[i]) AS nn
  FROM qq, q, generate_series(1, 64) AS t(i)
  WHERE qq.query_id <> q.vec_id
  GROUP BY 1, 2),
scored AS (
  SELECT query_id, vec_id,
         ROUND(dot / SQRT(CAST(qn * nn AS DOUBLE)), 6) AS cosine_q
  FROM dots),
ranked AS (
  SELECT query_id, vec_id, cosine_q,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine_q DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id AS neighbor_id,
       cosine_q
FROM ranked WHERE rank <= 5
"""


def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs via LSH buckets + exact verify.
    Threshold 0.4 is tuned to the synthetic corpus (max pairwise cosine
    ~0.48 — unclustered vectors); production near-dup uses ~0.95."""
    return similarity.cosine_near_dup_pairs(_t(spark, sf_dir, "embeddings"),
                                            threshold=0.4)


SQL_EMB_NEAR_DUP = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
comp AS (
  SELECT p.p, i.i,
         CAST(concat('0x', substr(md5(concat(CAST(p.p AS VARCHAR), ':',
              CAST(i.i - 1 AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 - 0.5 AS c
  FROM generate_series(0, 3) p(p), generate_series(1, 64) i(i)),
dots AS (
  SELECT e.vec_id, comp.p, SUM(e.v[comp.i] * comp.c) AS d
  FROM e, comp GROUP BY e.vec_id, comp.p),
sigs AS (
  SELECT vec_id, CAST(SUM(CASE WHEN d >= 0 THEN (1 << (3 - p)) ELSE 0 END) AS INTEGER) AS bucket
  FROM dots GROUP BY vec_id),
cand AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b, ea.v AS va, eb.v AS vb
  FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id),
scored AS (
  SELECT doc_a, doc_b,
         ROUND(SUM(va[i] * vb[i]) / SQRT(SUM(va[i]*va[i]) * SUM(vb[i]*vb[i])), 6) AS cosine_r
  FROM cand, generate_series(1, 64) t(i)
  GROUP BY doc_a, doc_b)
SELECT doc_a, doc_b, cosine_r FROM scored WHERE cosine_r >= 0.4
"""


def q_dedup_embedding_cosine_banded(spark, sf_dir):
    """Banded (multi-band OR-amplified) embedding near-dup — the
    scale-correct variant of q_dedup_embedding_cosine: candidates from
    ANY of 8 independent 4-bit hyperplane bands, one exact verify per
    distinct pair.  Threshold tuned to the unclustered synthetic corpus
    like the single-signature query."""
    return similarity.cosine_near_dup_banded(
        _t(spark, sf_dir, "embeddings"), threshold=0.35,
        n_bands=8, band_planes=4)


def q_dedup_embedding_cosine_banded_mat(spark, sf_dir):
    """The materialized-signature twin of dedup_embedding_cosine_banded:
    identical results (same oracle SQL), but the signature table is
    persisted so the folded-plane dot products evaluate once instead of
    once per self-join side — the production write-signatures-once
    shape, expressed in-query."""
    return similarity.cosine_near_dup_banded_materialized(
        _t(spark, sf_dir, "embeddings"), threshold=0.35,
        n_bands=8, band_planes=4)


SQL_EMB_NEAR_DUP_BANDED = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
comp AS (
  SELECT p.p, i.i,
         CAST(concat('0x', substr(md5(concat(CAST(p.p AS VARCHAR), ':',
              CAST(i.i - 1 AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 - 0.5 AS c
  FROM generate_series(0, 31) p(p), generate_series(1, 64) i(i)),
dots AS (
  SELECT e.vec_id, comp.p, SUM(e.v[comp.i] * comp.c) AS d
  FROM e, comp GROUP BY e.vec_id, comp.p),
sigs AS (
  SELECT vec_id, CAST(p // 4 AS INTEGER) AS band,
         CAST(SUM(CASE WHEN d >= 0 THEN (1 << (3 - (p % 4))) ELSE 0 END) AS INTEGER) AS bucket
  FROM dots GROUP BY vec_id, p // 4),
cand AS (
  SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM sigs a JOIN sigs b ON a.band = b.band AND a.bucket = b.bucket
       AND a.vec_id < b.vec_id),
scored AS (
  SELECT c.doc_a, c.doc_b,
         ROUND(SUM(ea.v[i] * eb.v[i])
               / SQRT(SUM(ea.v[i]*ea.v[i]) * SUM(eb.v[i]*eb.v[i])), 6) AS cosine_r
  FROM cand c
  JOIN e ea ON ea.vec_id = c.doc_a
  JOIN e eb ON eb.vec_id = c.doc_b,
       generate_series(1, 64) t(i)
  GROUP BY c.doc_a, c.doc_b)
SELECT doc_a, doc_b, cosine_r FROM scored WHERE cosine_r >= 0.35
"""


def q_multimodal_frame_sample(spark, sf_dir):
    """Row-expanding mapInPandas (UDTF shape): deterministic frame
    sampling over a binary column."""
    d = (_t(spark, sf_dir, "documents")
         .select("doc_id", F.encode("text", "utf-8").alias("blob")))
    return multimodal.frame_sample(d)


SQL_FRAME_SAMPLE = """
SELECT d.doc_id, CAST(i.i AS INTEGER) AS frame_idx,
       substr(md5(concat(d.text, chr(CAST(i.i AS INTEGER)))), 1, 12) AS frame_hash
FROM documents d, generate_series(0, 2) AS i(i)
"""


def q_embedding_label_stats(spark, sf_dir):
    emb = similarity.with_norm(_t(spark, sf_dir, "embeddings"))
    return (emb.groupBy("label")
            .agg(F.count("*").alias("n_vectors"),
                 F.round(F.avg("norm"), 4).alias("avg_norm")))


SQL_LABEL_STATS = """
WITH n AS (
  SELECT label, vec_id, SQRT(SUM(ev[i] * ev[i])) AS norm
  FROM (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
       generate_series(1, 64) AS t(i)
  GROUP BY label, vec_id)
SELECT label, COUNT(*) AS n_vectors, ROUND(AVG(norm), 4) AS avg_norm
FROM n GROUP BY label
"""


def q_embedding_label_centroids(spark, sf_dir):
    """Per-label mean embedding, exploded per dimension — partial-agg
    shuffle of only n_labels x dim rows."""
    return similarity.label_centroids(_t(spark, sf_dir, "embeddings"))


SQL_LABEL_CENTROIDS = """
SELECT label, CAST(i - 1 AS INTEGER) AS dim_idx,
       ROUND(AVG(CAST(v[i] AS DOUBLE)), 6) AS centroid_r,
       COUNT(*) AS n_vecs
FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE embedding IS NOT NULL),
     generate_series(1, 64) AS t(i)
GROUP BY label, i
"""
# ^ the NOT NULL filter matches Spark's posexplode, which drops a
# NULL-embedding row entirely — a bare COUNT(*) over the
# generate_series cross join would still count it for all 64 dims


def q_doc_zscore_by_lang(spark, sf_dir):
    """Grouped-map (applyInPandas) per-group normalization — the grouped
    custom-state pattern of SURVEY §2.10."""
    from ..operators.grouped import zscore_by_group
    return zscore_by_group(_t(spark, sf_dir, "documents"), z_col="z_chars")


SQL_ZSCORE = """
SELECT doc_id, lang, n_chars,
       CASE WHEN COUNT(*) OVER (PARTITION BY lang) < 2
              OR STDDEV_SAMP(n_chars) OVER (PARTITION BY lang) = 0
            THEN 0.0
            ELSE ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY lang))
                       / STDDEV_SAMP(n_chars) OVER (PARTITION BY lang), 6)
       END AS z_chars
FROM documents
"""


# --------------------------------------------------------------------------
# multimodal plumbing (operators.multimodal) — blob synthesized from text

def q_multimodal_media_meta(spark, sf_dir):
    d = (_t(spark, sf_dir, "documents")
         .select("doc_id", F.encode("text", "utf-8").alias("blob")))
    return multimodal.media_metadata(d).select(
        "doc_id", "n_bytes", "header_hex", "fake_width", "fake_height")


SQL_MEDIA_META = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       substr(md5(text), 1, 8) AS header_hex,
       CAST(64 + octet_length(encode(text)) % 512 AS INTEGER) AS fake_width,
       CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INTEGER) AS fake_height
FROM documents
"""


def q_multimodal_resize_plan(spark, sf_dir):
    """Aspect-preserving resize geometry over a binary column
    (decode stubbed; mapInPandas plumbing + fit math real)."""
    d = (_t(spark, sf_dir, "documents")
         .select("doc_id", F.encode("text", "utf-8").alias("blob")))
    return multimodal.resize_plan(d, target=256)


SQL_RESIZE_PLAN = """
WITH dims AS (
  SELECT doc_id,
         CAST(64 + octet_length(encode(text)) % 512 AS INTEGER) AS orig_w,
         CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INTEGER) AS orig_h
  FROM documents)
SELECT doc_id, orig_w, orig_h,
       CAST(FLOOR(orig_w * (256.0 / GREATEST(orig_w, orig_h))) AS INTEGER) AS out_w,
       CAST(FLOOR(orig_h * (256.0 / GREATEST(orig_w, orig_h))) AS INTEGER) AS out_h,
       ROUND(256.0 / GREATEST(orig_w, orig_h), 6) AS scale_r
FROM dims
"""


def q_multimodal_feature_extract(spark, sf_dir):
    """Deterministic pseudo-feature extraction over a binary column,
    exploded (doc_id, dim_idx, value_r) — embedding-extractor plumbing."""
    d = (_t(spark, sf_dir, "documents")
         .select("doc_id", F.encode("text", "utf-8").alias("blob")))
    return multimodal.feature_extract(d, dim=8)


SQL_FEATURE_EXTRACT = """
SELECT d.doc_id, CAST(i.i AS INTEGER) AS dim_idx,
       ROUND(CAST(concat('0x', substr(md5(concat(d.text,
                  chr(CAST(48 + i.i AS INTEGER)))), 1, 4))
                  AS INTEGER) / 65535.0, 6) AS value_r
FROM documents d, generate_series(0, 7) AS i(i)
"""


def q_multimodal_header_decode(spark, sf_dir):
    """REAL image-header decode round-trip (VERDICT r3 'Next round' #2):
    synthesize a valid PNG/JPEG/GIF/WebP container per doc (format and
    pixel dims deterministic functions of doc_id), then parse
    width/height back out of the raw bytes with the stdlib header
    parser — PNG IHDR big-endian u32s, a JPEG SOFn marker walk past the
    APP0 segment, GIF little-endian logical screen, WebP VP8X 24-bit
    minus-one canvas fields.  The oracle recomputes the header
    arithmetic from doc_id, so a parser that misreads any byte offset
    hash-mismatches."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    blobs = multimodal.synth_image_corpus(d)
    return multimodal.media_header_meta(blobs)


def q_multimodal_av_metadata(spark, sf_dir):
    """REAL audio/video header decode round-trip: synthesize a valid
    PCM WAV / ISO-BMFF MP4 / FLAC per doc (cycling doc_id % 3) with
    doc_id-arithmetic parameters, then parse sample rate / channels /
    duration back out of the raw bytes — RIFF chunk walk + fmt/data
    fields for WAV, the box walk to moov/mvhd for MP4, the STREAMINFO
    bitfield for FLAC.  The oracle
    recomputes every field from doc_id, so a byte-offset mistake in
    either parser hash-mismatches."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    return multimodal.media_av_meta(multimodal.synth_av_corpus(d))


SQL_AV_METADATA = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'wav' WHEN 1 THEN 'mp4'
            ELSE 'flac' END AS kind,
       CAST(CASE doc_id % 3
            WHEN 0 THEN 8000 + (doc_id % 5) * 4000
            WHEN 2 THEN 16000 + (doc_id % 4) * 8000
            END AS INTEGER) AS sample_rate,
       CAST(CASE doc_id % 3
            WHEN 0 THEN 1 + (doc_id // 2) % 2
            WHEN 2 THEN 1 + doc_id % 2
            END AS INTEGER) AS channels,
       CAST(CASE doc_id % 3
            WHEN 0 THEN ((100 + doc_id % 900) * 1000)
                 // (8000 + (doc_id % 5) * 4000)
            WHEN 1 THEN ((10000 + doc_id % 90000) * 1000)
                 // (1000 + (doc_id % 7) * 500)
            ELSE ((50000 + doc_id % 1000000) * 1000)
                 // (16000 + (doc_id % 4) * 8000)
            END AS BIGINT) AS duration_ms,
       CAST(CASE doc_id % 3
            WHEN 0 THEN 44 + (100 + doc_id % 900) * (1 + (doc_id // 2) % 2) * 2
            WHEN 1 THEN 132
            ELSE 42 END AS INTEGER) AS n_bytes
FROM documents
"""


SQL_HEADER_DECODE = """
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
            WHEN 2 THEN 'gif' ELSE 'webp' END AS fmt,
       CAST(1 + (doc_id * 7) % 1024 AS INTEGER) AS width,
       CAST(1 + (doc_id * 13) % 1024 AS INTEGER) AS height,
       CAST(CASE doc_id % 4 WHEN 0 THEN 33 WHEN 1 THEN 35
            WHEN 2 THEN 14 ELSE 30 END AS INTEGER) AS n_bytes
FROM documents
"""


def q_multimodal_png_pixel_stats(spark, sf_dir):
    """REAL pixel-level decode round-trip (VERDICT r4 'Next round' #4 —
    retires _fake_decode for the PNG path): synthesize a full PNG per
    doc — real zlib IDAT, scanline filter type cycling (y + doc_id) % 5
    so none/sub/up/average/Paeth all sit on every document's decode
    path — with gradient pixels that are pure doc_id arithmetic
    (gray (3x+7y+d)%251 for even docs, RGB ((x+d), (2y+d), (x+y+d))%251
    for odd), then inflate + unfilter with the stdlib decoder and emit
    exact integer stats over every sample.  The oracle recomputes
    px_sum/px_min/px_max by aggregating the closed forms over the
    (x, y, channel) grid without ever seeing a PNG byte, so a wrong
    unfilter predictor, stride, or channel order hash-mismatches."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    return multimodal.media_pixel_stats(
        multimodal.synth_png_pixel_corpus(d))


# the oracle never touches a PNG byte: it rebuilds every 8-bit sample
# from the synth corpus' closed forms over a bounded (x, y, channel)
# grid (max dims 28x26, <= 3 channels) and aggregates exactly
SQL_PNG_PIXEL_STATS = """
WITH dims AS (
  SELECT doc_id AS d,
         16 + doc_id % 13 AS w,
         16 + (doc_id * 5) % 11 AS h,
         doc_id % 2 AS odd
  FROM documents),
samples AS (
  SELECT d, w, h, odd,
         CASE WHEN odd = 0 THEN (3 * x.r + 7 * y.r + d) % 251
              WHEN c.r = 0 THEN (x.r + d) % 251
              WHEN c.r = 1 THEN (2 * y.r + d) % 251
              ELSE (x.r + y.r + d) % 251 END AS v
  FROM dims, range(0, 28) x(r), range(0, 26) y(r), range(0, 3) c(r)
  WHERE x.r < w AND y.r < h AND (odd = 1 OR c.r = 0))
SELECT d AS doc_id,
       CAST(MAX(w) AS INTEGER) AS width,
       CAST(MAX(h) AS INTEGER) AS height,
       CAST(1 + 2 * MAX(odd) AS INTEGER) AS channels,
       CAST(SUM(v) AS BIGINT) AS px_sum,
       CAST(MIN(v) AS INTEGER) AS px_min,
       CAST(MAX(v) AS INTEGER) AS px_max
FROM samples
GROUP BY d
"""


def q_image_ahash_fingerprints(spark, sf_dir):
    """Perceptual image fingerprints over REAL decoded pixels (round 5):
    decode the gradient PNG corpus (inflate + unfilter), then the
    64-bit average hash — pixel (x, y) in block (x*8 div w, y*8 div h),
    bit set iff block_sum * total_px > total_sum * block_px (the mean
    comparison cross-multiplied, exact integers end to end).  The
    oracle rebuilds every bit from the closed-form pixel values over
    the (x, y) grid, so a wrong block boundary, a wrong comparison, or
    a decode bug flips bits and hash-mismatches."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    return multimodal.image_ahash(multimodal.synth_png_pixel_corpus(d))


def q_image_ahash_dup_groups(spark, sf_dir):
    """Image-level exact-perceptual dedup — the LAION-style shape:
    fingerprint every image (aHash over decoded pixels), then a plain
    groupBy on the hash; docs sharing seed doc_id % 50 carry identical
    images, so groups re-discover the planted duplicate structure.
    Digest-keyed partial aggregation — never pairwise — the only image
    dedup shape that survives 10^12 rows.  The oracle computes the same
    hash per doc from the closed forms and groups identically (by the
    HASH, not the seed, so accidental cross-seed hash collisions — if
    the gradient family ever produced one — stay engine-agnostic)."""
    d = (_t(spark, sf_dir, "documents").select("doc_id")
         .withColumn("seed", F.col("doc_id") % 50))
    hashed = multimodal.image_ahash(
        multimodal.synth_png_pixel_corpus(d, seed_col="seed"))
    return (hashed.where(F.col("ahash").isNotNull())
            .groupBy("ahash")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("min_doc"))
            .where(F.col("n_docs") >= 2))


# shared closed-form: per-doc 8x8 block sums/counts over the gradient
# grid; {SEED} is the pixel-content key (doc_id for fingerprints,
# doc_id % 50 for the planted-duplicate corpus)
_SQL_AHASH_BITS = """
dims AS (
  SELECT doc_id,
         {SEED} AS e,
         16 + ({SEED}) % 13 AS w,
         16 + (({SEED}) * 5) % 11 AS h,
         ({SEED}) % 2 AS odd
  FROM documents),
px AS (
  SELECT doc_id, e, w, h,
         (x.r * 8) // w AS bx, (y.r * 8) // h AS by,
         CASE WHEN odd = 0 THEN (3 * x.r + 7 * y.r + e) % 251
              ELSE (x.r + e) % 251 + (2 * y.r + e) % 251
                   + (x.r + y.r + e) % 251 END AS v
  FROM dims, range(0, 28) x(r), range(0, 26) y(r)
  WHERE x.r < w AND y.r < h),
blocks AS (
  SELECT doc_id, w, h, by, bx, SUM(v) AS bsum, COUNT(*) AS bcnt
  FROM px GROUP BY doc_id, w, h, by, bx),
tot AS (
  SELECT doc_id, SUM(bsum) AS tsum, SUM(bcnt) AS tcnt
  FROM blocks GROUP BY doc_id),
bits AS (
  SELECT b.doc_id, b.w, b.h, b.by * 8 + b.bx AS idx,
         CASE WHEN b.bsum * t.tcnt > t.tsum * b.bcnt
              THEN '1' ELSE '0' END AS bit
  FROM blocks b JOIN tot t ON b.doc_id = t.doc_id),
hashes AS (
  SELECT doc_id, MAX(w) AS w, MAX(h) AS h,
         STRING_AGG(bit, '' ORDER BY idx) AS ahash,
         SUM(CASE WHEN bit = '1' THEN 1 ELSE 0 END) AS ones
  FROM bits GROUP BY doc_id)
"""

SQL_IMAGE_AHASH = ("WITH " + _SQL_AHASH_BITS.format(SEED="doc_id") + """
SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       ahash, CAST(ones AS INTEGER) AS ones
FROM hashes
""")

SQL_IMAGE_AHASH_DUPS = ("WITH "
                        + _SQL_AHASH_BITS.format(SEED="doc_id % 50") + """
SELECT ahash, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
FROM hashes
GROUP BY ahash
HAVING COUNT(*) >= 2
""")


def q_multimodal_gif_pixel_stats(spark, sf_dir):
    """REAL GIF pixel-decode round-trip (round 5, after PNG): per doc,
    a single-frame GIF89a with a 64-gray ramp palette and index
    (x + 2y + doc_id) % 64 — INTERLACED for odd docs, so the LZW
    decode, the 4-pass row reorder, and the palette map all sit on the
    decode path — then exact integer stats over every RGB sample.  The
    palette ramp is (4i, 4i+1, 4i+2), so the oracle recomputes
    px_sum = SUM(12i + 3), px_min = 4*MIN(i), px_max = 4*MAX(i) + 2
    over the (x, y) grid without seeing a GIF byte; a wrong LZW reset,
    a missed deinterlace, or a swapped channel hash-mismatches."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    return multimodal.media_pixel_stats(
        multimodal.synth_gif_pixel_corpus(d))


SQL_GIF_PIXEL_STATS = """
WITH dims AS (
  SELECT doc_id AS d,
         12 + doc_id % 9 AS w,
         12 + (doc_id * 3) % 7 AS h
  FROM documents),
px AS (
  SELECT d, w, h, (x.r + 2 * y.r + d) % 64 AS i
  FROM dims, range(0, 21) x(r), range(0, 19) y(r)
  WHERE x.r < w AND y.r < h)
SELECT d AS doc_id,
       CAST(MAX(w) AS INTEGER) AS width,
       CAST(MAX(h) AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       CAST(SUM(12 * i + 3) AS BIGINT) AS px_sum,
       CAST(4 * MIN(i) AS INTEGER) AS px_min,
       CAST(4 * MAX(i) + 2 AS INTEGER) AS px_max
FROM px
GROUP BY d
"""


def q_multimodal_wav_sample_stats(spark, sf_dir):
    """REAL PCM sample decode round-trip (round 5): per doc a 16-bit
    PCM WAV whose interleaved sample k is
    ((k*2311 + doc_id*17) % 65536) - 32768, decoded back via the RIFF
    chunk walk + raw int16 read, with exact integer stats over every
    sample.  The oracle rebuilds s_sum/s_min/s_max from the closed
    form over the sample index grid — a wrong byte order, a dropped
    channel, or an off-by-one in the data-chunk walk
    hash-mismatches."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    return multimodal.media_audio_stats(
        multimodal.synth_wav_sample_corpus(d))


# max frames 129, max channels 2 -> 258 samples; range bound 260
SQL_WAV_SAMPLE_STATS = """
WITH dims AS (
  SELECT doc_id AS d,
         1 + doc_id % 2 AS ch,
         80 + doc_id % 50 AS frames
  FROM documents),
s AS (
  SELECT d, ch, frames,
         ((k.r * 2311 + d * 17) % 65536) - 32768 AS v
  FROM dims, range(0, 260) k(r)
  WHERE k.r < frames * ch)
SELECT d AS doc_id,
       CAST(8000 + (d % 3) * 4000 AS INTEGER) AS sample_rate,
       CAST(MAX(ch) AS INTEGER) AS channels,
       CAST(MAX(frames) AS INTEGER) AS n_frames,
       CAST(SUM(v) AS BIGINT) AS s_sum,
       CAST(MIN(v) AS INTEGER) AS s_min,
       CAST(MAX(v) AS INTEGER) AS s_max
FROM s
GROUP BY d
"""


def q_multimodal_bmp_pixel_stats(spark, sf_dir):
    """REAL BMP pixel-decode round-trip (round 5, third raster format):
    uncompressed 24-bit BMPs with odd widths (row padding on the
    path), BGR disk order, and a top-down/bottom-up storage mix
    (doc_id % 3) — decoded back to RGB and reduced to exact integer
    stats.  The oracle rebuilds every sample from the closed forms;
    a missed row flip, a BGR/RGB swap, or a padding miscount
    hash-mismatches."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    return multimodal.media_pixel_stats(
        multimodal.synth_bmp_pixel_corpus(d))


SQL_BMP_PIXEL_STATS = """
WITH dims AS (
  SELECT doc_id AS d,
         9 + doc_id % 11 AS w,
         8 + (doc_id * 7) % 9 AS h
  FROM documents),
samples AS (
  SELECT d, w, h,
         CASE c.r
              WHEN 0 THEN (x.r + 2 * y.r + d) % 251
              WHEN 1 THEN (3 * x.r + y.r + d) % 251
              ELSE (x.r + y.r + 2 * d) % 251 END AS v
  FROM dims, range(0, 20) x(r), range(0, 17) y(r), range(0, 3) c(r)
  WHERE x.r < w AND y.r < h)
SELECT d AS doc_id,
       CAST(MAX(w) AS INTEGER) AS width,
       CAST(MAX(h) AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       CAST(SUM(v) AS BIGINT) AS px_sum,
       CAST(MIN(v) AS INTEGER) AS px_min,
       CAST(MAX(v) AS INTEGER) AS px_max
FROM samples
GROUP BY d
"""


def q_multimodal_tiff_header_decode(spark, sf_dir):
    """REAL TIFF header decode round-trip (round 5, fifth header
    format): byte-order mark + IFD walk — BIG-endian for odd docs,
    SHORT vs LONG dimension tags cycling doc_id % 4 — so both byte
    orders and both field layouts are parsed on every sweep.  The
    oracle recomputes dims from doc_id; an endianness mix-up or a
    SHORT-read-as-LONG hash-mismatches."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    return multimodal.media_header_meta(multimodal.synth_tiff_corpus(d))


SQL_TIFF_HEADER = """
SELECT doc_id,
       'tiff' AS fmt,
       CAST(1 + (doc_id * 11) % 2048 AS INTEGER) AS width,
       CAST(1 + (doc_id * 19) % 2048 AS INTEGER) AS height,
       CAST(38 AS INTEGER) AS n_bytes
FROM documents
"""


def q_wacz_member_listing(spark, sf_dir):
    """WACZ/ZIP container walk (round 5): per doc a deterministic
    WACZ-shaped ZIP (datapackage.json stored, index.cdx deflated, a
    real WARC member stored/deflated by doc_id parity), exploded to one
    row per central-directory member with method, uncompressed size,
    and whether the payload decoded.  The oracle rebuilds every field
    from doc_id arithmetic — the WARC member's byte count via an exact
    ASCII reconstruction of the record text in SQL — so an off-by-one
    in the directory walk, the local-header skip, or the inflate
    hash-mismatches."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    return warcmod.zip_member_table(warcmod.synth_wacz_corpus(d))


# the WARC member's size is LENGTH of the exact serialized record —
# reconstructable in SQL because every byte is ASCII arithmetic
SQL_WACZ_MEMBERS = r"""
WITH base AS (
  SELECT doc_id AS d,
         'wacz page ' || CAST(doc_id AS VARCHAR) || ' body '
           || CAST(doc_id % 13 AS VARCHAR) AS body,
         chr(13) || chr(10) AS crlf
  FROM documents),
payload AS (
  SELECT d, crlf,
         'HTTP/1.1 200 OK' || crlf
         || 'Content-Type: text/html; charset=utf-8' || crlf
         || 'Content-Length: ' || CAST(LENGTH(body) AS VARCHAR)
         || crlf || crlf || body AS p
  FROM base),
rec AS (
  SELECT d,
         'WARC/1.0' || crlf
         || 'WARC-Type: response' || crlf
         || 'WARC-Target-URI: https://w' || CAST(d % 7 AS VARCHAR)
         || '.example/p/' || CAST(d AS VARCHAR) || crlf
         || 'WARC-Date: 2024-01-01T00:00:00Z' || crlf
         || 'Content-Type: application/http; msgtype=response' || crlf
         || 'Content-Length: ' || CAST(LENGTH(p) AS VARCHAR)
         || crlf || crlf || p || crlf || crlf AS r
  FROM payload)
SELECT d AS doc_id,
       CAST(m.r AS INTEGER) AS member_idx,
       CASE m.r WHEN 0 THEN 'datapackage.json'
                WHEN 1 THEN 'indexes/index.cdx'
                ELSE 'archive/pages-' || CAST(d AS VARCHAR) || '.warc'
       END AS name,
       CAST(CASE m.r WHEN 0 THEN 0 WHEN 1 THEN 8
                     ELSE (d % 2) * 8 END AS INTEGER) AS method,
       CAST(CASE m.r
            WHEN 0 THEN 27
            WHEN 1 THEN LENGTH('cdx entry ' || CAST(d AS VARCHAR)) + 1
            ELSE LENGTH(rec.r) END AS INTEGER) AS n_bytes,
       TRUE AS decoded
FROM rec, range(0, 3) m(r)
"""


def q_wacz_warc_extract(spark, sf_dir):
    """The full WACZ ingestion chain in one Arrow-batched pass: ZIP
    central-directory walk -> member inflate -> WARC record parse ->
    HTTP response split — three real container parsers composed, one
    row per response record.  The oracle rebuilds url and body text
    from doc_id arithmetic; a break anywhere in the chain (directory
    offsets, raw-deflate window, WARC framing, HTTP header split)
    hash-mismatches."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    return warcmod.wacz_page_table(warcmod.synth_wacz_corpus(d))


SQL_WACZ_EXTRACT = """
SELECT doc_id,
       'https://w' || CAST(doc_id % 7 AS VARCHAR) || '.example/p/'
         || CAST(doc_id AS VARCHAR) AS url,
       'wacz page ' || CAST(doc_id AS VARCHAR) || ' body '
         || CAST(doc_id % 13 AS VARCHAR) AS page_text
FROM documents
"""


def q_multimodal_ico_pixel_stats(spark, sf_dir):
    """REAL ICO (favicon) decode round-trip (round 5): the frame
    container alternates full-PNG (even docs, every scanline filter
    type) and headerless doubled-height DIB (odd docs, AND-mask skip,
    bottom-up BGR), but the gradient closed forms are IDENTICAL — one
    container-agnostic oracle forces both decode paths to agree
    sample-for-sample.  A wrong AND-mask offset, a missed height
    un-doubling, or a PNG filter bug hash-mismatches on exactly one
    parity class."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    return multimodal.media_pixel_stats(multimodal.synth_ico_corpus(d))


SQL_ICO_PIXEL_STATS = """
WITH dims AS (
  SELECT doc_id AS d,
         10 + doc_id % 14 AS w,
         10 + (doc_id * 3) % 11 AS h
  FROM documents),
samples AS (
  SELECT d, w, h,
         CASE c.r
              WHEN 0 THEN (x.r + 2 * y.r + d) % 251
              WHEN 1 THEN (3 * x.r + y.r + d) % 251
              ELSE (x.r + y.r + 2 * d) % 251 END AS v
  FROM dims, range(0, 24) x(r), range(0, 21) y(r), range(0, 3) c(r)
  WHERE x.r < w AND y.r < h)
SELECT d AS doc_id,
       CAST(MAX(w) AS INTEGER) AS width,
       CAST(MAX(h) AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       CAST(SUM(v) AS BIGINT) AS px_sum,
       CAST(MIN(v) AS INTEGER) AS px_min,
       CAST(MAX(v) AS INTEGER) AS px_max
FROM samples
GROUP BY d
"""


def q_pdf_layout_blocks(spark, sf_dir):
    """Layout-aware PDF parse round-trip (the north rule's 'layout
    parse' leg): over the same mixed compressed/raw, literal/hex PDF
    corpus, emit one row per PLACED string with the text-line origin in
    effect — Td/TD cumulative, Tm absolute.  The fixture places line i
    at (72, 700 - 20i), so the oracle rebuilds (line_idx, x, y, text)
    per doc by pure arithmetic; a broken position tracker, a missed
    inflate, or an operand-order bug hash-mismatches."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    return multimodal.pdf_layout_meta(multimodal.synth_pdf_corpus(d))


SQL_PDF_LAYOUT = """
SELECT doc_id,
       CAST(l.r AS INTEGER) AS line_idx,
       CAST(72 AS DOUBLE) AS x,
       CAST(700 - 20 * l.r AS DOUBLE) AS y,
       CASE l.r
            WHEN 0 THEN 'pdf doc ' || CAST(doc_id AS VARCHAR)
                 || ' alpha' || CAST(doc_id % 7 AS VARCHAR)
            ELSE 'beta' || CAST(doc_id % 11 AS VARCHAR)
                 || ' gamma delta' || CAST(doc_id % 5 AS VARCHAR)
       END AS line_text
FROM documents, range(0, 2) l(r)
"""


def q_pdf_flate_text_extract(spark, sf_dir):
    """REAL PDF text extraction round-trip (round 5 — the north rule's
    'PDF/layout parse' leg, now covering the compressed layout that
    dominates real crawls): synthesize a well-formed PDF per doc
    (catalog/pages/page/contents, real xref) whose two text lines are
    pure doc_id arithmetic, Flate-compressing the content stream for
    doc_id % 3 != 2 and leaving it raw otherwise; then extract via the
    latin-1 shadow -> stdlib zlib inflate -> BT/ET text-object pass.
    The oracle rebuilds the expected text by string arithmetic from
    doc_id, identically for both layouts — so a broken inflate path
    (or a regression in the uncompressed path) hash-mismatches on a
    third of the corpus."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    return multimodal.pdf_text_meta(multimodal.synth_pdf_corpus(d))


SQL_PDF_FLATE_TEXT = """
SELECT doc_id,
       'pdf doc ' || CAST(doc_id AS VARCHAR)
         || ' alpha' || CAST(doc_id % 7 AS VARCHAR)
         || ' beta' || CAST(doc_id % 11 AS VARCHAR)
         || ' gamma delta' || CAST(doc_id % 5 AS VARCHAR) AS pdf_text,
       CAST(LENGTH('pdf doc ' || CAST(doc_id AS VARCHAR)
         || ' alpha' || CAST(doc_id % 7 AS VARCHAR)
         || ' beta' || CAST(doc_id % 11 AS VARCHAR)
         || ' gamma delta' || CAST(doc_id % 5 AS VARCHAR))
         AS INTEGER) AS n_chars
FROM documents
"""


# --------------------------------------------------------------------------
# extraction-spec operators over driver tables — genuinely non-SQL
# (Python regex offsets / difflib); verified instead by the pytest golden
# corpus. The driver records rows-only checks for these.

_CYR_SENTENCES = [
    "Тарас Григорович Шевченко писав тут",
    "село Моринці зустрічало гостей",
    "Іван Коваленко прибув до міста",
    "пані Бондаренко виступила з доповіддю",
    "станція Козятин приймала потяги",
    "родина Кравченко мешкала поруч",
    "місто Полтава святкувало",
    "Петро Мельник працював у полі",
    "Олена Ткаченко читала листи",
    "хутір Вишневий стояв на горі",
]


def _docs_with_cyrillic(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    sent = F.element_at(F.array(*[F.lit(s) for s in _CYR_SENTENCES]),
                        (F.col("doc_id") % 10 + 1).cast("int"))
    return d.select("doc_id", F.concat_ws(" ", "text", sent).alias("text2"))


def q_ner_entity_spans(spark, sf_dir):
    from ..functions.udfs import ner_udf
    d = _docs_with_cyrillic(spark, sf_dir)
    empty = F.expr("cast(array() as array<struct<block_id:int,n_chars:int>>)")
    return (d.withColumn("spans", ner_udf(F.col("text2"), empty))
            .select("doc_id", F.explode("spans").alias("s"))
            .select("doc_id", F.col("s.text").alias("entity_text"),
                    F.col("s.label").alias("label"),
                    F.col("s.start").alias("start"), F.col("s.end").alias("end")))


def q_fuzzy_lexicon_matches(spark, sf_dir):
    from ..functions.udfs import make_match_udf
    from ..spec import default_lexicon
    d = _docs_with_cyrillic(spark, sf_dir)
    mu = make_match_udf(default_lexicon())
    return (d.withColumn("m", mu(F.col("text2")))
            .select("doc_id", F.explode("m").alias("m"))
            .select("doc_id", F.col("m.found_text").alias("found_text"),
                    F.col("m.matched_term").alias("matched_term"),
                    F.col("m.word_idx").alias("word_idx")))


def q_extraction_pipeline_metrics(spark, sf_dir):
    """The flagship extraction chain over deterministic fixture pages
    (byte-identical parity proven in tests/test_golden_spark.py).
    Shares the cached packed extraction with the match-report queries
    (packed and staged outputs are value-identical, golden-asserted)."""
    from ..operators.extract import metrics_table
    return (metrics_table(_fixture_enriched(spark, 240))
            .select("url", "success", "kind", "fallback_level",
                    "blocks_detected", "blocks_kept", "entities", "matches"))


def _expected_spec_sqls():
    """DuckDB twins for the spec queries over the fixed Cyrillic
    sentences: expected per-sentence spans/matches are committed literal
    constants (plans/expected_spec.py, drift-guarded by
    tests/test_expected_spec.py); document-level offsets follow from
    ``length(text)+1`` (NER char offsets) / the latin-prefix word count
    (match word_idx).  This makes all three formerly rows-only queries
    value-checkable by the driver's oracle gate."""
    from .expected_spec import match_values_sql, ner_values_sql

    sql_ner = f"""
WITH expected(sid, entity_text, label, rel_start, rel_end) AS (VALUES
{ner_values_sql()}
),
d AS (SELECT doc_id, CAST(doc_id % 10 AS INTEGER) AS sid,
             CAST(length(text) + 1 AS INTEGER) AS base
      FROM documents)
SELECT d.doc_id, e.entity_text, e.label,
       CAST(d.base + e.rel_start AS INTEGER) AS start,
       CAST(d.base + e.rel_end AS INTEGER) AS "end"
FROM d JOIN expected e ON d.sid = e.sid
"""
    sql_match = f"""
WITH expected(sid, found_text, matched_term, rel_idx) AS (VALUES
{match_values_sql()}
),
d AS (SELECT doc_id, CAST(doc_id % 10 AS INTEGER) AS sid,
             CAST(len(regexp_extract_all(text, '\\w+')) AS INTEGER) AS nw
      FROM documents)
SELECT d.doc_id, e.found_text, e.matched_term,
       CAST(d.nw + e.rel_idx AS INTEGER) AS word_idx
FROM d JOIN expected e ON d.sid = e.sid
"""
    return sql_ner, sql_match


def _expected_metrics_sql():
    """VALUES twin of the oracle-computed metrics for the 240-page
    fixture corpus (plans/expected_metrics.py, regenerated only by
    jobs/make_expected.py from the sequential pure-Python oracle)."""
    from .expected_metrics import METRICS_EXPECTED
    from .expected_spec import _sql_str as lit

    rows = ",\n".join(
        f"({lit(url)}, {str(bool(ok)).upper()}, {lit(kind)}, {fl}, {bd}, {bk}, {en}, {ma})"
        for url, ok, kind, fl, bd, bk, en, ma in METRICS_EXPECTED
    )
    return f"""
SELECT url, success, kind,
       CAST(fallback_level AS INTEGER) AS fallback_level,
       CAST(blocks_detected AS INTEGER) AS blocks_detected,
       CAST(blocks_kept AS INTEGER) AS blocks_kept,
       CAST(entities AS INTEGER) AS entities,
       CAST(matches AS INTEGER) AS matches
FROM (VALUES
{rows}
) AS t(url, success, kind, fallback_level, blocks_detected, blocks_kept,
       entities, matches)
"""


def q_doc_bpe_tokens(spark, sf_dir):
    """Real merges-table BPE token counts over the REAL extracted text
    of the 240-page fixture corpus (same cached extraction as the
    metrics/match-report queries).  The estimator twin is
    doc_subword_tokens; this one applies the committed 500-merge table
    via the Arrow-batched encoder in spec/bpe.py."""
    from ..operators.textstats import bpe_token_counts
    return bpe_token_counts(_fixture_enriched(spark, 240),
                            text_col="extracted_text", id_col="url")


def q_doc_unigram_tokens(spark, sf_dir):
    """Unigram-LM token counts over the REAL extracted text of the
    240-page fixture corpus (same cached extraction as the metrics /
    BPE queries), applying the committed 400-piece table via the
    Arrow-batched Viterbi encoder in spec/unigram.py — the
    SentencePiece-family twin of doc_bpe_tokens."""
    from ..operators.unigramlm import unigram_token_counts
    return unigram_token_counts(_fixture_enriched(spark, 240),
                                text_col="extracted_text", id_col="url")


def _expected_unigram_sql():
    """VALUES twin of the oracle-computed unigram token counts
    (expected_unigram.UNIGRAM_EXPECTED — pure-Python Viterbi encode
    over the committed piece table, regenerated only by
    jobs/make_unigram.py)."""
    from .expected_spec import _sql_str as lit
    from .expected_unigram import UNIGRAM_EXPECTED

    rows = ",\n".join(f"({lit(url)}, {n})" for url, n in UNIGRAM_EXPECTED)
    return f"""
SELECT url, CAST(n AS BIGINT) AS n_unigram_tokens
FROM (VALUES
{rows}
) AS t(url, n)
"""


def _expected_bpe_sql():
    """VALUES twin of the oracle-computed BPE counts (expected_metrics
    .BPE_EXPECTED — pure-Python pretokenize+encode over the committed
    merges, regenerated only by jobs/make_expected.py)."""
    from .expected_metrics import BPE_EXPECTED
    from .expected_spec import _sql_str as lit

    rows = ",\n".join(f"({lit(url)}, {n})" for url, n in BPE_EXPECTED)
    return f"""
SELECT url, CAST(n AS BIGINT) AS n_bpe_tokens
FROM (VALUES
{rows}
) AS t(url, n)
"""


SQL_NER_SPANS, SQL_FUZZY_MATCHES = _expected_spec_sqls()
SQL_PIPELINE_METRICS = _expected_metrics_sql()
SQL_BPE_TOKENS = _expected_bpe_sql()
SQL_UNIGRAM_TOKENS = _expected_unigram_sql()


# one cached extraction per (session, corpus size): three registry
# queries (pipeline metrics, match stats, top terms) project from the
# same enriched table, so the UDF chain must run once, not three times
_FIXTURE_ENRICHED: dict[tuple[str, int], DataFrame] = {}


def _fixture_enriched(spark, n_pages: int) -> DataFrame:
    app = spark.sparkContext.applicationId
    key = (app, n_pages)
    df = _FIXTURE_ENRICHED.get(key)
    if df is None:
        # evict entries from other (stopped) sessions — their cached
        # DataFrames are dead JVM references that would otherwise
        # accumulate in a long-lived process cycling Spark sessions
        for k in [k for k in _FIXTURE_ENRICHED if k[0] != app]:
            del _FIXTURE_ENRICHED[k]
        from ..operators.extract import extract_pages
        from ..sources.pages import pages_from_fixtures
        df = extract_pages(pages_from_fixtures(spark, n_pages),
                           mode="arrow").cache()
        _FIXTURE_ENRICHED[key] = df
    return df


def _fixture_matches(spark):
    """Exploded matches table from the 240-page fixture corpus — the
    real domain table the reporting queries aggregate."""
    return (_fixture_enriched(spark, 240)
            .select(F.explode("matches").alias("m"))
            .select("m.found_text", "m.matched_term", "m.confidence"))


def q_match_stats(spark, sf_dir):
    """Match-report twin of SurnameMatcher.get_statistics
    (core/surname_matcher.py:356-402) over the REAL matches table."""
    from ..operators.matchstats import match_stats
    return match_stats(_fixture_matches(spark))


def q_match_top_terms(spark, sf_dir):
    """get_top_surnames twin (core/surname_matcher.py:393-397)."""
    from ..operators.matchstats import match_top_terms
    return match_top_terms(_fixture_matches(spark), n=10)


def q_entity_spans_by_type(spark, sf_dir):
    """Ranked-by-type entity export (core/ner.py:463-476 twin) over the
    fixed-sentence NER spans."""
    from ..operators.matchstats import entity_spans_by_type
    spans = q_ner_entity_spans(spark, sf_dir).withColumn(
        "confidence",
        F.when(F.col("label") == "PERSON", F.lit(0.8)).otherwise(F.lit(0.7)))
    return entity_spans_by_type(spans)


def _matches_values_sql():
    from .expected_metrics import MATCHES_EXPECTED
    from .expected_spec import _sql_str as lit

    rows = ",\n".join(f"({lit(ft)}, {lit(mt)}, {c!r})"
                      for ft, mt, c in MATCHES_EXPECTED)
    return (f"(VALUES\n{rows}\n) AS "
            "m(found_text, matched_term, confidence)")


def _match_report_sqls():
    m = _matches_values_sql()
    stats = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS total_matches,
       CAST(COUNT(DISTINCT matched_term) AS BIGINT) AS unique_terms,
       CAST(COUNT(DISTINCT found_text) AS BIGINT) AS unique_found_texts,
       ROUND(AVG(confidence), 6) AS avg_confidence_r,
       ROUND(MIN(confidence), 6) AS min_confidence_r,
       ROUND(MAX(confidence), 6) AS max_confidence_r,
       CAST(SUM(CASE WHEN confidence >= 0.95 THEN 1 ELSE 0 END) AS BIGINT) AS n_excellent,
       CAST(SUM(CASE WHEN confidence >= 0.9 AND confidence < 0.95 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       CAST(SUM(CASE WHEN confidence >= 0.8 AND confidence < 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
       CAST(SUM(CASE WHEN confidence >= 0.7 AND confidence < 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_acceptable,
       CAST(SUM(CASE WHEN confidence < 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS n_low
FROM {m}
"""
    top = f"""
WITH counts AS (
  SELECT matched_term, CAST(COUNT(*) AS BIGINT) AS n_matches
  FROM {m} GROUP BY matched_term),
ranked AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_matches DESC, matched_term)
              AS INTEGER) AS rank, matched_term, n_matches
  FROM counts)
SELECT rank, matched_term, n_matches FROM ranked WHERE rank <= 10
"""
    return stats, top


SQL_MATCH_STATS, SQL_MATCH_TOP_TERMS = _match_report_sqls()


def _spans_by_type_sql():
    from .expected_spec import ner_values_sql
    return f"""
WITH expected(sid, entity_text, label, rel_start, rel_end) AS (VALUES
{ner_values_sql()}
),
d AS (SELECT doc_id, CAST(doc_id % 10 AS INTEGER) AS sid,
             CAST(length(text) + 1 AS INTEGER) AS base
      FROM documents),
spans AS (
  SELECT d.doc_id, e.entity_text, e.label,
         CAST(d.base + e.rel_start AS INTEGER) AS start,
         CASE WHEN e.label = 'PERSON' THEN 0.8 ELSE 0.7 END AS confidence
  FROM d JOIN expected e ON d.sid = e.sid)
SELECT label,
       CAST(ROW_NUMBER() OVER (PARTITION BY label
            ORDER BY confidence DESC, entity_text, doc_id, start)
            AS INTEGER) AS rank,
       entity_text, ROUND(confidence, 6) AS confidence_r, doc_id, start
FROM spans
"""


SQL_SPANS_BY_TYPE = _spans_by_type_sql()


def q_embedding_topk_lsh(spark, sf_dir):
    """Approximate ANN via random-hyperplane LSH buckets (scale path)."""
    return similarity.lsh_topk(_t(spark, sf_dir, "embeddings"), _QUERY_IDS, k=5)


SQL_TOPK_LSH = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
comp AS (
  SELECT p.p, i.i,
         CAST(concat('0x', substr(md5(concat(CAST(p.p AS VARCHAR), ':',
              CAST(i.i - 1 AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 - 0.5 AS c
  FROM generate_series(0, 7) p(p), generate_series(1, 64) i(i)),
dots AS (
  SELECT e.vec_id, comp.p, SUM(e.v[comp.i] * comp.c) AS d
  FROM e, comp GROUP BY e.vec_id, comp.p),
sigs AS (
  SELECT vec_id, CAST(SUM(CASE WHEN d >= 0 THEN (1 << (7 - p)) ELSE 0 END) AS INTEGER) AS bucket
  FROM dots GROUP BY vec_id),
qs AS (
  SELECT s.vec_id AS query_id, s.bucket, e.v AS qv
  FROM sigs s JOIN e ON e.vec_id = s.vec_id WHERE s.vec_id < 10),
cand AS (
  SELECT q.query_id, s.vec_id, q.qv, e.v AS nv
  FROM qs q
  JOIN sigs s ON s.bucket = q.bucket AND s.vec_id <> q.query_id
  JOIN e ON e.vec_id = s.vec_id),
dots2 AS (
  SELECT query_id, vec_id,
         SUM(qv[i] * nv[i]) AS dot,
         SUM(qv[i] * qv[i]) AS qn,
         SUM(nv[i] * nv[i]) AS nn
  FROM cand, generate_series(1, 64) AS t(i)
  GROUP BY query_id, vec_id),
ranked AS (
  SELECT query_id, vec_id, ROUND(dot / SQRT(qn * nn), 6) AS cosine_r,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY ROUND(dot / SQRT(qn * nn), 6) DESC, vec_id) AS rank
  FROM dots2)
SELECT query_id, rank, vec_id AS neighbor_id, cosine_r FROM ranked WHERE rank <= 5
"""


def q_embedding_topk_ivf(spark, sf_dir):
    """Approximate ANN via IVF inverted lists (the other scale path):
    deterministic coarse centroids, nprobe=2 list probing, exact re-rank."""
    return similarity.ivf_topk(_t(spark, sf_dir, "embeddings"), _QUERY_IDS,
                               k=5, n_centroids=8, nprobe=2)


SQL_TOPK_IVF = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8),
asg0 AS (
  SELECT e.vec_id, c.centroid_id,
         ROUND(SUM(e.v[i] * c.cv[i])
               / SQRT(SUM(e.v[i] * e.v[i]) * SUM(c.cv[i] * c.cv[i])), 6) AS sim_r
  FROM e, c, generate_series(1, 64) AS t(i)
  GROUP BY e.vec_id, c.centroid_id),
asg AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim_r DESC, centroid_id) AS r
    FROM asg0) WHERE r = 1),
qp AS (
  SELECT vec_id AS query_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim_r DESC, centroid_id) AS r
    FROM asg0 WHERE vec_id < 10) WHERE r <= 2),
cand AS (
  SELECT qp.query_id, a.vec_id
  FROM qp JOIN asg a ON a.centroid_id = qp.centroid_id AND a.vec_id <> qp.query_id),
dots AS (
  SELECT cand.query_id, cand.vec_id,
         SUM(q.v[i] * n.v[i]) AS dot,
         SUM(q.v[i] * q.v[i]) AS qn,
         SUM(n.v[i] * n.v[i]) AS nn
  FROM cand
  JOIN e q ON q.vec_id = cand.query_id
  JOIN e n ON n.vec_id = cand.vec_id,
       generate_series(1, 64) AS t(i)
  GROUP BY cand.query_id, cand.vec_id),
ranked AS (
  SELECT query_id, vec_id, ROUND(dot / SQRT(qn * nn), 6) AS cosine_r,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY ROUND(dot / SQRT(qn * nn), 6) DESC, vec_id) AS rank
  FROM dots)
SELECT query_id, rank, vec_id AS neighbor_id, cosine_r FROM ranked WHERE rank <= 5
"""


# --------------------------------------------------------------------------
# web-hygiene (operators.webnorm) + repetition filters (textstats)
#
# The documents table has no URL / PII columns, so these queries first
# synthesize them DETERMINISTICALLY from (doc_id, source) with the SAME
# arithmetic in both engines — the operator under test is the
# canonicalization / redaction that follows, and the value-hash checks
# its real output cell-by-cell.


def _dirty_url_col():
    """Deterministic crawl-style dirty URL: host-case noise (doc_id%7),
    WWW prefix (%13), shared path bucket (%5 — small on purpose: with 20
    sources the canonical key collapses to ~tens of groups, so cleanup
    produces real cross-doc collisions at every sf), trailing slash
    (%11), utm tracking / ref params (%3), fragment (%5)."""
    d = F.col("doc_id")
    host = F.when(d % 7 == 0, F.upper("source")).otherwise(F.col("source"))
    www = F.when(d % 13 == 0, F.lit("WWW.")).otherwise(F.lit(""))
    path = F.concat(F.lit("/articles/"), (d % 5).cast("string"))
    slash = F.when(d % 11 == 0, F.lit("/")).otherwise(F.lit(""))
    q = (F.when(d % 3 == 0, F.concat(F.lit("?utm_source=feed&utm_campaign=c"),
                                     (d % 5).cast("string")))
         .when(d % 3 == 1, F.concat(F.lit("?ref=r"), (d % 4).cast("string"),
                                    F.lit("&utm_medium=social")))
         .otherwise(F.lit("")))
    frag = F.when(d % 5 == 0, F.concat(F.lit("#sec"), (d % 3).cast("string"))) \
            .otherwise(F.lit(""))
    return F.concat(F.lit("HTTPS://"), www, host, F.lit(".Example.org"),
                    path, slash, q, frag)


_SQL_DIRTY_URL = """
    'HTTPS://'
    || CASE WHEN doc_id % 13 = 0 THEN 'WWW.' ELSE '' END
    || CASE WHEN doc_id % 7 = 0 THEN upper(source) ELSE source END
    || '.Example.org'
    || '/articles/' || CAST(doc_id % 5 AS VARCHAR)
    || CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END
    || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&utm_campaign=c' || CAST(doc_id % 5 AS VARCHAR)
            WHEN doc_id % 3 = 1 THEN '?ref=r' || CAST(doc_id % 4 AS VARCHAR) || '&utm_medium=social'
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN '#sec' || CAST(doc_id % 3 AS VARCHAR) ELSE '' END
"""


def _blocklist_host_col():
    """Deterministic multi-parent host for the blocklist fixture: four
    parent-domain families by doc_id%4 so suffix matching exercises
    parent-domain blocks, exact-host blocks, and misses at every sf
    (the canonical-dedup dirty host has ONE parent, .example.org, which
    a suffix list could only block all-or-nothing).  Three of the four
    branches carry host noise (mixed case, :port) so the fold-before-
    match contract (webnorm.folded_host) is exercised, not just the
    clean path."""
    d, s = F.col("doc_id"), F.col("source")
    return (F.when(d % 4 == 0, F.concat(s, F.lit(".Ads.Example")))
            .when(d % 4 == 1, F.concat(s, F.lit(".example.net:8443")))
            .when(d % 4 == 2, F.concat(F.lit("CDN."), s,
                                       F.lit(".pages.dev")))
            .otherwise(F.concat(s, F.lit(".blog.example.net"))))


_SQL_BLOCKLIST_HOST = """
    CASE WHEN doc_id % 4 = 0 THEN source || '.Ads.Example'
         WHEN doc_id % 4 = 1 THEN source || '.example.net:8443'
         WHEN doc_id % 4 = 2 THEN 'CDN.' || source || '.pages.dev'
         ELSE source || '.blog.example.net' END
"""

# parent-domain block (all of d%4==0), exact-host blocks (one source
# each), and a never-matching entry — covers every suffix-match case
_HOST_BLOCKLIST = ("ads.example", "src3.example.net",
                   "cdn.src5.pages.dev", "blog.example.net", "tracker.io")


def q_url_host_blocklist(spark, sf_dir):
    """UT1-style domain blocklist gate (webnorm.host_blocklist_filter):
    host equals OR sits under a blocklisted domain.  Scale shape is an
    equi-join, never a per-row list scan: bounded dot-suffix explode
    (<= label count) + broadcast join on the suffix + one partial-agg
    shuffle back to (doc_id, host).  Real lists (UT1) hold millions of
    entries — the join survives that; an in-plan literal would not."""
    pages = (_t(spark, sf_dir, "documents")
             .select("doc_id", _blocklist_host_col().alias("host")))
    bl = spark.createDataFrame(
        [(e,) for e in webnorm.validated_blocklist(_HOST_BLOCKLIST)],
        "entry string")
    return webnorm.host_blocklist_filter(pages, bl)


SQL_URL_HOST_BLOCKLIST = """
WITH hosts0 AS (
  SELECT doc_id, __HOST__ AS host FROM documents),
hosts AS (
  SELECT doc_id, host, __FOLDED__ AS fhost FROM hosts0),
suf AS (
  SELECT doc_id, host, u.s AS suffix
  FROM hosts, UNNEST(list_transform(
      generate_series(1, len(string_split(fhost, '.'))),
      i -> array_to_string(list_slice(string_split(fhost, '.'), i,
                                      len(string_split(fhost, '.'))), '.')
  )) AS u(s)),
bl(entry) AS (SELECT * FROM (VALUES __ENTRIES__)),
agg AS (
  SELECT doc_id, host,
         MIN(CASE WHEN b.entry IS NOT NULL THEN suffix END)
           AS matched_suffix
  FROM suf LEFT JOIN bl b ON suf.suffix = b.entry
  GROUP BY doc_id, host)
SELECT doc_id, host, matched_suffix,
       matched_suffix IS NOT NULL AS blocked
FROM agg
""".replace("__HOST__", _SQL_BLOCKLIST_HOST).replace(
    "__FOLDED__", webnorm.FOLDED_HOST_SQL.format(col="host")).replace(
    "__ENTRIES__", ", ".join(
        f"('{e}')" for e in webnorm.validated_blocklist(_HOST_BLOCKLIST)))


def q_host_diversity_stats(spark, sf_dir):
    """Corpus-concentration report (webnorm.host_diversity_stats): per
    lang, the doc count, distinct-host count, top-host share, and host
    Shannon entropy — the health numbers that prove a curated corpus is
    not secretly one megahost.  Share is pure integer division; entropy
    micro-fixes each host's -(p)ln(p) term before summing (the repo's
    cross-engine float idiom).  One partial-agg shuffle on (lang, host);
    the window + final agg run on the collapsed <= |langs|x|hosts|
    table."""
    pages = (_t(spark, sf_dir, "documents")
             .select("lang",
                     webnorm.canonical_host(_dirty_url_col()).alias("host")))
    return webnorm.host_diversity_stats(pages)


SQL_HOST_DIVERSITY = """
WITH hosts AS (
  SELECT lang, __CANON_HOST__ AS host
  FROM documents),
counts AS (
  SELECT lang, host, COUNT(*) AS c FROM hosts GROUP BY lang, host),
tot AS (
  SELECT lang, SUM(c) AS n, COUNT(*) AS n_hosts, MAX(c) AS max_c
  FROM counts GROUP BY lang),
ent AS (
  SELECT counts.lang,
         SUM(CAST(floor(-((c * 1.0 / n) * ln(c * 1.0 / n)) * 1000000)
                  AS BIGINT)) AS e
  FROM counts JOIN tot USING (lang) GROUP BY counts.lang)
SELECT t.lang, CAST(t.n AS BIGINT) AS n_docs,
       CAST(t.n_hosts AS BIGINT) AS n_hosts,
       CAST(t.max_c * 1000000 // t.n AS BIGINT) AS top_host_share_micro,
       CAST(e.e AS BIGINT) AS host_entropy_micro
FROM tot t JOIN ent e USING (lang)
""".replace("__CANON_HOST__",
            webnorm.CANONICAL_HOST_SQL.format(col="__DIRTY__")).replace(
    "__DIRTY__", "(" + _SQL_DIRTY_URL + ")")


def _linkpage_html_col():
    """Deterministic anchor soup for the link-graph fixture: absolute
    links in both quote styles (one uppercase HREF — case-insensitive
    matching exercised), a per-source CDN target, a conditional repeat
    (n_links > 1 exercised), a relative link and an ftp link (both
    must be dropped)."""
    d, s, lang = F.col("doc_id"), F.col("source"), F.col("lang")
    return F.concat(
        F.lit('<p><a href="https://hub.example/h/'), lang,
        F.lit('">hub</a> <a href=\'http://WWW.Partner.Example/p\'>x</a> '),
        F.lit('<A HREF="https://cdn.'), s, F.lit('.assets.example/js">y</A> '),
        F.lit('<a href="/local/1">rel</a> '),
        F.when(d % 3 == 0,
               F.concat(F.lit('<a href="https://hub.example/h/'), lang,
                        F.lit('">again</a> ')))
         .otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit('<a href="ftp://files.example/f">f</a>'))
         .otherwise(F.lit("")),
        F.lit("</p>"))


_SQL_LINKPAGE_HTML = """
    '<p><a href="https://hub.example/h/' || lang
    || '">hub</a> <a href=''http://WWW.Partner.Example/p''>x</a> '
    || '<A HREF="https://cdn.' || source || '.assets.example/js">y</A> '
    || '<a href="/local/1">rel</a> '
    || CASE WHEN doc_id % 3 = 0 THEN '<a href="https://hub.example/h/'
            || lang || '">again</a> ' ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN '<a href="ftp://files.example/f">f</a>' ELSE '' END
    || '</p>'
"""


def q_host_link_graph(spark, sf_dir):
    """Crawl link-graph construction (webnorm.outlink_host_edges):
    href regexp at scan speed, bounded explode per page's anchor
    count, ONE corpus-wide exchange — the partial-agg groupBy on
    (src_host, dst_host), which collapses to host-pair cardinality.
    Hosts canonicalized on both ends; relative and non-http links
    dropped.  The edge table feeds graphrank.pagerank for host
    ranking (graph_pagerank pins that iteration on the trade twin)."""
    pages = (_t(spark, sf_dir, "documents")
             .select(_dirty_url_col().alias("url"),
                     _linkpage_html_col().alias("html")))
    return webnorm.outlink_host_edges(pages)


# shared CTE block: fixture pages -> href explode -> absolute links
# with canonical hosts on both ends (the link-graph and host-pagerank
# twins both start here)
_SQL_HOST_EDGES = f"""
pages AS (
  SELECT ({_SQL_DIRTY_URL}) AS url, ({_SQL_LINKPAGE_HTML}) AS html
  FROM documents),
links AS (
  SELECT {webnorm.CANONICAL_HOST_SQL.format(col="url")} AS src_host,
         u.l AS link
  FROM pages, UNNEST({webnorm.HREF_EXTRACT_SQL.format(col="html")})
       AS u(l)),
abs_links AS (
  SELECT src_host,
         {webnorm.CANONICAL_HOST_SQL.format(col="link")} AS dst_host
  FROM links
  WHERE regexp_matches(link, '(?i)^https?://') AND src_host <> '')"""

SQL_HOST_LINK_GRAPH = f"""
WITH {_SQL_HOST_EDGES}
SELECT src_host, dst_host, COUNT(*) AS n_links
FROM abs_links WHERE dst_host <> '' GROUP BY 1, 2
"""


def q_host_pagerank(spark, sf_dir):
    """Host authority ranking end-to-end: the crawl link graph
    (webnorm.outlink_host_edges) symmetrized and fed to
    graphrank.pagerank — the full crawl-prioritization composition,
    real anchors in, per-host rank out.  Symmetrized (co-link
    authority) so the fixed-budget iteration is the same no-dangling
    shape as the trade twin; the directed variant runs the same
    operator unchanged (pagerank redistributes dangling mass).  Hosts
    become node ids via the md5 _h32 family — a pure function, so no
    id-assignment join; at production host counts you would map hosts
    through a dense dimension instead of a 32-bit hash (collision odds
    here: ~50 hosts vs 2^32)."""
    pages = (_t(spark, sf_dir, "documents")
             .select(_dirty_url_col().alias("url"),
                     _linkpage_html_col().alias("html")))
    # materialize the aggregated edge table ONCE: sym embeds it twice
    # (the union's two branches) and names reads it again — without
    # this the page scan + href explode would re-execute per consumer
    e = webnorm.outlink_host_edges(pages).localCheckpoint(eager=True)
    sym = e.unionByName(
        e.select(F.col("dst_host").alias("src_host"),
                 F.col("src_host").alias("dst_host"), "n_links"))
    hid = lambda c: dedup._h32(F.col(c), seed="hostpr")  # noqa: E731
    pr = graphrank.pagerank(
        sym.select(hid("src_host").alias("src"),
                   hid("dst_host").alias("dst"),
                   F.col("n_links").cast("double").alias("weight")),
        d=0.85, n_iter=6)
    names = (sym.select(F.col("src_host").alias("host")).distinct()
             .withColumn("node", hid("host")))
    return (pr.join(names, "node")
            .select("host", F.round("pr_rank", 6).alias("pr_rank_r")))


_SQL_HOST_ID = ("CAST(concat('0x', substr(md5('hostpr:' || {col}), 1, 8))"
                " AS BIGINT)")

SQL_HOST_PAGERANK = (f"""
WITH {_SQL_HOST_EDGES},
hedges AS (
  SELECT src_host, dst_host, CAST(COUNT(*) AS DOUBLE) AS w
  FROM abs_links WHERE dst_host <> '' GROUP BY 1, 2),
edges0 AS (
  SELECT {_SQL_HOST_ID.format(col="src_host")} AS src,
         {_SQL_HOST_ID.format(col="dst_host")} AS dst, w
  FROM hedges),
edges AS (
  SELECT src, dst, w FROM edges0
  UNION ALL
  SELECT dst AS src, src AS dst, w FROM edges0),
outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
ne AS (SELECT e.src, e.dst, e.w / o.ow AS share
       FROM edges e JOIN outw o ON e.src = o.src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes),
""" + "".join(_SQL_PR_ITER.format(i=i, prev=i - 1) for i in range(1, 7)) +
f"""fin AS (SELECT node, pr FROM pr6),
names AS (
  SELECT DISTINCT host, {_SQL_HOST_ID.format(col="host")} AS node
  FROM (SELECT src_host AS host FROM hedges
        UNION SELECT dst_host FROM hedges))
SELECT n.host, ROUND(f.pr, 6) AS pr_rank_r
FROM fin f JOIN names n USING (node)
""")


def q_corpus_snapshot_drift(spark, sf_dir):
    """Snapshot-over-snapshot drift report — the diff the health-report
    job's tables exist for: per lang, doc/token counts of the previous
    snapshot vs the current one plus their deltas and the count of
    hosts that are NEW this snapshot (the drift alarm for a spam-host
    influx).  The previous snapshot is synthesized deterministically as
    the even-doc_id half of the corpus (every lang keeps members at
    every sf, and langs appearing/vanishing still work: the lang join
    is FULL outer with zero-coalesced sides).

    Scale shape: both snapshots collapse to per-(lang[,host]) partial
    aggs before anything joins — the joins carry |langs| and |hosts|
    rows, never documents; the new-host probe is a left_anti on the
    collapsed host sets."""
    d = (_t(spark, sf_dir, "documents")
         .select("doc_id", "lang",
                 dedup.token_count("text").cast("long").alias("_tok"),
                 webnorm.canonical_host(_dirty_url_col()).alias("_host")))
    base = d.where(F.col("doc_id") % 2 == 0)

    def per_lang(df, sfx):
        return df.groupBy("lang").agg(
            F.count("*").alias(f"n_docs_{sfx}"),
            F.sum("_tok").alias(f"n_tokens_{sfx}"))

    hosts_head = d.select("lang", "_host").distinct()
    hosts_base = base.select("lang", "_host").distinct()
    # subtract (EXCEPT DISTINCT), not left_anti: NULL-safe set semantics
    # matching the DuckDB twin's EXCEPT — a NULL host/lang present in
    # both snapshots must not be counted as new (same idiom as
    # nation_set_ops)
    new_hosts = (hosts_head.subtract(hosts_base)
                 .groupBy("lang").agg(F.count("*").alias("n_new_hosts")))
    out = (per_lang(d, "head").join(per_lang(base, "base"), "lang", "full")
           .join(new_hosts, "lang", "left"))
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")  # noqa: E731
    return out.select(
        "lang",
        z("n_docs_base").alias("n_docs_base"),
        z("n_docs_head").alias("n_docs_head"),
        (z("n_docs_head") - z("n_docs_base")).alias("docs_delta"),
        z("n_tokens_base").alias("n_tokens_base"),
        z("n_tokens_head").alias("n_tokens_head"),
        (z("n_tokens_head") - z("n_tokens_base")).alias("tokens_delta"),
        z("n_new_hosts").alias("n_new_hosts"))


SQL_SNAPSHOT_DRIFT = f"""
WITH d AS (
  SELECT doc_id, lang,
         CASE WHEN text IS NULL THEN 0
              ELSE len({dedup.WORD_ARRAY_SQL.format(col="text")}) END AS tok,
         {{CANON}} AS host
  FROM documents),
head AS (
  SELECT lang, COUNT(*) AS n_docs_head,
         CAST(SUM(tok) AS BIGINT) AS n_tokens_head
  FROM d GROUP BY lang),
base AS (
  SELECT lang, COUNT(*) AS n_docs_base,
         CAST(SUM(tok) AS BIGINT) AS n_tokens_base
  FROM d WHERE doc_id % 2 = 0 GROUP BY lang),
nh AS (
  SELECT lang, COUNT(*) AS n_new_hosts FROM (
    SELECT DISTINCT lang, host FROM d
    EXCEPT
    SELECT DISTINCT lang, host FROM d WHERE doc_id % 2 = 0)
  GROUP BY lang),
merged AS (
  SELECT COALESCE(h.lang, b.lang) AS lang,
         n_docs_base, n_docs_head, n_tokens_base, n_tokens_head
  FROM head h FULL OUTER JOIN base b ON h.lang = b.lang)
SELECT m.lang,
       CAST(COALESCE(n_docs_base, 0) AS BIGINT) AS n_docs_base,
       CAST(COALESCE(n_docs_head, 0) AS BIGINT) AS n_docs_head,
       CAST(COALESCE(n_docs_head, 0) - COALESCE(n_docs_base, 0) AS BIGINT)
         AS docs_delta,
       CAST(COALESCE(n_tokens_base, 0) AS BIGINT) AS n_tokens_base,
       CAST(COALESCE(n_tokens_head, 0) AS BIGINT) AS n_tokens_head,
       CAST(COALESCE(n_tokens_head, 0) - COALESCE(n_tokens_base, 0)
            AS BIGINT) AS tokens_delta,
       CAST(COALESCE(n_new_hosts, 0) AS BIGINT) AS n_new_hosts
FROM merged m LEFT JOIN nh ON m.lang = nh.lang
""".replace("{CANON}", webnorm.CANONICAL_HOST_SQL.format(
    col="(" + _SQL_DIRTY_URL + ")"))


def q_url_canonical_dedup(spark, sf_dir):
    """Crawl URL canonicalization + dedup: strip tracking params /
    fragments / host case / www / trailing slash, then group by the
    canonical form.  The web-tier first-pass dedup that removes the
    bulk of exact duplicates before any content hashing — one
    partial-agg shuffle on the canonical string, scan reads only
    (doc_id, source)."""
    pages = (_t(spark, sf_dir, "documents")
             .select("doc_id", _dirty_url_col().alias("url")))
    return webnorm.url_dedup_groups(pages)


# the canonical_url CTE chain: expects a prior CTE raw(doc_id, url)
# (ONLY those two columns survive — the chain projects (doc_id, url)
# explicitly, so twins needing extra raw columns re-join on doc_id) and yields
# canon(doc_id, url, canonical_url) — THE one SQL mirror of
# webnorm.canonical_url, shared by every twin that canonicalizes
_SQL_CANON_CTES = """defrag AS (
  SELECT doc_id, url, regexp_extract(url, '^([^#]*)', 1) AS u FROM raw),
parts AS (
  SELECT doc_id, url,
         lower(regexp_extract(u, '^([A-Za-z]+)://', 1)) AS scheme,
         __CANON_HOST_U__ AS host,
         regexp_replace(regexp_extract(u, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
                        '/$', '') AS path,
         regexp_extract(u, '\\?(.*)', 1) AS query
  FROM defrag),
kept AS (
  SELECT doc_id, url, scheme, host, path,
         COALESCE(array_to_string(list_sort(list_filter(string_split(query, '&'),
             p -> NOT starts_with(p, 'utm_') AND p <> '')), '&'), '') AS kq
  FROM parts),
canon AS (
  SELECT doc_id, url,
         scheme || '://' || host || path
         || CASE WHEN kq = '' THEN '' ELSE '?' || kq END AS canonical_url
  FROM kept)""".replace("__CANON_HOST_U__",
                        webnorm.CANONICAL_HOST_SQL.format(col="u"))

SQL_URL_CANONICAL = f"""
WITH raw AS (
  SELECT doc_id, __DIRTY__ AS url FROM documents),
{_SQL_CANON_CTES}
SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_variants,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_distinct_raw,
       MIN(doc_id) AS keeper_doc_id
FROM canon GROUP BY canonical_url
""".replace("__DIRTY__", _SQL_DIRTY_URL)


def _canonpage_html_col():
    """Markup fixture for declared-canonical dedup: rel-then-href and
    HREF-then-REL (uppercase, single quotes) both declaring the shared
    article target, a relative canonical (must fall back), and a page
    with no link element (must fall back)."""
    d = F.col("doc_id")
    art = F.concat(F.lit("https://example.org/articles/"),
                   (d % 5).cast("string"))
    return (F.when(d % 4 == 0, F.concat(
                F.lit('<html><head><link rel="canonical" href="'), art,
                F.lit('"></head><body>x</body></html>')))
            .when(d % 4 == 1, F.concat(
                F.lit("<html><head><LINK HREF='"), art,
                F.lit("' REL='canonical'></head></html>")))
            .when(d % 4 == 2, F.lit(
                '<head><link rel="canonical" href="/articles/rel"></head>'))
            .otherwise(F.lit("<html><body>no link</body></html>")))


_SQL_CANONPAGE_HTML = """
    CASE WHEN doc_id % 4 = 0
           THEN '<html><head><link rel="canonical" href="'
                || 'https://example.org/articles/' || CAST(doc_id % 5 AS VARCHAR)
                || '"></head><body>x</body></html>'
         WHEN doc_id % 4 = 1
           THEN '<html><head><LINK HREF='''
                || 'https://example.org/articles/' || CAST(doc_id % 5 AS VARCHAR)
                || ''' REL=''canonical''></head></html>'
         WHEN doc_id % 4 = 2
           THEN '<head><link rel="canonical" href="/articles/rel"></head>'
         ELSE '<html><body>no link</body></html>' END
"""


def q_canonical_link_dedup(spark, sf_dir):
    """Dedup by the DECLARED canonical (webnorm.canonical_link_dedup):
    pages declaring a ``<link rel=canonical>`` collapse onto the
    declared target (either attribute order); relative/absent
    declarations fall back to the canonicalized fetch URL.  The
    web-native collapse URL normalization alone cannot make.  Regexp
    extraction at scan speed; ONE exchange — the partial-agg groupBy
    on the canonical string."""
    pages = (_t(spark, sf_dir, "documents")
             .select("doc_id", _dirty_url_col().alias("url"),
                     _canonpage_html_col().alias("html")))
    return webnorm.canonical_link_dedup(pages)


def _sql_canonical_link_dedup() -> str:
    """Twin of webnorm.canonical_link_dedup with the regex literals
    rendered from the SAME webnorm constants the Spark side compiles
    (single definition, two engines — the metadata-twin contract)."""
    from .expected_spec import _sql_str as lit
    from ..operators import webnorm as w

    return f"""
WITH base AS (
  SELECT doc_id, ({_SQL_DIRTY_URL}) AS durl, ({_SQL_CANONPAGE_HTML}) AS html
  FROM documents),
decl AS (
  SELECT doc_id, durl,
         CASE WHEN regexp_extract(html, {lit(w.CANONICAL_REL_HREF)}, 1) <> ''
              THEN regexp_extract(html, {lit(w.CANONICAL_REL_HREF)}, 1)
              ELSE regexp_extract(html, {lit(w.CANONICAL_HREF_REL)}, 1)
              END AS link
  FROM base),
raw AS (
  SELECT doc_id,
         CASE WHEN regexp_matches(link, '(?i)^https?://') THEN link
              ELSE durl END AS url,
         CASE WHEN regexp_matches(link, '(?i)^https?://') THEN 1
              ELSE 0 END AS declared
  FROM decl),
{_SQL_CANON_CTES}
SELECT c.canonical_url, CAST(COUNT(*) AS BIGINT) AS n_variants,
       CAST(SUM(r.declared) AS BIGINT) AS n_declared,
       MIN(c.doc_id) AS keeper_doc_id
FROM canon c JOIN raw r ON c.doc_id = r.doc_id
GROUP BY c.canonical_url
"""


SQL_CANONICAL_LINK_DEDUP = _sql_canonical_link_dedup()


def _metapage_html_col():
    """Markup fixture for HTML-metadata extraction: og:title beating a
    site-suffixed <title> (and a reversed-attribute uppercase og
    variant), a whitespace-wrapped bare title, a title + meta
    description, a robots-noindex page, and an untitled page.  Titles
    keyed doc_id % 7 so (host, title) dup groups form at every sf."""
    d = F.col("doc_id")
    t = F.concat(F.lit("Story "), (d % 7).cast("string"))
    return (F.when(d % 6 == 0, F.concat(
                F.lit("<head><title>Site | "), t,
                F.lit('</title><meta property="og:title" content="'), t,
                F.lit('"></head>')))
            .when(d % 6 == 1, F.concat(
                F.lit("<META CONTENT='"), t,
                F.lit("' PROPERTY='og:title'>")))
            .when(d % 6 == 2, F.concat(
                F.lit("<title>  "), t, F.lit("  </title>")))
            .when(d % 6 == 3, F.concat(
                F.lit("<title>"), t,
                F.lit('</title><meta name="description" content=" Desc  for '),
                (d % 3).cast("string"), F.lit(' ">')))
            .when(d % 6 == 4, F.concat(
                F.lit("<title>"), t,
                F.lit("</title><meta name='robots'"
                      " content='noindex,follow'>")))
            .otherwise(F.lit("<html><body>untitled</body></html>")))


_SQL_METAPAGE_HTML = """
    CASE WHEN doc_id % 6 = 0
           THEN '<head><title>Site | Story ' || CAST(doc_id % 7 AS VARCHAR)
                || '</title><meta property="og:title" content="Story '
                || CAST(doc_id % 7 AS VARCHAR) || '"></head>'
         WHEN doc_id % 6 = 1
           THEN '<META CONTENT=''Story ' || CAST(doc_id % 7 AS VARCHAR)
                || ''' PROPERTY=''og:title''>'
         WHEN doc_id % 6 = 2
           THEN '<title>  Story ' || CAST(doc_id % 7 AS VARCHAR)
                || '  </title>'
         WHEN doc_id % 6 = 3
           THEN '<title>Story ' || CAST(doc_id % 7 AS VARCHAR)
                || '</title><meta name="description" content=" Desc  for '
                || CAST(doc_id % 3 AS VARCHAR) || ' ">'
         WHEN doc_id % 6 = 4
           THEN '<title>Story ' || CAST(doc_id % 7 AS VARCHAR)
                || '</title><meta name=''robots'' content=''noindex,follow''>'
         ELSE '<html><body>untitled</body></html>' END
"""

# ws-normalize mirror of webnorm._norm_ws (format with col=...)
_SQL_NORM_WS = r"trim(regexp_replace({col}, '\s+', ' ', 'g'))"


def _sql_metadata_ctes() -> str:
    """Shared CTE chain for the two metadata twins: fixture pages ->
    per-doc (host, title, has_og_title, description, noindex).  Every
    regex literal is rendered from the SAME webnorm pattern constants
    the Spark side compiles (single definition, two engines)."""
    from .expected_spec import _sql_str as lit
    from ..operators import webnorm as w

    host = w.CANONICAL_HOST_SQL.format(col="url")
    og = (f"CASE WHEN regexp_extract(html, {lit(w.OG_TITLE_PROP_CONTENT)},"
          f" 1) <> '' THEN regexp_extract(html,"
          f" {lit(w.OG_TITLE_PROP_CONTENT)}, 1)"
          f" ELSE regexp_extract(html, {lit(w.OG_TITLE_CONTENT_PROP)}, 1)"
          f" END")
    desc = (f"CASE WHEN regexp_extract(html,"
            f" {lit(w.META_DESC_NAME_CONTENT)}, 1) <> ''"
            f" THEN regexp_extract(html, {lit(w.META_DESC_NAME_CONTENT)}, 1)"
            f" ELSE regexp_extract(html,"
            f" {lit(w.META_DESC_CONTENT_NAME)}, 1) END")
    title_tag = f"regexp_extract(html, {lit(w.TITLE_PATTERN)}, 1)"
    noindex = (f"(regexp_matches(html, {lit(w.ROBOTS_NOINDEX_NAME_CONTENT)})"
               f" OR regexp_matches(html,"
               f" {lit(w.ROBOTS_NOINDEX_CONTENT_NAME)}))")
    return f"""base AS (
  SELECT doc_id, ({_SQL_DIRTY_URL}) AS url, ({_SQL_METAPAGE_HTML}) AS html
  FROM documents),
raw_meta AS (
  SELECT doc_id, {host} AS host,
         {_SQL_NORM_WS.format(col=og)} AS og_n,
         {_SQL_NORM_WS.format(col=title_tag)} AS title_n,
         {_SQL_NORM_WS.format(col=desc)} AS description,
         {noindex} AS noindex
  FROM base),
meta AS (
  SELECT doc_id, host,
         CASE WHEN og_n <> '' THEN og_n ELSE title_n END AS title,
         og_n <> '' AS has_og_title, description, noindex
  FROM raw_meta)"""


def q_doc_html_metadata(spark, sf_dir):
    """Per-page HTML metadata extraction (webnorm.html_metadata):
    effective title (og:title wins, both attribute orders), meta
    description, robots-noindex compliance flag.  Pure regexp at scan
    speed — narrow, ZERO exchanges; the extraction-side analog of the
    reference's ALTO Description header (core/pipeline.py:423-427)."""
    pages = (_t(spark, sf_dir, "documents")
             .select("doc_id", _dirty_url_col().alias("url"),
                     _metapage_html_col().alias("html")))
    return webnorm.html_metadata(pages)


SQL_DOC_HTML_METADATA = f"""
WITH {_sql_metadata_ctes()}
SELECT doc_id, host, title, has_og_title, description, noindex FROM meta
"""


def q_title_dup_groups(spark, sf_dir):
    """Title-based near-dup groups (webnorm.title_dup_groups): pages on
    one host sharing a normalized effective title — republication
    variants URL canonicalization and declared-canonical both miss.
    noindex and empty titles excluded BEFORE the one partial-agg
    exchange on (host, title); only real groups (n_docs >= 2) emitted."""
    pages = (_t(spark, sf_dir, "documents")
             .select("doc_id", _dirty_url_col().alias("url"),
                     _metapage_html_col().alias("html")))
    return webnorm.title_dup_groups(pages)


SQL_TITLE_DUP_GROUPS = f"""
WITH {_sql_metadata_ctes()}
SELECT host, title, CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS keeper_doc_id
FROM meta WHERE NOT noindex AND title <> ''
GROUP BY host, title HAVING COUNT(*) >= 2
"""


def _anchorpage_html_col():
    """Anchor soup for the anchor-text fixture: multi-word texts in
    both quote styles (one uppercase HREF + host-case variant, double
    internal space — tokenizer ws-collapse exercised), a relative link
    (dropped), a conditional lang-keyed hub anchor, an empty-text
    anchor and a nested-markup anchor (both contribute no terms)."""
    d, s, lang = F.col("doc_id"), F.col("source"), F.col("lang")
    return F.concat(
        F.lit('<nav><a href="https://docs.'), s,
        F.lit('.example/guide">Getting Started Guide</a> '),
        F.lit("<A HREF='https://Docs."), s,
        F.lit(".example/api'>API  Reference</A> "),
        F.lit('<a href="/rel/'), (d % 5).cast("string"),
        F.lit('">local nav</a> '),
        F.when(d % 3 == 0,
               F.concat(F.lit('<a href="https://hub.example/t">read the '),
                        lang, F.lit(" guide</a> ")))
         .otherwise(F.lit("")),
        F.when(d % 4 == 0,
               F.lit('<a href="https://other.example/e"></a> '))
         .otherwise(F.lit("")),
        F.when(d % 7 == 0,
               F.lit('<a href="https://other.example/b"><b>x</b></a> '))
         .otherwise(F.lit("")),
        F.lit("</nav>"))


_SQL_ANCHORPAGE_HTML = """
    '<nav><a href="https://docs.' || source
    || '.example/guide">Getting Started Guide</a> '
    || '<A HREF=''https://Docs.' || source
    || '.example/api''>API  Reference</A> '
    || '<a href="/rel/' || CAST(doc_id % 5 AS VARCHAR) || '">local nav</a> '
    || CASE WHEN doc_id % 3 = 0
            THEN '<a href="https://hub.example/t">read the ' || lang
                 || ' guide</a> ' ELSE '' END
    || CASE WHEN doc_id % 4 = 0
            THEN '<a href="https://other.example/e"></a> ' ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN '<a href="https://other.example/b"><b>x</b></a> '
            ELSE '' END
    || '</nav>'
"""


def q_anchor_text_terms(spark, sf_dir):
    """Anchor-text aggregation per destination host
    (webnorm.anchor_text_terms): tokenize the visible text of every
    absolute anchor, count terms per canonical target host — the
    link-context ranking/weak-supervision signal.  Two index-aligned
    regexp_extract_all arrays zipped narrow; ONE corpus-wide exchange
    (partial-agg groupBy on (dst_host, term))."""
    pages = (_t(spark, sf_dir, "documents")
             .select(_anchorpage_html_col().alias("html")))
    return webnorm.anchor_text_terms(pages)


def _sql_anchor_terms() -> str:
    from .expected_spec import _sql_str as lit
    from ..operators import webnorm as w

    pat = lit(w.ANCHOR_PATTERN)
    return f"""
WITH pages AS (
  SELECT ({_SQL_ANCHORPAGE_HTML}) AS html FROM documents),
pairs AS (
  SELECT unnest(regexp_extract_all(html, {pat}, 1)) AS link,
         unnest(regexp_extract_all(html, {pat}, 2)) AS txt
  FROM pages),
abs_anchors AS (
  SELECT {w.CANONICAL_HOST_SQL.format(col="link")} AS dst_host, txt
  FROM pairs WHERE regexp_matches(link, '(?i)^https?://')),
terms AS (
  SELECT dst_host, u.term
  FROM abs_anchors,
       UNNEST({dedup.WORD_ARRAY_SQL.format(col="txt")}) AS u(term)
  WHERE dst_host <> '')
SELECT dst_host, term, CAST(COUNT(*) AS BIGINT) AS n_anchors
FROM terms GROUP BY dst_host, term
"""


SQL_ANCHOR_TEXT_TERMS = _sql_anchor_terms()


def q_host_cap_sample(spark, sf_dir):
    """Per-host cap-K sampling (webnorm.host_cap_sample): keep at most 8
    documents per canonical host, chosen by deterministic hash order.
    The Spark side runs the salted two-stage exact top-K (bounded
    partitions even for megahosts); the oracle is the naive one-window
    form — the two are equivalent by construction, which is exactly
    what the twin certifies."""
    pages = (_t(spark, sf_dir, "documents")
             .select("doc_id",
                     webnorm.canonical_host(_dirty_url_col()).alias("host")))
    return webnorm.host_cap_sample(pages, cap=8, salt_buckets=16)


SQL_HOST_CAP = """
WITH raw AS (
  SELECT doc_id, __DIRTY__ AS url FROM documents),
hosts AS (
  SELECT doc_id, __CANON_HOST_URL__ AS host
  FROM raw),
hashed AS (
  SELECT host, doc_id,
         CAST(concat('0x', substr(md5('hostcap:' || CAST(doc_id AS VARCHAR)),
                                  1, 8)) AS BIGINT) AS h
  FROM hosts),
ranked AS (
  SELECT host, doc_id,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY h, doc_id) AS r
  FROM hashed)
SELECT host, doc_id, CAST(r AS INTEGER) AS sample_rank
FROM ranked WHERE r <= 8
""".replace("__CANON_HOST_URL__",
            webnorm.CANONICAL_HOST_SQL.format(col="url")).replace(
    "__DIRTY__", _SQL_DIRTY_URL)


def q_pii_redaction(spark, sf_dir):
    """PII scrub over the corpus: emails / IPv4 runs replaced with
    placeholder tokens, per-doc match counts + redacted length + a
    48-char redacted tail sample.  PII is injected deterministically
    (doc_id arithmetic) since the synthetic corpus contains none; the
    operator under test is the extraction/redaction."""
    d = F.col("doc_id")
    email = F.when(d % 4 < 3, F.concat(
        F.lit(" contact user"), (d % 50).cast("string"),
        F.lit("@mail"), (d % 7).cast("string"),
        F.lit(".example.com"))).otherwise(F.lit(""))
    ip = F.when(d % 6 == 0, F.concat(
        F.lit(" from 10."), (d % 200).cast("string"),
        F.lit(".0."), (d % 250).cast("string"))).otherwise(F.lit(""))
    docs = (_t(spark, sf_dir, "documents")
            .select("doc_id", F.concat(F.col("text"), email, ip).alias("text")))
    return webnorm.pii_redact(docs)


SQL_PII = """
WITH injected AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 4 < 3
                 THEN ' contact user' || CAST(doc_id % 50 AS VARCHAR)
                      || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 6 = 0
                 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
                      || '.0.' || CAST(doc_id % 250 AS VARCHAR)
                 ELSE '' END AS text
  FROM documents),
red AS (
  SELECT doc_id, text,
         regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g')
         AS after_email
  FROM injected),
red2 AS (
  SELECT doc_id, text, after_email,
         regexp_replace(after_email,
             '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', '<IP>', 'g')
         AS redacted
  FROM red)
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER)
         AS n_emails,
       CAST(len(regexp_extract_all(after_email,
            '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS INTEGER)
         AS n_ips,
       CAST(length(redacted) AS INTEGER) AS redacted_len,
       substr(redacted, greatest(length(redacted) - 47, 1), 48) AS redacted_tail
FROM red2
"""


def q_doc_repetition_signals(spark, sf_dir):
    """Gopher-style repetition filters per document (type-token ratio,
    top-word / top-bigram fractions, repetitive flag)."""
    return textstats.repetition_signals(_t(spark, sf_dir, "documents"))


SQL_REPETITION = """
WITH words AS (
  SELECT doc_id, w AS word
  FROM documents,
       unnest(string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS t(w)
  WHERE length(w) > 0),
pw AS (SELECT doc_id, word, COUNT(*) AS n FROM words GROUP BY 1, 2),
tok AS (
  SELECT doc_id, SUM(n) AS n_tokens, COUNT(*) AS n_types, MAX(n) AS top_word_n
  FROM pw GROUP BY doc_id),
ws AS (
  SELECT doc_id,
         string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents),
bi AS (
  SELECT doc_id,
         unnest(CASE WHEN len(w) >= 2
                THEN list_transform(generate_series(1, len(w) - 1),
                                    i -> concat(w[i], ' ', w[i + 1]))
                ELSE [] END) AS bigram
  FROM ws),
pb AS (SELECT doc_id, bigram, COUNT(*) AS n FROM bi GROUP BY 1, 2),
bit AS (
  SELECT doc_id, SUM(n) AS n_bigrams, MAX(n) AS top_bi_n,
         SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS dup_bi_n
  FROM pb GROUP BY doc_id)
SELECT t.doc_id,
       CAST(t.n_tokens AS BIGINT) AS n_tokens,
       CAST(t.n_types AS BIGINT) AS n_types,
       ROUND(t.n_types * 1.0 / t.n_tokens, 6) AS type_token_r,
       ROUND(t.top_word_n * 1.0 / t.n_tokens, 6) AS top_word_frac,
       ROUND(COALESCE(b.top_bi_n * 1.0 / b.n_bigrams, 0.0), 6) AS top_bigram_frac,
       ROUND(COALESCE(b.dup_bi_n * 1.0 / b.n_bigrams, 0.0), 6) AS dup_bigram_frac,
       (ROUND(t.top_word_n * 1.0 / t.n_tokens, 6) > 0.20
        OR ROUND(COALESCE(b.dup_bi_n * 1.0 / b.n_bigrams, 0.0), 6) > 0.30)
         AS flag_repetitive
FROM tok t LEFT JOIN bit b ON t.doc_id = b.doc_id
"""


def q_dedup_simhash_hamming(spark, sf_dir):
    """SimHash near-dup pairs via pigeonhole banding (Manku et al.,
    WWW'07): 4 bands of 8 bits, equi-join candidates, bit_count verify.
    The brute-force all-pairs DuckDB twin certifies the banded rewrite's
    recall (exactly 1.0 for hamming <= 3 by pigeonhole)."""
    return dedup.simhash_hamming_pairs(_t(spark, sf_dir, "documents"),
                                       max_hamming=3, n_bands=4)


SQL_SIMHASH_HAMMING = """
WITH words AS (
  SELECT DISTINCT doc_id, w AS word
  FROM documents,
       unnest(string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS t(w)
  WHERE length(w) > 0),
bits AS (
  SELECT doc_id, b.bit,
         (CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT) >> b.bit) & 1 AS v
  FROM words, generate_series(0, 31) AS b(bit)),
maj AS (
  SELECT doc_id, bit, SUM(v) AS ones, COUNT(*) AS total
  FROM bits GROUP BY doc_id, bit),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN 2*ones >= total THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
  FROM maj GROUP BY doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def q_lang_temperature_sample(spark, sf_dir):
    """Multilingual temperature rebalancing (alpha=0.6): deterministic
    md5-bucket keep decision against p_lang^(alpha-1) rates."""
    return textstats.temperature_sample(_t(spark, sf_dir, "documents"),
                                        alpha=0.6)


SQL_TEMPERATURE_SAMPLE = """
WITH counts AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
tot AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS total FROM counts),
rated AS (
  SELECT lang, pow(n_docs / (SELECT total FROM tot), -0.4) AS pw FROM counts),
mx AS (SELECT MAX(pw) AS max_pw FROM rated),
thr AS (
  SELECT lang,
         CAST(FLOOR(ROUND(pw / (SELECT max_pw FROM mx), 6) * 1000000 + 0.5) AS BIGINT)
           AS rate_millionths
  FROM rated)
SELECT d.doc_id, d.lang, t.rate_millionths,
       (CAST(concat('0x', substr(md5('ts:' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % 1000000) < t.rate_millionths AS kept
FROM documents d JOIN thr t USING (lang)
"""


def q_doc_classifier_score(spark, sf_dir):
    """fastText-style hashing-trick quality classifier: md5 feature
    buckets, exact integer weight accumulation, 6-dp sigmoid."""
    return textstats.hashed_classifier_score(_t(spark, sf_dir, "documents"),
                                             n_buckets=256)


SQL_CLASSIFIER_SCORE = r"""
WITH w0 AS (
  SELECT doc_id,
         list_filter(string_split(lower(regexp_replace(trim(coalesce(text, '')),
                                                       '\s+', ' ', 'g')), ' '),
                     w -> len(w) > 0) AS ws
  FROM documents),
agg AS (
  SELECT doc_id, len(ws) AS n_tokens,
         CAST(COALESCE(list_sum(list_transform(ws, w ->
             ((CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) % 256)
               * 2654435761 + 975319753) % 4294967296 % 2001 - 1000)), 0)
           AS BIGINT) AS wsum_milli
  FROM w0)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, wsum_milli,
       ROUND(1.0 / (1.0 + exp(-(CASE WHEN n_tokens = 0 THEN 0.0
             ELSE (wsum_milli / 1000.0) / n_tokens END))), 6) AS score_r,
       wsum_milli >= 0 AS keep
FROM agg
"""


def q_embedding_kmeans(spark, sf_dir):
    """Distributed Lloyd k-means (k=8, 3 fixed iterations) over the
    embedding corpus: shuffle-free broadcast-codebook assignment, one
    tiny (centroid, pos) exchange per update, 6-dp centroid rounding
    between rounds so both engines feed identical codebooks forward.
    The DuckDB twin is an unrolled CTE chain (same fixed-budget recipe
    as graph_pagerank)."""
    return similarity.kmeans_lloyd(_t(spark, sf_dir, "embeddings"),
                                   k=8, n_iter=3)


_SQL_KM_ITER = """
d{n} AS (
  SELECT vp.vec_id, c.centroid_id,
         ROUND(SUM((vp.coord - c.coord) * (vp.coord - c.coord)), 6) AS dist
  FROM vp JOIN c{prev} c ON vp.pos = c.pos
  GROUP BY 1, 2),
m{n} AS (SELECT vec_id, MIN(dist) AS md FROM d{n} GROUP BY vec_id),
a{n} AS (
  SELECT d.vec_id, MIN(d.centroid_id) AS centroid_id
  FROM d{n} d JOIN m{n} m ON d.vec_id = m.vec_id AND d.dist = m.md
  GROUP BY d.vec_id),
c{n} AS (
  SELECT a.centroid_id, vp.pos, ROUND(AVG(vp.coord), 6) AS coord
  FROM a{n} a JOIN vp ON vp.vec_id = a.vec_id
  GROUP BY 1, 2),
"""

SQL_EMBEDDING_KMEANS = ("""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
vp AS (SELECT vec_id, t.i - 1 AS pos, vec[t.i] AS coord
       FROM v, generate_series(1, 64) AS t(i)),
c0 AS (SELECT vec_id AS centroid_id, pos, coord FROM vp WHERE vec_id < 8),
""" + "".join(_SQL_KM_ITER.format(n=i, prev=i - 1) for i in range(1, 4)) +
"""sizes AS (SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n_members
          FROM a3 GROUP BY 1)
SELECT c.centroid_id, CAST(c.pos AS INT) AS pos, c.coord AS coord_r,
       s.n_members
FROM c3 c JOIN sizes s USING (centroid_id)
""")


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup: k-means cluster (k=8, 3 iters), then near-dup pairs
    ONLY within clusters — the quadratic verify fenced inside bounded
    buckets, candidates via equi-join on centroid_id.  Threshold 0.4 is
    the same synthetic-corpus tuning as dedup_embedding_cosine (max
    pairwise cosine ~0.51, unclustered vectors); production uses
    ~0.95."""
    return similarity.semantic_dedup(_t(spark, sf_dir, "embeddings"),
                                     k=8, n_iter=3, threshold=0.4)


SQL_SEMANTIC_DEDUP = ("""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
vp AS (SELECT vec_id, t.i - 1 AS pos, vec[t.i] AS coord
       FROM v, generate_series(1, 64) AS t(i)),
c0 AS (SELECT vec_id AS centroid_id, pos, coord FROM vp WHERE vec_id < 8),
""" + "".join(_SQL_KM_ITER.format(n=i, prev=i - 1) for i in range(1, 4)) +
"""cand AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.centroid_id,
         va.vec AS va, vb.vec AS vb
  FROM a3 a JOIN a3 b ON a.centroid_id = b.centroid_id
                     AND a.vec_id < b.vec_id
  JOIN v va ON va.vec_id = a.vec_id
  JOIN v vb ON vb.vec_id = b.vec_id),
scored AS (
  SELECT vec_a, vec_b, centroid_id,
         ROUND(SUM(va[i] * vb[i])
               / SQRT(SUM(va[i]*va[i]) * SUM(vb[i]*vb[i])), 6) AS cosine_r
  FROM cand, generate_series(1, 64) t(i)
  GROUP BY 1, 2, 3)
SELECT vec_a, vec_b, centroid_id, cosine_r
FROM scored WHERE cosine_r >= 0.4
""")


def q_bpe_merge_candidates(spark, sf_dir):
    """Distributed BPE-training pair mining: top-20 adjacent character
    pairs over the pretoken vocabulary, weighted by frequency — the
    vocab-then-pairs shape every scale BPE trainer reduces to."""
    return textstats.bpe_merge_candidates(_t(spark, sf_dir, "documents"),
                                          top_k=20)


def q_unigram_seed_candidates(spark, sf_dir):
    """Unigram-LM (SentencePiece-style) training seed mining: top-20
    substrings (length 2..6) of the pretoken vocabulary ranked by
    Kudo's count*len seed heuristic — the seeding stage of
    operators/unigramlm.unigram_train_pieces as one declarative plan
    (positions x lengths explode over the DISTINCT pretoken table,
    one partial-agg shuffle, TakeOrdered top-k)."""
    from ..operators.unigramlm import unigram_seed_candidates
    return unigram_seed_candidates(_t(spark, sf_dir, "documents"),
                                   top_k=20)


SQL_UNIGRAM_SEED_CANDIDATES = r"""
WITH pretoks AS (
  SELECT unnest(coalesce(regexp_extract_all(text,
    '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^ \t\n\f\r\p{L}\p{N}]+', 0),
    [])) AS pretok
  FROM documents),
vocab AS (SELECT pretok, COUNT(*) AS freq FROM pretoks GROUP BY pretok),
pos AS (
  SELECT pretok, freq, unnest(generate_series(1, length(pretok))) AS i
  FROM vocab WHERE length(pretok) >= 2),
lens AS (
  SELECT pretok, freq, i,
         unnest(generate_series(2, least(6, length(pretok) - i + 1))) AS l
  FROM pos WHERE length(pretok) - i + 1 >= 2),
pieces AS (SELECT substr(pretok, i, l) AS piece, freq FROM lens)
SELECT piece, CAST(SUM(freq) AS BIGINT) AS occurrences,
       CAST(SUM(freq) * length(piece) AS BIGINT) AS score
FROM pieces GROUP BY piece
ORDER BY score DESC, piece DESC LIMIT 20
"""


def q_orders_price_quantile_sketch(spark, sf_dir):
    """Histogram quantile SKETCH over the exact-percentile query's own
    domain (order value in cents per priority): the mergeable
    two-pass fixed-grid estimate that replaces the full per-group sort
    at 100 TB — run it next to orders_price_percentiles to read the
    bin-width error directly."""
    from ..operators.sketches import hist_quantiles
    o = _t(spark, sf_dir, "orders")
    cents = _cents(F.col("o_totalprice"))
    return hist_quantiles(
        o.select("o_orderpriority", cents.alias("cents")),
        value_col="cents", group_col="o_orderpriority", n_bins=64,
        qs=(0.5, 0.9, 0.99))


def _sql_quantile_sketch():
    from ..operators.sketches import hist_quantiles_sql
    return hist_quantiles_sql(
        "(SELECT o_orderpriority, "
        "CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents "
        "FROM orders)",
        value_sql="cents", group_sql="o_orderpriority", n_bins=64,
        qs=(0.5, 0.9, 0.99), out_group="o_orderpriority")


SQL_QUANTILE_SKETCH = _sql_quantile_sketch()


def q_doc_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprints (Schleimer et al. 2003 / MOSS): window
    minima over 3-word-gram hashes, rightmost-tie rule — any shared
    run of >= w+k-1 words between two docs is guaranteed to share a
    fingerprint, at ~2/(w+1) the density of full shingling."""
    return dedup.winnow_fingerprints(_t(spark, sf_dir, "documents"),
                                     k=3, w=4)


SQL_WINNOW = rf"""
WITH words0 AS (
  SELECT doc_id, {dedup.WORD_ARRAY_SQL.format(col="text")} AS w
  FROM documents),
-- token-count gate (NOT trim-length): tab/newline-only docs must
-- contribute nothing, mirroring the Spark side
words AS (SELECT doc_id, w FROM words0 WHERE len(w) > 0),
grams AS (
  SELECT doc_id,
         CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_transform(generate_series(1, len(w) - 2),
                                  i -> array_to_string(w[i:i+2], ' '))
         END AS g
  FROM words),
hashed AS (
  SELECT doc_id,
         list_transform(g, x ->
           CAST(concat('0x', substr(md5(x), 1, 7)) AS BIGINT)) AS h
  FROM grams),
wins AS (
  SELECT doc_id, h, unnest(generate_series(1, greatest(1, len(h) - 3))) AS j
  FROM hashed),
picked AS (
  SELECT doc_id,
         j + len(h[j:j+3])
           - list_position(list_reverse(h[j:j+3]),
                           list_aggregate(h[j:j+3], 'min')) AS pos,
         list_aggregate(h[j:j+3], 'min') AS fp
  FROM wins)
SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos, CAST(fp AS BIGINT) AS fp
FROM picked
"""


def q_winnow_dup_candidates(spark, sf_dir):
    """Cross-doc near-dup candidates by shared winnowing fingerprints:
    equi-join on the fingerprint value (the LSH-candidates shape), hot
    corpus-furniture fingerprints (df > 50) dropped before the
    self-join bounds the per-key fanout."""
    return dedup.winnow_dup_candidates(_t(spark, sf_dir, "documents"),
                                       k=3, w=4, min_shared=2, max_df=50)


SQL_WINNOW_DUP = f"""
WITH fp_rows AS ({SQL_WINNOW}),
fps AS (SELECT DISTINCT doc_id, fp FROM fp_rows),
cap AS (SELECT fp FROM fps GROUP BY fp
        HAVING COUNT(*) >= 2 AND COUNT(*) <= 50),
elig AS (SELECT f.doc_id, f.fp FROM fps f JOIN cap USING (fp))
SELECT a.doc_id AS a, b.doc_id AS b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM elig a JOIN elig b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= 2
"""


def q_hash_embedding_topk(spark, sf_dir):
    """Text -> ANN with no model anywhere: exact cosine top-5 for three
    query docs over the feature-hashing embeddings — the composition
    that makes hashed_text_embeddings useful (any text corpus becomes
    ANN-searchable in-engine).  Dot products and norms are sums of
    INTEGER component products, exact in both engines under any
    partitioning/join order, so ranks never wobble; zero vectors
    (token-less docs) are excluded on both sides rather than producing
    NULL cosines whose sort position differs across engines."""
    from ..operators.similarity import (
        brute_force_topk,
        hashed_text_embeddings,
    )
    emb = hashed_text_embeddings(_t(spark, sf_dir, "documents"), dim=16)
    nz = emb.where(
        F.aggregate("vec", F.lit(0).cast("long"),
                    lambda a, x: a + x * x) > 0)
    return brute_force_topk(nz, query_ids=[0, 1, 2], k=5,
                            id_col="doc_id", vec_col="vec")


def _sql_hash_topk() -> str:
    return f"""
WITH emb AS ({SQL_HASH_EMBEDDINGS}),
norms AS (SELECT doc_id, SUM(v * v) AS nn FROM emb GROUP BY doc_id),
nz AS (SELECT doc_id FROM norms WHERE nn > 0),
q AS (
  SELECT e.doc_id AS query_id, e.d, e.v
  FROM emb e JOIN nz USING (doc_id)
  WHERE e.doc_id IN (0, 1, 2)),
dots AS (
  SELECT q.query_id, e.doc_id AS neighbor_id, SUM(q.v * e.v) AS dot
  FROM q
  JOIN emb e ON q.d = e.d
  JOIN nz ON e.doc_id = nz.doc_id
  WHERE e.doc_id <> q.query_id
  GROUP BY q.query_id, e.doc_id),
scored AS (
  SELECT d.query_id, d.neighbor_id,
         round(d.dot / sqrt(CAST(nq.nn AS DOUBLE) * nb.nn), 6) AS cosine_r
  FROM dots d
  JOIN norms nq ON d.query_id = nq.doc_id
  JOIN norms nb ON d.neighbor_id = nb.doc_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine_r,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine_r DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine_r
FROM ranked WHERE rank <= 5
"""


def q_orders_zorder_layout(spark, sf_dir):
    """Z-order (Morton) layout clustering over (o_custkey,
    o_totalprice): the planned-file stats table — every equal-width
    zkey range shows a BOUNDED min/max span in both quantized
    dimensions, the property that lets a scan prune files on either
    predicate column (Delta OPTIMIZE ZORDER BY / Iceberg sort-order
    rewrite semantics).  Integer bit-interleave arithmetic,
    engine-exact."""
    from ..operators.packing import zorder_layout_stats
    return zorder_layout_stats(
        _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
        col_a="o_custkey", col_b="o_totalprice", bits=8, n_files=16)


def _sql_zorder() -> str:
    terms = " + ".join(
        f"(((za >> {b}) & 1) << {2 * b + 1}) + (((zb >> {b}) & 1) << {2 * b})"
        for b in range(8))
    return f"""
WITH mm AS (
  SELECT MIN(CAST(o_custkey AS DOUBLE)) AS alo,
         MAX(CAST(o_custkey AS DOUBLE)) AS ahi,
         MIN(CAST(o_totalprice AS DOUBLE)) AS blo,
         MAX(CAST(o_totalprice AS DOUBLE)) AS bhi
  FROM orders),
q AS (
  SELECT CAST(CASE WHEN ahi = alo THEN 0
              ELSE least(255, floor((CAST(o_custkey AS DOUBLE) - alo)
                                    * 256 / (ahi - alo)))
         END AS BIGINT) AS za,
         CAST(CASE WHEN bhi = blo THEN 0
              ELSE least(255, floor((CAST(o_totalprice AS DOUBLE) - blo)
                                    * 256 / (bhi - blo)))
         END AS BIGINT) AS zb
  FROM orders, mm
  -- NULL-dim rows get NULL zkeys on the Spark side and are filtered by
  -- zorder_layout_stats; DuckDB's least() ALSO skips NULLs (the same
  -- hazard packing.py guards), so mirror the filter explicitly
  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL),
k AS (SELECT za, zb, CAST({terms} AS BIGINT) AS zkey FROM q)
SELECT CAST(floor(zkey * 16 / 65536) AS INTEGER) AS file_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(za) AS a_min, MAX(za) AS a_max,
       MIN(zb) AS b_min, MAX(zb) AS b_max
FROM k GROUP BY file_id
"""


SQL_ZORDER_LAYOUT = _sql_zorder()


def q_doc_hash_embeddings(spark, sf_dir):
    """Model-free feature-hashing doc embeddings (16 buckets, ±1 sign
    — Weinberger et al. 2009) in long form: integer signed-term-count
    components plus the L2-normalized view.  The raw components are
    exact integers and the normalization divides them by the exact
    sqrt of their sum of squares — both IEEE correctly-rounded ops, so
    even the doubles hash identically cross-engine with NO rounding."""
    from ..operators.similarity import hashed_text_embeddings
    emb = hashed_text_embeddings(_t(spark, sf_dir, "documents"), dim=16)
    return (emb
            .select("doc_id",
                    F.posexplode(F.arrays_zip("vec", "vec_norm"))
                    .alias("d", "z"))
            .select("doc_id", F.col("d").cast("int").alias("d"),
                    F.col("z.vec").alias("v"),
                    F.col("z.vec_norm").alias("v_norm")))


SQL_HASH_EMBEDDINGS = rf"""
WITH words AS (
  SELECT doc_id,
         unnest({dedup.WORD_ARRAY_SQL.format(col="text")}) AS w
  FROM documents),
tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM words GROUP BY doc_id, w),
comp AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(concat('b:', w)), 1, 8)) AS BIGINT)
           % 16 AS d,
         SUM(CASE WHEN CAST(concat('0x', substr(md5(concat('s:', w)), 1, 8))
                       AS BIGINT) % 2 = 0
                  THEN -tf ELSE tf END) AS v
  FROM tf GROUP BY doc_id, d),
grid AS (
  -- every INPUT document gets a row (token-less docs -> zero vector),
  -- mirroring the Spark side's explode_outer keep-alive
  SELECT t.doc_id, g.d
  FROM (SELECT DISTINCT doc_id FROM documents) t,
       (SELECT unnest(generate_series(0, 15)) AS d) g),
dense AS (
  SELECT g.doc_id, g.d, coalesce(c.v, 0) AS v
  FROM grid g LEFT JOIN comp c ON g.doc_id = c.doc_id AND g.d = c.d),
normed AS (
  SELECT doc_id, d, CAST(v AS BIGINT) AS v,
         sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))
              OVER (PARTITION BY doc_id)) AS nrm
  FROM dense)
SELECT doc_id, CAST(d AS INTEGER) AS d, v,
       CASE WHEN nrm = 0 THEN 0.0 ELSE CAST(v AS DOUBLE) / nrm END AS v_norm
FROM normed
"""

SQL_HASH_TOPK = _sql_hash_topk()
SQL_HYBRID_RRF = _sql_hybrid_rrf()


SQL_BPE_MERGE_CANDIDATES = r"""
WITH pretoks AS (
  SELECT unnest(coalesce(regexp_extract_all(text,
    '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^ \t\n\f\r\p{L}\p{N}]+', 0),
    [])) AS pretok
  FROM documents),
vocab AS (SELECT pretok, COUNT(*) AS freq FROM pretoks GROUP BY pretok),
idx AS (
  SELECT pretok, freq, unnest(generate_series(1, length(pretok) - 1)) AS i
  FROM vocab WHERE length(pretok) >= 2),
pairs AS (SELECT substr(pretok, i, 2) AS pair, freq FROM idx)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS weight
FROM pairs GROUP BY pair
ORDER BY weight DESC, pair DESC LIMIT 20
"""


def q_doc_sequence_pack(spark, sf_dir):
    """Greedy token-budget sequence packing (budget=128) per lang shard;
    grouped-linear-scan applyInPandas mirrored by a recursive-CTE twin."""
    return packing.sequence_pack(_t(spark, sf_dir, "documents"), budget=128)


SQL_SEQUENCE_PACK = r"""
WITH RECURSIVE t AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(
             string_split(lower(regexp_replace(trim(coalesce(text, '')), '\s+', ' ', 'g')), ' '),
             w -> len(w) > 0)) AS BIGINT) AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents),
walk AS (
  SELECT doc_id, lang, n_tokens, rn,
         CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS seq_offset,
         n_tokens AS fill
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.doc_id, t.lang, t.n_tokens, t.rn,
         CASE WHEN w.fill > 0 AND w.fill + t.n_tokens > 128
              THEN w.seq_id + 1 ELSE w.seq_id END,
         CASE WHEN w.fill > 0 AND w.fill + t.n_tokens > 128
              THEN CAST(0 AS BIGINT) ELSE w.fill END,
         CASE WHEN w.fill > 0 AND w.fill + t.n_tokens > 128
              THEN t.n_tokens ELSE w.fill + t.n_tokens END
  FROM walk w JOIN t ON t.lang IS NOT DISTINCT FROM w.lang
                    AND t.rn = w.rn + 1)
SELECT doc_id, lang, n_tokens, seq_id, seq_offset FROM walk
"""
# ^ null-safe lang join: Spark's groupBy packs a NULL-lang group like
# any other, but a bare t.lang = w.lang would never recurse past that
# group's first row and silently drop its remaining docs from the twin


def q_hll_distinct_parts(spark, sf_dir):
    """Per-returnflag HyperLogLog distinct-part estimate (m=256
    registers) next to the exact distinct — the approximate sketch is
    itself oracle-verified because both engines compute the identical
    deterministic registers (operators/sketches.py docstring).  The
    scale twin of the reference's exact distinct sets
    (core/surname_matcher.py:80-88)."""
    return sketches.hll_distinct(_t(spark, sf_dir, "lineitem"),
                                 key_col="l_partkey",
                                 group_col="l_returnflag")


SQL_HLL_DISTINCT = sketches.hll_sql(
    "lineitem", "l_partkey", "l_returnflag", "l_returnflag")


def q_heavy_hitter_terms(spark, sf_dir):
    """Count-min-sketch heavy hitters over the document word stream
    (depth 4 x width 256): top-20 words by sketch estimate with exact
    count and one-sided overcount alongside — the bounded-memory twin
    of the reference's exact Counter top-10
    (core/surname_matcher.py:394-402)."""
    return sketches.cm_heavy_hitters(_t(spark, sf_dir, "documents"),
                                     top_k=20)


SQL_HEAVY_HITTERS = sketches.cm_sql(_SQL_WORDS.strip(), top_k=20)


def q_doc_chunk_windows(spark, sf_dir):
    """Fixed-size overlapping context windows (64 tokens, stride 48)
    per document — the dual of doc_sequence_pack for docs longer than
    the training context; narrow HOF-only plan, no shuffle."""
    return packing.chunk_windows(_t(spark, sf_dir, "documents"),
                                 chunk_len=64, stride=48)


def q_corpus_shard_manifest(spark, sf_dir):
    """Training-output shard manifest (packing.shard_manifest): every
    doc lands in a deterministic md5 shard (same hash family as the
    train/val/test split); per shard the doc/token/byte totals plus the
    micro-fixed token share — the balance report a writer publishes
    before a training epoch.  One partial-agg shuffle on shard_id
    (cardinality = n_shards, corpus-size-independent); the share window
    runs over the collapsed <= n_shards rows."""
    return packing.shard_manifest(_t(spark, sf_dir, "documents"),
                                  n_shards=16)


SQL_SHARD_MANIFEST = f"""
WITH assigned AS (
  SELECT CAST(concat('0x', substr(md5('shard:' || CAST(doc_id AS VARCHAR)),
                                  1, 8)) AS BIGINT) % 16 AS shard_id,
         CASE WHEN text IS NULL THEN 0
              ELSE len({dedup.WORD_ARRAY_SQL.format(col="text")}) END AS tok,
         COALESCE(strlen(text), 0) AS b
  FROM documents),
per AS (
  SELECT shard_id, COUNT(*) AS n_docs,
         CAST(SUM(tok) AS BIGINT) AS n_tokens,
         CAST(SUM(b) AS BIGINT) AS n_bytes
  FROM assigned GROUP BY shard_id),
-- every shard id gets a row: an empty shard reports zeros instead of
-- being silently absent (mirrors the operator's all-shards left join)
filled AS (
  SELECT CAST(s.range AS BIGINT) AS shard_id,
         COALESCE(n_docs, 0) AS n_docs,
         COALESCE(n_tokens, 0) AS n_tokens,
         COALESCE(n_bytes, 0) AS n_bytes
  FROM range(0, 16) s LEFT JOIN per ON CAST(s.range AS BIGINT) = per.shard_id)
SELECT shard_id, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens, CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(CASE WHEN SUM(n_tokens) OVER () = 0 THEN 0
                 ELSE n_tokens * 1000000 // SUM(n_tokens) OVER () END
            AS BIGINT) AS token_share_micro
FROM filled
"""


def q_compaction_plan(spark, sf_dir):
    """Iceberg-style binpack rewrite planning (packing.compaction_plan):
    per table partition (lang stands in; file manifest synthesized as
    doc_id/byte-length rows), group files in stable id order into
    ~16 KiB output bins by running byte offset.  The only wide op is
    the per-partition cumulative-sum window — bounded by
    files-per-partition, never corpus bytes."""
    files = (_t(spark, sf_dir, "documents")
             .select(F.col("lang").alias("part"),
                     F.col("doc_id").alias("file_id"),
                     F.octet_length("text").alias("bytes")))
    return packing.compaction_plan(files, target_bytes=16384)


SQL_COMPACTION_PLAN = """
WITH f AS (
  SELECT lang AS part, doc_id AS file_id,
         COALESCE(strlen(text), 0) AS sz
  FROM documents),
off AS (
  SELECT part, file_id, sz,
         SUM(sz) OVER (PARTITION BY part ORDER BY file_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - sz AS o
  FROM f)
SELECT part, CAST(o // 16384 AS BIGINT) AS bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(sz) AS BIGINT) AS bin_bytes,
       MIN(file_id) AS first_file, MAX(file_id) AS last_file
FROM off GROUP BY part, bin_id
"""


def q_bloom_seen_urls(spark, sf_dir):
    """Bloom-filter seen-list probe (m=64Ki bits, k=4): large parts
    (p_size > 40, ~20% of the key space) are the 'seen' set, the full
    part table is the incoming frontier batch — a sparse-membership
    probe where the false-positive accounting actually exercises as the
    filter fills with scale.  The one summary row carries the flagged
    count AND the exact FP count (no false negatives by construction —
    the sketch's one-sided guarantee is verified output, the same
    discipline as hll/cm)."""
    part = _t(spark, sf_dir, "part")
    return sketches.bloom_probe(part.where(F.col("p_size") > 40), part,
                                existing_key="p_partkey",
                                incoming_key="p_partkey")


SQL_BLOOM_SEEN = sketches.bloom_sql("(SELECT * FROM part WHERE p_size > 40)",
                                    "p_partkey", "part", "p_partkey")


def q_inverted_text_index(spark, sf_dir):
    """Inverted-index build: per-term df / total tf / doc_id-ordered
    posting list (bounded top-20 slice + md5 witness over the COMPLETE
    postings — the unbounded payload is verified by hash, never
    shipped).  The distributed twin of the reference's exact per-term
    Counters (core/surname_matcher.py:356-402)."""
    return textindex.inverted_index(_t(spark, sf_dir, "documents"),
                                    top_postings=20)


SQL_INVERTED_INDEX = textindex.inverted_index_sql(_SQL_WORDS.strip(),
                                                  top_postings=20)


def q_term_pmi_pairs(spark, sf_dir):
    """Skip-gram PMI collocations (window 2, min pair count 5, top-20):
    word2vec/GloVe-style co-occurrence statistics; pair generation is
    narrow HOF zips (no self-join), unigram margins rejoin by
    broadcast."""
    return textstats.cooccurrence_pmi(_t(spark, sf_dir, "documents"),
                                      window=2, min_count=5, top_k=20)


SQL_TERM_PMI = r"""
WITH w0 AS (
  SELECT doc_id,
         list_filter(string_split(lower(regexp_replace(trim(text),
                                                       '\s+', ' ', 'g')), ' '),
                     w -> len(w) > 0) AS ws
  FROM documents),
posl AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
  FROM w0 WHERE len(ws) > 0),
pos AS (SELECT doc_id, i, ws[i] AS w FROM posl),
pairs AS (
  SELECT a.w AS w_left, b.w AS w_right
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id
                       AND b.i - a.i BETWEEN 1 AND 2),
pc AS (SELECT w_left, w_right, COUNT(*) AS c_ab FROM pairs GROUP BY 1, 2),
uni AS (SELECT w, COUNT(*) AS c FROM pos GROUP BY w),
nw AS (SELECT SUM(c) AS n_words FROM uni),
np AS (SELECT SUM(c_ab) AS n_pairs FROM pc),
scored AS (
  SELECT w_left, w_right, c_ab,
         ROUND(ln((c_ab / (SELECT n_pairs FROM np))
                  / ((a.c / (SELECT n_words FROM nw))
                     * (b.c / (SELECT n_words FROM nw)))), 6) AS pmi_r
  FROM pc JOIN uni a ON pc.w_left = a.w
          JOIN uni b ON pc.w_right = b.w
  WHERE c_ab >= 5)
SELECT w_left, w_right, c_ab, pmi_r
FROM scored ORDER BY pmi_r DESC, w_left, w_right LIMIT 20
"""


SQL_CHUNK_WINDOWS = r"""
WITH w0 AS (
  SELECT doc_id,
         list_filter(string_split(lower(regexp_replace(trim(coalesce(text, '')),
                                                       '\s+', ' ', 'g')), ' '),
                     w -> len(w) > 0) AS ws
  FROM documents),
starts AS (
  SELECT doc_id, ws,
         unnest(generate_series(
             1,
             1 + 48 * greatest(CAST(ceil((len(ws) - 64) / 48.0) AS BIGINT), 0),
             48)) AS s
  FROM w0)
SELECT doc_id,
       CAST((s - 1) // 48 AS BIGINT) AS chunk_id,
       CAST(s AS BIGINT) AS start_token,
       CAST(len(ws[s:s+63]) AS BIGINT) AS n_tokens,
       md5(array_to_string(ws[s:s+63], ' ')) AS chunk_hash
FROM starts
"""


# --------------------------------------------------------------------------


def q_corpus_mixture_weights(spark, sf_dir):
    """Training-mixture table per (lang, source) domain: temperature-
    weighted sampling weight tokens^0.7 / sum, expected token draw at a
    10M-token budget, and the implied epochs (upsampling factor) — the
    GPT-3-style mixture table, computed from the corpus itself."""
    return textstats.mixture_weights(_t(spark, sf_dir, "documents"),
                                     alpha=0.7, budget_tokens=10_000_000)


SQL_MIXTURE_WEIGHTS = r"""
WITH toks AS (
  SELECT lang, source,
         len(list_filter(string_split(lower(regexp_replace(trim(coalesce(text, '')),
                                                           '\s+', ' ', 'g')), ' '),
                         w -> len(w) > 0)) AS n_toks
  FROM documents),
domains AS (
  SELECT lang, source, COUNT(*) AS n_docs,
         CAST(SUM(n_toks) AS BIGINT) AS n_tokens
  FROM toks GROUP BY lang, source),
powed AS (SELECT *, POWER(CAST(n_tokens AS DOUBLE), 0.7) AS pw FROM domains),
denom AS (SELECT SUM(pw) AS denom FROM powed)
SELECT lang, source, n_docs, n_tokens,
       ROUND(pw / (SELECT denom FROM denom), 6) AS weight_r,
       CAST(FLOOR(pw / (SELECT denom FROM denom) * 10000000.0 + 0.5) AS BIGINT)
         AS expected_tokens,
       ROUND(pw / (SELECT denom FROM denom) * 10000000.0
             / GREATEST(n_tokens, 1), 6) AS epochs_r
FROM powed
"""


def q_dsir_importance_weights(spark, sf_dir):
    """DSIR importance weights (hashed-unigram bag model, add-one
    smoothing) of every document against the lang='fr' target domain
    (a real minority slice of the corpus, so the target distribution is
    nonempty and the ranking exercises the genuine importance-ratio
    path) — the published importance-resampling recipe for picking
    domain-relevant pretraining data out of a raw crawl."""
    return textstats.dsir_importance_weights(
        _t(spark, sf_dir, "documents"), target_lang="fr", n_buckets=256)


SQL_DSIR = r"""
WITH words AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(regexp_replace(trim(text),
                                                              '\s+', ' ', 'g')), ' '),
                            w -> len(w) > 0)) AS word
  FROM documents WHERE text IS NOT NULL),
dbc AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5('dsir:' || word), 1, 8)) AS BIGINT) % 256
           AS bucket,
         COUNT(*) AS n
  FROM words GROUP BY 1, 2),
raw AS (SELECT bucket, SUM(n) AS c_raw FROM dbc GROUP BY bucket),
tgt AS (
  SELECT b.bucket, SUM(b.n) AS c_tgt
  FROM dbc b JOIN documents d USING (doc_id)
  WHERE d.lang = 'fr' GROUP BY b.bucket),
tot AS (
  SELECT (SELECT CAST(SUM(c_raw) AS DOUBLE) FROM raw) AS tot_raw,
         (SELECT CAST(COALESCE(SUM(c_tgt), 0) AS DOUBLE) FROM tgt) AS tot_tgt),
ratio AS (
  SELECT r.bucket,
         CAST(FLOOR((ln((COALESCE(t.c_tgt, 0) + 1)
                        / ((SELECT tot_tgt FROM tot) + 256))
                     - ln((r.c_raw + 1) / ((SELECT tot_raw FROM tot) + 256)))
                    * 1000000 + 0.5) AS BIGINT) AS lr_micro
  FROM raw r LEFT JOIN tgt t ON r.bucket = t.bucket)
SELECT b.doc_id,
       CAST(SUM(b.n) AS BIGINT) AS n_tokens,
       ROUND(SUM(b.n * x.lr_micro) / 1e6, 6) AS log_weight_r,
       -- half-up at micro precision on the exact integer sum (see the
       -- operator docstring: rounding the double quotient to 6 dp ties
       -- between grid points and the engines resolve ties differently)
       CAST(FLOOR(SUM(b.n * x.lr_micro) * 1.0 / SUM(b.n) + 0.5) AS BIGINT)
         / 1e6 AS avg_logratio_r
FROM dbc b JOIN ratio x ON b.bucket = x.bucket
GROUP BY b.doc_id
"""


def q_warc_roundtrip(spark, sf_dir):
    """WARC codec certification (sources/warc.py): serialize every
    document as a real WARC/1.0 response record (HTTP block + payload,
    grouped into 64 synthetic files, gzip-member compressed and
    decompressed — the Common Crawl layout), parse it back with the
    ingestion parser, and emit the parsed fields.  The DuckDB twin
    recomputes every field RELATIONALLY from the documents table, so a
    hash match certifies build->parse identity: Content-Length
    arithmetic, HTTP status/header split, date/record-id threading.

    Python by design — this query exists to certify the mapInPandas
    ingestion path (jobs/ingest.py); distributed via applyInPandas per
    synthetic file, no collect."""
    from ..sources import warc as w

    d = F.col("doc_id")
    docs = (_t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example/warc/"),
                 d.cast("string")).alias("url"),
        F.concat(F.lit("2024-01-01T"),
                 F.lpad(F.floor((d % 1440) / 60).cast("string"), 2, "0"),
                 F.lit(":"),
                 F.lpad((d % 60).cast("string"), 2, "0"),
                 F.lit(":00Z")).alias("warc_date"),
        F.when(d % 17 == 0, 404).otherwise(200).cast("int")
         .alias("http_status"),
        F.when(d % 17 == 0, "Not Found").otherwise("OK").alias("reason"),
        F.concat(F.lit("<html><body>"),
                 F.coalesce(F.col("text"), F.lit("")),
                 F.lit("</body></html>")).alias("html"),
    ))

    def roundtrip(pdf):
        import hashlib

        import pandas as pd
        recs = []
        for r in pdf.sort_values("doc_id").itertuples(index=False):
            body = r.html.encode("utf-8")
            http = w.build_http_response(body, status=int(r.http_status),
                                         reason=r.reason)
            extra = ({"WARC-IP-Address": "10.0.0.1"}
                     if int(r.doc_id) % 19 == 0 else None)
            recs.append(w.build_record(
                "response", http, url=r.url, date=r.warc_date,
                record_id=f"<urn:uuid:doc-{int(r.doc_id)}>",
                content_type="application/http; msgtype=response",
                extra_headers=extra))
        blob = w.decompress_warc(w.compress_warc_members(recs))
        out = []
        for rec in w.iter_warc_records(blob):
            status, _, body = w.split_http_response(rec["payload"])
            out.append({
                "doc_id": int(rec["record_id"][len("<urn:uuid:doc-"):-1]),
                "url": rec["url"],
                "warc_date": rec["date"],
                "http_status": status,
                "content_length": rec["content_length"],
                "body_md5": hashlib.md5(body).hexdigest(),
                "body_len": len(body),
            })
        return pd.DataFrame(out)

    return (docs.groupBy((d % 64).alias("file_id"))
            .applyInPandas(roundtrip,
                           "doc_id bigint, url string, warc_date string, "
                           "http_status int, content_length bigint, "
                           "body_md5 string, body_len bigint"))


SQL_WARC_ROUNDTRIP = """
WITH base AS (
  SELECT doc_id,
         'https://' || source || '.example/warc/' || CAST(doc_id AS VARCHAR)
           AS url,
         '2024-01-01T' || lpad(CAST((doc_id % 1440) // 60 AS VARCHAR), 2, '0')
           || ':' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') || ':00Z'
           AS warc_date,
         CASE WHEN doc_id % 17 = 0 THEN 404 ELSE 200 END AS http_status,
         CASE WHEN doc_id % 17 = 0 THEN 'Not Found' ELSE 'OK' END AS reason,
         '<html><body>' || COALESCE(text, '') || '</body></html>' AS html
  FROM documents)
SELECT doc_id, url, warc_date, http_status,
       CAST(strlen('HTTP/1.1 ' || CAST(http_status AS VARCHAR) || ' ' || reason
                   || chr(13) || chr(10)
                   || 'Content-Type: text/html; charset=utf-8'
                   || chr(13) || chr(10)
                   || 'Content-Length: ' || CAST(strlen(html) AS VARCHAR)
                   || chr(13) || chr(10) || chr(13) || chr(10))
            + strlen(html) AS BIGINT) AS content_length,
       md5(html) AS body_md5,
       CAST(strlen(html) AS BIGINT) AS body_len
FROM base
"""


# --- robots.txt policy re-evaluation (operators/robots.py) ----------------
# Four deterministic per-host robots.txt variants keyed on the source name's
# last character, exercising: comment lines, CRLF, stacked User-agent lines
# (including a comment BETWEEN stacked User-agent lines, which RFC 9309 says
# must not split the group), empty Disallow (ignored), inline comments,
# agent-specificity (exact token
# beats '*', and a host with ONLY an unrelated agent yields no rules =>
# allow-all), longest-prefix wins, Allow wins length ties.
_ROBOTS_AGENT = "researchbot"
_ROBOTS_T0 = ("# site policy\n"
              "Sitemap: https://__HOST__/sitemap.xml\n"
              "User-agent: gptbot\n"
              "Disallow: /\n"
              "\n"
              "User-agent: *\n"
              "Disallow: /private/\n"
              "Allow: /private/press/\n"
              "Disallow: /articles/3\n"
              "Allow: /articles/3\n")
_ROBOTS_T1 = ("User-agent: researchbot\r\n"
              "# maintained by ops\r\n"
              "User-agent: *\r\n"
              "Disallow: /tmp/\r\n"
              "Disallow:\r\n"
              "Allow: /articles/1\r\n"
              "Disallow: /articles/\r\n")
_ROBOTS_T2 = ("User-agent: otherbot\n"
              "Disallow: /\n"
              "\n"
              "User-agent: researchbot\n"
              "Allow: /articles/2 # press kit\n"
              "Disallow: /articles/\n"
              # RFC 9309 wildcards: '*' run + '$' end anchor — T2 hosts
              # block pdfs exactly and re-allow print pages inside the
              # disallowed /articles/ tree (pattern length beats prefix)
              "Disallow: /*.pdf$\n"
              "Allow: /articles/*/print\n"
              "Crawl-delay: 10\n"
              # sitemap lines are GLOBAL even when they sit inside a
              # group (sitemaps.org protocol); value case preserved,
              # the duplicate collapses per host.  Placed at group END
              # so block boundaries (and every rules/delay twin hash)
              # are untouched.
              "Sitemap: HTTPS://__HOST__/Sitemap-Index.XML\n"
              "Sitemap: HTTPS://__HOST__/Sitemap-Index.XML\n")
_ROBOTS_T3 = ("User-agent: otherbot\n"
              "Disallow: /\n")


# Variant count shared by _host_variant_fixture and _SQL_HOSTS_CTE.  The
# SQL twins' CASE ladders enumerate exactly this many branches, so the
# assert below turns a template-count change into a loud Spark-side
# failure instead of a silent cross-engine variant divergence.
_HOST_VARIANT_N = 4


def _host_variant_fixture(spark, sf_dir, templates, out_col):
    """One row per distinct source host carrying a deterministic
    per-host document: templates[ascii(last source char) % len], with
    any ``__HOST__`` placeholder replaced by the host.  THE single
    host/variant derivation shared by the robots and sitemap fixtures
    (SQL mirror: _SQL_HOSTS_CTE) — change it in one place only."""
    assert len(templates) == _HOST_VARIANT_N, (
        f"host-variant fixtures are pinned to {_HOST_VARIANT_N} templates "
        f"(got {len(templates)}); update _HOST_VARIANT_N AND every CASE "
        f"ladder in the robots/sitemap SQL twins together")
    docs = _t(spark, sf_dir, "documents")
    v = F.ascii(F.substring("source", -1, 1)) % _HOST_VARIANT_N
    tmpl = F.when(v == 0, F.lit(templates[0]))
    for i in range(1, len(templates) - 1):
        tmpl = tmpl.when(v == i, F.lit(templates[i]))
    tmpl = tmpl.otherwise(F.lit(templates[-1]))
    return (docs
            .select(F.concat(F.col("source"), F.lit(".example")).alias("host"),
                    tmpl.alias("tmpl"))
            .distinct()
            .select("host", F.replace(F.col("tmpl"), F.lit("__HOST__"),
                                      F.col("host")).alias(out_col)))


def _robots_fixture(spark, sf_dir):
    """Per-host robots.txt table: one row per distinct source host."""
    return _host_variant_fixture(
        spark, sf_dir, [_ROBOTS_T0, _ROBOTS_T1, _ROBOTS_T2, _ROBOTS_T3],
        "robots_txt")


def _robots_urls(spark, sf_dir):
    """Deterministic (doc_id, host, path) URL table over the same hosts."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    path = (F.when(d % 23 == 0, F.lit("/tmp/cache"))
            .when(d % 17 == 0, F.lit("/private/press/kit"))
            .when(d % 19 == 0, F.lit("/private/account"))
            .when(d % 29 == 0, F.lit("/files/report.pdf"))
            .when(d % 31 == 0, F.lit("/articles/2/print"))
            .otherwise(F.concat(F.lit("/articles/"), (d % 5).cast("string"))))
    return docs.select(
        "doc_id",
        F.concat(F.col("source"), F.lit(".example")).alias("host"),
        path.alias("path"))


def q_robots_rules_parse(spark, sf_dir):
    """RFC 9309 robots.txt parse as pure DataFrame algebra (robots.py):
    explode lines, window-pass block grouping, agent-specificity pick,
    emit (host, allow, prefix, prefix_len) rules.  Scale shape: the
    robots table is per-HOST (orders of magnitude smaller than pages);
    two narrow window passes partitioned by host, JVM-only."""
    return robots.parse_robots_rules(
        _robots_fixture(spark, sf_dir), agent=_ROBOTS_AGENT)


def q_robots_url_gate(spark, sf_dir):
    """Per-URL robots gate (robots.robots_gate): equi-join pages to the
    parsed per-host rules (broadcast — rules side is per-host tiny),
    longest-prefix argmax per URL via max(struct) partial agg.  No
    Python, no per-row regex; unmatched/ruleless URLs are allowed.
    Reference analog: skip-list input gating before the expensive
    stage (core/batch_processor.py:164-193)."""
    rules = robots.parse_robots_rules(
        _robots_fixture(spark, sf_dir), agent=_ROBOTS_AGENT)
    return robots.robots_gate(_robots_urls(spark, sf_dir),
                              F.broadcast(rules))


# THE single host/variant derivation shared by the robots and sitemap
# oracle twins (Spark mirror: _host_variant_fixture) — one source of truth.
_SQL_HOSTS_CTE = """hosts AS (
  SELECT DISTINCT source || '.example' AS host,
         ascii(substr(source, -1, 1)) %% %d AS v
  FROM documents)""" % _HOST_VARIANT_N

_SQL_ROBOTS_RULES_CTE = "\n" + _SQL_HOSTS_CTE + """,
rob AS (
  SELECT host,
         replace(CASE v WHEN 0 THEN '__T0__' WHEN 1 THEN '__T1__'
                        WHEN 2 THEN '__T2__' ELSE '__T3__' END,
                 '__HOST__', host) AS txt
  FROM hosts),
rlines AS (
  SELECT host, u.i AS ln_idx,
         trim(replace(regexp_replace(string_split(txt, chr(10))[u.i],
                                     '#.*$', ''), chr(13), '')) AS ln
  FROM rob,
       UNNEST(generate_series(1, len(string_split(txt, chr(10))))) AS u(i)),
parsed AS (
  -- comments/blank/garbage lines are ignorable ANYWHERE per RFC 9309
  -- (they must not split stacked User-agent runs): keep directives only
  SELECT * FROM (
    SELECT host, ln_idx,
           lower(regexp_extract(ln, '^([A-Za-z-]+)\\s*:', 1)) AS key,
           trim(regexp_extract(ln, '^[A-Za-z-]+\\s*:(.*)$', 1)) AS val
    FROM rlines) WHERE key <> ''),
marks AS (
  -- only recognized GROUP directives participate in block grouping
  -- (RFC 9309 §2.2.4: Sitemap/unknown lines must not split UA runs)
  SELECT host, ln_idx, key, val,
         CASE WHEN key = 'user-agent' AND NOT coalesce(
                lag(key = 'user-agent') OVER
                  (PARTITION BY host ORDER BY ln_idx), FALSE)
              THEN 1 ELSE 0 END AS run_start
  FROM (SELECT * FROM parsed
        WHERE key IN ('user-agent', 'allow', 'disallow',
                      'crawl-delay'))),
blocks AS (
  SELECT host, ln_idx, key, val,
         SUM(run_start) OVER (PARTITION BY host ORDER BY ln_idx) AS block_id
  FROM marks),
agents AS (
  SELECT host, block_id, lower(val) AS ua FROM blocks
  WHERE key = 'user-agent'),
cand AS (
  SELECT host, block_id,
         CASE WHEN ua = '__AGENT__' THEN 1 ELSE 2 END AS rnk
  FROM agents WHERE ua IN ('__AGENT__', '*')),
picked AS (
  SELECT DISTINCT host, block_id
  FROM (SELECT *, MIN(rnk) OVER (PARTITION BY host) AS best FROM cand)
  WHERE rnk = best),
rules AS (
  SELECT DISTINCT b.host, b.key = 'allow' AS allow, b.val AS prefix,
         CAST(length(b.val) AS BIGINT) AS prefix_len
  FROM blocks b JOIN picked p USING (host, block_id)
  WHERE b.key IN ('allow', 'disallow') AND b.val <> '')
""".replace("__T0__", _ROBOTS_T0).replace("__T1__", _ROBOTS_T1).replace(
    "__T2__", _ROBOTS_T2).replace("__T3__", _ROBOTS_T3).replace(
    "__AGENT__", _ROBOTS_AGENT)

SQL_ROBOTS_RULES = ("WITH " + _SQL_ROBOTS_RULES_CTE
                    + "SELECT host, allow, prefix, prefix_len FROM rules")

def _sql_rule_regex(expr: str) -> str:
    """DuckDB rendering of robots.rule_regex: the IDENTICAL chain of
    literal replaces (backslash first, '*' last, trailing '$' stripped
    then re-appended as the anchor) — single-quoted DuckDB strings do
    no backslash processing, so '\\' below is a literal backslash."""
    out = (f"CASE WHEN {expr} LIKE '%$' THEN substr({expr}, 1, "
           f"length({expr}) - 1) ELSE {expr} END")
    for ch in robots.RULE_REGEX_SPECIALS:
        out = f"replace({out}, '{ch}', '\\{ch}')"
    out = f"replace({out}, '*', '.*')"
    return (f"'^' || {out} || CASE WHEN {expr} LIKE '%$' THEN '$' "
            f"ELSE '' END")


SQL_ROBOTS_GATE = ("WITH " + _SQL_ROBOTS_RULES_CTE + f""",
rls AS (
  SELECT *, prefix LIKE '%*%' OR prefix LIKE '%$' AS wild,
         {_sql_rule_regex('prefix')} AS pat
  FROM rules),
""" + """
urls AS (
  SELECT doc_id, source || '.example' AS host,
         CASE WHEN doc_id % 23 = 0 THEN '/tmp/cache'
              WHEN doc_id % 17 = 0 THEN '/private/press/kit'
              WHEN doc_id % 19 = 0 THEN '/private/account'
              WHEN doc_id % 29 = 0 THEN '/files/report.pdf'
              WHEN doc_id % 31 = 0 THEN '/articles/2/print'
              ELSE '/articles/' || CAST(doc_id % 5 AS VARCHAR) END AS path
  FROM documents),
joined AS (
  SELECT u.doc_id, u.host, u.path, r.allow, r.prefix, r.prefix_len,
         r.prefix IS NOT NULL
           AND CASE WHEN r.wild THEN regexp_matches(u.path, r.pat)
                    ELSE starts_with(u.path, r.prefix) END AS hit
  FROM urls u LEFT JOIN rls r ON u.host = r.host),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id
      ORDER BY hit DESC, prefix_len DESC NULLS LAST,
               allow DESC NULLS LAST, prefix DESC NULLS LAST) AS rn
  FROM joined)
SELECT doc_id, host, path,
       CASE WHEN hit THEN allow ELSE TRUE END AS allowed,
       CASE WHEN hit THEN prefix ELSE '' END AS matched_prefix
FROM ranked WHERE rn = 1
""")


def q_robots_sitemap_discovery(spark, sf_dir):
    """Sitemap discovery from robots.txt (sitemaps.org protocol:
    robots.parse_sitemap_directives) — ``Sitemap:`` lines are GLOBAL,
    so no user-agent group election: every non-empty value anywhere in
    the file, case preserved, deduped per host.  T0 hosts declare one
    (top of file), T2 hosts declare one twice (inside a group,
    uppercase path — the dup collapses), T1/T3 hosts none.  The
    discovered URLs are what a crawler feeds crawl.parse_sitemap."""
    return robots.parse_sitemap_directives(_robots_fixture(spark, sf_dir))


SQL_ROBOTS_SITEMAP_DISCOVERY = ("WITH " + _SQL_ROBOTS_RULES_CTE + """
SELECT DISTINCT host, val AS sitemap_url
FROM parsed WHERE key = 'sitemap' AND val <> ''
""")


# --- sitemap parsing + crawl frontier (operators/crawl.py) ----------------
# Four deterministic per-host sitemap variants keyed like the robots
# fixture: a full urlset (lastmod date + datetime forms, priority), an
# UPPERCASE minimal urlset with whitespace-padded loc (defaults: no
# lastmod, priority 0.5), a sitemapindex (nested-sitemap rows), and an
# entry-free document (no rows).
_SITEMAP_T0 = ('<?xml version="1.0"?><urlset>'
               '<url><loc>https://__HOST__/a</loc>'
               '<lastmod>2024-01-03</lastmod>'
               '<priority>0.8</priority></url>'
               '<url><loc>https://__HOST__/b</loc>'
               '<lastmod>2024-02-05T10:00:00+00:00</lastmod></url>'
               '</urlset>')
_SITEMAP_T1 = ('<URLSET><URL><LOC>  https://__HOST__/c  </LOC></URL>'
               '<URL><LOC>https://__HOST__/d</LOC>'
               '<PRIORITY>0.2</PRIORITY></URL></URLSET>')
_SITEMAP_T2 = ('<sitemapindex>'
               '<sitemap><loc>https://__HOST__/sitemap-1.xml</loc>'
               '<lastmod>2024-03-01</lastmod></sitemap>'
               '<sitemap><loc>https://__HOST__/sitemap-2.xml</loc></sitemap>'
               '</sitemapindex>')
_SITEMAP_T3 = '<?xml version="1.0"?><urlset></urlset>'


def _sitemap_fixture(spark, sf_dir):
    """Per-host sitemap table: one row per distinct source host."""
    return _host_variant_fixture(
        spark, sf_dir, [_SITEMAP_T0, _SITEMAP_T1, _SITEMAP_T2, _SITEMAP_T3],
        "sitemap_xml")


def q_sitemap_url_extract(spark, sf_dir):
    """sitemaps.org XML -> flat URL table (crawl.parse_sitemap): urlset
    entries as 'page' rows, sitemapindex entries as 'sitemap' rows;
    lastmod kept raw (date and datetime forms), priority defaulting to
    0.5.  Split on entry close tags + one regexp_extract per field —
    scan-speed, JVM-only; the sitemap table is per-HOST (tiny vs
    pages).  Reference analog: directory listing -> validated work
    list (utils/io.py:74-107)."""
    return crawl.parse_sitemap(_sitemap_fixture(spark, sf_dir))


# the sitemap parse CTE chain — ends in smap(host, entry_type, loc,
# lastmod, priority), THE one SQL mirror of crawl.parse_sitemap over
# the per-host fixture, shared by the flat-extract twin and the
# recrawl-scheduling twin
_SQL_SITEMAP_CTES = (_SQL_HOSTS_CTE + """,
sm AS (
  SELECT host,
         replace(CASE v WHEN 0 THEN '__T0__' WHEN 1 THEN '__T1__'
                        WHEN 2 THEN '__T2__' ELSE '__T3__' END,
                 '__HOST__', host) AS xml
  FROM hosts),
chunks AS (
  SELECT host, u.c AS chunk
  FROM sm, UNNEST(regexp_split_to_array(
      xml, '(?i)(?:</url>|</sitemap>)')) AS u(c)),
fields AS (
  SELECT host, chunk,
         regexp_extract(chunk, '(?i)<loc>\\s*([^<>]+?)\\s*</loc>', 1) AS loc,
         regexp_extract(chunk, '(?i)<lastmod>\\s*([^<>]+?)\\s*</lastmod>',
                        1) AS lm,
         regexp_extract(chunk, '(?i)<priority>\\s*([0-9.]+)\\s*</priority>',
                        1) AS pr
  FROM chunks),
smap AS (
  SELECT host,
         CASE WHEN regexp_matches(chunk, '(?i)<sitemap[\\s>]')
              THEN 'sitemap' ELSE 'page' END AS entry_type,
         loc,
         CASE WHEN lm <> '' THEN lm END AS lastmod,
         coalesce(try_cast(nullif(pr, '') AS DOUBLE), 0.5) AS priority
  FROM fields WHERE loc <> '')
""".replace("__T0__", _SITEMAP_T0).replace("__T1__", _SITEMAP_T1).replace(
    "__T2__", _SITEMAP_T2).replace("__T3__", _SITEMAP_T3))

SQL_SITEMAP_URL_EXTRACT = ("WITH " + _SQL_SITEMAP_CTES
                           + "SELECT * FROM smap")


def _fetch_log_fixture(spark, sf_dir):
    """Deterministic per-URL last-fetch snapshot against the sitemap
    fixture: T0 hosts fetched /a recently (fresh vs its 2024-01-03
    lastmod) and /b long ago (stale vs its 2024-02-05 lastmod) — /b
    only on even-length hosts, so odd-length T0 hosts report /b as
    never-fetched; T1 hosts (no lastmod declared) fetched /c beyond
    max_age and /d within it.  All four recrawl reasons appear at
    every sf."""
    hosts = (_t(spark, sf_dir, "documents")
             .select(F.concat(F.col("source"), F.lit(".example"))
                      .alias("host"),
                     (F.ascii(F.substring("source", -1, 1))
                      % _HOST_VARIANT_N).alias("v"))
             .distinct())

    def leg(v_val, path, lf, extra=None):
        cond = F.col("v") == v_val
        if extra is not None:
            cond = cond & extra
        return hosts.where(cond).select(
            F.concat(F.lit("https://"), F.col("host"), F.lit(path))
             .alias("url"),
            F.lit(lf).alias("last_fetch"))

    return (leg(0, "/a", "2024-01-20T00:00:00")
            .unionAll(leg(0, "/b", "2024-01-10T00:00:00",
                          F.length("host") % 2 == 0))
            .unionAll(leg(1, "/c", "2023-11-01T00:00:00"))
            .unionAll(leg(1, "/d", "2024-02-20T00:00:00")))


def q_sitemap_recrawl_candidates(spark, sf_dir):
    """Freshness-driven recrawl scheduling (crawl.recrawl_candidates):
    sitemap page entries vs the committed snapshot's fetch log —
    new / modified / aged / fresh per page, refetch flag.  as_of is a
    fixed parameter (no wall clock), lastmod compared as normalized
    UTC ISO strings, age as dates — all engine-exact.  Composition:
    parse_sitemap feeds the recrawl decision in one plan."""
    smap = crawl.parse_sitemap(_sitemap_fixture(spark, sf_dir))
    return crawl.recrawl_candidates(
        smap.where(F.col("entry_type") == "page"),
        _fetch_log_fixture(spark, sf_dir),
        as_of="2024-03-01", max_age_days=45)


SQL_SITEMAP_RECRAWL = ("WITH " + _SQL_SITEMAP_CTES + """,
fl AS (
  SELECT 'https://' || host || '/a' AS url,
         '2024-01-20T00:00:00' AS last_fetch FROM hosts WHERE v = 0
  UNION ALL
  SELECT 'https://' || host || '/b', '2024-01-10T00:00:00'
  FROM hosts WHERE v = 0 AND length(host) % 2 = 0
  UNION ALL
  SELECT 'https://' || host || '/c', '2023-11-01T00:00:00'
  FROM hosts WHERE v = 1
  UNION ALL
  SELECT 'https://' || host || '/d', '2024-02-20T00:00:00'
  FROM hosts WHERE v = 1)
SELECT host, loc, lastmod, last_fetch, reason,
       reason <> 'fresh' AS refetch
FROM (
  SELECT p.host, p.loc, p.lastmod, f.last_fetch,
         CASE WHEN f.last_fetch IS NULL THEN 'new'
              WHEN p.lastmod IS NOT NULL
                   AND regexp_replace(p.lastmod, '(\\+00:00|Z)$', '')
                       > f.last_fetch THEN 'modified'
              WHEN p.lastmod IS NULL
                   AND CAST(substr(f.last_fetch, 1, 10) AS DATE)
                       < CAST(DATE '2024-03-01' - INTERVAL 45 DAY AS DATE)
                   THEN 'aged'
              ELSE 'fresh' END AS reason
  FROM (SELECT * FROM smap WHERE entry_type = 'page') p
  LEFT JOIN fl f ON p.loc = f.url)
""")


def q_crawl_frontier_assign(spark, sf_dir):
    """Politeness-aware frontier scheduling (crawl.frontier_assign):
    candidate URLs ranked per host by priority score (one window
    partitioned by HOST — no global sort), joined to the per-host
    Crawl-delay parsed from the robots fixture
    (robots.parse_crawl_delay; hosts without a directive get the 1 s
    default), emitting fetch_round and the earliest politeness-legal
    eta_seconds.  Composition query: robots parsing feeds crawl
    scheduling end-to-end."""
    cand = (_robots_urls(spark, sf_dir)
            .select("doc_id", "host",
                    F.concat(F.lit("https://"), F.col("host"),
                             F.col("path")).alias("url"))
            .withColumn("score",
                        ((F.col("doc_id") * 37 % 100) / 10.0))
            .groupBy("host", "url")
            .agg(F.max("score").alias("score"),
                 F.min("doc_id").alias("doc_id")))
    delays = robots.parse_crawl_delay(
        _robots_fixture(spark, sf_dir), agent=_ROBOTS_AGENT)
    return (crawl.frontier_assign(cand, F.broadcast(delays))
            .select("host", "url", "doc_id", "score", "crawl_delay",
                    "fetch_round", "eta_seconds"))


SQL_CRAWL_FRONTIER_ASSIGN = ("WITH " + _SQL_ROBOTS_RULES_CTE + """,
delays AS (
  SELECT b.host, MAX(CAST(b.val AS DOUBLE)) AS crawl_delay
  FROM blocks b JOIN picked p USING (host, block_id)
  WHERE b.key = 'crawl-delay'
    AND regexp_matches(b.val, '^[0-9]+(\\.[0-9]+)?$')
  GROUP BY b.host),
urls0 AS (
  SELECT doc_id, source || '.example' AS host,
         CASE WHEN doc_id % 23 = 0 THEN '/tmp/cache'
              WHEN doc_id % 17 = 0 THEN '/private/press/kit'
              WHEN doc_id % 19 = 0 THEN '/private/account'
              WHEN doc_id % 29 = 0 THEN '/files/report.pdf'
              WHEN doc_id % 31 = 0 THEN '/articles/2/print'
              ELSE '/articles/' || CAST(doc_id % 5 AS VARCHAR) END AS path,
         (doc_id * 37 % 100) / 10.0 AS score
  FROM documents),
fcand AS (
  SELECT host, 'https://' || host || path AS url,
         MAX(score) AS score, MIN(doc_id) AS doc_id
  FROM urls0 GROUP BY host, 'https://' || host || path)
SELECT c.host, c.url, c.doc_id, c.score,
       coalesce(d.crawl_delay, 1.0) AS crawl_delay,
       CAST(row_number() OVER (
           PARTITION BY c.host ORDER BY c.score DESC, c.url)
         AS INTEGER) AS fetch_round,
       (row_number() OVER (
           PARTITION BY c.host ORDER BY c.score DESC, c.url) - 1)
         * coalesce(d.crawl_delay, 1.0) AS eta_seconds
FROM fcand c LEFT JOIN delays d ON c.host = d.host
""")


def q_crawl_budget_allocation(spark, sf_dir):
    """Proportional crawl-budget split across hosts by largest
    remainder (crawl.allocate_crawl_budget): score = per-host total
    text chars (varies per host), budget = 997 (prime, so integer
    remainders are guaranteed and the top-up path is exercised at
    every sf).  sum(quota) == budget exactly; all arithmetic
    BIGINT-exact on both engines."""
    docs = _t(spark, sf_dir, "documents")
    hs = (docs
          .groupBy(F.concat(F.col("source"), F.lit(".example"))
                    .alias("host"))
          .agg(F.sum(F.length("text")).cast("long").alias("score")))
    return crawl.allocate_crawl_budget(hs, budget=997)


SQL_CRAWL_BUDGET_ALLOCATION = """
WITH hs AS (
  SELECT source || '.example' AS host,
         CAST(SUM(length(text)) AS BIGINT) AS score
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(score) AS BIGINT) AS t FROM hs),
base AS (
  SELECT host, score,
         CASE WHEN t > 0 AND score > 0
              THEN CAST(FLOOR(score * 997 / t) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS base,
         CASE WHEN t > 0 AND score > 0
              THEN (score * 997) % t
              ELSE CAST(0 AS BIGINT) END AS rem
  FROM hs, tot),
lv AS (
  -- zero-mass guard mirrors the Spark operator: no positive score ->
  -- no top-ups (else the twin would hand the whole budget out 1-by-1)
  SELECT CASE WHEN MAX(t) > 0 THEN CAST(997 - SUM(base) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS leftv
  FROM base, tot)
SELECT host, score,
       CAST(base + CASE WHEN row_number() OVER (ORDER BY rem DESC, host)
                             <= leftv
                        THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM base, lv
"""


def q_url_quality_gate(spark, sf_dir):
    """RefinedWeb-style URL-string quality gate
    (webnorm.url_quality_features) over deterministically junked URLs:
    depth d%8 (7 exceeds the max-6 gate), an 11-digit session token on
    d%6==0 (exceeds the max-8 run), 5 query params on d%7==0 (exceeds
    4), a 4-hyphen host prefix on d%9==0 (exceeds 3) — every gate and
    the keep path all fire at every sf, and first-fail ordering is
    exercised by the overlaps (e.g. d divisible by 42)."""
    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://"),
        F.when(d % 9 == 0, F.lit("a-b-c-d-")).otherwise(F.lit("")),
        F.col("source"), F.lit(".example"),
        F.expr("repeat('/seg', CAST(doc_id % 8 AS INT))"),
        F.when(d % 6 == 0, F.lit("/p12345678901")).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit("?x=1&y=2&z=3&w=4&v=5"))
         .otherwise(F.lit("")))
    pages = _t(spark, sf_dir, "documents").select("doc_id",
                                                  url.alias("url"))
    return webnorm.url_quality_features(pages)


SQL_URL_QUALITY_GATE = """
WITH pages AS (
  SELECT doc_id,
         'https://'
         || CASE WHEN doc_id % 9 = 0 THEN 'a-b-c-d-' ELSE '' END
         || source || '.example'
         || repeat('/seg', CAST(doc_id % 8 AS INT))
         || CASE WHEN doc_id % 6 = 0 THEN '/p12345678901' ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN '?x=1&y=2&z=3&w=4&v=5'
                 ELSE '' END AS url
  FROM documents),
parts AS (
  SELECT doc_id, url, regexp_extract(url, '^([^#]*)', 1) AS u
  FROM pages),
parts2 AS (
  SELECT doc_id, url,
         regexp_replace(lower(regexp_extract(u,
             '^[A-Za-z]+://([^/?#]+)', 1)), '^www\\.', '') AS host,
         regexp_extract(u, '^[A-Za-z]+://[^/?#]*([^?#]*)', 1) AS path,
         regexp_extract(u, '\\?(.*)', 1) AS query,
         url IS NOT NULL
           AND regexp_matches(u, '^[A-Za-z]+://[^/?#]') AS valid
  FROM parts),
feats AS (
  SELECT doc_id, url, host, valid,
         len(list_filter(string_split(path, '/'), s -> s <> ''))
           AS path_depth,
         len(list_filter(string_split(query, '&'), s -> s <> ''))
           AS n_params,
         round((length(path)
                - length(regexp_replace(path, '[0-9]', '', 'g')))
               / greatest(length(path), 1), 6) AS digit_ratio_r,
         coalesce(list_max(list_transform(
             regexp_extract_all(path, '[0-9]+'), x -> length(x))), 0)
           AS longest_digit_run,
         length(host) - length(replace(host, '-', '')) AS host_hyphens
  FROM parts2)
SELECT doc_id, url, host,
       CAST(path_depth AS INTEGER) AS path_depth,
       CAST(n_params AS INTEGER) AS n_params,
       digit_ratio_r,
       CAST(longest_digit_run AS INTEGER) AS longest_digit_run,
       CAST(host_hyphens AS INTEGER) AS host_hyphens,
       reason = '' AS keep, reason AS drop_reason
FROM (
  SELECT *,
         CASE WHEN NOT coalesce(valid, FALSE) THEN 'invalid'
              WHEN path_depth > 6 THEN 'path_depth'
              WHEN longest_digit_run > 8 THEN 'digit_run'
              WHEN n_params > 4 THEN 'n_params'
              WHEN host_hyphens > 3 THEN 'host_hyphens'
              ELSE '' END AS reason
  FROM feats)
"""


def q_url_template_census(spark, sf_dir):
    """Crawl-trap detection (webnorm.url_template_census) over
    deterministic trap-shaped URLs: per host, d%3 routes each doc to a
    calendar trap (/cal/YEAR/d — one digit-template, pure digit
    churn), an id-churn trap (/page?id=d — one path template, query
    churn), or a small letter-keyed article set (distinct templates,
    never trap).  Thresholds scaled to the fixture (>= 5 URLs,
    distinct ratio <= 0.34) so both trap kinds AND the non-trap path
    fire at every sf."""
    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example"),
        F.when(d % 3 == 0,
               F.concat(F.lit("/cal/2024/"), d.cast("string")))
         .when(d % 3 == 1,
               F.concat(F.lit("/page?id="), d.cast("string")))
         .otherwise(F.concat(F.lit("/article/"),
                             F.substring(F.lit("abcde"),
                                         (d % 5 + 1).cast("int"), 1))))
    pages = _t(spark, sf_dir, "documents").select(url.alias("url"))
    return webnorm.url_template_census(
        pages, trap_min_urls=5, trap_max_distinct_ratio=0.34)


SQL_URL_TEMPLATE_CENSUS = """
WITH pages AS (
  SELECT 'https://' || source || '.example'
         || CASE WHEN doc_id % 3 = 0
                 THEN '/cal/2024/' || CAST(doc_id AS VARCHAR)
                 WHEN doc_id % 3 = 1
                 THEN '/page?id=' || CAST(doc_id AS VARCHAR)
                 ELSE '/article/'
                      || substr('abcde', CAST(doc_id % 5 + 1 AS INT), 1)
            END AS url
  FROM documents),
parts AS (
  SELECT url, regexp_extract(url, '^([^#]*)', 1) AS u FROM pages),
norm AS (
  SELECT u,
         __CANON_HOST__ AS host,
         regexp_replace(regexp_extract(u,
             '^[A-Za-z]+://[^/?#]*([^?#]*)', 1), '[0-9]+', 'N', 'g')
           AS template,
         regexp_replace(u, '[0-9]+', '', 'g') AS nd
  FROM parts),
census AS (
  SELECT host, template,
         CAST(COUNT(DISTINCT u) AS BIGINT) AS n_urls,
         CAST(COUNT(DISTINCT nd) AS BIGINT) AS n_distinct_nodigit
  FROM norm GROUP BY host, template)
SELECT host, template, n_urls, n_distinct_nodigit,
       round(n_distinct_nodigit / greatest(n_urls, 1), 6)
         AS distinct_ratio_r,
       n_urls >= 5
         AND round(n_distinct_nodigit / greatest(n_urls, 1), 6) <= 0.34
         AS is_trap
FROM census
""".replace("__CANON_HOST__",
    webnorm.CANONICAL_HOST_SQL.format(col="u"))


def _linedoc_text_col():
    """Deterministic MULTILINE page text for host-boilerplate queries:
    a host-wide nav line (every page), a host-wide footer on even
    doc_ids (~half the host's pages), a 'promo' line on doc_id%3==0
    pages (~a third — below the census threshold), and a unique body
    line per page."""
    d = F.col("doc_id")
    return F.concat_ws(
        "\n",
        F.concat(F.lit("Home | About | "), F.col("source")),
        F.when(d % 2 == 0,
               F.concat(F.lit("(c) 2024 "), F.col("source"))),
        F.when(d % 3 == 0, F.lit("promo of the week")),
        F.concat(F.lit("body "), d.cast("string"), F.lit(" "),
                 F.substring("text", 1, 40)))


def q_host_boilerplate_lines(spark, sf_dir):
    """Host-SCOPED boilerplate census (dedup.host_boilerplate_lines):
    trimmed lines on >= 40% of a host's pages (>= 2 pages) — the
    per-site complement of corpus-wide line_dedup (a small host's
    footer is boilerplate even at tiny global count; a popular quote
    across hosts is not).  One distinct + partial-agg census + an
    equi-join on host.  Expected rows per host: the nav line (frac
    1.0) and the even-doc footer (frac ~0.5)."""
    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.col("doc_id"),
        F.concat(F.col("source"), F.lit(".example")).alias("host"),
        _linedoc_text_col().alias("text"))
    return dedup.host_boilerplate_lines(pages, min_frac=0.4, min_pages=2)


SQL_HOST_BOILERPLATE_LINES = """
WITH pages AS (
  SELECT doc_id, source || '.example' AS host,
         concat_ws(chr(10),
           'Home | About | ' || source,
           CASE WHEN doc_id % 2 = 0 THEN '(c) 2024 ' || source END,
           CASE WHEN doc_id % 3 = 0 THEN 'promo of the week' END,
           'body ' || CAST(doc_id AS VARCHAR) || ' ' || substr(text, 1, 40)
         ) AS text
  FROM documents),
hp AS (
  SELECT host, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS host_pages
  FROM pages GROUP BY host),
lines AS (
  SELECT DISTINCT host, doc_id, trim(u.ln) AS line
  FROM pages, UNNEST(regexp_split_to_array(text, '\\r?\\n')) AS u(ln)
  WHERE trim(u.ln) <> ''),
census AS (
  SELECT host, line, CAST(COUNT(*) AS BIGINT) AS n_pages
  FROM lines GROUP BY host, line)
SELECT c.host, c.line, c.n_pages, h.host_pages,
       round(c.n_pages / CAST(h.host_pages AS DOUBLE), 6) AS frac
FROM census c JOIN hp h ON c.host = h.host
WHERE c.n_pages >= 2
  AND round(c.n_pages / CAST(h.host_pages AS DOUBLE), 6) >= 0.4
"""


def _redirect_fixture(spark, sf_dir):
    """Deterministic redirect map derived from documents.doc_id — one
    namespace per shape so every resolver branch is exercised:
      p{d} -> p{d-1} for d%12 != 0   chains of length d%12 (1..11) down
                                     to the terminal p{12*floor(d/12)};
                                     9..11 exceed max_hops=8
      c{d}a <-> c{d}b                a guaranteed 2-cycle per doc (both
                                     rows emitted from the SAME doc_id,
                                     so no cross-row existence bets)
      s{d} -> s{d} for d%10 == 0     self-loops"""
    d = F.col("doc_id")
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    pre = F.lit("https://r.example/")
    chain = docs.where(d % 12 != 0).select(
        F.concat(pre, F.lit("p"), d.cast("string")).alias("src"),
        F.concat(pre, F.lit("p"), (d - 1).cast("string")).alias("dst"))
    ca = F.concat(pre, F.lit("c"), d.cast("string"), F.lit("a"))
    cb = F.concat(pre, F.lit("c"), d.cast("string"), F.lit("b"))
    cyc = docs.select(ca.alias("src"), cb.alias("dst")).unionAll(
        docs.select(cb.alias("src"), ca.alias("dst")))
    loops = docs.where(d % 10 == 0).select(
        F.concat(pre, F.lit("s"), d.cast("string")).alias("src"),
        F.concat(pre, F.lit("s"), d.cast("string")).alias("dst"))
    return chain.unionAll(cyc).unionAll(loops)


def q_url_redirect_resolve(spark, sf_dir):
    """HTTP redirect-chain resolution (crawl.resolve_redirects):
    pointer doubling over the src->dst map — ceil(log2(max_hops))
    self-joins instead of max_hops iterations; chains within 8 hops
    resolve to their terminal with an exact hop count, cycles and
    longer chains come out resolved=false.  NULL sentinels ('' / 0)
    keep the cross-engine hash free of nullable-int coercion.  DuckDB
    twin: WITH RECURSIVE bounded at the same max_hops."""
    out = crawl.resolve_redirects(_redirect_fixture(spark, sf_dir),
                                  max_hops=8)
    return out.select(
        "src",
        F.coalesce("final_url", F.lit("")).alias("final_url"),
        F.coalesce("hops", F.lit(0)).alias("hops"),
        "resolved")


SQL_URL_REDIRECT_RESOLVE = """
WITH RECURSIVE redirects AS (
  SELECT 'https://r.example/p' || CAST(doc_id AS VARCHAR) AS src,
         'https://r.example/p' || CAST(doc_id - 1 AS VARCHAR) AS dst
  FROM documents WHERE doc_id % 12 <> 0
  UNION ALL
  SELECT 'https://r.example/c' || CAST(doc_id AS VARCHAR) || 'a',
         'https://r.example/c' || CAST(doc_id AS VARCHAR) || 'b'
  FROM documents
  UNION ALL
  SELECT 'https://r.example/c' || CAST(doc_id AS VARCHAR) || 'b',
         'https://r.example/c' || CAST(doc_id AS VARCHAR) || 'a'
  FROM documents
  UNION ALL
  SELECT 'https://r.example/s' || CAST(doc_id AS VARCHAR),
         'https://r.example/s' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % 10 = 0),
walk AS (
  SELECT r.src, r.dst AS cur, 1 AS hops,
         r.dst NOT IN (SELECT src FROM redirects) AS done
  FROM redirects r
  UNION ALL
  SELECT w.src, r2.dst, w.hops + 1,
         r2.dst NOT IN (SELECT src FROM redirects)
  FROM walk w JOIN redirects r2 ON w.cur = r2.src
  WHERE NOT w.done AND w.hops < 8)
SELECT src,
       coalesce(MAX(CASE WHEN done THEN cur END), '') AS final_url,
       coalesce(MAX(CASE WHEN done THEN hops END), 0) AS hops,
       bool_or(done) AS resolved
FROM walk GROUP BY src
"""


def q_frontier_url_resolve(spark, sf_dir):
    """Frontier alias collapse end-to-end (crawl.resolve_frontier_urls):
    dirty discovered URLs -> canonical form -> redirect chains folded ->
    direct / redirected / dead classification.  The dirty URL targets
    p{doc_id % 36} in the redirect fixture's namespace, so all three
    statuses appear at every sf: k%12==0 terminals are direct, chain
    lengths 1..8 redirect, 9..11 dead-end past max_hops.  Composition
    query: canonicalization (webnorm) x pointer doubling (crawl) in one
    plan.  Stateless-twin discipline: the fixture map is already in
    canonical form, so the operator's map-side canonicalization +
    collapse is an identity here and the twin certifies the resolution
    semantics; the dirty-map path is pinned Spark-side by unit test."""
    d = F.col("doc_id")
    raw = F.concat(
        F.when(d % 2 == 0, F.lit("HTTPS://")).otherwise(F.lit("https://")),
        F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("r.example/p"), (d % 36).cast("string"),
        F.when(d % 7 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 4 == 0, F.lit("?utm_source=x")).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("#top")).otherwise(F.lit("")))
    pages = _t(spark, sf_dir, "documents").select("doc_id",
                                                  raw.alias("url"))
    out = crawl.resolve_frontier_urls(
        pages, _redirect_fixture(spark, sf_dir), max_hops=8)
    return out.select(
        "doc_id", "canonical_url",
        F.coalesce("final_url", F.lit("")).alias("final_url"),
        "status")


SQL_FRONTIER_URL_RESOLVE = ("""
WITH RECURSIVE raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END
         || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END
         || 'r.example/p' || CAST(doc_id % 36 AS VARCHAR)
         || CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END
         || CASE WHEN doc_id % 4 = 0 THEN '?utm_source=x' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN '#top' ELSE '' END AS url
  FROM documents),
""" + _SQL_CANON_CTES + """,
redirects AS (
  SELECT 'https://r.example/p' || CAST(doc_id AS VARCHAR) AS src,
         'https://r.example/p' || CAST(doc_id - 1 AS VARCHAR) AS dst
  FROM documents WHERE doc_id % 12 <> 0
  UNION ALL
  SELECT 'https://r.example/c' || CAST(doc_id AS VARCHAR) || 'a',
         'https://r.example/c' || CAST(doc_id AS VARCHAR) || 'b'
  FROM documents
  UNION ALL
  SELECT 'https://r.example/c' || CAST(doc_id AS VARCHAR) || 'b',
         'https://r.example/c' || CAST(doc_id AS VARCHAR) || 'a'
  FROM documents
  UNION ALL
  SELECT 'https://r.example/s' || CAST(doc_id AS VARCHAR),
         'https://r.example/s' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % 10 = 0),
walk AS (
  SELECT r.src, r.dst AS cur, 1 AS hops,
         r.dst NOT IN (SELECT src FROM redirects) AS done
  FROM redirects r
  UNION ALL
  SELECT w.src, r2.dst, w.hops + 1,
         r2.dst NOT IN (SELECT src FROM redirects)
  FROM walk w JOIN redirects r2 ON w.cur = r2.src
  WHERE NOT w.done AND w.hops < 8),
res AS (
  SELECT src, MAX(CASE WHEN done THEN cur END) AS target,
         bool_or(done) AS resolved
  FROM walk GROUP BY src)
SELECT c.doc_id, c.canonical_url,
       CASE WHEN c.canonical_url IS NULL
              OR NOT regexp_matches(c.canonical_url, '^[a-z]+://[^/?#]')
            THEN ''
            WHEN r.src IS NULL THEN c.canonical_url
            WHEN r.resolved THEN r.target
            ELSE '' END AS final_url,
       CASE WHEN c.canonical_url IS NULL
              OR NOT regexp_matches(c.canonical_url, '^[a-z]+://[^/?#]')
            THEN 'dead'
            WHEN r.src IS NULL THEN 'direct'
            WHEN r.resolved THEN 'redirected'
            ELSE 'dead' END AS status
FROM canon c LEFT JOIN res r ON c.canonical_url = r.src
""")


# --- web-archive sidecars: WET export, CDX index, revisit dedup ----------
# All three project the documents table into a deterministic pages shape
# (same idiom as q_warc_roundtrip) so the DuckDB twin can rebuild every
# byte/field relationally.

def _synth_warc_date(d):
    """Deterministic per-doc fetch time, 2024-01-01T HH:MM:00Z."""
    return F.concat(
        F.lit("2024-01-01T"),
        F.lpad(F.floor((d % 1440) / 60).cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad((d % 60).cast("string"), 2, "0"),
        F.lit(":00Z"))


_SQL_SYNTH_WARC_DATE = ("'2024-01-01T' || "
                        "lpad(CAST((doc_id % 1440) // 60 AS VARCHAR), 2, '0')"
                        " || ':' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')"
                        " || ':00Z'")


def q_wet_export(spark, sf_dir):
    """WET archival export certification (sources/warc.py wet_records —
    the jobs/extract.py --wet surface): serialize every document's text
    as a WARC/1.0 conversion record and emit (url, byte length, md5) of
    the record.  The DuckDB twin rebuilds the record byte-for-byte with
    string concatenation — header order, CRLF framing, Content-Length
    arithmetic — so a hash match certifies the export bytes against an
    independent construction, not just against our own parser.

    The one Arrow-batched UDF is the record assembler itself (byte
    framing is the thing under test); everything around it is a narrow
    three-column scan with no shuffle."""
    from ..sources.warc import wet_records

    d = F.col("doc_id")
    docs = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example/wet/"),
                 d.cast("string")).alias("url"),
        F.to_timestamp(_synth_warc_date(d), "yyyy-MM-dd'T'HH:mm:ss'Z'")
         .alias("warc_ts"),
        F.coalesce(F.col("text"), F.lit("")).alias("txt"))
    wet = wet_records(docs, text_col="txt")
    return wet.select(
        "url",
        F.length("wet_record").cast("bigint").alias("wet_len"),
        F.md5("wet_record").alias("wet_md5"))


SQL_WET_EXPORT = f"""
WITH base AS (
  SELECT 'https://' || source || '.example/wet/' || CAST(doc_id AS VARCHAR)
           AS url,
         {_SQL_SYNTH_WARC_DATE} AS warc_date,
         COALESCE(text, '') AS txt
  FROM documents),
rec AS (
  SELECT url,
         'WARC/1.0' || chr(13) || chr(10)
           || 'WARC-Type: conversion' || chr(13) || chr(10)
           || 'WARC-Target-URI: ' || url || chr(13) || chr(10)
           || 'WARC-Date: ' || warc_date || chr(13) || chr(10)
           || 'Content-Type: text/plain' || chr(13) || chr(10)
           || 'Content-Length: ' || CAST(strlen(txt) AS VARCHAR)
           || chr(13) || chr(10) || chr(13) || chr(10)
           || txt || chr(13) || chr(10) || chr(13) || chr(10) AS r
  FROM base)
SELECT url, CAST(strlen(r) AS BIGINT) AS wet_len, md5(r) AS wet_md5
FROM rec
"""


def _synth_cdx_pages(spark, sf_dir) -> DataFrame:
    """The documents table projected to pages with five deliberately
    messy URL shapes per doc_id%5 — upper-case scheme/host, www prefix,
    default and non-default ports, utm tracking params, unsorted query
    params, SPA fragment with an embedded '?' — the shared input of the
    cdx_index and cdx_shard_boundaries twins (_SQL_CDX_KEYED mirrors
    it)."""
    d = F.col("doc_id")
    m = d % 5
    ds = d.cast("string")
    src = F.col("source")
    url = (F.when(m == 0, F.concat(F.lit("HTTPS://WWW."), F.upper(src),
                                   F.lit(".Example.COM/Articles/"), ds))
           .when(m == 1, F.concat(F.lit("https://"), src,
                                  F.lit(".example.com:8080/a/"), ds,
                                  F.lit("?b=2&a=1")))
           .when(m == 2, F.concat(F.lit("http://"), src,
                                  F.lit(".example.com:80/x/"), ds,
                                  F.lit("/?utm_source=feed&id="), ds))
           .when(m == 3, F.concat(F.lit("https://"), src,
                                  F.lit(".example.com/p/"), ds,
                                  F.lit("#frag?x=1")))
           .otherwise(F.concat(F.lit("https://sub."), src,
                               F.lit(".example.com/path/"), ds,
                               F.lit("?z=9&y=8&x=7"))))
    return _t(spark, sf_dir, "documents").select(
        url.alias("url"),
        F.to_timestamp(_synth_warc_date(d), "yyyy-MM-dd'T'HH:mm:ss'Z'")
         .alias("warc_ts"),
        F.concat(F.lit("<html><body>"), F.coalesce(F.col("text"), F.lit("")),
                 F.lit("</body></html>")).alias("html"))


def q_cdx_index(spark, sf_dir):
    """CDX capture index (sources/warc.py cdx_index + webnorm.surt_key)
    over the messy synthetic URL shapes: the SURT sort key plus
    ts14/digest/byte-length.  The DuckDB twin re-derives the SURT
    transform step by step (fragment drop, host fold, label reversal,
    port policy, query sort), so a hash match certifies the key's exact
    grammar cross-engine.

    Pure built-ins, no shuffle — this runs at scan speed over the page
    table; the (surt, ts14) pair is the archive's range-query key."""
    from ..sources.warc import cdx_index

    return cdx_index(_synth_cdx_pages(spark, sf_dir))


# the WITH chain shared by the cdx_index and cdx_shard_boundaries twins:
# messy synthetic URLs -> SURT key, re-derived step by step in SQL
_SQL_CDX_KEYED = f"""
WITH base AS (
  SELECT doc_id,
         CASE doc_id % 5
           WHEN 0 THEN 'HTTPS://WWW.' || upper(source)
                       || '.Example.COM/Articles/' || CAST(doc_id AS VARCHAR)
           WHEN 1 THEN 'https://' || source || '.example.com:8080/a/'
                       || CAST(doc_id AS VARCHAR) || '?b=2&a=1'
           WHEN 2 THEN 'http://' || source || '.example.com:80/x/'
                       || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&id='
                       || CAST(doc_id AS VARCHAR)
           WHEN 3 THEN 'https://' || source || '.example.com/p/'
                       || CAST(doc_id AS VARCHAR) || '#frag?x=1'
           ELSE 'https://sub.' || source || '.example.com/path/'
                       || CAST(doc_id AS VARCHAR) || '?z=9&y=8&x=7'
         END AS url,
         {_SQL_SYNTH_WARC_DATE} AS warc_date,
         '<html><body>' || COALESCE(text, '') || '</body></html>' AS html
  FROM documents),
surt AS (
  SELECT url, warc_date, html,
         regexp_extract(url, '^([^#]*)', 1) AS u
  FROM base),
parts AS (
  SELECT url, warc_date, html, u,
         {webnorm.CANONICAL_HOST_SQL.format(col='u')} AS host,
         lower(regexp_replace(
             regexp_extract(u, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
             '/$', '')) AS path,
         regexp_extract(u, '\\?(.*)', 1) AS q
  FROM surt),
keyed AS (
  SELECT url, warc_date, html,
         array_to_string(
           list_reverse(string_split(regexp_replace(host, ':[0-9]+$', ''),
                                     '.')), ',')
         || CASE WHEN regexp_extract(host, ':([0-9]+)$', 1)
                      IN ('', '80', '443') THEN ''
                 ELSE ':' || regexp_extract(host, ':([0-9]+)$', 1) END
         || ')' || path
         || CASE WHEN kept = '' THEN '' ELSE '?' || kept END AS surt
  FROM (SELECT *,
               COALESCE(array_to_string(
                 list_sort(list_filter(string_split(lower(q), '&'),
                   x -> NOT (x LIKE 'utm\\_%' ESCAPE '\\') AND x <> '')),
                 '&'), '') AS kept
        FROM parts)),
cdx AS (
  SELECT surt,
         replace(replace(replace(substr(warc_date, 1, 19), '-', ''),
                 ':', ''), 'T', '') AS ts14,
         url, md5(html) AS digest,
         CAST(strlen(html) AS BIGINT) AS n_bytes
  FROM keyed)
"""

SQL_CDX_INDEX = _SQL_CDX_KEYED + """
SELECT surt, ts14, url, digest, n_bytes FROM cdx
"""

# ONE shard count shared by the Spark query and its DuckDB twin — a
# mismatch would make the cross-engine hash comparison certify nothing
N_CDX_SHARDS = 8

SQL_CDX_SHARDS = _SQL_CDX_KEYED + f"""
, ranked AS (
  SELECT surt, ts14, url,
         ntile({N_CDX_SHARDS}) OVER (ORDER BY surt, ts14, url) - 1 AS shard,
         row_number() OVER (ORDER BY surt, ts14, url) AS rn
  FROM cdx)
SELECT shard,
       min_by(surt, rn) AS first_surt,
       min_by(ts14, rn) AS first_ts14,
       max_by(surt, rn) AS last_surt,
       max_by(ts14, rn) AS last_ts14,
       CAST(COUNT(*) AS BIGINT) AS n_captures
FROM ranked
GROUP BY shard
"""


def q_cdx_shard_boundaries(spark, sf_dir):
    """Two-level archive index (sources/warc.py cdx_shard_boundaries —
    the Common Crawl cluster.idx analog): the CDX total order split
    into 8 contiguous shards with first/last (surt, ts14) keys and
    capture counts.  The DuckDB twin re-derives the same boundaries
    with its own ntile/min_by, certifying the shard arithmetic and the
    SURT total order end to end."""
    from ..sources.warc import cdx_index, cdx_shard_boundaries

    return cdx_shard_boundaries(cdx_index(_synth_cdx_pages(spark, sf_dir)),
                                N_CDX_SHARDS)


def q_warc_revisit_dedup(spark, sf_dir):
    """URL-agnostic crawl dedup via WARC revisit records (sources/warc.py
    revisit_marks): documents are grouped in synthetic duplicate triples
    (payload = the group's min text), and the first capture per digest
    stays a 'response' while later ones become 'revisit' rows carrying
    WARC-Refers-To pointers.  The DuckDB twin re-derives the marking
    with its own window functions.

    Fetch time is carried as the fixed-format WARC date STRING (sorts
    identically to the instant; keeps the cross-engine artifact free of
    timestamp-rendering drift).  One uniform hash shuffle on the md5
    digest — no skew at any corpus size."""
    from ..sources.warc import revisit_marks

    d = F.col("doc_id")
    base = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example/rv/"),
                 d.cast("string")).alias("url"),
        _synth_warc_date(d).alias("warc_date"),
        F.floor(d / 3).alias("grp"), "text")
    w = Window.partitionBy("grp")
    pages = base.withColumn(
        "payload", F.coalesce(F.min("text").over(w), F.lit("")))
    rv = revisit_marks(pages, ts_col="warc_date", payload_col="payload")
    return rv.select(
        "url", "warc_date", "digest", "record_type",
        F.coalesce("refers_to_url", F.lit("")).alias("refers_to_url"),
        F.coalesce("refers_to_ts", F.lit("")).alias("refers_to_ts"))


SQL_WARC_REVISIT = f"""
WITH base AS (
  SELECT doc_id,
         'https://' || source || '.example/rv/' || CAST(doc_id AS VARCHAR)
           AS url,
         {_SQL_SYNTH_WARC_DATE} AS warc_date,
         doc_id // 3 AS grp, text
  FROM documents),
pay AS (
  SELECT url, warc_date,
         md5(COALESCE(MIN(text) OVER (PARTITION BY grp), '')) AS digest
  FROM base),
marked AS (
  SELECT url, warc_date, digest,
         ROW_NUMBER() OVER w AS rn,
         FIRST_VALUE(url) OVER w AS orig_url,
         FIRST_VALUE(warc_date) OVER w AS orig_date
  FROM pay
  WINDOW w AS (PARTITION BY digest ORDER BY warc_date, url))
SELECT url, warc_date, digest,
       CASE WHEN rn = 1 THEN 'response' ELSE 'revisit' END AS record_type,
       CASE WHEN rn = 1 THEN '' ELSE orig_url END AS refers_to_url,
       CASE WHEN rn = 1 THEN '' ELSE orig_date END AS refers_to_ts
FROM marked
"""


def _synth_wat_html_col():
    """Deterministic page markup for the WAT twin: a <title> with
    doubled internal whitespace (exercises normalization), an embedded
    double quote AND a backslash (exercises BOTH JSON escapes), one
    absolute link always, plus a relative link (doc_id%3==0) and a
    second absolute link with query params (doc_id%4==0) so link
    counts and array order vary per row."""
    d, s, lang = F.col("doc_id"), F.col("source"), F.col("lang")
    ds = d.cast("string")
    return F.concat(
        F.lit('<html><head><title> Doc  '), ds,
        F.lit(' "'), lang, F.lit('" \\ '), s,
        F.lit(' </title></head><body><a href="https://out.'), s,
        F.lit(".example/p/"), (d % 7).cast("string"), F.lit('">x</a>'),
        F.when(d % 3 == 0,
               F.concat(F.lit("<a href='/rel/"), (d % 5).cast("string"),
                        F.lit("'>y</a>"))).otherwise(F.lit("")),
        F.when(d % 4 == 0,
               F.lit('<a href="https://two.example/q?a=1&b=2">z</a>'))
         .otherwise(F.lit("")),
        F.lit("</body></html>"))


_SQL_SYNTH_WAT_HTML = """
    '<html><head><title> Doc  ' || CAST(doc_id AS VARCHAR)
    || ' "' || lang || '" \\ ' || source
    || ' </title></head><body><a href="https://out.' || source
    || '.example/p/' || CAST(doc_id % 7 AS VARCHAR) || '">x</a>'
    || CASE WHEN doc_id % 3 = 0
            THEN '<a href=''/rel/' || CAST(doc_id % 5 AS VARCHAR)
                 || '''>y</a>' ELSE '' END
    || CASE WHEN doc_id % 4 = 0
            THEN '<a href="https://two.example/q?a=1&b=2">z</a>'
            ELSE '' END
    || '</body></html>'
"""


def q_wat_export(spark, sf_dir):
    """WAT metadata-sidecar certification (sources/warc.py wat_records
    — the third Common Crawl sidecar next to WET text and the CDX
    index): per page, the WARC/1.0 metadata record whose JSON payload
    carries the envelope headers plus the normalized <title> and every
    href in document order.  Emits (url, n_links, byte length, md5 of
    the record); the DuckDB twin rebuilds the record byte-for-byte —
    title regexp + whitespace collapse, href extraction, the two-step
    JSON escape chain, Content-Length byte arithmetic, CRLF framing —
    so a hash match certifies the export bytes against an independent
    construction.

    Unlike WET (a bytes-UDF assembler), the WAT path is pure built-ins
    at scan speed: no Python, no shuffle, codegen end to end."""
    from ..sources.warc import wat_records

    _pin_utc(spark)  # WARC-Date renders UTC; the twin is naive wall time
    d = F.col("doc_id")
    pages = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example/wat/"),
                 d.cast("string")).alias("url"),
        F.to_timestamp(_synth_warc_date(d), "yyyy-MM-dd'T'HH:mm:ss'Z'")
         .alias("warc_ts"),
        _synth_wat_html_col().alias("html"))
    wat = wat_records(pages)
    return wat.select(
        "url", "n_links",
        F.octet_length("wat_record").cast("bigint").alias("wat_len"),
        F.md5("wat_record").alias("wat_md5"))


def _sql_wat_export() -> str:
    from .expected_spec import _sql_str as lit
    from ..operators import webnorm as w

    # the mirror of warc._json_escaped: backslash, quote, then the
    # \r/\n/\t two-char escapes, then delete the remaining C0 controls
    esc = ("regexp_replace(replace(replace(replace(replace(replace("
           "{col}, '\\', '\\\\'), '\"', '\\\"'), chr(13), '\\r'), "
           "chr(10), '\\n'), chr(9), '\\t'), "
           "'[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g')")
    links = w.HREF_EXTRACT_SQL.format(col="html")
    return f"""
WITH base AS (
  SELECT 'https://' || source || '.example/wat/' || CAST(doc_id AS VARCHAR)
           AS url,
         {_SQL_SYNTH_WARC_DATE} AS warc_date,
         ({_SQL_SYNTH_WAT_HTML}) AS html
  FROM documents),
parsed AS (
  SELECT url, warc_date,
         trim(regexp_replace(
             regexp_extract(html, {lit(w.TITLE_PATTERN)}, 1),
             '\\s+', ' ', 'g')) AS title,
         {links} AS links
  FROM base),
pay AS (
  SELECT url, warc_date, CAST(len(links) AS INT) AS n_links,
         '{{"Envelope":{{"WARC-Header-Metadata":{{"WARC-Target-URI":"'
           || {esc.format(col="url")}
           || '","WARC-Date":"' || warc_date
           || '"}},"Payload-Metadata":{{"HTML-Metadata":{{"Head":{{"Title":"'
           || {esc.format(col="title")}
           || '"}},"Links":['
           || COALESCE(array_to_string(list_transform(links,
                  l -> '{{"url":"' || {esc.format(col="l")} || '"}}'), ','),
                '')
           || ']}}}}}}}}' AS payload
  FROM parsed),
rec AS (
  SELECT url, n_links,
         'WARC/1.0' || chr(13) || chr(10)
           || 'WARC-Type: metadata' || chr(13) || chr(10)
           || 'WARC-Target-URI: ' || url || chr(13) || chr(10)
           || 'WARC-Date: ' || warc_date || chr(13) || chr(10)
           || 'Content-Type: application/json' || chr(13) || chr(10)
           || 'Content-Length: ' || CAST(strlen(payload) AS VARCHAR)
           || chr(13) || chr(10) || chr(13) || chr(10)
           || payload || chr(13) || chr(10) || chr(13) || chr(10) AS r
  FROM pay)
SELECT url, n_links, CAST(strlen(r) AS BIGINT) AS wat_len, md5(r) AS wat_md5
FROM rec
"""


SQL_WAT_EXPORT = _sql_wat_export()


def q_training_token_shards(spark, sf_dir):
    """Training-export sharding (packing.training_token_shards):
    deterministic md5 global shuffle order + CONTIGUOUS token-budget
    shard cuts — the "shuffle the corpus, cut every ~budget tokens"
    step of a pretraining export, complementing corpus_shard_manifest's
    hash-mod membership with token-balanced shards.  Scale shape: the
    global running sum is a 256-bucket two-level prefix sum (parallel
    per-bucket windows + a 256-row offset rollup rejoined via
    broadcast), never a single-partition window over the corpus."""
    return packing.training_token_shards(
        _t(spark, sf_dir, "documents"), budget=4096)


SQL_TOKEN_SHARDS = f"""
WITH t AS (
  SELECT doc_id,
         md5('shuffle:' || COALESCE(CAST(doc_id AS VARCHAR), '')) AS shuffle_key,
         CASE WHEN text IS NULL THEN 0
              ELSE len({dedup.WORD_ARRAY_SQL.format(col="text")}) END AS n_tokens
  FROM documents),
-- the oracle uses the naive global window the operator's two-level
-- prefix sum is provably equal to
-- NULLS FIRST pins the NULL-vs-''-key tie to Spark's default null
-- ordering; n_tokens is the last-resort tiebreak for multiple
-- NULL-keyed docs (same shuffle_key, same NULL doc_id)
o AS (
  SELECT doc_id, shuffle_key, n_tokens,
         SUM(n_tokens) OVER (ORDER BY shuffle_key, doc_id NULLS FIRST,
             n_tokens
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS start
  FROM t)
SELECT doc_id, shuffle_key, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(start // 4096 AS BIGINT) AS shard_id
FROM o
"""


def q_term_zipf_slope(spark, sf_dir):
    """Zipf rank-frequency slope per language
    (textstats.term_zipf_slope): log-log OLS fit over each language's
    top-500 terms — the corpus-health diagnostic (natural text ~ -1;
    boilerplate floods flatten, template traps steepen).  One
    partial-agg shuffle on (lang, term); the window and regression run
    over the collapsed vocabulary, never corpus positions."""
    return textstats.term_zipf_slope(_t(spark, sf_dir, "documents"))


SQL_ZIPF = f"""
WITH words AS (
  SELECT lang,
         unnest({dedup.WORD_ARRAY_SQL.format(col="text")}) AS term
  FROM documents),
counts AS (
  SELECT lang, term, COUNT(*) AS n FROM words GROUP BY lang, term),
ranked AS (
  SELECT lang, n,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n DESC, term) AS rank
  FROM counts)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_terms,
       ROUND(regr_slope(ln(CAST(n AS DOUBLE)),
                        ln(CAST(rank AS DOUBLE))), 4) AS zipf_slope
FROM ranked WHERE rank <= 500 GROUP BY lang
"""


def q_source_quality_gate(spark, sf_dir):
    """Domain-level quality gate (textstats.source_quality_gate):
    roll per-doc quality_filter verdicts up to the source and gate
    each SOURCE on its keep-rate (majority rule) — the
    UT1-blocklist/RefinedWeb "drop the whole domain" stage.  Composes
    the ONE canonical doc gate; rollup shuffles on source only."""
    return textstats.source_quality_gate(_t(spark, sf_dir, "documents"))


SQL_SOURCE_GATE = f"""
WITH f AS ({SQL_QGATE_FEATURES}),
v AS (
  SELECT source,
         CASE WHEN ({SQL_QGATE_DROP}) IS NULL THEN 1 ELSE 0 END AS k
  FROM f),
g AS (
  SELECT source, COUNT(*) AS n_docs, SUM(k) AS n_keep
  FROM v GROUP BY source)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_keep AS BIGINT) AS n_keep,
       CAST(n_keep * 1000000 // n_docs AS BIGINT) AS keep_micro,
       (n_keep * 1000000 // n_docs) >= 500000 AS keep_source
FROM g
"""


def q_event_burst_detection(spark, sf_dir):
    """Rate-anomaly detection over the event stream: hourly counts per
    event_type z-scored against that type's own hourly distribution,
    bursts flagged at z >= 3 — the traffic-spike / crawl-storm monitor
    a pipeline runs over its ingest telemetry.  Determinism: the
    moment sums (S, S2, H) are exact integers, and both engines then
    evaluate the textually identical IEEE expression, so z is
    bit-stable; degenerate types (H < 2 or zero variance) yield NULL z
    and NULL is_burst rather than a division error.  Scale shape: two
    partial-agg shuffles of bounded cardinality (type x hour, then
    type) and a broadcast rejoin — nothing scales with raw event
    rows."""
    _pin_utc(spark)
    e = _t(spark, sf_dir, "events")
    hourly = (e.groupBy(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"),
                      "yyyy-MM-dd HH:mm:ss").alias("bucket_hour"))
        .agg(F.count("*").alias("n")))
    stats = (hourly.groupBy("event_type")
             .agg(F.count("*").alias("h"),
                  F.sum("n").alias("s"),
                  F.sum(F.col("n") * F.col("n")).alias("s2")))
    z = ("CASE WHEN h >= 2 AND (s2 - CAST(s AS DOUBLE) * s / h) > 0 "
         "THEN (n - CAST(s AS DOUBLE) / h) / "
         "sqrt((s2 - CAST(s AS DOUBLE) * s / h) / (h - 1)) END")
    return (hourly.join(F.broadcast(stats), "event_type")
            .withColumn("_z", F.expr(z))
            .select("event_type", "bucket_hour",
                    F.col("n").cast("long").alias("n"),
                    F.round("_z", 6).alias("zscore"),
                    (F.col("_z") >= 3.0).alias("is_burst")))


SQL_BURST = """
WITH hourly AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_hour,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_type, COUNT(*) AS h, SUM(n) AS s, SUM(n * n) AS s2
  FROM hourly GROUP BY event_type),
j AS (
  SELECT hourly.event_type, bucket_hour, n,
         CASE WHEN h >= 2 AND (s2 - CAST(s AS DOUBLE) * s / h) > 0
              THEN (n - CAST(s AS DOUBLE) / h) /
                   sqrt((s2 - CAST(s AS DOUBLE) * s / h) / (h - 1)) END AS z
  FROM hourly JOIN stats ON hourly.event_type = stats.event_type)
SELECT event_type, bucket_hour, CAST(n AS BIGINT) AS n,
       ROUND(z, 6) AS zscore, z >= 3.0 AS is_burst
FROM j
"""


# --------------------------------------------------------------------------
# distributed model training: logistic-regression gate + PCA power iteration


def q_quality_classifier_train(spark, sf_dir):
    """TRAIN the fastText-style language/quality gate with full-batch
    logistic-regression gradient descent (3 fixed rounds, lr=5, 32 md5
    feature buckets + bias) — the learning half of doc_classifier_score
    (which applies fixed weights).  Per-iteration cost at scale: one
    corpus-sized margin groupBy + a 33-row gradient exchange."""
    return textstats.logreg_train(_t(spark, sf_dir, "documents"),
                                  target_lang="en", n_buckets=32,
                                  n_iter=3, lr=5.0)


# the gradient-descent loop unrolled as chained CTEs (the same
# fixed-budget recipe as SQL_PAGERANK / SQL_EMBEDDING_KMEANS: 6-dp
# weight rounding between rounds makes both engines iterate identical
# weights, so only within-round double summation order differs —
# orders of magnitude below the rounding grain).  MATERIALIZED on
# feats and wt{i} is load-bearing: each round references both twice
# (feats in z{i} and g{i}, wt{prev} in z{i} and wt{i}), so default CTE
# inlining would re-evaluate the corpus-sized tokenize+hash subtree
# exponentially across the unrolled chain — same hazard as
# _SQL_PCA_ITER below.
_SQL_LR_ITER = """z{i} AS (
  SELECT f.doc_id, f.y, SUM(f.x * w.wt) AS z
  FROM feats f JOIN wt{prev} w USING (feature) GROUP BY 1, 2),
e{i} AS (SELECT doc_id, 1.0 / (1.0 + exp(-z)) - y AS err FROM z{i}),
g{i} AS (
  SELECT f.feature, SUM(f.x * e.err) / (SELECT n FROM nn) AS g
  FROM feats f JOIN e{i} e USING (doc_id) GROUP BY 1),
wt{i} AS MATERIALIZED (
  SELECT w.feature, ROUND(w.wt - 5.0 * COALESCE(g.g, 0), 6) AS wt
  FROM wt{prev} w LEFT JOIN g{i} g USING (feature)),
"""

_SQL_LR_CHAIN = (f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         {dedup.WORD_ARRAY_SQL.format(col="text")} AS ws
  FROM documents),
words AS (
  SELECT doc_id, y, GREATEST(len(ws), 0) AS n_tokens, unnest(ws) AS w
  FROM base),
term AS (
  SELECT doc_id, y, n_tokens,
         (CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) % 32) AS feature,
         COUNT(*) AS cnt,
         COUNT(*) * 1.0 / n_tokens AS x
  FROM words GROUP BY doc_id, y, n_tokens, feature),
feats AS MATERIALIZED (
  SELECT doc_id, y, n_tokens, feature, cnt, x FROM term
  UNION ALL
  SELECT doc_id, y, COALESCE(GREATEST(len(ws), 0), 0) AS n_tokens,
         CAST(-1 AS BIGINT) AS feature, CAST(0 AS BIGINT) AS cnt,
         1.0 AS x
  FROM base),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM base),
wt0 AS MATERIALIZED (SELECT DISTINCT feature, 0.0 AS wt FROM feats),
""" + "".join(_SQL_LR_ITER.format(i=i, prev=i - 1) for i in range(1, 4)))

SQL_LOGREG_TRAIN = (_SQL_LR_CHAIN +
"""fin AS (SELECT feature, wt FROM wt3)
SELECT CAST(feature AS INT) AS feature, wt AS weight_r FROM fin
""")

# per-doc margin against the final round's weights — accumulated
# EXACTLY in integer micro-units (z_num BIGINT) because a float
# sum of 6-dp weights x rational term frequencies can land exactly on
# the rounding half-point, where summation order flips the 6th dp
# between engines; the single z division is correctly-rounded IEEE,
# so z and the 0-threshold are engine-identical (logreg_apply mirror)
_SQL_LR_SCORE = """wm AS (
  SELECT feature, CAST(ROUND(wt * 1000000) AS BIGINT) AS w_micro
  FROM wt3),
wb AS (SELECT COALESCE(SUM(CASE WHEN feature = -1 THEN w_micro END),
                       0) AS wb FROM wm),
tnum AS (
  SELECT f.doc_id, SUM(f.cnt * COALESCE(w.w_micro, 0)) AS num
  FROM feats f LEFT JOIN wm w ON f.feature = w.feature
  WHERE f.feature >= 0 GROUP BY 1),
sc AS (
  SELECT d.doc_id, d.y, CAST(d.n_tokens AS BIGINT) AS nt,
         COALESCE(t.num, 0) AS num, wb.wb AS wb
  FROM (SELECT doc_id, y, n_tokens FROM feats WHERE feature = -1) d
  LEFT JOIN tnum t USING (doc_id) CROSS JOIN wb),
zz AS (
  SELECT doc_id, y,
         CASE WHEN nt = 0 THEN wb ELSE num + nt * wb END AS z_num,
         CAST(CASE WHEN nt = 0 THEN wb ELSE num + nt * wb END AS DOUBLE)
           / CAST(CASE WHEN nt = 0 THEN 1000000
                       ELSE nt * 1000000 END AS DOUBLE) AS z
  FROM sc),
"""

SQL_LOGREG_SCORES = (_SQL_LR_CHAIN + _SQL_LR_SCORE +
"""fin AS (SELECT doc_id, y, z_num, z FROM zz)
SELECT doc_id, y = 1.0 AS is_target,
       ROUND(1.0 / (1.0 + exp(-z)), 6) AS p_target_r,
       z_num >= 0 AS predicted
FROM fin
""")

SQL_LOGREG_EVAL = (_SQL_LR_CHAIN + _SQL_LR_SCORE +
"""conf AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN y = 1.0 AND z_num >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN y <> 1.0 AND z_num >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN y = 1.0 AND z_num < 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(SUM(CASE WHEN y <> 1.0 AND z_num < 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM zz),
rates AS (
  SELECT *,
         CASE WHEN tp + fp > 0 THEN tp * 1.0 / (tp + fp) END AS prec,
         CASE WHEN tp + fn > 0 THEN tp * 1.0 / (tp + fn) END AS rec
  FROM conf)
SELECT n_docs, tp, fp, fn, tn,
       ROUND((tp + fn) * 1.0 / n_docs, 6) AS base_rate_r,
       ROUND((tp + tn) * 1.0 / n_docs, 6) AS accuracy_r,
       ROUND(prec, 6) AS precision_r,
       ROUND(rec, 6) AS recall_r,
       ROUND(CASE WHEN prec IS NOT NULL AND rec IS NOT NULL
                   AND prec + rec > 0
                  THEN 2 * prec * rec / (prec + rec) END, 6) AS f1_r
FROM rates
""")


def q_quality_classifier_scores(spark, sf_dir):
    """Train the logreg gate, then APPLY it to the same corpus — the
    full train->score loop over ONE shared feature pass (the
    checkpointed feature table feeds both the GD loop and the scorer):
    per-doc margin vs the trained weight table (broadcast, <= 33
    rows), sigmoid score, 0-threshold decision."""
    docs = _t(spark, sf_dir, "documents")
    feats = textstats._logreg_features(docs, "en", "text", "lang", 32)
    wts = textstats.logreg_train(docs, target_lang="en", n_buckets=32,
                                 n_iter=3, lr=5.0, feats=feats)
    return textstats.logreg_apply(docs, wts, target_lang="en",
                                  n_buckets=32, feats=feats)


def q_quality_classifier_eval(spark, sf_dir):
    """Confusion-matrix evaluation of the trained gate on its training
    corpus: one row of counts + NULL-guarded accuracy / precision /
    recall / F1 — the model-quality report a curation pipeline records
    next to every trained-filter deployment."""
    docs = _t(spark, sf_dir, "documents")
    feats = textstats._logreg_features(docs, "en", "text", "lang", 32)
    wts = textstats.logreg_train(docs, target_lang="en", n_buckets=32,
                                 n_iter=3, lr=5.0, feats=feats)
    return textstats.logreg_eval(
        textstats.logreg_apply(docs, wts, target_lang="en",
                               n_buckets=32, feats=feats))


def q_quality_classifier_auc(spark, sf_dir):
    """Threshold-free ROC AUC of the trained gate (midrank
    Mann-Whitney) — the rank window runs over DISTINCT 6-dp scores, a
    table bounded at ~1e6 rows at ANY corpus size, so the
    single-partition window is a constant-size step."""
    docs = _t(spark, sf_dir, "documents")
    feats = textstats._logreg_features(docs, "en", "text", "lang", 32)
    wts = textstats.logreg_train(docs, target_lang="en", n_buckets=32,
                                 n_iter=3, lr=5.0, feats=feats)
    return textstats.logreg_auc(
        textstats.logreg_apply(docs, wts, target_lang="en",
                               n_buckets=32, feats=feats))


SQL_LOGREG_AUC = (_SQL_LR_CHAIN + _SQL_LR_SCORE +
"""ps AS (
  SELECT ROUND(1.0 / (1.0 + exp(-z)), 6) AS p,
         CASE WHEN y = 1.0 THEN 1 ELSE 0 END AS pos
  FROM zz),
grp AS (SELECT p, COUNT(*) AS n, SUM(pos) AS npos FROM ps GROUP BY 1),
rk AS (
  SELECT n, npos,
         COALESCE(SUM(n) OVER (ORDER BY p
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0)
           + (n + 1) / 2.0 AS midrank
  FROM grp),
agg AS (
  SELECT SUM(n) AS n_docs, SUM(npos) AS n_pos,
         SUM(n) - SUM(npos) AS n_neg,
         SUM(npos * midrank) AS prs
  FROM rk)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg,
       ROUND(CASE WHEN n_pos > 0 AND n_neg > 0
                  THEN (prs - n_pos * (n_pos + 1) / 2.0)
                       / (n_pos * n_neg) END, 6) AS auc_r
FROM agg
""")


def q_embedding_pca(spark, sf_dir):
    """Top principal component of the embedding corpus by power
    iteration (8 fixed rounds over the 6-dp-rounded covariance matrix):
    the dim^2-row covariance exchange is corpus-size-independent, the
    matvec loop never touches the corpus again."""
    return similarity.pca_power(_t(spark, sf_dir, "embeddings"),
                                n_iter=8, dim=64)


def q_embedding_pca_scores(spark, sf_dir):
    """Per-vector projection onto the corpus principal component — the
    1-D embedding key for binning / curriculum ordering; one broadcast
    join of the 64-row component against the centered corpus."""
    return similarity.pca_power(_t(spark, sf_dir, "embeddings"),
                                n_iter=8, dim=64, project=True)


# MATERIALIZED is load-bearing: each iteration references its
# predecessor twice (the matvec AND the norm scalar), so DuckDB's
# default CTE inlining would expand the 8-round chain into 2^8 copies
# of the covariance join — materializing pins linear evaluation (the
# single-reference SQL_PAGERANK chain doesn't need it)
_SQL_PCA_ITER = """u{i} AS MATERIALIZED (
  SELECT cov.i AS pos, SUM(cov.cov * b.b) AS u
  FROM cov JOIN b{prev} b ON cov.j = b.pos GROUP BY 1),
n{i} AS MATERIALIZED (SELECT SQRT(SUM(u * u)) AS nrm FROM u{i}),
b{i} AS MATERIALIZED (
  SELECT pos, ROUND(u / (SELECT nrm FROM n{i}), 6) AS b FROM u{i}),
"""

_SQL_PCA_CHAIN = ("""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
vp AS (SELECT vec_id, t.i - 1 AS pos, vec[t.i] AS coord
       FROM v, generate_series(1, 64) AS t(i)),
mu AS (SELECT pos, AVG(coord) AS mu FROM vp GROUP BY pos),
cx AS MATERIALIZED (SELECT vp.vec_id, vp.pos, vp.coord - mu.mu AS cx
       FROM vp JOIN mu USING (pos)),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
cov AS MATERIALIZED (SELECT a.pos AS i, b.pos AS j,
               ROUND(SUM(a.cx * b.cx) / ((SELECT n FROM nn) - 1), 6) AS cov
        FROM cx a JOIN cx b USING (vec_id) GROUP BY 1, 2),
b0 AS (SELECT DISTINCT i AS pos, 0.125 AS b FROM cov),
""" + "".join(_SQL_PCA_ITER.format(i=i, prev=i - 1) for i in range(1, 9)))

SQL_EMBEDDING_PCA = (_SQL_PCA_CHAIN +
"""fin AS (SELECT pos, b FROM b8)
SELECT CAST(pos AS INT) AS pos, b AS pc1_r,
       ROUND((SELECT nrm FROM n8), 6) AS eigenvalue_r
FROM fin
""")

SQL_EMBEDDING_PCA_SCORES = (_SQL_PCA_CHAIN +
"""fin AS (SELECT pos, b FROM b8)
SELECT cx.vec_id, ROUND(SUM(cx.cx * fin.b), 6) AS pc1_score_r
FROM cx JOIN fin USING (pos)
GROUP BY cx.vec_id
""")


def q_tokenizer_fertility(spark, sf_dir):
    """Per-language tokenizer-health report (textstats.tokenizer_
    fertility): subword fertility (pieces/word) and compression
    (chars/piece) per lang — the pre-tokenizer-commit sanity table of
    every multilingual-corpus paper.  One scan, one tiny groupBy."""
    return textstats.tokenizer_fertility(_t(spark, sf_dir, "documents"))


# pieces reuse the SQL_SUBWORD_TOKENS pretokenizer expression verbatim
# (same lambda, same trim/ceil) so the two oracles cannot diverge
SQL_TOKENIZER_FERTILITY = r"""
WITH toks AS (
  SELECT lang, text,
         coalesce(regexp_extract_all(text,
           '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^ \t\n\f\r\p{L}\p{N}]+', 0),
           []) AS ts
  FROM documents),
per AS (
  SELECT lang,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE length(string_split_regex(trim(text), '\s+')) END AS w,
         CAST(coalesce(list_sum(list_transform(ts,
              t -> CAST(ceil(length(trim(t)) / 4.0) AS BIGINT))), 0) AS BIGINT) AS p,
         CAST(length(text) AS BIGINT) AS c
  FROM toks)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(w) AS BIGINT) AS n_words,
       CAST(SUM(p) AS BIGINT) AS n_pieces,
       CAST(SUM(c) AS BIGINT) AS n_chars,
       ROUND(CASE WHEN SUM(w) > 0 THEN CAST(SUM(p) AS DOUBLE) / SUM(w) END, 6)
         AS fertility_r,
       ROUND(CASE WHEN SUM(p) > 0 THEN CAST(SUM(c) AS DOUBLE) / SUM(p) END, 6)
         AS chars_per_piece_r
FROM per GROUP BY lang
"""


def q_curriculum_stages(spark, sf_dir):
    """Curriculum-learning stage plan (packing.curriculum_stages) over
    the mean-word-length difficulty proxy from textstats.quality_scores
    (6-dp-rounded, so the distinct-score table is bounded): 4
    equal-population stages with per-stage doc/token budgets — corpus
    never sorted, assignment is a broadcast join."""
    scored = (textstats.quality_scores(_t(spark, sf_dir, "documents"))
              .select("doc_id", "n_words", "mean_word_len"))
    return packing.curriculum_stages(scored, "mean_word_len",
                                     weight_col="n_words", n_stages=4)


# the score expression is SQL_QUALITY's mean_word_len verbatim; the
# stage cut mirrors the operator's exact-integer `div` with DuckDB's
# `//` (both floor toward zero on non-negative counts)
SQL_CURRICULUM_STAGES = r"""
WITH s AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE length(string_split_regex(trim(text), '\s+')) END AS n_words,
         ROUND(length(text) / GREATEST(
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE length(string_split_regex(trim(text), '\s+')) END, 1), 6)
           AS score
  FROM documents),
sf AS (SELECT * FROM s WHERE score IS NOT NULL),
dist AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS n FROM sf GROUP BY score),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM dist),
st AS (SELECT score,
              CAST(COALESCE(SUM(n) OVER (ORDER BY score
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                AS cb
       FROM dist),
m AS (SELECT score,
             LEAST(3, CAST((cb * 4) // total AS INT)) AS stage
      FROM st CROSS JOIN tot)
SELECT m.stage, COUNT(*) AS n_docs,
       CAST(SUM(sf.n_words) AS BIGINT) AS n_tokens,
       MIN(sf.score) AS min_score, MAX(sf.score) AS max_score
FROM sf JOIN m USING (score)
GROUP BY m.stage
"""


def q_lang_unigram_entropy(spark, sf_dir):
    """Per-language unigram Shannon entropy + normalized entropy
    (textstats.lang_unigram_entropy) — the corpus-diversity diagnostic
    (template spam collapses it).  One (lang, word) partial-agg
    exchange over the vocabulary, then a per-lang rollup."""
    return textstats.lang_unigram_entropy(_t(spark, sf_dir, "documents"))


# the c*log2(c) identity keeps both engines summing the SAME exact
# integer-derived doubles; reorder error over a vocab-sized sum is
# ~1e-11 vs the 5e-7 round-6 boundary (see term_zipf_slope's budget)
SQL_LANG_ENTROPY = f"""
WITH words AS (
  SELECT lang,
         unnest({dedup.WORD_ARRAY_SQL.format(col="text")}) AS word
  FROM documents),
freq AS (
  SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM words GROUP BY lang, word),
g AS (
  SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         SUM(cnt * log2(cnt)) AS clog
  FROM freq GROUP BY lang)
SELECT lang, n_tokens, vocab,
       ROUND(log2(n_tokens) - clog / n_tokens, 6) AS entropy_r,
       ROUND(CASE WHEN vocab > 1
                  THEN (log2(n_tokens) - clog / n_tokens) / log2(vocab)
             END, 6) AS entropy_norm_r
FROM g
"""


def q_bitext_margin_pairs(spark, sf_dir):
    """Margin-based bitext mining between label partitions 0 and 1
    (similarity.bitext_margin_pairs): banded-LSH candidates, mutual
    nearest neighbours, ratio-margin >= 1.2 — the CCMatrix
    parallel-pair mining shape, never all-pairs."""
    return similarity.bitext_margin_pairs(
        _t(spark, sf_dir, "embeddings"), label_a=0, label_b=1,
        k=4, margin_threshold=1.2, n_bands=8, band_planes=2)


# the comp/dots/sigs chain is SQL_EMB_NEAR_DUP_BANDED's with
# band_planes=2 (16 planes, p//2, 1-bit shift); cosines are rounded
# BEFORE ranking/means exactly as the operator does
SQL_BITEXT_MARGIN = """
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
comp AS (
  SELECT p.p, i.i,
         CAST(concat('0x', substr(md5(concat(CAST(p.p AS VARCHAR), ':',
              CAST(i.i - 1 AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 - 0.5 AS c
  FROM generate_series(0, 15) p(p), generate_series(1, 64) i(i)),
dots AS (
  SELECT e.vec_id, e.label, comp.p, SUM(e.v[comp.i] * comp.c) AS d
  FROM e, comp WHERE e.label IN (0, 1) GROUP BY e.vec_id, e.label, comp.p),
sigs AS (
  SELECT vec_id, label, CAST(p // 2 AS INTEGER) AS band,
         CAST(SUM(CASE WHEN d >= 0 THEN (1 << (1 - (p % 2))) ELSE 0 END) AS INTEGER) AS bucket
  FROM dots GROUP BY vec_id, label, p // 2),
cand AS (
  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
  FROM sigs a JOIN sigs b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.label = 0 AND b.label = 1),
scored AS (
  SELECT c.a_id, c.b_id,
         ROUND(SUM(ea.v[i] * eb.v[i])
               / SQRT(SUM(ea.v[i]*ea.v[i]) * SUM(eb.v[i]*eb.v[i])), 6) AS cos_r
  FROM cand c
  JOIN e ea ON ea.vec_id = c.a_id
  JOIN e eb ON eb.vec_id = c.b_id,
       generate_series(1, 64) t(i)
  GROUP BY c.a_id, c.b_id),
ranked AS (
  SELECT a_id, b_id, cos_r,
         ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY cos_r DESC, b_id) AS ra,
         ROW_NUMBER() OVER (PARTITION BY b_id ORDER BY cos_r DESC, a_id) AS rb
  FROM scored),
ma AS (SELECT a_id, AVG(cos_r) AS ma FROM ranked WHERE ra <= 4 GROUP BY a_id),
mb AS (SELECT b_id, AVG(cos_r) AS mb FROM ranked WHERE rb <= 4 GROUP BY b_id)
SELECT r.a_id, r.b_id, r.cos_r AS cosine_r,
       ROUND(r.cos_r / ((ma.ma + mb.mb) / 2), 6) AS margin_r
FROM ranked r JOIN ma ON r.a_id = ma.a_id JOIN mb ON r.b_id = mb.b_id
WHERE r.ra = 1 AND r.rb = 1
  AND ROUND(r.cos_r / ((ma.ma + mb.mb) / 2), 6) >= 1.2
"""


def q_doc_bigram_logprob(spark, sf_dir):
    """Interpolated bigram LM scoring (textstats.bigram_logprob): the
    transition-aware rung above doc_unigram_logprob — word salad
    passes unigrams, collapses here.  Bigrams from slice+arrays_zip
    (no window), counts are vocab-sized partial aggs."""
    return textstats.bigram_logprob(_t(spark, sf_dir, "documents"))


SQL_BIGRAM_LOGPROB = f"""
WITH w0 AS (
  SELECT doc_id, {dedup.WORD_ARRAY_SQL.format(col="text")} AS ws
  FROM documents),
big AS (
  SELECT doc_id, unnest(ws[1:len(ws)-1]) AS w1, unnest(ws[2:len(ws)]) AS w2
  FROM w0),
words AS (SELECT unnest(ws) AS word FROM w0),
uni AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM words GROUP BY word),
tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM uni),
bi AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt2 FROM big GROUP BY w1, w2)
SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(ln(CAST(0.7 AS DOUBLE) * bi.cnt2 / u1.cnt
                    + CAST(0.3 AS DOUBLE) * u2.cnt / tot.total)), 6)
         AS avg_logprob_r
FROM big b
JOIN bi ON b.w1 = bi.w1 AND b.w2 = bi.w2
JOIN uni u1 ON b.w1 = u1.word
JOIN uni u2 ON b.w2 = u2.word
CROSS JOIN tot
GROUP BY b.doc_id
"""


def q_source_concentration(spark, sf_dir):
    """One-row corpus source-diversity panel
    (textstats.source_concentration): HHI, exact sorted-rank Gini, top
    source share — per-source counts collapse first, the Gini window
    runs over the collapsed table only."""
    return textstats.source_concentration(_t(spark, sf_dir, "documents"))


# integer product sums (n*n, i*n) mirror Spark's long arithmetic; the
# final divisions are the only doubles
SQL_SOURCE_CONCENTRATION = """
WITH per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY source),
ranked AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n, source) AS i FROM per)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(n * n) AS DOUBLE) / (SUM(n) * SUM(n)), 6) AS hhi_r,
       ROUND(2 * CAST(SUM(i * n) AS DOUBLE) / (COUNT(*) * SUM(n))
             - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*), 6) AS gini_r,
       ROUND(CAST(MAX(n) AS DOUBLE) / SUM(n), 6) AS top_share_r
FROM ranked
"""


def q_length_drift_psi(spark, sf_dir):
    """Per-language PSI drift of the log2-binned document-length
    distribution vs English (textstats.length_drift_psi) — the corpus
    shape monitor; the reference language's own row is exactly 0."""
    return textstats.length_drift_psi(_t(spark, sf_dir, "documents"))


SQL_LENGTH_DRIFT_PSI = f"""
WITH binned AS (
  SELECT lang,
         CAST(FLOOR(log2(GREATEST(
           len({dedup.WORD_ARRAY_SQL.format(col="text")}), 1))) AS INT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents GROUP BY 1, 2),
bins AS (SELECT DISTINCT bin FROM binned),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bins FROM bins),
grid AS (
  SELECT l.lang, b.bin, COALESCE(x.cnt, 0) AS cnt
  FROM (SELECT DISTINCT lang FROM binned) l
  CROSS JOIN bins b
  LEFT JOIN binned x ON x.lang = l.lang AND x.bin = b.bin),
tot AS (SELECT lang, SUM(cnt) AS tot FROM grid GROUP BY lang),
sm AS (
  SELECT g.lang, g.bin,
         (g.cnt + CAST(0.5 AS DOUBLE))
           / (t.tot + CAST(0.5 AS DOUBLE) * nb.n_bins) AS p
  FROM grid g JOIN tot t ON g.lang = t.lang CROSS JOIN nb),
ref AS (SELECT bin, p AS q FROM sm WHERE lang = 'en')
SELECT sm.lang, ROUND(SUM((sm.p - ref.q) * ln(sm.p / ref.q)), 6) AS psi_r
FROM sm JOIN ref ON sm.bin = ref.bin
GROUP BY sm.lang
"""


def q_split_leakage_check(spark, sf_dir):
    """Eval-contamination guard (dedup.split_leakage_check): verified
    near-dup pairs straddling the train/val/test split — composes the
    canonical near-dup pipeline with the ONE deployed split function;
    zero rows is the release gate."""
    return dedup.split_leakage_check(_t(spark, sf_dir, "documents"))


# the near-dup subquery is SQL_NEAR_DUP_VERIFIED verbatim; the split
# CASE is SQL_SPLIT's bucket expression verbatim
SQL_SPLIT_LEAKAGE = f"""
WITH nd AS ({SQL_NEAR_DUP_VERIFIED}),
splits AS (
  SELECT doc_id,
         CASE WHEN b <= 7 THEN 'train' WHEN b = 8 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT doc_id,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 10 AS b
        FROM documents))
SELECT nd.doc_a, nd.doc_b, nd.jaccard_r,
       sa.split AS split_a, sb.split AS split_b
FROM nd JOIN splits sa ON nd.doc_a = sa.doc_id
        JOIN splits sb ON nd.doc_b = sb.doc_id
WHERE sa.split <> sb.split
"""


def q_packing_efficiency(spark, sf_dir):
    """Per-language packing-efficiency report
    (packing.packing_efficiency over sequence_pack's greedy plan):
    sequences, token mass, padding waste, fill ratio at budget=128."""
    return packing.packing_efficiency(_t(spark, sf_dir, "documents"),
                                      budget=128)


SQL_PACKING_EFFICIENCY = f"""
WITH packed AS ({SQL_SEQUENCE_PACK}),
per_seq AS (
  SELECT lang, seq_id, SUM(n_tokens) AS fill
  FROM packed GROUP BY lang, seq_id)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_seqs,
       CAST(SUM(fill) AS BIGINT) AS n_tokens,
       CAST(SUM(GREATEST(128 - fill, 0)) AS BIGINT) AS pad_tokens,
       ROUND(CAST(SUM(fill) AS DOUBLE) / (COUNT(*) * 128), 6) AS fill_ratio_r
FROM per_seq GROUP BY lang
"""


# Ordering matters: the driver's CORRECTNESS artifact checks the FIRST 50
# entries of this dict.  Window policy: at ROUND START, rotate so the
# never/oldest-witnessed backlog sits at the front and multi-round hash-green
# queries fill the tail; DURING a round, new queries are APPENDED.  Round-5
# rotation: 9 never-witnessed + 41 oldest (r01/r02-only) re-witness queries;
# with 159 queries this closes the sweep: every registry entry now has a
# driver witness, the oldest from r02, and 150/159 from r03-r05.
QUERIES = {
    # -- ROUND-5 ROTATION (VERDICT r4 "Next round" #1): the 9 queries
    #    with NO driver witness in any round (r3 mid-round + r4
    #    additions) go first, plus the round-5 PNG pixel decode, then
    #    the 40 oldest re-witness queries (last hash-green row
    #    r01/r02), closing the witness sweep: after this round every
    #    registry query has a driver hash row, none older than r02. --
    "doc_bigram_logprob": q_doc_bigram_logprob,
    "tokenizer_fertility": q_tokenizer_fertility,
    "curriculum_stages": q_curriculum_stages,
    "lang_unigram_entropy": q_lang_unigram_entropy,
    "source_concentration": q_source_concentration,
    "event_burst_detection": q_event_burst_detection,
    "multimodal_header_decode": q_multimodal_header_decode,
    "doc_rowwise_simhash": q_doc_rowwise_simhash,
    "multimodal_av_metadata": q_multimodal_av_metadata,
    "multimodal_png_pixel_stats": q_multimodal_png_pixel_stats,
    "pdf_flate_text_extract": q_pdf_flate_text_extract,
    "image_ahash_fingerprints": q_image_ahash_fingerprints,
    "image_ahash_dup_groups": q_image_ahash_dup_groups,
    "pdf_layout_blocks": q_pdf_layout_blocks,
    "multimodal_gif_pixel_stats": q_multimodal_gif_pixel_stats,
    "multimodal_wav_sample_stats": q_multimodal_wav_sample_stats,
    "multimodal_bmp_pixel_stats": q_multimodal_bmp_pixel_stats,
    "multimodal_tiff_header_decode": q_multimodal_tiff_header_decode,
    "wacz_member_listing": q_wacz_member_listing,
    "wacz_warc_extract": q_wacz_warc_extract,
    "multimodal_ico_pixel_stats": q_multimodal_ico_pixel_stats,
    # -- re-witness set: last driver row r01/r02, oldest-first --
    "doc_quality_filter": q_doc_quality_filter,
    "corpus_curation": q_corpus_curation,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_signatures": q_dedup_minhash_signatures,
    "dedup_simhash": q_dedup_simhash,
    "dedup_lsh_candidates": q_dedup_lsh_candidates,
    "contamination_check": q_contamination_check,
    "dedup_near_dup_verified": q_dedup_near_dup_verified,
    "embedding_label_centroids": q_embedding_label_centroids,
    "dedup_embedding_cosine_banded": q_dedup_embedding_cosine_banded,
    "embedding_topk_bruteforce": q_embedding_topk_bruteforce,
    "embedding_label_stats": q_embedding_label_stats,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "multimodal_media_meta": q_multimodal_media_meta,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_resize_plan": q_multimodal_resize_plan,
    "multimodal_feature_extract": q_multimodal_feature_extract,
    "session_window_rollup": q_session_window_rollup,
    "dedup_jaccard_pairs": q_dedup_jaccard_pairs,
    "doc_language_id": q_doc_language_id,
    "doc_fingerprints": q_doc_fingerprints,
    "doc_containment_join": q_doc_containment_join,
    "latest_order_per_customer": q_latest_order_per_customer,
    "event_context_window": q_event_context_window,
    "pricing_summary": q_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "doc_subword_tokens": q_doc_subword_tokens,
    "ner_entity_spans": q_ner_entity_spans,
    "fuzzy_lexicon_matches": q_fuzzy_lexicon_matches,
    # -- past the 50-entry window: the simplest r02-witnessed
    #    TPC-H-style veterans (each already hash-green twice; they
    #    yielded window slots to the round-5 additions), then the
    #    r03/r04 witnessed queries in prior relative order.  Every
    #    query stays covered by the local tri-scale oracle mirror
    #    (tests/test_queries_oracle.py) regardless of position. --
    "orders_price_histogram": q_orders_price_histogram,
    "doc_token_counts": q_doc_token_counts,
    "doc_zscore_by_lang": q_doc_zscore_by_lang,
    "doc_quality_scores": q_doc_quality_scores,
    "docs_lang_by_source_pivot": q_docs_lang_by_source_pivot,
    "user_sessionization": q_user_sessionization,
    "hourly_event_rollup": q_hourly_event_rollup,
    "docs_per_lang_concat": q_docs_per_lang_concat,
    "top_parts": q_top_parts,
    "orders_price_percentiles": q_orders_price_percentiles,
    "lineitem_rollup": q_lineitem_rollup,
    "event_category_rollup": q_event_category_rollup,
    "customers_without_orders": q_customers_without_orders,
    "big_spender_customers": q_big_spender_customers,
    "event_pairs_60s": q_event_pairs_60s,
    "trading_nations_union": q_trading_nations_union,
    "high_volume_customers": q_high_volume_customers,
    "nation_set_ops": q_nation_set_ops,
    "nation_name_similarity": q_nation_name_similarity,
    "events_by_weekday": q_events_by_weekday,
    "order_value_ranks": q_order_value_ranks,
    "embedding_pca_scores": q_embedding_pca_scores,
    "dedup_cluster_assign_star": q_dedup_cluster_assign_star,
    "bm25_search": q_bm25_search,
    "dup_passage_ranges": q_dup_passage_ranges,
    "dup_passage_excise": q_dup_passage_excise,
    "doc_bigram_domain_logprob": q_doc_bigram_domain_logprob,
    "doc_badword_filter": q_doc_badword_filter,
    "dedup_cluster_best_keeper": q_dedup_cluster_best_keeper,
    "url_host_blocklist": q_url_host_blocklist,
    "host_diversity_stats": q_host_diversity_stats,
    "corpus_shard_manifest": q_corpus_shard_manifest,
    "compaction_plan": q_compaction_plan,
    "host_link_graph": q_host_link_graph,
    "host_pagerank": q_host_pagerank,
    "corpus_snapshot_drift": q_corpus_snapshot_drift,
    "canonical_link_dedup": q_canonical_link_dedup,
    "doc_html_metadata": q_doc_html_metadata,
    "title_dup_groups": q_title_dup_groups,
    "anchor_text_terms": q_anchor_text_terms,
    "warc_roundtrip": q_warc_roundtrip,
    "robots_rules_parse": q_robots_rules_parse,
    "robots_url_gate": q_robots_url_gate,
    "sitemap_url_extract": q_sitemap_url_extract,
    "crawl_frontier_assign": q_crawl_frontier_assign,
    "host_boilerplate_lines": q_host_boilerplate_lines,
    "url_redirect_resolve": q_url_redirect_resolve,
    "frontier_url_resolve": q_frontier_url_resolve,
    "ccnet_perplexity_tiers": q_ccnet_perplexity_tiers,
    "robots_sitemap_discovery": q_robots_sitemap_discovery,
    "crawl_budget_allocation": q_crawl_budget_allocation,
    "sitemap_recrawl_candidates": q_sitemap_recrawl_candidates,
    "url_quality_gate": q_url_quality_gate,
    "url_template_census": q_url_template_census,
    "wet_export": q_wet_export,
    "cdx_index": q_cdx_index,
    "warc_revisit_dedup": q_warc_revisit_dedup,
    "cdx_shard_boundaries": q_cdx_shard_boundaries,
    "wat_export": q_wat_export,
    "training_token_shards": q_training_token_shards,
    "term_zipf_slope": q_term_zipf_slope,
    "source_quality_gate": q_source_quality_gate,
    "bitext_margin_pairs": q_bitext_margin_pairs,
    "length_drift_psi": q_length_drift_psi,
    "split_leakage_check": q_split_leakage_check,
    "packing_efficiency": q_packing_efficiency,
    "hash_embedding_topk": q_hash_embedding_topk,
    "doc_winnow_fingerprints": q_doc_winnow_fingerprints,
    "winnow_dup_candidates": q_winnow_dup_candidates,
    "hybrid_search_rrf": q_hybrid_search_rrf,
    "orders_zorder_layout": q_orders_zorder_layout,
    "extraction_pipeline_metrics": q_extraction_pipeline_metrics,
    "match_stats": q_match_stats,
    "match_top_terms": q_match_top_terms,
    "entity_spans_by_type": q_entity_spans_by_type,
    "embedding_topk_lsh": q_embedding_topk_lsh,
    "embedding_topk_ivf": q_embedding_topk_ivf,
    "dedup_embedding_cosine_banded_mat": q_dedup_embedding_cosine_banded_mat,
    "doc_bpe_tokens": q_doc_bpe_tokens,
    "doc_unigram_tokens": q_doc_unigram_tokens,
    "unigram_seed_candidates": q_unigram_seed_candidates,
    "doc_hash_embeddings": q_doc_hash_embeddings,
    "orders_price_quantile_sketch": q_orders_price_quantile_sketch,
    "event_asof_join": q_event_asof_join,
    "corpus_split_assign": q_corpus_split_assign,
    "event_props_json": q_event_props_json,
    "doc_bigram_counts": q_doc_bigram_counts,
    "doc_line_dedup": q_doc_line_dedup,
    "doc_tfidf_top_terms": q_doc_tfidf_top_terms,
    "dedup_cluster_assign": q_dedup_cluster_assign,
    "url_canonical_dedup": q_url_canonical_dedup,
    "host_cap_sample": q_host_cap_sample,
    "embedding_topk_quantized": q_embedding_topk_quantized,
    "pii_redaction": q_pii_redaction,
    "doc_repetition_signals": q_doc_repetition_signals,
    "dedup_incremental": q_dedup_incremental,
    "cross_doc_shingle_dup": q_cross_doc_shingle_dup,
    "graph_pagerank": q_graph_pagerank,
    "doc_unigram_logprob": q_doc_unigram_logprob,
    "doc_vocab_oov": q_doc_vocab_oov,
    "dedup_simhash_hamming": q_dedup_simhash_hamming,
    "lang_temperature_sample": q_lang_temperature_sample,
    "doc_classifier_score": q_doc_classifier_score,
    "doc_sequence_pack": q_doc_sequence_pack,
    "bpe_merge_candidates": q_bpe_merge_candidates,
    "embedding_kmeans": q_embedding_kmeans,
    "semantic_dedup": q_semantic_dedup,
    "hll_distinct_parts": q_hll_distinct_parts,
    "heavy_hitter_terms": q_heavy_hitter_terms,
    "doc_chunk_windows": q_doc_chunk_windows,
    "inverted_text_index": q_inverted_text_index,
    "term_pmi_pairs": q_term_pmi_pairs,
    "bloom_seen_urls": q_bloom_seen_urls,
    "event_pairs_60s_bucketed": q_event_pairs_60s_bucketed,
    "corpus_mixture_weights": q_corpus_mixture_weights,
    "dsir_importance_weights": q_dsir_importance_weights,
    "quality_classifier_train": q_quality_classifier_train,
    "quality_classifier_scores": q_quality_classifier_scores,
    "quality_classifier_eval": q_quality_classifier_eval,
    "quality_classifier_auc": q_quality_classifier_auc,
    "embedding_pca": q_embedding_pca,
}

ORACLE_SQL = {
    "pricing_summary": SQL_PRICING,
    "revenue_by_nation": SQL_REVENUE_NATION,
    "top_parts": SQL_TOP_PARTS,
    "orders_price_histogram": SQL_HISTOGRAM,
    "orders_price_percentiles": SQL_PERCENTILES,
    "docs_per_lang_concat": SQL_LANG_CONCAT,
    "lineitem_rollup": SQL_ROLLUP,
    "docs_lang_by_source_pivot": SQL_PIVOT,
    "high_volume_customers": SQL_HIGH_VOLUME,
    "customers_without_orders": SQL_NO_ORDERS,
    "big_spender_customers": SQL_BIG_SPENDERS,
    "doc_containment_join": SQL_CONTAINMENT,
    "event_pairs_60s": SQL_EVENT_PAIRS,
    "event_category_rollup": SQL_CATEGORY,
    "trading_nations_union": SQL_NATIONS_UNION,
    "nation_set_ops": SQL_SET_OPS,
    "nation_name_similarity": SQL_NATION_SIMILARITY,
    "events_by_weekday": SQL_EVENTS_WEEKDAY,
    "latest_order_per_customer": SQL_LATEST_ORDER,
    "event_context_window": SQL_CONTEXT_WINDOW,
    "order_value_ranks": SQL_ORDER_RANKS,
    "user_sessionization": SQL_SESSIONIZE,
    "session_window_rollup": SQL_SESSION_WINDOW,
    "hourly_event_rollup": SQL_HOURLY,
    "doc_token_counts": SQL_TOKENS,
    "doc_subword_tokens": SQL_SUBWORD_TOKENS,
    "doc_quality_filter": SQL_QUALITY_FILTER,
    "corpus_curation": SQL_CURATION,
    "doc_quality_scores": SQL_QUALITY,
    "doc_language_id": SQL_LANG_ID,
    "doc_fingerprints": SQL_FINGERPRINTS,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_minhash_signatures": SQL_MINHASH,
    "dedup_simhash": SQL_SIMHASH,
    "dedup_jaccard_pairs": SQL_JACCARD,
    "dedup_lsh_candidates": SQL_LSH_CANDIDATES,
    "contamination_check": SQL_CONTAMINATION,
    "dedup_near_dup_verified": SQL_NEAR_DUP_VERIFIED,
    "embedding_topk_bruteforce": SQL_TOPK,
    "embedding_label_stats": SQL_LABEL_STATS,
    "embedding_label_centroids": SQL_LABEL_CENTROIDS,
    "dedup_embedding_cosine": SQL_EMB_NEAR_DUP,
    "dedup_embedding_cosine_banded": SQL_EMB_NEAR_DUP_BANDED,
    "dedup_embedding_cosine_banded_mat": SQL_EMB_NEAR_DUP_BANDED,
    "multimodal_media_meta": SQL_MEDIA_META,
    "multimodal_resize_plan": SQL_RESIZE_PLAN,
    "multimodal_feature_extract": SQL_FEATURE_EXTRACT,
    "doc_zscore_by_lang": SQL_ZSCORE,
    "embedding_topk_ivf": SQL_TOPK_IVF,
    "embedding_topk_lsh": SQL_TOPK_LSH,
    "multimodal_frame_sample": SQL_FRAME_SAMPLE,
    # The spec queries run Python regex / difflib, but their inputs are
    # FIXED sentences (ner/fuzzy) or the deterministic fixture corpus
    # (pipeline metrics), so committed expected-value twins make them
    # fully value-checkable (see _expected_spec_sqls docstring).
    "ner_entity_spans": SQL_NER_SPANS,
    "fuzzy_lexicon_matches": SQL_FUZZY_MATCHES,
    "extraction_pipeline_metrics": SQL_PIPELINE_METRICS,
    "doc_bpe_tokens": SQL_BPE_TOKENS,
    "doc_unigram_tokens": SQL_UNIGRAM_TOKENS,
    "unigram_seed_candidates": SQL_UNIGRAM_SEED_CANDIDATES,
    "doc_hash_embeddings": SQL_HASH_EMBEDDINGS,
    "orders_price_quantile_sketch": SQL_QUANTILE_SKETCH,
    "hash_embedding_topk": SQL_HASH_TOPK,
    "doc_winnow_fingerprints": SQL_WINNOW,
    "winnow_dup_candidates": SQL_WINNOW_DUP,
    "hybrid_search_rrf": SQL_HYBRID_RRF,
    "orders_zorder_layout": SQL_ZORDER_LAYOUT,
    "multimodal_header_decode": SQL_HEADER_DECODE,
    "doc_rowwise_simhash": SQL_SIMHASH,
    "multimodal_av_metadata": SQL_AV_METADATA,
    "multimodal_png_pixel_stats": SQL_PNG_PIXEL_STATS,
    "pdf_flate_text_extract": SQL_PDF_FLATE_TEXT,
    "image_ahash_fingerprints": SQL_IMAGE_AHASH,
    "image_ahash_dup_groups": SQL_IMAGE_AHASH_DUPS,
    "pdf_layout_blocks": SQL_PDF_LAYOUT,
    "multimodal_gif_pixel_stats": SQL_GIF_PIXEL_STATS,
    "multimodal_wav_sample_stats": SQL_WAV_SAMPLE_STATS,
    "multimodal_bmp_pixel_stats": SQL_BMP_PIXEL_STATS,
    "multimodal_tiff_header_decode": SQL_TIFF_HEADER,
    "wacz_member_listing": SQL_WACZ_MEMBERS,
    "wacz_warc_extract": SQL_WACZ_EXTRACT,
    "multimodal_ico_pixel_stats": SQL_ICO_PIXEL_STATS,
    "event_asof_join": SQL_ASOF,
    "corpus_split_assign": SQL_SPLIT,
    "event_props_json": SQL_PROPS_JSON,
    "doc_bigram_counts": SQL_BIGRAMS,
    "doc_line_dedup": SQL_LINE_DEDUP,
    "doc_tfidf_top_terms": SQL_TFIDF,
    "match_stats": SQL_MATCH_STATS,
    "match_top_terms": SQL_MATCH_TOP_TERMS,
    "entity_spans_by_type": SQL_SPANS_BY_TYPE,
    "dedup_cluster_assign": SQL_CLUSTER_ASSIGN,
    "url_canonical_dedup": SQL_URL_CANONICAL,
    "host_cap_sample": SQL_HOST_CAP,
    "embedding_topk_quantized": SQL_TOPK_QUANT,
    "pii_redaction": SQL_PII,
    "doc_repetition_signals": SQL_REPETITION,
    "dedup_incremental": SQL_INCREMENTAL_DEDUP,
    "cross_doc_shingle_dup": SQL_SHINGLE_DUP,
    "graph_pagerank": SQL_PAGERANK,
    "doc_unigram_logprob": SQL_UNIGRAM_LOGPROB,
    "doc_vocab_oov": SQL_VOCAB_OOV,
    "dedup_simhash_hamming": SQL_SIMHASH_HAMMING,
    "lang_temperature_sample": SQL_TEMPERATURE_SAMPLE,
    "doc_classifier_score": SQL_CLASSIFIER_SCORE,
    "doc_sequence_pack": SQL_SEQUENCE_PACK,
    "bpe_merge_candidates": SQL_BPE_MERGE_CANDIDATES,
    "embedding_kmeans": SQL_EMBEDDING_KMEANS,
    "semantic_dedup": SQL_SEMANTIC_DEDUP,
    "hll_distinct_parts": SQL_HLL_DISTINCT,
    "heavy_hitter_terms": SQL_HEAVY_HITTERS,
    "doc_chunk_windows": SQL_CHUNK_WINDOWS,
    "inverted_text_index": SQL_INVERTED_INDEX,
    "term_pmi_pairs": SQL_TERM_PMI,
    "bloom_seen_urls": SQL_BLOOM_SEEN,
    # deliberately the SAME oracle as event_pairs_60s: the bucketed
    # rewrite must be result-identical to the direct interval join
    "event_pairs_60s_bucketed": SQL_EVENT_PAIRS,
    "corpus_mixture_weights": SQL_MIXTURE_WEIGHTS,
    "dsir_importance_weights": SQL_DSIR,
    # same oracle as dedup_cluster_assign: star contraction must
    # produce the identical clustering
    "dedup_cluster_assign_star": SQL_CLUSTER_ASSIGN,
    "bm25_search": SQL_BM25,
    "dup_passage_ranges": SQL_DUP_PASSAGES,
    "dup_passage_excise": SQL_DUP_EXCISE,
    "doc_bigram_domain_logprob": SQL_BIGRAM_DOMAIN,
    "doc_badword_filter": SQL_BADWORDS,
    "dedup_cluster_best_keeper": SQL_BEST_KEEPER,
    "url_host_blocklist": SQL_URL_HOST_BLOCKLIST,
    "host_diversity_stats": SQL_HOST_DIVERSITY,
    "corpus_shard_manifest": SQL_SHARD_MANIFEST,
    "compaction_plan": SQL_COMPACTION_PLAN,
    "host_link_graph": SQL_HOST_LINK_GRAPH,
    "host_pagerank": SQL_HOST_PAGERANK,
    "corpus_snapshot_drift": SQL_SNAPSHOT_DRIFT,
    "canonical_link_dedup": SQL_CANONICAL_LINK_DEDUP,
    "doc_html_metadata": SQL_DOC_HTML_METADATA,
    "title_dup_groups": SQL_TITLE_DUP_GROUPS,
    "anchor_text_terms": SQL_ANCHOR_TEXT_TERMS,
    "warc_roundtrip": SQL_WARC_ROUNDTRIP,
    "robots_rules_parse": SQL_ROBOTS_RULES,
    "robots_url_gate": SQL_ROBOTS_GATE,
    "sitemap_url_extract": SQL_SITEMAP_URL_EXTRACT,
    "crawl_frontier_assign": SQL_CRAWL_FRONTIER_ASSIGN,
    "host_boilerplate_lines": SQL_HOST_BOILERPLATE_LINES,
    "url_redirect_resolve": SQL_URL_REDIRECT_RESOLVE,
    "frontier_url_resolve": SQL_FRONTIER_URL_RESOLVE,
    "ccnet_perplexity_tiers": SQL_CCNET_TIERS,
    "robots_sitemap_discovery": SQL_ROBOTS_SITEMAP_DISCOVERY,
    "crawl_budget_allocation": SQL_CRAWL_BUDGET_ALLOCATION,
    "sitemap_recrawl_candidates": SQL_SITEMAP_RECRAWL,
    "url_quality_gate": SQL_URL_QUALITY_GATE,
    "url_template_census": SQL_URL_TEMPLATE_CENSUS,
    "wet_export": SQL_WET_EXPORT,
    "cdx_index": SQL_CDX_INDEX,
    "warc_revisit_dedup": SQL_WARC_REVISIT,
    "cdx_shard_boundaries": SQL_CDX_SHARDS,
    "wat_export": SQL_WAT_EXPORT,
    "training_token_shards": SQL_TOKEN_SHARDS,
    "term_zipf_slope": SQL_ZIPF,
    "source_quality_gate": SQL_SOURCE_GATE,
    "event_burst_detection": SQL_BURST,
    "quality_classifier_train": SQL_LOGREG_TRAIN,
    "quality_classifier_scores": SQL_LOGREG_SCORES,
    "quality_classifier_eval": SQL_LOGREG_EVAL,
    "quality_classifier_auc": SQL_LOGREG_AUC,
    "embedding_pca": SQL_EMBEDDING_PCA,
    "embedding_pca_scores": SQL_EMBEDDING_PCA_SCORES,
    "tokenizer_fertility": SQL_TOKENIZER_FERTILITY,
    "curriculum_stages": SQL_CURRICULUM_STAGES,
    "lang_unigram_entropy": SQL_LANG_ENTROPY,
    "bitext_margin_pairs": SQL_BITEXT_MARGIN,
    "doc_bigram_logprob": SQL_BIGRAM_LOGPROB,
    "source_concentration": SQL_SOURCE_CONCENTRATION,
    "length_drift_psi": SQL_LENGTH_DRIFT_PSI,
    "split_leakage_check": SQL_SPLIT_LEAKAGE,
    "packing_efficiency": SQL_PACKING_EFFICIENCY,
}

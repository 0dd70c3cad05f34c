"""Distributed sketch operators — HyperLogLog distinct-count, count-min
heavy hitters, and Bloom-filter membership.

First-class training-data-pipeline components: at 100 TB you cannot
afford exact countDistinct over raw token streams for monitoring, and
heavy-hitter detection (boilerplate phrases, spam n-grams) must run in
one pass with bounded memory.  Both sketches here are built entirely
from built-in expressions over the repo's md5-derived hash family
(operators/dedup._h32 idiom) so they are

  * deterministic — a pure function of the input rows, independent of
    partitioning, task order, and engine (no engine-native hash(),
    no RNG), which is what makes an exact DuckDB oracle twin possible
    for an *approximate* algorithm: both engines compute the identical
    sketch, so the estimates match cell-for-cell;
  * mergeable — registers/counters are max/sum aggregations, so partial
    aggregation (map-side combine) applies and the shuffle carries at
    most (groups x m) rows regardless of input size.  This is the same
    partial+final shape Spark's own approx_count_distinct uses, spelled
    out in the public DataFrame API.

Reference parity: the reference keeps exact Counter()s for its match
statistics (core/surname_matcher.py:356-402) and exact distinct sets
(core/surname_matcher.py:80-88) — workable at thousands of documents,
not at 10^12.  These operators are the scale-correct twins of those
aggregations; the registry pairs each with an exact computation so the
approximation error is itself oracle-verified.

Scale notes (1000-executor deployment):
  * hll_distinct: one narrow projection (md5 + string ops, codegen),
    one partial-agg groupBy on (group, register) — max 256 rows per
    group reach the final agg.  No second scan: the exact distinct
    reported alongside is for verification and would be dropped at
    100 TB (or kept: it is itself a partial-agg countDistinct).
  * cm_heavy_hitters: the sketch is depth x width = 1024 cells per
    group; candidate words join against the sketch by bucket — a
    broadcast-friendly join because the sketch is tiny by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _h32, word_array


def _seeded_mod(seed_col, key_col, modulus: int):
    """THE seeded hash-to-cell kernel shared by every sketch here:
    dedup._h32 of 'seed:key', folded to [0, modulus).  One definition —
    a drifting copy on one side of a build/probe pair would silently
    hash probes into the wrong cells with no error raised."""
    return _h32(F.concat_ws(":", seed_col, key_col)) % modulus

# --------------------------------------------------------------------------
# HyperLogLog

# register-count exponent: m = 2^P registers (first P bits of the hash);
# the remaining 52 bits feed the leading-zero rank.  P=8 keeps the
# sketch tiny while giving ~6.5% standard error — and 52 spare bits fit
# exactly in the integer range of a double, which is what lets the
# register sum be computed as an EXACT BIGINT (sum of 2^(52-rho) terms)
# instead of an order-dependent float sum: bit-identical across engines
# and partitionings by construction.
_HLL_P = 8
_HLL_M = 1 << _HLL_P
_HLL_REST_NIBBLES = 13  # 52 bits of rank material after the 2 register nibbles

# leading-zero count of a hex nibble's 4 bits (nibble is never '0' here —
# callers strip leading zero nibbles first and count them 4 bits apiece)
_NIBBLE_CLZ = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1}


def _nibble_clz_case(col):
    expr = F.lit(0)
    for nib, clz in sorted(_NIBBLE_CLZ.items()):
        expr = F.when(col == nib, F.lit(clz)).otherwise(expr)
    return expr


def _nibble_clz_sql(col: str) -> str:
    whens = " ".join(f"WHEN '{nib}' THEN {clz}"
                     for nib, clz in sorted(_NIBBLE_CLZ.items()))
    return f"CASE {col} {whens} ELSE 0 END"


def hll_distinct(df: DataFrame, key_col: str, group_col: str) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate of ``key_col``,
    reported next to the exact distinct so the estimation error is part
    of the verified output.

    Returns (group, n_exact, hll_estimate_r, rel_err_r) with the
    Flajolet-et-al. estimator.  Contract: one row per group that has
    at least one NON-NULL key, and a NULL group key produces no row
    (NULL keys don't hash into registers, and the report join is a
    plain equi-join — the DuckDB twin behaves identically, so parity
    holds; consumers needing every partition present left-join this
    onto their partition list, as jobs/report.py does).
    Estimator: E = alpha_m * m^2 / sum_j 2^(-M_j), with
    the small-range linear-counting correction E <= 2.5m -> m*ln(m/V)
    when empty registers remain.  The 2^(-M_j) sum is scaled by 2^52
    and accumulated as an exact BIGINT (every term is an integer power
    of two), so the estimate is a single IEEE division at the end —
    deterministic across engines and aggregation orders."""
    h = F.md5(F.col(key_col).cast("string").cast("binary"))
    reg = F.conv(F.substring(h, 1, _HLL_P // 4), 16, 10).cast("int")
    rest = F.substring(h, _HLL_P // 4 + 1, _HLL_REST_NIBBLES)
    stripped = F.regexp_replace(rest, "^0+", "")
    # rank rho = leading zero bits of the 52-bit remainder + 1, capped at
    # 52 so 2^(52-rho) stays an exact non-negative integer power of two
    rho = F.least(
        F.when(F.length(stripped) == 0, F.lit(52)).otherwise(
            (F.lit(_HLL_REST_NIBBLES) - F.length(stripped)) * 4
            + _nibble_clz_case(F.substring(stripped, 1, 1)) + 1),
        F.lit(52))

    # NULL keys are excluded to match countDistinct's NULL semantics:
    # md5(NULL) would otherwise occupy a phantom (reg=NULL) register that
    # n_present counts but present_sum skips, biasing the estimate
    regs = (df.where(F.col(key_col).isNotNull())
            .select(F.col(group_col).alias("grp"),
                    reg.alias("reg"), rho.alias("rho"))
            .groupBy("grp", "reg")
            .agg(F.max("rho").alias("m_j")))

    exact = (df.groupBy(F.col(group_col).alias("grp"))
             .agg(F.countDistinct(key_col).alias("n_exact")))

    # alpha_m spelled as the defining expression (not a rounded literal)
    # so Spark and the SQL twin evaluate the identical IEEE double
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(_HLL_M)))
    per_group = (regs.groupBy("grp")
                 .agg(F.sum(F.pow(F.lit(2.0), F.lit(52) - F.col("m_j"))
                            .cast("bigint")).alias("present_sum"),
                      F.count("*").alias("n_present")))
    isum = (F.col("present_sum")
            + (F.lit(_HLL_M) - F.col("n_present"))
            * F.pow(F.lit(2.0), F.lit(52)).cast("bigint"))
    e_raw = (alpha * F.lit(float(_HLL_M)) * F.lit(float(_HLL_M))
             * F.pow(F.lit(2.0), F.lit(52)) / isum.cast("double"))
    v_zero = F.lit(_HLL_M) - F.col("n_present")
    estimate = F.when(
        (e_raw <= F.lit(2.5 * _HLL_M)) & (v_zero > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v_zero.cast("double")),
    ).otherwise(e_raw)

    return (per_group.join(exact, "grp")
            .select(F.col("grp").alias(group_col),
                    "n_exact",
                    F.round(estimate, 4).alias("hll_estimate_r"),
                    F.round((estimate - F.col("n_exact"))
                            / F.col("n_exact"), 4).alias("rel_err_r"))
            )


def hll_sql(table: str, key_sql: str, group_sql: str, group_name: str) -> str:
    """The DuckDB twin of :func:`hll_distinct` — the identical sketch,
    spelled in ANSI SQL (kept next to the operator so the two cannot
    drift silently)."""
    clz = _nibble_clz_sql("substr(stripped, 1, 1)")
    return f"""
WITH hashed AS (
  SELECT {group_sql} AS grp,
         md5(CAST({key_sql} AS VARCHAR)) AS h
  FROM {table} WHERE {key_sql} IS NOT NULL),
ranked AS (
  SELECT grp,
         CAST(concat('0x', substr(h, 1, {_HLL_P // 4})) AS BIGINT) AS reg,
         regexp_replace(substr(h, {_HLL_P // 4 + 1}, {_HLL_REST_NIBBLES}),
                        '^0+', '') AS stripped
  FROM hashed),
rho AS (
  SELECT grp, reg,
         LEAST(CASE WHEN length(stripped) = 0 THEN 52
               ELSE ({_HLL_REST_NIBBLES} - length(stripped)) * 4
                    + {clz} + 1 END, 52) AS rho
  FROM ranked),
regs AS (SELECT grp, reg, MAX(rho) AS m_j FROM rho GROUP BY grp, reg),
exact AS (SELECT {group_sql} AS grp, COUNT(DISTINCT {key_sql}) AS n_exact
          FROM {table} GROUP BY 1),
sums AS (
  SELECT grp,
         SUM(CAST(POWER(2.0, 52 - m_j) AS BIGINT)) AS present_sum,
         COUNT(*) AS n_present
  FROM regs GROUP BY grp),
est AS (
  SELECT grp, n_present,
         (0.7213 / (1.0 + 1.079 / {float(_HLL_M)}))
           * {float(_HLL_M)} * {float(_HLL_M)} * POWER(2.0, 52)
           / CAST(present_sum
                  + ({_HLL_M} - n_present) * CAST(POWER(2.0, 52) AS BIGINT)
                  AS DOUBLE) AS e_raw
  FROM sums),
fin AS (
  SELECT grp,
         CASE WHEN e_raw <= {2.5 * _HLL_M}
                   AND ({_HLL_M} - n_present) > 0
              THEN {float(_HLL_M)}
                   * ln({float(_HLL_M)} / CAST({_HLL_M} - n_present AS DOUBLE))
              ELSE e_raw END AS estimate
  FROM est)
SELECT f.grp AS {group_name}, e.n_exact,
       ROUND(f.estimate, 4) AS hll_estimate_r,
       ROUND((f.estimate - e.n_exact) / e.n_exact, 4) AS rel_err_r
FROM fin f JOIN exact e ON f.grp = e.grp
"""


# --------------------------------------------------------------------------
# Count-min heavy hitters

_CM_DEPTH = 4
_CM_WIDTH = 256


def _cm_bucket(d_col, word_col):
    """Seeded CM cell index — the shared _seeded_mod kernel at the
    sketch's width."""
    return _seeded_mod(d_col, word_col, _CM_WIDTH)


def cm_heavy_hitters(docs: DataFrame, text_col: str = "text",
                     top_k: int = 20) -> DataFrame:
    """Count-min-sketch heavy hitters over the canonical word stream:
    depth x width counter grid (seeded md5 buckets), point estimate =
    min over depth rows of the hashed bucket's total.  Top-k words by
    estimated count, with the exact count and the sketch's overcount
    alongside (CM never undercounts — that one-sided error is asserted
    in the unit tests and visible in the verified output).

    The candidate set probed against the sketch is the distinct words
    themselves — at 100 TB you would probe a sampled/known candidate
    list instead; the sketch build (one pass, partial agg to
    depth*width cells) is the scale-relevant part, and the probe join
    is broadcast-sized by construction."""
    words = (docs.select(F.explode(
        F.coalesce(word_array(text_col), F.array())).alias("word")))

    # one row per (depth, word) occurrence -> sketch cells via partial
    # agg; seed folded into the hashed string per depth row: md5('d:word')
    seeded = words.select(
        "word",
        F.explode(F.array(*[F.lit(d) for d in range(_CM_DEPTH)])).alias("d"))
    bucketed = seeded.select(
        "word", "d", _cm_bucket(F.col("d"), F.col("word")).alias("bucket"))
    sketch = (bucketed.groupBy("d", "bucket")
              .agg(F.count("*").alias("cell_total")))

    exact = words.groupBy("word").agg(F.count("*").alias("exact_count"))
    probes = exact.select(
        "word", "exact_count",
        F.explode(F.array(*[F.lit(d) for d in range(_CM_DEPTH)])).alias("d"))
    probes = probes.withColumn(
        "bucket", _cm_bucket(F.col("d"), F.col("word")))
    est = (probes.join(F.broadcast(sketch), ["d", "bucket"])
           .groupBy("word", "exact_count")
           .agg(F.min("cell_total").alias("cm_estimate")))
    return (est
            .orderBy(F.desc("cm_estimate"), "word")
            .limit(top_k)
            .select("word", "cm_estimate", "exact_count",
                    (F.col("cm_estimate") - F.col("exact_count"))
                    .alias("overcount")))


def cm_sql(words_cte: str, top_k: int = 20) -> str:
    """DuckDB twin of :func:`cm_heavy_hitters`; ``words_cte`` must
    define a CTE named ``words`` with one row per word occurrence."""
    return f"""
WITH {words_cte},
bucketed AS (
  SELECT word, s.d,
         CAST(concat('0x', substr(md5(concat(CAST(s.d AS VARCHAR), ':', word)),
                                  1, 8)) AS BIGINT) % {_CM_WIDTH} AS bucket
  FROM words, generate_series(0, {_CM_DEPTH - 1}) AS s(d)),
sketch AS (
  SELECT d, bucket, COUNT(*) AS cell_total FROM bucketed GROUP BY d, bucket),
exact AS (SELECT word, COUNT(*) AS exact_count FROM words GROUP BY word),
probes AS (
  SELECT e.word, e.exact_count, t.d,
         CAST(concat('0x', substr(md5(concat(CAST(t.d AS VARCHAR), ':', e.word)),
                                  1, 8)) AS BIGINT) % {_CM_WIDTH} AS bucket
  FROM exact e, generate_series(0, {_CM_DEPTH - 1}) AS t(d)),
est AS (
  SELECT p.word, p.exact_count, MIN(s.cell_total) AS cm_estimate
  FROM probes p JOIN sketch s ON p.d = s.d AND p.bucket = s.bucket
  GROUP BY p.word, p.exact_count)
SELECT word, cm_estimate, exact_count,
       cm_estimate - exact_count AS overcount
FROM est
ORDER BY cm_estimate DESC, word
LIMIT {top_k}
"""


# --------------------------------------------------------------------------
# Bloom filter

_BLOOM_M = 65536  # bits
_BLOOM_K = 4      # hash functions


def _bloom_bit(i_col, key_col):
    """Seeded bit position i:key -> [0, m) — the shared _seeded_mod
    kernel at the filter's bit width."""
    return _seeded_mod(i_col, key_col, _BLOOM_M)


def bloom_probe(existing: DataFrame, incoming: DataFrame,
                existing_key: str, incoming_key: str) -> DataFrame:
    """Bloom-filter membership probe of ``incoming`` keys against the
    set of ``existing`` keys — the crawl-frontier seen-list shape: at
    10^12 urls the seen-set cannot be joined exactly against every
    frontier batch, but its Bloom bits fit in executor memory.

    Returns ONE summary row (n_probed, n_flagged, n_true_members,
    n_false_positives, fp_rate_r): the probe outcome AND its exact
    error accounting, so the sketch's one-sided guarantee (no false
    negatives — every true member is flagged) is part of the verified
    output.

    Scale shape: the filter is a distinct-bit TABLE (<= m rows — here
    8192) built with one partial-agg pass over the seen keys, then
    broadcast; probing shuffles NOTHING on the frontier side (k narrow
    hash projections + a broadcast join + a per-key partial agg).  The
    production variant packs the bits into m/64 longs and broadcasts
    the bitmap itself; the bit-table form here is semantically
    identical and keeps the exact SQL twin."""
    seeds = F.array(*[F.lit(i) for i in range(_BLOOM_K)])
    bits = (existing
            .select(F.col(existing_key).alias("k"))
            .where(F.col("k").isNotNull())
            .select("k", F.explode(seeds).alias("i"))
            .select(_bloom_bit(F.col("i"), F.col("k")).alias("bit"))
            .distinct())
    # DISTINCT before probing (mirrors the SQL twin): a key occurring
    # r times would otherwise produce r*k hit rows and fail the
    # n_hit == k membership test — a duplicated frontier URL (the
    # operator's own use case) would dodge the no-false-negative
    # guarantee entirely
    probes = (incoming
              .select(F.col(incoming_key).alias("k"))
              .where(F.col("k").isNotNull())
              .distinct()
              .select("k", F.explode(seeds).alias("i"))
              .select("k", _bloom_bit(F.col("i"), F.col("k")).alias("bit")))
    flagged = (probes
               .join(F.broadcast(bits), "bit", "left_semi")
               .groupBy("k")
               .agg(F.count("*").alias("n_hit"))
               .where(F.col("n_hit") == _BLOOM_K)
               .select("k"))
    truth = (incoming
             .select(F.col(incoming_key).alias("k"))
             .where(F.col("k").isNotNull())
             .distinct()
             .join(existing.select(F.col(existing_key).alias("k")).distinct(),
                   "k", "left_semi"))
    n_probed = (incoming.select(F.col(incoming_key).alias("k"))
                .where(F.col("k").isNotNull()).distinct()
                .agg(F.count("*").alias("n_probed")))
    summary = (n_probed
               .crossJoin(flagged.agg(F.count("*").alias("n_flagged")))
               .crossJoin(truth.agg(F.count("*").alias("n_true_members"))))
    return summary.select(
        "n_probed", "n_flagged", "n_true_members",
        (F.col("n_flagged") - F.col("n_true_members"))
        .alias("n_false_positives"),
        F.round((F.col("n_flagged") - F.col("n_true_members"))
                / F.greatest(F.col("n_probed") - F.col("n_true_members"),
                             F.lit(1)), 6).alias("fp_rate_r"))


def bloom_sql(existing_table: str, existing_key: str,
              incoming_table: str, incoming_key: str) -> str:
    """DuckDB twin of :func:`bloom_probe` — identical bits, identical
    accounting."""
    def bit(seed_col: str, key_col: str) -> str:
        return (f"CAST(concat('0x', substr(md5(concat(CAST({seed_col} AS "
                f"VARCHAR), ':', CAST({key_col} AS VARCHAR))), 1, 8)) "
                f"AS BIGINT) % {_BLOOM_M}")
    return f"""
WITH bits AS (
  SELECT DISTINCT {bit("s.i", "e." + existing_key)} AS bit
  FROM {existing_table} e, generate_series(0, {_BLOOM_K - 1}) AS s(i)
  WHERE e.{existing_key} IS NOT NULL),
probes AS (
  SELECT n.k, {bit("s.i", "n.k")} AS bit
  FROM (SELECT DISTINCT {incoming_key} AS k FROM {incoming_table}
        WHERE {incoming_key} IS NOT NULL) n,
       generate_series(0, {_BLOOM_K - 1}) AS s(i)),
flagged AS (
  SELECT p.k FROM probes p JOIN bits b ON p.bit = b.bit
  GROUP BY p.k HAVING COUNT(*) = {_BLOOM_K}),
truth AS (
  SELECT DISTINCT i.{incoming_key} AS k FROM {incoming_table} i
  WHERE i.{incoming_key} IS NOT NULL
    AND EXISTS (SELECT 1 FROM {existing_table} e
                WHERE e.{existing_key} = i.{incoming_key})),
counts AS (
  SELECT (SELECT COUNT(*) FROM (SELECT DISTINCT {incoming_key} FROM
            {incoming_table} WHERE {incoming_key} IS NOT NULL)) AS n_probed,
         (SELECT COUNT(*) FROM flagged) AS n_flagged,
         (SELECT COUNT(*) FROM truth) AS n_true_members)
SELECT n_probed, n_flagged, n_true_members,
       n_flagged - n_true_members AS n_false_positives,
       ROUND((n_flagged - n_true_members) * 1.0
             / GREATEST(n_probed - n_true_members, 1), 6) AS fp_rate_r
FROM counts
"""


# --------------------------------------------------------------------------
# Histogram quantile sketch

def hist_quantiles(df: DataFrame, value_col: str, group_col: str,
                   n_bins: int = 64,
                   qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99)) -> DataFrame:
    """Mergeable fixed-grid quantile sketch — the quantile member of
    the sketch family (next to HLL distinct counts, count-min heavy
    hitters and the Bloom seen-list): per-group approximate quantiles
    from a two-pass equi-width histogram with linear interpolation
    inside the hit bin.

    Why this shape at 100 TB: an EXACT per-group percentile
    (orders_price_percentiles) must shuffle and sort every value; the
    histogram needs two scan-speed passes — one 1-row min/max agg
    (broadcast back as an in-plan scalar, no collect) and one
    partial-agg count into at most ``n_bins`` cells per group — so the
    post-scan state is bins x groups regardless of corpus size, and
    bin-count tables from different partitions/days/snapshots merge by
    integer addition (the mergeability that order statistics lack).
    Accuracy is bounded by the bin width, exercised against the exact
    percentiles in the oracle suite.

    Determinism: bin counts are integers; the estimate
    ``lo + width * (bin + (target - cum_before) / bin_count)`` is one
    fixed expression tree of IEEE correctly-rounded ops over exact
    integers and the min/max doubles, so both engines produce
    bit-identical doubles with no rounding.  All-equal groups
    (width = 0) estimate ``lo`` for every q.  NULL values are
    excluded; targets use ceil(q * n) ranks (the nearest-rank
    convention), so q=0.99 on a 4-row group reads the 4th value's bin.
    """
    from pyspark.sql import Window

    _validate_qs(qs)
    v = F.col(value_col).cast("double")
    mm = (df.where(v.isNotNull())
          .agg(F.min(v).alias("lo"), F.max(v).alias("hi")))
    width = (F.col("hi") - F.col("lo")) / n_bins
    bin_ = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(F.lit(n_bins - 1),
                F.floor((v - F.col("lo")) / width))).cast("int")
    counts = (df.where(v.isNotNull())
              .crossJoin(F.broadcast(mm))
              .groupBy(F.col(group_col).alias("grp"),
                       bin_.alias("bin"),
                       F.col("lo"), F.col("hi"))
              .agg(F.count("*").alias("n")))
    w = Window.partitionBy("grp").orderBy("bin")
    wall = Window.partitionBy("grp")
    cum = (counts
           .withColumn("cum", F.sum("n").over(w))
           .withColumn("total", F.sum("n").over(wall)))
    qlit = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    hit = (cum.select("*", qlit)
           .withColumn("target", F.ceil(F.col("q") * F.col("total")))
           .where((F.col("cum") >= F.col("target"))
                  & (F.col("cum") - F.col("n") < F.col("target"))))
    est = F.when(
        F.col("hi") == F.col("lo"), F.col("lo")).otherwise(
        F.col("lo") + (F.col("hi") - F.col("lo")) / n_bins
        * (F.col("bin")
           + (F.col("target") - (F.col("cum") - F.col("n")))
           / F.col("n")))
    return (hit.select("grp", "q", est.alias("est"))
            .withColumnRenamed("grp", group_col)
            .orderBy(group_col, "q"))


def _validate_qs(qs) -> None:
    """Loud failure on out-of-range quantiles: a q outside (0, 1]
    would otherwise match NO bin (ceil(q*n) ranks past either end) and
    silently vanish from the output — a typo'd 1.5 or 0.0 must raise,
    not drop rows."""
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 < float(q) <= 1.0:
            raise ValueError(f"quantile out of range (0, 1]: {q}")


def hist_quantiles_sql(table: str, value_sql: str, group_sql: str,
                       n_bins: int = 64,
                       qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99),
                       out_group: str = "grp") -> str:
    """DuckDB twin of hist_quantiles — the same two passes and the
    same interpolation expression tree, rendered once so Spark and the
    oracle can never drift."""
    _validate_qs(qs)
    # CAST each q: a bare 0.9 literal parses as DECIMAL(3,2) in DuckDB,
    # which would type the q output column (and the ceil(q*total)
    # target arithmetic) differently from Spark's IEEE double
    qvals = ", ".join(f"CAST({float(q)!r} AS DOUBLE)" for q in qs)
    return f"""
WITH vals AS (
  SELECT CAST({value_sql} AS DOUBLE) AS v, {group_sql} AS grp
  FROM {table} WHERE {value_sql} IS NOT NULL),
mm AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM vals),
binned AS (
  SELECT grp,
         CASE WHEN hi = lo THEN 0
              ELSE CAST(least({n_bins - 1},
                   floor((v - lo) / ((hi - lo) / {n_bins}))) AS INTEGER)
         END AS bin, lo, hi
  FROM vals, mm),
counts AS (
  SELECT grp, bin, lo, hi, COUNT(*) AS n
  FROM binned GROUP BY grp, bin, lo, hi),
cum AS (
  SELECT grp, bin, lo, hi, n,
         SUM(n) OVER (PARTITION BY grp ORDER BY bin) AS cum,
         SUM(n) OVER (PARTITION BY grp) AS total
  FROM counts),
hit AS (
  SELECT grp, q, bin, lo, hi, n, cum, total,
         CAST(ceil(q * total) AS BIGINT) AS target
  FROM cum, (SELECT unnest([{qvals}]) AS q) qs
  WHERE cum >= ceil(q * total) AND cum - n < ceil(q * total))
SELECT grp AS {out_group}, q,
       CASE WHEN hi = lo THEN lo
            ELSE lo + (hi - lo) / {n_bins}
                 * (bin + (target - (cum - n)) / CAST(n AS DOUBLE))
       END AS est
FROM hit
"""

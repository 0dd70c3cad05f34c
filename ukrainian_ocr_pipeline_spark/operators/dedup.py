"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

First-class training-data-pipeline components.  Everything here is
built-in-expression Spark (shingling via transform/sequence, hashing via
md5/conv — whole-stage codegen, zero Python workers), because at 100 TB
dedup IS the job and the hash path must run at scan speed.

Scale notes (1000-executor deployment):
  * exact: one shuffle on the 16-byte digest — near-uniform keys, AQE
    coalesces; the groupBy is a partial-agg (map-side combine) so the
    shuffle carries one row per distinct digest per partition.
  * minhash signatures: narrow (per-row) — no shuffle at all.
  * LSH candidates: shuffle on (band, bucket); bucket keys are uniform by
    construction (md5), skew only if true duplicate clusters are huge —
    those are exactly the rows you want co-located anyway.
  * simhash: narrow per-row after an explode(32) — constant 32x row blowup
    contained inside one stage, combined back by a partial agg.
  * pairwise Jaccard is intentionally gated behind candidate buckets —
    never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# md5-derived 32-bit hash — identical in Spark and DuckDB, unlike
# engine-native hash()/xxhash64
def _h32(col, seed: str | None = None):
    s = F.concat(F.lit(f"{seed}:"), col) if seed is not None else col
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, 8), 16, 10).cast("bigint")


def _canon(text_col: str):
    return F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content hash with
    the kept doc (min id) and the duplicate count."""
    return (docs
            .select(F.md5(_canon(text_col).cast("binary")).alias("content_hash"), "doc_id")
            .groupBy("content_hash")
            .agg(F.min("doc_id").alias("keeper_doc_id"),
                 F.count("*").alias("n_copies"))
            )


def _word_shingles(docs: DataFrame, text_col: str, k: int = 3) -> DataFrame:
    """(doc_id, shingle) rows: k-word shingles, built entirely with
    higher-order functions (sequence/transform/slice) — no UDF."""
    words = F.split(F.trim(_canon(text_col)), " ")
    shingles = F.when(
        F.size(words) < k,
        F.array(F.array_join(words, " ")),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (k - 1)),
            lambda i: F.array_join(F.slice(words, i, k), " "),
        )
    )
    return docs.select("doc_id", F.explode(shingles).alias("shingle"))


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       num_hashes: int = 8, k: int = 3) -> DataFrame:
    """(doc_id, seed, minhash): MinHash signature rows over k-word
    shingles with md5-derived hash families."""
    sh = _word_shingles(docs, text_col, k)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    return (sh
            .select("doc_id", "shingle", seeds)
            .select("doc_id", "seed",
                    _h32(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("shingle"))).alias("h"))
            .groupBy("doc_id", "seed")
            .agg(F.min("h").alias("minhash")))


def lsh_candidates(signatures: DataFrame, band_size: int = 4) -> DataFrame:
    """Band the signatures and emit candidate near-dup pairs: docs sharing
    any (band, bucket). The join is an equi-join on uniform md5 buckets."""
    banded = (signatures
              .withColumn("band", (F.col("seed") / band_size).cast("int"))
              .groupBy("doc_id", "band")
              .agg(F.md5(F.concat_ws(",", F.sort_array(F.collect_list(
                  F.concat_ws(":", "seed", "minhash")))).cast("binary")).alias("bucket")))
    a = banded.alias("a")
    b = banded.alias("b")
    return (a.join(b, ["band", "bucket"])
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 32) -> DataFrame:
    """(doc_id, simhash): bit-majority fingerprint over distinct words."""
    words = (docs
             .select("doc_id", F.explode(F.split(F.trim(_canon(text_col)), " ")).alias("word"))
             .where(F.length("word") > 0)
             .distinct()
             .withColumn("h", _h32(F.col("word"))))
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    return (words
            .select("doc_id", "h", bit)
            .select("doc_id", "bit", F.expr("(h >> bit) & 1").alias("b"))
            .groupBy("doc_id", "bit")
            .agg(F.sum("b").alias("ones"), F.count("*").alias("total"))
            .groupBy("doc_id")
            .agg(F.sum(F.when(2 * F.col("ones") >= F.col("total"),
                              F.expr("shiftleft(cast(1 as bigint), bit)"))
                       .otherwise(0)).alias("simhash")))


def jaccard_pairs(docs: DataFrame, bucket_cols: list[str],
                  text_col: str = "text", threshold: float = 0.5) -> DataFrame:
    """n-gram (word-set) Jaccard for candidate pairs sharing a bucket.

    Never all-pairs: candidates are restricted to equal `bucket_cols`
    (at scale: LSH band buckets from lsh_candidates)."""
    words = (docs
             .select("doc_id", *bucket_cols,
                     F.explode(F.split(F.trim(_canon(text_col)), " ")).alias("word"))
             .where(F.length("word") > 0)
             .distinct())
    sizes = words.groupBy("doc_id").agg(F.count("*").alias("n_words"))
    a = words.alias("a")
    b = words.alias("b")
    inter = (a.join(b, bucket_cols + ["word"])
             .where(F.col("a.doc_id") < F.col("b.doc_id"))
             .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("n_inter")))
    return (inter
            .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_words", "na"), "doc_a")
            .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_words", "nb"), "doc_b")
            .withColumn("jaccard_r", F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6))
            .where(F.col("jaccard_r") >= threshold)
            .select("doc_a", "doc_b", "n_inter", "jaccard_r"))

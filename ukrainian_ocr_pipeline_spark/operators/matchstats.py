"""Domain reporting over the real matches / spans tables.

Spark twins of the reference's reporting layer:

  * match_stats / match_top_terms ~ SurnameMatcher.get_statistics +
    get_top_surnames (ukrainian_ocr/core/surname_matcher.py:356-402):
    count / distinct / avg-min-max confidence, the same five named
    confidence buckets, and the top-N matched terms.
  * entity_spans_by_type ~ the entity export grouped by type sorted by
    confidence desc (core/ner.py:463-476), flattened to ranked rows
    (label, rank, ...) instead of a nested dict — the relational shape
    of the same artifact.

All pure JVM aggregations: one partial-agg shuffle each, no Python, no
collect — the shapes survive a 100 TB matches table unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def match_stats(matches: DataFrame,
                conf_col: str = "confidence") -> DataFrame:
    """One-row summary. Bucket edges mirror surname_matcher.py:374-380:
    excellent >=0.95, high [0.9,0.95), good [0.8,0.9),
    acceptable [0.7,0.8), low <0.7."""
    c = F.col(conf_col)

    def bucket(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    return matches.agg(
        F.count("*").alias("total_matches"),
        F.countDistinct("matched_term").alias("unique_terms"),
        F.countDistinct("found_text").alias("unique_found_texts"),
        F.round(F.avg(c), 6).alias("avg_confidence_r"),
        F.round(F.min(c), 6).alias("min_confidence_r"),
        F.round(F.max(c), 6).alias("max_confidence_r"),
        bucket(c >= 0.95).alias("n_excellent"),
        bucket((c >= 0.9) & (c < 0.95)).alias("n_high"),
        bucket((c >= 0.8) & (c < 0.9)).alias("n_good"),
        bucket((c >= 0.7) & (c < 0.8)).alias("n_acceptable"),
        bucket(c < 0.7).alias("n_low"),
    )


def match_top_terms(matches: DataFrame, n: int = 10) -> DataFrame:
    """Top-N matched terms by count (get_top_surnames twin).  Count desc
    with term-asc tie-break so the ranking is deterministic.

    The top-N cut is orderBy+limit (TakeOrderedAndProject — distributed
    per-partition top-N, no single-partition window over the full
    distinct-term table); the rank column is then numbered over the
    n surviving rows only."""
    w = Window.orderBy(F.desc("n_matches"), F.col("matched_term"))
    return (matches.groupBy("matched_term")
            .agg(F.count("*").alias("n_matches"))
            .orderBy(F.desc("n_matches"), F.col("matched_term"))
            .limit(n)
            .withColumn("rank", F.row_number().over(w))
            .select("rank", "matched_term", "n_matches"))


def entity_spans_by_type(spans: DataFrame) -> DataFrame:
    """Ranked-by-type entity export (core/ner.py:463-476 twin): within
    each label, entities sorted by confidence desc; ties broken by
    (entity_text, doc_id, start) so the ranking is total and
    reproducible across partitionings."""
    w = Window.partitionBy("label").orderBy(
        F.desc("confidence"), F.col("entity_text"),
        F.col("doc_id"), F.col("start"))
    return (spans
            .withColumn("rank", F.row_number().over(w))
            .select("label", "rank", "entity_text",
                    F.round("confidence", 6).alias("confidence_r"),
                    "doc_id", "start"))

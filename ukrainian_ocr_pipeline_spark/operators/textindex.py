"""Inverted-index build: term -> posting list over the document corpus.

The search-engine-shaped index build a corpus platform needs next to
its ANN indexes (jobs/index.py): document frequency, total term
frequency, and the doc_id-ordered posting list per term.  Reference
parity: the reference's surname statistics build exact per-term Python
Counters (core/surname_matcher.py:356-402); this is that aggregation
turned into a distributed index artifact.

Scale shape (1000 executors, 10^12 docs):
  * one narrow tokenize projection (HOFs, codegen), then TWO partial-agg
    shuffles: (term, doc_id) -> tf, then term -> postings.  Both keys
    are near-uniform (terms follow Zipf, but the heavy terms are
    exactly the ones whose postings you want co-located; AQE skew
    handling applies to the final agg).
  * the FULL posting list is never shipped to the driver and never
    materialized as a comparison payload: the verified output carries a
    bounded top-N slice plus an md5 over the complete doc_id-ordered
    "doc:tf" string — the whole index is checked by hash, the way the
    golden corpus checks extracted text.
  * collect_list here is per-TERM (bounded by corpus df), the same
    bounded-group discipline as A10's per-url concat; a term whose
    postings exceed executor memory would be sharded by (term,
    doc_id-bucket) first — the two-level rollup is the documented
    production variant and changes no semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import word_array


def inverted_index(docs: DataFrame, text_col: str = "text",
                   top_postings: int = 20) -> DataFrame:
    """(term, df, tf_total, top_postings, postings_hash): per distinct
    term, its document frequency, total term frequency, the first
    `top_postings` entries of the doc_id-ordered posting list rendered
    as "doc:tf,...", and the md5 of the COMPLETE rendered posting list
    (the bounded witness for the unbounded payload)."""
    tf = (docs
          .select("doc_id", F.explode(
              F.coalesce(word_array(text_col), F.array())).alias("term"))
          .groupBy("term", "doc_id")
          .agg(F.count("*").alias("tf")))
    postings = F.transform(
        F.sort_array(F.collect_list(F.struct("doc_id", "tf"))),
        lambda s: F.concat_ws(":", s["doc_id"], s["tf"]))
    return (tf.groupBy("term")
            .agg(F.count("*").alias("df"),
                 F.sum("tf").alias("tf_total"),
                 postings.alias("__postings"))
            .select("term", "df", "tf_total",
                    F.array_join(F.slice("__postings", 1, top_postings), ",")
                    .alias("top_postings"),
                    F.md5(F.array_join("__postings", ",").cast("binary"))
                    .alias("postings_hash"))
            )


def inverted_index_sql(words_cte: str, top_postings: int = 20) -> str:
    """DuckDB twin of :func:`inverted_index`; ``words_cte`` must define
    a CTE named ``words`` with (doc_id, word) occurrence rows."""
    return f"""
WITH {words_cte},
tf AS (
  SELECT word AS term, doc_id, COUNT(*) AS tf
  FROM words GROUP BY word, doc_id),
agg AS (
  SELECT term,
         COUNT(*) AS df,
         CAST(SUM(tf) AS BIGINT) AS tf_total,
         list(concat(CAST(doc_id AS VARCHAR), ':', CAST(tf AS VARCHAR))
              ORDER BY doc_id) AS postings
  FROM tf GROUP BY term)
SELECT term, df, tf_total,
       array_to_string(postings[1:{top_postings}], ',') AS top_postings,
       md5(array_to_string(postings, ',')) AS postings_hash
FROM agg
"""

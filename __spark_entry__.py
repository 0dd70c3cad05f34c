"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship: full extraction pipeline (decode → segment →
                  classify → render → NER → lexicon match → regions) over
                  deterministic fixture pages (sf0.001-sized), returning
                  the per-url metrics table.
queries()       — one entry per implemented operator (SURVEY.md §2 +
                  training-data-pipeline operators).
oracle_sql()    — DuckDB twins for every SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: run the full main-content extraction + NER +
    fuzzy-match pipeline over the deterministic synthetic pages corpus
    and return the per-url metrics table (url, success, kind, charset,
    fallback_level, blocks_detected, blocks_kept, entities, matches,
    stage_times, processing_time)."""
    from ukrainian_ocr_pipeline_spark.operators.extract import extract_pages, metrics_table
    from ukrainian_ocr_pipeline_spark.sources.pages import pages_from_fixtures

    pages = pages_from_fixtures(spark, 300)
    enriched = extract_pages(pages, salt_buckets=8)
    return metrics_table(enriched)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ukrainian_ocr_pipeline_spark.plans.registry import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ukrainian_ocr_pipeline_spark.plans.registry import ORACLE_SQL
    return dict(ORACLE_SQL)

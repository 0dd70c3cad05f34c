"""Explicit StructType schemas for every intermediate / output table.

The opposite of the reference's dynamic line dicts
(ukrainian_ocr/core/segmentation.py:212-219): fixed schemas, declared
once, shared by UDF return types, table writes, and tests.
"""

from __future__ import annotations

from pyspark.sql import types as T

BLOCK_SCHEMA = T.StructType([
    T.StructField("block_id", T.IntegerType(), False),
    T.StructField("start", T.IntegerType(), False),
    T.StructField("end", T.IntegerType(), False),
    T.StructField("tag_path", T.StringType(), True),
    T.StructField("text", T.StringType(), False),
    T.StructField("n_words", T.IntegerType(), False),
    T.StructField("n_chars", T.IntegerType(), False),
    T.StructField("link_chars", T.IntegerType(), False),
    T.StructField("text_density", T.DoubleType(), False),
    T.StructField("link_density", T.DoubleType(), False),
    T.StructField("fallback_level", T.IntegerType(), False),
    T.StructField("is_content", T.BooleanType(), False),
    T.StructField("confidence", T.DoubleType(), False),
])

SEGMENT_RESULT_SCHEMA = T.StructType([
    T.StructField("blocks", T.ArrayType(BLOCK_SCHEMA), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("charset", T.StringType(), False),
    T.StructField("fallback_level", T.IntegerType(), False),
    T.StructField("success", T.BooleanType(), False),
    T.StructField("error", T.StringType(), True),
    T.StructField("t_ms", T.DoubleType(), False),
])

SPAN_SCHEMA = T.StructType([
    T.StructField("text", T.StringType(), False),
    T.StructField("label", T.StringType(), False),
    T.StructField("confidence", T.DoubleType(), False),
    T.StructField("start", T.IntegerType(), False),
    T.StructField("end", T.IntegerType(), False),
    T.StructField("block_id", T.IntegerType(), False),
    T.StructField("context", T.StringType(), False),
])

MATCH_SCHEMA = T.StructType([
    T.StructField("found_text", T.StringType(), False),
    T.StructField("matched_term", T.StringType(), False),
    T.StructField("confidence", T.DoubleType(), False),
    T.StructField("word_idx", T.IntegerType(), False),
    T.StructField("context", T.StringType(), True),
])

REGION_SCHEMA = T.StructType([
    T.StructField("start", T.IntegerType(), False),
    T.StructField("end", T.IntegerType(), False),
    T.StructField("n_entities", T.IntegerType(), False),
    T.StructField("label", T.StringType(), False),
])

# kept-block offset pairs handed from the JVM to the NER UDF
KEPT_OFFSET_SCHEMA = T.StructType([
    T.StructField("block_id", T.IntegerType(), False),
    T.StructField("n_chars", T.IntegerType(), False),
])

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])

LINEAGE_SCHEMA = T.StructType([
    T.StructField("partition_id", T.IntegerType(), False),
    T.StructField("snapshot_id", T.LongType(), False),
    T.StructField("n_rows", T.LongType(), False),
    T.StructField("n_ok", T.LongType(), False),
    T.StructField("n_err", T.LongType(), False),
    T.StructField("min_url", T.StringType(), True),
    T.StructField("max_url", T.StringType(), True),
    T.StructField("wall_ms", T.LongType(), False),
])

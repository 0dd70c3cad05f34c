"""PySpark-native web-text extraction engine.

A brand-new, Spark-first re-expression of the capabilities of
mary-lev/ukrainian-ocr-pipeline (stage-wise document pipeline:
preprocess -> segment -> recognize -> entity-tag -> export), recast for
Common-Crawl-style web pages:

    decode html -> DOM-block segmentation -> main-content classification
    -> text render -> span-level entity tagging -> fuzzy lexicon matching
    -> entity-dense region detection -> extracted/metrics/lineage tables

Design: all domain logic lives in :mod:`ukrainian_ocr_pipeline_spark.spec`
as pure, deterministic, stdlib-only functions.  The sequential oracle
(:mod:`.oracle`) and the Spark pandas-UDFs (:mod:`.functions.udfs`) share
those functions verbatim, so per-url extracted text is byte-identical
between the distributed job and the single-threaded oracle by
construction.
"""

__version__ = "0.1.0"

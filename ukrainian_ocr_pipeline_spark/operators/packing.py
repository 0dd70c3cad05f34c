"""Training-sequence assembly: greedy token-budget packing of documents
into fixed-capacity training sequences.

The last mile of a pretraining data pipeline: after curation/dedup, docs
are concatenated into sequences of at most `budget` tokens (T5/GPT-style
example packing).  Packing is inherently sequential WITHIN a shard —
each doc's placement depends on the running fill — but shards are
independent, so the scale shape is a grouped linear scan:
`applyInPandas` over the shard key, one sorted pass per group.

At 100 TB the group key is (output_shard, lang) with shards sized by the
writer (e.g. the md5-bucket split in dedup.train_val_test_split), so
every group is bounded and the per-group scan is O(shard).  Here the
fixture-scale group key is `lang` alone.  The greedy rule is the
standard one: a doc opens a new sequence iff it does not fit in the
current NON-EMPTY one; docs larger than the budget therefore never
share a sequence with other content-bearing docs (zero-token docs —
NULL/empty text — are weightless and may precede any doc in its
sequence).  Callers chunk or drop oversized docs upstream — this
operator never splits a document.

Determinism: group order is irrelevant (each group packs independently),
in-group order is pinned by doc_id, and the outputs are pure integers —
the result is a function of the corpus alone, byte-stable under any
partitioning, and exactly mirrored by a recursive-CTE SQL twin.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from . import dedup

PACK_SCHEMA = ("doc_id long, lang string, n_tokens long, "
               "seq_id long, seq_offset long")


def sequence_pack(docs: DataFrame, text_col: str = "text",
                  budget: int = 128, group_col: str = "lang") -> DataFrame:
    """(doc_id, lang, n_tokens, seq_id, seq_offset): greedy packing of
    each `group_col` partition's docs (ordered by doc_id) into sequences
    of <= `budget` canonical whitespace tokens."""
    counted = docs.select(
        "doc_id",
        F.col(group_col).alias("lang"),
        F.size(dedup.word_array(text_col)).cast("long").alias("n_tokens"))
    # NULL text -> size(NULL) = -1; pack as an empty doc, same as ''
    counted = counted.withColumn(
        "n_tokens", F.greatest(F.col("n_tokens"), F.lit(0).cast("long")))

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_ids, offsets = [], []
        seq, fill = 0, 0
        for n in pdf["n_tokens"]:
            if fill > 0 and fill + n > budget:
                seq += 1
                fill = 0
            seq_ids.append(seq)
            offsets.append(fill)
            fill += n
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        pdf["seq_offset"] = pd.Series(offsets, dtype="int64")
        return pdf

    return counted.groupBy("lang").applyInPandas(_pack, PACK_SCHEMA)


def chunk_windows(docs: DataFrame, text_col: str = "text",
                  chunk_len: int = 64, stride: int = 48) -> DataFrame:
    """The dual of :func:`sequence_pack`: split each document into
    fixed-size overlapping context windows (chunk_len tokens, advancing
    by stride — the standard long-document treatment when training
    context is shorter than the document).

    Returns (doc_id, chunk_id, start_token, n_tokens, chunk_hash) with
    chunk_hash = md5 of the space-joined window — the downstream join
    key for chunk-level dedup/embedding without re-shipping text.
    Token-less documents (NULL/empty text) emit exactly one empty chunk
    so every doc_id stays represented (extraction parity: a row per
    input, errors never drop rows).

    Scale shape: entirely narrow — per-row HOFs (split/sequence/slice)
    with a bounded explode of ceil(n/stride) rows per doc; no shuffle,
    no Python.  A 100 TB corpus chunks at scan speed and the output
    partitioning inherits the input's url-hash buckets."""
    words = F.coalesce(dedup.word_array(text_col), F.array())
    wcol = F.col("__words")
    # last start = the first one whose window reaches the doc end: a
    # start past that would emit a window fully CONTAINED in its
    # predecessor (a redundant degenerate chunk that downstream
    # chunk-level dedup/embedding would process as a near-duplicate)
    last_start = F.lit(1) + F.lit(stride) * F.greatest(
        F.ceil((F.size(wcol) - F.lit(chunk_len)) / F.lit(float(stride)))
        .cast("int"), F.lit(0))
    starts = F.sequence(F.lit(1), last_start, F.lit(stride))
    chunk = F.slice(wcol, F.col("start_token"), chunk_len)
    return (docs.select("doc_id", words.alias("__words"))
            .select("doc_id", wcol,
                    F.explode(starts).alias("start_token"))
            .select("doc_id",
                    ((F.col("start_token") - 1) / stride)
                    .cast("long").alias("chunk_id"),
                    F.col("start_token").cast("long"),
                    F.size(chunk).cast("long").alias("n_tokens"),
                    F.md5(F.concat_ws(" ", chunk).cast("binary"))
                    .alias("chunk_hash"))
            )

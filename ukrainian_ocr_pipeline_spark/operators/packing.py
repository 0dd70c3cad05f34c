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
from pyspark.sql import DataFrame, Window, functions as F

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
        dedup.token_count(text_col).cast("long").alias("n_tokens"))

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
    if chunk_len < 1:
        raise ValueError(f"chunk_len must be positive, got {chunk_len}")
    if stride < 1:
        # stride 0 would only fail deep inside F.sequence at execution
        # time — reject the footgun at plan time like the siblings
        raise ValueError(f"stride must be positive, got {stride}")
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


def shard_assign(key_col, n_shards: int = 64):
    """Deterministic output-shard id for a document key: md5 bucket
    (the same _h32 family as the train/val/test split and every dedup
    hash) modulo `n_shards`.  A pure function of the key — shard
    membership is stable across runs, engines, and repartitionings, so
    a resumed writer re-produces byte-identical shards and a downstream
    reader can locate any document without a lookup table."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    return dedup._h32(key_col.cast("string"), seed="shard") % n_shards


def shard_manifest(docs: DataFrame, text_col: str = "text",
                   key_col: str = "doc_id",
                   n_shards: int = 64) -> DataFrame:
    """Training-output shard manifest: assign every document a
    deterministic shard (``shard_assign``), then report per-shard
    (n_docs, n_tokens, n_bytes) plus each shard's micro-fixed share of
    the total token mass — the balance report a writer publishes so a
    trainer can verify no shard is pathologically over/under-weight
    before an epoch starts (hash sharding keeps the spread tight; the
    manifest PROVES it for the corpus actually written).

    Scale shape: one partial-agg shuffle on shard_id (bounded
    cardinality = n_shards regardless of corpus size); the share window
    runs over the collapsed <= n_shards rows, so the heavy exchange is
    the first groupBy only.  Tokens use the canonical word_array
    definition (one tokenizer everywhere); NULL text counts 0 tokens /
    0 bytes but the document still lands in its shard.  EVERY shard id
    gets a row — an empty shard reports (0, 0, 0, 0) rather than being
    silently absent, since the 0-doc shard is exactly the pathological
    under-weight the report exists to expose."""
    counted = docs.select(
        shard_assign(F.col(key_col), n_shards).alias("shard_id"),
        dedup.token_count(text_col).cast("long").alias("_tok"),
        F.coalesce(F.octet_length(text_col),
                   F.lit(0)).cast("long").alias("_bytes"))
    per_shard = (counted.groupBy("shard_id")
                 .agg(F.count("*").alias("n_docs"),
                      F.sum("_tok").alias("n_tokens"),
                      F.sum("_bytes").alias("n_bytes")))
    all_shards = (docs.sparkSession.range(n_shards)
                  .select(F.col("id").cast("bigint").alias("shard_id")))
    per_shard = (all_shards.join(per_shard, "shard_id", "left")
                 .fillna(0, subset=["n_docs", "n_tokens", "n_bytes"]))
    # the share window runs over the ALREADY-COLLAPSED n_shards rows
    # (single-partition OVER () is fine at that cardinality); integer
    # division per the cross-engine micro-fix idiom, zero-token corpus
    # guarded to 0 (Spark DIV 0 is NULL, DuckDB // 0 errors — neither
    # is the answer)
    return (per_shard
            .withColumn("token_share_micro",
                        F.expr("CAST(CASE WHEN SUM(n_tokens) OVER () = 0"
                               " THEN 0 ELSE n_tokens * 1000000 DIV "
                               "SUM(n_tokens) OVER () END AS BIGINT)"))
            .select("shard_id",
                    F.col("n_docs").cast("long"),
                    F.col("n_tokens").cast("long"),
                    F.col("n_bytes").cast("long"),
                    "token_share_micro"))


def training_token_shards(docs: DataFrame, text_col: str = "text",
                          key_col: str = "doc_id",
                          budget: int = 4096,
                          seed: str = "shuffle",
                          passthrough: tuple = ()) -> DataFrame:
    """Deterministic global shuffle + token-budget CONTIGUOUS sharding —
    the training-export step :func:`shard_manifest` deliberately is not:
    instead of hash-mod membership (stable but token-unbalanced per
    shard), every document gets a pseudo-random position in ONE global
    order (md5 of its key — the corpus shuffle a trainer wants baked
    into the data) and shards are cut at running-token-count boundaries,
    so every shard except the last carries ~`budget` tokens regardless
    of document length skew.

    Returns (doc_id, shuffle_key, n_tokens, shard_id) with
    shard_id = floor(start_offset / budget) where start_offset is the
    sum of token counts of all docs BEFORE this one in shuffle order.
    A document therefore lands in the shard where it starts; oversized
    docs spill over their boundary rather than splitting (this operator
    never splits a document — chunk upstream via chunk_windows).

    Scale shape — the global running sum is built WITHOUT a
    single-partition window over the corpus: md5 keys are uniform hex,
    so the first two hex chars split the total order into 256
    contiguous, population-balanced ranges.  The cumsum window runs
    per-bucket (parallel, partitionBy bucket); bucket start offsets
    come from a 256-row rollup whose own window is trivially small;
    the offsets rejoin via broadcast.  Net: one bounded-key shuffle +
    one broadcast join, identical output to the naive global window,
    which the DuckDB twin uses directly.

    Determinism: shuffle_key is unique per doc (md5 of a unique key;
    doc_id tie-break pinned anyway), token counts are the canonical
    integer word_array definition, and all arithmetic is integer —
    byte-stable across engines and partitionings.  A NULL key folds to
    the empty string rather than a NULL md5 (which the bucket equi-join
    would silently DROP, and whose NULLS FIRST/LAST window placement
    differs across engines); multiple NULL-keyed rows therefore share
    one shuffle position, ordered among themselves by n_tokens (their
    doc_id tiebreak is vacuous — byte-stability among NULL-keyed docs
    holds up to the interchangeability of equal-length docs; give docs
    real ids if that matters).

    `passthrough` names extra input columns carried through to the
    output unchanged (e.g. ("lang", "text") for an export writer) — an
    exporter that instead re-joined this result back to the corpus on
    doc_id would ship one row per document through a second corpus-wide
    join, the exact shape this operator's two-level prefix sum exists
    to avoid."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    reserved = {"doc_id", "shuffle_key", "n_tokens", "shard_id",
                "_bucket", "_intra_off", "_bucket_off", "_btok", "_start"}
    clash = reserved.intersection(passthrough)
    if clash:
        raise ValueError(f"passthrough columns collide with outputs: "
                         f"{sorted(clash)}")
    counted = docs.select(
        F.col(key_col).alias("doc_id"),
        F.md5(F.concat(F.lit(seed + ":"),
                       F.coalesce(F.col(key_col).cast("string"),
                                  F.lit("")))
              .cast("binary")).alias("shuffle_key"),
        dedup.token_count(text_col).cast("long").alias("n_tokens"),
        *[F.col(c) for c in passthrough])
    counted = counted.withColumn(
        "_bucket", F.substring("shuffle_key", 1, 2))
    # asc_nulls_first is Spark's default, spelled out because the
    # DuckDB twin must say NULLS FIRST explicitly (its default is
    # NULLS LAST — a NULL-keyed doc would otherwise land on the other
    # side of an ''-keyed doc sharing the same folded shuffle_key);
    # n_tokens is the last-resort tiebreak so two NULL-keyed docs
    # with different lengths still cumsum in one fixed order
    w_intra = (Window.partitionBy("_bucket")
               .orderBy(F.col("shuffle_key"),
                        F.col("doc_id").asc_nulls_first(),
                        F.col("n_tokens"))
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    intra = counted.withColumn(
        "_intra_off", F.sum("n_tokens").over(w_intra) - F.col("n_tokens"))
    # 256-row rollup: single-partition window is fine at that
    # cardinality (same justification as shard_manifest's OVER ())
    w_bucket = (Window.orderBy("_bucket")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    bucket_offs = (counted.groupBy("_bucket")
                   .agg(F.sum("n_tokens").alias("_btok"))
                   .withColumn("_bucket_off",
                               F.sum("_btok").over(w_bucket)
                               - F.col("_btok"))
                   .select("_bucket", "_bucket_off"))
    return (intra.join(F.broadcast(bucket_offs), "_bucket")
            .withColumn("_start", F.col("_bucket_off") + F.col("_intra_off"))
            .withColumn("shard_id",
                        F.expr(f"CAST(_start DIV {int(budget)} AS BIGINT)"))
            .select("doc_id", "shuffle_key", "n_tokens", "shard_id",
                    *[F.col(c) for c in passthrough]))


def compaction_plan(files: DataFrame, part_col: str = "part",
                    file_col: str = "file_id", size_col: str = "bytes",
                    target_bytes: int = 1 << 27) -> DataFrame:
    """Small-file compaction plan: within each table partition, assign
    files (in stable `file_col` order) to output bins by the running
    byte offset — bin = floor(offset_before_file / target) — and report
    one row per planned output file: (part, bin_id, n_files, bin_bytes,
    first_file, last_file).  This is the planning half of an
    Iceberg-style binpack rewrite (rewrite_data_files): a streaming
    writer leaves thousands of KB-scale files per partition; the plan
    groups contiguous runs into ~target-size outputs so the rewrite
    itself is a partition-local read->write with no shuffle.

    The offset rule (not first-fit-decreasing) is chosen deliberately:
    it is a pure window expression — deterministic, order-stable,
    SQL-mirrorable — and for the small-file regime it is within one
    file of optimal bin count per partition.  Oversized files (>
    target) get bins to themselves plus whatever tail started before
    them; a rewrite would copy them through unchanged.

    Scale shape: the only wide op is the per-partition cumulative-sum
    window — bounded by files-per-partition (a table-maintenance
    invariant, thousands not billions), never by corpus bytes; the
    final groupBy collapses to <= bins rows per partition."""
    if target_bytes <= 0:
        raise ValueError(
            f"target_bytes must be positive, got {target_bytes}")
    w = (Window.partitionBy(part_col).orderBy(file_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sz = F.coalesce(F.col(size_col).cast("long"), F.lit(0).cast("long"))
    offset = (F.sum(sz).over(w) - sz).alias("_off")
    planned = files.select(
        F.col(part_col).alias("part"), F.col(file_col).alias("file_id"),
        sz.alias("_sz"), offset)
    planned = planned.withColumn(
        "bin_id", F.expr(f"CAST(_off DIV {int(target_bytes)} AS BIGINT)"))
    return (planned.groupBy("part", "bin_id")
            .agg(F.count("*").cast("long").alias("n_files"),
                 F.sum("_sz").cast("long").alias("bin_bytes"),
                 F.min("file_id").alias("first_file"),
                 F.max("file_id").alias("last_file")))


def curriculum_stages(scored: DataFrame, score_col: str,
                      weight_col: str = "n_tokens",
                      n_stages: int = 4) -> DataFrame:
    """Curriculum-learning stage plan: split the corpus into n_stages
    equal-population difficulty bins by a per-doc score (easy -> hard
    training order), reporting per-stage document and token budgets —
    the shard plan a curriculum dataloader consumes.

    The naive shape (NTILE over the corpus) is a corpus-sized
    single-partition sort.  This one never sorts the corpus: the score
    column is a 6-dp-rounded value, so the DISTINCT-score table is
    bounded (same boundedness argument as logreg_auc's rank window) —
    the window runs over THAT table, stage cuts are exact integer
    arithmetic (cum_before * n_stages div total — largest-prefix rule,
    ties share their score's stage), and per-doc assignment is a
    broadcast join of the tiny score->stage map back onto the corpus.
    Two partial-agg exchanges + one constant-size window at any corpus
    size.

    NULL scores (unscorable docs, e.g. null text) are dropped up
    front: a NULL key would silently vanish in the assignment join
    anyway, and Spark (NULLS FIRST) and standard-SQL engines (NULLS
    LAST) disagree on where NULL sorts in the cumulative window, so
    keeping them would make the stage cuts engine-dependent."""
    if n_stages < 1:
        # n_stages 0 would assign every doc to a nonsense stage -1
        # with no error — reject at plan time like the siblings
        raise ValueError(f"n_stages must be positive, got {n_stages}")
    scored = scored.where(F.col(score_col).isNotNull())
    dist = (scored.groupBy(score_col)
            .agg(F.count("*").cast("long").alias("n")))
    total = dist.agg(F.sum("n").alias("total"))
    w = (Window.orderBy(score_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    # `div`, not `/`: float division of two longs is correctly rounded
    # and can round UP to the next integer near 2^53, off-by-one-ing a
    # stage cut at exactly the corpus sizes this operator targets.
    staged = (dist
              .withColumn("cb", F.coalesce(F.sum("n").over(w),
                                           F.lit(0).cast("long")))
              .crossJoin(F.broadcast(total))
              .select(score_col,
                      F.least(F.lit(n_stages - 1),
                              F.expr(f"cast((cb * {int(n_stages)}) "
                                     "div total as int)"))
                      .alias("stage")))
    per = scored.join(F.broadcast(staged), score_col)
    return (per.groupBy("stage")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(weight_col).cast("long").alias("n_tokens"),
                 F.min(score_col).alias("min_score"),
                 F.max(score_col).alias("max_score")))


def packing_efficiency(docs: DataFrame, budget: int = 128,
                       text_col: str = "text") -> DataFrame:
    """Per-language packing-efficiency report over sequence_pack's
    greedy plan: sequences built, token mass, padding waste
    (budget - fill per non-overflowing sequence), and the fill ratio —
    the number that decides whether a packing budget fits the corpus's
    length distribution before anyone burns accelerator hours on a
    mis-sized one.  fill_ratio can exceed 1.0 when oversized documents
    (single-doc sequences over budget) dominate a language: that is a
    signal, not an error — those docs need chunking, not packing.

    Scale shape: everything downstream of sequence_pack is two
    partial-agg groupBys ((lang, seq_id), then lang) over the packed
    assignment — no new corpus scan, no window."""
    packed = sequence_pack(docs, budget=budget, text_col=text_col)
    per_seq = (packed.groupBy("lang", "seq_id")
               .agg(F.sum("n_tokens").alias("fill")))
    return (per_seq.groupBy("lang")
            .agg(F.count("*").cast("long").alias("n_seqs"),
                 F.sum("fill").cast("long").alias("n_tokens"),
                 F.sum(F.greatest(F.lit(budget) - F.col("fill"),
                                  F.lit(0))).cast("long")
                 .alias("pad_tokens"),
                 F.round(F.sum("fill") / (F.count("*") * budget), 6)
                 .alias("fill_ratio_r")))


def zorder_keys(df: DataFrame, col_a: str, col_b: str,
                bits: int = 8) -> DataFrame:
    """Z-order (Morton) clustering keys over two numeric dimensions —
    the data-layout primitive behind Delta OPTIMIZE ZORDER BY /
    Iceberg's sort-order rewrites: quantize each dimension to
    ``bits`` bits against its global min/max, then interleave the bits
    so rows close in BOTH dimensions get close keys.  Files written in
    zkey order carry tight min/max ranges on BOTH columns, which is
    what lets a scan prune files for predicates on either dimension —
    a single-column sort gives that for one dimension only.

    Returns the input plus (za, zb, zkey): the two quantized
    coordinates and the interleaved key (za's bit b lands at position
    2b+1, zb's at 2b).  All arithmetic is integer (quantization uses
    the same two-pass broadcast min/max shape as the histogram sketch;
    the interleave is shifts and masks), so keys are engine- and
    partitioning-exact.  NULL in either dimension yields a NULL zkey
    (sorts last, the convention for unclusterable rows).

    Scale shape: one 1-row min/max agg broadcast back (no collect),
    then pure narrow expressions — the actual rewrite is
    ``df.repartitionByRange(n, "zkey")`` + write, whose cost is the
    one range shuffle any clustering rewrite pays.
    """
    if not 1 <= bits <= 31:
        # 0 would build no interleave terms (obscure NoneType crash);
        # >31 shifts the top bit into the long sign bit — negative
        # keys and file ids with no error
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    top = (1 << bits) - 1
    va, vb = F.col(col_a).cast("double"), F.col(col_b).cast("double")
    mm = df.agg(F.min(va).alias("__alo"), F.max(va).alias("__ahi"),
                F.min(vb).alias("__blo"), F.max(vb).alias("__bhi"))

    def quant(v, lo, hi):
        # explicit NULL guard FIRST: Spark's least() SKIPS nulls, so
        # without it a NULL value would quantize to `top`, not NULL;
        # all-equal dimension -> 0 (same guard as the histogram sketch)
        return F.when(v.isNull(), F.lit(None)).when(
            F.col(hi) == F.col(lo), F.lit(0)).otherwise(
            F.least(F.lit(top),
                    F.floor((v - F.col(lo)) * (top + 1)
                            / (F.col(hi) - F.col(lo))))).cast("long")

    quantized = (df.crossJoin(F.broadcast(mm))
                 .withColumn("za", quant(va, "__alo", "__ahi"))
                 .withColumn("zb", quant(vb, "__blo", "__bhi"))
                 .drop("__alo", "__ahi", "__blo", "__bhi"))
    zkey = None
    for b in range(bits):
        term = (F.shiftleft(F.shiftright("za", b).bitwiseAND(F.lit(1)),
                            2 * b + 1)
                + F.shiftleft(F.shiftright("zb", b).bitwiseAND(F.lit(1)),
                              2 * b))
        zkey = term if zkey is None else zkey + term
    return quantized.withColumn("zkey", zkey.cast("long"))


def zorder_layout_stats(df: DataFrame, col_a: str, col_b: str,
                        bits: int = 8, n_files: int = 16) -> DataFrame:
    """The proof the clustering works, as a table: split the zkey space
    into ``n_files`` equal-width key ranges (the planned file
    boundaries) and report each planned file's row count plus min/max
    of BOTH quantized dimensions — with Z-ordering every file shows a
    bounded span in both columns, where a single-column sort shows
    full-range spans on the secondary column.  (Equal-width key ranges
    rather than ntile: a pure projection, no global window — real
    rewrites range-partition by zkey for the same reason.)"""
    span = 1 << (2 * bits) if 1 <= bits <= 31 else 0
    # upper bound is ALSO int32-capped: file_id is cast to int, so a
    # permitted n_files above 2^31-1 would wrap/NULL the ids the same
    # way the multiply-form overflow did
    max_files = min(span, 0x7FFFFFFF)
    if span and not 1 <= n_files <= max_files:
        raise ValueError(
            f"n_files must be in [1, {max_files}], got {n_files}")
    keyed = zorder_keys(df, col_a, col_b, bits).where(
        F.col("zkey").isNotNull())
    # boundary arithmetic floor(zkey * n_files / span), overflow-aware
    # (zkey reaches 2^(2*bits)-1 ~ 2^62 at bits=31, where the naive
    # BIGINT multiply silently wraps negative).  Three exact-first
    # forms, widest applicability last (review finding — the original
    # divisor-only rejection broke external callers like bits=8,
    # n_files=10 that the multiply era accepted):
    if span % n_files == 0:
        # integral widths: divide-first, exact at every permitted bits
        file_id = F.floor(F.col("zkey") / F.lit(span // n_files)).cast("int")
    elif (span - 1) * n_files <= 0x7FFFFFFFFFFFFFFF:
        # non-divisor but the multiply provably fits BIGINT (all
        # bits <= 27 with int32 n_files land here): integer `div`,
        # still exact
        file_id = F.expr(
            f"CAST((zkey * CAST({n_files} AS BIGINT)) "
            f"div CAST({span} AS BIGINT) AS INT)")
    else:
        # non-divisor AND the exact product would wrap: double math
        # clamped into range — zkey above 2^53 rounds in the mantissa,
        # so rows within ~2^(2*bits-53) of a boundary may land one
        # file off; acceptable for a layout STATS report (documented),
        # never a negative/overflowed id
        file_id = F.least(
            F.floor(F.col("zkey") * F.lit(n_files / span)),
            F.lit(n_files - 1)).cast("int")
    return (keyed
            .groupBy(file_id.alias("file_id"))
            .agg(F.count("*").alias("n_rows"),
                 F.min("za").alias("a_min"), F.max("za").alias("a_max"),
                 F.min("zb").alias("b_min"), F.max("zb").alias("b_max"))
            .orderBy("file_id"))

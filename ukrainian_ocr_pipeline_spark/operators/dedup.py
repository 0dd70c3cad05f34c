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


# 28-bit variant: small enough that a_seed * h28 stays inside BIGINT
# (DuckDB errors on 64-bit overflow; Spark would silently wrap — both
# avoided by construction)
def _h28(col):
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 7), 16, 10).cast("bigint")


# THE canonical whitespace-run pattern for every Spark-side split /
# collapse whose DuckDB twin uses RE2 '\s+': Java's \s matches \x0B
# where RE2's does not, so a bare r"\s+" silently diverges from the
# oracle on control-char-bearing text (the same hazard
# textstats.quality_drop_reason documents for its symbol class).
# Spelled with regex ESCAPES, not literal control chars — a literal
# newline inside the pattern would reappear verbatim in .explain()
# output and break single-line plan assertions.  WS_CHARS is the class
# body (for building negated/extended classes), WS_CLASS the bracketed
# class, WS_RUN the one-or-more run — derive, never re-spell: every
# hand copy of this class is a silent-drift hazard (one already bit:
# the BPE pretokenizer's \s survived the round-3 WS_RUN conversion).
WS_CHARS = r" \t\n\f\r"
WS_CLASS = f"[{WS_CHARS}]"
WS_RUN = WS_CLASS + "+"


def _canon(text_col: str):
    return F.lower(F.regexp_replace(F.trim(F.col(text_col)), WS_RUN, " "))


def word_array(text_col: str):
    """THE canonical whitespace-token array (of the _canon
    normalization, empties dropped) — the one token definition shared by
    textstats scoring, sequence packing, and every oracle twin's
    string_split/list_filter mirror.  NULL text yields NULL (callers
    that must treat NULL as empty wrap with coalesce/greatest)."""
    return F.filter(F.split(F.trim(_canon(text_col)), " "),
                    lambda w: F.length(w) > 0)


# the DuckDB rendering of word_array — THE one SQL tokenizer every
# oracle twin that needs the array form must interpolate (format with
# col=...), so a change to word_array/_canon has a single SQL mirror
WORD_ARRAY_SQL = (r"list_filter(string_split(lower(regexp_replace("
                  r"trim({col}), '\s+', ' ', 'g')), ' '),"
                  r" w -> len(w) > 0)")


def token_count(text_col: str):
    """NULL-safe canonical token count: size(word_array) floored at 0.
    THE one count expression (greatest-guard, not coalesce: legacy
    non-ANSI sessions return -1 for size(NULL) instead of NULL) —
    shared by shard manifests, mixture weights, classifier scoring,
    and drift reporting so the NULL/empty-text convention has a single
    definition."""
    return F.greatest(F.size(word_array(text_col)), F.lit(0))


def word_array_keepcase(text_col: str):
    """word_array WITHOUT the lowercase fold: identical token
    boundaries (case folding never changes whitespace), so positions
    align 1:1 with word_array — used where rewritten text must keep the
    source casing while matching stays case-insensitive."""
    return F.filter(
        F.split(F.trim(F.regexp_replace(F.trim(F.col(text_col)),
                                        WS_RUN, " ")), " "),
        lambda w: F.length(w) > 0)


WORD_ARRAY_KEEPCASE_SQL = (r"list_filter(string_split(regexp_replace("
                           r"trim({col}), '\s+', ' ', 'g'), ' '),"
                           r" w -> len(w) > 0)")


def content_digest(text_col: str):
    """The ONE content digest every hash-based dedup path shares.  NULL
    text hashes like EMPTY text: all empty/failed-extraction documents
    are content-identical by definition, and a single definition here
    keeps batch dedup (exact_duplicates) and ingest dedup
    (incremental_dedup) classifying the same corpus identically —
    per-operator NULL handling would make snapshot-via-incremental
    diverge from dedup-from-scratch on the first NULL."""
    return F.md5(F.coalesce(_canon(text_col), F.lit("")).cast("binary"))


def train_val_test_split(key_col):
    """Deterministic 8/1/1 train/val/test assignment: md5 bucket of the
    key (the same _h32 family as every dedup hash) — membership is a
    pure function of the key, stable across runs, engines, and
    re-partitionings (no sample(), no RNG state to ship).  The ONE split
    definition shared by the registry's corpus_split_assign query and
    jobs/curate.py — two diverging copies would let a deployed curation
    job leak eval documents into train relative to what the query layer
    reports."""
    bucket = _h32(key_col.cast("string")) % 10
    return (F.when(bucket <= 7, F.lit("train"))
            .when(bucket == 8, F.lit("val"))
            .otherwise(F.lit("test")))


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content hash with
    the kept doc (min id) and the duplicate count."""
    return (docs
            .select(content_digest(text_col).alias("content_hash"), "doc_id")
            .groupBy("content_hash")
            .agg(F.min("doc_id").alias("keeper_doc_id"),
                 F.count("*").alias("n_copies"))
            )


def _word_shingles(docs: DataFrame, text_col: str, k: int = 3) -> DataFrame:
    """(doc_id, shingle) rows: k-word shingles, built entirely with
    higher-order functions — no UDF.

    Perf note: built from k O(1) element_at lookups per shingle, not
    slice()+array_join() — slice copies a sub-array per position, which
    made shingling O(words²) per document (measured 5x slower at sf0.1)."""
    words = F.split(F.trim(_canon(text_col)), " ")
    wcol = F.col("__words")
    shingles = F.when(
        F.size(wcol) < k,
        F.array(F.array_join(wcol, " ")),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(wcol) - (k - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(wcol, i + j) for j in range(k)]),
        )
    )
    return (docs.select("doc_id", words.alias("__words"))
            .select("doc_id", F.explode(shingles).alias("shingle")))


# affine universal-hash family over the 32-bit base hash: one md5 per
# shingle, then h_seed = (a_seed * h0 + b_seed) mod 2^32 — 8x fewer md5
# calls than hashing (seed, shingle) pairs, same independence properties,
# and trivially identical across engines (64-bit int arithmetic).
_MINHASH_A = [2654435761, 2246822519, 3266489917, 668265263,
              374761393, 2166136261, 16777619, 40503]
_MINHASH_B = [975319753, 123456791, 87178291, 15485863,
              32452843, 49979687, 67867967, 86028121]


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       num_hashes: int = 8, k: int = 3) -> DataFrame:
    """(doc_id, seed, minhash): MinHash signature rows over k-word
    shingles; base hash md5-derived, per-seed family affine."""
    sh = _word_shingles(docs, text_col, k).withColumn("h0", _h28(F.col("shingle")))
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    a = F.element_at(F.array(*[F.lit(x) for x in _MINHASH_A]), F.col("seed") + 1)
    b = F.element_at(F.array(*[F.lit(x) for x in _MINHASH_B]), F.col("seed") + 1)
    return (sh
            .select("doc_id", "h0", seeds)
            .select("doc_id", "seed",
                    ((a * F.col("h0") + b) % F.lit(4294967296)).alias("h"))
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


def simhash_hamming_pairs(docs: DataFrame, text_col: str = "text",
                          max_hamming: int = 3, n_bands: int = 4,
                          bits: int = 32) -> DataFrame:
    """(doc_a, doc_b, hamming): near-dup pairs whose SimHash signatures
    differ in at most `max_hamming` bits, found by pigeonhole banding.

    The classical web-dedup shape (Manku/Jain/Sarma, WWW'07 — Google's
    production SimHash dedup): split the `bits`-bit signature into
    `n_bands` contiguous bands.  Any pair within Hamming distance
    d < n_bands must agree EXACTLY on at least one band (pigeonhole),
    so candidate generation is an equi-join on (band, band_value) —
    never an all-pairs scan — with recall exactly 1.0 by construction
    (requires max_hamming < n_bands; asserted).  Verification is one
    bit_count(xor) per candidate pair.

    Scale shape: signatures are a narrow per-row computation; the only
    shuffle is the (band, band_value) equi-join, whose keys are uniform
    md5-derived bits — the same bucketed-candidates discipline as
    lsh_candidates above.  Empty/NULL-text documents have no words,
    hence no signature, and are the exact-dedup path's job
    (content_digest), not SimHash's.
    """
    assert max_hamming < n_bands, "pigeonhole recall needs max_hamming < n_bands"
    width = bits // n_bands
    mask = (1 << width) - 1
    sig = simhash(docs, text_col, bits)
    banded = (sig
              .select("doc_id", "simhash",
                      F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"))
              .withColumn("band_val",
                          F.expr(f"(simhash >> (band * {width})) & {mask}")))
    a = banded.alias("a")
    b = banded.alias("b")
    # signatures ride along the join (functionally determined by doc_id),
    # so the verify stage needs no re-join against `sig`; the hamming
    # filter runs BEFORE distinct so the dedup shuffle carries only
    # surviving pairs, not every band collision (bit_count is evaluated
    # once per candidate row — cheap codegen vs a several-times-larger
    # exchange)
    return (a.join(b, ["band", "band_val"])
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.expr("bit_count(a.simhash ^ b.simhash)")
                    .cast("bigint").alias("hamming"))
            .where(F.col("hamming") <= max_hamming)
            .distinct())


def verified_near_dups(docs: DataFrame, text_col: str = "text",
                       num_hashes: int = 8, k: int = 3, band_size: int = 4,
                       threshold: float = 0.5) -> DataFrame:
    """End-to-end near-dup detection: MinHash -> LSH banding -> candidate
    pairs -> exact word-set Jaccard verify -> threshold.

    The canonical 100 TB dedup pipeline in ONE plan: candidate generation
    is an equi-join on banded signature buckets (never all-pairs), and
    the expensive exact verification runs only on the candidate set.
    Candidates whose word sets don't actually intersect score 0 and are
    dropped by the threshold like any other false positive."""
    cands = lsh_candidates(
        minhash_signatures(docs, text_col, num_hashes, k), band_size)
    words = (docs
             .select("doc_id", F.explode(F.split(F.trim(_canon(text_col)), " ")).alias("word"))
             .where(F.length("word") > 0)
             .distinct())
    sizes = words.groupBy("doc_id").agg(F.count("*").alias("n_words"))
    wa = words.select(F.col("doc_id").alias("doc_a"), "word")
    wb = words.select(F.col("doc_id").alias("doc_b"), "word")
    inter = (cands.join(wa, "doc_a").join(wb, ["doc_b", "word"])
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_inter")))
    return (cands
            .join(inter, ["doc_a", "doc_b"], "left").na.fill({"n_inter": 0})
            .join(sizes.withColumnRenamed("doc_id", "doc_a")
                  .withColumnRenamed("n_words", "na"), "doc_a")
            .join(sizes.withColumnRenamed("doc_id", "doc_b")
                  .withColumnRenamed("n_words", "nb"), "doc_b")
            .withColumn("jaccard_r", F.round(
                F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6))
            .where(F.col("jaccard_r") >= threshold)
            .select("doc_a", "doc_b", "n_inter", "jaccard_r"))


def jaccard_pairs(docs: DataFrame, bucket_cols: list[str],
                  text_col: str = "text", threshold: float = 0.5) -> DataFrame:
    """Word-set Jaccard for candidate pairs sharing a bucket —
    VERIFY-STAGE INTERNAL, not a scale entry point.

    The public near-dup API is `verified_near_dups` (MinHash -> LSH band
    candidates -> exact verify): there `bucket_cols` are uniform LSH
    band buckets, so the within-bucket self-join stays near-linear.
    Calling this directly with LOW-CARDINALITY buckets (lang, source,
    ...) makes the word self-join near-quadratic and skew-prone at
    100x — acceptable only as a small-corpus reference/verification
    path (which is how the registry's dedup_jaccard_pairs query uses
    it: a correctness twin, excluded from the headline bench)."""
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


def contamination_check(docs: DataFrame, benchmark_ids: list[int],
                        text_col: str = "text", k: int = 5) -> DataFrame:
    """Benchmark decontamination: per document, how many of its k-word
    shingles also appear in a (small) benchmark/eval document set.

    The standard pre-training hygiene op: before training, flag corpus
    documents that leak eval data.  Scale shape: the benchmark gram set
    is tiny relative to the corpus, so the match is a BROADCAST
    semi-join on the shingle — the corpus side streams through one
    shingle pass with no corpus-wide shuffle; the per-doc rollup is the
    only aggregation.  Returns (doc_id, n_grams, n_contaminated,
    contamination_r) for non-benchmark docs with >= 1 hit."""
    grams = _word_shingles(docs, text_col, k)
    bench = (grams.where(F.col("doc_id").isin(benchmark_ids))
             .select("shingle").distinct().withColumn("hit", F.lit(1)))
    corpus = grams.where(~F.col("doc_id").isin(benchmark_ids))
    # ONE corpus shingle pass: broadcast LEFT join marks hits inline, a
    # single groupBy produces both the total and the hit count (separate
    # totals/hits branches would re-shingle the corpus twice and add a
    # doc_id join shuffle)
    return (corpus.join(F.broadcast(bench), "shingle", "left")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_grams"),
                 F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_contaminated"))
            .where(F.col("n_contaminated") >= 1)
            .select("doc_id", "n_grams", "n_contaminated",
                    F.round(F.col("n_contaminated") / F.col("n_grams"), 6)
                    .alias("contamination_r")))


def cluster_assign(pairs: DataFrame, max_iter: int = 12) -> DataFrame:
    """Connected components over near-dup pairs -> duplicate clusters.

    The FINAL step of every web-scale dedup pipeline (C4/Gopher-style):
    pairwise near-dup hits are only half the job — documents must be
    grouped into transitive clusters so exactly one representative per
    cluster survives.  Input is any (doc_a, doc_b) pair table (e.g.
    `verified_near_dups`); output assigns every paired document its
    cluster id (the component's minimum doc_id), the cluster size, and
    an `is_keeper` flag for the canonical representative.

    Algorithm: iterative min-label propagation — each round every vertex
    takes the min of its own label and its neighbors' labels, until a
    fixpoint.  Rounds needed = graph diameter; duplicate clusters are
    shallow (near-clique families), so this converges in a handful of
    rounds.  Each round is one shuffle-join on vertex id plus a partial
    agg; `localCheckpoint` truncates the lineage so plan depth stays
    constant across rounds (at cluster scale you would checkpoint to
    reliable storage — deleting round N-1's checkpoint once round N
    commits — and switch to the large-star/small-star variant, which
    contracts star centers and converges in O(log n) rounds on
    adversarial graphs — same per-round join shape).

    Storage note: each round's localCheckpoint pins one labels snapshot
    ((id, label) pairs — tiny next to the corpus) in block storage.
    Superseded snapshots become ContextCleaner-eligible once the
    rebinding below drops the last driver reference, but actual release
    waits for a driver GC (ContextCleaner's periodic-GC backstop
    defaults to 30 min), so worst-case retention is all max_iter
    snapshots — size storage for that, or move to reliable checkpoints
    with explicit per-round deletion at cluster scale.

    Raises if the graph has not converged after `max_iter` rounds (never
    silently returns a partial clustering).
    """
    # materialize the edge list ONCE — the upstream pair plan (MinHash ->
    # LSH -> verify) must not be re-executed every propagation round
    edges = (pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
             .union(pairs.select(F.col("doc_b").alias("src"),
                                 F.col("doc_a").alias("dst")))
             .distinct()
             .localCheckpoint(eager=True))
    labels = (edges.select(F.col("src").alias("doc_id")).distinct()
              .withColumn("cluster_id", F.col("doc_id")))
    for _ in range(max_iter):
        nbr_min = (edges.join(labels, edges.src == labels.doc_id)
                   .groupBy(F.col("dst").alias("doc_id"))
                   .agg(F.min("cluster_id").alias("nbr_min")))
        new_labels = (labels.join(nbr_min, "doc_id", "left")
                      .select("doc_id",
                              F.least(F.col("cluster_id"),
                                      F.coalesce(F.col("nbr_min"),
                                                 F.col("cluster_id")))
                              .alias("cluster_id"))
                      .localCheckpoint(eager=True))
        changed = (labels.withColumnRenamed("cluster_id", "old_cluster")
                   .join(new_labels, "doc_id")
                   .where(F.col("old_cluster") != F.col("cluster_id"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"cluster_assign did not converge in {max_iter} rounds")
    sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return (labels.join(sizes, "cluster_id")
            .select("doc_id", "cluster_id", "cluster_size",
                    (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper")))


def _large_star(edges: DataFrame) -> DataFrame:
    # For every vertex u: m = min(neighbors(u) + {u}); connect each
    # strictly LARGER neighbor to m.  Input/output edges canonical
    # (u > v); output stays canonical because m <= u < neighbor.
    sym = edges.union(edges.select(F.col("v").alias("u"),
                                   F.col("u").alias("v")))
    mins = (sym.groupBy("u")
            .agg(F.least(F.min("v"), F.first("u")).alias("m")))
    return (sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    # For every vertex u (over its SMALLER neighbors, canonical input
    # already orients u > v): m = min(smaller neighbors); connect u and
    # every smaller neighbor to m.  m < u and m <= each neighbor, so
    # the output is canonical too.
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    to_small = (edges.join(mins, "u")
                .where(F.col("v") != F.col("m"))
                .select(F.col("v").alias("u"), F.col("m").alias("v")))
    to_center = mins.select("u", F.col("m").alias("v"))
    return to_small.union(to_center).distinct()


def cluster_assign_star(pairs: DataFrame, max_iter: int = 40) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the O(log n)-round variant `cluster_assign`'s docstring points to
    for adversarial graphs at cluster scale.

    Same contract as `cluster_assign` (input (doc_a, doc_b) pairs;
    output (doc_id, cluster_id, cluster_size, is_keeper) with
    cluster_id = component minimum), so the two are interchangeable and
    share one oracle.  The difference is convergence: min-label
    propagation needs diameter-many rounds (a 10^6-vertex path graph —
    e.g. a chain of boilerplate-templated pages each near-dup of the
    next — would need 10^6 shuffles), while star contraction halves
    component height per round pair, so even pathological chains finish
    in ~log2(n) rounds.  Each round is two self-contained
    groupBy+join shuffles on vertex id — the same per-round cost shape
    as one label-propagation round.

    Fixpoint = the edge set is unchanged by a full large+small round;
    at that point every component is a star centered at its minimum,
    and labels read directly off the edges with no further joins.
    Raises after `max_iter` rounds rather than returning a partial
    clustering (matches `cluster_assign`); convergence + the fixpoint
    check need ~log2(n)+1 rounds on an n-vertex path, so the default 40
    covers chains past 10^11 vertices (the loop breaks early on every
    real graph — a bigger default costs nothing).
    """
    # ONE eager checkpoint of the raw pair list, so the expensive
    # upstream pair generation (MinHash -> LSH -> Jaccard verify)
    # executes exactly once; edges and verts both derive from it with
    # cheap post-checkpoint transforms.  (Two independent checkpoints
    # here would each re-run the full upstream DAG — localCheckpoint
    # actions share no exchange reuse across jobs.)  The vertex set
    # comes from the RAW pairs so a vertex whose only pair is a
    # self-loop still gets its singleton-keeper row (contract parity
    # with cluster_assign).
    p0 = (pairs.select("doc_a", "doc_b").distinct()
          .localCheckpoint(eager=True))
    edges = (p0.where(F.col("doc_a") != F.col("doc_b"))
             .select(F.greatest("doc_a", "doc_b").alias("u"),
                     F.least("doc_a", "doc_b").alias("v"))
             .distinct()
             .localCheckpoint(eager=True))
    verts = (p0.select(F.col("doc_a").alias("doc_id"))
             .union(p0.select(F.col("doc_b").alias("doc_id")))
             .distinct())
    n_edges = edges.count()
    for _ in range(max_iter):
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        n_nxt = nxt.count()
        # distinct canonical sets: equal iff same size and no new edge
        if n_nxt == n_edges and nxt.exceptAll(edges).limit(1).count() == 0:
            edges = nxt
            break
        edges, n_edges = nxt, n_nxt
    else:
        raise RuntimeError(
            f"cluster_assign_star did not converge in {max_iter} rounds")
    # fixpoint edges are (member, root) stars; roots have no out-edge
    labels = (verts.join(edges.select(F.col("u").alias("doc_id"),
                                      F.col("v").alias("root")),
                         "doc_id", "left")
              .select("doc_id",
                      F.coalesce(F.col("root"), F.col("doc_id"))
                      .alias("cluster_id")))
    sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return (labels.join(sizes, "cluster_id")
            .select("doc_id", "cluster_id", "cluster_size",
                    (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper")))


def incremental_dedup(existing: DataFrame, incoming: DataFrame,
                      text_col: str = "text") -> DataFrame:
    """Ingest-time dedup: classify every document of an incoming batch
    against the already-committed corpus AND within its own batch —
    the production ingestion path (snapshot N + new crawl -> snapshot
    N+1 without re-deduping history).

    Status per incoming doc: 'dup_of_existing' (content hash already in
    the corpus), 'dup_within_batch' (first occurrence in this batch
    wins), or 'new'.

    Scale shape: the existing side collapses to DISTINCT 16-byte
    digests — ONE equi-join on the digest (at 10^12 docs you keep that
    hash index as a digest-bucketed table so the join needs no shuffle
    of the big side), plus one window over the batch (small relative to
    the corpus).  Existing TEXT is never rescanned.

    NULL text hashes like EMPTY text (the shared content_digest
    definition): empty/failed-extraction documents dedup against each
    other deterministically instead of NULL-propagating through the
    join (which would silently drop or mis-group them), and the
    incremental path classifies exactly like a from-scratch
    exact_duplicates run.  Filter failed docs upstream if they should
    not participate."""
    h = content_digest(text_col)
    ex = (existing
          .select(h.alias("content_hash"))
          .distinct()
          .withColumn("seen", F.lit(1)))
    inc = incoming.select("doc_id", h.alias("content_hash"))
    w = Window.partitionBy("content_hash")
    return (inc.join(ex, "content_hash", "left")
            .withColumn("batch_keeper", F.min("doc_id").over(w))
            .select("doc_id", "content_hash",
                    F.when(F.col("seen").isNotNull(),
                           F.lit("dup_of_existing"))
                    .when(F.col("doc_id") != F.col("batch_keeper"),
                          F.lit("dup_within_batch"))
                    .otherwise(F.lit("new")).alias("status")))


def cross_doc_shingle_stats(docs: DataFrame, text_col: str = "text",
                            k: int = 5) -> DataFrame:
    """Per-document cross-document duplication (the RefinedWeb-style
    'how much of this page is copied text' signal): the fraction of a
    document's DISTINCT k-word shingles that occur in at least one
    OTHER document.

    Scale shape: shingles are hashed to 16-byte digests BEFORE the
    exchange (a 5-word shingle string is 3-10x wider than its digest —
    at 100 TB the shuffle IS the cost, so narrow the key first); then
    one partial-agg per-shingle doc count, one join back on the digest,
    one per-doc rollup.  Since the per-doc shingle set is DISTINCT, a
    digest's row count equals its document count — no countDistinct
    needed."""
    shd = (_word_shingles(docs, text_col, k)
           .select("doc_id",
                   F.md5(F.col("shingle").cast("binary")).alias("sh"))
           .distinct())
    counts = shd.groupBy("sh").agg(F.count("*").alias("nd"))
    return (shd.join(counts, "sh")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_shingles"),
                 F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
                 .alias("n_shared"))
            .select("doc_id", "n_shingles", "n_shared",
                    F.round(F.col("n_shared") / F.col("n_shingles"), 6)
                    .alias("shared_frac")))


def line_dedup(docs: DataFrame, text_col: str = "text",
               min_docs: int = 3) -> DataFrame:
    """C4-style cross-document LINE deduplication: any trimmed non-empty
    line that occurs in >= ``min_docs`` distinct documents is treated as
    boilerplate (nav bars, cookie banners, footers) and removed from
    EVERY document's text; the cleaned text is reassembled with the
    surviving lines in their original order.  This is the curation step
    that doc-level dedup cannot express — the document survives, its
    repeated furniture does not (C4 does this with three-sentence spans,
    Common-Crawl pipelines with lines; same shape).

    Returns one row per input document:
      doc_id, n_lines (total, incl. empty), n_removed, clean_text.

    Scale shape (10^12 docs): posexplode is narrow (rows widen inside
    one stage, no exchange); the boilerplate census is one partial-agg
    shuffle on the 16-byte line digest (count DISTINCT doc_id done as a
    two-phase agg on an already-distinct projection — one row per
    (digest, doc) per map partition reaches the exchange); the removal
    join is a shuffle equi-join on the same digest (NOT broadcast: at
    crawl scale the boilerplate set is itself huge); reassembly is one
    groupBy(doc_id) whose value payload is exactly the surviving lines.
    No Python, no window over unbounded partitions, no collect.

    Skew: blank lines all trim to the same digest but can never match
    the census (it excludes them), so they get a salted never-matching
    join key instead — without this, every blank line in the corpus
    hash-partitions into ONE task of the removal join.  The remaining
    hot keys are the ubiquitous banners themselves (every occurrence of
    one banner lands in one join partition); that is exactly the
    shuffle-join skew AQE's skew-join split handles at runtime, and the
    session config enables it.

    NULL text behaves like empty text (consistent with
    ``content_digest``): the document keeps its output row with
    clean_text = '' and one (empty) line counted."""
    lines = (docs
             .select("doc_id",
                     F.posexplode(F.split(F.coalesce(F.col(text_col),
                                                     F.lit("")), "\n", -1))
                     .alias("pos", "line"))
             .withColumn("is_blank", F.trim(F.col("line")) == "")
             # census keys are 32-hex md5; the 'blank:' prefix can never
             # collide, and the doc_id salt spreads blanks across the
             # join exchange instead of one all-blanks partition
             .withColumn("k", F.when(
                 F.col("is_blank"),
                 F.concat(F.lit("blank:"),
                          F.pmod(F.col("doc_id"), F.lit(997))
                          .cast("string")))
                 .otherwise(F.md5(F.trim(F.col("line")).cast("binary")))))
    boiler = (lines.where(~F.col("is_blank"))
              .select("k", "doc_id").distinct()
              .groupBy("k").agg(F.count("*").alias("nd"))
              .where(F.col("nd") >= min_docs)
              .select("k", F.lit(True).alias("is_dup")))
    flagged = (lines.join(boiler, "k", "left")
               .withColumn("is_dup", F.coalesce(F.col("is_dup"),
                                                F.lit(False))))
    ordered = F.array_sort(F.collect_list(F.struct("pos", "line", "is_dup")))
    return (flagged.groupBy("doc_id")
            .agg(F.count("*").alias("n_lines"),
                 F.sum(F.col("is_dup").cast("long")).alias("n_removed"),
                 F.array_join(
                     F.transform(
                         F.filter(ordered, lambda x: ~x.is_dup),
                         lambda x: x.line),
                     "\n").alias("clean_text")))


def host_boilerplate_lines(docs: DataFrame, host_col: str = "host",
                           text_col: str = "text", id_col: str = "doc_id",
                           min_frac: float = 0.5,
                           min_pages: int = 2) -> DataFrame:
    """Host-SCOPED boilerplate census: trimmed non-empty lines present
    on >= ``min_frac`` of a host's pages (and >= ``min_pages`` pages
    absolutely) — (host, line, n_pages, host_pages, frac).

    This is the per-site complement of corpus-wide ``line_dedup``: a
    footer on 80% of a small host's pages is boilerplate even when its
    global count is tiny, and a popular quote crossing many hosts is
    NOT — a global min_docs threshold can express neither.

    Scale shape: one distinct on (host, page, line) — rows widen in the
    explode stage, the exchange key is (host, line digest-equivalent);
    census is a partial-agg groupBy; the host page-count table is one
    row per host, equi-joined back (shuffle join — at crawl scale the
    host table itself is ~10^8 rows, not broadcastable).  Output is
    only the frequent lines — tiny.  No Python, no windows."""
    pages = (docs.groupBy(host_col)
             .agg(F.countDistinct(id_col).alias("host_pages")))
    lines = (docs
             .select(host_col, id_col,
                     F.explode(F.split(F.coalesce(F.col(text_col),
                                                  F.lit("")), "\r?\n", -1))
                      .alias("raw"))
             .select(host_col, id_col, F.trim("raw").alias("line"))
             .where(F.col("line") != "")
             .distinct())
    census = (lines.groupBy(host_col, "line")
              .agg(F.count("*").alias("n_pages")))
    return (census.join(pages, host_col)
            .withColumn("frac", F.round(F.col("n_pages")
                                        / F.col("host_pages"), 6))
            .where((F.col("n_pages") >= min_pages)
                   & (F.col("frac") >= min_frac)))


def _gram_table(ws_df: DataFrame, k: int) -> DataFrame:
    """(doc_id, start, gram) over a (doc_id, ws) frame: md5 of every
    k-word window, 0-based start.  THE gram definition shared by the
    detect (duplicated_passages) and apply (dup_passage_excise) steps —
    two copies would let them silently drift apart; _GRAM_CTE_SQL is
    its one DuckDB mirror."""
    return (ws_df.where(F.size("ws") >= k)
            .select("doc_id", F.posexplode(F.transform(
                F.sequence(F.lit(0), F.size("ws") - k),
                lambda i: F.md5(F.array_join(F.slice("ws", i + 1, k), " ")
                                .cast("binary"))))
                .alias("start", "gram"))
            .withColumn("start", F.col("start").cast("long")))


def _gram_cte_sql(k: int) -> str:
    """DuckDB mirror of :func:`_gram_table` — a CTE body named ``g``
    reading from a CTE named ``ws`` with (doc_id, ws)."""
    return f"""g AS (
  SELECT doc_id, i - 1 AS start,
         md5(array_to_string(ws[i:i + {k} - 1], ' ')) AS gram
  FROM ws, unnest(generate_series(1, len(ws) - {k} + 1)) AS t(i)
  WHERE len(ws) >= {k})"""


def duplicated_passages(docs: DataFrame, k: int = 5, min_docs: int = 2,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Cross-document duplicated-passage detection — the k-gram
    approximation of ExactSubstr dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): every maximal run of
    words covered by some `k`-gram that occurs in >= `min_docs` DISTINCT
    documents, reported per document as word-position ranges.  The
    passage-granular complement to line_dedup (exact repeated lines)
    and cross_doc_shingle_dup (per-doc copied-text fraction): this one
    says WHERE the copied text sits, so a curation pass can excise the
    span instead of dropping the document.

    Scale shape (10^12 docs): the gram table is one row per corpus
    token (narrow: doc_id, start, md5) built by a posexplode over an
    in-row transform — no join; duplicated grams come from two
    partial-agg shuffles on the gram hash ((gram, doc) dedup, then the
    distinct-doc count), and the hit join is equi on that same hash, so
    AQE reuses the co-partitioning; the only other exchange is one
    shuffle on doc_id for the per-doc interval merge, whose windows are
    bounded by document length.  Integer arithmetic only — no
    cross-engine float risk.  Stateless form re-derives the gram
    projection on the hit side (two Generates, pinned by plan test) —
    linear map work, no extra shuffle; a production run over 10^12 docs
    would materialize the gram table once (the banded_mat discipline).
    Within-doc-only repeats are deliberately NOT flagged (distinct-doc
    count, not occurrence count); per-doc repetition is
    doc_repetition_signals' job.

    Output: (doc_id, range_start, range_end, n_words) — 0-based
    inclusive word positions of each maximal covered run (every run is
    >= k words by construction).
    """
    grams = _gram_table(docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(word_array(text_col), F.array()).alias("ws")), k)
    dup_grams = (grams.select("gram", "doc_id").distinct()
                 .groupBy("gram").agg(F.count("*").alias("nd"))
                 .where(F.col("nd") >= min_docs)
                 .select("gram"))
    hits = grams.join(dup_grams, "gram").select("doc_id", "start")
    w = Window.partitionBy("doc_id").orderBy("start")
    flagged = (hits
               .withColumn("prev_max_end",
                           F.max(F.col("start") + (k - 1))
                           .over(w.rowsBetween(Window.unboundedPreceding, -1)))
               .withColumn("new_island",
                           (F.col("prev_max_end").isNull()
                            | (F.col("start") > F.col("prev_max_end") + 1))
                           .cast("long"))
               .withColumn("island", F.sum("new_island").over(w)))
    return (flagged.groupBy("doc_id", "island")
            .agg(F.min("start").alias("range_start"),
                 (F.max("start") + (k - 1)).alias("range_end"))
            .select("doc_id", "range_start", "range_end",
                    (F.col("range_end") - F.col("range_start") + 1)
                    .alias("n_words")))


def duplicated_passages_sql(table: str, k: int = 5,
                            min_docs: int = 2) -> str:
    """DuckDB twin of :func:`duplicated_passages` (same 0-based
    inclusive ranges, same distinct-doc gram threshold)."""
    return f"""
WITH ws AS (
  SELECT doc_id, {WORD_ARRAY_SQL.format(col="text")} AS ws
  FROM {table}),
{_gram_cte_sql(k)},
dup AS (
  SELECT gram
  FROM (SELECT DISTINCT gram, doc_id FROM g)
  GROUP BY gram HAVING COUNT(*) >= {min_docs}),
hits AS (SELECT doc_id, start FROM g JOIN dup USING (gram)),
flagged AS (
  SELECT doc_id, start,
         MAX(start + {k} - 1) OVER (
             PARTITION BY doc_id ORDER BY start
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max_end
  FROM hits),
isl AS (
  SELECT doc_id, start,
         SUM(CASE WHEN prev_max_end IS NULL OR start > prev_max_end + 1
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY start) AS island
  FROM flagged)
SELECT doc_id,
       MIN(start) AS range_start,
       MAX(start) + {k} - 1 AS range_end,
       MAX(start) + {k} - 1 - MIN(start) + 1 AS n_words
FROM isl GROUP BY doc_id, island
"""


def dup_passage_excise(docs: DataFrame, k: int = 5, min_docs: int = 2,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """The APPLY step of cross-doc passage dedup: excise every
    duplicated passage from every document except the passage's owner
    (the minimum doc_id among the documents sharing the gram), and
    reassemble the surviving words.  ExactSubstr's "keep one copy"
    semantics (Lee et al. 2022) made deterministic without any notion
    of corpus order: ownership is a pure min-aggregate per gram, so the
    result is identical under any partitioning and both engines.

    A word position is excised only when EVERY duplicated gram covering
    it is owned elsewhere — a doc keeps every word of every passage it
    owns, so each duplicated passage provably survives, contiguous, in
    at least its owner (overlapping grams with different owners cannot
    cascade a passage out of the whole corpus).  Matching is
    case-insensitive (the word_array canon, like every dedup operator),
    but rewritten text is reassembled from the case-preserving token
    split, and a document with nothing to excise passes through with
    its text VERBATIM (original casing, newlines, spacing) — only docs
    that actually lose words get whitespace-canonicalized by the
    word-level rejoin.

    Scale shape: same shared gram table (_gram_table) + two partial-agg
    shuffles as duplicated_passages (the min(doc_id)/distinct-count
    rollup is one agg), one co-partitioned hit join, one (doc,
    position) partial-agg for the owned-anywhere-here test, one doc_id
    rollup of removal positions (bounded by doc length), and a final
    equi-join back to the tokens.  The per-doc position filter is an
    in-row HOF; integers and strings only.

    Output: (doc_id, n_removed_words, clean_text).
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(word_array(text_col), F.array()).alias("ws"),
        F.coalesce(word_array_keepcase(text_col), F.array())
        .alias("ws_orig"),
        F.col(text_col).alias("__text"))
    grams = _gram_table(base.select("doc_id", "ws"), k)
    owners = (grams.groupBy("gram")
              .agg(F.min("doc_id").alias("owner"),
                   F.count_distinct("doc_id").alias("nd"))
              .where(F.col("nd") >= min_docs)
              .select("gram", "owner"))
    pos = (grams.join(owners, "gram")
           .select("doc_id",
                   F.explode(F.sequence(
                       "start", F.col("start") + (k - 1))).alias("p"),
                   (F.col("doc_id") == F.col("owner")).alias("own")))
    removal = (pos.groupBy("doc_id", "p")
               .agg(F.max(F.col("own").cast("int")).alias("any_own"))
               .where(F.col("any_own") == 0)
               .groupBy("doc_id")
               .agg(F.collect_set("p").alias("covered")))
    # linear rebuild: positions-to-keep = array_except(all positions,
    # covered) — hash-based O(n), vs a per-word array_contains lambda
    # which is O(n_removed * doc_len) in-row and stalls the task on a
    # long mostly-duplicated doc (a mirrored megapage).  array_except
    # preserves the first array's ascending order, so word order holds.
    positions = F.when(F.size("ws_orig") == 0,
                       F.array().cast("array<bigint>")) \
                 .otherwise(F.sequence(F.lit(0).cast("bigint"),
                                       (F.size("ws_orig") - 1).cast("bigint")))
    kept = F.array_except(positions, F.col("covered"))
    clean = F.transform(kept, lambda p: F.element_at(
        "ws_orig", (p + 1).cast("int")))
    return (base.join(removal, "doc_id", "left")
            .select("doc_id",
                    # greatest-guard per token_count: legacy non-ANSI
                    # sizeOfNull returns -1 where the twin yields 0
                    F.greatest(F.size("covered"), F.lit(0)).cast("long")
                    .alias("n_removed_words"),
                    F.when(F.col("covered").isNull(),
                           F.coalesce(F.col("__text"), F.lit("")))
                    .otherwise(F.array_join(clean, " "))
                    .alias("clean_text")))


def dup_passage_excise_sql(table: str, k: int = 5,
                           min_docs: int = 2) -> str:
    """DuckDB twin of :func:`dup_passage_excise` (1-based lambda index
    shifted to the Spark side's 0-based positions)."""
    return f"""
WITH ws AS (
  SELECT doc_id, {WORD_ARRAY_SQL.format(col="text")} AS ws,
         {WORD_ARRAY_KEEPCASE_SQL.format(col="text")} AS ws_orig,
         text AS orig_text
  FROM {table}),
{_gram_cte_sql(k)},
own AS (
  SELECT gram, MIN(doc_id) AS owner
  FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= {min_docs}),
pos AS (
  SELECT g.doc_id,
         unnest(generate_series(g.start, g.start + {k} - 1)) AS p,
         (g.doc_id = own.owner) AS own
  FROM g JOIN own USING (gram)),
cov AS (
  SELECT doc_id, list(p) AS covered
  FROM (SELECT doc_id, p FROM pos
        GROUP BY doc_id, p
        HAVING MAX(CASE WHEN own THEN 1 ELSE 0 END) = 0)
  GROUP BY doc_id)
SELECT ws.doc_id,
       CAST(COALESCE(len(covered), 0) AS BIGINT) AS n_removed_words,
       CASE WHEN covered IS NULL THEN COALESCE(orig_text, '')
            ELSE COALESCE(array_to_string(
              list_filter(ws_orig, (w, i) -> NOT list_contains(
                covered, i - 1)), ' '), '')
       END AS clean_text
FROM ws LEFT JOIN cov USING (doc_id)
"""


def cluster_keepers_by_quality(clusters: DataFrame, docs: DataFrame,
                               text_col: str = "text",
                               id_col: str = "doc_id") -> DataFrame:
    """Re-elect each near-dup cluster's keeper as the HIGHEST-QUALITY
    member (longest text as the quality proxy, ties to the smaller
    doc_id) — the RefinedWeb-style policy: production dedup keeps the
    best copy, not the arbitrarily-min-id copy, because near-dups are
    often truncated/boilerplate-padded variants of one page.

    Takes any (doc_id, cluster_id, cluster_size, is_keeper) clustering
    (cluster_assign or cluster_assign_star — cluster_id stays the
    component minimum as the stable cluster NAME; only is_keeper moves)
    and the docs table for the quality column.  One broadcast-free
    equi-join on doc_id plus a per-cluster window bounded by cluster
    size.  Output adds the deciding quality score (n_chars)."""
    scored = clusters.drop("is_keeper").join(
        docs.select(F.col(id_col).alias("doc_id"),
                    F.length(F.coalesce(F.col(text_col), F.lit("")))
                    .alias("n_chars")),
        "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"),
                                                 "doc_id")
    return (scored.withColumn("__rn", F.row_number().over(w))
            .select("doc_id", "cluster_id", "cluster_size", "n_chars",
                    (F.col("__rn") == 1).alias("is_keeper")))


def split_leakage_check(docs: DataFrame, text_col: str = "text",
                        num_hashes: int = 8, k: int = 3,
                        band_size: int = 4,
                        threshold: float = 0.5) -> DataFrame:
    """Eval-contamination guard: verified near-duplicate pairs that
    STRADDLE the train/val/test split — the leak a random doc-level
    split always has (near-identical pages land on opposite sides of
    the hash split, so the model is evaluated on paraphrases of its
    training data; Lee et al.'s dedup paper measures exactly this
    inflation).  Zero rows is the release gate.

    Composes the two canonical definitions rather than re-deriving
    either: pairs from verified_near_dups (MinHash -> LSH -> exact
    Jaccard, never all-pairs) and membership from
    train_val_test_split (the ONE split function jobs/curate.py
    deploys) — so the check can never drift from what the pipeline
    actually ships.  Scale shape: `sp` is one row per corpus document
    (corpus-sized, NOT broadcastable); the two equi-joins key on
    doc_id, so at scale they run as shuffle joins against sp — or, if
    the verified-pair set is small enough, broadcast THAT side.  AQE
    picks correctly; never hint broadcast(sp)."""
    pairs = verified_near_dups(docs, text_col, num_hashes, k,
                               band_size, threshold)
    sp = docs.select("doc_id",
                     train_val_test_split(F.col("doc_id")).alias("split"))
    return (pairs
            .join(sp.select(F.col("doc_id").alias("doc_a"),
                            F.col("split").alias("split_a")), "doc_a")
            .join(sp.select(F.col("doc_id").alias("doc_b"),
                            F.col("split").alias("split_b")), "doc_b")
            .where(F.col("split_a") != F.col("split_b"))
            .select("doc_a", "doc_b", "jaccard_r", "split_a", "split_b"))


def winnow_fingerprints(docs: DataFrame, text_col: str = "text",
                        k: int = 3, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 — the MOSS algorithm): hash every ``k``-word shingle, slide a
    window of ``w`` consecutive gram hashes, keep the minimum of each
    window (RIGHTMOST occurrence on ties, the paper's rule), dedup the
    selected (position, hash) pairs.  The guarantee: any shared run of
    at least w+k-1 words between two documents shares at least one
    fingerprint — position-robust partial-overlap detection with a
    fingerprint density of ~2/(w+1) instead of every gram.

    Returns (doc_id, pos, fp): 1-based word position of the selected
    gram and its 28-bit md5 gram hash (_h28 — the shared minhash
    kernel, engine-portable).

    Scale shape: everything up to the final explode is IN-ROW — token
    split, gram hashing, window minima and the rightmost-tie argmin are
    HOF transforms over bounded arrays (the argmin is min + position-in
    -reversed-window, the same two primitives both engines have, NOT a
    per-window reduce), then one array_distinct before the explode, so
    the emitted rows are the ~2n/(w+1) fingerprints, never the n·w
    window slices.  No shuffle at all; downstream candidate joins
    shuffle only fingerprint-sized rows.  Docs with fewer than k words
    contribute one whole-text gram (the shingle convention shared with
    minhash_signatures); empty/NULL docs contribute nothing.
    """
    # STAGED projections, not one expression tree: Catalyst does no
    # common-subexpression elimination inside HOF lambdas, so an
    # all-in-one formulation re-derives the md5 gram-hash array for
    # every slice reference of every window (measured 1700x slower).
    # Each stage references the previous alias once (CollapseProject
    # inlines it to a single evaluation), and the per-window slice is
    # bound to a LAMBDA VARIABLE — lambda vars are bound values, so the
    # min / reverse / position reads inside the pick are array reads,
    # never recomputation.
    # token-count gate, NOT a trim-length gate: trim strips only
    # spaces, so a tab/newline-only doc would reach the whole-text-gram
    # branch with an empty token array and emit a bogus ''-hash
    # fingerprint (and NULL-crash the DuckDB twin) — the WS_CHARS
    # hazard this file documents.  Grams build from k O(1) element_at
    # lookups per position (the _word_shingles perf note: slice()+
    # array_join copies a sub-array per position, measured 5x slower).
    wcol = F.col("wds")
    grams = (docs
             .select("doc_id",
                     F.coalesce(word_array(text_col), F.array())
                     .alias("wds"))
             .where(F.size("wds") > 0)
             .select("doc_id", F.when(
                 F.size("wds") < k,
                 F.array(F.array_join("wds", " "))).otherwise(
                 F.transform(
                     F.sequence(F.lit(1), F.size("wds") - (k - 1)),
                     lambda i: F.concat_ws(
                         " ", *[F.element_at(wcol, i + j)
                                for j in range(k)])))
                 .alias("g")))
    hashed = grams.select(
        "doc_id", F.transform("g", lambda g: _h28(g)).alias("h"))
    wins = hashed.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1),
                       F.greatest(F.lit(1), F.size("h") - (w - 1))),
            lambda j: F.slice("h", j, w)).alias("ws"))
    # per window (0-based index i): m = min, rightmost pos of m via the
    # reversed slice's first occurrence — argmin with no reduce
    picks = F.transform(
        "ws",
        lambda ws, i: F.struct(
            (i + 1 + F.size(ws)
             - F.array_position(F.reverse(ws), F.array_min(ws)))
            .alias("pos"),
            F.array_min(ws).alias("fp")))
    return (wins
            .select("doc_id",
                    F.explode(F.array_distinct(picks)).alias("p"))
            .select("doc_id", F.col("p.pos").alias("pos"),
                    F.col("p.fp").alias("fp")))


def winnow_dup_candidates(docs: DataFrame, text_col: str = "text",
                          k: int = 3, w: int = 4,
                          min_shared: int = 2,
                          max_df: int = 50) -> DataFrame:
    """Cross-document near-dup candidates by shared winnowing
    fingerprints: pairs (a, b) sharing >= ``min_shared`` distinct
    fingerprint hashes.  The candidate join is an equi-join on the
    fingerprint value (the LSH-candidates shape — never all-pairs);
    fingerprints shared by more than ``max_df`` docs are corpus
    furniture (boilerplate phrases) and are dropped BEFORE the
    self-join, which is what bounds the per-key fanout the way banding
    bounds it for minhash."""
    fps = (winnow_fingerprints(docs, text_col, k, w)
           .select("doc_id", "fp").distinct())
    df_cap = (fps.groupBy("fp")
              .agg(F.count("*").alias("nd"))
              .where((F.col("nd") >= 2) & (F.col("nd") <= max_df)))
    eligible = fps.join(df_cap.select("fp"), "fp")
    a = eligible.select(F.col("doc_id").alias("a"), "fp")
    b = eligible.select(F.col("doc_id").alias("b"), "fp")
    # no presentation orderBy: the registry compare sorts rows itself,
    # and a trailing sort would survive the optimizer into consumers'
    # plans (curate's clustering re-shuffles by vertex id immediately —
    # a full extra exchange+sort of the pair table for nothing)
    return (a.join(b, "fp")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("n_shared"))
            .where(F.col("n_shared") >= min_shared))

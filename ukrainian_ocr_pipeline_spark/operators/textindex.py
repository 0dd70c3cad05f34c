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

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import word_array


def inverted_index(docs: DataFrame, text_col: str = "text",
                   top_postings: int = 20) -> DataFrame:
    """(term, df, tf_total, top_postings, postings_hash): per distinct
    term, its document frequency, total term frequency, the first
    `top_postings` entries of the doc_id-ordered posting list rendered
    as "doc:tf,...", and the md5 of the COMPLETE rendered posting list
    (the bounded witness for the unbounded payload)."""
    tf = postings_table(docs, text_col)
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


def _norm_query_terms(query_terms):
    return sorted({t.lower() for t in query_terms})


def _bm25_rank(tf: DataFrame, dfreq: DataFrame, stats: DataFrame,
               k: int, k1: float, b: float) -> DataFrame:
    """THE BM25 scoring tail — the one expression both entry points
    (stateless bm25_topk, join-only bm25_topk_from_index) share, so
    their row-identical guarantee holds by construction.  `tf` carries
    (doc_id, dl, term, tf); `dfreq` (term, df); `stats` one row with
    (n_docs, sum_dl DOUBLE).  Contributions micro-fixed to BIGINT
    before the per-doc sum; cut via TakeOrderedAndProject."""
    avgdl = F.col("sum_dl") / F.col("n_docs")
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    sat = (F.col("tf") * (k1 + 1.0)
           / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)))
    return (tf.join(F.broadcast(dfreq), "term")
            .crossJoin(F.broadcast(stats))
            .withColumn("contrib_u", F.floor(idf * sat * 1e6).cast("long"))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_terms_hit"),
                 F.sum("contrib_u").alias("bm25_micro"))
            .orderBy(F.desc("bm25_micro"), "doc_id")
            .limit(k))


def bm25_topk(docs: DataFrame, query_terms, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Okapi BM25 ranked retrieval: the top-`k` documents for a small
    bag-of-terms query, scored with the Lucene-smoothed idf
    ``ln((N - df + 0.5)/(df + 0.5) + 1)`` and the standard
    ``tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` saturation.  The
    retrieval staple one step past tf-idf (q_doc_tfidf_top_terms) —
    what a corpus platform runs to spot-check its inverted index.

    Scale shape (10^12 docs): one narrow projection computes each doc's
    length AND its query-term hits (an array_filter HOF on a literal
    set), so docs with no hit are dropped before the explode and the
    only rows that ever shuffle are query matches — shuffled volume is
    proportional to the query's posting lists, not the corpus; dl rides
    the (doc, term) rows as a grouping key (functionally dependent on
    doc_id), so there is NO corpus-sized doc-length join; df and the
    corpus stats (N, sum dl) are one-row broadcasts; the final cut is a
    TakeOrderedAndProject, never a global sort.  Honest cost note: the
    corpus-stats aggregate and the tf branch are two separate subtrees
    over that projection with no exchange reuse, so this STATELESS
    spot-check tokenizes the corpus twice — the scale query path is
    :func:`bm25_topk_from_index` over the committed tables, which
    tokenizes nothing.

    Determinism: every per-row contribution is a pure double function
    of (tf, dl, df, N, sum_dl) — identical rationals in both engines —
    fixed to MICRO precision as BIGINT before the per-doc sum, so the
    accumulation is exact integer arithmetic, immune to FP addition
    order across partitionings and engines (the dsir/classifier idiom).
    Output: (doc_id, n_terms_hit, bm25_micro), ordered desc/asc.
    """
    qt = _norm_query_terms(query_terms)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(word_array(text_col), F.array()).alias("__ws")) \
        .select("doc_id", F.size("__ws").alias("dl"),
                F.filter("__ws", lambda w: w.isin(qt)).alias("__hits"))
    corpus = base.agg(F.count("*").alias("n_docs"),
                      F.sum("dl").cast("double").alias("sum_dl"))
    tf = (base.where(F.size("__hits") > 0)
          .select("doc_id", "dl", F.explode("__hits").alias("term"))
          .groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    return _bm25_rank(tf, dfreq, corpus, k, k1, b)


def bm25_sql(table: str, query_terms, k: int = 10,
             k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB twin of :func:`bm25_topk` — arithmetic written in the
    same textual order so every IEEE double matches bit-for-bit before
    the micro fixing.  Two traps this encoding guards:

    * bare float literals (``1.2``, ``0.5``) type as DECIMAL in DuckDB
      and the surrounding arithmetic runs EXACT decimal, diverging from
      Spark's double chain by ~1 ulp — every constant is cast to
      DOUBLE, and the plan-time Python folds Spark performs
      (``k1 + 1.0``, ``1.0 - b``) are pre-folded here the same way;
    * an empty term set would render ``w IN ()`` (a DuckDB parse
      error) where the Spark twin returns 0 rows — emit ``FALSE``.
    """
    from .dedup import WORD_ARRAY_SQL
    qt = _norm_query_terms(query_terms)
    terms = ", ".join("'{}'".format(t.replace("'", "''")) for t in qt)
    in_clause = f"w IN ({terms})" if qt else "FALSE"
    half = "CAST(0.5 AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    k1d = f"CAST({k1!r} AS DOUBLE)"
    k1p1 = f"CAST({k1 + 1.0!r} AS DOUBLE)"
    omb = f"CAST({1.0 - b!r} AS DOUBLE)"
    bd = f"CAST({b!r} AS DOUBLE)"
    return f"""
WITH ws AS (
  SELECT doc_id, {WORD_ARRAY_SQL.format(col="text")} AS ws
  FROM {table}),
dl AS (SELECT doc_id, COALESCE(len(ws), 0) AS dl FROM ws),
corpus AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) AS sum_dl FROM dl),
tf AS (
  SELECT doc_id, w AS term, COUNT(*) AS tf
  FROM ws, unnest(ws) AS t(w)
  WHERE {in_clause}
  GROUP BY doc_id, w),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
contrib AS (
  SELECT tf.doc_id,
         CAST(FLOOR(
           ln((corpus.n_docs - dfreq.df + {half}) / (dfreq.df + {half})
              + {one})
           * (tf.tf * {k1p1}
              / (tf.tf + {k1d} * ({omb}
                                  + {bd} * dl.dl
                                    / (corpus.sum_dl / corpus.n_docs))))
           * 1e6) AS BIGINT) AS contrib_u
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN corpus)
SELECT doc_id, COUNT(*) AS n_terms_hit,
       CAST(SUM(contrib_u) AS BIGINT) AS bm25_micro
FROM contrib
GROUP BY doc_id
ORDER BY bm25_micro DESC, doc_id
LIMIT {k}
"""


def postings_table(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(term, doc_id, tf) — the full inverted-index postings as a TABLE
    (the write-once artifact jobs/textindex.py commits; the bounded
    `inverted_index` view hash-witnesses the same content).  One
    explode + one partial-agg shuffle on (term, doc_id)."""
    return (docs.select(F.col(id_col).alias("doc_id"), F.explode(
        F.coalesce(word_array(text_col), F.array())).alias("term"))
        .groupBy("term", "doc_id").agg(F.count("*").alias("tf")))


def doc_length_table(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, dl, content_fp) — per-doc token counts, INCLUDING
    zero-token docs (corpus stats must count every document).
    content_fp is xxhash64 over the RAW text: the resume guard's corpus
    fingerprint must see content, not just shape — two corpora with
    identical (doc_id, dl) pairs but different words (a 1:1 word
    substitution) would otherwise pass the corpus-differs check and
    silently serve stale postings."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.coalesce(word_array(text_col), F.array())).alias("dl"),
        F.xxhash64(id_col, text_col).alias("content_fp"))


def term_stats_table(postings: DataFrame) -> DataFrame:
    """(term, df, tf_total) from a committed postings table — one
    partial-agg shuffle on term."""
    return (postings.groupBy("term")
            .agg(F.count("*").alias("df"),
                 F.sum("tf").alias("tf_total")))


def bm25_topk_from_index(postings: DataFrame, doclens: DataFrame,
                         terms: DataFrame, stats: DataFrame,
                         query_terms, k: int = 10,
                         k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Join-only BM25 over the committed text-index tables
    (jobs/textindex.py) — identical output to the stateless
    :func:`bm25_topk`, but the corpus is never re-tokenized: the
    query-term IN filter lands on the postings PARQUET SCAN (real
    predicate pushdown — the reason the index exists), df comes from
    the committed term table, and (n_docs, sum_dl) from the one-row
    stats table.  The 100 TB query path: cost ~ the query's posting
    lists, zero corpus scan."""
    qt = _norm_query_terms(query_terms)
    tf = (postings.where(F.col("term").isin(qt))
          .join(doclens.select("doc_id", "dl"), "doc_id"))
    dfreq = terms.where(F.col("term").isin(qt)).select("term", "df")
    return _bm25_rank(tf, dfreq,
                      stats.select("n_docs", "sum_dl"), k, k1, b)


def corpus_stats_table(doclens: DataFrame) -> DataFrame:
    """One-row (n_docs, sum_dl, corpus_fp) over the doc-length table —
    sum_dl cast to double HERE so the committed value feeds
    bm25_topk_from_index with bit-identical arithmetic to the stateless
    bm25_topk.  corpus_fp is an order-insensitive fingerprint over the
    (doc_id, dl, content_fp) triples: aggregate totals alone cannot
    distinguish two corpora with the same size but reshuffled doc_ids,
    and shape alone (doc_id, dl) cannot distinguish a 1:1 word
    substitution — content_fp (doc_length_table's raw-text hash) closes
    that.  It only ever compares Spark to Spark, so engine-native
    xxhash64 is fine here; XOR-folded because the triples are unique
    and a 64-bit SUM would overflow under ANSI."""
    return doclens.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").cast("double").alias("sum_dl"),
        F.bit_xor(F.xxhash64("doc_id", "dl", "content_fp"))
        .alias("corpus_fp"))


def _hash_query_vec(query_terms, dim: int = 16):
    """Feature-hash the query's own terms with EXACTLY the md5 kernel
    hashed_text_embeddings applies to documents (CPython twin of
    dedup._h32, the _plane_component folding precedent): the query
    vector is a driver-side constant, so its 2 md5 calls per term run
    once, not per row.  Returns (vec list[int], squared-norm int)."""
    import hashlib

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    vec = [0] * dim
    for t in _norm_query_terms(query_terms):
        sign = -1 if h32(f"s:{t}") % 2 == 0 else 1
        vec[h32(f"b:{t}") % dim] += sign
    return vec, sum(v * v for v in vec)


def hybrid_search_rrf(docs: DataFrame, query_terms, k: int = 10,
                      k_each: int = 20, rrf_k: int = 60, dim: int = 16,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al.
    2009): BM25's lexical top-``k_each`` fused with the cosine
    top-``k_each`` over the feature-hashing embeddings of the SAME
    query text — the standard two-channel retrieval shape, entirely
    in-engine with no model.  Fusion score is
    sum over channels of 1/(rrf_k + rank), docs missing from a channel
    contribute 0; ties break on doc_id.

    Determinism: BM25 ranks order by the exact micro-fixed BIGINT
    score; cosine ranks order by round-6 cosines whose dot/norms are
    integer sums; the two reciprocal terms are the same two doubles in
    either engine, and their sum is order-free.  Output
    (doc_id, rrf_r, lex_rank, sem_rank) — ranks NULL for the channel
    that did not retrieve the doc.

    Scale shape: both channels end in TakeOrdered top-``k_each``
    cuts, so the fusion join touches at most 2*k_each rows; the global
    rank windows run over those bounded lists only, never the corpus.
    """
    from .similarity import hashed_text_embeddings

    qvec, qn = _hash_query_vec(query_terms, dim)
    if qn == 0:
        raise ValueError("query terms hash to the zero vector — no "
                         "semantic signal to rank by")
    lex = (bm25_topk(docs, query_terms, k=k_each,
                     text_col=text_col, id_col=id_col)
           .select("doc_id", "bm25_micro"))
    wl = Window.orderBy(F.desc("bm25_micro"), F.asc("doc_id"))
    lex_ranked = lex.select(
        "doc_id", F.row_number().over(wl).alias("lex_rank"))

    emb = hashed_text_embeddings(docs, text_col=text_col, id_col=id_col,
                                 dim=dim)
    qlit = F.array(*[F.lit(v).cast("long") for v in qvec])
    scored = (emb
              .select(F.col(id_col).alias("doc_id"),
                      F.aggregate(
                          F.zip_with("vec", qlit, lambda x, y: x * y),
                          F.lit(0).cast("long"),
                          lambda a, x: a + x).alias("dot"),
                      F.aggregate(
                          "vec", F.lit(0).cast("long"),
                          lambda a, x: a + x * x).alias("nn"))
              .where(F.col("nn") > 0)
              .select("doc_id",
                      F.round(F.try_divide(
                          F.col("dot").cast("double"),
                          F.sqrt(F.lit(float(qn)) * F.col("nn"))), 6)
                      .alias("cos_r")))
    # Cut to the top-k_each FIRST (orderBy+limit compiles to a
    # TakeOrderedAndProject — per-partition heaps, no global sort), then
    # rank the bounded list; the rank window runs over <= k_each rows.
    # Selection order (cos_r DESC, doc_id ASC) is identical to the rank
    # order, so the assigned ranks match the rank-then-filter form the
    # DuckDB twin uses.
    sem_top = scored.orderBy(F.desc("cos_r"), F.asc("doc_id")).limit(k_each)
    ws = Window.orderBy(F.desc("cos_r"), F.asc("doc_id"))
    sem_ranked = sem_top.select(
        "doc_id", F.row_number().over(ws).alias("sem_rank"))

    fused = lex_ranked.join(sem_ranked, "doc_id", "full")
    rrf = (F.coalesce(F.lit(1.0) / (rrf_k + F.col("lex_rank")),
                      F.lit(0.0))
           + F.coalesce(F.lit(1.0) / (rrf_k + F.col("sem_rank")),
                        F.lit(0.0)))
    return (fused
            .select("doc_id", F.round(rrf, 6).alias("rrf_r"),
                    "lex_rank", "sem_rank")
            .orderBy(F.desc("rrf_r"), F.asc("doc_id"))
            .limit(k))


def hybrid_rrf_sql(table: str, hash_emb_sql: str, query_terms,
                   k: int = 10, k_each: int = 20,
                   rrf_k: int = 60) -> str:
    """DuckDB twin of :func:`hybrid_search_rrf`: BM25 CTE from
    bm25_sql, embedding CTE passed in (the registry's
    SQL_HASH_EMBEDDINGS), query vector rendered as a VALUES constant
    from the same driver-side fold.

    No ``dim`` knob here ON PURPOSE: the passed-in embedding CTE
    hardcodes 16 buckets (``% 16`` / generate_series(0,15)), so a
    divergent query-vector dim would silently drop query mass at the
    bucket join — the renderer pins 16 to stay self-consistent with
    the one CTE it is documented to take."""
    qvec, qn = _hash_query_vec(query_terms, 16)
    if qn == 0:
        raise ValueError("query terms hash to the zero vector — no "
                         "semantic signal to rank by")
    qrows = ", ".join(f"({d}, {v})" for d, v in enumerate(qvec))
    return f"""
WITH lex_full AS ({bm25_sql(table, query_terms, k=k_each)}),
lex AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY bm25_micro DESC, doc_id)
              AS INTEGER) AS lex_rank
  FROM lex_full),
emb AS ({hash_emb_sql}),
q(d, v) AS (VALUES {qrows}),
dots AS (
  SELECT e.doc_id, SUM(e.v * q.v) AS dot
  FROM emb e JOIN q ON e.d = q.d
  GROUP BY e.doc_id),
norms AS (SELECT doc_id, SUM(v * v) AS nn FROM emb GROUP BY doc_id),
sem_scored AS (
  SELECT d.doc_id,
         round(CAST(d.dot AS DOUBLE)
               / sqrt(CAST({qn} AS DOUBLE) * n.nn), 6) AS cos_r
  FROM dots d JOIN norms n USING (doc_id)
  WHERE n.nn > 0),
sem_all AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY cos_r DESC, doc_id)
              AS INTEGER) AS sem_rank
  FROM sem_scored),
sem AS (SELECT * FROM sem_all WHERE sem_rank <= {k_each}),
fused AS (
  SELECT coalesce(l.doc_id, s.doc_id) AS doc_id, l.lex_rank, s.sem_rank
  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id)
SELECT doc_id,
       round(coalesce(CAST(1.0 AS DOUBLE) / ({rrf_k} + lex_rank),
                      CAST(0.0 AS DOUBLE))
             + coalesce(CAST(1.0 AS DOUBLE) / ({rrf_k} + sem_rank),
                        CAST(0.0 AS DOUBLE)), 6) AS rrf_r,
       lex_rank, sem_rank
FROM fused
ORDER BY rrf_r DESC, doc_id
LIMIT {k}
"""

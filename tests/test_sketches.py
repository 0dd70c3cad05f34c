"""Unit tests for the sketch operators (operators/sketches.py) and
context-window chunking (operators/packing.chunk_windows): algorithmic
invariants a DuckDB twin cannot express — HLL error bounds, CM
one-sided error, chunk coverage/overlap arithmetic."""

import math

import pytest
from pyspark.sql import Row, functions as F

from ukrainian_ocr_pipeline_spark.operators import packing, sketches


def test_hll_estimate_within_error_bound(spark):
    # 2000 distinct keys in one group: the m=256 sketch's standard
    # error is 1.04/sqrt(256) ~ 6.5%; assert within 4 sigma (26%)
    df = spark.range(2000).select(
        F.col("id").alias("k"), F.lit("g").alias("grp"))
    row = sketches.hll_distinct(df, "k", "grp").collect()[0]
    assert row["n_exact"] == 2000
    assert abs(row["rel_err_r"]) < 0.26
    assert row["hll_estimate_r"] == pytest.approx(
        2000 * (1 + row["rel_err_r"]), rel=1e-3)


def test_hll_small_range_linear_counting(spark):
    # 10 distinct keys << m: the small-range correction must kick in
    # and linear counting is near-exact when almost all registers are 0
    df = spark.range(10).select(F.col("id").alias("k"),
                                F.lit("g").alias("grp"))
    row = sketches.hll_distinct(df, "k", "grp").collect()[0]
    # with V = 256 - n_present and <= 10 registers occupied,
    # m*ln(m/V) is within 1 of the truth unless register collisions eat
    # keys — either way the estimate stays within 20% at n=10
    assert abs(row["hll_estimate_r"] - 10) <= 2


def test_hll_is_duplicate_insensitive(spark):
    # the sketch sees only distinct hash values: feeding each key 50x
    # must produce the IDENTICAL estimate (max() over equal rhos)
    one = spark.range(500).select(F.col("id").alias("k"),
                                  F.lit("g").alias("grp"))
    dup = one.crossJoin(spark.range(50)).select("k", "grp")
    e1 = sketches.hll_distinct(one, "k", "grp").collect()[0]
    e2 = sketches.hll_distinct(dup, "k", "grp").collect()[0]
    assert e1["hll_estimate_r"] == e2["hll_estimate_r"]
    assert e1["n_exact"] == e2["n_exact"] == 500


def test_hll_partitioning_invariant(spark):
    df = spark.range(1000).select(F.col("id").alias("k"),
                                  (F.col("id") % 3).alias("grp"))
    a = {r["grp"]: r["hll_estimate_r"]
         for r in sketches.hll_distinct(df, "k", "grp").collect()}
    b = {r["grp"]: r["hll_estimate_r"]
         for r in sketches.hll_distinct(df.repartition(17), "k", "grp").collect()}
    assert a == b and len(a) == 3


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def test_cm_never_undercounts(spark):
    docs = _docs(spark, ["alpha beta beta gamma"] * 7 + ["delta alpha"] * 3)
    rows = sketches.cm_heavy_hitters(docs, top_k=10).collect()
    exact = {"alpha": 10, "beta": 14, "gamma": 7, "delta": 3}
    got = {r["word"]: r for r in rows}
    assert set(got) == set(exact)
    for w, r in got.items():
        assert r["exact_count"] == exact[w]
        assert r["cm_estimate"] >= r["exact_count"]  # one-sided error
        assert r["overcount"] == r["cm_estimate"] - r["exact_count"]


def test_cm_top_k_order_and_cut(spark):
    # 30 distinct words with distinct counts; sketch collisions can
    # inflate estimates but with 30 words in 4x256 cells collisions are
    # absent, so the top-10 must be the exact top-10 in exact order
    texts = [f"w{i:02d} " * (i + 1) for i in range(30)]
    rows = sketches.cm_heavy_hitters(_docs(spark, texts), top_k=10).collect()
    assert [r["word"] for r in rows] == [f"w{29 - i:02d}" for i in range(10)]
    assert all(r["overcount"] == 0 for r in rows)


def test_chunk_windows_coverage_and_overlap(spark):
    # 150 tokens, chunk 64 / stride 48 -> starts 1, 49, 97: the window
    # at 97 reaches the doc end, so NO trailing contained chunk (a
    # start at 145 would emit tokens 145-150, a strict subset of 97-150)
    docs = _docs(spark, [" ".join(f"t{i}" for i in range(150))])
    rows = sorted(packing.chunk_windows(docs, chunk_len=64, stride=48)
                  .collect(), key=lambda r: r["chunk_id"])
    assert [r["start_token"] for r in rows] == [1, 49, 97]
    assert [r["chunk_id"] for r in rows] == [0, 1, 2]
    assert [r["n_tokens"] for r in rows] == [64, 64, 54]
    # every token covered: stride < chunk_len and last window hits n
    covered = set()
    for r in rows:
        covered |= set(range(r["start_token"],
                             r["start_token"] + r["n_tokens"]))
    assert covered == set(range(1, 151))


def test_chunk_windows_no_contained_trailing_window(spark):
    # exact-fit and one-past-fit boundaries: n=64 -> one chunk;
    # n=65 -> two (the second needed for token 65); n=112 -> two
    # (window 49-112 reaches the end); n=113 -> three
    for n, want_starts in [(64, [1]), (65, [1, 49]),
                           (112, [1, 49]), (113, [1, 49, 97])]:
        docs = _docs(spark, [" ".join(f"t{i}" for i in range(n))])
        rows = sorted(packing.chunk_windows(docs, chunk_len=64, stride=48)
                      .collect(), key=lambda r: r["chunk_id"])
        assert [r["start_token"] for r in rows] == want_starts, n
        # full coverage always
        covered = set()
        for r in rows:
            covered |= set(range(r["start_token"],
                                 r["start_token"] + r["n_tokens"]))
        assert covered == set(range(1, n + 1)), n


def test_chunk_windows_short_empty_null(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="only three tokens"),
         Row(doc_id=1, text=""),
         Row(doc_id=2, text=None)])
    rows = packing.chunk_windows(docs, chunk_len=64, stride=48).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    assert len(rows) == 3  # one chunk each — no doc dropped
    assert by_doc[0]["n_tokens"] == 3
    assert by_doc[1]["n_tokens"] == 0 and by_doc[2]["n_tokens"] == 0
    # token-less docs share the md5('') sentinel hash
    assert by_doc[1]["chunk_hash"] == by_doc[2]["chunk_hash"]
    assert by_doc[0]["chunk_hash"] != by_doc[1]["chunk_hash"]


def test_chunk_hash_matches_content(spark):
    import hashlib
    docs = _docs(spark, ["a b c d e"])
    row = packing.chunk_windows(docs, chunk_len=64, stride=48).collect()[0]
    assert row["chunk_hash"] == hashlib.md5(b"a b c d e").hexdigest()


def test_inverted_index_postings_and_hash(spark):
    import hashlib
    from ukrainian_ocr_pipeline_spark.operators import textindex
    docs = _docs(spark, ["b a b", "a c", "b b"])
    rows = {r["term"]: r for r in textindex.inverted_index(docs).collect()}
    assert rows["a"]["df"] == 2 and rows["a"]["tf_total"] == 2
    assert rows["b"]["df"] == 2 and rows["b"]["tf_total"] == 4
    assert rows["b"]["top_postings"] == "0:2,2:2"
    assert rows["c"]["top_postings"] == "1:1"
    for t, full in [("a", "0:1,1:1"), ("b", "0:2,2:2"), ("c", "1:1")]:
        assert rows[t]["postings_hash"] == hashlib.md5(
            full.encode()).hexdigest(), t


def test_inverted_index_top_slice_caps_but_hash_covers_all(spark):
    from ukrainian_ocr_pipeline_spark.operators import textindex
    docs = _docs(spark, ["x"] * 30)
    row = textindex.inverted_index(docs, top_postings=5).collect()[0]
    assert row["df"] == 30
    assert row["top_postings"] == "0:1,1:1,2:1,3:1,4:1"  # bounded slice
    # the hash still witnesses all 30 postings: change any -> different
    import hashlib
    full = ",".join(f"{i}:1" for i in range(30))
    assert row["postings_hash"] == hashlib.md5(full.encode()).hexdigest()


def test_pmi_hand_computed(spark):
    from ukrainian_ocr_pipeline_spark.operators import textstats
    # 6 copies of "a b": pairs (window 2, directional): only (a,b) x6
    # unigrams: a=6, b=6, N_words=12, N_pairs=6
    # PMI = ln((6/6) / ((6/12)*(6/12))) = ln(4)
    docs = _docs(spark, ["a b"] * 6)
    rows = textstats.cooccurrence_pmi(docs, window=2, min_count=5,
                                      top_k=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["w_left"], r["w_right"], r["c_ab"]) == ("a", "b", 6)
    assert r["pmi_r"] == pytest.approx(math.log(4.0), abs=1e-6)


def test_pmi_min_count_gate_and_window(spark):
    from ukrainian_ocr_pipeline_spark.operators import textstats
    # "a b c" x5: window-2 pairs per doc: (a,b),(b,c),(a,c) — all x5;
    # min_count=5 keeps all three; min_count=6 keeps none
    docs = _docs(spark, ["a b c"] * 5)
    got = textstats.cooccurrence_pmi(docs, window=2, min_count=5,
                                     top_k=10).collect()
    assert {(r["w_left"], r["w_right"]) for r in got} == {
        ("a", "b"), ("b", "c"), ("a", "c")}
    assert textstats.cooccurrence_pmi(docs, window=2, min_count=6,
                                      top_k=10).count() == 0
    # window=1 drops the skip pair (a,c)
    got1 = textstats.cooccurrence_pmi(docs, window=1, min_count=5,
                                      top_k=10).collect()
    assert {(r["w_left"], r["w_right"]) for r in got1} == {
        ("a", "b"), ("b", "c")}


def test_pmi_short_and_null_docs_do_not_crash(spark):
    # regression: a doc with < window tokens (or NULL text) used to
    # produce a negative-length slice and abort the job
    from ukrainian_ocr_pipeline_spark.operators import textstats
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="solo"), Row(doc_id=1, text=None),
         Row(doc_id=2, text="")] + [Row(doc_id=3 + i, text="a b")
                                    for i in range(6)])
    rows = textstats.cooccurrence_pmi(docs, window=2, min_count=5,
                                      top_k=10).collect()
    assert [(r["w_left"], r["w_right"], r["c_ab"])
            for r in rows] == [("a", "b", 6)]


def test_hll_null_keys_match_countdistinct_semantics(spark):
    # regression: NULL keys occupied a phantom register, biasing the
    # linear-counting estimate relative to n_exact (which skips NULLs)
    base = spark.range(10).select(F.col("id").alias("k"),
                                  F.lit("g").alias("grp"))
    with_nulls = base.unionByName(
        spark.range(5).select(F.lit(None).cast("long").alias("k"),
                              F.lit("g").alias("grp")))
    a = sketches.hll_distinct(base, "k", "grp").collect()[0]
    b = sketches.hll_distinct(with_nulls, "k", "grp").collect()[0]
    assert a["n_exact"] == b["n_exact"] == 10
    assert a["hll_estimate_r"] == b["hll_estimate_r"]


def test_bloom_one_sided_no_false_negatives(spark):
    # every true member MUST be flagged; FP accounting is exact
    existing = spark.range(50).select(F.col("id").alias("k"))
    incoming = spark.range(100).select(F.col("id").alias("k"))
    row = sketches.bloom_probe(existing, incoming, "k", "k").collect()[0]
    assert row["n_probed"] == 100
    assert row["n_true_members"] == 50
    assert row["n_flagged"] >= 50  # one-sided: no false negatives
    assert row["n_false_positives"] == row["n_flagged"] - 50
    assert row["n_false_positives"] >= 0


def test_bloom_null_keys_excluded_and_empty_seen_set(spark):
    existing = spark.range(10).select(
        F.when(F.col("id") < 5, F.col("id")).alias("k"))  # 5 real + NULLs
    incoming = spark.range(8).select(
        F.when(F.col("id") < 6, F.col("id")).alias("k"))  # 6 real + NULLs
    row = sketches.bloom_probe(existing, incoming, "k", "k").collect()[0]
    assert row["n_probed"] == 6
    assert row["n_true_members"] == 5
    # empty seen set: nothing flagged, nothing true, rate 0
    empty = spark.range(0).select(F.col("id").alias("k"))
    row0 = sketches.bloom_probe(empty, incoming, "k", "k").collect()[0]
    assert (row0["n_flagged"], row0["n_true_members"],
            row0["fp_rate_r"]) == (0, 0, 0.0)


def test_bloom_duplicate_incoming_keys_still_flagged(spark):
    """A key occurring r times must probe as ONE key: without the
    distinct, a true member repeated in the batch produced r*k hit
    rows, failed the n_hit == k test, and dodged the no-false-negative
    guarantee (observed: n_false_positives = -1)."""
    existing = spark.createDataFrame([("a",), ("b",)], ["k"])
    incoming = spark.createDataFrame([("a",), ("a",), ("c",)], ["k"])
    row = sketches.bloom_probe(existing, incoming, "k", "k").collect()[0]
    assert row["n_probed"] == 2
    assert row["n_true_members"] == 1
    assert row["n_flagged"] >= 1      # 'a' MUST be flagged
    assert row["n_false_positives"] >= 0


def test_bm25_hand_computed(spark):
    import math
    from pyspark.sql import Row
    from ukrainian_ocr_pipeline_spark.operators import textindex
    # NULL-text doc must count in N and sum_dl (dl=0) but never score
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="spark spark merge"),
         Row(doc_id=1, text="merge alpha beta"),
         Row(doc_id=2, text="gamma delta"),
         Row(doc_id=3, text=None)])
    rows = {r["doc_id"]: r for r in textindex.bm25_topk(
        docs, ("spark", "merge"), k=10).collect()}
    n, sum_dl = 4, 8.0
    k1, b = 1.2, 0.75

    def contrib(tf, dl, df):
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        sat = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / (sum_dl / n)))
        return math.floor(idf * sat * 1e6)

    assert set(rows) == {0, 1}
    assert rows[0]["n_terms_hit"] == 2
    assert rows[0]["bm25_micro"] == contrib(2, 3, 1) + contrib(1, 3, 2)
    assert rows[1]["n_terms_hit"] == 1
    assert rows[1]["bm25_micro"] == contrib(1, 3, 2)
    assert rows[0]["bm25_micro"] > rows[1]["bm25_micro"]


def test_bm25_k_cut_and_order(spark):
    from ukrainian_ocr_pipeline_spark.operators import textindex
    # 6 docs with strictly decreasing tf of the query term: k=3 keeps
    # the three highest scores in desc order
    docs = _docs(spark, ["q " * tf + "pad" for tf in (6, 5, 4, 3, 2, 1)])
    out = textindex.bm25_topk(docs, ("q",), k=3).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2]
    scores = [r["bm25_micro"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_bm25_sql_escapes_apostrophe_terms(spark):
    """Apostrophe words are legitimate whitespace tokens; the twin must
    quote them safely and agree with the Spark side."""
    import duckdb
    from pyspark.sql import Row
    from ukrainian_ocr_pipeline_spark.operators import textindex
    rows = [(0, "o'brien wrote this"), (1, "nothing here")]
    got = textindex.bm25_topk(
        spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows]),
        ("o'brien",), k=5).collect()
    con = duckdb.connect()
    con.execute("create table t(doc_id bigint, text varchar)")
    con.executemany("insert into t values (?, ?)", rows)
    want = con.execute(textindex.bm25_sql("t", ("o'brien",), k=5)).fetchall()
    assert [tuple(r) for r in got] == want == [(0, 1, want[0][2])]


def test_bigram_domain_logprob_hand_computed(spark):
    import math
    from pyspark.sql import Row
    from ukrainian_ocr_pipeline_spark.operators import textstats
    docs = spark.createDataFrame([
        Row(doc_id=0, text="a b a c", lang="en"),     # the reference
        Row(doc_id=1, text="a b x", lang="fr"),       # partly OOV
        Row(doc_id=2, text="solo", lang="fr"),        # <2 tokens: absent
    ])
    rows = {r["doc_id"]: r for r in textstats.bigram_domain_logprob(
        docs, target_lang="en", lam=0.7).collect()}
    # reference model: U = {a:2, b:1, c:1}, T=4, V=3; B = {(a,b):1,
    # (b,a):1, (a,c):1}
    lam, T, V = 0.7, 4, 3

    def m(b_over_u1, u2):
        p = lam * b_over_u1 + (1.0 - lam) * ((u2 + 1) / (T + V + 1))
        return math.floor(math.log(p) * 1e6)

    assert set(rows) == {0, 1}
    assert rows[1]["n_transitions"] == 2
    assert rows[1]["logprob_micro"] == m(1 / 2, 1) + m(0.0, 0)
    assert rows[0]["n_transitions"] == 3
    assert rows[0]["logprob_micro"] == \
        m(1 / 2, 1) + m(1 / 1, 2) + m(1 / 2, 1)
    # the in-domain doc outscores the partly-OOV one per transition
    assert rows[0]["mean_logprob_r"] > rows[1]["mean_logprob_r"]


def test_badword_filter_whole_token_and_case(spark):
    from pyspark.sql import Row
    from ukrainian_ocr_pipeline_spark.operators import textstats
    docs = spark.createDataFrame([
        Row(doc_id=0, text="a clean document here"),
        Row(doc_id=1, text="contains SPAM twice spam yes"),   # case-fold
        Row(doc_id=2, text="spammy is not spam-free either"), # substrings
        Row(doc_id=3, text=None),                             # no evidence
    ])
    rows = {r["doc_id"]: (r["n_badwords"], r["keep"]) for r in
            textstats.badword_filter(docs, ["spam", "junk"]).collect()}
    assert rows[0] == (0, True)
    assert rows[1] == (2, False)
    # 'spammy' is not a whole token; 'spam-free' is one token != 'spam'
    assert rows[2] == (0, True)
    assert rows[3] == (0, True)


def test_badword_list_validation():
    import pytest
    from ukrainian_ocr_pipeline_spark.operators import textstats
    for bad in ([], ["ok", "two words"], ["ok", ""], ["tab\tted"]):
        with pytest.raises(ValueError):
            textstats._validated_badwords(bad)
        with pytest.raises(ValueError):
            textstats.badword_filter_sql("documents", bad)
    assert textstats._validated_badwords(["B", "a", "b"]) == ["a", "b"]


def test_hist_quantiles_within_bin_width(spark):
    """The sketch estimate must land within one bin width of the exact
    nearest-rank quantile on a skewed distribution."""
    import math
    rows = [(i, "g", float(i * i)) for i in range(1, 401)]  # quadratic skew
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    from ukrainian_ocr_pipeline_spark.operators.sketches import hist_quantiles
    got = {r["q"]: r["est"] for r in
           hist_quantiles(df, "v", "grp", n_bins=64,
                          qs=(0.5, 0.9, 0.99)).collect()}
    lo, hi = 1.0, 400.0 * 400.0
    width = (hi - lo) / 64
    vals = sorted(v for _, _, v in rows)
    for q in (0.5, 0.9, 0.99):
        exact = vals[math.ceil(q * len(vals)) - 1]
        assert abs(got[q] - exact) <= width, (q, got[q], exact)


def test_hist_quantiles_constant_group(spark):
    """All-equal values (width 0) estimate the constant for every q."""
    df = spark.createDataFrame([(i, "g", 7.0) for i in range(10)],
                               "id long, grp string, v double")
    from ukrainian_ocr_pipeline_spark.operators.sketches import hist_quantiles
    rows = hist_quantiles(df, "v", "grp", qs=(0.25, 0.99)).collect()
    assert [r["est"] for r in rows] == [7.0, 7.0]


def test_hist_quantiles_partitioning_invariant(spark):
    """Bin counts are integer partial aggs — the estimate must be
    bit-identical under any input partitioning (the mergeability
    property the sketch exists for)."""
    rows = [(i, f"g{i % 3}", float((i * 37) % 1000)) for i in range(600)]
    df1 = spark.createDataFrame(rows, "id long, grp string, v double")
    from ukrainian_ocr_pipeline_spark.operators.sketches import hist_quantiles
    a = hist_quantiles(df1.coalesce(1), "v", "grp").collect()
    b = hist_quantiles(df1.repartition(16, "id"), "v", "grp").collect()
    assert [(r["grp"], r["q"], r["est"]) for r in a] \
        == [(r["grp"], r["q"], r["est"]) for r in b]


def test_hist_quantiles_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1, "g", 5.0), (2, "g", None), (3, "g", 15.0)],
        "id long, grp string, v double")
    from ukrainian_ocr_pipeline_spark.operators.sketches import hist_quantiles
    rows = hist_quantiles(df, "v", "grp", n_bins=4, qs=(0.5,)).collect()
    # 2 non-null values; rank ceil(0.5*2)=1 -> first value's bin
    assert len(rows) == 1 and 5.0 <= rows[0]["est"] <= 10.0


def test_hist_quantiles_rejects_bad_qs(spark):
    import pytest
    from ukrainian_ocr_pipeline_spark.operators import sketches
    df = spark.createDataFrame([(1, "g", 1.0)], "id long, grp string, v double")
    for bad in ((0.0, 0.5), (0.5, 1.5), (-0.1,), ()):
        with pytest.raises(ValueError):
            sketches.hist_quantiles(df, "v", "grp", qs=bad)
        with pytest.raises(ValueError):
            sketches.hist_quantiles_sql("t", "v", "g", qs=bad)

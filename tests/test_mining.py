"""Behavioral invariants for the cross-lingual mining and bigram-LM
additions.  (Value-exactness vs DuckDB is covered by the oracle
mirror; these pin the SEMANTIC guarantees — mutuality, margin
normalization, transition-awareness — that a hash match alone would
not explain.)"""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def mined(spark):
    from ukrainian_ocr_pipeline_spark.operators import similarity
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    return (similarity.bitext_margin_pairs(emb, margin_threshold=1.0)
            .toPandas())


def test_bitext_pairs_are_mutual_best(mined):
    """Each side of a mined pair appears exactly once: mutual-best is a
    partial matching, never a hub fanning out to many partners."""
    assert len(mined) > 0
    assert mined["a_id"].is_unique and mined["b_id"].is_unique


def test_bitext_margin_lower_bound_and_threshold(mined, spark):
    """A mutual-best pair's cosine is the max on both sides, so the
    margin (cos over the mean of both sides' top-k) is >= 1 by
    construction; a higher threshold strictly filters."""
    from ukrainian_ocr_pipeline_spark.operators import similarity
    assert (mined["margin_r"] >= 1.0).all()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    strict = (similarity.bitext_margin_pairs(emb, margin_threshold=1.2)
              .toPandas())
    want = mined[mined["margin_r"] >= 1.2]
    got = set(map(tuple, strict[["a_id", "b_id"]].values))
    assert got == set(map(tuple, want[["a_id", "b_id"]].values))
    assert 0 < len(strict) < len(mined)


def test_bigram_lm_penalizes_word_salad(spark):
    """The discriminative power the unigram gate lacks: a document with
    the SAME unigram distribution but scrambled transitions must score
    strictly lower than the natural-order original."""
    from ukrainian_ocr_pipeline_spark.operators import textstats
    sent = "the cat sat on the mat and the dog sat on the rug"
    natural = " ".join([sent] * 8)
    words = natural.split()
    # deterministic derangement of transitions: interleave halves
    half = len(words) // 2
    salad = " ".join(w for p in zip(words[:half], words[half:]) for w in p)
    docs = spark.createDataFrame(
        [(0, natural), (1, salad)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in textstats.bigram_logprob(docs).collect()}
    # identical token multiset -> identical unigram scores; transitions
    # differ -> bigram scores must separate, natural on top
    uni = {r["doc_id"]: r["avg_logprob_r"]
           for r in textstats.unigram_logprob(docs).collect()}
    assert uni[0] == uni[1]
    assert out[0]["avg_logprob_r"] > out[1]["avg_logprob_r"]
    assert out[0]["n_bigrams"] == len(words) - 1


def test_bigram_lm_short_docs_absent(spark):
    """Docs with < 2 tokens have no transitions: absent from the output
    rather than scored 0/NULL."""
    from ukrainian_ocr_pipeline_spark.operators import textstats
    docs = spark.createDataFrame(
        [(0, "one"), (1, ""), (2, None), (3, "two words")],
        "doc_id long, text string")
    got = {r["doc_id"] for r in textstats.bigram_logprob(docs).collect()}
    assert got == {3}


def test_source_concentration_known_values(spark):
    """Exact Gini/HHI on a hand-computable distribution: counts
    (1, 1, 2, 4) -> HHI = 22/64, Gini via the sorted-rank identity
    = 2*(1*1+2*1+3*2+4*4)/(4*8) - 5/4 = 50/32 - 40/32 = 0.3125."""
    from ukrainian_ocr_pipeline_spark.operators import textstats
    rows = [(i, "t", "en", src) for i, src in enumerate(
        ["a", "b", "c", "c", "d", "d", "d", "d"])]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    got = textstats.source_concentration(docs).collect()[0]
    assert got["n_sources"] == 4 and got["n_docs"] == 8
    assert got["hhi_r"] == round(22 / 64, 6)
    assert got["gini_r"] == 0.3125
    assert got["top_share_r"] == 0.5


def test_length_drift_psi_self_is_zero_and_orders_drift(spark):
    """The reference language's own PSI row is exactly 0 (calibration);
    a same-shape language drifts less than a shifted one."""
    from ukrainian_ocr_pipeline_spark.operators import textstats
    mk = lambda n: " ".join(["w"] * n)
    rows = ([(i, mk(4), "en", "s") for i in range(20)]
            + [(100 + i, mk(4), "fr", "s") for i in range(18)]
            + [(200 + i, mk(64), "fr", "s") for i in range(2)]
            + [(300 + i, mk(64), "de", "s") for i in range(20)])
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    got = {r["lang"]: r["psi_r"]
           for r in textstats.length_drift_psi(docs).collect()}
    assert got["en"] == 0.0
    assert 0 < got["fr"] < got["de"]


class TestWinnowing:
    """Winnowing fingerprints (Schleimer et al. 2003): the coverage
    guarantee, the rightmost-tie rule, and density."""

    def test_shared_run_guarantee(self, spark):
        """Any shared run of >= w+k-1 (= 6) words must share at least
        one fingerprint — the paper's correctness property, exercised
        with the shared passage at different positions in each doc."""
        from ukrainian_ocr_pipeline_spark.operators.dedup import (
            winnow_fingerprints,
        )
        shared = "alpha beta gamma delta epsilon zeta"      # 6 words
        docs = spark.createDataFrame(
            [(1, f"one two three {shared} four five six"),
             (2, f"{shared} totally different tail words here"),
             (3, "no overlap at all with anything present")],
            "doc_id long, text string")
        fps = winnow_fingerprints(docs, k=3, w=4).collect()
        by_doc = {}
        for r in fps:
            by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
        assert by_doc[1] & by_doc[2], "shared 6-word run must collide"
        assert not (by_doc[3] & (by_doc[1] | by_doc[2]))

    def test_rightmost_tie_and_density(self, spark):
        """Repeating the same word makes every gram hash equal: all
        windows pick the SAME minimum, and the rightmost-tie rule makes
        each window pick its own rightmost position — fingerprints are
        (one hash, every window-end position), exactly n_windows picks
        before dedup and n_windows rows after (positions differ)."""
        from ukrainian_ocr_pipeline_spark.operators.dedup import (
            winnow_fingerprints,
        )
        docs = spark.createDataFrame([(1, " ".join(["word"] * 10))],
                                     "doc_id long, text string")
        rows = winnow_fingerprints(docs, k=3, w=4).collect()
        # 8 grams -> 5 windows; rightmost tie -> positions 4..8
        assert sorted(r["pos"] for r in rows) == [4, 5, 6, 7, 8]
        assert len({r["fp"] for r in rows}) == 1

    def test_short_null_and_empty_docs(self, spark):
        from ukrainian_ocr_pipeline_spark.operators.dedup import (
            winnow_fingerprints,
        )
        docs = spark.createDataFrame(
            [(1, "two words"), (2, None), (3, "   ")],
            "doc_id long, text string")
        rows = winnow_fingerprints(docs, k=3, w=4).collect()
        assert [(r["doc_id"], r["pos"]) for r in rows] == [(1, 1)]

    def test_dup_candidates_furniture_cap(self, spark):
        """A fingerprint shared by every doc (boilerplate) must be
        excluded by the df cap, leaving only the genuine pair."""
        from ukrainian_ocr_pipeline_spark.operators.dedup import (
            winnow_dup_candidates,
        )
        boiler = "subscribe to our newsletter for updates today"
        pair = "the unique shared passage appears here twice verbatim"
        docs = spark.createDataFrame(
            [(i, f"{boiler} filler{i} padding{i} more{i}")
             for i in range(1, 7)]
            + [(10, f"{pair} left tail one"), (11, f"{pair} right tail two")],
            "doc_id long, text string")
        got = winnow_dup_candidates(docs, k=3, w=4, min_shared=1,
                                    max_df=3).collect()
        assert [(r["a"], r["b"]) for r in got] == [(10, 11)]


class TestHybridRRF:
    def test_fusion_prefers_two_channel_docs(self, spark):
        """A doc ranked #1 in both channels must outscore a doc ranked
        #1 in only one; missing-channel ranks surface as NULL."""
        from ukrainian_ocr_pipeline_spark.operators.textindex import (
            hybrid_search_rrf,
        )
        docs = spark.createDataFrame(
            [(1, "spark merge vector " * 5),          # both channels
             (2, "spark spark spark merge merge unrelated filler"),
             (3, "totally disjoint content words only")],
            "doc_id long, text string")
        rows = hybrid_search_rrf(docs, ("spark", "merge", "vector"),
                                 k=5).collect()
        by_id = {r["doc_id"]: r for r in rows}
        assert rows[0]["doc_id"] == 1
        assert by_id[1]["rrf_r"] > by_id[2]["rrf_r"]
        assert by_id[1]["lex_rank"] is not None
        assert by_id[1]["sem_rank"] is not None
        # doc 3 shares no query term: lexical NULL; it still has an
        # embedding, so it may carry a (low) semantic rank
        assert by_id[3]["lex_rank"] is None

    def test_zero_signal_query_rejected(self, spark):
        import pytest
        from ukrainian_ocr_pipeline_spark.operators import textindex
        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        # two terms hashing to the same bucket with opposite signs is
        # corpus-dependent; the trivially-zero case is the empty query
        with pytest.raises(ValueError):
            textindex.hybrid_search_rrf(docs, (), k=5)
        with pytest.raises(ValueError):
            textindex.hybrid_rrf_sql("documents", "SELECT 1", ())


def test_winnow_control_char_only_docs_contribute_nothing(spark):
    """Tab/newline-only docs must emit NO fingerprint (the WS_CHARS
    space-vs-\\s hazard): a ''-hash fingerprint would make all such
    docs mutual near-dup candidates and NULL-crash the DuckDB twin."""
    from ukrainian_ocr_pipeline_spark.operators.dedup import (
        winnow_fingerprints,
    )
    docs = spark.createDataFrame(
        [(1, "\t\n"), (2, " \f \r "), (3, "real words in here"),
         # \x0b is NOT whitespace in the RE2-compatible WS_CHARS
         # convention — it is a legitimate 1-char token in BOTH
         # engines, so it keeps its (consistent) fingerprint
         (4, "\x0b")],
        "doc_id long, text string")
    rows = winnow_fingerprints(docs, k=3, w=4).collect()
    assert {r["doc_id"] for r in rows} == {3, 4}

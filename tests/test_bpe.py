"""BPE tokenizer: semantics pins, drift guards, and encoder properties.

The committed merges table (spec/bpe_merges.py) and the expected count
table (plans/expected_metrics.BPE_EXPECTED) are regenerated ONLY by
jobs/make_merges.py / jobs/make_expected.py; these tests retrain and
recount in-memory so any fixture or spec drift fails loudly.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from ukrainian_ocr_pipeline_spark.spec import bpe
from ukrainian_ocr_pipeline_spark.spec.bpe_merges import MERGES


def test_pretokenize_hand_audited_literals():
    """Hand-derived pretokenizations (not produced by the code under
    test): contractions split, spaces attach forward (GPT-2 style),
    symbol runs separate from letter runs."""
    assert bpe.pretokenize("Hello, world!") == ["Hello", ",", " world", "!"]
    assert bpe.pretokenize("it's Kate's") == ["it", "'s", " Kate", "'s"]
    assert bpe.pretokenize("v2.0 beta-3") == ["v", "2", ".", "0", " beta",
                                              "-", "3"]
    assert bpe.pretokenize("Київ — столиця") == ["Київ", " —", " столиця"]
    assert bpe.pretokenize("  a") == [" a"]  # unattached space not emitted
    assert bpe.pretokenize("") == []


def _encode_sequential(pretoken: str, merges: list[tuple]) -> list[str]:
    """Independent differential twin of bpe.encode: replay the merge
    list IN TRAINING ORDER, exhausting each merge before the next — a
    different algorithm (no rank-priority scan).  For a greedily trained
    table the two are provably equivalent, because a pair can only be
    learned after both of its symbols exist (rank(parts) < rank(pair)),
    so a later merge can never create an occurrence of an earlier one."""
    sym = tuple(pretoken)
    for pair in merges:
        while True:
            merged = bpe._merge_word(sym, pair)
            if merged == sym:
                break
            sym = merged
    return list(sym)


def test_encode_matches_independent_sequential_replay():
    """Breaks the oracle circularity for the encoder: spec.bpe.encode
    (rank-priority) must agree with the order-replay implementation
    above on every pretoken of the fixture corpus plus edge strings."""
    from ukrainian_ocr_pipeline_spark.fixtures import gen_pages
    from ukrainian_ocr_pipeline_spark.oracle import run_oracle

    merges = [tuple(p) for p in MERGES]
    ranks = bpe.merge_ranks()
    golden = run_oracle(list(gen_pages(60)))
    words = set()
    for t in golden["extracted"]["extracted_text"]:
        words.update(bpe.pretokenize(t))
    words.update([" the", "aaaa", " ааа", "don't", " don't", "x", ""])
    assert len(words) > 200
    for w in sorted(words):
        assert bpe.encode(w, ranks) == _encode_sequential(w, merges), w


def test_trainer_semantics_tiny_corpus():
    """Hand-checked trainer behavior: most frequent pair merges first;
    ties break to the lexicographically largest pair."""
    # "aaab" x2 -> pairs: (a,a) x4, (a,b) x2
    merges = bpe.train_merges(["aaab aaab"], n_merges=2)
    assert merges[0] == ("a", "a")
    # after merging: ('aa','a','b') x2 -> pairs (aa,a) x2, (a,b) x2 —
    # tie breaks to the LARGEST pair ('aa','a')
    assert merges[1] == ("aa", "a")


def test_encoder_applies_merges_in_rank_order():
    ranks = bpe.merge_ranks([("a", "b"), ("ab", "c"), ("c", "d")])
    assert bpe.encode("abcd", ranks) == ["abc", "d"]
    assert bpe.encode("cdcd", ranks) == ["cd", "cd"]
    assert bpe.encode("xyz", ranks) == ["x", "y", "z"]


def test_overlapping_pair_merges_left_to_right():
    ranks = bpe.merge_ranks([("a", "a")])
    assert bpe.encode("aaa", ranks) == ["aa", "a"]
    assert bpe.encode("aaaa", ranks) == ["aa", "aa"]


def test_committed_merges_match_retraining():
    """Drift guard: retraining on the fixture corpus reproduces the
    committed table exactly."""
    from ukrainian_ocr_pipeline_spark.fixtures import gen_pages
    from ukrainian_ocr_pipeline_spark.oracle import run_oracle

    golden = run_oracle(list(gen_pages(240)))
    retrained = bpe.train_merges(
        golden["extracted"]["extracted_text"].tolist(), n_merges=500)
    assert retrained == [tuple(p) for p in MERGES]


def test_committed_expected_counts_match_recount():
    from ukrainian_ocr_pipeline_spark.fixtures import gen_pages
    from ukrainian_ocr_pipeline_spark.oracle import run_oracle
    from ukrainian_ocr_pipeline_spark.plans.expected_metrics import BPE_EXPECTED

    golden = run_oracle(list(gen_pages(240)))
    ranks = bpe.merge_ranks()
    cache = {}
    got = [(r.url, bpe.count_tokens(r.extracted_text, ranks, cache))
           for r in golden["extracted"].itertuples(index=False)]
    assert got == BPE_EXPECTED


@given(st.text(alphabet=string.printable + "абвгдеєжзиіїйклмнопрстуфхцчшщьюя",
               max_size=300))
@settings(max_examples=200, deadline=None)
def test_encode_partitions_every_pretoken(text):
    """Tokens concatenate back to the pretoken (BPE only merges, never
    drops or rewrites), and counts are consistent with encode()."""
    ranks = bpe.merge_ranks()
    total = 0
    for w in bpe.pretokenize(text):
        toks = bpe.encode(w, ranks)
        assert "".join(toks) == w
        assert all(toks)
        total += len(toks)
    assert bpe.count_tokens(text, ranks) == total


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_count_cache_is_transparent(text):
    ranks = bpe.merge_ranks()
    cache = {}
    a = bpe.count_tokens(text, ranks, cache)
    b = bpe.count_tokens(text, ranks, cache)   # warm
    c = bpe.count_tokens(text, ranks, None)    # uncached
    assert a == b == c


def test_real_merges_compress_fixture_text():
    """The trained table must actually compress: fewer BPE tokens than
    characters, more than whitespace words, on real corpus text."""
    from ukrainian_ocr_pipeline_spark.fixtures import gen_pages
    from ukrainian_ocr_pipeline_spark.oracle import run_oracle

    golden = run_oracle(list(gen_pages(20)))
    ranks = bpe.merge_ranks()
    text = " ".join(golden["extracted"]["extracted_text"].tolist())
    n = bpe.count_tokens(text, ranks)
    n_chars = len(text.replace(" ", ""))
    n_words = len(text.split())
    assert n_words <= n < n_chars


def test_merge_candidates_match_trainer_pair_counts(spark):
    """The distributed pair-mining operator must agree with spec.bpe's
    driver-side trainer arithmetic (round-1 pair counts + the
    max((count, pair)) tie-break) on the same corpus.  Guards the
    vocab-weighted counting and the orderBy tie direction; tolerated
    divergence: none on this corpus (its text exercises no class where
    the Python and Java pretoken regexes differ)."""
    from collections import Counter

    from ukrainian_ocr_pipeline_spark.operators import textstats
    from ukrainian_ocr_pipeline_spark.spec import bpe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = textstats.bpe_merge_candidates(docs, top_k=20).toPandas()

    pairs = Counter()
    for (t,) in docs.select("text").collect():
        for w in bpe.pretokenize(t or ""):
            for a, b in zip(w, w[1:]):
                pairs[a + b] += 1
    want = sorted(pairs.items(), key=lambda kv: (kv[1], kv[0]),
                  reverse=True)[:20]
    assert list(zip(got["pair"], got["weight"])) == want
    # the winning pair is what train_merges would merge in round 1
    best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
    assert (got["pair"][0], got["weight"][0]) == best


def test_distributed_trainer_matches_spec_trainer(spark):
    """bpe_train_merges (distributed rounds over the vocab table) must
    reproduce spec/bpe.py train_merges bit-for-bit — merge order, ties,
    early exhaustion — on both a crafted corpus and real fixture text."""
    from pyspark.sql import Row

    from ukrainian_ocr_pipeline_spark.operators import textstats
    from ukrainian_ocr_pipeline_spark.spec import bpe

    crafted = ["low lower lowest", "new newer newest",
               "low low low", "ab ab ab cd cd", None, ""]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(crafted)])
    got = textstats.bpe_train_merges(docs, n_merges=12)
    want = bpe.train_merges([t for t in crafted if t], n_merges=12)
    assert got == want

    # early exhaustion: a corpus whose vocab runs out of pairs
    tiny = spark.createDataFrame([Row(doc_id=0, text="aa b")])
    got_tiny = textstats.bpe_train_merges(tiny, n_merges=10)
    want_tiny = bpe.train_merges(["aa b"], n_merges=10)
    assert got_tiny == want_tiny
    assert len(got_tiny) < 10  # genuinely exhausted, not truncated

    # real corpus slice (multilingual text incl. Cyrillic/CJK: pins the
    # UTF8-binary vs code-point tie-break equivalence)
    rows = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .limit(40))
    got_fx = textstats.bpe_train_merges(rows, n_merges=8)
    want_fx = bpe.train_merges(
        [r["text"] for r in rows.collect() if r["text"]], n_merges=8)
    assert got_fx == want_fx


def test_distributed_trainer_spec_boundaries_on_numeric_divergence(spark):
    """The trainer must pretokenize with the SPEC regex, not the
    RE2-safe Java approximation: the two disagree on non-decimal
    numerics (x², ½ — Python's letter class absorbs them, \\p{L} does
    not), and the trained table feeds the spec encoder."""
    from pyspark.sql import Row

    from ukrainian_ocr_pipeline_spark.operators import textstats
    from ukrainian_ocr_pipeline_spark.spec import bpe

    texts = ["mc² mc² mc² emc emc", "x² x² y² y²"]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = textstats.bpe_train_merges(docs, n_merges=6)
    assert got == bpe.train_merges(texts, n_merges=6)
    # the divergence is real: the spec pretokenizer keeps 'mc²' whole
    assert bpe.pretokenize("mc²") == ["mc²"]

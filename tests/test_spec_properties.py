"""Property-based tests (hypothesis): the spec's hard invariants hold on
adversarial inputs, not just fixtures. The reference's suite is
example-based only (SURVEY §5) — this layer is deliberately stronger,
because the per-row functions run inside executors where an uncaught
exception fails a whole task."""

from hypothesis import given, settings, strategies as st

from ukrainian_ocr_pipeline_spark.spec import (
    LexiconMatcher, classify_blocks, decode_page, default_lexicon,
    extract_page, render_text, segment_blocks, tag_entities,
)

BYTES = st.binary(max_size=4096)
TEXT = st.text(max_size=2048)
HTMLISH = st.text(
    alphabet=st.sampled_from(list("<>/ab cp&;#\"'=\nДив!-")),
    max_size=1024,
)


@settings(max_examples=200, deadline=None)
@given(BYTES)
def test_decode_never_raises_and_types(data):
    r = decode_page(data)
    assert isinstance(r.text, str)
    assert r.kind in ("html", "pdf", "text", "binary")


@settings(max_examples=200, deadline=None)
@given(HTMLISH)
def test_segment_never_raises_and_invariants(doc):
    blocks, level = segment_blocks(doc)
    assert 0 <= level <= 3
    for i, b in enumerate(blocks):
        assert b.block_id == i
        assert b.start < b.end
        assert b.n_chars == len(b.text) > 0
        assert 0.0 <= b.link_density <= 1.0
        assert b.text == b.text.strip()
        assert "\n" not in b.text  # whitespace normalized


@settings(max_examples=100, deadline=None)
@given(HTMLISH)
def test_render_offsets_index_exactly(doc):
    blocks, _ = segment_blocks(doc)
    classify_blocks(blocks)
    text, offsets = render_text(blocks)
    for bid, s, e in offsets:
        blk = next(b for b in blocks if b.block_id == bid)
        assert text[s:e] == blk.text


@settings(max_examples=100, deadline=None)
@given(TEXT)
def test_ner_offsets_index_exactly(text):
    for span in tag_entities(text):
        assert text[span.start:span.end] == span.text
        assert span.label in ("PERSON", "LOCATION")
        assert span.confidence in (0.8, 0.7)


@settings(max_examples=60, deadline=None)
@given(TEXT)
def test_matcher_never_raises_and_bounds(text):
    m = LexiconMatcher(default_lexicon())
    for hit in m.find_in_text(text):
        assert hit.confidence >= 0.8
        assert len(hit.found_text) >= 3


@settings(max_examples=60, deadline=None)
@given(BYTES)
def test_extract_page_total_function(data):
    r = extract_page("https://x.example/a", data)
    assert r.success or r.error  # never silently empty on failure
    assert isinstance(r.extracted_text, str)
    assert r.blocks_kept <= r.blocks_detected


@settings(max_examples=60, deadline=None)
@given(BYTES)
def test_extract_deterministic(data):
    a = extract_page("u", data)
    b = extract_page("u", data)
    assert a.extracted_text == b.extracted_text
    assert a.fallback_level == b.fallback_level


PDFISH = st.text(
    alphabet=st.sampled_from(list("BT E()[]\\018ajT j\nРк%PDF-")),
    max_size=512,
)


@settings(max_examples=300, deadline=None)
@given(PDFISH)
def test_pdf_extractor_total_function(doc):
    """extract_pdf_text never raises and always returns str — adversarial
    escape sequences, unbalanced brackets, stray BT/ET included."""
    from ukrainian_ocr_pipeline_spark.spec.pdfmini import extract_pdf_text
    out = extract_pdf_text(doc)
    assert isinstance(out, str)
    # determinism
    assert extract_pdf_text(doc) == out


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=256), st.booleans())
def test_pdf_flate_path_total_function(junk, declare_flate):
    """The inflate path never raises on arbitrary stream bytes —
    garbage that isn't valid zlib keeps the raw segment (no text);
    chars above latin-1 in the body hit the encode guard."""
    from ukrainian_ocr_pipeline_spark.spec.pdfmini import extract_pdf_text
    filt = "/Filter /FlateDecode " if declare_flate else ""
    doc = ("<< " + filt + "/Length " + str(len(junk)) + " >>\nstream\n"
           + junk.decode("latin-1") + "\nendstream\nBT (tail) Tj ET")
    out = extract_pdf_text(doc)
    assert isinstance(out, str)
    assert out.endswith("tail")


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_pdf_routed_pages_total_function(data):
    """Pages whose bytes start %PDF- go down the PDF seam end-to-end
    without raising, whatever follows the magic."""
    r = extract_page("u", b"%PDF-" + data)
    assert r.success
    assert isinstance(r.extracted_text, str)


# ---------------------------------------------------------------------------
# round-2 hot-path optimizations must be EXACTLY output-preserving

CYRX = st.text(
    alphabet=st.sampled_from(list(
        "абвгдеТарасШевченкоІЇЄЁіїєёмісто селоx y.z,Q9 \t\n-")),
    max_size=400,
)


@settings(max_examples=300, deadline=None)
@given(CYRX)
def test_region_gated_ner_equals_naive_scan(text):
    """tag_entities' Cyrillic-region gating vs the naive five-pass scan:
    identical spans, offsets, and emission order on adversarial mixes of
    Cyrillic/latin/punctuation (incl. \\b edge cases at region borders)."""
    from ukrainian_ocr_pipeline_spark.spec import ner as N

    naive = []
    for pat in N._PERSON_PATTERNS:
        for m in pat.finditer(text):
            naive.append((m.group(), "PERSON", m.start(), m.end()))
    for pat in N._LOCATION_PATTERNS:
        for m in pat.finditer(text):
            naive.append((m.group(), "LOCATION", m.start(), m.end()))
    naive = [t for t in naive if t[0].lower() not in N.FALSE_POSITIVE_WORDS]

    got = [(s.text, s.label, s.start, s.end) for s in N.tag_entities(text)]
    assert got == naive


from hypothesis import example


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("abcШевченкоШевчеико col")),
               min_size=0, max_size=60))
@example("Шевченко")      # exact match survives
@example("Шевчеико")      # fuzzy OCR-confusion match survives
@example("shevchenko")    # pure-latin word is pruned to the same None
@example("colab")
def test_charset_prune_preserves_best_match(word):
    """The alphabet-disjointness prune must never change _best's answer:
    compare against a matcher whose charsets are widened so the
    disjointness test can never fire (isdisjoint(empty) is True, so an
    EMPTY charset would force the prune, not disable it)."""
    m = LexiconMatcher(default_lexicon())
    pruned = m._best_uncached(word)
    m2 = LexiconMatcher(default_lexicon())
    m2._norm_chars = m2._norm_chars | frozenset(word) | frozenset("ab")
    m2._phon_chars = m2._phon_chars | frozenset(word) | frozenset("ab")
    unpruned = m2._best_uncached(word)
    assert pruned == unpruned
    # and the canonical cases really behave as designed
    if word == "Шевченко":
        assert pruned == ("Шевченко", 1.0)
    if word == "shevchenko":
        assert pruned is None


@given(st.text(
    alphabet=st.characters(codec="utf-8"), max_size=400))
@example("\xa0a\xa0 b\tc")
@example("\x1c x \x1d\x85y")
@example("  ")
@settings(max_examples=400, deadline=None)
def test_norm_ws_equals_regex_form(s):
    """segment._norm_ws (join/split fast path) must be byte-identical to
    the regex form it replaced — CPython's str \\s and str.split() share
    the Py_UNICODE_ISSPACE predicate, and this pins it against any
    future interpreter drift."""
    import re

    from ukrainian_ocr_pipeline_spark.spec import segment

    assert segment._norm_ws(s) == re.sub(r"\s+", " ", s).strip()


@given(st.lists(
    st.lists(st.sampled_from(["boil", "uniq", "", "  x  "]), max_size=6),
    min_size=1, max_size=8))
@settings(max_examples=30, deadline=None)
def test_line_dedup_invariants(spark, docs_lines):
    """Structural invariants of cross-doc line dedup on arbitrary small
    corpora: every input doc keeps exactly one output row;
    n_lines == (removed + kept); no kept clean_text contains a line
    that >= 3 distinct docs share; line order is preserved."""
    from pyspark.sql import Row

    from ukrainian_ocr_pipeline_spark.operators import dedup

    rows = [Row(doc_id=i, text="\n".join(ls) if ls else "")
            for i, ls in enumerate(docs_lines)]
    out = {r["doc_id"]: r for r in
           dedup.line_dedup(spark.createDataFrame(rows)).collect()}
    assert set(out) == set(range(len(rows)))
    # oracle: count distinct docs per trimmed non-empty line
    from collections import defaultdict
    docs_per = defaultdict(set)
    for i, ls in enumerate(docs_lines):
        for ln in (ls if ls else [""]):
            if ln.strip():
                docs_per[ln.strip()].add(i)
    boiler = {k for k, v in docs_per.items() if len(v) >= 3}
    for i, ls in enumerate(docs_lines):
        src = ls if ls else [""]
        expect_kept = [ln for ln in src if ln.strip() not in boiler]
        r = out[i]
        assert r["n_lines"] == len(src)
        assert r["n_removed"] == len(src) - len(expect_kept)
        assert r["clean_text"] == "\n".join(expect_kept)


@given(st.lists(st.text(max_size=200), max_size=8))
@settings(max_examples=60, deadline=None)
def test_rolling_fp_polynomial_matches_left_fold(texts):
    """The vectorized polynomial rolling hash (numpy, per-batch) must be
    bit-identical to the Rabin-Karp left fold acc=(acc*31+cp)%M it
    replaced — including empty strings, None slots, and astral code
    points (utf-32 gives code points, exactly what ascii()/DuckDB's
    twin fold uses)."""
    import pandas as pd

    from ukrainian_ocr_pipeline_spark.operators.textstats import (
        _ROLL_MOD,
        _rolling_fp_series,
    )

    s = pd.Series(texts + [None], dtype="object")
    got = list(_rolling_fp_series(s))

    def fold(t):
        acc = 0
        for ch in t:
            acc = (acc * 31 + ord(ch)) % _ROLL_MOD
        return acc

    want = [fold(t) for t in texts] + [None]
    for g, w in zip(got, want):
        assert (g is pd.NA and w is None) or g == w, (got, want)

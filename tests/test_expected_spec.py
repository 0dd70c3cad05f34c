"""Drift guards: the committed expected-value oracles
(plans/expected_spec.py, plans/expected_metrics.py) must equal a fresh
recomputation from the spec — any spec or fixture change that would
silently invalidate the DuckDB twins fails here instead."""

from ukrainian_ocr_pipeline_spark.fixtures import gen_pages
from ukrainian_ocr_pipeline_spark.oracle import run_oracle
from ukrainian_ocr_pipeline_spark.plans.expected_metrics import METRICS_EXPECTED
from ukrainian_ocr_pipeline_spark.plans.expected_spec import (
    MATCH_EXPECTED,
    NER_EXPECTED,
)
from ukrainian_ocr_pipeline_spark.plans.registry import _CYR_SENTENCES
from ukrainian_ocr_pipeline_spark.spec.lexicon import LexiconMatcher, default_lexicon
from ukrainian_ocr_pipeline_spark.spec.ner import tag_entities


def test_ner_expected_matches_spec():
    got = [
        (sid, sp.text, sp.label, sp.start, sp.end)
        for sid, sent in enumerate(_CYR_SENTENCES)
        for sp in tag_entities(sent)
    ]
    assert got == NER_EXPECTED


def test_match_expected_matches_spec():
    matcher = LexiconMatcher(default_lexicon())
    got = [
        (sid, m.found_text, m.matched_term, m.word_idx)
        for sid, sent in enumerate(_CYR_SENTENCES)
        for m in matcher.find_in_text(sent)
    ]
    assert got == MATCH_EXPECTED
    # every confidence must be exactly 1.0 — the oracle SQL does not
    # carry confidence, which is only sound while all matches are exact
    for sid, sent in enumerate(_CYR_SENTENCES):
        for m in matcher.find_in_text(sent):
            assert m.confidence == 1.0


def test_metrics_expected_matches_oracle():
    golden = run_oracle(list(gen_pages(240)))
    fresh = [
        (r.url, bool(r.success), r.kind, int(r.fallback_level),
         int(r.blocks_detected), int(r.blocks_kept),
         int(r.entities), int(r.matches))
        for r in golden["metrics"].itertuples(index=False)
    ]
    assert fresh == METRICS_EXPECTED


def test_sentence_spans_do_not_cross_boundary():
    """The shift-by-length(text)+1 oracle is only valid if no pattern can
    match across the latin-prefix / Cyrillic-sentence boundary: verify a
    latin prefix never changes the sentence-relative spans."""
    for sent in _CYR_SENTENCES:
        base = "lorem ipsum data "
        shifted = [(s.text, s.label, s.start - len(base), s.end - len(base))
                   for s in tag_entities(base + sent)]
        plain = [(s.text, s.label, s.start, s.end) for s in tag_entities(sent)]
        assert shifted == plain


def test_widened_corpus_contains_edge_kinds():
    """The round-2 fixture widening must keep all five new edge-page
    kinds present and behaving per spec in the 500-row golden corpus."""
    import ukrainian_ocr_pipeline_spark.fixtures as fx
    from ukrainian_ocr_pipeline_spark.spec import extract_page

    got = {"utf16": 0, "truncscript": 0, "deepnav": 0, "souphead": 0,
           "pdfvariant": 0}
    for i in range(500):
        row = fx.page_row(i)
        if i % 97 == 0 or i % 89 == 3 or i % 83 == 5 or i % 79 == 7:
            continue
        if row["url"].startswith("https://megahost") and i % 149 == 11:
            continue
        r = extract_page(row["url"], row["html"])
        if i % 101 == 13:
            got["utf16"] += 1
            assert r.kind == "html" and r.charset.startswith("utf-16"), r.charset
            assert r.blocks_kept > 0 and "<" not in r.extracted_text
        elif i % 103 == 17:
            got["truncscript"] += 1
            assert "var state" not in r.extracted_text  # JS never leaks
            assert r.blocks_kept > 0  # the real content before it survives
        elif i % 107 == 19:
            got["deepnav"] += 1
            assert r.success and r.blocks_kept > 0
        elif i % 109 == 23:
            got["souphead"] += 1
            assert r.success and r.fallback_level >= 1  # reached a fallback
            assert r.extracted_text  # content recovered, not clean-empty
        elif i % 113 == 29:
            got["pdfvariant"] += 1
            assert r.kind == "pdf" and r.success
            assert "NET" in r.extracted_text  # TJ array parsed
            assert "par(en) A" in r.extracted_text  # escapes decoded
    assert all(v >= 3 for v in got.values()), got

"""Unit tests per spec stage — modeled on the reference's per-component
unit layer (SURVEY.md §5; e.g. tests/unit/test_segmentation.py asserts
line-dict shape invariants, test_ner.py asserts entity fields/thresholds)."""

import pytest

from ukrainian_ocr_pipeline_spark.spec import (
    FALLBACK_CHUNK, FALLBACK_NONE, FALLBACK_TOLERANT,
    LexiconMatcher, classify_blocks, decode_page, default_lexicon,
    dense_regions, render_text, segment_blocks, tag_entities,
)
from ukrainian_ocr_pipeline_spark.spec.decode import KIND_BINARY, KIND_HTML, KIND_PDF, KIND_TEXT
from ukrainian_ocr_pipeline_spark.spec.lexicon import normalize_text, similarity
from ukrainian_ocr_pipeline_spark.spec.ner import Span, attach_block_ids
from ukrainian_ocr_pipeline_spark.spec.pdfmini import extract_pdf_text
from ukrainian_ocr_pipeline_spark.spec.segment import FALLBACK_PLACEHOLDER


class TestDecode:
    def test_utf8(self):
        r = decode_page("<html><p>héllo</p></html>".encode())
        assert r.text == "<html><p>héllo</p></html>"
        assert r.kind == KIND_HTML and r.charset == "utf-8" and not r.degraded

    def test_meta_charset_cp1251(self):
        raw = '<html><meta charset="windows-1251"><p>Привіт</p></html>'.encode("cp1251")
        r = decode_page(raw)
        assert "Привіт" in r.text and r.charset in ("windows-1251", "cp1251")

    def test_bom(self):
        r = decode_page(b"\xef\xbb\xbf<html><p>x</p></html>")
        assert r.text.startswith("<html") and r.charset == "utf-8-sig"

    def test_pdf_magic(self):
        assert decode_page(b"%PDF-1.4 whatever").kind == KIND_PDF

    def test_binary_garbage(self):
        r = decode_page(bytes(range(32)) * 40)
        assert r.kind == KIND_BINARY

    def test_plain_text(self):
        assert decode_page(b"just some plain words here").kind == KIND_TEXT

    def test_never_raises(self):
        for payload in (None, b"", b"\xff\xfe", b"\x80\x81\x82" * 100):
            decode_page(payload)  # must not raise


class TestSegment:
    def test_basic_blocks(self):
        html = "<html><body><p>one two three</p><p>four five</p></body></html>"
        blocks, lvl = segment_blocks(html)
        assert lvl == FALLBACK_NONE
        # body flush + two p blocks; texts in document order
        texts = [b.text for b in blocks]
        assert "one two three" in texts and "four five" in texts
        for b in blocks:  # shape invariants (analog of test_segmentation.py:38-60)
            assert b.start < b.end
            assert b.n_chars == len(b.text) > 0
            assert 0.0 <= b.link_density <= 1.0
            assert b.block_id == blocks.index(b)

    def test_script_style_excluded(self):
        html = "<body><script>var x=1;</script><style>.a{}</style><p>keep me now</p></body>"
        blocks, _ = segment_blocks(html)
        joined = " ".join(b.text for b in blocks)
        assert "var x" not in joined and ".a{}" not in joined and "keep me now" in joined

    def test_entities_unescaped(self):
        blocks, _ = segment_blocks("<p>Tom &amp; Jerry &#1071;</p>")
        assert blocks[0].text == "Tom & Jerry Я"

    def test_link_density(self):
        html = '<nav><a href="/">Home</a> <a href="/a">About</a></nav><p>plain text words</p>'
        blocks, _ = segment_blocks(html)
        nav = next(b for b in blocks if "nav" in b.tag_path)
        assert nav.link_density > 0.8
        p = next(b for b in blocks if b.text == "plain text words")
        assert p.link_density == 0.0

    def test_empty_page(self):
        blocks, lvl = segment_blocks("<html><body></body></html>")
        assert blocks == [] and lvl == FALLBACK_NONE

    def test_malformed_never_raises(self):
        blocks, lvl = segment_blocks("<div><p>text one two < stray <b>bold")
        assert any("text one two" in b.text for b in blocks)

    def test_plain_text_chunks(self):
        blocks, lvl = segment_blocks("word " * 1000, kind="text")
        assert lvl == FALLBACK_CHUNK
        assert all(b.is_content and b.confidence == 0.3 for b in blocks)

    def test_binary_placeholder(self):
        blocks, lvl = segment_blocks("garbage bytes decoded", kind="binary")
        assert lvl == FALLBACK_PLACEHOLDER
        assert len(blocks) <= 1
        assert all(b.confidence == 0.1 for b in blocks)


class TestClassify:
    def _mk(self, html):
        blocks, _ = segment_blocks(html)
        return classify_blocks(blocks)

    def test_long_paragraph_kept(self):
        blocks = self._mk("<body><p>" + "word " * 50 + "</p></body>")
        p = next(b for b in blocks if b.n_words >= 50)
        assert p.is_content and p.confidence == 0.95

    def test_nav_dropped(self):
        blocks = self._mk('<body><nav><ul><li><a href="/">Home page link</a></li></ul></nav>'
                          "<p>" + "word " * 50 + "</p></body>")
        nav_blocks = [b for b in blocks if "nav" in b.tag_path]
        assert nav_blocks and all(not b.is_content for b in nav_blocks)

    def test_heading_rescue(self):
        blocks = self._mk("<body><h2>Short Heading Here</h2><p>" + "word " * 50 + "</p></body>")
        h = next(b for b in blocks if "h2" in b.tag_path)
        assert h.is_content and h.confidence == 0.7

    def test_link_farm_dropped(self):
        html = "<body><div>" + "".join(f'<a href="/{i}">link number {i}</a> ' for i in range(30)) + "</div></body>"
        blocks = self._mk(html)
        assert all(not b.is_content for b in blocks)


class TestRender:
    def test_joins_kept_in_order(self):
        html = "<body><p>" + "a " * 50 + "</p><nav><a href='/'>x</a></nav><p>" + "b " * 50 + "</p></body>"
        blocks, _ = segment_blocks(html)
        classify_blocks(blocks)
        text, offsets = render_text(blocks)
        parts = text.split("\n")
        assert parts[0].startswith("a") and parts[-1].startswith("b")
        # offsets index into the rendered text exactly
        for bid, s, e in offsets:
            blk = next(b for b in blocks if b.block_id == bid)
            assert text[s:e] == blk.text

    def test_empty(self):
        assert render_text([]) == ("", [])


class TestNER:
    def test_person_full_name(self):
        spans = tag_entities("Зустрів Тараса ні, Тарас Григорович Шевченко тут")
        persons = [s for s in spans if s.label == "PERSON"]
        assert any(s.text == "Тарас Григорович Шевченко" for s in persons)
        assert all(s.confidence == 0.8 for s in persons)

    def test_location(self):
        spans = tag_entities("народився у село Моринці поблизу")
        locs = [s for s in spans if s.label == "LOCATION"]
        assert any("село Моринці" == s.text for s in locs)
        assert all(s.confidence == 0.7 for s in locs)

    def test_offsets_exact(self):
        text = "xx Іван Петренко yy"
        spans = tag_entities(text)
        for s in spans:
            assert text[s.start:s.end] == s.text

    def test_stoplist(self):
        spans = tag_entities("Особа прибула")
        assert all(s.text.lower() != "особа" for s in spans)

    def test_block_id_attach(self):
        spans = [Span("a", "PERSON", 0.8, 0, 5), Span("b", "PERSON", 0.8, 12, 15)]
        kept = [(3, 0, 10), (7, 11, 20)]
        out = attach_block_ids(spans, kept)
        assert out[0].block_id == 3 and out[1].block_id == 7
        # offset-only call: context stays empty
        assert out[0].context == "" and out[1].context == ""

    def test_context_is_pm2_kept_block_window(self):
        """find_context parity (core/ner.py:505-513): space-joined texts
        of kept blocks [i-2, i+2], clipped at the corpus edges — keyed by
        the carried block index, not the reference's substring scan."""
        texts = ["b0", "b1", "b2", "b3", "b4", "b5"]
        text = "\n".join(texts)
        kept, pos = [], 0
        for i, t in enumerate(texts):
            kept.append((i, pos, pos + len(t)))
            pos += len(t) + 1
        spans = [Span("x", "PERSON", 0.8, kept[i][1], kept[i][1] + 1)
                 for i in range(6)]
        out = attach_block_ids(spans, kept, text)
        assert out[0].context == "b0 b1 b2"            # head-clipped
        assert out[1].context == "b0 b1 b2 b3"
        assert out[3].context == "b1 b2 b3 b4 b5"      # full ±2
        assert out[5].context == "b3 b4 b5"            # tail-clipped

    def test_context_empty_for_unattached_span(self):
        out = attach_block_ids([Span("x", "PERSON", 0.8, 50, 55)],
                               [(0, 0, 10)], "0123456789")
        assert out[0].block_id == -1 and out[0].context == ""


class TestLexicon:
    def test_exact_match(self):
        m = LexiconMatcher(default_lexicon())
        hits = m.find_in_text("пан Шевченко прибув")
        assert hits and hits[0].matched_term in ("Шевченко", "шевченко")
        assert hits[0].confidence == 1.0

    def test_ocr_confusion_match(self):
        m = LexiconMatcher(default_lexicon())
        hits = m.find_in_text("пан Шевчеико прибув")  # и/н confusion
        assert any(h.found_text == "Шевчеико" and "шевченко" in h.matched_term.lower()
                   for h in hits)

    def test_threshold(self):
        m = LexiconMatcher(["Шевченко"], threshold=0.99)
        assert not any(h.found_text == "Шевчеико" for h in m.find_in_text("Шевчеико"))

    def test_min_length(self):
        m = LexiconMatcher(default_lexicon())
        assert m.find_in_text("як це") == []

    def test_normalize_parity(self):
        # parity vector vs reference normalize_text semantics
        assert normalize_text("Шевченко!") == "шевченко"
        assert normalize_text("  Héllo,  ") == "hello"

    def test_similarity_bounds(self):
        assert similarity("шевченко", "шевченко") == 1.0
        assert 0.0 <= similarity("шевченко", "xyz") < 0.5

    def test_context_window(self):
        m = LexiconMatcher(default_lexicon())
        hits = m.find_in_text("a b Шевченко c d e")
        assert hits[0].context == "a b Шевченко c d"


class TestRegions:
    def _spans(self, centers):
        return [Span(f"p{i}", "PERSON", 0.8, c - 5, c + 5) for i, c in enumerate(centers)]

    def test_cluster_found(self):
        regs = dense_regions(self._spans([100, 200, 350]), 1000)
        assert len(regs) == 1
        assert regs[0].n_entities == 3
        assert regs[0].start == 95 - 50 and regs[0].end == 355 + 50

    def test_min_samples_guard(self):
        assert dense_regions(self._spans([100, 200]), 1000) == []

    def test_gap_splits(self):
        regs = dense_regions(self._spans([0, 100, 200, 2000, 2100, 2200]), 5000)
        assert len(regs) == 2

    def test_largest_first(self):
        regs = dense_regions(self._spans([0, 100, 200, 300, 2000, 2100, 2200]), 5000)
        assert regs[0].n_entities == 4


class TestPDF:
    def test_tj(self):
        doc = "%PDF-1.4 BT (Hello) Tj (World) Tj ET"
        assert extract_pdf_text(doc) == "Hello World"

    def test_tj_array(self):
        doc = "%PDF-1.4 BT [(a) (b) (c)] TJ ET"
        assert extract_pdf_text(doc) == "a b c"

    def test_escapes(self):
        doc = r"%PDF-1.4 BT (par\(en\)s \\ ok) Tj ET"
        assert extract_pdf_text(doc) == r"par(en)s \ ok"

    def test_layout_positions(self):
        from ukrainian_ocr_pipeline_spark.spec.pdfmini import (
            build_fixture_pdf,
            extract_pdf_layout,
        )
        # fixture places line i at (72, 700 - 20i) — both layouts
        for compress in (True, False):
            doc = build_fixture_pdf(["one", "two", "three"],
                                    compress=compress).decode("latin-1")
            assert extract_pdf_layout(doc) == [
                (72.0, 700.0, "one"), (72.0, 680.0, "two"),
                (72.0, 660.0, "three")], compress
        # Td is cumulative within a text object; Tm sets absolutely;
        # BT resets the origin
        d2 = ("BT 10 700 Td (a) Tj 0 -20 Td (b) Tj "
              "1 0 0 1 50 100 Tm (c) Tj ET BT (d) Tj ET")
        assert extract_pdf_layout(d2) == [
            (10.0, 700.0, "a"), (10.0, 680.0, "b"),
            (50.0, 100.0, "c"), (0.0, 0.0, "d")]
        # hex operands carry positions too; junk yields []
        assert extract_pdf_layout("BT 5 6 Td <4869> Tj ET") == [
            (5.0, 6.0, "Hi")]
        assert extract_pdf_layout("no pdf here") == []

    def test_hex_strings(self):
        # <4865 6C6C 6F> == 'Hello'; odd digit count implies tail '0';
        # mixed literal + hex keep document order
        assert extract_pdf_text("BT <48656C6C6F> Tj ET") == "Hello"
        assert extract_pdf_text("BT <4865 6c6c 6F> Tj ET") == "Hello"
        assert extract_pdf_text("BT <48656C6C6F7> Tj ET") == "Hellop"
        assert extract_pdf_text("BT (lit) Tj <686578> Tj ET") == "lit hex"
        assert extract_pdf_text("BT [(a) <62> (c)] TJ ET") == "a b c"
        # empty hex string contributes nothing; '<<' dicts never match
        assert extract_pdf_text("BT <> Tj (x) Tj ET") == "x"

    def test_hex_fixture_builder_roundtrip(self):
        from ukrainian_ocr_pipeline_spark.spec.pdfmini import (
            build_fixture_pdf,
        )
        texts = ["hex one", "two (parens) \\ three"]
        for compress in (True, False):
            doc = build_fixture_pdf(texts, compress=compress,
                                    hex_strings=True).decode("latin-1")
            assert extract_pdf_text(doc) == " ".join(texts), compress

    def test_flate_stream_inflated(self):
        from ukrainian_ocr_pipeline_spark.spec.pdfmini import (
            build_fixture_pdf,
        )
        texts = ["hello world", "par(en)s \\ ok", "third line"]
        for compress in (True, False):
            doc = build_fixture_pdf(texts, compress=compress) \
                .decode("latin-1")
            assert extract_pdf_text(doc) == " ".join(texts), compress

    def test_flate_corrupt_stream_extracts_nothing(self):
        from ukrainian_ocr_pipeline_spark.spec.pdfmini import (
            build_fixture_pdf,
        )
        doc = build_fixture_pdf(["abc def"]).decode("latin-1")
        i = doc.index("stream\n") + 10
        assert extract_pdf_text(doc[:i] + "X" + doc[i + 1:]) == ""

    def test_flate_bomb_capped(self):
        # 100 MB of zeros behind a tiny Flate stream: must yield ''
        # quickly, never inflate past the cap inside a task
        import zlib
        bomb = zlib.compress(b"BT (boom) Tj ET" + b"\x00" * (100 << 20), 9)
        doc = (f"<< /Length {len(bomb)} /Filter /FlateDecode >>\nstream\n"
               + bomb.decode("latin-1") + "\nendstream")
        assert extract_pdf_text(doc) == ""

    def test_flate_filter_chain_left_untouched(self):
        # multi-filter chains ([/ASCII85Decode /FlateDecode]) are not
        # sole-Flate: inflating one stage would hand garbage onward
        import zlib
        data = zlib.compress(b"BT (nope) Tj ET")
        doc = ("<< /Filter [/ASCII85Decode /FlateDecode] >>\nstream\n"
               + data.decode("latin-1") + "\nendstream")
        assert extract_pdf_text(doc) == ""
        doc2 = ("<< /Filter /FlateDecode /DecodeParms null >>\nstream\n"
                + data.decode("latin-1") + "\nendstream")
        assert extract_pdf_text(doc2) == "nope"

    def test_flate_and_raw_streams_in_document_order(self):
        import zlib
        inner = zlib.compress(b"BT (first) Tj ET")
        doc = ("%PDF-1.4\n<< /Filter /FlateDecode >>\nstream\n"
               + inner.decode("latin-1") + "\nendstream\n"
               + "BT (second) Tj ET")
        assert extract_pdf_text(doc) == "first second"


class TestExtractPage:
    def test_error_capture(self):
        from ukrainian_ocr_pipeline_spark.spec import extract_page
        r = extract_page("u", object())  # type: ignore[arg-type]  # wrong type -> captured
        assert not r.success and r.error and r.extracted_text == ""

    def test_full_flow(self):
        from ukrainian_ocr_pipeline_spark.spec import extract_page
        from ukrainian_ocr_pipeline_spark.fixtures import page_row
        row = page_row(10)
        r = extract_page(row["url"], row["html"])
        assert r.success and r.blocks_detected > 0


class TestEdgeCaseFixes:
    """Regression tests for review-found spec bugs (round 1)."""

    def test_utf16_html_is_parsed_as_html(self):
        from ukrainian_ocr_pipeline_spark.spec.pipeline import extract_page
        body = "<html><body><p>" + "word " * 50 + "</p></body></html>"
        for enc, bom in (("utf-16-le", b"\xff\xfe"), ("utf-16-be", b"\xfe\xff")):
            r = extract_page("u", bom + body.encode(enc))
            assert r.kind == "html", enc
            assert r.blocks_kept == 1 and r.extracted_text.startswith("word word")
            assert "<" not in r.extracted_text  # no raw markup leaked

    def test_unterminated_script_yields_clean_empty(self):
        from ukrainian_ocr_pipeline_spark.spec.pipeline import extract_page
        r = extract_page("u", b"<html><body><script>var secret = 1; f();")
        assert r.success and r.extracted_text == ""
        assert r.blocks_detected == 0 and r.fallback_level == 0

    def test_deep_nested_boiler_ancestor_still_dropped(self):
        from ukrainian_ocr_pipeline_spark.spec.pipeline import extract_page
        page = ("<html><body><nav><table><tr><td><p>"
                + "linky words " * 20
                + "</p></td></tr></table></nav><p>"
                + "real content " * 30 + "</p></body></html>")
        r = extract_page("u", page.encode())
        verdicts = {b.tag_path: b.is_content for b in r.blocks}
        assert verdicts["nav/table/tr/td/p"] is False  # nav preserved in path
        assert verdicts["body/p"] is True
        assert "linky" not in r.extracted_text

    def test_matcher_cache_is_per_instance(self):
        from ukrainian_ocr_pipeline_spark.spec.lexicon import LexiconMatcher
        m1 = LexiconMatcher(["Шевченко"], 0.8)
        m1.find_in_text("Шевченко був тут")
        assert len(m1._best_cache) > 0
        m2 = LexiconMatcher(["Шевченко"], 0.8)
        assert len(m2._best_cache) == 0  # no cross-instance state

    def test_pdf_extractor_edge_cases(self):
        from ukrainian_ocr_pipeline_spark.spec.pdfmini import extract_pdf_text
        # 'ET' inside a string literal must not terminate the text object
        assert extract_pdf_text("BT (NET gain) Tj ET") == "NET gain"
        # \8 is a literal '8' (not octal); \9 likewise; never raises
        assert extract_pdf_text(r"BT (a\9b) Tj ET") == "a9b"
        assert extract_pdf_text(r"BT (\101\8) Tj ET") == "A8"
        # ']' inside a TJ-array string literal must not kill the array
        assert extract_pdf_text("BT [(a]b) (c)] TJ ET") == "a]b c"
        # Tj/TJ reading order preserved
        assert extract_pdf_text("BT [(first)] TJ (second) Tj ET") == "first second"

    def test_zscore_honors_custom_columns(self, spark):
        from ukrainian_ocr_pipeline_spark.operators.grouped import zscore_by_group
        df = spark.createDataFrame(
            [(1, "a", 1.5), (2, "a", 2.5), (3, "b", 4.0)],
            "doc_id bigint, source string, score double")
        out = zscore_by_group(df, group_col="source", value_col="score").toPandas()
        assert list(out.columns) == ["doc_id", "source", "score", "z_score"]
        assert sorted(out.score.tolist()) == [1.5, 2.5, 4.0]  # no int truncation

    def test_oracle_empty_tables_keep_schema(self):
        from ukrainian_ocr_pipeline_spark.oracle import run_oracle
        golden = run_oracle([{"url": "u1", "html": b"<html><body></body></html>"}])
        assert list(golden["matches"].columns) == [
            "url", "found_text", "matched_term", "confidence", "word_idx", "context"]
        assert len(golden["matches"]) == 0
        assert list(golden["regions"].columns) == [
            "url", "start", "end", "n_entities", "label"]


class TestRound2AdviceFixes:
    """Regression tests for round-1 ADVICE findings."""

    def test_unterminated_head_no_body_reaches_fallback(self):
        # an unterminated <head> with no <body> swallows the whole page in
        # the structural parse; the empty-page check must NOT also swallow
        # it (clean-empty) — the content has to surface via a fallback
        from ukrainian_ocr_pipeline_spark.spec.segment import segment_blocks
        blocks, level = segment_blocks(
            "<html><head><title>t</title><p>real visible content here</p>")
        assert blocks, "content page misclassified as clean-empty"
        assert level > 0
        assert "real visible content" in " ".join(b.text for b in blocks)

    def test_unterminated_head_with_body_parses_structurally(self):
        from ukrainian_ocr_pipeline_spark.spec.segment import segment_blocks
        blocks, level = segment_blocks(
            "<html><head><title>t</title><body><p>hello world</p></body>")
        assert level == 0
        assert [b.text for b in blocks] == ["hello world"]

    def test_script_only_page_still_clean_empty(self):
        from ukrainian_ocr_pipeline_spark.spec.segment import segment_blocks
        blocks, level = segment_blocks(
            "<html><head></head><body><script>var x = 1;</script></body></html>")
        assert blocks == [] and level == 0

    def test_iceberg_identifier_validation(self):
        import pytest as _pytest
        from ukrainian_ocr_pipeline_spark.sources.iceberg import (
            _check_ident, _check_ts)
        assert _check_ident("wh.db.pages") == "wh.db.pages"
        assert _check_ts("2026-01-01 00:00:00") == "2026-01-01 00:00:00"
        for bad in ["wh.db'; DROP TABLE x; --", "a b", "", "x-y", "a..b"]:
            with _pytest.raises(ValueError):
                _check_ident(bad)
        with _pytest.raises(ValueError):
            _check_ts("2026-01-01' OR '1'='1")

    def test_oracle_rejects_row_key_drift(self):
        # a spec field added to the row dicts must fail loudly, not vanish
        import pytest as _pytest
        from ukrainian_ocr_pipeline_spark.oracle import _frame, run_oracle
        golden = run_oracle([{"url": "u", "html": b"<p>hi there</p>"}])
        assert len(golden["extracted"]) == 1  # sane corpus still passes
        good = {"url": "u", "extracted_text": "hi there", "n_spans": 0}
        assert len(_frame("extracted", [good])) == 1
        with _pytest.raises(ValueError, match="row keys"):
            _frame("extracted", [dict(good, new_field=1)])
        with _pytest.raises(ValueError, match="row keys"):
            bad = dict(good); del bad["n_spans"]
            _frame("extracted", [bad])


class TestQualityFilterUnicode:
    """Review regression: the quality gate must not treat non-ASCII
    letters as symbols (dropping the pipeline's target language) and
    must drop NULL text explicitly on BOTH engines."""

    def test_cyrillic_document_survives(self, spark):
        from ukrainian_ocr_pipeline_spark.operators.textstats import quality_filter
        uk = ("Привіт світе це тестовий документ про місто Київ і його "
              "мешканців які читають книги та пишуть листи щодня разом")
        df = spark.createDataFrame([(0, uk), (1, "the cat sat on the mat "
                                              "and then ran off to a barn")],
                                   "doc_id bigint, text string")
        out = {r.doc_id: (r.keep, r.drop_reason)
               for r in quality_filter(df).collect()}
        assert out[0] == (True, None), out   # Cyrillic doc kept
        assert out[1] == (True, None), out   # English doc kept

    def test_null_and_symbol_heavy_dropped(self, spark):
        from ukrainian_ocr_pipeline_spark.operators.textstats import quality_filter
        df = spark.createDataFrame(
            [(0, None),
             (1, "@@ ## $$ %% ^^ && ** (( )) __ ++ == ~~ :: ;; !!"),
             (2, "word " * 2)],
            "doc_id bigint, text string")
        out = {r.doc_id: r.drop_reason for r in quality_filter(df).collect()}
        assert out[0] == "null_text"
        assert out[1] == "symbol_ratio"
        assert out[2] == "too_short"

    def test_nonlatin_exempt_from_english_stopwords(self, spark):
        from ukrainian_ocr_pipeline_spark.operators.textstats import quality_filter
        # latin-majority doc without stopwords -> dropped; the same
        # word count in Cyrillic -> exempt from the English stoplist
        lat = "zebra quartz jumble wombat fedora pixel nugget voxel crumb"
        cyr = "зебра кварц джемпер вомбат федора піксель нагет воксель крихта"
        df = spark.createDataFrame([(0, lat), (1, cyr)],
                                   "doc_id bigint, text string")
        out = {r.doc_id: r.drop_reason for r in quality_filter(df).collect()}
        assert out[0] == "few_stopwords"
        assert out[1] is None


def test_nation_set_ops_uses_distinct_except_semantics(spark):
    """Review regression: EXCEPT (distinct), not EXCEPT ALL — a nation
    with any customer must never appear as supplier_only, regardless of
    supplier/customer multiplicities."""
    from pyspark.sql import functions as F
    su = spark.createDataFrame([(1,), (1,), (2,)], "s_nationkey bigint")
    cu = spark.createDataFrame([(1,), (3,)], "c_nationkey bigint")
    both = su.select("s_nationkey").intersect(
        cu.withColumnRenamed("c_nationkey", "s_nationkey"))
    only = su.select("s_nationkey").subtract(
        cu.withColumnRenamed("c_nationkey", "s_nationkey"))
    assert [r.s_nationkey for r in both.collect()] == [1]
    assert [r.s_nationkey for r in only.collect()] == [2]  # NOT {1, 2}

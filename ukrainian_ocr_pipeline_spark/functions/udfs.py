"""Vectorized pandas/Arrow UDFs wrapping the pure spec functions.

Per BASELINE.json input_hint: pandas/Arrow UDFs only — no row-at-a-time
Python UDFs anywhere.  Each UDF:

  * calls the same spec functions the oracle calls (parity by construction),
  * captures per-row errors inside the batch (never fails the task —
    analog of ukrainian_ocr/core/pipeline.py:348-355),
  * uses the per-executor lazy-singleton idiom for expensive state
    (the lexicon matcher), the Spark analog of the reference's lazy
    _init_components (core/pipeline.py:139-181).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ..spec import (
    LexiconMatcher, classify_blocks, decode_page, dense_regions,
    segment_blocks, tag_entities,
)
from ..spec.ner import Span, attach_block_ids, get_ner_backend
from .schemas import (
    MATCH_SCHEMA, REGION_SCHEMA, SEGMENT_RESULT_SCHEMA, SPAN_SCHEMA,
)
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# per-executor singleton cache (lazy init inside the Python worker, once per
# process — not per batch)
_MATCHER_CACHE: dict[tuple, LexiconMatcher] = {}


def _get_matcher(terms: tuple[str, ...], threshold: float,
                 use_phonetic: bool = True, min_length: int = 3) -> LexiconMatcher:
    key = (terms, threshold, use_phonetic, min_length)
    m = _MATCHER_CACHE.get(key)
    if m is None:
        m = LexiconMatcher(list(terms), threshold,
                           use_phonetic=use_phonetic, min_length=min_length)
        _MATCHER_CACHE[key] = m
    return m


def _block_dict(b) -> dict:
    return {
        "block_id": b.block_id, "start": b.start, "end": b.end,
        "tag_path": b.tag_path, "text": b.text, "n_words": b.n_words,
        "n_chars": b.n_chars, "link_chars": b.link_chars,
        "text_density": b.text_density, "link_density": b.link_density,
        "fallback_level": b.fallback_level, "is_content": b.is_content,
        "confidence": b.confidence,
    }


@F.pandas_udf(SEGMENT_RESULT_SCHEMA)
def segment_pages_udf(html: pd.Series) -> pd.DataFrame:
    """decode + segment + classify, one Arrow batch at a time.

    Stage 1-3 of the pipeline (analog of load+segment+recognize,
    core/pipeline.py:223-236). Render is deliberately NOT here — it runs
    JVM-side on the returned blocks array (see operators.extract).
    """
    import time
    out = {"blocks": [], "kind": [], "charset": [],
           "fallback_level": [], "success": [], "error": [], "t_ms": []}
    for raw in html:
        t0 = time.perf_counter()
        try:
            data = bytes(raw) if raw is not None else None
            dec = decode_page(data)
            blocks, level = segment_blocks(dec.text, dec.kind)
            classify_blocks(blocks)
            out["blocks"].append([_block_dict(b) for b in blocks])
            out["kind"].append(dec.kind)
            out["charset"].append(dec.charset)
            out["fallback_level"].append(level)
            out["success"].append(True)
            out["error"].append(None)
        except Exception as e:  # per-row capture; the task never fails
            out["blocks"].append([])
            out["kind"].append("error")
            out["charset"].append("")
            out["fallback_level"].append(-1)
            out["success"].append(False)
            out["error"].append(f"{type(e).__name__}: {e}")
        out["t_ms"].append((time.perf_counter() - t0) * 1000.0)
    return pd.DataFrame(out)


@F.pandas_udf(T.ArrayType(SPAN_SCHEMA))
def ner_udf(text: pd.Series, kept: pd.Series) -> pd.Series:
    """Stage 4 entity tagging over the rendered text.

    `kept` is array<struct<block_id,n_chars>> computed JVM-side from the
    kept blocks; offsets are rebuilt by cumulative sum so span.block_id
    assignment is exact without re-rendering.
    """
    results = []
    for doc, offsets in zip(text, kept):
        try:
            spans = tag_entities(doc or "")
            kept_offsets = []
            pos = 0
            for item in (offsets if offsets is not None else []):
                d = item if isinstance(item, dict) else item.asDict()
                kept_offsets.append((int(d["block_id"]), pos, pos + int(d["n_chars"])))
                pos += int(d["n_chars"]) + 1
            spans = attach_block_ids(spans, kept_offsets, doc or "")
            results.append([{
                "text": s.text, "label": s.label, "confidence": s.confidence,
                "start": s.start, "end": s.end, "block_id": s.block_id,
                "context": s.context,
            } for s in spans])
        except Exception:
            results.append([])
    return pd.Series(results)


def make_match_udf(terms: list[str], threshold: float = 0.8,
                   min_length: int = 3):
    """Fuzzy lexicon match UDF factory.

    The lexicon travels in the UDF closure (small — the Spark analog of a
    broadcast variable for the DataFrame API) and is expanded into a
    LexiconMatcher once per executor process via the singleton cache.
    Semantically a broadcast nested-loop similarity join
    (core/surname_matcher.py:240-269 recast).
    """
    terms_t = tuple(terms)

    @F.pandas_udf(T.ArrayType(MATCH_SCHEMA))
    def match_udf(text: pd.Series) -> pd.Series:
        matcher = _get_matcher(terms_t, threshold, min_length=min_length)
        results = []
        for doc in text:
            try:
                results.append([{
                    "found_text": m.found_text, "matched_term": m.matched_term,
                    "confidence": m.confidence, "word_idx": m.word_idx,
                    "context": m.context,
                } for m in matcher.find_in_text(doc or "")])
            except Exception:
                results.append([])
        return pd.Series(results)

    return match_udf


def make_enrich_udf(terms: list[str] | None, threshold: float = 0.8,
                    with_matches: bool = True, with_regions: bool = True,
                    ner_backend=None, min_length: int = 3):
    """Fused stage 4+5+5.5: NER + fuzzy match + dense regions in ONE
    Arrow pass over the rendered text.

    Fusing matters at scale: as separate UDF columns these are three
    Python exchanges per task (JVM->worker->JVM x3, each re-shipping the
    ~KB..MB extracted_text through Arrow).  One fused pass removes two
    round-trips per row and keeps per-task Python worker count flat —
    measured locally, it's the difference between flat and linear
    scaling from 8 to 32 cores.
    """
    terms_t = tuple(terms) if terms is not None else None
    # resolved in the DRIVER; the callable travels in the UDF closure
    # (cloudpickle), so custom backends work on executors unregistered
    tagger = get_ner_backend(ner_backend)
    enrich_schema = T.StructType([
        T.StructField("spans", T.ArrayType(SPAN_SCHEMA), False),
        T.StructField("matches", T.ArrayType(MATCH_SCHEMA), False),
        T.StructField("regions", T.ArrayType(REGION_SCHEMA), False),
        # error/t_ms ride along so the staged assembly can (a) surface
        # an enrich-stage failure as success=False instead of silently
        # emitting empty spans under success=True, and (b) count this
        # stage's cost in t_ms like packed/arrow do (staged previously
        # timed only segmentation — metrics undercounted the NER+match
        # stage entirely)
        T.StructField("error", T.StringType(), True),
        T.StructField("t_ms", T.DoubleType(), False),
    ])

    @F.pandas_udf(enrich_schema)
    def enrich_udf(text: pd.Series, kept: pd.Series) -> pd.DataFrame:
        import time
        matcher = (_get_matcher(terms_t, threshold, min_length=min_length)
                   if (with_matches and terms_t) else None)
        col_spans, col_matches, col_regions = [], [], []
        col_err, col_tms = [], []
        for doc, offsets in zip(text, kept):
            t0 = time.perf_counter()
            try:
                doc = doc or ""
                spans = tagger(doc)
                kept_offsets = []
                pos = 0
                for item in (offsets if offsets is not None else []):
                    d = item if isinstance(item, dict) else item.asDict()
                    kept_offsets.append((int(d["block_id"]), pos, pos + int(d["n_chars"])))
                    pos += int(d["n_chars"]) + 1
                spans = attach_block_ids(spans, kept_offsets, doc)
                col_spans.append([{
                    "text": s.text, "label": s.label, "confidence": s.confidence,
                    "start": s.start, "end": s.end, "block_id": s.block_id,
                    "context": s.context,
                } for s in spans])
                if matcher is not None:
                    col_matches.append([{
                        "found_text": m.found_text, "matched_term": m.matched_term,
                        "confidence": m.confidence, "word_idx": m.word_idx,
                        "context": m.context,
                    } for m in matcher.find_in_text(doc)])
                else:
                    col_matches.append([])
                if with_regions:
                    col_regions.append([{
                        "start": r.start, "end": r.end,
                        "n_entities": r.n_entities, "label": r.label,
                    } for r in dense_regions(spans, len(doc))])
                else:
                    col_regions.append([])
                col_err.append(None)
            except Exception as e:
                col_spans.append([])
                col_matches.append([])
                col_regions.append([])
                col_err.append(f"{type(e).__name__}: {e}")
            col_tms.append((time.perf_counter() - t0) * 1000.0)
        return pd.DataFrame({"spans": col_spans, "matches": col_matches,
                             "regions": col_regions, "error": col_err,
                             "t_ms": col_tms})

    return enrich_udf


#: output fields of the whole-pipeline (packed) extractor, shared by the
#: pandas-UDF and mapInArrow physical variants
PACKED_FIELDS = [
    T.StructField("extracted_text", T.StringType(), False),
    T.StructField("spans", T.ArrayType(SPAN_SCHEMA), False),
    T.StructField("matches", T.ArrayType(MATCH_SCHEMA), False),
    T.StructField("regions", T.ArrayType(REGION_SCHEMA), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("charset", T.StringType(), False),
    T.StructField("fallback_level", T.IntegerType(), False),
    T.StructField("success", T.BooleanType(), False),
    T.StructField("error", T.StringType(), True),
    T.StructField("blocks_detected", T.IntegerType(), False),
    T.StructField("blocks_kept", T.IntegerType(), False),
    T.StructField("t_ms", T.DoubleType(), False),
]


def make_packed_extract_udf(terms: list[str] | None,
                            threshold: float = 0.8,
                            with_matches: bool = True,
                            with_regions: bool = True,
                            ner_backend=None, min_length: int = 3):
    """Whole-pipeline fusion: ONE Arrow pass html -> everything.

    Calls spec.extract_page per row — the exact function the oracle runs —
    so parity is trivially preserved.  Compared to the staged chain this
    skips shipping the blocks array through Arrow entirely and uses a
    single Python worker per task: the throughput mode for jobs that
    don't need the per-block table.  extract_page never raises, so the
    error contract (core/pipeline.py:348-355) is inherited.
    """
    from ..spec import extract_page

    terms_t = tuple(terms) if terms is not None else None
    tagger = get_ner_backend(ner_backend)
    packed_schema = T.StructType(PACKED_FIELDS)

    @F.pandas_udf(packed_schema)
    def packed_udf(url: pd.Series, html: pd.Series) -> pd.DataFrame:
        import time
        matcher = (_get_matcher(terms_t, threshold, min_length=min_length)
                   if (with_matches and terms_t) else None)
        cols: dict[str, list] = {f.name: [] for f in packed_schema.fields}
        for u, raw in zip(url, html):
            t0 = time.perf_counter()
            r = extract_page(u, bytes(raw) if raw is not None else None,
                             matcher, ner=tagger,
                             with_regions=with_regions)
            cols["extracted_text"].append(r.extracted_text)
            cols["spans"].append([{
                "text": s.text, "label": s.label, "confidence": s.confidence,
                "start": s.start, "end": s.end, "block_id": s.block_id,
                "context": s.context,
            } for s in r.spans])
            cols["matches"].append([{
                "found_text": m.found_text, "matched_term": m.matched_term,
                "confidence": m.confidence, "word_idx": m.word_idx,
                "context": m.context,
            } for m in r.matches])
            cols["regions"].append([{
                "start": g.start, "end": g.end,
                "n_entities": g.n_entities, "label": g.label,
            } for g in r.regions])
            cols["kind"].append(r.kind)
            cols["charset"].append(r.charset)
            cols["fallback_level"].append(r.fallback_level)
            cols["success"].append(r.success)
            cols["error"].append(r.error)
            cols["blocks_detected"].append(r.blocks_detected)
            cols["blocks_kept"].append(r.blocks_kept)
            cols["t_ms"].append((time.perf_counter() - t0) * 1000.0)
        return pd.DataFrame(cols)

    return packed_udf


#: Spark-side schema of the mapInArrow packed extractor output: the
#: packed struct fields plus the (url, warc_ts) passthrough — ONE field
#: list shared with make_packed_extract_udf so the two physical plans
#: cannot drift apart.
PACKED_ARROW_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), True),
    *PACKED_FIELDS,
])


def packed_arrow_schema(passthrough_fields: list) -> T.StructType:
    """Output schema of the mapInArrow extractor for an arbitrary list
    of passthrough input StructFields (url must be among them) — the
    generalization of PACKED_ARROW_SCHEMA that lets arrow mode preserve
    every non-payload input column (lang, crawl metadata, ...) so its
    committed snapshot schema matches packed mode's instead of silently
    dropping columns on a mode switch."""
    return T.StructType([*passthrough_fields, *PACKED_FIELDS])


def make_packed_extract_arrow(terms: list[str] | None,
                              threshold: float = 0.8,
                              with_matches: bool = True,
                              with_regions: bool = True,
                              ner_backend=None, min_length: int = 3,
                              passthrough: tuple[str, ...] = ("url", "warc_ts")):
    """mapInArrow twin of make_packed_extract_udf: same spec calls, same
    output values, but the nested span/match/region columns are built as
    flat Arrow child arrays + offsets (StructArray/ListArray.from_arrays)
    instead of lists-of-dicts through pandas — measured ~3x faster
    conversion, which matters because output serialization is the last
    Python-side cost the spec work doesn't amortize.

    Returns a generator function for DataFrame.mapInArrow with
    packed_arrow_schema(passthrough fields); input batches must carry
    every ``passthrough`` column plus html, and the passthrough columns
    (url, warc_ts, lang, ...) are echoed zero-copy from the input batch.
    """
    import pyarrow as pa

    terms_t = tuple(terms) if terms is not None else None
    tagger = get_ner_backend(ner_backend)

    def fn(batches):
        import time
        from ..spec import extract_page
        matcher = (_get_matcher(terms_t, threshold, min_length=min_length)
                   if (with_matches and terms_t) else None)
        for batch in batches:
            urls = batch.column("url").to_pylist()
            htmls = batch.column("html").to_pylist()
            texts: list[str] = []
            kinds: list[str] = []
            charsets: list[str] = []
            levels: list[int] = []
            oks: list[bool] = []
            errs: list[str | None] = []
            n_det: list[int] = []
            n_kept: list[int] = []
            tms: list[float] = []
            # flat children + offsets for the three nested list columns
            sp = ([], [], [], [], [], [], [])  # text,label,conf,start,end,block_id,context
            sp_off = [0]
            ma = ([], [], [], [], [])         # found,term,conf,word_idx,context
            ma_off = [0]
            rg = ([], [], [], [])             # start,end,n_entities,label
            rg_off = [0]
            for u, h in zip(urls, htmls):
                t0 = time.perf_counter()
                r = extract_page(u, h, matcher, ner=tagger,
                                 with_regions=with_regions)
                texts.append(r.extracted_text)
                kinds.append(r.kind)
                charsets.append(r.charset)
                levels.append(r.fallback_level)
                oks.append(r.success)
                errs.append(r.error)
                n_det.append(r.blocks_detected)
                n_kept.append(r.blocks_kept)
                for s in r.spans:
                    sp[0].append(s.text); sp[1].append(s.label)
                    sp[2].append(s.confidence); sp[3].append(s.start)
                    sp[4].append(s.end); sp[5].append(s.block_id)
                    sp[6].append(s.context)
                sp_off.append(len(sp[0]))
                for m in r.matches:
                    ma[0].append(m.found_text); ma[1].append(m.matched_term)
                    ma[2].append(m.confidence); ma[3].append(m.word_idx)
                    ma[4].append(m.context)
                ma_off.append(len(ma[0]))
                for g in r.regions:
                    rg[0].append(g.start); rg[1].append(g.end)
                    rg[2].append(g.n_entities); rg[3].append(g.label)
                rg_off.append(len(rg[0]))
                tms.append((time.perf_counter() - t0) * 1000.0)

            spans_arr = pa.ListArray.from_arrays(
                pa.array(sp_off, pa.int32()),
                pa.StructArray.from_arrays(
                    [pa.array(sp[0], pa.string()), pa.array(sp[1], pa.string()),
                     pa.array(sp[2], pa.float64()), pa.array(sp[3], pa.int32()),
                     pa.array(sp[4], pa.int32()), pa.array(sp[5], pa.int32()),
                     pa.array(sp[6], pa.string())],
                    names=["text", "label", "confidence", "start", "end",
                           "block_id", "context"]))
            matches_arr = pa.ListArray.from_arrays(
                pa.array(ma_off, pa.int32()),
                pa.StructArray.from_arrays(
                    [pa.array(ma[0], pa.string()), pa.array(ma[1], pa.string()),
                     pa.array(ma[2], pa.float64()), pa.array(ma[3], pa.int32()),
                     pa.array(ma[4], pa.string())],
                    names=["found_text", "matched_term", "confidence",
                           "word_idx", "context"]))
            regions_arr = pa.ListArray.from_arrays(
                pa.array(rg_off, pa.int32()),
                pa.StructArray.from_arrays(
                    [pa.array(rg[0], pa.int32()), pa.array(rg[1], pa.int32()),
                     pa.array(rg[2], pa.int32()), pa.array(rg[3], pa.string())],
                    names=["start", "end", "n_entities", "label"]))
            yield pa.RecordBatch.from_arrays(
                [*[batch.column(c) for c in passthrough],
                 pa.array(texts, pa.string()), spans_arr, matches_arr,
                 regions_arr, pa.array(kinds, pa.string()),
                 pa.array(charsets, pa.string()), pa.array(levels, pa.int32()),
                 pa.array(oks, pa.bool_()), pa.array(errs, pa.string()),
                 pa.array(n_det, pa.int32()), pa.array(n_kept, pa.int32()),
                 pa.array(tms, pa.float64())],
                names=[*passthrough, *[f.name for f in PACKED_FIELDS]])

    return fn


@F.pandas_udf(T.ArrayType(REGION_SCHEMA))
def regions_udf(spans: pd.Series, text_len: pd.Series) -> pd.Series:
    """Stage 5.5: entity-dense region detection (1-D DBSCAN analog of
    core/enhancement.py:235-360), per row over its span array."""
    results = []
    for span_arr, tl in zip(spans, text_len):
        try:
            span_objs = []
            for item in (span_arr if span_arr is not None else []):
                d = item if isinstance(item, dict) else item.asDict()
                span_objs.append(Span(d["text"], d["label"], d["confidence"],
                                      int(d["start"]), int(d["end"]), int(d["block_id"])))
            regs = dense_regions(span_objs, int(tl))
            results.append([{
                "start": r.start, "end": r.end,
                "n_entities": r.n_entities, "label": r.label,
            } for r in regs])
        except Exception:
            results.append([])
    return pd.Series(results)

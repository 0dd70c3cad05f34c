"""Sequential pure-Python oracle — the golden-output producer.

Analog of the reference's single-threaded driver
(ukrainian_ocr/core/pipeline.py:183-355 process_single_image +
:357-408 process_batch): iterates rows one at a time, applies the shared
spec, and emits the golden tables the Spark job must match byte-for-byte
on `extracted_text` per url.

The oracle and the Spark UDFs call the *same* spec functions — parity by
construction; the oracle exists so tests have an independent sequential
execution path (different batching, different ordering, no Arrow) to
compare against.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from .spec import LexiconMatcher, default_lexicon, extract_page


def run_oracle(rows: Iterable[dict], lexicon: list[str] | None = None) -> dict[str, pd.DataFrame]:
    """rows: dicts with url/html (bytes). Returns golden DataFrames:
    extracted, blocks, spans, matches, regions, metrics."""
    matcher = LexiconMatcher(lexicon if lexicon is not None else default_lexicon())
    extracted, blocks, spans, matches, regions, metrics = [], [], [], [], [], []
    for row in rows:
        r = extract_page(row["url"], row["html"], matcher)
        extracted.append({
            "url": r.url,
            "extracted_text": r.extracted_text,
            "n_spans": len(r.spans),
        })
        for b in r.blocks:
            blocks.append({
                "url": r.url, "block_id": b.block_id, "start": b.start,
                "end": b.end, "tag_path": b.tag_path, "text": b.text,
                "n_words": b.n_words, "n_chars": b.n_chars,
                "link_chars": b.link_chars, "text_density": b.text_density,
                "link_density": b.link_density,
                "fallback_level": b.fallback_level,
                "is_content": b.is_content, "confidence": b.confidence,
            })
        for s in r.spans:
            spans.append({
                "url": r.url, "text": s.text, "label": s.label,
                "confidence": s.confidence, "start": s.start, "end": s.end,
                "block_id": s.block_id, "context": s.context,
            })
        for m in r.matches:
            matches.append({
                "url": r.url, "found_text": m.found_text,
                "matched_term": m.matched_term, "confidence": m.confidence,
                "word_idx": m.word_idx, "context": m.context,
            })
        for g in r.regions:
            regions.append({
                "url": r.url, "start": g.start, "end": g.end,
                "n_entities": g.n_entities, "label": g.label,
            })
        metrics.append({
            "url": r.url, "success": r.success, "error": r.error,
            "kind": r.kind, "charset": r.charset,
            "fallback_level": r.fallback_level,
            "blocks_detected": r.blocks_detected,
            "blocks_kept": r.blocks_kept,
            "entities": r.entities, "matches": r.matches_found,
        })
    data = {"extracted": extracted, "blocks": blocks, "spans": spans,
            "matches": matches, "regions": regions, "metrics": metrics}
    return {name: _frame(name, rows) for name, rows in data.items()}


# explicit columns: an EMPTY table (e.g. no lexicon hits in the corpus)
# must still carry its schema, not come back column-less
ORACLE_COLUMNS = {
    "extracted": ["url", "extracted_text", "n_spans"],
    "blocks": ["url", "block_id", "start", "end", "tag_path", "text",
               "n_words", "n_chars", "link_chars", "text_density",
               "link_density", "fallback_level", "is_content", "confidence"],
    "spans": ["url", "text", "label", "confidence", "start", "end", "block_id",
              "context"],
    "matches": ["url", "found_text", "matched_term", "confidence",
                "word_idx", "context"],
    "regions": ["url", "start", "end", "n_entities", "label"],
    "metrics": ["url", "success", "error", "kind", "charset",
                "fallback_level", "blocks_detected", "blocks_kept",
                "entities", "matches"],
}


def _frame(name: str, rows: list[dict]) -> pd.DataFrame:
    """pd.DataFrame(rows, columns=...) silently drops unknown dict keys
    and NaN-fills missing ones — assert the row shape matches the
    declared columns so a new spec field fails loudly, not vanishes."""
    cols = ORACLE_COLUMNS[name]
    expected = set(cols)
    for r in rows:  # ALL rows: a key drifting only on some rows (e.g.
        # error-only fields) must fail just as loudly as on row 0
        if set(r) != expected:
            raise ValueError(
                f"oracle table {name!r}: row keys {sorted(r)} != "
                f"declared columns {sorted(cols)}")
    return pd.DataFrame(rows, columns=cols)

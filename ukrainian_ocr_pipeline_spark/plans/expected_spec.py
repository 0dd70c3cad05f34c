"""Committed expected spec outputs for the fixed per-`doc_id % 10`
Cyrillic sentences used by q_ner_entity_spans / q_fuzzy_lexicon_matches.

The registry appends one of 10 FIXED sentences to each document
(registry._CYR_SENTENCES), so the expected spans/matches are constants:
per-sentence relative offsets shifted by ``length(text) + 1`` (NER) or
by the latin-prefix word count (fuzzy matches).  These literals were
derived once from the rule spec (spec/ner.py patterns mirror
ukrainian_ocr/core/ner.py:302-345; spec/lexicon.py mirrors
core/surname_matcher.py:221-271) and hand-audited; a drift-guard test
(tests/test_expected_spec.py) recomputes them from the spec so any spec
change fails loudly instead of silently invalidating the oracle.
"""

from __future__ import annotations

# (sentence_id, entity_text, label, rel_start, rel_end) — offsets into
# the sentence itself; emission covers all person patterns then all
# location patterns, duplicates across labels kept (spec/ner.py order).
NER_EXPECTED: list[tuple[int, str, str, int, int]] = [
    (0, "Тарас Григорович Шевченко", "PERSON", 0, 25),
    (0, "Тарас Григорович", "PERSON", 0, 16),
    (0, "Григорович", "PERSON", 6, 16),
    (0, "Шевченко", "PERSON", 17, 25),
    (0, "Шевченко", "LOCATION", 17, 25),
    (1, "село Моринці", "LOCATION", 0, 12),
    (2, "Іван Коваленко", "PERSON", 0, 14),
    (2, "Коваленко", "PERSON", 5, 14),
    (2, "Коваленко", "LOCATION", 5, 14),
    (3, "Бондаренко", "PERSON", 5, 15),
    (3, "Бондаренко", "LOCATION", 5, 15),
    (4, "станція Козятин", "LOCATION", 0, 15),
    (5, "Кравченко", "PERSON", 7, 16),
    (5, "Кравченко", "LOCATION", 7, 16),
    (6, "місто Полтава", "LOCATION", 0, 13),
    (7, "Петро Мельник", "PERSON", 0, 13),
    (8, "Олена Ткаченко", "PERSON", 0, 14),
    (8, "Ткаченко", "PERSON", 6, 14),
    (8, "Ткаченко", "LOCATION", 6, 14),
    (9, "хутір Вишневий", "LOCATION", 0, 14),
]

# (sentence_id, found_text, matched_term, rel_word_idx) — word index
# relative to the sentence's own tokenization; the latin document prefix
# contributes len(findall(\w+)) leading words and zero matches (no
# shared characters with the Cyrillic lexicon => similarity 0 < 0.8).
MATCH_EXPECTED: list[tuple[int, str, str, int]] = [
    (0, "Шевченко", "Шевченко", 2),
    (2, "Коваленко", "Коваленко", 1),
    (3, "Бондаренко", "Бондаренко", 1),
    (5, "Кравченко", "Кравченко", 1),
    (7, "Мельник", "Мельник", 1),
    (8, "Ткаченко", "Ткаченко", 1),
]


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def ner_values_sql() -> str:
    """DuckDB VALUES rows for NER_EXPECTED."""
    return ",\n".join(
        f"({sid}, {_sql_str(t)}, {_sql_str(lab)}, {s}, {e})"
        for sid, t, lab, s, e in NER_EXPECTED
    )


def match_values_sql() -> str:
    """DuckDB VALUES rows for MATCH_EXPECTED."""
    return ",\n".join(
        f"({sid}, {_sql_str(ft)}, {_sql_str(mt)}, {ri})"
        for sid, ft, mt, ri in MATCH_EXPECTED
    )

"""Minimal PDF text-object extractor — the PDF/layout-parse seam.

The north rule names "PDF/layout parse" as part of the extraction
surface; no PDF library exists in this sandbox, so this is a minimal,
deterministic extractor for uncompressed text objects (BT ... ET).
Real-world PDFs with compressed streams raise nothing here — they
simply yield no text and fall through to the placeholder fallback, with
the limitation documented.  The production seam would swap in a real
parser behind the same function signature.

Semantics:
  * BT/ET are matched as standalone tokens (\\bBT\\b), so 'ET' inside a
    string literal like (NET gain) does not terminate the text object.
  * Within a text object, ALL string literals are emitted in document
    order — this covers Tj and TJ operands uniformly (the only
    string-literal operators inside text objects), keeps reading order
    when a page mixes Tj and TJ, and is immune to ']' inside literals.
  * Escapes follow the PDF spec: named escapes, octal \\ooo with octal
    digits only ('\\8' is a literal '8'), and backslash+other → other.
  * Never raises: any internal error yields ''.
"""

from __future__ import annotations

import re

_BT_ET_RE = re.compile(r"\bBT\b(.*?)\bET\b", re.DOTALL)
_STR_RE = re.compile(r"\((?:[^()\\]|\\.)*\)")
_OCTAL_DIGITS = "01234567"

_NAMED_ESCAPES = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
                  "(": "(", ")": ")", "\\": "\\"}


def _unescape_pdf(s: str) -> str:
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            mapped = _NAMED_ESCAPES.get(nxt)
            if mapped is not None:
                out.append(mapped)
                i += 2
                continue
            if nxt in _OCTAL_DIGITS:  # octal escape \o, \oo, \ooo
                j = i + 1
                while j < n and j < i + 4 and s[j] in _OCTAL_DIGITS:
                    j += 1
                out.append(chr(int(s[i + 1:j], 8) & 0xFF))
                i = j
                continue
            # PDF spec: reverse solidus before any other char -> that char
            out.append(nxt)
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def extract_pdf_text(doc: str) -> str:
    """Extract text from uncompressed PDF text objects; '' if none.
    Never raises."""
    try:
        parts: list[str] = []
        for obj in _BT_ET_RE.finditer(doc):
            for m in _STR_RE.finditer(obj.group(1)):
                parts.append(_unescape_pdf(m.group(0)[1:-1]))
        return " ".join(p for p in parts if p)
    except Exception:
        return ""

"""Minimal PDF text-object extractor — the PDF/layout-parse seam.

The north rule names "PDF/layout parse" as part of the extraction
surface; no PDF library exists in this sandbox, so this is a minimal,
deterministic extractor that handles the synthetic "PDF-like" fixtures
(uncompressed text objects only: BT ... Tj/TJ ... ET).  Real-world PDFs
with compressed streams raise nothing here — they simply yield no text
and fall through to the placeholder fallback, with the limitation
documented.  The production seam would swap in a real parser behind the
same function signature.
"""

from __future__ import annotations

import re

# (string) Tj  and  [(a) (b)] TJ  operators inside BT/ET text objects
_BT_ET_RE = re.compile(r"BT(.*?)ET", re.DOTALL)
_TJ_RE = re.compile(r"\((?:[^()\\]|\\.)*\)\s*Tj")
_TJ_ARRAY_RE = re.compile(r"\[((?:[^\[\]\\]|\\.)*)\]\s*TJ")
_STR_RE = re.compile(r"\((?:[^()\\]|\\.)*\)")


def _unescape_pdf(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            mapped = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
                      "(": "(", ")": ")", "\\": "\\"}.get(nxt)
            if mapped is not None:
                out.append(mapped)
                i += 2
                continue
            if nxt.isdigit():  # octal escape \ddd
                j = i + 1
                while j < len(s) and j < i + 4 and s[j].isdigit():
                    j += 1
                out.append(chr(int(s[i + 1:j], 8) & 0xFF))
                i = j
                continue
        out.append(c)
        i += 1
    return "".join(out)


def extract_pdf_text(doc: str) -> str:
    """Extract text from uncompressed PDF text objects; '' if none."""
    parts: list[str] = []
    for obj in _BT_ET_RE.finditer(doc):
        body = obj.group(1)
        for m in _TJ_RE.finditer(body):
            parts.append(_unescape_pdf(m.group(0).rsplit(")", 1)[0][1:]))
        for m in _TJ_ARRAY_RE.finditer(body):
            for sm in _STR_RE.finditer(m.group(1)):
                parts.append(_unescape_pdf(sm.group(0)[1:-1]))
    return " ".join(p for p in parts if p)

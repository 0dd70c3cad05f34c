"""Deterministic synthetic `pages` table generator (FIXTURES.md §1).

Modeled on the reference's procedural fixtures
(/root/reference/tests/fixtures/create_test_data.py:10-115) but upgraded
to a committed golden corpus: fixed seed, per-url keyed PRNG (hashlib,
never Python's salted hash()), no wall clock — same (n_rows, seed) =>
byte-identical table everywhere.

Schema (BASELINE.json input_hint):
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string
"""

from __future__ import annotations

import datetime
import hashlib
import random

HOSTS = [
    "megahost.example",  # designated skew host: owns ~30% of rows
    "news.example.com", "blog.example.org", "shop.example.net",
    "wiki.example.io", "forum.example.co", "docs.example.dev",
    "mail.example.info", "photo.example.biz", "video.example.tv",
    "sport.example.gg", "music.example.fm", "books.example.ly",
    "travel.example.me", "food.example.kitchen", "auto.example.cars",
    "health.example.clinic", "edu.example.academy", "gov.example.agency",
    "archive.example.museum",
]

LANGS = ["en", "uk", "ru", "de", "es", "zh"]

_WORDS = (
    "amber basket candle drift ember fable garnet harbor inlet jasper "
    "kernel lumen marble nectar opal pallet quartz ravine saddle timber "
    "umbra vessel willow xenon yonder zephyr anchor bramble cobble dapple "
    "evermore fiddle gossamer hallow ivory juniper kindle lantern meadow "
    "nimble orchard pebble quill russet sparrow thistle upland vellum wander"
).split()

# canned Cyrillic content mirroring the reference fixture sentences
# (create_test_data.py:65-79) plus lexicon names with OCR-confusion
# variants (Шевченко -> Шевчеико) to exercise fuzzy scoring
_ENTITY_SENTENCES = [
    "Андрей Моисеевич Орехов народився тут",
    "село Песчаное, Харківська губернія",
    "Тарас Шевченко писав про село Моринці",
    "пан Шевчеико прибув до міста вчора",
    "Іван Коваленко та Марія Бондаренко були присутні",
    "станція Козятин приймала потяги",
    "Олександр Ткаченко виступив з доповіддю",
    "родина Кравченко мешкала у селі Піски",
    "місто Полтава зустрічало гостей",
    "Петро Мельник і Ковальчук працювали разом",
]

_NAV_WORDS = ["Home", "About", "Products", "Contact", "Login", "Archive",
              "Tags", "Search", "Terms", "Privacy", "Sitemap", "Help"]

EPOCH = datetime.datetime(2025, 1, 1, tzinfo=datetime.timezone.utc)


def _rng_for(url: str, seed: int) -> random.Random:
    h = hashlib.sha256(f"{seed}:{url}".encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def _salad(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n_words))


def _nav_block(rng: random.Random, n_links: int = 8) -> str:
    links = "".join(
        f'<li><a href="/{w.lower()}">{w}</a></li>'
        for w in rng.sample(_NAV_WORDS, min(n_links, len(_NAV_WORDS)))
    )
    return f"<nav><ul>{links}</ul></nav>"


def _sidebar(rng: random.Random) -> str:
    links = "".join(
        f'<a href="/t/{rng.choice(_WORDS)}">{rng.choice(_WORDS)}</a> '
        for _ in range(rng.randint(6, 14))
    )
    return f'<aside><div class="tags">{links}</div></aside>'


def _paragraph(rng: random.Random, lang: str, with_entity: bool) -> str:
    n = rng.randint(25, 90)
    body = _salad(rng, n)
    if with_entity:
        sent = rng.choice(_ENTITY_SENTENCES)
        cut = rng.randint(0, n - 1)
        words = body.split()
        body = " ".join(words[:cut]) + f" {sent}. " + " ".join(words[cut:])
    if rng.random() < 0.3:
        words = body.split()
        k = rng.randint(0, len(words) - 1)
        words[k] = f'<a href="/w/{words[k]}">{words[k]}</a>'
        body = " ".join(words)
    if rng.random() < 0.2:
        body += " Tom &amp; Jerry &#1071;blok"
    return f"<p>{body}</p>"


def _standard_page(rng: random.Random, url: str, lang: str) -> bytes:
    n_paras = rng.randint(3, 12)
    paras = []
    for j in range(n_paras):
        paras.append(_paragraph(rng, lang, with_entity=(rng.random() < 0.5)))
    heading = f"<h1>{_salad(rng, rng.randint(3, 8)).title()}</h1>"
    sub = f"<h2>{_salad(rng, rng.randint(2, 6)).title()}</h2>" if rng.random() < 0.5 else ""
    noise = (
        "<!-- generated page -->"
        f"<script>var x = {rng.randint(0, 999)}; if (x<3) console.log('skip me');</script>"
        "<style>.c{color:red}</style>"
    )
    html = (
        '<!DOCTYPE html><html><head>'
        f'<meta charset="utf-8"><title>{_salad(rng, 4)}</title>{noise}</head>'
        f"<body>{_nav_block(rng)}<header><p>{_salad(rng, 5)}</p></header>"
        f"<main>{heading}{paras[0]}{sub}{''.join(paras[1:])}</main>"
        f"{_sidebar(rng)}"
        f"<footer><p>© 2025 {_salad(rng, 3)} | <a href='/terms'>Terms</a></p></footer>"
        "</body></html>"
    )
    return html.encode("utf-8")


def _malformed_page(rng: random.Random, url: str, lang: str) -> bytes:
    body = _paragraph(rng, lang, True)
    return (
        f"<html><body><div><p>{_salad(rng, 50)}"
        f"{body}<p>unclosed < stray <b>bold{_salad(rng, 30)}"
        "<div".encode("utf-8")
    )


def _pdf_like_page(rng: random.Random) -> bytes:
    texts = [_salad(rng, rng.randint(8, 20)) for _ in range(rng.randint(2, 5))]
    objs = "".join(
        f"BT /F1 12 Tf 72 {700 - 20 * i} Td ({t}) Tj ET\n" for i, t in enumerate(texts)
    )
    return (f"%PDF-1.4\n1 0 obj << /Type /Page >> endobj\nstream\n{objs}endstream\n"
            "trailer << /Root 1 0 R >>\n%%EOF").encode("latin-1")


def _binary_page(rng: random.Random) -> bytes:
    return bytes(rng.randrange(256) for _ in range(rng.randint(200, 800)))


def _mega_page(rng: random.Random, url: str, lang: str) -> bytes:
    # ~1.5-2.5 MB of repeated paragraph content (megapage-host skew leg)
    paras = [_paragraph(rng, lang, with_entity=(j % 7 == 0)) for j in range(12)]
    reps = rng.randint(60, 100)
    body = "".join(paras) * reps
    return (f'<html><head><meta charset="utf-8"></head><body>{_nav_block(rng)}'
            f"<main>{body}</main></body></html>").encode("utf-8")


def _utf16_page(rng: random.Random, url: str, lang: str, i: int) -> bytes:
    """UTF-16 page with BOM (LE for even i, BE for odd): the decode
    stage must sniff the BOM before any utf-8 attempt (round-1 fix,
    previously covered only by an inline test)."""
    paras = "".join(_paragraph(rng, lang, with_entity=(j % 2 == 0))
                    for j in range(rng.randint(2, 5)))
    body = (f'<html><head><meta charset="utf-16"></head><body>'
            f"{_nav_block(rng)}<main>{paras}</main></body></html>")
    if i % 2 == 0:
        return b"\xff\xfe" + body.encode("utf-16-le")
    return b"\xfe\xff" + body.encode("utf-16-be")


def _truncated_script_page(rng: random.Random, url: str, lang: str) -> bytes:
    """Truncated crawl: real content, then a <script> cut off mid-object
    with no closing tag — the JS must never leak into extracted text."""
    paras = "".join(_paragraph(rng, lang, with_entity=True)
                    for _ in range(rng.randint(2, 4)))
    return (f"<html><body><main>{paras}</main>"
            f"<script>var state = {{ a: {rng.randint(0, 99)}, b: [1,2,"
            ).encode("utf-8")


def _deep_nav_page(rng: random.Random, url: str, lang: str) -> bytes:
    """Boilerplate buried under deep nesting (nav>table>tr>td>p): the
    classifier's boiler-ancestor rule must still see `nav` in the
    truncated tag_path."""
    cells = "".join(
        f'<tr><td><p><a href="/{w.lower()}">{w}</a> {_salad(rng, 6)}</p></td></tr>'
        for w in rng.sample(_NAV_WORDS, 4))
    paras = "".join(_paragraph(rng, lang, with_entity=(rng.random() < 0.5))
                    for _ in range(rng.randint(2, 6)))
    return (f"<html><body><nav><table>{cells}</table></nav>"
            f"<main>{paras}</main></body></html>").encode("utf-8")


def _soup_head_page(rng: random.Random, url: str, lang: str) -> bytes:
    """Tag soup: unterminated <head>, no <body> tag, real content after —
    the structural parse swallows everything, so the page must surface
    via the tolerant/chunk fallback (round-1 ADVICE finding)."""
    return (f"<html><head><title>{_salad(rng, 4)}</title>"
            f"<p>{_salad(rng, rng.randint(40, 90))}</p>"
            f"<p>{_salad(rng, rng.randint(20, 50))}</p>").encode("utf-8")


def _pdf_flate_page(rng: random.Random) -> bytes:
    """Flate-compressed PDF (round 5): a well-formed mini PDF whose
    content stream is zlib-deflated — the layout that dominates real
    crawls.  Exercises the latin-1 shadow -> inflate -> BT/ET pass
    through the ENTIRE pipeline (decode, segment, classify, render,
    golden corpus), not just the pdfmini unit seam."""
    from .spec.pdfmini import build_fixture_pdf
    texts = [_salad(rng, rng.randint(8, 20))
             for _ in range(rng.randint(2, 5))]
    return build_fixture_pdf(texts, compress=True)


def _pdf_variant_page(rng: random.Random) -> bytes:
    """PDF seam variants beyond the plain-Tj corpus: TJ arrays with
    kerning numbers, escaped parens/octal in literals, 'ET' inside a
    string — the pdfmini edge cases previously pinned only by unit
    tests."""
    t1, t2, t3 = (_salad(rng, rng.randint(4, 9)) for _ in range(3))
    objs = (
        f"BT /F1 12 Tf 72 700 Td [({t1}) -250 (NET {t2})] TJ ET\n"
        f"BT (par\\(en\\) \\101 {t3}) Tj ET\n"
        f"BT [({_salad(rng, 3)})] TJ ET\n"
    )
    return (f"%PDF-1.4\n1 0 obj << /Type /Page >> endobj\nstream\n{objs}endstream\n"
            "trailer << /Root 1 0 R >>\n%%EOF").encode("latin-1")


def page_row(i: int, seed: int = 42) -> dict:
    """Generate row i of the pages table. Pure function of (i, seed)."""
    host = HOSTS[0] if i % 10 < 3 else HOSTS[1 + (i % 19)]
    url = f"https://{host}/{'abcdefgh'[i % 8]}/{i:06d}.html"
    rng = _rng_for(url, seed)
    lang = LANGS[i % len(LANGS)]
    warc_ts = EPOCH + datetime.timedelta(seconds=i * 137)

    if i % 97 == 0:
        html = b"<html><body></body></html>"
    elif i % 89 == 3:
        html = _malformed_page(rng, url, lang)
    elif i % 83 == 5:
        html = _binary_page(rng)
    elif i % 79 == 7:
        html = _pdf_like_page(rng)
    elif host == HOSTS[0] and i % 149 == 11:
        html = _mega_page(rng, url, lang)
    elif i % 101 == 13:
        html = _utf16_page(rng, url, lang, i)
    elif i % 103 == 17:
        html = _truncated_script_page(rng, url, lang)
    elif i % 107 == 19:
        html = _deep_nav_page(rng, url, lang)
    elif i % 109 == 23:
        html = _soup_head_page(rng, url, lang)
    elif i % 113 == 29:
        html = _pdf_variant_page(rng)
    elif i % 127 == 31:
        html = _pdf_flate_page(rng)
    else:
        html = _standard_page(rng, url, lang)

    # crawl-style naive text column (untrusted by the engine); NULL sometimes
    if i % 13 == 1:
        text = None
    else:
        import re as _re
        from html import unescape as _unescape
        shadow = html.decode("utf-8", errors="replace")
        text = _re.sub(r"\s+", " ", _unescape(_re.sub(r"<[^>]*>", " ", shadow))).strip()[:5000]

    return {"url": url, "warc_ts": warc_ts, "html": html, "text": text, "lang": lang}


def gen_pages(n_rows: int, seed: int = 42):
    for i in range(n_rows):
        yield page_row(i, seed)


def build_pages_pandas(n_rows: int, seed: int = 42):
    import pandas as pd
    df = pd.DataFrame(list(gen_pages(n_rows, seed)))
    df["warc_ts"] = pd.to_datetime(df["warc_ts"], utc=True).dt.tz_localize(None)
    return df


def write_pages_parquet(path: str, n_rows: int, seed: int = 42) -> str:
    """Write the pages table as parquet; returns path."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    df = build_pages_pandas(n_rows, seed)
    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ])
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(table, path)
    return path

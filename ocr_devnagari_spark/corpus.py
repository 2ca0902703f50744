"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md F1).

Generates the ``pages(url, warc_ts, html BINARY, text, lang)`` input table —
exactly BASELINE.json ``input_hint`` — plus generation-side ground truth
(``expected_text``, ``expected_route``, ``adversarial``) used by the tests.

Properties (FIXTURES.md F1):

- hosts drawn from a heavy-tailed (Zipf) distribution so host-salting is
  exercised; a few hot hosts own a large share of rows;
- html sizes heavy-tailed (log-normal-ish paragraph counts) so size-tiered
  repartitioning is exercised;
- ~7% PDF-like binary payloads (F1b) driving the layout branch;
- critical-content spans (``<pre>/<code>``, tables, verse-marker tokens —
  the analog of the reference's mantra detector,
  ``backends/mantra_detector.py:133-238``) that must route to the precise
  path;
- adversarial cases: empty body, boilerplate-only, unclosed tags, sub-20-char
  text (the reference's MIN_VALID_LENGTH floor, ``gemini_backend.py:115``).

Everything is seeded per-document (``random.Random(f"page-{doc_id}")``) so any
row can be regenerated independently — generation itself is embarrassingly
parallel and deterministic, and NO wall-clock ever enters the payload (the
reference leaks ``datetime.now`` into output headers at ``processor.py:361``;
we deliberately do not).
"""

from __future__ import annotations

import json
import os
import random
import re
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

# ---------------------------------------------------------------------------
# Vocabulary — small per-language word lists so the language-ID heuristic has
# signal. Deterministic, ASCII/Unicode literals only.
# ---------------------------------------------------------------------------

WORDS = {
    "en": ("the quick brown fox jumps over lazy dog river mountain valley "
           "history culture science method result people market system world "
           "water light music change question answer between through because "
           "government development information structure analysis").split(),
    "de": ("der die das und nicht mit sich auf für wird einen durch zwischen "
           "entwicklung geschichte wissenschaft ergebnis menschen markt system "
           "wasser licht musik frage antwort regierung struktur analyse "
           "gesellschaft beispiel zeit jahr welt leben arbeit stadt land").split(),
    "fr": ("le la les des une dans pour avec sur par entre histoire culture "
           "science méthode résultat gens marché système monde eau lumière "
           "musique question réponse gouvernement développement structure "
           "analyse société exemple temps année vie travail ville pays").split(),
    "es": ("el la los las una en para con sobre por entre historia cultura "
           "ciencia método resultado gente mercado sistema mundo agua luz "
           "música pregunta respuesta gobierno desarrollo estructura análisis "
           "sociedad ejemplo tiempo año vida trabajo ciudad país").split(),
    "hi": ("और का की के में से है यह वह पर एक नहीं इतिहास संस्कृति विज्ञान "
           "परिणाम लोग बाजार प्रणाली दुनिया पानी प्रकाश संगीत प्रश्न उत्तर "
           "सरकार विकास संरचना विश्लेषण समाज उदाहरण समय वर्ष जीवन काम").split(),
    "zh": list("的一是在不了有和人这中大为上个国我以要他时来用们生到作地于出就分对成会可主发年动"),
}

LANGS = ["en", "de", "fr", "es", "hi", "zh"]
LANG_WEIGHTS = [0.55, 0.12, 0.10, 0.09, 0.08, 0.06]

NAV_WORDS = ("home about contact news products blog login register search "
             "archive category sitemap privacy terms help faq careers press").split()

AD_SNIPPETS = [
    "Buy now! Limited offer.",
    "Subscribe to our newsletter today",
    "Sponsored content click here",
    "Best deals of the season",
    "Download our app free",
]

# Verse-marker-like critical tokens (the mantra-detector analog: the
# reference scores ``॥ N ॥`` numbered-verse patterns, mantra_detector.py:121).
VERSE_TOKENS = ["॥ {} ॥", "ॐ", "श्लोक {}"]

PDF_MAGIC = b"FPDF1\n"
BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)

# matches '<p', '</div', '<SCRIPT' … (tag-open + name only, attrs untouched)
_TAGNAME_RE = re.compile(r"</?[a-zA-Z][a-zA-Z0-9]*")

N_HOSTS = 400


def _host(rng: random.Random) -> str:
    # Zipf-like: rank ~ floor(pareto) — host 0 and 1 own a large share.
    rank = int(rng.paretovariate(0.7)) - 1
    rank = min(rank, N_HOSTS - 1)
    return f"site{rank:04d}.example.org"


def _sentence(rng: random.Random, words: list, lo: int = 5, hi: int = 14) -> str:
    n = rng.randint(lo, hi)
    toks = [rng.choice(words) for _ in range(n)]
    s = " ".join(toks)
    return s[0].upper() + s[1:] + "."


def _paragraph(rng: random.Random, words: list, lo: int = 2, hi: int = 6) -> str:
    return " ".join(_sentence(rng, words) for _ in range(rng.randint(lo, hi)))


# ---------------------------------------------------------------------------
# HTML assembly. Boilerplate blocks are constructed to be *recognizably*
# boilerplate (high link density, or inside nav/header/footer/aside, or in a
# drop-listed class), main content to be recognizably content (low link
# density, real text). The generator records the canonical expected main text
# so the extractor is tested against ground truth, not merely against itself.
# ---------------------------------------------------------------------------

def _canon(s: str) -> str:
    """Canonical whitespace: collapse runs to single space, strip."""
    return " ".join(s.split())


def _nav_html(rng: random.Random) -> str:
    items = "".join(
        f'<li><a href="/{w}">{w}</a></li>' for w in rng.sample(NAV_WORDS, 8))
    return f"<nav><ul>{items}</ul></nav>"


def _header_html(rng: random.Random, words: list) -> str:
    return ("<header><h1><a href='/'>%s</a></h1>%s</header>"
            % (_canon(_sentence(rng, words, 2, 4)), _nav_html(rng)))


def _footer_html(rng: random.Random) -> str:
    links = " | ".join(f'<a href="/{w}">{w}</a>' for w in rng.sample(NAV_WORDS, 6))
    return f"<footer><p>{links}</p><p>© example.org — all rights reserved</p></footer>"


def _sidebar_html(rng: random.Random, words: list) -> str:
    items = "".join(
        f'<li><a href="/p/{i}">{_canon(_sentence(rng, words, 3, 6))}</a></li>'
        for i in range(rng.randint(3, 8)))
    return f'<aside class="sidebar"><h3>related</h3><ul>{items}</ul></aside>'


def _ad_html(rng: random.Random) -> str:
    return ('<div class="ad-banner"><a href="https://ads.example/click">%s</a></div>'
            % rng.choice(AD_SNIPPETS))


def _comments_html(rng: random.Random, words: list) -> str:
    cs = "".join(
        f"<div><b>user{rng.randint(1, 999)}</b><p>{_paragraph(rng, words, 1, 2)}</p>"
        f'<a href="/reply">reply</a></div>'
        for _ in range(rng.randint(2, 5)))
    return f'<section class="comments"><h3>comments</h3>{cs}</section>'


def _cookie_html() -> str:
    return ('<div class="cookie-banner">We use cookies. '
            '<a href="/accept">Accept</a> <a href="/decline">Decline</a></div>')


def gen_html_doc(doc_id: int, rng: random.Random, lang: str) -> dict:
    """Build one HTML document. Returns html bytes + ground truth."""
    words = WORDS[lang]
    kind_roll = rng.random()
    adversarial = None
    critical = False

    main_blocks = []       # canonical texts of main-content blocks, in order
    body_parts = []

    body_parts.append(_cookie_html())
    body_parts.append(_header_html(rng, words))
    if rng.random() < 0.6:
        body_parts.append(_sidebar_html(rng, words))
    if rng.random() < 0.5:
        body_parts.append(_ad_html(rng))

    if kind_roll < 0.01:                       # empty body
        adversarial = "empty"
        body_parts = []
    elif kind_roll < 0.03:                     # boilerplate-only page
        adversarial = "boilerplate_only"
    elif kind_roll < 0.04:                     # tiny main text (<20 chars)
        adversarial = "tiny"
        tiny = rng.choice(words)[:12]
        main_blocks.append(_canon(tiny))
        body_parts.append(f"<article><p>{tiny}</p></article>")
    else:
        # Normal article: heading + log-normal-ish paragraph count.
        n_paras = max(1, min(60, int(rng.lognormvariate(1.6, 0.9))))
        art = ["<article>"]
        title = _canon(_sentence(rng, words, 3, 7))
        art.append(f"<h2>{title}</h2>")
        main_blocks.append(title)
        for i in range(n_paras):
            para = _paragraph(rng, words)
            para_html = para
            # Occasional HTML entities (extractor must decode them).
            if rng.random() < 0.10:
                para_html += " Q&amp;A &lt;notes&gt; included."
                para += " Q&A <notes> included."
            # Occasional inline link inside content (low link density).
            if rng.random() < 0.25:
                w = rng.choice(words)
                para_html += f' See <a href="/ref/{i}">{w}</a> for details.'
                para += f" See {w} for details."
            art.append(f"<p>{para_html}</p>")
            main_blocks.append(_canon(para))
            if rng.random() < 0.08:
                sub = _canon(_sentence(rng, words, 2, 5))
                art.append(f"<h3>{sub}</h3>")
                main_blocks.append(sub)
        # Critical content spans (~12% of normal docs): code / table / verse.
        if rng.random() < 0.12:
            critical = True
            c_roll = rng.random()
            if c_roll < 0.4:
                code = "def f_%d(x):\n    return x * %d" % (
                    doc_id % 97, rng.randint(2, 9))
                art.append(f"<pre><code>{code}</code></pre>")
                main_blocks.append(_canon(code))
            elif c_roll < 0.7:
                rows = []
                for r in range(rng.randint(2, 4)):
                    cells = [str(rng.randint(100, 9999)) for _ in range(3)]
                    rows.append("<tr>" + "".join(
                        f"<td>{c}</td>" for c in cells) + "</tr>")
                    main_blocks.extend(_canon(c) for c in cells)
                art.append("<table>" + "".join(rows) + "</table>")
            else:
                verse = VERSE_TOKENS[0].format(rng.randint(1, 108))
                line = f"{VERSE_TOKENS[1]} {_sentence(rng, words, 4, 8)} {verse}"
                art.append(f"<p>{line}</p>")
                main_blocks.append(_canon(line))
        art.append("</article>")
        body_parts.append("".join(art))

    if rng.random() < 0.5 and adversarial != "empty":
        body_parts.append(_ad_html(rng))
    if rng.random() < 0.4 and adversarial != "empty":
        body_parts.append(_comments_html(rng, words))
    if adversarial != "empty":
        body_parts.append(_footer_html(rng))

    body = "".join(body_parts)
    if adversarial is None and rng.random() < 0.03:
        adversarial = "unclosed"
        body = body.replace("</p>", "", 2)      # drop two closing tags

    html = (f'<!DOCTYPE html><html lang="{lang}"><head>'
            f"<title>doc {doc_id}</title>"
            f'<script>var x={doc_id}; if (x < 99 && x > 1) {{ x = 0; }}'
            f"</script>"
            f'<style>.ad-banner{{color:red}}</style>'
            f"</head><body>{body}</body></html>")
    # ~10% of docs carry UPPERCASE tag names (real crawl HTML does; the
    # extractor must normalize — regression class of the </SCRIPT> bug).
    if rng.random() < 0.10:
        html = _TAGNAME_RE.sub(lambda m: m.group(0).upper(), html)

    expected = "\n".join(b for b in main_blocks if b)
    return {
        "html": html.encode("utf-8"),
        "expected_text": expected,
        "adversarial": adversarial,
        "critical": critical,
        "is_pdf": False,
    }


# ---------------------------------------------------------------------------
# PDF-like payload (FIXTURES.md F1b): deterministic container with per-block
# (x, y, w, h, col) coordinates in 1-3 columns, physical order shuffled.
# Correct reading order requires column detection (left→right) then top→down.
# ---------------------------------------------------------------------------

def gen_pdf_doc(doc_id: int, rng: random.Random, lang: str) -> dict:
    words = WORDS[lang]
    n_pages = rng.randint(1, 3)
    n_cols = rng.randint(1, 3)
    col_x = [60 + c * 320 for c in range(n_cols)]
    pages = []
    expected_lines = []
    for p in range(1, n_pages + 1):
        blocks = []
        for c in range(n_cols):
            y = 40
            for _ in range(rng.randint(2, 6)):
                text = _canon(_sentence(rng, words, 4, 10))
                h = rng.randint(14, 40)
                blocks.append({
                    "x": col_x[c] + rng.randint(-8, 8),
                    "y": y, "w": 300, "h": h, "text": text,
                })
                y += h + rng.randint(4, 12)
        # expected reading order: columns left→right, then top→down
        ordered = sorted(blocks, key=lambda b: (b["x"] // 160, b["y"]))
        expected_lines.extend(b["text"] for b in ordered)
        rng.shuffle(blocks)                     # physical order is shuffled
        pages.append({"page": p, "blocks": blocks})
    payload = PDF_MAGIC + json.dumps(
        {"pages": pages}, ensure_ascii=False, sort_keys=True).encode("utf-8")
    return {
        "html": payload,
        "expected_text": "\n".join(expected_lines),
        "adversarial": None,
        "critical": False,
        "is_pdf": True,
    }


# ---------------------------------------------------------------------------
# Row assembly + parquet writer
# ---------------------------------------------------------------------------

def gen_page(doc_id: int) -> dict:
    """Generate one page row + ground truth. Pure & independently callable."""
    rng = random.Random(f"page-{doc_id}")
    lang = rng.choices(LANGS, weights=LANG_WEIGHTS, k=1)[0]
    host = _host(rng)
    is_pdf = rng.random() < 0.07
    doc = gen_pdf_doc(doc_id, rng, lang) if is_pdf else gen_html_doc(
        doc_id, rng, lang)
    ext = "pdf" if is_pdf else "html"
    url = f"https://{host}/{lang}/a/{doc_id:012d}.{ext}"
    warc_ts = BASE_TS + timedelta(seconds=rng.randint(0, 300 * 86400))
    # WET-flavour raw text dump (pre-extraction): naive tag strip — NOT the
    # target output; mirrors Common-Crawl's text column.
    if is_pdf:
        raw_text = doc["expected_text"]
    else:
        raw_text = _canon(re.sub(
            r"<script.*?</script>|<style.*?</style>|<[^>]+>", " ",
            doc["html"].decode("utf-8"), flags=re.S | re.I))
    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": doc["html"],
        "text": raw_text,
        "lang": lang,
        # ground-truth columns (test-only; stripped from the engine input)
        "expected_text": doc["expected_text"],
        "adversarial": doc["adversarial"],
        "critical": doc["critical"],
        "is_pdf": doc["is_pdf"],
    }


PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us", tz="UTC")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

TRUTH_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("expected_text", pa.string()),
    ("adversarial", pa.string()),
    ("critical", pa.bool_()),
    ("is_pdf", pa.bool_()),
])


def _write_range(pages_path: str, truth_path: str, start: int, end: int,
                 row_group: int = 2000) -> int:
    """Write doc ids [start, end) — per-doc seeding makes any range
    independently generatable, so generation is embarrassingly parallel."""
    pw = pq.ParquetWriter(pages_path, PAGES_SCHEMA, compression="zstd")
    tw = pq.ParquetWriter(truth_path, TRUTH_SCHEMA, compression="zstd")
    batch_pages: list = []
    batch_truth: list = []

    def flush():
        if not batch_pages:
            return
        pw.write_table(pa.Table.from_pylist(batch_pages, schema=PAGES_SCHEMA))
        tw.write_table(pa.Table.from_pylist(batch_truth, schema=TRUTH_SCHEMA))
        batch_pages.clear()
        batch_truth.clear()

    for i in range(start, end):
        row = gen_page(i)
        batch_pages.append({k: row[k] for k in
                            ("url", "warc_ts", "html", "text", "lang")})
        batch_truth.append({k: row[k] for k in
                            ("url", "expected_text", "adversarial",
                             "critical", "is_pdf")})
        if len(batch_pages) >= row_group:
            flush()
    flush()
    pw.close()
    tw.close()
    return end - start


def write_corpus(out_dir: str, n_docs: int, row_group: int = 2000,
                 workers: int | None = None) -> str:
    """Write pages.parquet + truth.parquet (file for small corpora, a
    directory of part files when generated in parallel — both readable by
    ``spark.read.parquet`` and ``pyarrow.dataset``).

    Idempotent: skips if already generated with the same doc count.
    """
    marker = os.path.join(out_dir, f"_done_{n_docs}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    pages_path = os.path.join(out_dir, "pages.parquet")
    truth_path = os.path.join(out_dir, "truth.parquet")
    if workers is None:
        workers = min(os.cpu_count() or 1, 16) if n_docs >= 5000 else 1
    if workers <= 1:
        _write_range(pages_path, truth_path, 0, n_docs, row_group)
    else:
        from concurrent.futures import ProcessPoolExecutor
        os.makedirs(pages_path, exist_ok=True)
        os.makedirs(truth_path, exist_ok=True)
        n_chunks = workers * 2
        step = (n_docs + n_chunks - 1) // n_chunks
        jobs = []
        with ProcessPoolExecutor(max_workers=workers) as ex:
            for c, s in enumerate(range(0, n_docs, step)):
                e = min(s + step, n_docs)
                jobs.append(ex.submit(
                    _write_range,
                    os.path.join(pages_path, f"part-{c:04d}.parquet"),
                    os.path.join(truth_path, f"part-{c:04d}.parquet"),
                    s, e, row_group))
            assert sum(j.result() for j in jobs) == n_docs
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def corpus_dir_for_sf(sf: float, base: str = "/tmp/ocrds_corpus") -> str:
    """sf → doc count matching FIXTURES.md (500 / 5k / 50k)."""
    n = max(100, int(500_000 * sf))
    d = os.path.join(base, f"sf{sf}")
    return write_corpus(d, n)


def n_docs_for_sf(sf: float) -> int:
    return max(100, int(500_000 * sf))


if __name__ == "__main__":
    import sys
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.001
    d = corpus_dir_for_sf(sf)
    print(d, n_docs_for_sf(sf))

"""WARC-sourced adversarial extraction goldens (round-5, VERDICT r4 ask #4).

A deterministic synthetic WARC of adversarial pages — charset edge cases,
entity pathology, tokenizer CDATA/comment/textarea semantics — flows
through the REAL ingestion path (write_warc -> ray read_warc ->
map_batches(extract_text_and_links)) and must land byte-identical to
goldens derived BY HAND from the public semantics the reference relies on
(bs4 get_text('\n', strip=True) over CPython html.parser with
convert_charrefs=True; reference nlp.py:90-99).  None of the expected
strings below were produced by the extractor under test: each cites the
tokenizer/charset rule it pins, and the trickier tokenizer event streams
(textarea, unterminated comment, script CDATA mode, out-of-range numeric
refs) were derived from a bare stdlib HTMLParser event probe, independent
of functions/html_text.py.

If beautifulsoup4 ever becomes installable, test_bs4_parity_when_available
lights up automatically and replays every golden (plus the inline CASES
table from test_html_fixtures.py) against the real library.
"""

from __future__ import annotations

import codecs
from datetime import datetime, timezone

import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _ts(i: int) -> datetime:
    return datetime(2025, 3, 1, 12, 0, i, tzinfo=timezone.utc)


# (name, raw_html_bytes, expected_text, expected_links)
GOLDEN_PAGES = [
    # --- charset layer (BOM > meta > utf-8 > cp1252, BOM consumed) ---
    ("utf8_bom",
     codecs.BOM_UTF8 + "<p>ünïcødé tëxt</p>".encode("utf-8"),
     "ünïcødé tëxt", []),
    ("utf16_be_bom",
     codecs.BOM_UTF16_BE + "<p>utf16 works</p>".encode("utf-16-be"),
     "utf16 works", []),
    ("http_equiv_latin1",
     b'<meta http-equiv="Content-Type" content="text/html; '
     b'charset=iso-8859-1"><p>r\xe9sum\xe9</p>',
     "r\xe9sum\xe9", []),
    ("bad_declared_charset_falls_to_utf8",
     '<meta charset="x-invalid-enc"><p>café</p>'.encode("utf-8"),
     "café", []),
    ("invalid_utf8_falls_to_cp1252",
     b"<p>he said \x93hi\x94 \x97 and left</p>",
     "he said “hi” — and left", []),
    ("first_meta_declaration_wins",
     '<meta charset="utf-8"><meta charset="iso-8859-1"><p>é ok</p>'.encode(),
     "é ok", []),
    # --- entity layer (html.unescape semantics via convert_charrefs) ---
    ("entity_in_attr_not_double_counted",
     b'<a href="?a=1&amp;b=2">x &amp; y</a>',
     "x & y", ["?a=1&b=2"]),
    ("tab_numeric_ref_survives_strip",
     b"<p>a&#9;b</p>",
     "a\tb", []),
    ("double_escaped_amp_single_unescape",
     b"<p>&amp;amp;</p>",
     "&amp;", []),
    ("long_html5_named_entity",
     "<p>&CounterClockwiseContourIntegral;</p>".encode(),
     "∳", []),
    ("out_of_range_numeric_ref_replacement",
     b"<p>&#x110000; z</p>",
     "� z", []),
    # --- tokenizer structure (stdlib event-stream probes, hand-checked) ---
    ("textarea_is_not_cdata_in_html_parser",
     b"<textarea><not-a-tag></textarea>done",
     "done", []),
    ("script_cdata_mode_keeps_fake_close_tags",
     b"<script>var a = \"</p>\" + '<div>';</script>after",
     "var a = \"</p>\" + '<div>';\nafter", []),
    ("unterminated_comment_becomes_merged_data",
     b"before<!-- never closed",
     "before<!-- never closed", []),
    ("pre_internal_whitespace_kept",
     b"<pre>line1\n  line2</pre>",
     "line1\n  line2", []),
    ("quoted_lt_inside_attr",
     b'<img alt="a<b" src=x>tail',
     "tail", []),
    ("links_in_document_order",
     b"<p>pre <a href='/x'>anchor</a> <a href=abs://h/y>t</a></p>",
     "pre\nanchor\nt", ["/x", "abs://h/y"]),
]


@pytest.fixture(scope="module")
def warc_path(tmp_path_factory):
    from webcrawl_lowres_lang_ray.sources.warc import write_warc

    path = str(tmp_path_factory.mktemp("goldens") / "adversarial.warc")
    rows = [
        {"url": f"http://fixtures.test/{name}", "warc_ts": _ts(i), "html": raw}
        for i, (name, raw, _t, _l) in enumerate(GOLDEN_PAGES)
    ]
    assert write_warc(path, rows) == len(GOLDEN_PAGES)
    return path


def _extract_via_ray(warc_path: str) -> pd.DataFrame:
    """The real ingestion pipeline: WARC datasource -> map_batches over the
    fused extractor (the same kernel the crawl's fetch/score stage runs)."""
    from webcrawl_lowres_lang_ray.functions.html_text import (
        extract_text_and_links,
    )
    from webcrawl_lowres_lang_ray.sources.warc import read_warc

    def extract(b: pd.DataFrame) -> pd.DataFrame:
        texts, links = [], []
        for h in b["html"]:
            t, ls = extract_text_and_links(bytes(h))
            texts.append(t)
            links.append("\x00".join(ls))
        return pd.DataFrame({"url": b["url"], "text": texts, "links": links})

    return (
        read_warc(warc_path)
        .map_batches(extract, batch_format="pandas")
        .to_pandas()
        .set_index("url")
    )


def test_warc_ingested_pages_match_hand_goldens(warc_path):
    got = _extract_via_ray(warc_path)
    assert len(got) == len(GOLDEN_PAGES)
    for name, _raw, want_text, want_links in GOLDEN_PAGES:
        url = f"http://fixtures.test/{name}"
        assert got.loc[url, "text"] == want_text, name
        got_links = got.loc[url, "links"].split("\x00") if got.loc[url, "links"] else []
        assert got_links == want_links, name


def test_gzipped_warc_same_goldens(warc_path, tmp_path):
    import gzip

    from webcrawl_lowres_lang_ray.sources.warc import iter_warc_records

    gz = str(tmp_path / "adversarial.warc.gz")
    # re-wrap the plain archive as one gzip member per record (CC layout)
    with open(warc_path, "rb") as f:
        recs = list(iter_warc_records(f))
    from webcrawl_lowres_lang_ray.sources.warc import write_warc

    assert write_warc(gz, recs) == len(GOLDEN_PAGES)
    with gzip.open(gz, "rb") as f:  # sanity: first member round-trips
        assert f.read(4) == b"WARC"
    got = _extract_via_ray(gz)
    for name, _raw, want_text, _links in GOLDEN_PAGES:
        assert got.loc[f"http://fixtures.test/{name}", "text"] == want_text, name


def test_bs4_parity_when_available():
    """Import-guarded A/B against the REAL library the reference uses.
    Skipped in this sandbox (bs4 not installable); the assertion bodies are
    live so the parity check runs automatically wherever bs4 exists."""
    bs4 = pytest.importorskip("bs4")

    from webcrawl_lowres_lang_ray.functions.html_text import (
        decode_html,
        html_to_text,
    )
    from tests.test_html_fixtures import CASES

    for name, raw, want_text, _links in GOLDEN_PAGES:
        decoded = decode_html(raw)
        real = bs4.BeautifulSoup(decoded, "html.parser").get_text("\n", strip=True)
        assert real == want_text == html_to_text(decoded), name
    for name, html, want in CASES:
        real = bs4.BeautifulSoup(html, "html.parser").get_text("\n", strip=True)
        assert real == want == html_to_text(html), name

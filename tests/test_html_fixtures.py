"""Adversarial-HTML golden fixtures for the bs4 get_text stand-in.

The reference extracts with
``bs4.BeautifulSoup(f, 'html.parser').get_text(separator="\\n", strip=True)``
(reference nlp.py:90-99).  beautifulsoup4 is not installable in this
environment, so the expected outputs below are derived BY HAND from the
public, deterministic semantics of that call: CPython's ``html.parser``
tokenizer (the same tokenizer bs4's html.parser tree builder wraps,
``convert_charrefs=True``) plus bs4's string rules — adjacent data events
buffer into one NavigableString; comments / <!DOCTYPE> / <?pi?> /
Declarations are excluded from get_text; CDATA content is included; strip
drops whitespace-only strings.  Each case cites the tokenizer behavior it
pins.  If a real bs4 becomes available, this table is directly replayable
against it: ``BeautifulSoup(html, 'html.parser').get_text('\\n', True)``.
"""

from __future__ import annotations

import pytest

from webcrawl_lowres_lang_ray.functions.html_text import (
    extract_links,
    extract_text_from_html_bytes,
    html_to_text,
)

# (name, html, expected get_text("\n", strip=True))
CASES = [
    ("simple_nesting",
     "<html><body><p>Hello <b>world</b></p></body></html>",
     "Hello\nworld"),
    ("unclosed_p_tags",
     "<p>one<p>two<p>three",
     "one\ntwo\nthree"),
    ("misnested_inline",
     "<b>bold <i>both</b> ital</i> plain",
     "bold\nboth\nital\nplain"),
    ("self_closing_br",
     "a<br/>b<br />c",
     "a\nb\nc"),
    ("void_img_between_text",
     "x<img src='u.png'/>y",
     "x\ny"),
    # tokenizer: a bare '<' not starting a tag is emitted as its own data
    # event; bs4 merges consecutive data events into ONE string
    ("bare_lt_merges",
     "<p>a < b and c > d</p>",
     "a < b and c > d"),
    ("bare_lt_at_end",
     "price<7",
     "price<7"),
    # CDATA -> unknown_decl('CDATA[...') -> CData string, included
    ("cdata_included",
     "x<![CDATA[raw <stuff> &amp; more]]>y",
     "x\nraw <stuff> &amp; more\ny"),
    # non-CDATA marked/unknown declarations are Declarations: excluded
    ("doctype_comment_pi_excluded",
     "<!DOCTYPE html><!-- secret --><?php echo 1 ?>visible",
     "visible"),
    ("entities_converted",
     "<p>&lt;tag&gt; &amp; &#65;&#x42;</p>",
     "<tag> & AB"),
    # html.unescape matches the longest valid named-reference PREFIX even
    # without a semicolon: '&not' is a legacy entity, so this is NOT left
    # alone (a hand-written stand-in that only replaced '&name;' would
    # diverge from bs4 here)
    ("entity_prefix_match",
     "<p>&notarealentityxyz; stays</p>",
     "¬arealentityxyz; stays"),
    # script/style contents ARE text in bs4.get_text()
    ("script_style_contribute",
     "<style>p { color: red }</style><script>if (a<b) x();</script><p>t</p>",
     "p { color: red }\nif (a<b) x();\nt"),
    ("quoted_gt_in_attr",
     "<a href=\"x>y\" title='p>q'>link</a>",
     "link"),
    ("uppercase_tags",
     "<P>a</P><DIV>b</DIV>",
     "a\nb"),
    ("whitespace_only_nodes_dropped",
     "<div>\n   \n<p>  spaced  </p>\n \t </div>",
     "spaced"),
    ("adjacent_text_one_string",
     "a<!-- c -->b",
     "a\nb"),
    ("nested_tables",
     "<table><tr><td>r1c1</td><td>r1c2</td></tr><tr><td>r2</td></tr></table>",
     "r1c1\nr1c2\nr2"),
    ("trailing_unclosed_text",
     "<p>tail",
     "tail"),
    ("empty_document", "", ""),
    ("only_markup", "<div><span></span></div><!-- x -->", ""),
]


@pytest.mark.parametrize("name,html,want", CASES, ids=[c[0] for c in CASES])
def test_get_text_semantics(name, html, want):
    assert html_to_text(html) == want


class TestCharsetPaths:
    def test_meta_charset_latin1(self):
        body = "<meta charset=\"iso-8859-1\"><p>caf\xe9</p>".encode("latin-1")
        assert extract_text_from_html_bytes(body) == "caf\xe9"

    def test_utf8_default(self):
        assert extract_text_from_html_bytes("<p>héllo</p>".encode()) == "héllo"

    def test_bom_utf16(self):
        import codecs

        data = codecs.BOM_UTF16_LE + "<p>bom</p>".encode("utf-16-le")
        assert extract_text_from_html_bytes(data) == "bom"

    def test_invalid_utf8_falls_back_cp1252(self):
        # 0x92 is cp1252 right single quote, invalid as UTF-8 lead byte
        assert extract_text_from_html_bytes(b"<p>don\x92t</p>") == "don’t"


class TestLinksStillExtracted:
    def test_links_document_order(self):
        html = "<a href='/a'>1</a><p><a href=\"http://h/b\">2</a></p><a name=x>3</a>"
        assert extract_links(html) == ["/a", "http://h/b"]


class TestFusedExtractor:
    @pytest.mark.parametrize("name,html,want", CASES, ids=[c[0] for c in CASES])
    def test_fused_equals_separate_on_adversarial_cases(self, name, html, want):
        from webcrawl_lowres_lang_ray.functions.html_text import (
            decode_html,
            extract_text_and_links,
        )

        data = html.encode()
        text, links = extract_text_and_links(data)
        assert text == want == html_to_text(html)
        assert links == extract_links(decode_html(data))

    def test_fused_links_and_text_together(self):
        from webcrawl_lowres_lang_ray.functions.html_text import extract_text_and_links

        html = b"<p>pre <a href='/x'>anchor text</a> post</p><a href='u2'>t2</a>"
        text, links = extract_text_and_links(html)
        assert text == "pre\nanchor text\npost\nt2"
        assert links == ["/x", "u2"]

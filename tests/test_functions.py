"""Unit tests for the stateless function library (SURVEY.md §2.2, §2.8)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from webcrawl_lowres_lang_ray.functions import hashing, termdist, textnorm, tokenize, urltools
from webcrawl_lowres_lang_ray.functions.html_text import (
    decode_html,
    detect_charset,
    extract_links,
    extract_text_from_html_bytes,
    html_to_text,
)


# ---------------------------------------------------------------- html_text
class TestHtmlText:
    def test_basic_get_text_semantics(self):
        html = "<html><body><p>Hello</p><p> World </p></body></html>"
        assert html_to_text(html) == "Hello\nWorld"

    def test_comments_excluded_scripts_included(self):
        html = "<p>a</p><!-- nope --><script>var x;</script><p>b</p>"
        assert html_to_text(html) == "a\nvar x;\nb"

    def test_entities_converted(self):
        assert html_to_text("<p>a &amp; b&nbsp;c</p>") == "a & b\xa0c"

    def test_whitespace_only_nodes_dropped(self):
        assert html_to_text("<div>  \n\t </div><p>x</p>") == "x"

    def test_charset_meta_latin1(self):
        html = '<html><head><meta charset="iso-8859-1"></head><body>caf\xe9</body></html>'
        data = html.encode("iso-8859-1")
        assert detect_charset(data) == "iso-8859-1"
        assert "café" in extract_text_from_html_bytes(data)

    def test_charset_utf8_default(self):
        data = "<p>kākā</p>".encode("utf-8")
        assert detect_charset(data) == "utf-8"
        assert extract_text_from_html_bytes(data) == "kākā"

    def test_bom(self):
        data = b"\xef\xbb\xbf<p>hi</p>"
        assert detect_charset(data) == "utf-8-sig"
        assert extract_text_from_html_bytes(data) == "hi"

    def test_empty(self):
        assert extract_text_from_html_bytes(b"") == ""

    def test_extract_links_document_order(self):
        html = '<a href="u1">x</a><div><a href="u2"></a></div><a name="no"></a><a href="u3">'
        assert extract_links(html) == ["u1", "u2", "u3"]


# ---------------------------------------------------------------- textnorm
class TestTextNorm:
    def test_clean_text_collapses_3plus_newlines(self):
        # reference nlp.py:67-70
        assert textnorm.clean_text("a\n\n\n\nb") == "a\n\nb"
        assert textnorm.clean_text("a\n\nb") == "a\n\nb"

    def test_text_to_clean_paras(self):
        # reference nlp.py:72-87: blank-line runs split paras; strip edges
        text = "  one two \n\n\nthree\n   \nfour  "
        assert textnorm.text_to_clean_paras(text) == ["one two", "three", "four"]

    def test_convert_text_to_paras_min_words(self):
        text = "a b c\n\nw " + "x " * 12
        out = textnorm.convert_text_to_paras(text, 10)
        assert len(out) == 1 and out[0].startswith("w x")

    def test_parachunks(self):
        text = "\n\n".join(["word " * 5] * 5)
        chunks = textnorm.convert_text_to_parachunks(text.strip(), 12)
        assert all(len(c.split()) > 12 for c in chunks)


# ---------------------------------------------------------------- tokenize
class TestTokenize:
    def test_unigrams_punct_stripped(self):
        # reference extract.py:35-41
        assert tokenize.unigram_words("don't stop-me now!") == ["don", "t", "stop", "me", "now"]

    def test_bigram_reference_quirk(self):
        # reference extract.py:44-62: words.pop() seeds word1 with the LAST word
        out = tokenize.bigram_words("a b c d")
        assert out == ["d a", "a b", "b c"]

    def test_filter_words(self):
        # reference extract.py:65-70: lowercase, len>=3, no digits
        assert tokenize.filter_words(["Abc", "ab", "x9y", "KAPA"]) == ["abc", "kapa"]

    def test_token_frequencies_order(self):
        out = tokenize.token_frequencies(["a", "b", "a"])
        assert out[0] == ("a", 2)

    def test_batch_matches_scalar(self):
        texts = np.array(["Kia ora! e-123 te ao", None, ""], dtype=object)
        batch = tokenize.tokenize_batch(texts)
        assert batch[0] == tokenize.filter_words(tokenize.unigram_words(texts[0]))
        assert batch[1] == [] and batch[2] == []

    def test_arrow_partial_counts_parity(self):
        """token_partial_counts_arrow (the G1 Arrow fast path) must equal
        the per-row reference path token-for-token — on the ASCII kernel
        route AND on the null/non-ASCII fallback route."""
        import collections

        import pyarrow as pa

        cases = [
            # ASCII kernel route
            ["", "  a  b ", "a_b c-d", "ab3c xyz", "Hello, WORLD!!",
             "x\x1cy zzz", "tab\tsep\nnl", "UPPER lower MiXeD", "1234 56ab cdef"],
            # fallback route: null + non-ASCII (unicode digit, macron word)
            ["Kia ora! te ao Māori", None, "foßball x٤y abc", ""],
        ]
        for texts in cases:
            got = (
                tokenize.token_partial_counts_arrow(pa.chunked_array([pa.array(texts, type=pa.string())]))
                .to_pandas().sort_values("token").reset_index(drop=True)
            )
            c: collections.Counter = collections.Counter()
            for toks in tokenize.tokenize_batch(np.array(texts, dtype=object)):
                c.update(toks)
            assert dict(zip(got["token"], got["count"])) == dict(c)

    def test_arrow_partial_counts_empty(self):
        import pyarrow as pa

        t = tokenize.token_partial_counts_arrow(pa.chunked_array([pa.array([], type=pa.string())]))
        assert t.num_rows == 0 and t.column_names == ["token", "count"]


# ---------------------------------------------------------------- hashing
class TestHashing:
    def test_md5_reference_parity(self):
        # fileutils.py:99-101: hashlib.md5(url.encode()).hexdigest()
        import hashlib

        assert hashing.md5_url("x") == hashlib.md5(b"x").hexdigest()
        assert hashing.md5_url("https://a.b/c") == hashlib.md5(b"https://a.b/c").hexdigest()

    def test_sha256_bytes(self):
        import hashlib

        assert hashing.sha256_bytes(b"abc") == hashlib.sha256(b"abc").hexdigest()

    def test_batch_forms(self):
        urls = ["u1", "u2"]
        assert list(hashing.md5_batch(urls)) == [hashing.md5_url(u) for u in urls]
        assert list(hashing.sha1_batch(urls)) == [hashing.sha1_url(u) for u in urls]

    def test_shard_stability(self):
        h = hashing.sha1_url("u")
        assert hashing.digest_to_shard(h, 8) == int(h[:8], 16) % 8


# ---------------------------------------------------------------- urltools
class TestUrlTools:
    def test_relative_detection(self):
        # lrl-crawler.py:157-162
        assert urltools.is_relative("/p/5")
        assert not urltools.is_relative("https://x.y/p")

    def test_excluded_substring_semantics(self):
        # fileutils.py:104-106 — substring, not host equality
        assert urltools.is_excluded("https://m.facebook.com/x", ("facebook.com",))
        assert not urltools.is_excluded("https://ok.org/x", ("facebook.com",))

    def test_canonicalize(self):
        assert urltools.canonicalize("HTTPS://Host.X:443/a?q=1#frag") == "https://host.x/a?q=1"
        assert urltools.canonicalize("http://h.x:80") == "http://h.x/"

    def test_bing_decode_roundtrip(self):
        # search.py:148-192: strip 2 chars, append ==, _->/ -->+
        import base64

        target = "https://example.org/page?x=1"
        enc = base64.b64encode(target.encode()).decode().rstrip("=")
        enc = enc.replace("/", "_").replace("+", "-")
        url = f"https://www.bing.com/ck/a?u=a1{enc}&other=z"
        assert urltools.bing_base64_decode([url]) == [target]

    def test_bing_decode_passthrough(self):
        assert urltools.bing_base64_decode(["https://plain.org/x"]) == ["https://plain.org/x"]
        # bing URL without u param is dropped (reference quirk search.py:175-183)
        assert urltools.bing_base64_decode(["https://www.bing.com/search?q=x"]) == []


# ---------------------------------------------------------------- termdist
class TestTermDist:
    LEX = {"kapa": 10, "haka": 5, "mana": 2, "iti": 1}

    def test_scalar_reference_shapes(self):
        # termdistribution.py:5-28
        tv = termdist.freqdict_to_termvec(self.LEX)
        assert tv["term_order"] == sorted(self.LEX)
        aligned = termdist.aligned_freqdict_to_termvec(tv, {"kapa": 3, "zzz": 9})
        assert aligned["term_vals"] == [0, 0, 3, 0]

    def test_cosine_edge_cases(self):
        # termdistribution.py:31-66
        a = {"term_order": ["x"], "term_vals": [0]}
        b = {"term_order": ["x"], "term_vals": [5]}
        assert termdist.calc_cosine_similarity(a, b) == 0.0
        c = {"term_order": ["x", "y"], "term_vals": [1, 2]}
        assert termdist.calc_cosine_similarity(b, c) == 0.0  # length mismatch

    def test_vectorized_equals_scalar(self):
        tv = termdist.freqdict_to_termvec(self.LEX)
        model = termdist.TermVecModel(self.LEX)
        for para in [
            "kapa haka kapa mana words here",
            "completely unrelated english text",
            "iti iti iti",
            "",
        ]:
            scalar = termdist.termdist_confidence_scalar(para, tv)
            assert math.isclose(model.confidence(para), scalar, rel_tol=0, abs_tol=1e-12)


# ---------------------------------------------------------------- scoring
class TestScoring:
    def test_empty_text_scored_not_whitespace_rejected(self):
        # ''.isspace() is False → falls through (lrl-crawler.py:436 parity)
        from webcrawl_lowres_lang_ray.config import CrawlConfig
        from webcrawl_lowres_lang_ray.functions.scoring import LangScoringModel

        m = LangScoringModel(TestTermDist.LEX, CrawlConfig())
        r = m.score_text("")
        assert r.full_lang == "NON-PUKAPUKA" and r.para_count == 0 and r.rejected

    def test_whitespace_rejected(self):
        from webcrawl_lowres_lang_ray.config import CrawlConfig
        from webcrawl_lowres_lang_ray.functions.scoring import LangScoringModel

        m = LangScoringModel(TestTermDist.LEX, CrawlConfig())
        r = m.score_text("  \n\t ")
        assert r.rejected and r.reject_reason == "text all whitespace"

    def test_unsupported_lang_undefined_verdict(self):
        # nlp.py:414-416
        from webcrawl_lowres_lang_ray.config import CrawlConfig
        from webcrawl_lowres_lang_ray.functions.scoring import LangScoringModel

        cfg = CrawlConfig(lang_supported=False)
        m = LangScoringModel(TestTermDist.LEX, cfg)
        r = m.score_text("kapa haka " * 20)
        assert r.full_lang == "<UNDEFINED>" and r.full_conf == 0.0
        assert r.para_count_lrl == len(r.termdist_match_paras)

    def test_rounding_two_dp(self):
        # nlp.py:455,458
        from webcrawl_lowres_lang_ray.config import CrawlConfig
        from webcrawl_lowres_lang_ray.functions.scoring import LangScoringModel
        from webcrawl_lowres_lang_ray.sources.synth import make_lexicon
        import random

        lex = make_lexicon(random.Random(1), 100)
        m = LangScoringModel(lex, CrawlConfig())
        words = list(lex)
        r = m.score_text(" ".join(words[:40]) + "\n\n" + "the and of " * 8)
        assert r.full_conf == round(r.full_conf, 2)
        assert r.para_perc_lrl == round(r.para_perc_lrl, 2)

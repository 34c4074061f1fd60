"""Text-analysis stages over a document Dataset: quality scoring, token
counting, fingerprinting, language ID — the large-scale training-data
operators the rebuild adds on top of the reference's surface.

Everything is a vectorized ``map_batches`` kernel; the language-ID stage is
the actor-pool pattern (profiles built once per actor).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

import ray.data

_WS_RE = re.compile(r"\s+")
_BPE_ISH_RE = re.compile(r"\w+|[^\w\s]")  # word pieces + punctuation marks
_PUNCT_RE = re.compile(r"[^\w\s]")

STOPWORDS = ("the", "a", "and", "of", "to")


def round_half_away(x, dp: int):
    """SQL-compatible rounding (DuckDB/C++ round: half away from zero;
    numpy rounds half to even — 4.40625 would otherwise hash-mismatch)."""
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** dp
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def quality_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Per-doc quality metrics: token/char counts, ratios (4dp)."""
    texts = batch[text_col].to_numpy()
    n = len(texts)
    n_tokens = np.zeros(n, dtype=np.int64)
    n_chars = np.zeros(n, dtype=np.int64)
    n_punct = np.zeros(n, dtype=np.int64)
    n_stop = np.zeros(n, dtype=np.int64)
    mean_tok_len = np.zeros(n, dtype=np.float64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = t.split()
        n_tokens[i] = len(toks)
        n_chars[i] = len(t)
        n_punct[i] = len(_PUNCT_RE.findall(t))
        n_stop[i] = sum(1 for w in toks if w.lower() in STOPWORDS)
        if toks:
            mean_tok_len[i] = sum(len(w) for w in toks) / len(toks)
    out = batch.copy()
    out["n_tokens"] = n_tokens
    out["punct_ratio"] = round_half_away(np.divide(n_punct, np.maximum(n_chars, 1)), 4)
    out["stopword_ratio"] = round_half_away(np.divide(n_stop, np.maximum(n_tokens, 1)), 4)
    out["mean_token_len"] = round_half_away(mean_tok_len, 4)
    return out


def token_count_bpeish(text: str) -> int:
    """BPE-ish token estimate: \\w+ runs plus individual punctuation marks."""
    return len(_BPE_ISH_RE.findall(text))


def add_token_counts(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    def fn(b: pd.DataFrame) -> pd.DataFrame:
        b["ws_tokens"] = np.array([len(t.split()) for t in b[text_col]], dtype=np.int64)
        b["bpeish_tokens"] = np.array(
            [token_count_bpeish(t) for t in b[text_col]], dtype=np.int64
        )
        return b

    return ds.map_batches(fn, batch_format="pandas")


def fingerprint(text: str) -> str:
    """Document fingerprint: md5 of whitespace-normalized lowercase text."""
    normalized = _WS_RE.sub(" ", text.lower()).strip()
    return hashlib.md5(normalized.encode()).hexdigest()


def rolling_hashes(text: str, window: int = 16, base: int = 257, mod: int = (1 << 31) - 1) -> list[int]:
    """Rabin–Karp rolling hashes over the char stream (winnowing building
    block for fingerprint-based near-dup)."""
    if len(text) < window:
        return []
    h = 0
    pw = pow(base, window - 1, mod)
    out = []
    for i, ch in enumerate(text):
        h = (h * base + ord(ch)) % mod
        if i >= window - 1:
            out.append(h)
            h = (h - ord(text[i - window + 1]) * pw) % mod
    return out


def winnow_fingerprints(text: str, window: int = 16, select: int = 8) -> list[int]:
    """Winnowing: min hash per sliding window of `select` rolling hashes."""
    hs = rolling_hashes(text, window)
    if not hs:
        return []
    out = []
    last = None
    for i in range(max(1, len(hs) - select + 1)):
        m = min(hs[i : i + select])
        if m != last:
            out.append(m)
            last = m
    return out


class LangIdStage:
    """Actor-pool language ID: char-trigram profiles per language, built once
    per actor from provided per-language lexicons (or word lists)."""

    def __init__(self, profiles: dict[str, dict[str, int]]):
        from ..functions.langid import NgramLangModel

        self.models = {lang: NgramLangModel(lex) for lang, lex in profiles.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        langs = []
        confs = []
        for t in batch["text"]:
            best_lang, best_conf = "", 0.0
            for lang, m in self.models.items():
                c = m.confidence(t)
                if c > best_conf:
                    best_lang, best_conf = lang, c
            langs.append(best_lang)
            confs.append(round(best_conf, 4))
        batch["pred_lang"] = langs
        batch["pred_conf"] = confs
        return batch


def repetition_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Gopher-style repetition metrics per document (Rae et al. 2021, §A1.1
    "Repetition" filters, adapted to single-line web text): distinct-word
    ratio, most-frequent-word fraction, most-frequent-bigram fraction, and
    the composite ``keep`` gate.

    Vectorized across the whole batch: one factorize over every word in the
    batch, then (doc, word-id) bincounts via a single pandas groupby — no
    per-document Counter loop.  Ratios are 4 dp half-away rounding (the SQL
    oracle's round())."""
    texts = batch[text_col].to_numpy()
    n = len(texts)
    words_per_doc = [("" if t is None else t).split() for t in texts]
    counts = np.array([len(w) for w in words_per_doc], dtype=np.int64)
    total_flat = int(counts.sum())

    dw = np.zeros(n, dtype=np.int64)       # distinct words
    top_n = np.zeros(n, dtype=np.int64)    # max single-word count
    btop = np.zeros(n, dtype=np.int64)     # max bigram count
    if total_flat:
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        flat = np.empty(total_flat, dtype=object)
        pos = 0
        for ws in words_per_doc:
            flat[pos : pos + len(ws)] = ws
            pos += len(ws)
        wid, _ = pd.factorize(flat)
        g = (
            pd.DataFrame({"d": doc_idx, "w": wid})
            .groupby(["d", "w"], sort=False)
            .size()
        )
        agg = g.groupby(level=0).agg(["max", "size"])
        dw[agg.index.to_numpy()] = agg["size"].to_numpy(np.int64)
        top_n[agg.index.to_numpy()] = agg["max"].to_numpy(np.int64)

        # bigrams: adjacent word-id pairs within a doc (mask doc boundaries)
        if total_flat > 1:
            same_doc = doc_idx[1:] == doc_idx[:-1]
            k = int(wid.max()) + 1
            bg = wid[:-1].astype(np.int64) * k + wid[1:]
            gb = (
                pd.DataFrame({"d": doc_idx[1:][same_doc], "b": bg[same_doc]})
                .groupby(["d", "b"], sort=False)
                .size()
            )
            if len(gb):
                bagg = gb.groupby(level=0).max()
                btop[bagg.index.to_numpy()] = bagg.to_numpy(np.int64)

    btotal = np.maximum(counts - 1, 0)
    safe_total = np.maximum(counts, 1)
    safe_btotal = np.maximum(btotal, 1)
    distinct_ratio = round_half_away(
        np.where(counts > 0, dw / safe_total, 0.0), 4
    )
    top_word_frac = round_half_away(
        np.where(counts > 0, top_n / safe_total, 0.0), 4
    )
    top_bigram_frac = round_half_away(
        np.where(btotal > 0, btop / safe_btotal, 0.0), 4
    )
    out = batch.copy()
    out["total_words"] = counts
    out["distinct_word_ratio"] = distinct_ratio
    out["top_word_frac"] = top_word_frac
    out["top_bigram_frac"] = top_bigram_frac
    # Gopher-ish composite gate (thresholds tuned to the synthetic corpus
    # scale; the reference thresholds are corpus-specific anyway)
    out["keep"] = (
        (distinct_ratio >= 0.2)
        & (top_word_frac <= 0.2)
        & (top_bigram_frac <= 0.15)
    )
    return out

"""Crawl-pipeline queries (rows-only checks: the crawl's inputs are the
synthesized Common-Crawl-style page table mandated by input_hint, which is
not a pre-registered DuckDB view — correctness is instead pinned by the
oracle-conformance pytest suite, tests/test_crawl_conformance.py).

All callables share one cached crawl run per sf_dir (deterministic, so the
cache is safe); the corpus itself is cached under /tmp/wllr_corpus.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray.data

from ..config import CrawlConfig
from ..frontier import run_crawl
from ..sources.synth import corpus_dir_for_sf, load_lexicon

# generous politeness budget so the per-round driver check stays fast while
# still exercising multi-wave admission
QUERY_CFG = CrawlConfig(per_host_per_wave=32)

_RUN_CACHE: dict[str, str] = {}


def _from_pandas_blocks(df: pd.DataFrame, rows_per_block: int = 256) -> "ray.data.Dataset":
    """from_pandas with the frame pre-chunked into blocks — a single-frame
    from_pandas yields ONE block, serializing every downstream map_batches
    onto one core."""
    if len(df) <= rows_per_block:
        return ray.data.from_pandas(df)
    chunks = [
        df.iloc[i : i + rows_per_block].reset_index(drop=True)
        for i in range(0, len(df), rows_per_block)
    ]
    return ray.data.from_pandas(chunks)


_LEDGER_CACHE: dict[str, pd.DataFrame] = {}


def load_ledger(out_dir: str) -> pd.DataFrame:
    """Cached ledger load — every query callable reads the same crawl run."""
    from ..frontier import load_ledger as _load

    led = _LEDGER_CACHE.get(out_dir)
    if led is None:
        led = _LEDGER_CACHE[out_dir] = _load(out_dir)
    return led


def crawl_output_dir(sf_dir: str) -> str:
    corpus = corpus_dir_for_sf(sf_dir)
    key = corpus
    out = _RUN_CACHE.get(key)
    if out is None:
        out = os.path.join("/tmp/wllr_runs", os.path.basename(corpus))
        done = os.path.join(out, "DONE")
        if not os.path.exists(done):
            run_crawl(corpus, out, QUERY_CFG)
            with open(done, "w") as f:
                f.write("ok\n")
        _RUN_CACHE[key] = out
    return out


def q_crawl_ledger(sf_dir: str) -> pd.DataFrame:
    """The full crawl-state ledger (the reference urls table, sql.py:47-66)."""
    led = load_ledger(crawl_output_dir(sf_dir))
    return led.drop(columns=["text"])


def q_crawl_order(sf_dir: str) -> pd.DataFrame:
    """Crawl ordering: seq -> url -> politeness wave (north-rule invariant)."""
    led = load_ledger(crawl_output_dir(sf_dir))
    return led[["seq", "url", "wave"]]


def q_crawl_extracted_text(sf_dir: str) -> pd.DataFrame:
    """Byte-identical extracted text per fetched url (input_hint invariant)."""
    led = load_ledger(crawl_output_dir(sf_dir))
    out = led.loc[led["downloaded"], ["url", "text"]].reset_index(drop=True)
    out["text_sha256"] = [
        __import__("hashlib").sha256(t.encode()).hexdigest() for t in out["text"]
    ]
    return out.drop(columns=["text"])


def q_crawl_seen_membership(sf_dir: str) -> pd.DataFrame:
    """URL-seen set membership (canonical SHA-1 keys, north-rule invariant)."""
    led = load_ledger(crawl_output_dir(sf_dir))
    return pd.DataFrame({"canon_sha1": sorted(led["canon_sha1"])})


def q_crawl_stats_report(sf_dir: str) -> pd.DataFrame:
    """The display.stats suite (display.py:7-198) over the crawl ledger:
    verdict counts, rejection counts, per-host top-10, confidence deciles."""
    led = load_ledger(crawl_output_dir(sf_dir))
    rows: list[tuple[str, str, float]] = []
    rows.append(("total_urls", "", float(len(led))))
    rows.append(("downloaded", "", float(led["downloaded"].sum())))
    rows.append(("failed", "", float(led["downloaded_failed"].sum())))
    rows.append(("rejected", "", float(led["rejected"].sum())))
    rows.append(("skipped_relative", "", float(led["skipped_relative"].sum())))
    rows.append(("robots_blocked", "", float(led["robots_blocked"].sum())))
    for verdict, n in led["nlp_full_lang"].value_counts().items():
        if verdict:
            rows.append(("verdict", verdict, float(n)))
    # per-domain counts: top 10 (G10, sql.py:884-940)
    counts = led.loc[led["host"] != "", "host"].value_counts()
    for host, n in counts.head(10).items():
        rows.append(("top_domain", host, float(n)))
    # confidence deciles (G11, sql.py:943-1044)
    scored = led.loc[led["handled"] & led["downloaded"], "nlp_full_confidence"]
    dec = np.clip((scored * 10).astype(int), 0, 9)
    for b, n in pd.Series(dec).value_counts().sort_index().items():
        rows.append(("confidence_decile", str(int(b)), float(n)))
    return pd.DataFrame(rows, columns=["stat", "key", "value"])


def q_minhash_neardup(sf_dir: str):
    """MinHash+LSH near-dup pairs over the crawl's fetched texts (real dups
    exist there by construction: duplicate bodies across urls)."""
    from ..stages.dedup import minhash_lsh_pairs

    led = load_ledger(crawl_output_dir(sf_dir))
    # empty/whitespace docs all share one degenerate signature (a clique that
    # explodes candidate pairs) and are exact-dedup territory — drop them
    nonempty = led["downloaded"] & (led["text"].str.strip() != "")
    docs = led.loc[nonempty, ["seq", "text"]].reset_index(drop=True)
    ds = _from_pandas_blocks(docs)
    return minhash_lsh_pairs(ds, text_col="text", id_col="seq", threshold=0.8)


def q_simhash_neardup(sf_dir: str):
    """SimHash near-dup pairs (Hamming <= 3) over the crawl's fetched texts."""
    from ..stages.dedup import simhash_neardup_pairs

    led = load_ledger(crawl_output_dir(sf_dir))
    nonempty = led["downloaded"] & (led["text"].str.strip() != "")
    docs = led.loc[nonempty, ["seq", "text"]].reset_index(drop=True)
    return simhash_neardup_pairs(_from_pandas_blocks(docs), text_col="text", id_col="seq")


def q_langid_predict(sf_dir: str):
    """Actor-pool n-gram language ID over the documents table (best-of-two
    profiles: the synthetic LRL lexicon vs an English word profile)."""
    from ..stages.textstats import LangIdStage

    corpus = corpus_dir_for_sf(sf_dir)
    lrl = load_lexicon(corpus)
    en_profile = {
        w: 10
        for w in (
            "the quick brown fox jumps over lazy dog and cat with some words "
            "about nothing because this page mostly contains english text"
        ).split()
    }
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = docs.map_batches(
        LangIdStage,
        fn_constructor_kwargs={"profiles": {"LRL": lrl, "ENGLISH": en_profile}},
        batch_format="pandas",
        batch_size=512,
        concurrency=2,
    )
    return out.select_columns(["doc_id", "pred_lang", "pred_conf"])


def q_ann_lsh_topk(sf_dir: str) -> pd.DataFrame:
    """SRP-LSH approximate top-k (scale path of q_ann_topk)."""
    from ..stages.ann import build_srp_index, srp_lsh_topk
    from .queries import _query_vec

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    q = _query_vec(sf_dir)
    dim = len(q)
    indexed = build_srp_index(emb, dim, bits=8)
    return srp_lsh_topk(indexed, q, dim, k=10, bits=8, probe_hamming=2)


def q_multimodal_decode(sf_dir: str) -> pd.DataFrame:
    """Multimodal decode plumbing (stubbed kernels, real Ray wiring)."""
    from ..stages.multimodal import DecodeStage, synth_media_batch

    media = ray.data.from_pandas(synth_media_batch(200))
    out = media.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"fake": True},
        batch_format="pandas",
        batch_size=16,
        concurrency=2,
    )
    return out.to_pandas().sort_values("media_id").reset_index(drop=True)


def q_query_generation(sf_dir: str) -> pd.DataFrame:
    """N9 (queries.py:73-106): the 4 query generators + sorted-tuple dedup
    over the corpus lexicon, english_ref excluded, seeded RNG."""
    import pyarrow.parquet as pq

    from ..functions.querygen import generate_all

    corpus = corpus_dir_for_sf(sf_dir)
    lex = load_lexicon(corpus)
    en = {
        t: 1
        for t in pq.read_table(os.path.join(corpus, "english_ref.parquet"))[
            "token"
        ].to_pylist()
    }
    qs = generate_all(lex, seed=42, english_word_dict=en, word_count=3, query_count=10)
    return pd.DataFrame(qs)


def q_sentence_split(sf_dir: str) -> pd.DataFrame:
    """N10 (tongan-sentence-splitter.py): sentence counts per fetched doc."""
    from ..functions.sentences import split_sentences_batch

    led = load_ledger(crawl_output_dir(sf_dir))
    docs = led.loc[led["downloaded"], ["seq", "text"]].reset_index(drop=True)
    sents = split_sentences_batch(docs["text"])
    return pd.DataFrame(
        {"seq": docs["seq"], "n_sentences": [len(s) for s in sents]}
    )


def q_lexicon_regen(sf_dir: str) -> pd.DataFrame:
    """One phase of the iterative lexicon-growth loop (N7) over the crawl's
    accepted texts."""
    from ..stages.lexicon import regenerate_lexicon

    corpus = corpus_dir_for_sf(sf_dir)
    led = load_ledger(crawl_output_dir(sf_dir))
    docs = led.loc[led["downloaded"] & ~led["rejected"], ["text"]].reset_index(drop=True)
    grown = regenerate_lexicon(
        _from_pandas_blocks(docs), load_lexicon(corpus), QUERY_CFG, output_mode="merge"
    )
    out = pd.DataFrame(
        {"token": list(grown.keys()), "count": list(grown.values())}
    ).sort_values("token").reset_index(drop=True)
    return out

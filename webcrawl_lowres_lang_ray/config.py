"""Crawl configuration.

Mirrors the reference's ``config.json`` surface (reference config.json:17-59):
thresholds, politeness budget, excluded domains, language registry — as a
frozen dataclass so every stage / actor receives one immutable value.

The reference's NLP thresholds (config.json:46-59) are kept under the same
names.  ``min_full_confidence`` corresponds to ``min_lingua_full_confidence``;
"lingua" is replaced throughout by a deterministic character-n-gram scorer
(lingua is unavailable in this environment), so the defaults are tuned to that
scorer's confidence scale while preserving the reference's *semantics*
(full-doc verdict LANG / NON-LANG / <UNDEFINED>, nlp.py:405-416).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass(frozen=True)
class CrawlConfig:
    # --- language under study (reference lrl-crawler.py:504-506) ---
    lang: str = "PUKAPUKA"          # synthetic LRL; upper-case verdict name
    lang_supported: bool = True     # is the primary (lingua-stand-in) model available

    # --- NLP thresholds (reference config.json:46-59) ---
    min_full_confidence: float = 0.55        # min_lingua_full_confidence analog
    min_para_word_len: int = 10              # min_lingua_para_word_len
    min_para_confidence: float = 0.55        # min_lingua_para_confidence analog
    min_termdist_para_word_len: int = 30     # min_termdist_para_word_len
    min_termdist_para_confidence: float = 0.5

    # --- frontier / politeness (reference config.json:20-24) ---
    # The reference sleeps sleep_delay + U(0, sleep_delay) seconds per query per
    # worker (lrl-crawler.py:332-335).  The rebuild uses deterministic virtual
    # time: one "wave" == one politeness slot; each host may be fetched at most
    # `per_host_per_wave` times per wave.  Same budget => same admission order.
    per_host_per_wave: int = 2
    max_waves: int = 10_000
    # 0 = unlimited; else a global insertion budget: only URLs assigned
    # seq < max_pages enter the frontier/ledger (enforced identically in
    # oracle.run_oracle and both frontier insertion paths)
    max_pages: int = 0
    # priority assigned to discovered links (seeds may carry their own
    # `priority` column); admission orders by (priority DESC, seq ASC),
    # so default 0 everywhere == reference FIFO parity
    link_priority: int = 0

    # --- seen-set sharding (north_rule: sharded cuckoo filter, SHA-1 keys) ---
    num_seen_shards: int = 8
    # --- fetch-join bucketing (pages table partitioned by host-hash bucket) ---
    num_url_buckets: int = 256

    apply_robots: bool = True

    # --- domain exclusion list (reference config.json:29-44) ---
    excluded_domains: tuple[str, ...] = (
        "www.facebook.com",
        "facebook.com",
        "m.facebook.com",
        "www.instagram.com",
        "instagram.com",
        "quizlet.example.com",
        "ads.example.net",
    )

    def replace(self, **kw) -> "CrawlConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = CrawlConfig()


@dataclass(frozen=True)
class SynthConfig:
    """Deterministic synthetic-corpus parameters (sources/synth.py).

    The corpus is the sandbox stand-in for the Common-Crawl-style page table
    named by BASELINE.json's input_hint:
    ``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
    """

    n_pages: int = 500
    n_hosts: int = 24
    seed: int = 42
    lexicon_size: int = 300
    seeds_per_corpus: int = 24     # size of the seed URL list
    dup_fraction: float = 0.04     # pages whose html is a byte-identical clone
    empty_fraction: float = 0.02   # empty / whitespace-only bodies
    latin1_fraction: float = 0.10  # pages encoded latin-1 (charset sniff path)
    dead_link_fraction: float = 0.06   # hrefs pointing outside the page table
    pdf_fraction: float = 0.03     # Content-Type: application/pdf rows (M5/M9)
    docx_fraction: float = 0.015   # msword / ooxml rows (M5/M10)
    unknown_ct_fraction: float = 0.005  # unknown Content-Type (dropped by M5)
    num_url_buckets: int = 256      # must match CrawlConfig.num_url_buckets

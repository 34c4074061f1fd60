"""The distributed crawl: URL frontier + fetch scheduler as Ray Data waves.

Reproduces the oracle's semantics (oracle.py — itself the reference's
num_threads=1 FIFO semantics) with Ray Data execution per wave:

  frontier parquet (sorted spill)                        [checkpoint.py]
    -> politeness admission   groupby(host) head-k by seq [state/politeness.py]
    -> relative-URL skip + robots gate                    [state/robots.py actors]
    -> fetch = partitioned hash join vs the page table
       (pre-partitioned by canonical-SHA-1 bucket); bucket
       groups LPT-bin-packed into ~4x cluster-CPU tasks    [_fetch_group]
    -> extract + clean + score + link-extract             [_score_batch, model
       in one map_batches stage                            cached per worker]
    -> ledger partition write  ledger/wave=N/
    -> candidate insertion: excluded-domain filter, within-wave dedup
       (first occurrence by (parent_seq, link_idx)), sharded seen-filter
       actors, deterministic global seq assignment         [_insert_*]
    -> next frontier partition + manifest + seen snapshots

Determinism: execution order inside a wave is free (preserve_order=False);
logical order is restored by explicit sort keys — admission by ``seq``,
insertion rank by ``(parent_seq, link_idx)`` — so the ledger equals the
single-threaded oracle's bit-for-bit (tests/test_crawl_conformance.py).

Scale notes (the 100 TB story):
* The frontier lives in per-wave Parquet spill partitions, never on the
  driver, except that admission and insertion use a driver-local Arrow fast
  path when the wave is small (< ``driver_path_max_rows``); both paths are
  implemented and asserted equivalent.  At 10^10-URL scale the Ray path is
  taken: admission is a host-hash groupby, insertion rank is a two-pass
  bucket-histogram prefix sum (only the tiny histogram visits the driver).
* The page-table side of fetch is only ever read one url-hash bucket at a
  time with an ``url in (...)`` predicate pushed into the Parquet read —
  no stage scans the whole corpus.
* html bytes flow fetch->score inside one streaming execution and are
  dropped before any write; the ledger keeps text, hashes and metrics only.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from . import checkpoint as ckpt
from .config import CrawlConfig
from .functions.hashing import digest_to_shard, md5_batch, sha1_batch
from .functions.html_text import decode_html, extract_links, extract_text_from_html_bytes
from .functions.scoring import LangScoringModel
from .functions.urltools import excluded_mask_batch, host_batch, relative_mask_batch, canonicalize_batch
from .sources.synth import load_lexicon
from .state.robots import create_robots_actors, robots_blocked_mask
from .state.seen import create_seen_shards, restore_all, seen_filter_new, snapshot_all

# switch to the distributed admission/insertion path above this many rows
DRIVER_PATH_MAX_ROWS = 200_000
# politeness-bound tail waves (a few URLs per hot host) run locally with the
# SAME kernels — paying a cluster fan-out for <~a hundred rows costs more
# than the work; any real scheduler makes this call.  Conformance tests force
# both paths and assert identical ledgers.
SMALL_WAVE_MAX_ROWS = 128
_RANK_BUCKET = 256

FRONTIER_FIELDS = [
    ("seq", pa.int64()),
    ("url", pa.string()),
    ("url_hash", pa.string()),
    ("canon_sha1", pa.string()),
    ("host", pa.string()),
    ("bucket", pa.int32()),
    ("query_id", pa.int64()),
    ("engine", pa.string()),
    ("is_rel", pa.bool_()),
    ("robots_blocked", pa.bool_()),
]
FRONTIER_SCHEMA = pa.schema(FRONTIER_FIELDS)

LEDGER_META_COLS = [
    "seq", "url", "url_hash", "canon_sha1", "host", "query_id", "engine",
    "wave", "downloaded", "downloaded_failed", "handled", "skipped_relative",
    "robots_blocked", "doc_type", "file_hash", "text",
    "nlp_full_lang", "nlp_full_confidence", "nlp_para_count",
    "nlp_para_count_lrl", "nlp_para_perc_lrl", "rejected",
]


@dataclass
class CrawlStats:
    waves: int = 0
    inserted: int = 0
    fetched: int = 0
    failed: int = 0
    skipped_relative: int = 0
    robots_blocked: int = 0
    rejected: int = 0
    elapsed_sec: float = 0.0
    per_wave: list[dict] = field(default_factory=list)


# ---------------------------------------------------------------------------
# scorer-model cache: one model per worker process (stateless map_batches
# tasks reuse worker processes, so the model loads once per worker — the
# actor-pool pattern without per-wave pool churn; cf. stages/score.py for
# the explicit actor-pool form of the same stage)
# ---------------------------------------------------------------------------
_MODEL_CACHE: dict[str, LangScoringModel] = {}


def _get_model(lexicon_ref, cfg: CrawlConfig) -> LangScoringModel:
    key = lexicon_ref.hex() if hasattr(lexicon_ref, "hex") else str(id(lexicon_ref))
    model = _MODEL_CACHE.get(key)
    if model is None:
        lexicon = ray.get(lexicon_ref)
        model = LangScoringModel(lexicon, cfg)
        _MODEL_CACHE[key] = model
    return model


# ---------------------------------------------------------------------------
# per-wave stages
# ---------------------------------------------------------------------------

def _admit_driver(df: pd.DataFrame, k: int) -> pd.DataFrame:
    df = df.sort_values("seq", kind="mergesort").reset_index(drop=True)
    df["admit"] = df.groupby("host").cumcount() < k
    return df


def _admit_ray(ds: "ray.data.Dataset", k: int) -> pd.DataFrame:
    """Distributed politeness admission: hash-partition by host (all rows of
    one host in one partition), then a vectorized per-partition pandas
    groupby-cumcount — not one map_groups dispatch per host (ms each at
    10^5+ hosts)."""

    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b.assign(admit_part=pd.Series(dtype="int64"))
        b = b.copy()
        b["admit_part"] = (
            pd.util.hash_array(b["host"].to_numpy(object)) % 64
        ).astype(np.int64)
        return b

    def mark_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("seq", kind="mergesort")
        g["admit"] = g.groupby("host").cumcount() < k
        return g.drop(columns=["admit_part"])

    out = (
        ds.map_batches(add_part, batch_format="pandas")
        .groupby("admit_part")
        .map_groups(mark_part, batch_format="pandas")
    )
    return out.to_pandas()


def _fetch_group(pages_dir: str):
    """Partitioned hash join against the page table, one bucket at a time.

    Each call reads the bucket file(s) its rows map to with an
    `url in (...)` predicate pushed into the Parquet read and left-joins.
    In the distributed path the wave's rows arrive grouped by bucket
    (LPT-bin-packed bucket groups, see run_crawl), so a task reads each of
    its buckets' files exactly once — the explicit partitioned-join pattern
    without a sort shuffle.
    """

    def fetch_one(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["bucket"].iloc[0])
        path = os.path.join(pages_dir, f"bucket={bucket:03d}.parquet")
        urls = list(g["url"])
        if os.path.exists(path):
            t = pq.read_table(
                path, columns=["url", "html"], filters=[("url", "in", urls)]
            )
            pages = pd.DataFrame(
                {"url": t["url"].to_pylist(), "html": t["html"].to_pylist()}
            )
        else:
            pages = pd.DataFrame({"url": [], "html": []})
        out = g.merge(pages, on="url", how="left")
        html = out["html"].to_numpy(dtype=object, copy=True)
        html[pd.isna(html)] = None  # .where(cond, None) would leave NaN
        out["html"] = html
        return out

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g.assign(html=np.empty(0, dtype=object))
        if g["bucket"].nunique() == 1:
            return fetch_one(g)
        return pd.concat(
            [fetch_one(sub.reset_index(drop=True)) for _, sub in g.groupby("bucket", sort=True)],
            ignore_index=True,
        )

    return fn


def _score_batch(lexicon_ref, cfg: CrawlConfig, wave: int):
    """Batch fn: extract text, score, extract links. html is dropped here."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        model = _get_model(lexicon_ref, cfg)
        n = len(batch)
        downloaded = np.zeros(n, dtype=bool)
        failed = np.zeros(n, dtype=bool)
        handled = np.zeros(n, dtype=bool)
        rejected = np.zeros(n, dtype=bool)
        doc_type = np.full(n, "", dtype=object)
        file_hash = np.full(n, "", dtype=object)
        text_col = np.full(n, "", dtype=object)
        full_lang = np.full(n, "", dtype=object)
        full_conf = np.zeros(n, dtype=np.float64)
        para_count = np.zeros(n, dtype=np.int64)
        para_lrl = np.zeros(n, dtype=np.int64)
        para_perc = np.zeros(n, dtype=np.float64)
        links = np.empty(n, dtype=object)

        import hashlib

        for i, html in enumerate(batch["html"].to_numpy()):
            if not isinstance(html, (bytes, bytearray)):  # None/NaN -> fetch miss
                failed[i] = True
                links[i] = []
                continue
            downloaded[i] = True
            doc_type[i] = "html"
            file_hash[i] = hashlib.sha256(html).hexdigest()
            text = extract_text_from_html_bytes(html)
            text_col[i] = text
            sr = model.score_text(text)
            handled[i] = True
            full_lang[i] = sr.full_lang or ""
            full_conf[i] = sr.full_conf
            para_count[i] = sr.para_count
            para_lrl[i] = sr.para_count_lrl
            para_perc[i] = sr.para_perc_lrl
            rejected[i] = sr.rejected
            links[i] = extract_links(decode_html(html))

        out = batch.drop(columns=["html"]).copy()
        out["wave"] = np.int64(wave)
        out["downloaded"] = downloaded
        out["downloaded_failed"] = failed
        out["handled"] = handled
        out["skipped_relative"] = False
        out["robots_blocked"] = False
        out["doc_type"] = doc_type
        out["file_hash"] = file_hash
        out["text"] = text_col
        out["nlp_full_lang"] = full_lang
        out["nlp_full_confidence"] = full_conf
        out["nlp_para_count"] = para_count
        out["nlp_para_count_lrl"] = para_lrl
        out["nlp_para_perc_lrl"] = para_perc
        out["rejected"] = rejected
        out["links"] = links
        return out

    return fn


def _wave_task(pages_dir: str, lexicon_ref, cfg: CrawlConfig, wave: int, ledger_dir: str, robots_actors=None):
    """The whole per-bucket wave body as ONE task: partitioned fetch join ->
    extract/score -> write this bucket's ledger partition (resumable layout:
    ledger/wave=N/part-bKKK.parquet, idempotent overwrite) -> explode links ->
    prepare candidates (excluded filter, canon/sha1/md5/host/bucket).

    Fusing the chain keeps each wave at a single Ray Data execution and a
    single driver pull of *prepared candidate* rows (url + hashes + ints —
    no html, no text), which is what makes the wave loop's serial fraction
    small enough to scale (BASELINE.md scaling criterion)."""
    fetch_fn = _fetch_group(pages_dir)
    score_fn = _score_batch(lexicon_ref, cfg, wave)

    def one_bucket(g: pd.DataFrame) -> pd.DataFrame:
        wave_df = score_fn(fetch_fn(g))
        bucket = int(g["bucket"].iloc[0])
        pq.write_table(
            pa.Table.from_pandas(
                wave_df.drop(columns=["links"])[LEDGER_META_COLS],
                preserve_index=False,
            ),
            os.path.join(ledger_dir, f"part-b{bucket:03d}.parquet"),
        )
        cand = _explode_links(wave_df[["seq", "query_id", "links"]])
        return _prepare_candidates(cand, cfg, robots_actors)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return _empty_candidates_df()
        if g["bucket"].nunique() == 1:
            return one_bucket(g)
        return pd.concat(
            [one_bucket(sub.reset_index(drop=True))
             for _, sub in g.groupby("bucket", sort=True)],
            ignore_index=True,
        )

    return fn


def _empty_candidates_df() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "url": pd.Series(dtype="object"),
            "query_id": pd.Series(dtype="int64"),
            "engine": pd.Series(dtype="object"),
            "ord1": pd.Series(dtype="int64"),
            "ord2": pd.Series(dtype="int64"),
            "canon_sha1": pd.Series(dtype="object"),
            "url_hash": pd.Series(dtype="object"),
            "host": pd.Series(dtype="object"),
            "bucket": pd.Series(dtype="int32"),
            "is_rel": pd.Series(dtype="bool"),
            "robots_blocked": pd.Series(dtype="bool"),
        }
    )


def _norun_ledger_rows(df: pd.DataFrame, wave: int, relative: np.ndarray, robots: np.ndarray) -> pd.DataFrame:
    """Ledger rows for admitted URLs that never fetch (relative / robots)."""
    out = df.copy()
    out["wave"] = np.int64(wave)
    out["downloaded"] = False
    out["downloaded_failed"] = False
    out["handled"] = True
    out["skipped_relative"] = relative
    out["robots_blocked"] = robots
    out["doc_type"] = ""
    out["file_hash"] = ""
    out["text"] = ""
    out["nlp_full_lang"] = ""
    out["nlp_full_confidence"] = 0.0
    out["nlp_para_count"] = np.int64(0)
    out["nlp_para_count_lrl"] = np.int64(0)
    out["nlp_para_perc_lrl"] = 0.0
    out["rejected"] = False
    return out[LEDGER_META_COLS]


# ---------------------------------------------------------------------------
# candidate insertion (excluded filter -> dedup -> seen -> seq assignment)
# ---------------------------------------------------------------------------

def _prepare_candidates(
    df: pd.DataFrame, cfg: CrawlConfig, robots_actors=None
) -> pd.DataFrame:
    """Vectorized: drop excluded, add canon/sha1/md5/host/bucket columns plus
    the pre-evaluated admission gates (is_rel, robots_blocked).

    Gate precomputation here — inside the distributed wave task — is what
    keeps the per-wave driver section flat: every candidate is gated exactly
    once at insertion instead of re-parsed on the driver at admission."""
    if len(df) == 0:
        return _empty_candidates_df()
    urls = df["url"].to_numpy()
    keep = ~excluded_mask_batch(urls, cfg.excluded_domains)
    df = df.loc[keep].copy()
    if len(df) == 0:
        return _empty_candidates_df()
    urls = df["url"].to_numpy()
    canon = canonicalize_batch(urls)
    sha1 = sha1_batch(canon)
    df["canon_sha1"] = sha1
    df["url_hash"] = md5_batch(urls)
    df["host"] = host_batch(urls)
    df["bucket"] = np.array(
        [digest_to_shard(h, cfg.num_url_buckets) for h in sha1], dtype=np.int32
    )
    rel = relative_mask_batch(urls)
    df["is_rel"] = rel
    if cfg.apply_robots and robots_actors:
        df["robots_blocked"] = robots_blocked_mask(robots_actors, list(urls)) & ~rel
    else:
        df["robots_blocked"] = False
    return df


def _insert_driver(
    cand: pd.DataFrame, seen_shards, base_seq: int, cfg: CrawlConfig
) -> pd.DataFrame:
    """Driver insertion path: dedup + seen-filter + seq over PREPARED
    candidates (columns of _empty_candidates_df; prep happens inside the
    distributed wave task)."""
    if len(cand) == 0:
        return _empty_frontier_df()
    # within-wave dedup: first occurrence by (ord1, ord2)
    cand = cand.sort_values(["ord1", "ord2"], kind="mergesort")
    cand = cand.drop_duplicates(subset=["canon_sha1"], keep="first")
    digests = [bytes.fromhex(h) for h in cand["canon_sha1"]]
    new_mask = seen_filter_new(seen_shards, digests)
    cand = cand.loc[new_mask]
    cand = cand.reset_index(drop=True)
    cand["seq"] = base_seq + np.arange(len(cand), dtype=np.int64)
    return cand[[n for n, _ in FRONTIER_FIELDS]]


def _insert_ray(
    cand_ds: "ray.data.Dataset", seen_shards, base_seq: int, cfg: CrawlConfig
) -> pd.DataFrame:
    """Distributed insertion over PREPARED candidates: per-key dedup via
    hash-partitioned vectorized drop_duplicates (NOT groupby(key).map_groups
    — per-group dispatch at 10^5+ distinct urls costs ~ms each) ->
    seen-filter inside map_batches (actor RPCs from tasks) -> two-pass
    bucket-histogram rank for global seq assignment."""

    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b.assign(dedup_part=pd.Series(dtype="int64"))
        b = b.copy()
        b["dedup_part"] = (
            pd.util.hash_array(b["canon_sha1"].to_numpy(object)) % 64
        ).astype(np.int64)
        return b

    def first_occurrence_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ord1", "ord2"], kind="mergesort")
        return g.drop_duplicates("canon_sha1", keep="first").drop(
            columns=["dedup_part"]
        )

    deduped = (
        cand_ds.map_batches(add_part, batch_format="pandas")
        .groupby("dedup_part")
        .map_groups(first_occurrence_part, batch_format="pandas")
    )

    def seen_stage(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        digests = [bytes.fromhex(h) for h in b["canon_sha1"]]
        return b.loc[seen_filter_new(seen_shards, digests)]

    def rank_cols(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b.assign(
                rank_bucket=pd.Series(dtype="int64"),
                rank_part=pd.Series(dtype="int64"),
            )
        b = b.assign(rank_bucket=(b["ord1"] // _RANK_BUCKET).astype(np.int64))
        # all rows of one rank_bucket land in one partition (the pattern:
        # 64 group dispatches total, vectorized pandas inside — NOT one
        # map_groups per rank bucket, which is ~100ms each at 10^3+ buckets)
        b["rank_part"] = (
            pd.util.hash_array(b["rank_bucket"].to_numpy(np.int64)) % 64
        ).astype(np.int64)
        return b

    survivors = (
        deduped.map_batches(seen_stage, batch_format="pandas")
        .map_batches(rank_cols, batch_format="pandas")
        .materialize()
    )

    # pass 1: per-batch rank-bucket histograms -> tiny driver merge -> prefix
    # offsets, broadcast back
    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["rank_bucket"].value_counts()
        return pd.DataFrame({"rank_bucket": vc.index.to_numpy(np.int64),
                             "n": vc.to_numpy(np.int64)})

    hist = survivors.map_batches(hist_partial, batch_format="pandas").to_pandas()
    if len(hist) == 0:  # every candidate excluded / duplicate / already seen
        return _empty_frontier_df()
    hist = hist.groupby("rank_bucket")["n"].sum().sort_index()
    starts = np.cumsum(hist.to_numpy()) - hist.to_numpy()
    offsets = dict(zip(hist.index.to_numpy(), starts))
    offsets_ref = ray.put(offsets)

    # pass 2: per-partition vectorized local rank + broadcast global offset
    def assign_part(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(offsets_ref)
        g = g.sort_values(["rank_bucket", "ord1", "ord2"], kind="mergesort")
        counts = g.groupby("rank_bucket", sort=True).size()
        seq = np.concatenate(
            [offs[int(rb)] + np.arange(c, dtype=np.int64) for rb, c in counts.items()]
        ) if len(counts) else np.empty(0, dtype=np.int64)
        g["seq"] = base_seq + seq
        return g.drop(columns=["rank_part"])

    out = survivors.groupby("rank_part").map_groups(assign_part, batch_format="pandas")
    df = out.to_pandas()
    if len(df) == 0:
        return _empty_frontier_df()
    df = df.sort_values("seq", kind="mergesort").reset_index(drop=True)
    return df[[n for n, _ in FRONTIER_FIELDS]]


def _empty_frontier_df() -> pd.DataFrame:
    def dt(t):
        if t == pa.string():
            return "object"
        if t == pa.int32():
            return "int32"
        if t == pa.bool_():
            return "bool"
        return "int64"

    return pd.DataFrame({name: pd.Series(dtype=dt(t)) for name, t in FRONTIER_FIELDS})


def _write_frontier(df: pd.DataFrame, path_dir: str) -> None:
    os.makedirs(path_dir, exist_ok=True)
    tbl = pa.Table.from_pandas(df[ [n for n,_ in FRONTIER_FIELDS] ], schema=FRONTIER_SCHEMA, preserve_index=False)
    pq.write_table(tbl, os.path.join(path_dir, "part-0.parquet"))


# ---------------------------------------------------------------------------
# the crawl driver
# ---------------------------------------------------------------------------

def run_crawl(
    corpus_dir: str,
    out_dir: str,
    cfg: CrawlConfig | None = None,
    resume: bool = False,
    score_concurrency: int | None = None,
) -> CrawlStats:
    """Run the full crawl; requires ray to be initialised by the caller."""
    cfg = cfg or CrawlConfig()
    pages_dir = os.path.join(corpus_dir, "pages")
    robots_path = os.path.join(corpus_dir, "robots.parquet") if cfg.apply_robots else None
    stats = CrawlStats()
    t0 = time.time()

    lexicon_ref = ray.put(load_lexicon(corpus_dir))
    seen_shards = create_seen_shards(cfg.num_seen_shards)
    robots_actors = create_robots_actors(robots_path) if cfg.apply_robots else []

    manifest = ckpt.latest_manifest(out_dir) if resume else None
    if manifest is not None:
        wave = manifest["wave"] + 1
        next_seq = manifest["next_seq"]
        stats.inserted = manifest["inserted"]
        restore_all(seen_shards, ckpt.read_seen_snapshots(manifest["seen_snapshots"]))
        pending_path = ckpt.wave_dir(out_dir, "frontier", wave)
        pending_df = _read_frontier(pending_path)
    else:
        ckpt.clear_output(out_dir)
        wave = 0
        # --- seed insertion (reference: query-gen + search stage seeds the
        # urls table in id order; here the seed list is the frontier bootstrap)
        seeds = pq.read_table(os.path.join(corpus_dir, "seeds.parquet")).to_pandas()
        seeds = seeds.sort_values("seq", kind="mergesort")
        cand = pd.DataFrame(
            {
                "url": seeds["url"],
                "query_id": seeds["query_id"].astype(np.int64),
                "engine": seeds["engine"],
                "ord1": seeds["seq"].astype(np.int64),
                "ord2": np.int64(0),
            }
        )
        pending_df = _insert_driver(
            _prepare_candidates(cand, cfg, robots_actors), seen_shards, 0, cfg
        )
        next_seq = int(len(pending_df))
        stats.inserted = next_seq
        _write_frontier(pending_df, ckpt.wave_dir(out_dir, "frontier", 0))

    while len(pending_df) > 0 and wave < cfg.max_waves:
        wave_t0 = time.time()
        sec = {}  # per-section timing -> manifest (scaling diagnostics)
        # ---- 1. politeness admission (seq order, per-host budget) ----
        if len(pending_df) <= DRIVER_PATH_MAX_ROWS:
            marked = _admit_driver(pending_df, cfg.per_host_per_wave)
        else:
            marked = _admit_ray(
                ray.data.from_pandas(pending_df), cfg.per_host_per_wave
            )
        admitted = marked.loc[marked["admit"]].drop(columns=["admit"])
        deferred = marked.loc[~marked["admit"]].drop(columns=["admit"])
        sec["admit"] = round(time.time() - wave_t0, 3)

        # ---- 2. relative / robots gates (precomputed at candidate prep,
        # inside the distributed wave task — here just column reads) ----
        t_sec = time.time()
        rel_mask = admitted["is_rel"].to_numpy(dtype=bool)
        rob_mask = admitted["robots_blocked"].to_numpy(dtype=bool)
        norun_mask = rel_mask | rob_mask
        norun = admitted.loc[norun_mask]
        to_fetch = admitted.loc[~norun_mask]

        ledger_dir = ckpt.wave_dir(out_dir, "ledger", wave)
        os.makedirs(ledger_dir, exist_ok=True)
        if len(norun):
            norun_rows = _norun_ledger_rows(
                norun, wave, rel_mask[norun_mask], rob_mask[norun_mask]
            )
            pq.write_table(
                pa.Table.from_pandas(norun_rows, preserve_index=False),
                os.path.join(ledger_dir, "norun.parquet"),
            )

        sec["gates"] = round(time.time() - t_sec, 3)
        t_sec = time.time()
        # ---- 3. fetch -> extract -> score -> ledger write -> links ----
        # the whole chain is ONE fused per-bucket task (_wave_task): each
        # task reads exactly one page-table bucket file (partitioned hash
        # join, no sort shuffle), writes its own ledger partition, and
        # returns only prepared candidate rows — a single Ray Data execution
        # and a single small driver pull per wave.
        cand_df = _empty_candidates_df()
        wave_fn = _wave_task(pages_dir, lexicon_ref, cfg, wave, ledger_dir, robots_actors)
        if len(to_fetch) and len(to_fetch) <= SMALL_WAVE_MAX_ROWS:
            # local fast path: same kernel, no cluster fan-out
            cand_df = pd.concat(
                [
                    wave_fn(g.reset_index(drop=True))
                    for _, g in to_fetch.groupby("bucket", sort=True)
                ],
                ignore_index=True,
            )
        elif len(to_fetch):
            # task granularity is decoupled from the bucket count: bucket
            # groups are LPT-bin-packed into ~2x cluster CPUs blocks (a task
            # handles several buckets, still reading one bucket file each),
            # emitted largest-first so the wave barrier isn't stretched by a
            # big block landing last.  Hundreds of tiny tasks would serialize
            # on driver dispatch; a handful of huge ones would straggle.
            groups = [
                g.reset_index(drop=True)
                for _, g in to_fetch.groupby("bucket", sort=True)
            ]
            cpus = int(ray.cluster_resources().get("CPU", 8))
            nbins = max(8, min(4 * cpus, len(groups)))
            bins: list[list[pd.DataFrame]] = [[] for _ in range(nbins)]
            sizes = np.zeros(nbins, dtype=np.int64)
            for g in sorted(groups, key=len, reverse=True):
                i = int(sizes.argmin())
                bins[i].append(g)
                sizes[i] += len(g)
            order = np.argsort(-sizes)
            blocks = [
                pd.concat(bins[i], ignore_index=True) for i in order if bins[i]
            ]
            ds = ray.data.from_pandas(blocks)
            kwargs = {}
            if score_concurrency:
                kwargs["concurrency"] = score_concurrency
            cand_df = ds.map_batches(
                wave_fn, batch_format="pandas", batch_size=None, **kwargs
            ).to_pandas()
        stats.skipped_relative += int(rel_mask.sum())
        stats.robots_blocked += int(rob_mask.sum())
        sec["fetch_score"] = round(time.time() - t_sec, 3)
        t_sec = time.time()

        # ---- 4. candidate insertion ----
        if len(cand_df) <= DRIVER_PATH_MAX_ROWS:
            new_rows = _insert_driver(cand_df, seen_shards, next_seq, cfg)
        else:
            new_rows = _insert_ray(
                ray.data.from_pandas(cand_df), seen_shards, next_seq, cfg
            )
        next_seq += len(new_rows)
        stats.inserted += len(new_rows)
        sec["insert"] = round(time.time() - t_sec, 3)
        t_sec = time.time()

        # ---- 5. next frontier + checkpoint ----
        pending_df = pd.concat(
            [deferred, new_rows], ignore_index=True
        ) if len(new_rows) else deferred.reset_index(drop=True)
        _write_frontier(pending_df, ckpt.wave_dir(out_dir, "frontier", wave + 1))
        snap_paths = ckpt.write_seen_snapshots(out_dir, wave + 1, snapshot_all(seen_shards))
        ckpt.write_manifest(
            out_dir,
            wave,
            {
                "wave": wave,
                "next_seq": next_seq,
                "inserted": stats.inserted,
                "fetched": stats.fetched,
                "failed": stats.failed,
                "pending": int(len(pending_df)),
                "seen_snapshots": snap_paths,
                "wave_sec": round(time.time() - wave_t0, 3),
                "sections": {**sec, "ckpt": round(time.time() - t_sec, 3)},
            },
        )
        stats.per_wave.append(
            {"wave": wave, "admitted": int(len(admitted)), "pending": int(len(pending_df)),
             "sec": round(time.time() - wave_t0, 3)}
        )
        wave += 1

    stats.waves = wave
    # fetch/fail/reject counters from the ledger partitions (single columnar
    # pass at the end instead of a driver pull of text per wave)
    import glob

    parts = glob.glob(os.path.join(out_dir, "ledger", "wave=*", "*.parquet"))
    import pyarrow.compute as pc

    for p in parts:
        t = pq.read_table(p, columns=["downloaded", "downloaded_failed", "rejected"])
        stats.fetched += int(pc.sum(t["downloaded"]).as_py() or 0)
        stats.failed += int(pc.sum(t["downloaded_failed"]).as_py() or 0)
        stats.rejected += int(pc.sum(t["rejected"]).as_py() or 0)
    stats.elapsed_sec = time.time() - t0
    return stats


def _explode_links(b: pd.DataFrame) -> pd.DataFrame:
    parent, qid, url, ordn = [], [], [], []
    for seq, q, links in zip(b["seq"], b["query_id"], b["links"]):
        for li, href in enumerate(links):
            parent.append(seq)
            qid.append(q)
            url.append(href)
            ordn.append(li)
    return pd.DataFrame(
        {
            "url": pd.Series(url, dtype="object"),
            "query_id": pd.Series(qid, dtype="int64"),
            "engine": pd.Series(["link"] * len(url), dtype="object"),
            "ord1": pd.Series(parent, dtype="int64"),
            "ord2": pd.Series(ordn, dtype="int64"),
        }
    )


def _read_frontier(path_dir: str) -> pd.DataFrame:
    files = sorted(
        os.path.join(path_dir, f)
        for f in os.listdir(path_dir)
        if f.endswith(".parquet")
    )
    return pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()


def load_ledger(out_dir: str, include_pending: bool = True) -> pd.DataFrame:
    """Read the full ledger (all wave partitions), sorted by seq.

    With include_pending, frontier rows never fetched are appended with
    wave=-1 and all flags false — matching the oracle's ledger of inserted
    rows."""
    import glob

    parts = sorted(glob.glob(os.path.join(out_dir, "ledger", "wave=*", "*.parquet")))
    if parts:
        import pyarrow.dataset as pads

        # multithreaded C++ scan across the many per-bucket partition files
        ledger = pads.dataset(parts, format="parquet").to_table().to_pandas()
    else:
        ledger = pd.DataFrame(columns=LEDGER_META_COLS)
    if include_pending:
        fdirs = sorted(glob.glob(os.path.join(out_dir, "frontier", "wave=*")))
        if fdirs:
            pend = _read_frontier(fdirs[-1])
            if len(pend):
                rows = _norun_ledger_rows(
                    pend, -1, np.zeros(len(pend), dtype=bool), np.zeros(len(pend), dtype=bool)
                )
                rows["handled"] = False
                rows["wave"] = np.int64(-1)
                ledger = pd.concat([ledger, rows], ignore_index=True)
    ledger = ledger.sort_values("seq", kind="mergesort").reset_index(drop=True)
    return ledger[LEDGER_META_COLS]

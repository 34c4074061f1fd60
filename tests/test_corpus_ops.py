"""Tests for the corpus-statistics operators added in round 3:
duplicated-n-gram fraction (CCNet/RefinedWeb signal), exact global NTILE
quality binning, and per-doc top-k TF-IDF terms."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


def _docs(rows):
    import ray.data

    return ray.data.from_pandas(pd.DataFrame(rows))


# ---------------------------------------------------------------------------
# SQL-oracle conformance (the same gate the driver runs, at sf0.001)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    ["dup_ngram_fraction", "doc_quality_ranks", "doc_signatures",
     "tfidf_top_terms"],
)
def test_matches_duckdb_oracle(name):
    import duckdb

    import __ray_entry__ as e
    from scripts.check_correctness import to_pandas, value_hash

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    mine = to_pandas(e.queries()[name](SF))
    theirs = con.execute(e.oracle_sql()[name]).df()
    assert len(mine) == len(theirs)
    assert sorted(mine.columns) == sorted(theirs.columns)
    assert value_hash(mine) == value_hash(theirs)


# ---------------------------------------------------------------------------
# dup_ngram_fraction
# ---------------------------------------------------------------------------


class TestDupNgramFraction:
    def test_planted_duplicate_is_attributed_to_owner(self):
        from webcrawl_lowres_lang_ray.stages.dedup import dup_ngram_fraction

        base = "one two three four five six seven eight"
        rows = [
            {"doc_id": 0, "text": base},                       # owner of all its 5-grams
            {"doc_id": 1, "text": base},                       # exact clone -> all dup
            {"doc_id": 2, "text": "alpha beta gamma delta epsilon zeta"},
            {"doc_id": 3, "text": "too short"},                # <5 words -> absent
        ]
        out = (
            dup_ngram_fraction(_docs(rows), n=5)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert 3 not in out.index
        assert out.loc[0, "n_dup"] == 0 and out.loc[0, "dup_fraction"] == 0.0
        assert out.loc[1, "n_dup"] == out.loc[1, "n_shingles"]
        assert out.loc[1, "dup_fraction"] == 1.0
        assert out.loc[2, "n_dup"] == 0

    def test_partial_overlap_fraction(self):
        from webcrawl_lowres_lang_ray.stages.dedup import dup_ngram_fraction

        rows = [
            {"doc_id": 0, "text": "a b c d e f"},              # 5-grams: abcde, bcdef
            {"doc_id": 1, "text": "a b c d e x"},              # abcde (dup), bcdex (new)
        ]
        out = dup_ngram_fraction(_docs(rows), n=5).to_pandas().set_index("doc_id")
        assert out.loc[1, "n_shingles"] == 2
        assert out.loc[1, "n_dup"] == 1
        assert out.loc[1, "dup_fraction"] == 0.5

    def test_within_doc_repeat_counts_once(self):
        from webcrawl_lowres_lang_ray.stages.dedup import dup_ngram_fraction

        # the same 5-gram appearing twice in one doc is ONE distinct shingle
        rows = [{"doc_id": 0, "text": "a b c d e a b c d e"}]
        out = dup_ngram_fraction(_docs(rows), n=5).to_pandas()
        assert int(out.loc[0, "n_shingles"]) == 5  # 6 windows, window 5 == window 0
        assert int(out.loc[0, "n_dup"]) == 0


# ---------------------------------------------------------------------------
# quality_ntile
# ---------------------------------------------------------------------------


def _ntile_oracle(df: pd.DataFrame, k: int) -> pd.Series:
    order = df.sort_values(["n_chars", "doc_id"], kind="mergesort").reset_index()
    n = len(order)
    size, rem = divmod(n, k)
    buckets = np.empty(n, dtype=np.int64)
    pos = 0
    for b in range(1, k + 1):
        cnt = size + (1 if b <= rem else 0)
        buckets[pos : pos + cnt] = b
        pos += cnt
    return pd.Series(buckets, index=order["doc_id"].to_numpy()).sort_index()


class TestQualityNtile:
    @pytest.mark.parametrize("n,k", [(7, 10), (10, 3), (23, 4)])
    def test_matches_serial_ntile(self, n, k):
        from webcrawl_lowres_lang_ray.stages.textstats import quality_ntile

        rng = np.random.RandomState(5)
        df = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                # heavy ties: only 3 distinct lengths
                "n_chars": rng.choice([10, 20, 30], size=n).astype(np.int64),
            }
        )
        out = (
            quality_ntile(_docs(df.to_dict("records")), k=k)
            .to_pandas()
            .set_index("doc_id")["decile"]
            .sort_index()
        )
        expect = _ntile_oracle(df, k)
        assert (out.to_numpy() == expect.to_numpy()).all()

    def test_tie_run_straddles_bucket_boundary(self):
        from webcrawl_lowres_lang_ray.stages.textstats import quality_ntile

        # 6 rows, k=2: rows 2 and 3 share n_chars but land in different
        # buckets, tie-broken by doc_id — the case a boundaries-only
        # quantile implementation gets wrong
        df = pd.DataFrame(
            {
                "doc_id": np.arange(6, dtype=np.int64),
                "n_chars": np.array([1, 1, 5, 5, 5, 9], dtype=np.int64),
            }
        )
        out = (
            quality_ntile(_docs(df.to_dict("records")), k=2)
            .to_pandas()
            .set_index("doc_id")["decile"]
            .sort_index()
        )
        assert out.tolist() == [1, 1, 1, 2, 2, 2]


# ---------------------------------------------------------------------------
# tfidf_top_terms
# ---------------------------------------------------------------------------


class TestTfidfTopTerms:
    def test_matches_brute_force(self):
        from webcrawl_lowres_lang_ray.stages.textstats import (
            round_half_away,
            tfidf_top_terms,
        )

        rows = [
            {"doc_id": 0, "text": "apple apple banana cherry"},
            {"doc_id": 1, "text": "banana cherry cherry durian"},
            {"doc_id": 2, "text": "apple durian durian durian elder"},
            {"doc_id": 3, "text": ""},  # no tokens -> absent
        ]
        out = (
            tfidf_top_terms(_docs(rows), topk=2)
            .to_pandas()
            .sort_values(["doc_id", "rk"])
            .reset_index(drop=True)
        )
        # brute force
        docs = {r["doc_id"]: r["text"].split() for r in rows if r["text"]}
        n = len(rows)
        df = {}
        for ws in docs.values():
            for w in set(ws):
                df[w] = df.get(w, 0) + 1
        expect = []
        for d, ws in docs.items():
            scored = {}
            for w in set(ws):
                scored[w] = float(
                    round_half_away(ws.count(w) * np.log(n / df[w]), 4)
                )
            top = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
            for rk, (w, s) in enumerate(top, 1):
                expect.append((d, w, s, rk))
        exp_df = pd.DataFrame(expect, columns=["doc_id", "token", "tfidf", "rk"])
        pd.testing.assert_frame_equal(out, exp_df, check_dtype=False)
        assert 3 not in set(out["doc_id"])

    def test_partition_partial_topk_is_lossless(self):
        """Global top-k must survive token-hash partitioning: craft a doc
        whose best terms hash to different partitions (parts=2 forces
        splits) and check ranks are still globally correct."""
        from webcrawl_lowres_lang_ray.stages.textstats import tfidf_top_terms

        rows = [
            {"doc_id": 0, "text": "aa bb cc dd ee ff gg hh"},
            {"doc_id": 1, "text": "aa bb"},
        ]
        out = (
            tfidf_top_terms(_docs(rows), topk=3, parts=2)
            .to_pandas()
            .sort_values(["doc_id", "rk"])
        )
        d0 = out[out["doc_id"] == 0]
        # doc 0's unique terms (cc..hh, idf=ln 2) outrank shared aa/bb (idf 0)
        assert d0["token"].tolist() == ["cc", "dd", "ee"]
        assert d0["rk"].tolist() == [1, 2, 3]


# ---------------------------------------------------------------------------
# semantic_dedup (SemDeDup)
# ---------------------------------------------------------------------------


class TestSemanticDedup:
    def _run(self, tau=0.95, ncluster=4):
        import ray.data

        from webcrawl_lowres_lang_ray.stages.ann import semantic_dedup

        rng = np.random.RandomState(11)
        base = rng.randn(20, 8)
        # plant near-dup pairs: vec 20+i = tiny perturbation of vec i (i<5)
        dups = base[:5] + 0.001 * rng.randn(5, 8)
        mat = np.vstack([base, dups])
        df = pd.DataFrame(
            {
                "vec_id": np.arange(len(mat), dtype=np.int64),
                "embedding": [v.astype(np.float32).tolist() for v in mat],
            }
        )
        out = (
            semantic_dedup(ray.data.from_pandas(df), ncluster=ncluster, tau=tau)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        return mat, out

    def test_planted_neardups_dropped_first_wins(self):
        mat, out = self._run()
        assert len(out) == 25
        kept = out[out["keep"]]["vec_id"].to_numpy()
        dropped = out[~out["keep"]]["vec_id"].to_numpy()
        # each planted clone (20..24) of an earlier vec must be dropped
        # WHEN it shares a cluster with its original (tiny perturbation ->
        # same centroid); originals 0..4 are kept (lowest id wins)
        clus = out.set_index("vec_id")["cluster"]
        for i in range(5):
            if clus[i] == clus[20 + i]:
                assert 20 + i in dropped
            assert i in kept

    def test_greedy_invariants(self):
        mat, out = self._run()
        normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        by_cluster = out.groupby("cluster")
        for _, g in by_cluster:
            g = g.sort_values("vec_id")
            kept_ids = g[g["keep"]]["vec_id"].to_numpy()
            # kept items are pairwise below tau
            if len(kept_ids) > 1:
                km = normed[kept_ids]
                sims = km @ km.T
                np.fill_diagonal(sims, 0)
                assert sims.max() < 0.95
            # every dropped item has an earlier kept item above tau
            for _, row in g[~g["keep"]].iterrows():
                earlier = kept_ids[kept_ids < row["vec_id"]]
                assert len(earlier) > 0
                assert (normed[earlier] @ normed[int(row["vec_id"])]).max() >= 0.95
                assert row["max_sim"] >= 0.95

    def test_determinism(self):
        _, out1 = self._run()
        _, out2 = self._run()
        pd.testing.assert_frame_equal(out1, out2)


# ---------------------------------------------------------------------------
# lm_perplexity
# ---------------------------------------------------------------------------


class TestLmPerplexity:
    def test_target_lang_scores_lower(self):
        """Docs from the training language must average lower cross-entropy
        than out-of-domain docs under the en-trained LM (sf0.001 corpus)."""
        import ray.data

        from webcrawl_lowres_lang_ray.stages.lm import lm_perplexity

        docs = ray.data.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
        )
        out = lm_perplexity(docs, target_lang="en").to_pandas()
        langs = pd.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "lang"]
        )
        j = out.merge(langs, on="doc_id")
        j = j[j["n_bigrams"] > 0]
        en = j[j["lang"] == "en"]["xent"].mean()
        other = j[j["lang"] != "en"]["xent"].mean()
        assert en < other

    def test_known_counts_and_short_docs(self):
        import ray.data

        from webcrawl_lowres_lang_ray.stages.lm import lm_perplexity

        rows = [
            {"doc_id": 0, "text": "a b c d", "lang": "en"},   # 3 bigrams
            {"doc_id": 1, "text": "a", "lang": "en"},          # 0 bigrams
            {"doc_id": 2, "text": "", "lang": "zh"},           # 0 bigrams
        ]
        out = (
            lm_perplexity(ray.data.from_pandas(pd.DataFrame(rows)))
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[0, "n_bigrams"] == 3
        assert out.loc[0, "ppl"] == pytest.approx(2.0 ** out.loc[0, "xent"], rel=1e-3)
        for d in (1, 2):
            assert out.loc[d, "n_bigrams"] == 0
            assert out.loc[d, "xent"] == 0.0 and out.loc[d, "ppl"] == 0.0

    def test_seen_bigrams_beat_unseen(self):
        import ray.data

        from webcrawl_lowres_lang_ray.stages.lm import lm_perplexity

        rows = [
            {"doc_id": 0, "text": "the cat sat on the mat", "lang": "en"},
            {"doc_id": 1, "text": "the cat sat on the mat", "lang": "en"},
            {"doc_id": 2, "text": "zzz qqq www eee rrr ttt", "lang": "zh"},
        ]
        out = (
            lm_perplexity(ray.data.from_pandas(pd.DataFrame(rows)))
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[0, "xent"] < out.loc[2, "xent"]

    def test_determinism_across_runs(self):
        import ray.data

        from webcrawl_lowres_lang_ray.stages.lm import lm_perplexity

        docs = ray.data.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
        )
        a = lm_perplexity(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = lm_perplexity(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# BPE tokenizer (train + encode)
# ---------------------------------------------------------------------------


def _serial_bpe_train(word_counts: dict, num_merges: int):
    """Reference serial BPE trainer (Sennrich et al. 2016 pseudocode)."""
    from webcrawl_lowres_lang_ray.stages.bpe import EOW, _apply_merge_row

    table = {tuple(list(w) + [EOW]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, c in table.items():
            for a, b in zip(syms[:-1], syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        # deterministic: count desc, then lexicographically smallest pair
        top = max(pairs.values())
        cands = sorted([p for p, n in pairs.items() if n == top])
        pair = cands[0]
        if top < 2:
            break
        merges.append(pair)
        a, b = pair
        merged = a + b
        table = {
            tuple(_apply_merge_row(list(k), a, b, merged)): c
            for k, c in table.items()
        }
    return merges


class TestBpe:
    CORPUS = [
        {"doc_id": 0, "text": "low lower lowest low low"},
        {"doc_id": 1, "text": "new newer newest new"},
        {"doc_id": 2, "text": "wider wide wide widest"},
    ]

    def test_train_matches_serial_reference(self):
        from collections import Counter

        from webcrawl_lowres_lang_ray.stages.bpe import bpe_train

        wc = Counter()
        for r in self.CORPUS:
            wc.update(r["text"].split())
        expect = _serial_bpe_train(dict(wc), 12)
        got = bpe_train(_docs(self.CORPUS), num_merges=12)
        assert got == expect

    def test_encode_matches_training_rewrite(self):
        """Greedy rank-order encoding of a word must equal sequentially
        applying the merge list (the training-side rewrite)."""
        from collections import Counter

        from webcrawl_lowres_lang_ray.stages.bpe import (
            EOW,
            _apply_merge_row,
            bpe_encode_word,
            bpe_train,
        )

        wc = Counter()
        for r in self.CORPUS:
            wc.update(r["text"].split())
        merges = bpe_train(_docs(self.CORPUS), num_merges=12)
        ranks = {m: i for i, m in enumerate(merges)}
        for w in wc:
            syms = list(w) + [EOW]
            for a, b in merges:
                syms = _apply_merge_row(syms, a, b, a + b)
            assert bpe_encode_word(w, ranks) == syms, w

    def test_token_stats_pipeline(self):
        from webcrawl_lowres_lang_ray.stages.bpe import bpe_token_stats

        out = (
            bpe_token_stats(_docs(self.CORPUS), num_merges=12)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert len(out) == 3
        # frequent words compress: fewer bpe tokens than chars, at least
        # one token per word
        assert (out["bpe_tokens"] >= out["n_words"]).all()
        assert (out["chars_per_token"] > 0).all()
        # "low" appears 4x -> should be a single token after 12 merges on
        # this tiny corpus; doc 0 has 5 words, so tokens < character count
        chars0 = len(self.CORPUS[0]["text"])
        assert out.loc[0, "bpe_tokens"] < chars0

    def test_determinism(self):
        from webcrawl_lowres_lang_ray.stages.bpe import bpe_train

        a = bpe_train(_docs(self.CORPUS), num_merges=8)
        b = bpe_train(_docs(self.CORPUS), num_merges=8)
        assert a == b


# ---------------------------------------------------------------------------
# running windows + generic hash join
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["user_window_stats", "order_customer_join"])
def test_window_join_match_duckdb_oracle(name):
    import duckdb
    import glob
    import os

    import __ray_entry__ as e
    from scripts.check_correctness import to_pandas, value_hash

    con = duckdb.connect()
    for p in glob.glob(f"{SF}/*.parquet"):
        con.execute(
            f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM read_parquet('{p}')"
        )
    mine = to_pandas(e.queries()[name](SF))
    theirs = con.execute(e.oracle_sql()[name]).df()
    assert len(mine) == len(theirs)
    assert sorted(mine.columns) == sorted(theirs.columns)
    assert value_hash(mine) == value_hash(theirs)


class TestHashJoin:
    def test_inner_join_matches_pandas(self):
        import ray.data

        from webcrawl_lowres_lang_ray.stages.join import hash_join

        rng = np.random.RandomState(3)
        left = pd.DataFrame(
            {
                "k": rng.randint(0, 20, size=100).astype(np.int64),
                "lv": np.arange(100, dtype=np.int64),
            }
        )
        right = pd.DataFrame(
            {
                "rk": np.arange(0, 15, dtype=np.int64),  # keys 15..19 unmatched
                "rv": np.arange(100, 115, dtype=np.int64),
            }
        )
        got = (
            hash_join(
                ray.data.from_pandas(left),
                ray.data.from_pandas(right),
                left_key="k",
                right_key="rk",
                parts=8,
            )
            .to_pandas()
            .sort_values(["lv"])
            .reset_index(drop=True)
        )
        expect = (
            left.merge(right, left_on="k", right_on="rk", how="inner")
            .sort_values(["lv"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[expect.columns.tolist()], expect
        )
        # int dtypes survive the mixed-schema union shuffle
        assert got["lv"].dtype == np.int64 and got["rv"].dtype == np.int64

    def test_left_join_keeps_unmatched(self):
        import ray.data

        from webcrawl_lowres_lang_ray.stages.join import hash_join

        left = pd.DataFrame({"k": np.array([1, 2, 3], dtype=np.int64)})
        right = pd.DataFrame(
            {"k": np.array([2], dtype=np.int64), "rv": np.array([7], dtype=np.int64)}
        )
        got = (
            hash_join(
                ray.data.from_pandas(left),
                ray.data.from_pandas(right),
                left_key="k",
                how="left",
                parts=4,
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert got["k"].tolist() == [1, 2, 3]
        assert got["rv"].isna().tolist() == [True, False, True]


class TestRunningWindows:
    def test_matches_pandas_window(self):
        import ray.data

        from webcrawl_lowres_lang_ray.stages.windows import running_window_cols

        rng = np.random.RandomState(9)
        n = 200
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "user_id": rng.randint(0, 10, size=n).astype(np.int64),
                "ts": pd.Timestamp("2026-01-01")
                + pd.to_timedelta(rng.randint(0, 10_000, size=n), unit="s"),
                "value": np.round(rng.uniform(0, 100, size=n), 2),
            }
        )
        got = (
            running_window_cols(ray.data.from_pandas(df), parts=8)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        s = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        grp = s.groupby("user_id", sort=False)
        s = s.assign(
            rn=(grp.cumcount() + 1).astype(np.int64),
            cum_value=grp["value"].cumsum().round(2),
            prev_value=grp["value"].shift(1).fillna(0.0).round(2),
        )
        expect = (
            s[["event_id", "user_id", "rn", "cum_value", "prev_value"]]
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, expect)


# ---------------------------------------------------------------------------
# z-score + compression ratio
# ---------------------------------------------------------------------------


def test_user_value_zscore_matches_duckdb_oracle():
    import duckdb
    import glob
    import os

    import __ray_entry__ as e
    from scripts.check_correctness import to_pandas, value_hash

    con = duckdb.connect()
    for p in glob.glob(f"{SF}/*.parquet"):
        con.execute(
            f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM read_parquet('{p}')"
        )
    mine = to_pandas(e.queries()["user_value_zscore"](SF))
    theirs = con.execute(e.oracle_sql()["user_value_zscore"]).df()
    assert len(mine) == len(theirs)
    assert value_hash(mine) == value_hash(theirs)


class TestCompressionRatio:
    def test_repetitive_compresses_more(self):
        from webcrawl_lowres_lang_ray.stages.textstats import (
            compression_ratio_batch,
        )

        b = pd.DataFrame(
            {
                "doc_id": np.array([0, 1, 2], dtype=np.int64),
                "text": [
                    "spam " * 200,                          # highly repetitive
                    "the quick brown fox jumps over it",    # normal prose
                    "",                                      # empty
                ],
            }
        )
        out = compression_ratio_batch(b).set_index("doc_id")
        assert out.loc[0, "compression_ratio"] < out.loc[1, "compression_ratio"]
        assert out.loc[2, "raw_bytes"] == 0 and out.loc[2, "compressed_bytes"] == 0

    def test_pipeline_deterministic(self):
        import __ray_entry__ as e
        from scripts.check_correctness import to_pandas

        a = to_pandas(e.queries()["doc_compression"](SF)).sort_values("doc_id")
        b = to_pandas(e.queries()["doc_compression"](SF)).sort_values("doc_id")
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )
        assert (a["compression_ratio"] > 0).sum() > 400


class TestSaltedHashJoin:
    def test_matches_pandas_with_hot_key_and_dup_right_rows(self):
        import ray.data

        from webcrawl_lowres_lang_ray.stages.join import salted_hash_join

        rng = np.random.RandomState(7)
        # key 5 is hot: 300 of 400 left rows
        keys = np.concatenate(
            [np.full(300, 5), rng.randint(0, 20, size=100)]
        ).astype(np.int64)
        left = pd.DataFrame({"k": keys, "lv": np.arange(len(keys), dtype=np.int64)})
        # right has a legitimately DUPLICATED row for the hot key
        right = pd.DataFrame(
            {
                "k": np.array([5, 5, 2, 7], dtype=np.int64),
                "rv": np.array([100, 100, 102, 107], dtype=np.int64),
            }
        )
        got = (
            salted_hash_join(
                ray.data.from_pandas(left),
                ray.data.from_pandas(right),
                left_key="k",
                hot_keys=(5,),
                salt_n=4,
                parts=8,
            )
            .to_pandas()
            .sort_values(["lv", "rv"])
            .reset_index(drop=True)
        )
        expect = (
            left.merge(right, on="k", how="inner")
            .sort_values(["lv", "rv"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[expect.columns.tolist()], expect)

    def test_no_hot_keys_equals_plain_join(self):
        import ray.data

        from webcrawl_lowres_lang_ray.stages.join import hash_join, salted_hash_join

        rng = np.random.RandomState(8)
        left = pd.DataFrame(
            {"k": rng.randint(0, 10, 50).astype(np.int64),
             "lv": np.arange(50, dtype=np.int64)}
        )
        right = pd.DataFrame(
            {"k": np.arange(10, dtype=np.int64), "rv": np.arange(10, dtype=np.int64)}
        )
        a = (
            salted_hash_join(
                ray.data.from_pandas(left), ray.data.from_pandas(right),
                left_key="k", parts=8,
            )
            .to_pandas().sort_values(["lv"]).reset_index(drop=True)
        )
        b = (
            hash_join(
                ray.data.from_pandas(left), ray.data.from_pandas(right),
                left_key="k", parts=8,
            )
            .to_pandas().sort_values(["lv"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a[b.columns.tolist()], b)


def test_events_user_salted_join_matches_duckdb_oracle():
    import duckdb
    import glob
    import os

    import __ray_entry__ as e
    from scripts.check_correctness import to_pandas, value_hash

    con = duckdb.connect()
    for p in glob.glob(f"{SF}/*.parquet"):
        con.execute(
            f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM read_parquet('{p}')"
        )
    mine = to_pandas(e.queries()["events_user_salted_join"](SF))
    theirs = con.execute(e.oracle_sql()["events_user_salted_join"]).df()
    assert len(mine) == len(theirs)
    assert value_hash(mine) == value_hash(theirs)


def test_events_profile_matches_duckdb_oracle():
    import duckdb
    import glob
    import os

    import __ray_entry__ as e
    from scripts.check_correctness import to_pandas, value_hash

    con = duckdb.connect()
    for p in glob.glob(f"{SF}/*.parquet"):
        con.execute(
            f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM read_parquet('{p}')"
        )
    mine = to_pandas(e.queries()["events_profile"](SF))
    theirs = con.execute(e.oracle_sql()["events_profile"]).df()
    assert len(mine) == len(theirs)
    assert value_hash(mine) == value_hash(theirs)


def test_table_profile_nulls_and_empty_column():
    import ray.data

    from webcrawl_lowres_lang_ray.stages.profile import table_profile

    df = pd.DataFrame(
        {
            "a": pd.array([1, None, 3, None], dtype="Int64"),
            "b": [None, None, None, None],
            "c": ["x", "y", "x", None],
        }
    )
    out = table_profile(ray.data.from_pandas(df), ["a", "b", "c"]).set_index("column")
    assert out.loc["a", "n_null"] == 2 and out.loc["a", "n_distinct"] == 2
    assert out.loc["b", "n_null"] == 4 and out.loc["b", "n_distinct"] == 0
    assert out.loc["b", "min_v"] is None or pd.isna(out.loc["b", "min_v"])
    assert out.loc["c", "min_v"] == "x" and out.loc["c", "max_v"] == "y"


@pytest.mark.parametrize("name", ["events_pivot", "events_props_extract", "label_centroids"])
def test_round3_late_queries_match_duckdb_oracle(name):
    import duckdb
    import glob
    import os

    import __ray_entry__ as e
    from scripts.check_correctness import to_pandas, value_hash

    con = duckdb.connect()
    for p in glob.glob(f"{SF}/*.parquet"):
        con.execute(
            f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM read_parquet('{p}')"
        )
    mine = to_pandas(e.queries()[name](SF))
    theirs = con.execute(e.oracle_sql()[name]).df()
    assert len(mine) == len(theirs)
    assert sorted(mine.columns) == sorted(theirs.columns)
    assert value_hash(mine) == value_hash(theirs)


def test_user_window_stats_matches_duckdb_oracle():
    import duckdb
    import glob
    import os

    import __ray_entry__ as e
    from scripts.check_correctness import to_pandas, value_hash

    con = duckdb.connect()
    for p in glob.glob(f"{SF}/*.parquet"):
        con.execute(
            f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM read_parquet('{p}')"
        )
    mine = to_pandas(e.queries()["user_window_stats"](SF))
    theirs = con.execute(e.oracle_sql()["user_window_stats"]).df()
    assert len(mine) == len(theirs)
    assert value_hash(mine) == value_hash(theirs)


def test_events_unpivot_roundtrips_pivot():
    """melt(pivot(x)) must equal the direct (user, type) counts — and the
    registered SQL oracle is exactly that direct aggregation."""
    import duckdb
    import glob
    import os

    import __ray_entry__ as e
    from scripts.check_correctness import to_pandas, value_hash

    con = duckdb.connect()
    for p in glob.glob(f"{SF}/*.parquet"):
        con.execute(
            f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM read_parquet('{p}')"
        )
    mine = to_pandas(e.queries()["events_unpivot"](SF))
    theirs = con.execute(e.oracle_sql()["events_unpivot"]).df()
    assert len(mine) == len(theirs)
    assert value_hash(mine) == value_hash(theirs)


class TestWinnowNeardup:
    def _brute(self, rows, window, select, min_shared):
        from webcrawl_lowres_lang_ray.stages.textstats import winnow_fingerprints

        fps = {r["doc_id"]: set(winnow_fingerprints(r["text"], window, select)) for r in rows}
        out = []
        ids = sorted(fps)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                shared = len(fps[a] & fps[b])
                if shared >= min_shared:
                    out.append((a, b, shared))
        return sorted(out)

    def test_matches_brute_force(self):
        import ray.data

        from webcrawl_lowres_lang_ray.stages.dedup import winnow_neardup_pairs

        rng = np.random.RandomState(12)
        vocab = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
        rows = []
        for i in range(30):
            words = [vocab[j] for j in rng.randint(0, len(vocab), size=25)]
            rows.append({"doc_id": i, "text": " ".join(words)})
            if i % 4 == 0:  # planted near-dup: copy with a small edit
                w2 = list(words)
                w2[5] = vocab[rng.randint(0, len(vocab))]
                rows.append({"doc_id": 100 + i, "text": " ".join(w2)})
        got = (
            winnow_neardup_pairs(
                ray.data.from_pandas(pd.DataFrame(rows)), min_shared=3
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        expect = self._brute(rows, 16, 8, 3)
        assert list(map(tuple, got.to_numpy())) == expect
        # the planted copies must appear
        planted = {(i, 100 + i) for i in range(0, 30, 4)}
        assert planted <= set(zip(got["id_a"], got["id_b"]))

    def test_clone_shares_all_fingerprints(self):
        import ray.data

        from webcrawl_lowres_lang_ray.stages.dedup import winnow_neardup_pairs
        from webcrawl_lowres_lang_ray.stages.textstats import winnow_fingerprints

        text = "the quick brown fox jumps over the lazy dog again and again"
        rows = [{"doc_id": 0, "text": text}, {"doc_id": 1, "text": text}]
        got = winnow_neardup_pairs(
            ray.data.from_pandas(pd.DataFrame(rows)), min_shared=1
        ).to_pandas()
        assert len(got) == 1
        assert got.iloc[0]["shared_fps"] == len(set(winnow_fingerprints(text, 16, 8)))


class TestTableChecksum:
    def test_matches_duckdb_oracle(self):
        import duckdb
        import glob
        import os

        import __ray_entry__ as e
        from scripts.check_correctness import to_pandas, value_hash

        con = duckdb.connect()
        for p in glob.glob(f"{SF}/*.parquet"):
            con.execute(
                f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM read_parquet('{p}')"
            )
        mine = to_pandas(e.queries()["doc_table_checksum"](SF))
        theirs = con.execute(e.oracle_sql()["doc_table_checksum"]).df()
        assert value_hash(mine) == value_hash(theirs)

    def test_order_insensitive_and_change_sensitive(self):
        import ray.data

        from webcrawl_lowres_lang_ray.stages.profile import table_checksum

        df = pd.DataFrame(
            {"doc_id": np.arange(50, dtype=np.int64),
             "text": [f"doc {i}" for i in range(50)]}
        )
        a = table_checksum(ray.data.from_pandas(df), ["doc_id", "text"])
        shuffled = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
        b = table_checksum(ray.data.from_pandas(shuffled), ["doc_id", "text"])
        pd.testing.assert_frame_equal(a, b)  # row order cannot matter
        df2 = df.copy()
        df2.loc[17, "text"] = "doc 17 CHANGED"
        c = table_checksum(ray.data.from_pandas(df2), ["doc_id", "text"])
        assert int(c["checksum"][0]) != int(a["checksum"][0])


class TestBloomFilteredJoin:
    def test_equals_plain_join_and_prunes(self):
        import ray.data

        from webcrawl_lowres_lang_ray.stages.join import (
            bloom_filtered_join,
            hash_join,
        )

        rng = np.random.RandomState(5)
        left = pd.DataFrame(
            {"k": rng.randint(0, 1000, size=500).astype(np.int64),
             "lv": np.arange(500, dtype=np.int64)}
        )
        # selective right side: only 5 keys survive
        right = pd.DataFrame(
            {"k": np.array([3, 7, 11, 13, 17], dtype=np.int64),
             "rv": np.arange(5, dtype=np.int64)}
        )
        a = (
            bloom_filtered_join(
                ray.data.from_pandas(left), ray.data.from_pandas(right),
                left_key="k", parts=8,
            )
            .to_pandas().sort_values(["lv"]).reset_index(drop=True)
        )
        b = (
            hash_join(
                ray.data.from_pandas(left), ray.data.from_pandas(right),
                left_key="k", parts=8,
            )
            .to_pandas().sort_values(["lv"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a[b.columns.tolist()], b)

    def test_sql_oracle(self):
        import duckdb
        import glob
        import os

        import __ray_entry__ as e
        from scripts.check_correctness import to_pandas, value_hash

        con = duckdb.connect()
        for p in glob.glob(f"{SF}/*.parquet"):
            con.execute(
                f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM read_parquet('{p}')"
            )
        mine = to_pandas(e.queries()["orders_building_bloom_join"](SF))
        theirs = con.execute(e.oracle_sql()["orders_building_bloom_join"]).df()
        assert value_hash(mine) == value_hash(theirs)


class TestRelationalRollupCorr:
    """orders_rollup / lineitem_corr vs DuckDB at sf0.001 (the same gate
    check_correctness.py runs at sf0.01)."""

    @pytest.mark.parametrize("name", ["orders_rollup", "lineitem_corr"])
    def test_matches_duckdb(self, name):
        import duckdb

        import __ray_entry__ as e
        from scripts.check_correctness import to_pandas, value_hash

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        for t in ("orders", "lineitem"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        mine = to_pandas(e.queries()[name](sf))
        theirs = con.execute(e.oracle_sql()[name]).df()
        assert len(mine) == len(theirs)
        assert sorted(mine.columns) == sorted(theirs.columns)
        assert value_hash(mine) == value_hash(theirs)

    def test_rollup_levels_are_consistent(self):
        import __ray_entry__ as e

        out = e.queries()["orders_rollup"]("/root/testdata/sf0.001")
        fine = out[(out["o_orderpriority"] != "ALL") & (out["o_orderstatus"] != "ALL")]
        mid = out[(out["o_orderpriority"] != "ALL") & (out["o_orderstatus"] == "ALL")]
        grand = out[(out["o_orderpriority"] == "ALL") & (out["o_orderstatus"] == "ALL")]
        assert len(grand) == 1
        assert fine["n_orders"].sum() == mid["n_orders"].sum() == grand["n_orders"].iloc[0]
        # subtotal prices add up exactly (integer-cent arithmetic)
        assert abs(fine["total_price"].sum() - grand["total_price"].iloc[0]) < 1e-6

    def test_corr_sign_sanity(self):
        import __ray_entry__ as e

        out = e.queries()["lineitem_corr"]("/root/testdata/sf0.001")
        # the synthetic lineitem draws price and quantity independently, so
        # corr ~ 0 — assert validity, not a sign: |corr| <= 1 and cov/corr
        # agree in sign
        assert (out["corr_price_qty"].abs() <= 1.0).all()
        assert (np.sign(out["corr_price_qty"]) == np.sign(out["cov_price_qty"])).all()
        assert (out["n_rows"] > 0).all()


class TestOuterJoin:
    def test_user_customer_outer_matches_duckdb(self):
        import duckdb

        import __ray_entry__ as e
        from scripts.check_correctness import to_pandas, value_hash

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        for t in ("events", "customer"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        mine = to_pandas(e.queries()["user_customer_outer"](sf))
        theirs = con.execute(e.oracle_sql()["user_customer_outer"]).df()
        assert len(mine) == len(theirs)
        assert value_hash(mine) == value_hash(theirs)
        # all three row classes occur (left-only, matched, right-only)
        assert (mine["n_events"] > 0).any() and (~mine["has_customer"]).any()
        assert ((mine["n_events"] > 0) & mine["has_customer"]).any()
        assert ((mine["n_events"] == 0) & mine["has_customer"]).any()

    def test_hash_join_outer_mode(self):
        import ray.data

        from webcrawl_lowres_lang_ray.stages.join import hash_join

        l = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]}))
        r = ray.data.from_pandas(pd.DataFrame({"k2": [2, 3, 4], "rv": [200, 300, 400]}))
        out = hash_join(l, r, left_key="k", right_key="k2", how="outer").to_pandas()
        assert len(out) == 4
        key = out["k"].fillna(out["k2"]).astype(int).tolist()
        assert sorted(key) == [1, 2, 3, 4]

"""Tests for the training-data curation stages (stages/curation.py):
benchmark decontamination, bloom-gated incremental dedup, source mixing
weights, DSIR importance scores."""

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
    [
        "doc_decontaminate",
        "doc_dedup_incremental",
        "source_mix_weights",
        "corpus_curate",
        "training_shards",
        "doc_pii_scrub",
        "token_budget_select",
        "cluster_representatives",
        "source_mix_sample",
        "source_cap_sample",
    ],
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
# decontamination
# ---------------------------------------------------------------------------


class TestDecontaminate:
    def test_planted_overlap_is_flagged(self):
        from webcrawl_lowres_lang_ray.stages.curation import decontaminate

        bench_text = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [
            {"doc_id": 0, "text": bench_text},  # benchmark doc (0 % 50 == 0)
            # training doc embedding a benchmark 5-gram:
            {"doc_id": 1, "text": "prefix words alpha beta gamma delta epsilon suffix"},
            {"doc_id": 2, "text": "totally unrelated sentence with many clean words here"},
            {"doc_id": 3, "text": "short"},  # < 5 words -> 0 ngrams
        ]
        out = decontaminate(_docs(rows), n=5, bench_mod=50).to_pandas()
        out = out.set_index("doc_id")
        assert bool(out.loc[1, "contaminated"]) is True
        assert out.loc[1, "overlap_ngrams"] >= 1
        assert bool(out.loc[2, "contaminated"]) is False
        assert out.loc[3, "n_ngrams"] == 0 and not out.loc[3, "contaminated"]
        assert 0 not in out.index  # benchmark docs are not scored

    def test_ngram_counts_are_distinct_counts(self):
        from webcrawl_lowres_lang_ray.stages.curation import _word_ngram_set

        # repeated 5-gram counts once
        t = "a b c d e a b c d e"
        grams = _word_ngram_set(t, 5)
        assert len(grams) == 5  # 6 positions, one repeat


# ---------------------------------------------------------------------------
# bloom filter + incremental dedup
# ---------------------------------------------------------------------------


class TestBloom:
    def test_no_false_negatives(self):
        import ray.data

        from webcrawl_lowres_lang_ray.functions.hashing import md5_batch
        from webcrawl_lowres_lang_ray.stages.curation import bloom_build, bloom_probe

        keys = [f"key-{i}" for i in range(5000)]
        hexes = list(md5_batch(keys))
        ds = ray.data.from_pandas(pd.DataFrame({"key_md5": hexes}))
        bitmap = np.frombuffer(bloom_build(ds, "key_md5"), dtype=np.uint8)
        assert bloom_probe(bitmap, hexes).all()  # one-sided: every member hits

    def test_false_positive_rate_bounded(self):
        import ray.data

        from webcrawl_lowres_lang_ray.functions.hashing import md5_batch
        from webcrawl_lowres_lang_ray.stages.curation import bloom_build, bloom_probe

        member = list(md5_batch([f"in-{i}" for i in range(5000)]))
        probe = list(md5_batch([f"out-{i}" for i in range(20000)]))
        ds = ray.data.from_pandas(pd.DataFrame({"key_md5": member}))
        bitmap = np.frombuffer(bloom_build(ds, "key_md5"), dtype=np.uint8)
        fp = bloom_probe(bitmap, probe).mean()
        # k=4, m=2^20, n=5000 -> theoretical ~1.3e-7; allow huge slack
        assert fp < 0.01

    def test_incremental_matches_bruteforce(self):
        from webcrawl_lowres_lang_ray.stages.curation import (
            content_key,
            incremental_dedup,
        )

        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(30)]
        # 40 shared openings (the dedup key is the first 8 words) + random tail
        prefixes = [" ".join(rng.choice(vocab, size=8)) for _ in range(400)]
        rows = [
            {
                "doc_id": i,
                "text": prefixes[int(rng.integers(len(prefixes)))]
                + " "
                + " ".join(rng.choice(vocab, size=4)),
            }
            for i in range(300)
        ]
        out = (
            incremental_dedup(_docs(rows), new_mod=5, k_words=8)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        prior = {
            content_key(r["text"], 8) for r in rows if r["doc_id"] % 5 != 0
        }
        expect = {
            r["doc_id"]: content_key(r["text"], 8) in prior
            for r in rows
            if r["doc_id"] % 5 == 0
        }
        assert len(out) == len(expect)
        got = dict(zip(out["doc_id"], out["is_dup"]))
        assert got == expect
        assert any(expect.values()) and not all(expect.values())  # non-degenerate


# ---------------------------------------------------------------------------
# composed curation decision
# ---------------------------------------------------------------------------


class TestCurateCorpus:
    def test_reason_precedence(self):
        from webcrawl_lowres_lang_ray.stages.curation import curate_corpus

        bench_text = "alpha beta gamma delta epsilon zeta eta theta nine ten"
        repetitive = "spam " * 30  # top_word_frac = 1.0 -> repetition reject
        rows = [
            {"doc_id": 0, "text": bench_text},  # benchmark slice
            # duplicate prefix of the benchmark doc -> 'duplicate' (same
            # first-8-word key; dedup outranks contamination):
            {"doc_id": 1, "text": bench_text + " extra tail words"},
            # contains a benchmark 5-gram but unique key -> 'contaminated':
            {"doc_id": 2, "text": "lead in alpha beta gamma delta epsilon out"},
            {"doc_id": 3, "text": repetitive.strip()},
            {"doc_id": 4, "text": "clean unique words that pass every gate fine"},
        ]
        out = (
            curate_corpus(_docs(rows), n=5, bench_mod=50, k_words=8)
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[0, "reason"] == "benchmark"
        assert out.loc[1, "reason"] == "duplicate"
        assert out.loc[2, "reason"] == "contaminated"
        assert out.loc[3, "reason"] == "repetition"
        assert out.loc[4, "reason"] == "kept" and bool(out.loc[4, "keep"])
        assert not out.loc[[0, 1, 2, 3], "keep"].any()

    def test_crawl_curate_runs_on_ledger(self):
        """crawl_curate: one row per fetched ledger doc, valid reasons,
        deterministic across runs."""
        from webcrawl_lowres_lang_ray.pipelines.crawl_queries import q_crawl_curate

        a = q_crawl_curate(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = q_crawl_curate(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert len(a) > 0
        assert set(a["reason"]) <= {
            "benchmark", "duplicate", "contaminated", "repetition", "kept"
        }
        assert a["keep"].any()
        pd.testing.assert_frame_equal(a, b)

    def test_shard_export_layout_and_roundtrip(self, tmp_path):
        """Export writes one shard=X dir per non-empty shard; the files
        reproduce exactly the kept docs; manifest matches the files."""
        import ray.data

        from webcrawl_lowres_lang_ray.stages.curation import (
            curate_corpus,
            training_shard_export,
        )

        rng = np.random.default_rng(11)
        vocab = [f"tok{i}" for i in range(200)]
        rows = [
            {"doc_id": i, "text": " ".join(rng.choice(vocab, size=12))}
            for i in range(120)
        ]
        out_dir = str(tmp_path / "shards")
        manifest = training_shard_export(_docs(rows), out_dir)
        import os

        dirs = sorted(os.listdir(out_dir))
        assert all(d.startswith("shard=") for d in dirs)
        assert set(manifest["shard"]) == {d.split("=")[1] for d in dirs}
        back = ray.data.read_parquet(out_dir).to_pandas()
        dec = curate_corpus(_docs(rows)).to_pandas()
        kept_ids = set(dec.loc[dec["keep"], "doc_id"])
        assert set(back["doc_id"]) == kept_ids
        texts = {r["doc_id"]: r["text"] for r in rows}
        assert all(texts[i] == t for i, t in zip(back["doc_id"], back["text"]))
        assert manifest["n_docs"].sum() == len(kept_ids)


# ---------------------------------------------------------------------------
# source mixing weights
# ---------------------------------------------------------------------------


class TestMixWeights:
    def test_weights_sum_to_one_and_alpha_flattens(self):
        from webcrawl_lowres_lang_ray.stages.curation import source_mix_weights

        rows = (
            [{"source": "big", "text": "w " * 99} for _ in range(50)]
            + [{"source": "small", "text": "w " * 10} for _ in range(5)]
        )
        w = source_mix_weights(_docs(rows), alpha=0.5)
        assert abs(w["weight"].sum() - 1.0) < 1e-4
        assert abs(w["raw_frac"].sum() - 1.0) < 1e-4
        big = w.set_index("source")
        # temperature < 1 up-weights the small source relative to raw share
        assert big.loc["small", "weight"] > big.loc["small", "raw_frac"]
        assert big.loc["big", "weight"] < big.loc["big", "raw_frac"]
        # alpha=1 degenerates to the raw fractions
        w1 = source_mix_weights(_docs(rows), alpha=1.0)
        assert np.allclose(w1["weight"], w1["raw_frac"], atol=1e-6)


# ---------------------------------------------------------------------------
# DSIR importance scores
# ---------------------------------------------------------------------------


class TestDsir:
    def _corpus(self):
        rows = []
        for i in range(40):  # target (en): "data pipeline" style bigrams
            rows.append(
                {"doc_id": 2 * i, "lang": "en",
                 "text": "data pipeline shuffle batch arrow block stream " * 3}
            )
            rows.append(
                {"doc_id": 2 * i + 1, "lang": "xx",
                 "text": "uno dos tres cuatro cinco seis siete ocho " * 3}
            )
        return rows

    def test_target_like_scores_higher(self):
        from webcrawl_lowres_lang_ray.stages.curation import dsir_scores

        out = dsir_scores(_docs(self._corpus()), target_lang="en").to_pandas()
        en = out[out["doc_id"] % 2 == 0]["dsir_logratio"].mean()
        xx = out[out["doc_id"] % 2 == 1]["dsir_logratio"].mean()
        assert en > xx
        assert np.isfinite(out["dsir_logratio"]).all()

    def test_deterministic_across_runs(self):
        from webcrawl_lowres_lang_ray.stages.curation import dsir_scores

        a = (
            dsir_scores(_docs(self._corpus()), target_lang="en")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            dsir_scores(_docs(self._corpus()), target_lang="en")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# split assignment + sequence packing (round 3)
# ---------------------------------------------------------------------------


def test_doc_split_assign_matches_oracle():
    import duckdb

    import __ray_entry__ as e
    from scripts.check_correctness import to_pandas, value_hash

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    mine = to_pandas(e.queries()["doc_split_assign"](SF))
    theirs = con.execute(e.oracle_sql()["doc_split_assign"]).df()
    assert len(mine) == len(theirs)
    assert value_hash(mine) == value_hash(theirs)
    # split is a pure function of doc_id — stable under any repartitioning
    assert set(mine["split"]) <= {"train", "val", "test"}


class TestPackSequences:
    def _serial_pack(self, toks, budget):
        seqs, cur, cur_seq = [], 0, 0
        for t in toks:
            if cur > 0 and cur + t > budget:
                cur_seq += 1
                cur = 0
            seqs.append(cur_seq)
            cur += t
        return seqs

    def test_per_shard_parity_and_budget(self):
        import ray.data

        from webcrawl_lowres_lang_ray.stages.curation import pack_sequences

        rng = np.random.RandomState(4)
        rows = [
            {"doc_id": i, "text": " ".join(["w"] * rng.randint(1, 60))}
            for i in range(200)
        ]
        budget = 100
        out = (
            pack_sequences(ray.data.from_pandas(pd.DataFrame(rows)), budget=budget, shards=4)
            .to_pandas()
            .sort_values(["shard", "doc_id"])
            .reset_index(drop=True)
        )
        assert len(out) == 200
        for _, g in out.groupby("shard"):
            toks = g.sort_values("doc_id")["n_tokens"].tolist()
            assert g.sort_values("doc_id")["seq_id"].tolist() == self._serial_pack(
                toks, budget
            )
            # no packed sequence with >1 doc exceeds the budget
            sums = g.groupby("seq_id").agg(tot=("n_tokens", "sum"), n=("n_tokens", "size"))
            assert (sums.loc[sums["n"] > 1, "tot"] <= budget).all()

    def test_oversized_doc_gets_own_sequence(self):
        import ray.data

        from webcrawl_lowres_lang_ray.stages.curation import pack_sequences

        rows = [
            {"doc_id": 0, "text": " ".join(["w"] * 50)},
            {"doc_id": 1, "text": " ".join(["w"] * 500)},  # > budget
            {"doc_id": 2, "text": " ".join(["w"] * 50)},
        ]
        out = (
            pack_sequences(ray.data.from_pandas(pd.DataFrame(rows)), budget=100, shards=1)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        # the oversized doc opens its own bin; next doc opens another
        assert out.loc[1, "seq_id"] != out.loc[0, "seq_id"]
        assert out.loc[2, "seq_id"] != out.loc[1, "seq_id"]


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------


class TestPiiScrub:
    def test_counts_and_redaction(self):
        import hashlib

        from webcrawl_lowres_lang_ray.stages.curation import pii_scrub

        rows = [
            {"doc_id": 1, "text": "mail me at a.b@example.org or c@d.co thanks"},
            {"doc_id": 2, "text": "call +64-123-4567 and +44-999-0000"},
            {"doc_id": 3, "text": "server 192.168.0.1 and 10.0.0.255"},
            {"doc_id": 4, "text": "nothing here"},
            {"doc_id": 5, "text": None},
        ]
        out = (
            pii_scrub(_docs(rows), augment=False)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert out.loc[1, "n_emails"] == 2 and out.loc[1, "n_phones"] == 0
        assert out.loc[2, "n_phones"] == 2
        assert out.loc[3, "n_ips"] == 2
        assert out.loc[4].tolist()[:3] == [0, 0, 0]
        # byte-level redaction parity
        expect = "mail me at <EMAIL> or <EMAIL> thanks"
        assert out.loc[1, "clean_md5"] == hashlib.md5(expect.encode()).hexdigest()
        expect3 = "server <IP> and <IP>"
        assert out.loc[3, "clean_md5"] == hashlib.md5(expect3.encode()).hexdigest()
        # null text scrubs to empty string
        assert out.loc[5, "clean_md5"] == hashlib.md5(b"").hexdigest()

    def test_augmentation_is_deterministic_by_id(self):
        from webcrawl_lowres_lang_ray.stages.curation import pii_scrub

        rows = [{"doc_id": i, "text": "base"} for i in range(1, 22)]
        out = (
            pii_scrub(_docs(rows), augment=True)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        for i in range(1, 22):
            assert out.loc[i, "n_emails"] == (1 if i % 3 == 0 else 0)
            assert out.loc[i, "n_phones"] == (1 if i % 5 == 0 else 0)
            assert out.loc[i, "n_ips"] == (1 if i % 7 == 0 else 0)


# ---------------------------------------------------------------------------
# token-budget selection
# ---------------------------------------------------------------------------


class TestTokenBudgetSelect:
    def test_matches_window_sum_semantics(self):
        from webcrawl_lowres_lang_ray.stages.curation import token_budget_select

        rng = np.random.RandomState(7)
        rows = [
            {
                "doc_id": i,
                "text": " ".join(["w"] * int(rng.randint(1, 40))),
                "n_chars": int(rng.randint(10, 25)),  # coarse bins force ties
            }
            for i in range(300)
        ]
        budget = 1500
        mine = (
            token_budget_select(_docs(rows), budget=budget)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        base = pd.DataFrame(rows)
        base["n_tokens"] = base["text"].str.split().str.len()
        w = base.sort_values(["n_chars", "doc_id"], ascending=[False, True]).copy()
        w["cum_tokens"] = w["n_tokens"].cumsum()
        expect = w[w["cum_tokens"] <= budget].sort_values("doc_id").reset_index(drop=True)
        assert mine["doc_id"].tolist() == expect["doc_id"].tolist()
        assert mine["cum_tokens"].tolist() == expect["cum_tokens"].tolist()

    def test_zero_budget_empty(self):
        from webcrawl_lowres_lang_ray.stages.curation import token_budget_select

        rows = [{"doc_id": 1, "text": "a b c", "n_chars": 5}]
        out = token_budget_select(_docs(rows), budget=0)
        out = out.to_pandas()  # pa.Table in the empty fast path
        assert len(out) == 0
        assert set(out.columns) == {"doc_id", "n_chars", "n_tokens", "cum_tokens"}


# ---------------------------------------------------------------------------
# cluster representatives
# ---------------------------------------------------------------------------


class TestClusterRepresentatives:
    def test_keep_best_copy(self):
        from webcrawl_lowres_lang_ray.stages.curation import cluster_representatives

        head = "one two three four five six seven eight"
        rows = [
            {"doc_id": 1, "text": head + " tail-a", "n_chars": 10},
            {"doc_id": 2, "text": head + " tail-b longer", "n_chars": 30},
            {"doc_id": 3, "text": head + " tail-c", "n_chars": 30},  # tie -> min id wins
            {"doc_id": 4, "text": "different opening entirely here now yes ok go", "n_chars": 5},
        ]
        out = (
            cluster_representatives(_docs(rows))
            .to_pandas()
            .set_index("ckey")
            .sort_index()
        )
        assert len(out) == 2
        assert out.loc[head, "rep_doc_id"] == 2
        assert out.loc[head, "cluster_size"] == 3

    def test_partial_combiner_matches_serial(self):
        from webcrawl_lowres_lang_ray.stages.curation import cluster_representatives

        rng = np.random.RandomState(11)
        heads = [f"h{j} " + " ".join([f"w{j}{k}" for k in range(7)]) for j in range(9)]
        rows = [
            {
                "doc_id": i,
                "text": heads[int(rng.randint(0, 9))] + f" tail {i}",
                "n_chars": int(rng.randint(0, 50)),
            }
            for i in range(400)
        ]
        mine = (
            cluster_representatives(_docs(rows))
            .to_pandas()
            .sort_values("ckey")
            .reset_index(drop=True)
        )
        base = pd.DataFrame(rows)
        base["ckey"] = base["text"].str.split().str[:8].str.join(" ")
        serial = (
            base.sort_values(["n_chars", "doc_id"], ascending=[False, True])
            .drop_duplicates("ckey", keep="first")
            .merge(base.groupby("ckey").size().rename("cluster_size"), on="ckey")
            .rename(columns={"doc_id": "rep_doc_id", "n_chars": "rep_n_chars"})
            [["ckey", "rep_doc_id", "rep_n_chars", "cluster_size"]]
            .sort_values("ckey")
            .reset_index(drop=True)
        )
        assert mine["rep_doc_id"].tolist() == serial["rep_doc_id"].tolist()
        assert mine["cluster_size"].tolist() == serial["cluster_size"].tolist()


# ---------------------------------------------------------------------------
# temperature-mixed resampling + per-source cap
# ---------------------------------------------------------------------------


class TestSourceMixSample:
    def test_expected_mass_follows_weights(self):
        import hashlib

        from webcrawl_lowres_lang_ray.stages.curation import source_mix_sample

        rng = np.random.RandomState(3)
        # big source (a): 800 docs x 20 words; small source (b): 50 docs x 20
        rows = [
            {"doc_id": i, "source": "a" if i < 800 else "b",
             "text": " ".join([f"w{rng.randint(99)}" for _ in range(20)])}
            for i in range(850)
        ]
        out = source_mix_sample(_docs(rows), alpha=0.5, rate=0.5).to_pandas()
        frac = out.groupby("source").size() / pd.Series({"a": 800, "b": 50})
        # alpha=0.5 up-weights the small source: its keep rate must exceed
        # the big source's
        assert frac["b"] > frac["a"]
        # the draw is the documented md5-bucket rule
        for _, r in out.head(20).iterrows():
            h = hashlib.md5(str(int(r["doc_id"])).encode()).hexdigest()
            assert int(h[:8], 16) % 1_000_000 == r["bucket"]

    def test_rate_one_alpha_one_keeps_everything(self):
        from webcrawl_lowres_lang_ray.stages.curation import source_mix_sample

        rows = [
            {"doc_id": i, "source": f"s{i % 3}", "text": "five words of test text"}
            for i in range(60)
        ]
        out = source_mix_sample(_docs(rows), alpha=1.0, rate=1.0).to_pandas()
        # rate=1: every source's target equals its size -> p_s ~ 1 for the
        # uniform corpus (micro-unit floor can shave at most 1e-6)
        assert len(out) == 60


class TestSourceCapSample:
    def test_cap_bites_and_matches_row_number(self):
        from webcrawl_lowres_lang_ray.stages.curation import source_cap_sample

        rows = [
            {"doc_id": i, "source": f"s{i % 3}"} for i in range(300)
        ]
        cap = 20
        out = (
            source_cap_sample(_docs(rows), cap=cap)
            .to_pandas()
            .sort_values(["source", "rk"])
            .reset_index(drop=True)
        )
        assert (out.groupby("source").size() == cap).all()
        assert (out.groupby("source")["rk"].max() == cap).all()
        # serial oracle: md5-rank order per source
        import hashlib

        base = pd.DataFrame(rows)
        base["hx"] = [
            hashlib.md5(str(i).encode()).hexdigest() for i in base["doc_id"]
        ]
        expect = (
            base.sort_values(["hx", "doc_id"])
            .groupby("source", sort=False)
            .head(cap)
            .sort_values(["source", "hx", "doc_id"])
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == expect["doc_id"].tolist()

    def test_small_groups_survive_whole(self):
        from webcrawl_lowres_lang_ray.stages.curation import source_cap_sample

        rows = [{"doc_id": i, "source": "only"} for i in range(7)]
        out = source_cap_sample(_docs(rows), cap=50).to_pandas()
        assert len(out) == 7 and set(out["rk"]) == set(range(1, 8))

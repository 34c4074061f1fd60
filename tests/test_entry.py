"""Driver-contract smoke tests: entry() and queries()/oracle_sql() shape.

(The value-level gate is scripts/check_correctness.py + the driver's own
CORRECTNESS run; here we pin the contract: names align, callables run at
sf0.001, results are non-degenerate.)
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


def test_every_oracle_key_has_a_query():
    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    assert set(sqls).issubset(set(qs))
    assert len(qs) >= 30 and len(sqls) >= 20


def test_driver_prefix_is_fully_sql_oracled():
    """The driver's correctness harness records ONLY the first
    DRIVER_CORRECTNESS_PREFIX queries() entries (measured r1-r3: always an
    exact dict-order prefix of 50).  Every one of those slots must carry a
    SQL oracle so every driver-recorded row is a hard value-hash check —
    this test makes the round-3 'orphaned SQL query' gap impossible to
    reintroduce: a new entry added above the line without an oracle_sql()
    twin (or a SQL entry pushed below it) fails here."""
    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    prefix = list(qs)[: e.DRIVER_CORRECTNESS_PREFIX]
    missing = [n for n in prefix if n not in sqls]
    assert not missing, (
        f"driver-visible queries without SQL oracles: {missing} — either add "
        "oracle_sql() entries or move them below the prefix marker"
    )
    # the demoted-SQL set below the line is a conscious, frozen choice
    below = set(list(qs)[e.DRIVER_CORRECTNESS_PREFIX:])
    demoted_sql = {n for n in below if n in sqls}
    assert demoted_sql == {
        "embedding_neardup", "embedding_neardup_lsh", "ngram_jaccard",
        "ngram_jaccard_lsh", "lang_counts", "order_priority_counts",
        "top_docs_by_chars", "doc_dsir_score", "doc_embed_neardup",
        "doc_c4_filter",
        # round-4 post-freeze additions (SQL-checked in CORRECTNESS_FULL.json
        # + the duckdb parametrize in tests/test_curation.py):
        "token_budget_select", "cluster_representatives",
        "source_mix_sample", "source_cap_sample",
        "table_expectations", "doc_token_entropy",
        "event_type_user_overlap",
        "changelog_apply", "user_activity_streaks", "ann_hard_negatives",
        "doc_bm25_search", "token_pmi", "event_transitions",
        "user_value_trend", "doc_weighted_sample", "doc_containment",
        "events_cube", "token_chi2", "events_value_psi",
        "doc_hybrid_search", "event_paths", "value_outliers",
        "key_skew_report", "user_recency_features",
        "monthly_revenue_growth", "customer_linkage", "daily_active_users",
        # round-5 rotation OUT (triple driver-green r1-r4; rotated below the
        # line to free prefix slots for never-driver-checked SQL queries —
        # see PREFIX ROTATION POLICY in __ray_entry__.py):
        "sorted_token_dedup", "source_conditional_agg", "chars_histogram",
        "doc_stratified_sample", "label_centroids", "nation_region_rollup",
        "event_type_summary", "events_pivot", "events_props_extract",
        "events_unpivot",
    }, f"unexpected SQL-oracled entries below the driver prefix: {demoted_sql}"


def test_entry_returns_ledger():
    import __ray_entry__ as e

    res = e.entry()
    df = res.to_pandas()
    assert len(df) > 0
    assert {"seq", "url", "nlp_full_lang", "rejected"}.issubset(df.columns)


@pytest.mark.parametrize(
    "exact,lsh",
    [("embedding_neardup", "embedding_neardup_lsh"),
     ("ngram_jaccard", "ngram_jaccard_lsh")],
)
def test_lsh_scale_paths_equal_exact_at_test_scale(exact, lsh):
    """The LSH near-dup queries share their exact twins' SQL oracles, which
    is sound only while their operating points yield recall 1.0 on the
    deterministic test corpora — pin the EQUALITY itself, not just recall."""
    import __ray_entry__ as e
    from scripts.check_correctness import to_pandas, value_hash

    qs = e.queries()
    a = to_pandas(qs[exact](SF))
    b = to_pandas(qs[lsh](SF))
    assert len(a) == len(b)
    assert value_hash(a) == value_hash(b)


@pytest.mark.parametrize(
    "name",
    ["token_frequency", "lineitem_pricing", "ann_topk", "doc_quality", "events_hourly"],
)
def test_sampled_queries_match_duckdb_at_sf0001(name):
    import duckdb

    import __ray_entry__ as e
    from scripts.check_correctness import to_pandas, value_hash

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    mine = to_pandas(e.queries()[name](SF))
    theirs = con.execute(e.oracle_sql()[name]).df()
    assert len(mine) == len(theirs)
    assert sorted(mine.columns) == sorted(theirs.columns)
    assert value_hash(mine) == value_hash(theirs)

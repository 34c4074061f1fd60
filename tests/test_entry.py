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


def test_entry_returns_ledger():
    import __ray_entry__ as e

    res = e.entry()
    df = res.to_pandas()
    assert len(df) > 0
    assert {"seq", "url", "nlp_full_lang", "rejected"}.issubset(df.columns)


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

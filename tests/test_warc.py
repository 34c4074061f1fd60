"""WARC source round-trips: writer -> parser -> Ray datasource parity
against the synthetic page table (sources/warc.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest

from webcrawl_lowres_lang_ray.sources import warc


def _rows(n: int, start: int = 0) -> list[dict]:
    base = datetime(2020, 1, 1)
    return [
        {
            "url": f"http://h{i % 7}.example.org/p/{i}",
            "warc_ts": base + timedelta(seconds=i),
            "html": (f"<html><body>page {i} é</body></html>").encode(),
        }
        for i in range(start, start + n)
    ]


@pytest.mark.parametrize("suffix", [".warc", ".warc.gz"])
def test_round_trip(tmp_path, suffix):
    rows = _rows(23)
    p = str(tmp_path / f"a{suffix}")
    assert warc.write_warc(p, rows) == 23
    opener = open(p, "rb")
    got = list(warc.iter_warc_records(warc._open_maybe_gzip(opener, p)))
    opener.close()
    assert len(got) == 23
    for want, rec in zip(rows, got):
        assert rec["url"] == want["url"]
        assert rec["warc_ts"] == want["warc_ts"]
        assert rec["html"] == want["html"]


def test_skips_non_response_and_garbage(tmp_path):
    rows = _rows(3)
    p = str(tmp_path / "m.warc")
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
    )
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: http://x/\r\nWARC-Date: 2020-01-01T00:00:00Z\r\n"
        b"Content-Length: 0\r\n\r\n\r\n\r\n"
    )
    with open(p, "wb") as f:
        f.write(info)
        f.write(warc._warc_record(**rows[0]))
        f.write(b"junk padding not a record\r\n")
        f.write(req)
        f.write(warc._warc_record(**rows[1]))
        # truncated final record: payload cut short ends iteration cleanly
        full = warc._warc_record(**rows[2])
        f.write(full[: len(full) // 2])
    with open(p, "rb") as f:
        got = list(warc.iter_warc_records(f))
    assert [r["url"] for r in got] == [rows[0]["url"], rows[1]["url"]]


def test_http_body_extraction():
    assert warc._http_body(b"HTTP/1.1 200 OK\r\nX: y\r\n\r\n<b>hi</b>") == b"<b>hi</b>"
    # non-HTTP payloads (resource records) pass through untouched
    assert warc._http_body(b"raw bytes") == b"raw bytes"


def test_warc_date_variants():
    assert warc._parse_warc_date("2020-01-02T03:04:05Z") == datetime(2020, 1, 2, 3, 4, 5)
    assert warc._parse_warc_date("2020-01-02T03:04:05.250000Z") == datetime(
        2020, 1, 2, 3, 4, 5, 250000
    )


def test_read_warc_dataset(ray_session, tmp_path):
    """Two archives (one plain, one per-record-gzip'd) -> one Dataset with
    the page-table schema; content matches the written union exactly."""
    a, b = _rows(15), _rows(10, start=100)
    pa_ = str(tmp_path / "a.warc")
    pb = str(tmp_path / "b.warc.gz")
    warc.write_warc(pa_, a)
    warc.write_warc(pb, b)

    ds = warc.read_warc([pa_, pb], batch_rows=4)
    df = ds.to_pandas().sort_values("url").reset_index(drop=True)
    want = (
        pd.DataFrame(a + b)
        .assign(html=lambda d: d["html"].map(bytes))
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(df.columns) == ["url", "warc_ts", "html"]
    assert len(df) == 25
    assert (df["url"] == want["url"]).all()
    assert (pd.to_datetime(df["warc_ts"]) == pd.to_datetime(want["warc_ts"])).all()
    assert all(bytes(x) == y for x, y in zip(df["html"], want["html"]))


def test_read_warc_matches_synth_pages(ray_session, small_corpus):
    """Export a slice of the synthetic Common-Crawl-style page table as a
    gzip WARC, read it back through the datasource: byte-identical html,
    identical url/warc_ts — the input_hint round-trip."""
    import os

    df = pd.read_parquet(
        os.path.join(small_corpus, "pages"), columns=["url", "warc_ts", "html"]
    ).head(50)
    p = "/tmp/wllr_warc_test_slice.warc.gz"
    warc.write_warc(p, df.to_dict("records"))
    got = (
        warc.read_warc([p])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = df.sort_values("url").reset_index(drop=True)
    assert (got["url"] == want["url"]).all()
    assert (pd.to_datetime(got["warc_ts"]) == pd.to_datetime(want["warc_ts"])).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(got["html"], want["html"]))
    os.unlink(p)

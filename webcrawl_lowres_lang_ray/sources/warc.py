"""WARC (ISO 28500 / WARC-1.0) source: stream Common-Crawl-style archives
into the engine's page-table schema ``(url, warc_ts, html)``.

The reference pipeline fetches live pages (lrl-crawler.py); at 100 TB the
same corpus arrives as WARC archives (the Common Crawl distribution
format), so the engine needs a first-class WARC reader with the exact
input_hint column shapes.  Everything here is stdlib + pyarrow, built from
the PUBLIC format spec only:

* ISO 28500 (WARC/1.0, WARC/1.1): named-field header block terminated by a
  blank line, ``Content-Length`` octet payload, two CRLFs between records;
* the Common Crawl convention for ``.warc.gz``: each record is its own
  gzip MEMBER, so archives are byte-splittable at member boundaries —
  Python's ``gzip.GzipFile`` reads concatenated members transparently,
  which gives us one sequential-parse code path for both layouts;
* ``response`` records carry a full HTTP/1.x response as payload; the
  entity body (the html bytes) starts after the first CRLFCRLF.

Scale shape: ``WarcDatasource`` is a ``FileBasedDatasource`` — Ray Data
schedules ONE streaming read task per archive (Common Crawl ships ~1 GiB
files, the unit of parallelism upstream chose), each task yielding bounded
``batch_rows`` Arrow tables so a 1 GiB archive never materializes as one
block; downstream map_batches stages consume zero-copy.  No shuffle, no
driver collection.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from datetime import datetime
from typing import Iterator

import pyarrow as pa

_CRLF = b"\r\n"

# page-table projection of a response record (input_hint shape; text/lang
# are produced downstream by the extract/langid stages, not stored in WARC)
WARC_PAGE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
    ]
)


# ---------------------------------------------------------------------------
# low-level streaming parser
# ---------------------------------------------------------------------------


class _LineReader:
    """Minimal buffered ``read(n)`` / ``readline()`` over any object with a
    ``read(n)`` method (pyarrow NativeFile has no readline)."""

    def __init__(self, raw, chunk: int = 1 << 16):
        self._raw = raw
        self._chunk = chunk
        self._buf = b""

    def readline(self) -> bytes:
        while True:
            i = self._buf.find(b"\n")
            if i >= 0:
                line, self._buf = self._buf[: i + 1], self._buf[i + 1 :]
                return line
            more = self._raw.read(self._chunk)
            if not more:
                line, self._buf = self._buf, b""
                return line
            self._buf += more

    def read(self, n: int) -> bytes:
        while len(self._buf) < n:
            more = self._raw.read(max(self._chunk, n - len(self._buf)))
            if not more:
                break
            self._buf += more
        out, self._buf = self._buf[:n], self._buf[n:]
        return out


def _parse_warc_date(s: str) -> datetime:
    """WARC-Date is W3C-profile ISO 8601, UTC ('Z'); tolerate fractional
    seconds (WARC/1.1).  Returns a tz-naive UTC datetime (the page table's
    timestamp("us") convention, matching sources/synth.py)."""
    s = s.strip()
    if s.endswith("Z"):
        s = s[:-1]
    fmt = "%Y-%m-%dT%H:%M:%S.%f" if "." in s else "%Y-%m-%dT%H:%M:%S"
    return datetime.strptime(s, fmt)


def _http_body(payload: bytes) -> bytes:
    """Entity body of an HTTP/1.x response payload (after the first
    CRLFCRLF); non-HTTP payloads (resource records etc.) pass through."""
    if not payload.startswith(b"HTTP/"):
        return payload
    i = payload.find(b"\r\n\r\n")
    return payload if i < 0 else payload[i + 4 :]


def iter_warc_records(stream) -> Iterator[dict]:
    """Yield ``{url, warc_ts, html, rec_type}`` per WARC record, skipping
    non-``response`` records.  ``stream`` needs only ``read(n)``.
    Malformed trailing garbage ends the iteration (truncated fetches are a
    fact of life in crawl archives); a record with a bad header is skipped
    by scanning to the next version line."""
    r = _LineReader(stream)
    while True:
        # scan for the version line (tolerates inter-record padding)
        line = r.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            continue
        headers: dict[str, str] = {}
        while True:
            line = r.readline()
            if not line:
                return
            if line in (_CRLF, b"\n"):
                break
            if b":" not in line:  # malformed header block: resync
                headers = {}
                break
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
        if not headers or "content-length" not in headers:
            continue
        try:
            n = int(headers["content-length"])
        except ValueError:
            continue
        payload = r.read(n)
        if len(payload) < n:
            return  # truncated archive
        rec_type = headers.get("warc-type", "")
        if rec_type != "response":
            continue
        url = headers.get("warc-target-uri", "")
        # WARC/1.1 allows <...> around the URI
        if url.startswith("<") and url.endswith(">"):
            url = url[1:-1]
        try:
            ts = _parse_warc_date(headers.get("warc-date", ""))
        except ValueError:
            continue
        yield {
            "url": url,
            "warc_ts": ts,
            "html": _http_body(payload),
            "rec_type": rec_type,
        }


# ---------------------------------------------------------------------------
# Ray Data datasource
# ---------------------------------------------------------------------------


def _open_maybe_gzip(f, path: str):
    return gzip.GzipFile(fileobj=f) if path.endswith(".gz") else f


class WarcDatasource:
    """``FileBasedDatasource`` streaming WARC response records as bounded
    Arrow batches of ``WARC_PAGE_SCHEMA`` rows.  Import of the Ray base
    class is deferred so the parser stays usable without a Ray session."""

    def __new__(cls, paths, batch_rows: int = 256, **kwargs):
        from ray.data.datasource import FileBasedDatasource

        class _Impl(FileBasedDatasource):
            _FILE_EXTENSIONS = ["warc", "warc.gz"]

            def _read_stream(self, f: "pa.NativeFile", path: str):
                # Ray's _open_input_source already layered gzip
                # decompression from the path suffix (Arrow's gzip codec
                # reads concatenated per-record members transparently), so
                # the stream arrives decompressed — parse it directly.
                rows: list[dict] = []
                for rec in iter_warc_records(f):
                    rows.append(rec)
                    if len(rows) >= batch_rows:
                        yield _rows_to_table(rows)
                        rows = []
                if rows:
                    yield _rows_to_table(rows)

        return _Impl(paths, file_extensions=None, **kwargs)


def _rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
        }
    )


def read_warc(paths, batch_rows: int = 256, **kwargs) -> "ray.data.Dataset":  # noqa: F821
    """``ray.data`` entry point: one streaming read task per archive file,
    rows in the page-table shape ``(url, warc_ts, html)``."""
    import ray.data

    return ray.data.read_datasource(WarcDatasource(paths, batch_rows=batch_rows, **kwargs))


# ---------------------------------------------------------------------------
# writer (round-trip tests + exporting crawl ledgers as archives)
# ---------------------------------------------------------------------------


def _warc_record(url: str, warc_ts: datetime, html: bytes) -> bytes:
    """One ``response`` record with a minimal HTTP/1.1 envelope."""
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: "
        + str(len(html)).encode()
        + b"\r\n\r\n"
        + html
    )
    rec_id = hashlib.md5(url.encode()).hexdigest()
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n"
        f"WARC-Date: {warc_ts.replace(tzinfo=None).isoformat()}Z\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return head + http + b"\r\n\r\n"


def write_warc(path: str, rows) -> int:
    """Write ``(url, warc_ts, html)`` rows (any iterable of mappings or
    attr-tuples) as a WARC file.  ``.gz`` paths use one gzip member PER
    RECORD (the Common Crawl layout, keeping archives record-splittable).
    Returns the number of records written."""
    n = 0
    per_record_gzip = path.endswith(".gz")
    with open(path, "wb") as out:
        for r in rows:
            url, ts, html = r["url"], r["warc_ts"], r["html"]
            if hasattr(ts, "to_pydatetime"):
                ts = ts.to_pydatetime()
            if isinstance(html, memoryview):
                html = bytes(html)
            rec = _warc_record(url, ts, html)
            if per_record_gzip:
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(rec)
                rec = buf.getvalue()
            out.write(rec)
            n += 1
    return n


__all__ = [
    "WARC_PAGE_SCHEMA",
    "iter_warc_records",
    "read_warc",
    "write_warc",
    "WarcDatasource",
]

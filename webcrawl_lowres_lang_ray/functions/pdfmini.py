"""Minimal real PDF text kernel — stdlib-only writer/reader pair.

The reference extracts PDF text with PyPDF2's page loop (nlp.py:100-109).
PyPDF2 is absent from this container, so this module implements the subset
of ISO 32000 the pipeline actually needs, the same spirit as the PNG/WAV
kernels in functions/media.py:

* ``build_pdf(paragraphs)`` — a syntactically valid single- or multi-page
  PDF 1.4: catalog -> page tree -> page objects with FlateDecode (or raw)
  content streams of ``BT .. Td (string) Tj .. ET`` text objects, a Type1
  Helvetica font resource, and a correct xref table + trailer.
* ``extract_pdf_text(data)`` — parses the object graph, walks the page tree
  (root /Pages -> flat /Kids order; degrades to object-number order),
  inflates /FlateDecode content streams with zlib, and tokenizes text
  objects: literal strings shown by Tj / ' / " / TJ become output text,
  with a newline at each Td / TD / T* / ' line move.  Literal-string
  escapes (\\( \\) \\\\ \\n \\r \\t \\b \\f, octal, line continuations) and
  balanced nested parens are handled.

Documented divergence from PyPDF2 (forced by the environment): string bytes
are decoded as UTF-8 (errors="replace") rather than through font-encoding
maps, hex strings and non-Flate filters are not decoded, and page texts are
joined with "\\n".  The writer emits only what the reader parses, and the
pair round-trips byte-exactly for any unicode input (property-tested).
"""

from __future__ import annotations

import re
import zlib

# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

_ESC = {0x28: b"\\(", 0x29: b"\\)", 0x5C: b"\\\\", 0x0A: b"\\n", 0x0D: b"\\r"}


def _pdf_literal(s: str) -> bytes:
    """UTF-8 bytes as a PDF literal string, parens/backslash/EOL escaped."""
    raw = s.encode("utf-8")
    out = bytearray(b"(")
    for b in raw:
        e = _ESC.get(b)
        if e is not None:
            out += e
        else:
            out.append(b)
    out += b")"
    return bytes(out)


def _content_stream(paragraphs: list[str]) -> bytes:
    parts = [b"BT /F1 12 Tf 72 720 Td"]
    for i, p in enumerate(paragraphs):
        if i:
            parts.append(b"0 -14 Td")
        parts.append(_pdf_literal(p) + b" Tj")
    parts.append(b"ET")
    return b" ".join(parts)


def build_pdf(
    paragraphs: list[str], paras_per_page: int = 40, compress: bool = True
) -> bytes:
    """A valid PDF whose pages show ``paragraphs`` one text line each."""
    pages = [
        paragraphs[i : i + paras_per_page]
        for i in range(0, len(paragraphs), paras_per_page)
    ] or [[]]
    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages, then per page (page obj,
    # content obj), finally the font object
    font_num = 3 + 2 * n_pages
    objs: list[tuple[int, bytes]] = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (
            2,
            b"<< /Type /Pages /Kids ["
            + b" ".join(b"%d 0 R" % (3 + 2 * i) for i in range(n_pages))
            + b"] /Count %d >>" % n_pages,
        ),
    ]
    for i, page in enumerate(pages):
        pnum, cnum = 3 + 2 * i, 4 + 2 * i
        objs.append(
            (
                pnum,
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
                % (font_num, cnum),
            )
        )
        data = _content_stream(page)
        if compress:
            data = zlib.compress(data, 6)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(data)
        else:
            head = b"<< /Length %d >>" % len(data)
        objs.append((cnum, head + b"\nstream\n" + data + b"\nendstream"))
    objs.append(
        (font_num, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    )

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num, body in objs:
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_at = len(buf)
    nobj = len(objs) + 1
    buf += b"xref\n0 %d\n" % nobj
    buf += b"0000000000 65535 f \n"
    for num in range(1, nobj):
        buf += b"%010d 00000 n \n" % offsets[num]
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (nobj, xref_at)
    )
    return bytes(buf)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_STREAM_KW_RE = re.compile(rb"\bstream\r?\n")
# direct /Length only (negative lookahead rejects an indirect "N 0 R" ref)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
_REF_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)*)\s*\]")
_KID_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_OP_RE = re.compile(rb"[A-Za-z'\"*]{1,3}")


def _parse_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """obj number -> (dict/body bytes, decoded stream bytes or None).

    Sequential scan, NOT a naive obj..endobj regex split: a Flate stream's
    compressed bytes may contain "endobj"/"endstream", so stream extents
    come from the dict's direct /Length when present (the writer always
    emits one), with an endstream search as the no-Length fallback."""
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    pos, n = 0, len(data)
    while True:
        m = _OBJ_HEAD_RE.search(data, pos)
        if m is None:
            return objs
        num = int(m.group(1))
        body_start = m.end()
        em = data.find(b"endobj", body_start)
        sm = _STREAM_KW_RE.search(data, body_start)
        if sm is None or (em != -1 and em < sm.start()):
            objs[num] = (data[body_start : em if em != -1 else n], None)
            pos = em + 6 if em != -1 else n
            continue
        head = data[body_start : sm.start()]
        lm = _LENGTH_RE.search(head)
        if lm is not None:
            raw = data[sm.end() : sm.end() + int(lm.group(1))]
            end = sm.end() + int(lm.group(1))
        else:
            end = data.find(b"endstream", sm.end())
            raw = data[sm.end() : end if end != -1 else n]
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith((b"\n", b"\r")):
                raw = raw[:-1]
            end = end if end != -1 else n
        if b"/FlateDecode" in head:
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                raw = None
        objs[num] = (head, raw)
        em = data.find(b"endobj", end)
        pos = em + 6 if em != -1 else n


def _page_content_order(objs: dict[int, tuple[bytes, bytes | None]]) -> list[int]:
    """Content-object numbers in page-tree order (flat /Kids), falling back
    to ascending object order of /Type /Page objects."""
    pages_nodes = [
        n for n, (body, _) in objs.items()
        if b"/Type" in body and b"/Pages" in body and b"/Kids" in body
    ]
    page_nums: list[int] = []
    for n in sorted(pages_nodes):
        km = _KIDS_RE.search(objs[n][0])
        if km:
            page_nums.extend(int(g) for g in _KID_REF_RE.findall(km.group(1)))
    if not page_nums:
        page_nums = sorted(
            n for n, (body, _) in objs.items()
            if re.search(rb"/Type\s*/Page\b", body)
        )
    out: list[int] = []
    for pn in page_nums:
        if pn not in objs:
            continue
        rm = _REF_RE.search(objs[pn][0])
        if rm:
            out.append(int(rm.group(1)))
    return out


def _pdf_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse the literal string starting at data[i] == '('.  Returns
    (decoded bytes, index past the closing paren)."""
    assert data[i] == 0x28
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash escape
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in (0x6E, 0x72, 0x74, 0x62, 0x66):  # n r t b f
                out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                i += 1
            elif e in (0x28, 0x29, 0x5C):
                out.append(e)
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = [e - 0x30]
                i += 1
                while i < n and len(oct_digits) < 3 and 0x30 <= data[i] <= 0x37:
                    oct_digits.append(data[i] - 0x30)
                    i += 1
                v = 0
                for d in oct_digits:
                    v = v * 8 + d
                out.append(v & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the char itself
                out.append(e)
                i += 1
            continue
        if c == 0x28:
            depth += 1
            out.append(c)
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(c)
        else:
            out.append(c)
        i += 1
    return bytes(out), i


def _stream_text_lines(stream: bytes) -> list[str]:
    """Shown-text lines of one content stream (see module docstring)."""
    lines: list[str] = []
    cur: list[bytes] = []
    pending: list[bytes] = []  # strings read since the last operator token

    def flush_line() -> None:
        if cur:
            lines.append(b"".join(cur).decode("utf-8", errors="replace"))
            cur.clear()

    i, n = 0, len(stream)
    while i < n:
        c = stream[i]
        if c == 0x28:  # literal string
            s, i = _pdf_string(stream, i)
            pending.append(s)
            continue
        if c == 0x25:  # comment
            while i < n and stream[i] not in (0x0A, 0x0D):
                i += 1
            continue
        if (0x41 <= c <= 0x5A) or (0x61 <= c <= 0x7A) or c in (0x27, 0x22):
            m = _OP_RE.match(stream, i)
            op = m.group()
            if op == b"Tj" or op == b"TJ":
                cur.extend(pending)
            elif op == b"'":
                flush_line()
                cur.extend(pending)
            elif op == b'"':
                flush_line()
                cur.extend(pending[-1:])
            elif op in (b"Td", b"TD", b"T*"):
                flush_line()
            pending.clear()
            i = m.end()
            continue
        i += 1
    flush_line()
    return lines


def extract_pdf_text(data: bytes) -> str:
    """Best-effort text of a (Flate or raw) literal-string PDF.  Total:
    returns "" for inputs with no parseable text objects, never raises."""
    if not data.startswith(b"%PDF"):
        return ""
    objs = _parse_objects(data)
    lines: list[str] = []
    content_nums = _page_content_order(objs)
    if not content_nums:  # no page tree: any stream containing a text object
        content_nums = sorted(
            n for n, (_, s) in objs.items() if s is not None and b"BT" in s
        )
    for cn in content_nums:
        body = objs.get(cn)
        if body is None or body[1] is None:
            continue
        lines.extend(_stream_text_lines(body[1]))
    return "\n".join(lines)

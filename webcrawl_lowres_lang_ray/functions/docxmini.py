"""Minimal real DOCX text kernel — stdlib-only writer/reader pair.

The reference extracts DOCX text with python-docx:
``" ".join(p.text for p in Document(f).paragraphs)`` (nlp.py:110-112),
where ``Paragraph.text`` is the concatenation of the paragraph's run texts.
python-docx is absent from this container; OOXML is just a zip of XML
(ECMA-376), so the same semantics fall out of stdlib ``zipfile`` +
``xml.etree``:

* ``build_docx(paragraphs)`` — a valid minimal .docx: [Content_Types].xml,
  _rels/.rels, and word/document.xml with one ``w:p``/``w:r``/``w:t`` per
  paragraph.  Zip entries carry a fixed timestamp, so output is
  byte-deterministic for a given input.
* ``extract_docx_text(data)`` — reads word/document.xml, walks ``w:p``
  elements in document order, joins each paragraph's descendant ``w:t``
  texts (run concatenation = python-docx ``Paragraph.text``), then joins
  paragraphs with a single space exactly as the reference does.  Total:
  returns "" for non-zip/malformed input, never raises.
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree
from xml.sax.saxutils import escape

_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" '
    'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)


def build_docx(paragraphs: list[str]) -> bytes:
    """A valid minimal .docx showing ``paragraphs``; byte-deterministic."""
    body = "".join(
        f'<w:p><w:r><w:t xml:space="preserve">{escape(p)}</w:t></w:r></w:p>'
        for p in paragraphs
    )
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W_NS}"><w:body>{body}</w:body></w:document>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, content in (
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("_rels/.rels", _RELS),
            ("word/document.xml", document),
        ):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, content)
    return buf.getvalue()


def extract_docx_text(data: bytes) -> str:
    """python-docx-equivalent text of a .docx (see module docstring)."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            xml_bytes = z.read("word/document.xml")
        root = ElementTree.fromstring(xml_bytes)
    except (zipfile.BadZipFile, KeyError, ElementTree.ParseError, ValueError):
        return ""
    paras: list[str] = []
    for p in root.iter(f"{{{_W_NS}}}p"):
        paras.append("".join(t.text or "" for t in p.iter(f"{{{_W_NS}}}t")))
    return " ".join(paras)

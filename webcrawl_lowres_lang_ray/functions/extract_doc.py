"""Multi-format document text extraction dispatch (reference M8–M10,
nlp.py:90-115).

* html  — real (functions/html_text.py, the byte-identical invariant path);
* pdf   — PyPDF2 page-loop semantics (nlp.py:100-109) when PyPDF2 is
          importable; otherwise the stdlib Flate/literal-string kernel in
          functions/pdfmini.py (real extraction for the PDF subset the
          pipeline produces; documented divergences in that module);
* docx  — python-docx paragraphs joined with " " (nlp.py:110-112) when
          importable; otherwise the stdlib OOXML kernel in
          functions/docxmini.py (same join semantics via zipfile + etree);
* other — returns None (the reference prints and returns None,
          nlp.py:113-115), which the rejection policy maps to
          "no extracted text" (lrl-crawler.py:431-433).
"""

from __future__ import annotations

import io

from .html_text import extract_text_from_html_bytes


def extract_pdf_bytes(data: bytes) -> str:
    try:
        import PyPDF2  # noqa: F401
    except ImportError:
        from .pdfmini import extract_pdf_text

        return extract_pdf_text(data)
    reader = PyPDF2.PdfReader(io.BytesIO(data))
    text = ""
    for page in reader.pages:
        text += page.extract_text()
    return text


def extract_docx_bytes(data: bytes) -> str:
    try:
        import docx  # noqa: F401
    except ImportError:
        from .docxmini import extract_docx_text

        return extract_docx_text(data)
    d = docx.Document(io.BytesIO(data))
    return " ".join(p.text for p in d.paragraphs)


def extract_text_auto(data: bytes, doc_type: str) -> str | None:
    """nlp.extract_text_from_file dispatch on doc_type (nlp.py:90-115)."""
    if doc_type == "html":
        return extract_text_from_html_bytes(data)
    if doc_type == "pdf":
        return extract_pdf_bytes(data)
    if doc_type == "docx":
        return extract_docx_bytes(data)
    return None


def sniff_doc_type(content_type: str | None) -> str | None:
    """Content-Type -> doc_type (reference M5, lrl-crawler.py:192-206):
    missing header => html; unknown type => None (dropped)."""
    if content_type is None:
        return "html"
    if "html" in content_type:
        return "html"
    if "pdf" in content_type:
        return "pdf"
    if "msword" in content_type or "vnd.openxmlformats-officedocument" in content_type:
        return "docx"
    return None

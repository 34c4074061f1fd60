"""Lexicon / config JSON IO (reference S1, S3, S4; fileutils.py:35-96).

The reference reads JSON-with-comments via the ``jsonc`` package
(fileutils.py:1,38); this module implements an equivalent comment-stripping
loader with the standard library, and the writers match the reference's
``ensure_ascii=False, indent=4`` dumps (fileutils.py:41-50).
"""

from __future__ import annotations

import json
import re

_LINE_COMMENT_RE = re.compile(r'^\s*//.*$', re.MULTILINE)
_TRAILING_COMMENT_RE = re.compile(r'(?<=[,{}\[\]0-9"el])\s+//[^"\n]*$', re.MULTILINE)


def loads_jsonc(text: str):
    """Parse JSON allowing // line comments (the reference's config.json
    format, config.json:5-14)."""
    stripped = _LINE_COMMENT_RE.sub("", text)
    stripped = _TRAILING_COMMENT_RE.sub("", stripped)
    return json.loads(stripped)


def read_jsonc(path: str):
    with open(path, "r", encoding="utf-8") as f:
        return loads_jsonc(f.read())


def save_to_json(data, filename: str, indent: int = 4) -> str:
    """fileutils.save_to_json parity (ensure_ascii=False, indent=4)."""
    with open(filename, "w", encoding="utf-8") as f:
        json.dump(data, f, ensure_ascii=False, indent=indent)
    return filename


def load_language_dictionary(path: str) -> dict | None:
    """fileutils.load_language_dictionary: None on any failure."""
    try:
        return read_jsonc(path)
    except Exception:
        return None

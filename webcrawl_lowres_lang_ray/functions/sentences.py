"""Sentence splitting (reference N10, tongan-sentence-splitter.py:1-29).

The reference uses spaCy's blank "xx" pipeline with the rule-based
``Sentencizer`` (default punct chars . ! ? plus unicode terminators).
spaCy is absent in this container, so this is a deterministic rule-based
equivalent of the Sentencizer's core behavior: split after sentence-final
punctuation followed by whitespace, keeping the punctuation with the
sentence.
"""

from __future__ import annotations

import re

_SENT_END_RE = re.compile(r"([.!?…‼‽]+)(\s+)")


def split_sentences(text: str) -> list[str]:
    if not text:
        return []
    marked = _SENT_END_RE.sub(lambda m: m.group(1) + "\x00", text)
    return [s.strip() for s in marked.split("\x00") if s.strip()]


def split_sentences_batch(texts) -> list[list[str]]:
    return [split_sentences(t) if t else [] for t in texts]

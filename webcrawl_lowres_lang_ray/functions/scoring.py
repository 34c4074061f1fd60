"""Document language scoring — the reference's core NLP payload (N1–N5).

Replicates ``nlp.detect_language_lingua`` / ``detect_para_language_lingua``
(nlp.py:276-459) with the primary detector swapped for the deterministic
n-gram model (functions/langid.py) and the cosine lexicon scorer
(functions/termdist.py):

* full-doc verdict: ``lang`` if full_conf > min_full_confidence else
  ``NON-<lang>``; ``<UNDEFINED>`` + conf 0.0 when the primary model doesn't
  support the language (nlp.py:405-416).
* paragraph loop: paragraphs with > min word count (threshold choice depends
  on supported-ness, nlp.py:293); per-para primary confidence counted as a
  match at ``>= min_para_confidence`` (nlp.py:344) and termdist cosine at
  ``>= min_termdist_para_confidence`` (nlp.py:336).
* rolled-up fields: para_count, para_count_lrl (primary count if supported
  else termdist count, nlp.py:428), para_perc_lrl rounded 2dp (nlp.py:429,458),
  full_conf rounded 2dp (nlp.py:455).
* rejection policy (N5, lrl-crawler.py:430-468): no text / all-whitespace
  cleaned text / no verdict / para_count_lrl == 0.

Both the single-threaded oracle and the distributed scorer actor call
``score_document`` — per-row parity is by construction, mirroring how the
real-world build would pin bs4+lingua versions.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..config import CrawlConfig
from .langid import NgramLangModel
from .termdist import TermVecModel
from .textnorm import clean_text, convert_text_to_paras


@dataclass
class ScoreResult:
    full_lang: str | None
    full_conf: float
    para_count: int
    para_count_lrl: int
    para_perc_lrl: float
    rejected: bool
    reject_reason: str
    # matched paragraphs, for the lexicon-regeneration loop (N6, extract.py:150-184)
    termdist_match_paras: list[str]
    primary_match_paras: list[str]


class LangScoringModel:
    """The per-actor scorer state: n-gram model + lexicon termvec, built once."""

    def __init__(self, word_dict: dict[str, int], cfg: CrawlConfig):
        self.cfg = cfg
        self.termvec = TermVecModel(word_dict)
        self.ngram = NgramLangModel(word_dict) if cfg.lang_supported else None

    def score_text(self, extracted_text: str | None) -> ScoreResult:
        """Full N3+N5 semantics over already-extracted text."""
        cfg = self.cfg
        if extracted_text is None:
            return _rejected("no extracted text")
        cleaned = clean_text(extracted_text)
        # NB: ''.isspace() is False — empty text intentionally falls through to
        # scoring (NON-LANG verdict, 0 paras), exactly as lrl-crawler.py:436.
        if cleaned.isspace():
            return _rejected("text all whitespace")

        supported = cfg.lang_supported and self.ngram is not None
        if supported:
            full_conf = self.ngram.confidence(cleaned)
            if full_conf > cfg.min_full_confidence:
                full_lang = cfg.lang
            else:
                full_lang = f"NON-{cfg.lang}"
        else:
            full_lang = "<UNDEFINED>"
            full_conf = 0.0

        min_para_word_len = (
            cfg.min_para_word_len if supported else cfg.min_termdist_para_word_len
        )
        paras = convert_text_to_paras(cleaned, min_para_word_len)

        primary_matches: list[str] = []
        termdist_matches: list[str] = []
        for para in paras:
            td_conf = self.termvec.confidence(para)
            if td_conf >= cfg.min_termdist_para_confidence:
                termdist_matches.append(para)
            if supported:
                p_conf = self.ngram.confidence(para)
                if p_conf >= cfg.min_para_confidence:
                    primary_matches.append(para)

        num_paras = len(paras)
        lrl_match_count = len(primary_matches) if supported else len(termdist_matches)
        perc = (lrl_match_count / num_paras) * 100 if num_paras > 0 else 0

        rejected = lrl_match_count == 0
        reason = "no LRL paragraphs" if rejected else ""
        return ScoreResult(
            full_lang=full_lang,
            full_conf=round(full_conf, 2),
            para_count=num_paras,
            para_count_lrl=lrl_match_count,
            para_perc_lrl=round(perc, 2),
            rejected=rejected,
            reject_reason=reason,
            termdist_match_paras=termdist_matches,
            primary_match_paras=primary_matches,
        )


def _rejected(reason: str) -> ScoreResult:
    return ScoreResult(
        full_lang=None,
        full_conf=0.0,
        para_count=0,
        para_count_lrl=0,
        para_perc_lrl=0.0,
        rejected=True,
        reject_reason=reason,
        termdist_match_paras=[],
        primary_match_paras=[],
    )

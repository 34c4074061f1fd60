"""Actor-pool stages: HTML extraction and language scoring.

The explicit stateful-stage form used by standalone pipelines (the crawl's
wave loop uses the same kernels with a per-worker module cache instead, to
avoid per-wave pool churn — frontier.py head comment).

Usage:
    scored = pages.map_batches(
        LangScorerStage, fn_constructor_kwargs={"lexicon_ref": ref, "cfg": cfg},
        batch_format="pandas", batch_size=256, concurrency=8)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from ..config import CrawlConfig
from ..functions.html_text import extract_text_from_html_bytes
from ..functions.scoring import LangScoringModel


class ExtractTextStage:
    """html:binary -> text:string (the input_hint per-row invariant op)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["text"] = [
            extract_text_from_html_bytes(h) if isinstance(h, (bytes, bytearray)) else ""
            for h in batch["html"]
        ]
        return batch


class LangScorerStage:
    """Stateful scorer: model built ONCE per actor (reference preloads the
    lingua model once per process, nlp.py:44)."""

    def __init__(self, lexicon_ref, cfg: CrawlConfig):
        lexicon = ray.get(lexicon_ref) if hasattr(lexicon_ref, "hex") else lexicon_ref
        self.model = LangScoringModel(lexicon, cfg)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        full_lang = np.empty(n, dtype=object)
        full_conf = np.zeros(n, dtype=np.float64)
        para_count = np.zeros(n, dtype=np.int64)
        para_lrl = np.zeros(n, dtype=np.int64)
        para_perc = np.zeros(n, dtype=np.float64)
        rejected = np.zeros(n, dtype=bool)
        for i, t in enumerate(batch["text"]):
            sr = self.model.score_text(t)
            full_lang[i] = sr.full_lang or ""
            full_conf[i] = sr.full_conf
            para_count[i] = sr.para_count
            para_lrl[i] = sr.para_count_lrl
            para_perc[i] = sr.para_perc_lrl
            rejected[i] = sr.rejected
        batch["nlp_full_lang"] = full_lang
        batch["nlp_full_confidence"] = full_conf
        batch["nlp_para_count"] = para_count
        batch["nlp_para_count_lrl"] = para_lrl
        batch["nlp_para_perc_lrl"] = para_perc
        batch["rejected"] = rejected
        return batch

"""Shared fixtures.  Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from webcrawl_lowres_lang_ray.raylog import install_empty_schema_filter
    install_empty_schema_filter()
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """Cached deterministic 500-page corpus (generated once per machine)."""
    from webcrawl_lowres_lang_ray.sources.synth import corpus_dir_for_pages

    return corpus_dir_for_pages(500)


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """A fresh tiny corpus in tmp (fast: for resume/kill tests that rewrite)."""
    from webcrawl_lowres_lang_ray.config import SynthConfig
    from webcrawl_lowres_lang_ray.sources.synth import generate_corpus

    out = str(tmp_path_factory.mktemp("corpus") / "tiny")
    generate_corpus(out, SynthConfig(n_pages=120, n_hosts=10, seeds_per_corpus=8))
    return out


@pytest.fixture(scope="session")
def oracle_result(small_corpus):
    from webcrawl_lowres_lang_ray.config import CrawlConfig
    from webcrawl_lowres_lang_ray.oracle import run_oracle

    return run_oracle(small_corpus, CrawlConfig())

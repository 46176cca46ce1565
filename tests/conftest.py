"""Session-scoped Ray fixture: ONE ray.init per pytest session."""

from __future__ import annotations

import warnings

import pytest

warnings.filterwarnings("ignore")


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_pages():
    """~500-row deterministic pages corpus (FIXTURES.md §1 'tiny')."""
    from mini_ivf_ray.sources.pages import generate_pages

    return generate_pages(500, seed=11, vocab_size=400, dup_frac=0.04)


@pytest.fixture(scope="session")
def tiny_index(tiny_pages, tmp_path_factory):
    """A built index over tiny_pages + the matching prepared docs df."""
    import ray.data

    from mini_ivf_ray.config import PipelineConfig
    from mini_ivf_ray.pipelines.build import build_index
    from mini_ivf_ray.stages.prepare import prepare_documents

    cfg = PipelineConfig(num_partitions=4, topk=10)
    idx = str(tmp_path_factory.mktemp("index") / "tiny")
    build_index(lambda: ray.data.from_arrow(tiny_pages), idx, cfg)
    docs = prepare_documents(ray.data.from_arrow(tiny_pages), cfg).to_pandas()
    return idx, cfg, docs

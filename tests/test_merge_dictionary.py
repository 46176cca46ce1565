"""Merge stage: the global dictionary agrees with corpus stats and with
the config-derived term locations (the 'stitched' global posting lists)."""

import numpy as np

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.stages.merge import load_dictionary
from mini_ivf_ray.state.stats import CorpusStats


def test_dictionary_matches_stats(tiny_index):
    idx, cfg, docs = tiny_index
    stats = CorpusStats.load(idx)
    tbl = load_dictionary(idx)
    assert tbl is not None
    terms = tbl["term"].to_pylist()
    assert terms == sorted(stats.df)  # every term, lexicographic
    dfs = dict(zip(terms, tbl["df"].to_numpy()))
    nps = dict(zip(terms, tbl["n_postings"].to_numpy()))
    locs = dict(zip(terms, tbl["locations"].to_pylist()))
    for t, df in stats.df.items():
        assert dfs[t] == df
        assert nps[t] == df  # one posting per (term, doc)
        expect = list(dict.fromkeys(stats.term_locations(t, cfg)))
        assert locs[t] == expect, t


def test_dictionary_salted(tmp_path):
    import ray.data

    from mini_ivf_ray.pipelines.build import build_index
    from mini_ivf_ray.sources.pages import generate_pages

    cfg = PipelineConfig(num_partitions=4, hot_df_threshold=40)
    pages = generate_pages(400, seed=51, vocab_size=200)
    idx = str(tmp_path / "idx")
    build_index(lambda: ray.data.from_arrow(pages), idx, cfg)
    stats = CorpusStats.load(idx)
    tbl = load_dictionary(idx)
    locs = dict(zip(tbl["term"].to_pylist(), tbl["locations"].to_pylist()))
    hot = [t for t in stats.salt_counts(cfg)]
    assert hot
    for t in hot:
        assert len(locs[t]) >= 1
        assert locs[t] == list(dict.fromkeys(stats.term_locations(t, cfg)))

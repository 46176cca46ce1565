"""Significant terms: local replay identity + degenerate cases."""

import numpy as np

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.sigterms import significant_terms
from mini_ivf_ray.state.stats import CorpusStats


def _local(docs, idx, qtext, topn):
    stats = CorpusStats.load(idx)
    qt = set(tokenize(qtext))
    sets = [set(tokenize(t)) for t in docs["text"]]
    hit = [s for s in sets if not qt.isdisjoint(s)]
    m = len(hit)
    if not m:
        return []
    cnt = {}
    for s in hit:
        for t in s:
            cnt[t] = cnt.get(t, 0) + 1
    terms = np.array(sorted(t for t in cnt if stats.df.get(t, 0) > 0))
    fgv = np.array([cnt[t] for t in terms], dtype=np.float64)
    dfv = np.array([stats.df[t] for t in terms], dtype=np.float64)
    score = (fgv / m) / (dfv / float(stats.n_docs))
    order = np.argsort(terms, kind="stable")
    order = order[np.argsort(-score[order], kind="stable")][:topn]
    return [
        (r, str(terms[i]), int(fgv[i]), m, float(score[i]))
        for r, i in enumerate(order)
    ]


def test_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    queries = [(0, "w00042 w00100"), (1, "the")]
    ds = ray.data.from_pandas(docs[["doc_id", "text"]]).repartition(6)
    res = significant_terms(idx, ds, queries, topn=8)
    for qid, text in queries:
        want = _local(docs, idx, text, 8)
        g = res[res["query_id"] == qid].sort_values("rank")
        got = [
            (int(r), str(t), int(f), int(m), float(s))
            for r, t, f, m, s in zip(
                g["rank"], g["term"], g["fg"], g["m"], g["score"]
            )
        ]
        assert got == want, qid


def test_query_terms_rank_high_and_oov_empty(tiny_index):
    idx, cfg, docs = tiny_index
    ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    res = significant_terms(idx, ds, [(0, "w00042"), (1, "zz9999qq")], topn=5)
    assert 1 not in set(res["query_id"])
    g = res[res["query_id"] == 0].sort_values("rank")
    assert g.iloc[0]["term"] == "w00042"  # lift of own rare term is max
    # the query term matches every doc of its own match set (fg == m),
    # so its lift is (fg/m)/(df/N) with fg/m == 1 — pin the exact value
    # with the engine's own operation order
    stats = CorpusStats.load(idx)
    row = g.iloc[0]
    want = (float(row["fg"]) / float(row["m"])) / (
        float(stats.df["w00042"]) / float(stats.n_docs)
    )
    assert int(row["fg"]) == int(row["m"]) == stats.df["w00042"]
    assert row["score"] == want
    assert (g["score"].to_numpy() > 0).all()


def test_distributed_combiner_identical(tiny_index):
    """Forced-distributed groupby(query_id, term).sum combiner equals
    the driver-merge path exactly (integer sums both ways), and the
    auto threshold routes a low bound to the distributed path."""
    import pandas as pd

    idx, cfg, docs = tiny_index
    queries = [(0, "w00042 w00100"), (1, "the"), (2, "zz_oov_zz")]
    ds = ray.data.from_pandas(docs[["doc_id", "text"]]).repartition(6)
    drv = significant_terms(idx, ds, queries, topn=8, combine="driver")
    dist = significant_terms(idx, ds, queries, topn=8, combine="distributed")
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dist.reset_index(drop=True)
    )
    assert list(drv["score"]) == list(dist["score"])  # bit-identical
    auto = significant_terms(
        idx, ds, queries, topn=8, combine="auto", combine_threshold=1
    )
    pd.testing.assert_frame_equal(drv.reset_index(drop=True), auto)


def test_background_filter_changes_lift(ray_session):
    """background_filter: lift is measured against the filtered
    background only — a term common everywhere but rare in the
    background gains lift; background-absent terms are excluded;
    degenerate filter == plain significant_terms when it matches
    every doc (single-lang corpus)."""
    import numpy as np
    import ray.data

    from mini_ivf_ray.pipelines.sigterms import (
        significant_terms_filtered_background,
    )

    docs = [
        # en background: 'alpha' rare in en, common in de
        {"doc_id": 0, "lang": "en", "text": "alpha beta"},
        {"doc_id": 1, "lang": "en", "text": "beta gamma"},
        {"doc_id": 2, "lang": "en", "text": "beta gamma"},
        {"doc_id": 3, "lang": "en", "text": "gamma delta"},
        {"doc_id": 4, "lang": "de", "text": "alpha beta"},
        {"doc_id": 5, "lang": "de", "text": "alpha gamma"},
    ]
    ds = ray.data.from_items(docs)
    # build a tiny index just for the call signature (stats unused by
    # the bg variant beyond tokenization) — reuse the corpus itself
    import tempfile

    from mini_ivf_ray.config import PipelineConfig
    from mini_ivf_ray.pipelines.build import build_index
    from mini_ivf_ray.sources.pages import generate_pages

    cfg = PipelineConfig(num_partitions=2, topk=10)
    idx = tempfile.mkdtemp(prefix="sigbg_")
    build_index(
        lambda: ray.data.from_arrow(generate_pages(50, seed=3,
                                                   vocab_size=40)),
        idx, cfg,
    )
    out = significant_terms_filtered_background(
        idx, ds, [(0, "beta")], ("lang", "en"), topn=10
    )
    # match set of 'beta': docs 0,1,2,4 (m=4); fg counts over those
    got = {
        t: (int(f), round(float(s), 6))
        for t, f, s in zip(out["term"], out["fg"], out["score"])
    }
    # bg (en): N=4; df: alpha 1, beta 3, gamma 3, delta 1
    # fg: alpha 2, beta 4, gamma 2
    assert got["alpha"] == (2, round((2 / 4) / (1 / 4), 6))  # lift 2.0
    assert got["beta"] == (4, round((4 / 4) / (3 / 4), 6))
    assert got["gamma"] == (2, round((2 / 4) / (3 / 4), 6))
    # alpha (rare in en, boosted) outranks beta and gamma
    assert out.sort_values("rank")["term"].iloc[0] == "alpha"
    # background-absent: a term only in de docs (none here besides
    # alpha which IS in en once) — synthesize: query 'delta' matches
    # doc 3 only; its terms all exist in en bg, so all ranked
    out2 = significant_terms_filtered_background(
        idx, ds, [(1, "delta")], ("lang", "de"), topn=10
    )
    # de background lacks 'delta' entirely -> delta excluded from its
    # own match set's ranking
    assert "delta" not in set(out2["term"])

"""BM25F field boosting: the token-replication identity.

Proves the reduction (functions/fields.py) rather than just engine/
oracle consistency: for the boosted corpus, the engine's BM25 scores
equal the BM25F formula computed DIRECTLY from per-field tf/dl with
integer weights (w_title = 2, w_body = 1) — tf' = 2*tf_t + tf_b,
dl' = 2*|title| + |body|, df unchanged.
"""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.fields import boost_title_texts
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import BM25Searcher
from mini_ivf_ray.state.stats import CorpusStats

N_TITLE, BOOST = 8, 2


def test_boost_identity_unit():
    texts = ["a b c d e f g h i j", "x", ""]
    out = boost_title_texts(texts, n_title=3, boost=2)
    assert tokenize(out[0]) == ["a", "b", "c"] + tokenize(texts[0])
    assert tokenize(out[1]) == ["x", "x"]
    assert out[2] == ""
    assert boost_title_texts(texts, boost=1) == texts
    with pytest.raises(ValueError):
        boost_title_texts(texts, boost=0)


def test_engine_scores_equal_direct_bm25f(tiny_index, tmp_path):
    import ray

    from mini_ivf_ray.pipelines.build import build_index
    from mini_ivf_ray.sources.pages import generate_pages
    from mini_ivf_ray.stages.prepare import prepare_documents

    cfg = PipelineConfig(num_partitions=4, topk=10)
    tbl = generate_pages(300, seed=17, vocab_size=300)

    def boosted_factory():
        import pyarrow as pa

        def boost(batch: "pa.Table") -> "pa.Table":
            texts = boost_title_texts(
                batch["text"].to_pylist(), n_title=N_TITLE, boost=BOOST
            )
            cols = {n: batch[n] for n in batch.column_names}
            cols["text"] = pa.array(texts, type=pa.string())
            # html must carry the boosted text too (the build extracts
            # from html); rebuild it the same way generate_pages did
            from mini_ivf_ray.sources.pages import wrap_html

            urls = batch["url"].to_pylist()
            cols["html"] = pa.array(
                [wrap_html(t, u) for t, u in zip(texts, urls)],
                type=pa.binary(),
            )
            return pa.table(cols)

        return ray.data.from_arrow(tbl).map_batches(
            boost, batch_format="pyarrow"
        )

    idx = str(tmp_path / "bm25f")
    build_index(boosted_factory, idx, cfg)

    # direct BM25F model from the UNboosted corpus fields
    docs = prepare_documents(
        ray.data.from_arrow(tbl), cfg, dedup=True
    ).to_pandas()
    fields = {}
    for d, t in zip(docs["doc_id"], docs["text"]):
        toks = tokenize(t)
        title, body = toks[:N_TITLE], toks
        fields[int(d)] = (title, body)
    stats = CorpusStats.load(idx)
    # weighted corpus invariants
    n_docs = len(fields)
    assert stats.n_docs == n_docs
    # dl' = 2*|title| + |body| where title tokens already inside body:
    # replicated stream = title*(BOOST-1) + body
    dls = {
        d: (BOOST - 1) * len(t) + len(b) for d, (t, b) in fields.items()
    }
    assert abs(stats.avgdl - np.mean(list(dls.values()))) < 1e-9

    s = BM25Searcher(idx, cfg)
    queries = ["key table scan", "sort merge", "window data fast"]
    for qt in queries:
        got = s.topk_for_text(qt)
        # manual BM25F: tf' = (BOOST-1)*tf_title + tf_body, df from
        # document containment (unchanged by replication)
        terms = sorted(set(tokenize(qt)))
        scores = {}
        for d, (title, body) in fields.items():
            sc = 0.0
            for t in terms:
                tfp = (BOOST - 1) * title.count(t) + body.count(t)
                if tfp == 0 or stats.df.get(t, 0) == 0:
                    continue
                idf = bm25.idf(stats.df[t], stats.n_docs)
                sc += idf * (tfp * (cfg.k1 + 1.0)) / (
                    tfp
                    + cfg.k1 * (1.0 - cfg.b + cfg.b * dls[d] / stats.avgdl)
                )
            if sc > 0:
                scores[d] = sc
        want = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[: cfg.topk]
        assert [d for d, _ in want] == [d for d, _ in got], qt
        for (wd, ws), (gd, gs) in zip(want, got):
            assert abs(ws - gs) < 1e-9, (qt, wd)

"""Doc-sharded rerank serving (ShardedIndex.rerank_search): bit-exact
identity with the single-index rank_feature / decay / boosting
pipelines — every doc scored fully in exactly one shard, merge over
shards x k slim rows."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.pipelines.serving import ShardedIndex

QUERIES = [(0, "the data web"), (1, "w00042 of")]


def _field(docs):
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    vals = np.array([float(len(t)) for t in docs["text"]], dtype=np.float64)
    return ids, vals


def _qds():
    return ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in QUERIES]
    )


def _canon(df):
    return (
        df.sort_values(["query_id", "rank"])
        .reset_index(drop=True)[["query_id", "rank", "doc_id", "score"]]
    )


def test_sharded_rerank_identity_all_modes(tiny_index):
    from mini_ivf_ray.pipelines.boosting import boosting_search
    from mini_ivf_ray.pipelines.decay import decay_search
    from mini_ivf_ray.pipelines.rankfeature import rank_feature_search

    idx, cfg, docs = tiny_index
    ids, vals = _field(docs)
    sharded = ShardedIndex(idx, cfg, num_shards=3)
    try:
        # sidecar contract: rank_feature/decay refuse before attach
        with pytest.raises(ValueError, match="attach_value_sidecar"):
            sharded.rerank_search(QUERIES, "rank_feature", {})
        sharded.attach_value_sidecar(ids, vals)

        rf_kw = {"function": "saturation", "boost": 2.0, "pivot": 20.0}
        single = rank_feature_search(
            idx, _qds(), ids, vals, cfg, **rf_kw
        ).to_pandas()
        got = sharded.rerank_search(QUERIES, "rank_feature", rf_kw)
        for c, dt in (("doc_id", np.uint64), ("score", np.float64)):
            # exact: doc ids must never round-trip through float64
            assert np.array_equal(
                _canon(got)[c].to_numpy().astype(dt),
                _canon(single)[c].to_numpy().astype(dt),
            ), ("rank_feature", c)

        # distance mode rides the same rank_feature machinery: the
        # origin param must thread through the sharded path too
        df_kw = {
            "function": "distance", "boost": 3.0,
            "pivot": 10.0, "origin": float(np.median(vals)),
        }
        single = rank_feature_search(
            idx, _qds(), ids, vals, cfg, **df_kw
        ).to_pandas()
        got = sharded.rerank_search(QUERIES, "rank_feature", df_kw)
        for c, dt in (("doc_id", np.uint64), ("score", np.float64)):
            assert np.array_equal(
                _canon(got)[c].to_numpy().astype(dt),
                _canon(single)[c].to_numpy().astype(dt),
            ), ("distance", c)

        dc_kw = {
            "mode": "gauss", "origin": float(np.median(vals)),
            "scale": 5.0, "offset": 1.0, "decay": 0.5,
        }
        single = decay_search(idx, _qds(), ids, vals, cfg, **dc_kw).to_pandas()
        got = sharded.rerank_search(QUERIES, "decay", dc_kw)
        for c, dt in (("doc_id", np.uint64), ("score", np.float64)):
            # exact: doc ids must never round-trip through float64
            assert np.array_equal(
                _canon(got)[c].to_numpy().astype(dt),
                _canon(single)[c].to_numpy().astype(dt),
            ), ("decay", c)

        bq = [(0, "the data web", "w00042", 0.25), (1, "a data", "web", 0.5)]
        bqs = ray.data.from_items(
            [
                {
                    "query_id": q, "positive": p,
                    "negative": n, "negative_boost": nb,
                }
                for q, p, n, nb in bq
            ]
        )
        single = boosting_search(idx, bqs, cfg).to_pandas()
        got = sharded.rerank_search(bq, "boosting")
        for c, dt in (("doc_id", np.uint64), ("score", np.float64)):
            # exact: doc ids must never round-trip through float64
            assert np.array_equal(
                _canon(got)[c].to_numpy().astype(dt),
                _canon(single)[c].to_numpy().astype(dt),
            ), ("boosting", c)
        # contracts
        with pytest.raises(Exception, match="unknown rerank mode|mode"):
            sharded.rerank_search(QUERIES, "bogus", {})
        with pytest.raises(Exception, match="negative_boost"):
            sharded.rerank_search(
                [(0, "the data", "web", 1.5)], "boosting"
            )
    finally:
        sharded.shutdown()


def test_sharded_similarity_identity_all_models(tiny_index):
    """similarity_search == the single-index pluggable-similarity
    pipelines bit-exactly (dirichlet / jm / classic), 3 shards."""
    from mini_ivf_ray.pipelines.classic import classic_search
    from mini_ivf_ray.pipelines.lm_dirichlet import (
        dirichlet_search,
        jelinek_mercer_search,
    )

    idx, cfg, docs = tiny_index
    sharded = ShardedIndex(idx, cfg, num_shards=3)
    try:
        cases = [
            ("dirichlet", {"mu": 1500.0},
             lambda q: dirichlet_search(idx, q, cfg, mu=1500.0)),
            ("jm", {"lam": 0.2},
             lambda q: jelinek_mercer_search(idx, q, cfg, lam=0.2)),
            ("classic", {},
             lambda q: classic_search(idx, q, cfg)),
        ]
        for model, params, single_fn in cases:
            single = single_fn(_qds()).to_pandas()
            got = sharded.similarity_search(QUERIES, model, params)
            assert len(got), model
            for c, dt in (("doc_id", np.uint64), ("score", np.float64)):
                # exact: doc ids must never round-trip through float64
                assert np.array_equal(
                    _canon(got)[c].to_numpy().astype(dt),
                    _canon(single)[c].to_numpy().astype(dt),
                ), (model, c)
        with pytest.raises(Exception, match="unknown similarity"):
            sharded.similarity_search(QUERIES, "bm42")
    finally:
        sharded.shutdown()


def test_sharded_agg_family_identity(tiny_index):
    """pct_ranks / grouped_metric_top / adjacency_buckets served
    doc-sharded == the single-index pipelines bit-exactly."""
    from mini_ivf_ray.pipelines.adjacency import adjacency_search
    from mini_ivf_ray.pipelines.extstats import (
        grouped_metric_top,
        percentile_ranks_search,
    )

    idx, cfg, docs = tiny_index
    ids, vals = _field(docs)

    def label_of(doc_id):
        return ["red", "green", "blue", "teal"][int(doc_id) % 4]

    labels = [label_of(d) for d in docs["doc_id"]]
    filters = [("d", "data"), ("w", "web"), ("t", "the")]
    thresholds = [float(np.min(vals)) - 1.0, float(np.median(vals)),
                  float(np.max(vals))]
    sharded = ShardedIndex(idx, cfg, num_shards=3)
    try:
        with pytest.raises(ValueError, match="attach_value_sidecar"):
            sharded.pct_ranks(QUERIES, thresholds)
        sharded.attach_value_sidecar(ids, vals)
        with pytest.raises(ValueError, match="attach_sidecar"):
            sharded.grouped_metric_top(QUERIES)
        sharded.attach_sidecar(ids, labels)

        single = (
            percentile_ranks_search(idx, _qds(), ids, vals, thresholds, cfg)
            .to_pandas()
            .sort_values(["query_id", "value"])
            .reset_index(drop=True)
        )
        got = sharded.pct_ranks(QUERIES, thresholds).sort_values(
            ["query_id", "value"]
        ).reset_index(drop=True)
        assert list(got["query_id"]) == list(single["query_id"])
        assert np.array_equal(got["pct"].to_numpy(), single["pct"].to_numpy())
        assert list(got["n_docs"]) == list(single["n_docs"])

        single = (
            grouped_metric_top(
                idx, _qds(), ids, labels, ids, vals, cfg, num_buckets=2
            )
            .to_pandas()
            .reset_index(drop=True)
        )
        got = sharded.grouped_metric_top(QUERIES, num_buckets=2)
        assert list(zip(got["facet"], got["n_docs"])) == list(
            zip(single["facet"], single["n_docs"])
        )
        assert np.array_equal(
            got["avg_v"].to_numpy(), single["avg_v"].to_numpy()
        )

        single = adjacency_search(idx, _qds(), filters, cfg).to_pandas()
        got = sharded.adjacency_buckets(QUERIES, filters)
        assert list(zip(got["query_id"], got["key"], got["n_docs"])) == list(
            zip(single["query_id"], single["key"], single["n_docs"])
        )
    finally:
        sharded.shutdown()

"""Pinned query (ES pinned): pins first in order at PIN_BASE - rank,
organic tail excludes pins, cap/dedup/tombstone/nonexistent-id
contracts, plus the distance_feature extension of feature_contrib."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.pipelines.pinned import PIN_BASE, pinned_search
from mini_ivf_ray.pipelines.query import search


def _pinned(idx, cfg, rows):
    qds = ray.data.from_items(
        [{"query_id": q, "text": t, "pins": p} for q, t, p in rows]
    )
    return (
        pinned_search(idx, qds, cfg)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def _plain(idx, cfg, qid, text):
    qds = ray.data.from_items([{"query_id": qid, "text": text}])
    return search(idx, qds, cfg).to_pandas().sort_values("rank")


def test_pins_first_then_organic_excluding_pins(tiny_index):
    idx, cfg, docs = tiny_index
    plain = _plain(idx, cfg, 0, "the data web")
    organic_ids = plain["doc_id"].to_numpy().astype(np.uint64)
    # pin one doc that ranks organically (top-1) and one that does not
    in_pin = int(organic_ids[0])
    all_ids = set(map(int, docs["doc_id"]))
    out_pin = next(iter(all_ids - set(map(int, organic_ids))))
    got = _pinned(idx, cfg, [(0, "the data web", [out_pin, in_pin])])
    assert len(got) == cfg.topk
    # pins first, given order, stand-in scores
    assert int(got.loc[0, "doc_id"]) == out_pin
    assert int(got.loc[1, "doc_id"]) == in_pin
    assert got.loc[0, "score"] == PIN_BASE
    assert got.loc[1, "score"] == PIN_BASE - 1.0
    # organic tail: plain ranking with the pinned doc removed, shifted
    tail = got.iloc[2:]
    expect_tail = [int(d) for d in organic_ids if int(d) != in_pin][
        : cfg.topk - 2
    ]
    assert [int(d) for d in tail["doc_id"]] == expect_tail
    exp_scores = {
        int(d): s for d, s in zip(plain["doc_id"], plain["score"])
    }
    for d, s in zip(tail["doc_id"], tail["score"]):
        assert exp_scores[int(d)] == s  # organic scores bit-identical
    assert len(set(map(int, got["doc_id"]))) == len(got)  # no dup


def test_pin_cap_dedup_and_nonexistent(tiny_index):
    idx, cfg, docs = tiny_index
    some = [int(d) for d in docs["doc_id"].head(cfg.topk + 5)]
    got = _pinned(idx, cfg, [(0, "the data", some)])
    # more pins than topk: cut at topk, all pinned
    assert len(got) == cfg.topk
    assert [int(d) for d in got["doc_id"]] == some[: cfg.topk]
    assert (got["score"] >= PIN_BASE - cfg.topk).all()
    # duplicates collapse to the first occurrence
    got = _pinned(idx, cfg, [(1, "the data", [some[0], some[0], some[1]])])
    assert [int(d) for d in got.head(2)["doc_id"]] == [some[0], some[1]]
    # a nonexistent id is emitted as given (documented caller-trusted
    # divergence from ES's existence check)
    ghost = 2**63 + 12345
    got = _pinned(idx, cfg, [(2, "the data", [ghost])])
    assert int(got.loc[0, "doc_id"]) == ghost
    # empty pins == plain search bit-identically
    got = _pinned(idx, cfg, [(3, "the data web", [])])
    plain = _plain(idx, cfg, 3, "the data web")
    assert np.array_equal(
        got["doc_id"].to_numpy().astype(np.uint64),
        plain["doc_id"].to_numpy().astype(np.uint64),
    )
    assert np.array_equal(
        got["score"].to_numpy(), plain["score"].to_numpy()
    )
    # OOV organic text still shows the pins
    got = _pinned(idx, cfg, [(4, "zzqq", [some[0]])])
    assert len(got) == 1 and int(got.loc[0, "doc_id"]) == some[0]


def test_tombstoned_pin_suppressed(tmp_path_factory):
    from mini_ivf_ray.pipelines.build import build_index
    from mini_ivf_ray.pipelines.maintenance import delete_docs
    from mini_ivf_ray.sources.pages import generate_pages
    from mini_ivf_ray.stages.prepare import prepare_documents

    cfg = PipelineConfig(num_partitions=3, topk=10)
    tbl = generate_pages(200, seed=33, vocab_size=200, dup_frac=0.0)
    idx = str(tmp_path_factory.mktemp("pintomb") / "idx")
    build_index(lambda: ray.data.from_arrow(tbl), idx, cfg)
    docs = prepare_documents(ray.data.from_arrow(tbl), cfg).to_pandas()
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    victim, survivor = ids[0], ids[1]
    delete_docs(idx, np.array([victim], dtype=np.uint64))
    got = _pinned(
        idx, cfg, [(0, "the data", [int(victim), int(survivor)])]
    )
    shown = [int(d) for d in got["doc_id"]]
    assert int(victim) not in shown
    assert shown[0] == int(survivor)


@pytest.mark.parametrize("v,expect", [
    (500.0, 3.0),           # at the origin: full boost
    (700.0, 1.5),           # at distance == pivot: half
    (300.0, 1.5),           # symmetric
])
def test_distance_feature_contrib_shape(v, expect):
    from mini_ivf_ray.pipelines.rankfeature import feature_contrib

    got = feature_contrib(
        np.array([v]), "distance", boost=3.0, pivot=200.0, origin=500.0
    )
    assert got[0] == pytest.approx(expect, abs=0, rel=0)
    # negative values are legal in distance mode (unlike rank_feature)
    assert feature_contrib(
        np.array([-100.0]), "distance", boost=1.0, pivot=100.0, origin=0.0
    )[0] == 0.5
    with pytest.raises(ValueError, match="non-negative"):
        feature_contrib(np.array([-1.0]), "saturation")
    with pytest.raises(ValueError, match="pivot"):
        feature_contrib(np.array([1.0]), "distance", pivot=0.0)


def test_distance_feature_search_local_replay(tiny_index):
    from mini_ivf_ray.pipelines.rankfeature import (
        feature_contrib,
        rank_feature_search,
    )
    from tests.test_decay import _field, _plain_bm25

    idx, cfg, docs = tiny_index
    ids, vals = _field(docs)
    origin = float(np.median(vals))
    qds = ray.data.from_items([{"query_id": 0, "text": "the data web"}])
    got = (
        rank_feature_search(
            idx, qds, ids, vals, cfg,
            function="distance", boost=2.0, pivot=5.0, origin=origin,
        )
        .to_pandas()
        .sort_values("rank")
    )
    scored = _plain_bm25(docs, idx, "the data web")
    contrib = dict(
        zip(
            ids.tolist(),
            feature_contrib(
                vals, "distance", boost=2.0, pivot=5.0, origin=origin
            ).tolist(),
        )
    )
    cands = [(d, s + contrib.get(int(d), 0.0)) for d, s in scored.items()]
    cands.sort(key=lambda x: (-x[1], x[0]))
    exp = cands[: cfg.topk]
    assert [int(d) for d in got["doc_id"]] == [int(d) for d, _ in exp]
    assert np.array_equal(
        got["score"].to_numpy(), np.array([s for _, s in exp])
    )

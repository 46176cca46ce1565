"""Function-score decay: local replay identity across all three modes,
plateau == plain BM25 bit-identically, missing-field == 1.0 multiplier,
non-vacuity of the reorder, contracts."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.decay import decay_multiplier, decay_search
from mini_ivf_ray.pipelines.query import search
from mini_ivf_ray.state.stats import CorpusStats


def _plain_bm25(docs, idx, qtext):
    """(doc_id -> full BM25 sum) over every matching doc."""
    stats = CorpusStats.load(idx)
    toks = [tokenize(t) for t in docs["text"]]
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    order = np.argsort(ids)
    per = []
    for t in sorted(set(tokenize(qtext))):
        if stats.df.get(t, 0) <= 0:
            continue
        tf = np.array([tk.count(t) for tk in toks], dtype=np.float64)
        dl = np.array([len(tk) for tk in toks], dtype=np.float64)
        m = tf > 0
        per.append(
            (
                ids[order][m[order]],
                bm25.contributions(
                    tf[order][m[order]], dl[order][m[order]],
                    stats.df[t], stats.n_docs, stats.avgdl,
                ),
            )
        )
    if not per:
        return {}
    dc = np.concatenate([d for d, _ in per])
    uniq, inv = np.unique(dc, return_inverse=True)
    scores = np.zeros(uniq.size)
    np.add.at(scores, inv, np.concatenate([c for _, c in per]))
    return dict(zip(uniq.tolist(), scores.tolist()))


def _field(docs):
    """Synthetic numeric field: token count per doc (deterministic)."""
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    vals = np.array(
        [float(len(tokenize(t))) for t in docs["text"]], dtype=np.float64
    )
    return ids, vals


@pytest.mark.parametrize("mode", ["gauss", "exp", "linear"])
def test_decay_matches_local_replay(tiny_index, mode):
    idx, cfg, docs = tiny_index
    ids, vals = _field(docs)
    origin, scale, offset, dec = float(np.median(vals)), 5.0, 1.0, 0.5
    queries = [(0, "the data web"), (1, "w00042 of"), (2, "a data")]
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    res = decay_search(
        idx, qds, ids, vals, cfg,
        mode=mode, origin=origin, scale=scale, offset=offset, decay=dec,
    ).to_pandas()
    vmap = dict(
        zip(
            ids.tolist(),
            decay_multiplier(vals, mode, origin, scale, offset, dec).tolist(),
        )
    )
    for qid, text in queries:
        plain = _plain_bm25(docs, idx, text)
        want = sorted(
            ((s * vmap[d], d) for d, s in plain.items()),
            key=lambda t: (-t[0], t[1]),
        )[: cfg.topk]
        g = res[res["query_id"] == qid].sort_values("rank")
        got = list(
            zip(g["score"], g["doc_id"].to_numpy().astype(np.uint64))
        )
        assert [d for _, d in got] == [d for _, d in want], (mode, qid)
        assert np.allclose(
            [s for s, _ in got], [s for s, _ in want], rtol=0, atol=0
        ), (mode, qid)


def test_plateau_equals_plain_bm25(tiny_index):
    """offset so large every value sits in the plateau: d == 0, the
    multiplier is EXACTLY 1.0, scores bit-identical to plain BM25."""
    idx, cfg, docs = tiny_index
    ids, vals = _field(docs)
    qds = ray.data.from_items([{"query_id": 0, "text": "the data web"}])
    a = (
        decay_search(
            idx, qds, ids, vals, cfg,
            mode="gauss", origin=0.0, scale=3.0, offset=1e9, decay=0.5,
        )
        .to_pandas().sort_values("rank").reset_index(drop=True)
    )
    b = (
        search(idx, ray.data.from_items(
            [{"query_id": 0, "text": "the data web"}]), cfg)
        .to_pandas().sort_values("rank").reset_index(drop=True)
    )
    assert list(a["doc_id"].astype("uint64")) == list(
        b["doc_id"].astype("uint64")
    )
    assert np.array_equal(a["score"].to_numpy(), b["score"].to_numpy())


def test_missing_field_multiplies_by_one(tiny_index):
    """Docs absent from the sidecar keep their exact plain-BM25 score
    (ES missing-field rule), while covered docs decay."""
    idx, cfg, docs = tiny_index
    ids, vals = _field(docs)
    text = "the data web"
    plain = _plain_bm25(docs, idx, text)
    # sidecar covers exactly every other plain-top-k doc, with a MILD
    # multiplier (~0.99) so covered docs stay inside the top-k
    topk_ids = [
        d for _, d in sorted(
            ((-s, d) for d, s in plain.items())
        )[: cfg.topk]
    ]
    vmap_full = dict(zip(ids.tolist(), vals.tolist()))
    keep_ids = np.array(sorted(topk_ids[::2]), dtype=np.uint64)
    keep_vals = np.array([vmap_full[int(d)] for d in keep_ids])
    qds = ray.data.from_items([{"query_id": 0, "text": text}])
    scale = float(vals.max()) * 10.0
    got = decay_search(
        idx, qds, keep_ids, keep_vals, cfg,
        mode="exp", origin=0.0, scale=scale, offset=0.0, decay=0.3,
    ).to_pandas()
    covered = set(keep_ids.tolist())
    vmap = dict(
        zip(
            keep_ids.tolist(),
            decay_multiplier(
                keep_vals, "exp", 0.0, scale, 0.0, 0.3
            ).tolist(),
        )
    )
    assert len(got)
    saw_missing = saw_covered = False
    for d, s in zip(got["doc_id"].astype("uint64"), got["score"]):
        d = int(d)
        if d in covered:
            assert s == plain[d] * vmap[d]
            saw_covered = True
        else:
            assert s == plain[d]
            saw_missing = True
    assert saw_missing and saw_covered, "need both classes in the top-k"


def test_decay_actually_reorders(tiny_index):
    """With a biting origin/scale the decayed ranking provably differs
    from the plain-BM25 ranking for at least one query."""
    idx, cfg, docs = tiny_index
    ids, vals = _field(docs)
    origin = float(vals.min())  # strongly prefer the shortest docs
    text = "the data web"
    qds = ray.data.from_items([{"query_id": 0, "text": text}])
    a = decay_search(
        idx, qds, ids, vals, cfg,
        mode="gauss", origin=origin, scale=2.0, offset=0.0, decay=0.1,
    ).to_pandas().sort_values("rank")
    b = (
        search(idx, ray.data.from_items([{"query_id": 0, "text": text}]), cfg)
        .to_pandas().sort_values("rank")
    )
    assert list(a["doc_id"].astype("uint64")) != list(
        b["doc_id"].astype("uint64")
    )


def test_contracts(tiny_index):
    idx, cfg, docs = tiny_index
    ids, vals = _field(docs)
    qds = ray.data.from_items([{"query_id": 0, "text": "data"}])
    with pytest.raises(ValueError, match="mode"):
        decay_search(idx, qds, ids, vals, cfg, mode="cosine")
    with pytest.raises(ValueError, match="scale"):
        decay_search(idx, qds, ids, vals, cfg, scale=0.0)
    for bad in (0.0, 1.0, -0.5):
        with pytest.raises(ValueError, match="decay"):
            decay_search(idx, qds, ids, vals, cfg, scale=1.0, decay=bad)
    with pytest.raises(ValueError, match="offset"):
        decay_search(idx, qds, ids, vals, cfg, scale=1.0, offset=-1.0)
    oov = ray.data.from_items([{"query_id": 9, "text": "zzzqqq"}])
    assert decay_search(
        idx, oov, ids, vals, cfg, mode="linear", scale=3.0
    ).count() == 0

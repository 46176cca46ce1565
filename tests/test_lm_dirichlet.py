"""LM Dirichlet similarity: local replay identity + clip + OOV."""

import numpy as np

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.lm_dirichlet import dirichlet_search
from mini_ivf_ray.state.stats import CorpusStats


def _local_topk(docs, idx, qtext, k, mu=2000.0):
    stats = CorpusStats.load(idx)
    total = float(stats.total_tokens)
    toks = [tokenize(t) for t in docs["text"]]
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    order = np.argsort(ids)
    per_term = []
    for t in sorted(set(tokenize(qtext))):
        if stats.df.get(t, 0) <= 0:
            continue
        tf = np.array([tk.count(t) for tk in toks], dtype=np.float64)
        dl = np.array([len(tk) for tk in toks], dtype=np.float64)
        m = tf > 0
        cf = float(tf.sum())
        docs_t = ids[order][m[order]]
        tfs = tf[order][m[order]]
        dls = dl[order][m[order]]
        c = np.log1p(tfs / (mu * cf / total)) + np.log(mu / (dls + mu))
        np.maximum(c, 0.0, out=c)
        per_term.append((docs_t, c))
    if not per_term:
        return []
    dc = np.concatenate([d for d, _ in per_term])
    cc = np.concatenate([c for _, c in per_term])
    uniq, inv = np.unique(dc, return_inverse=True)
    scores = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(scores, inv, cc)
    out = sorted(zip(scores, uniq), key=lambda t: (-t[0], t[1]))[:k]
    return [(int(d), float(s)) for s, d in out]


def test_dirichlet_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    queries = [(0, "the data web"), (1, "w00042 w00100")]
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    res = dirichlet_search(idx, qds, cfg).to_pandas()
    for qid, text in queries:
        want = _local_topk(docs, idx, text, cfg.topk)
        g = res[res["query_id"] == qid].sort_values("rank")
        got = [
            (int(d), float(s))
            for d, s in zip(
                g["doc_id"].to_numpy().astype(np.uint64), g["score"]
            )
        ]
        assert got == want, qid


def test_scores_nonnegative_and_ranked(tiny_index):
    idx, cfg, docs = tiny_index
    qds = ray.data.from_items([{"query_id": 0, "text": "the the data"}])
    res = dirichlet_search(idx, qds, cfg).to_pandas().sort_values("rank")
    assert (res["score"].to_numpy() >= 0).all()
    assert (np.diff(res["score"].to_numpy()) <= 1e-12).all()


def test_oov_is_empty(tiny_index):
    idx, cfg, docs = tiny_index
    qds = ray.data.from_items([{"query_id": 0, "text": "zz9999qq"}])
    assert len(dirichlet_search(idx, qds, cfg).to_pandas()) == 0


def test_jelinek_mercer_matches_local_replay(tiny_index):
    from mini_ivf_ray.pipelines.lm_dirichlet import jelinek_mercer_search

    idx, cfg, docs = tiny_index
    stats = CorpusStats.load(idx)
    total = float(stats.total_tokens)
    lam = 0.1
    text = "the data web"
    qds = ray.data.from_items([{"query_id": 0, "text": text}])
    res = jelinek_mercer_search(idx, qds, cfg, lam=lam).to_pandas()
    toks = [tokenize(t) for t in docs["text"]]
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    order = np.argsort(ids)
    per_term = []
    for t in sorted(set(tokenize(text))):
        if stats.df.get(t, 0) <= 0:
            continue
        tf = np.array([tk.count(t) for tk in toks], dtype=np.float64)
        dl = np.array([len(tk) for tk in toks], dtype=np.float64)
        m = tf > 0
        cf = float(tf.sum())
        c = np.log1p(
            ((1.0 - lam) / lam)
            * (tf[order][m[order]] / dl[order][m[order]])
            / (cf / total)
        )
        per_term.append((ids[order][m[order]], c))
    dc = np.concatenate([d for d, _ in per_term])
    cc = np.concatenate([c for _, c in per_term])
    uniq, inv = np.unique(dc, return_inverse=True)
    scores = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(scores, inv, cc)
    want = sorted(zip(scores, uniq), key=lambda t: (-t[0], t[1]))[: cfg.topk]
    g = res.sort_values("rank")
    got = list(
        zip(g["score"], g["doc_id"].to_numpy().astype(np.uint64))
    )
    assert [(float(s), int(d)) for s, d in got] == [
        (float(s), int(d)) for s, d in want
    ]

"""Lucene ClassicSimilarity (TF-IDF): local replay identity, coord +
queryNorm pins (OOV query terms shrink coord and enter queryNorm),
single-term-vs-BM25 rank divergence non-vacuity, OOV handling."""

import numpy as np

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.classic import classic_search
from mini_ivf_ray.state.stats import CorpusStats


def _local_topk(docs, idx, qtext, k):
    stats = CorpusStats.load(idx)
    n = float(stats.n_docs)
    terms = sorted(set(tokenize(qtext)))
    if not terms:
        return []
    idf = {
        t: 1.0 + np.log(n / (float(stats.df.get(t, 0)) + 1.0)) for t in terms
    }
    qnorm = 1.0 / float(
        np.sqrt(np.sum(np.array([idf[t] * idf[t] for t in terms])))
    )
    maxov = float(len(terms))
    toks = [tokenize(t) for t in docs["text"]]
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    order = np.argsort(ids)
    per_term = []
    for t in terms:
        if stats.df.get(t, 0) <= 0:
            continue
        tf = np.array([tk.count(t) for tk in toks], dtype=np.float64)
        dl = np.array([len(tk) for tk in toks], dtype=np.float64)
        m = tf > 0
        per_term.append(
            (
                ids[order][m[order]],
                np.sqrt(tf[order][m[order]]) * (idf[t] * idf[t])
                / np.sqrt(dl[order][m[order]]),
            )
        )
    if not per_term:
        return []
    dc = np.concatenate([d for d, _ in per_term])
    cc = np.concatenate([c for _, c in per_term])
    uniq, inv = np.unique(dc, return_inverse=True)
    scores = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(scores, inv, cc)
    overlap = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(overlap, inv, 1.0)
    final = scores * (overlap / maxov) * qnorm
    out = sorted(zip(final, uniq), key=lambda t: (-t[0], t[1]))[:k]
    return [(int(d), float(s)) for s, d in out]


def _run(idx, cfg, queries):
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    return classic_search(idx, qds, cfg).to_pandas()


def test_classic_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    queries = [
        (0, "the data web"),
        (1, "w00042 w00100"),
        (2, "a data zzqq9999xx"),  # OOV term: coord < 1 on every match
    ]
    res = _run(idx, cfg, queries)
    assert len(res)
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


def test_classic_coord_and_querynorm_pins(tiny_index):
    """Appending an OOV term must (a) scale coord by old_max/new_max
    for docs whose overlap is unchanged and (b) shrink queryNorm —
    provable by comparing the same doc's score across both queries."""
    idx, cfg, docs = tiny_index
    base = "the data"
    with_oov = "the data zzqq9999xx"
    r1 = _run(idx, cfg, [(0, base)]).sort_values("rank")
    r2 = _run(idx, cfg, [(0, with_oov)]).sort_values("rank")
    # same matched docs set at top (OOV can't add or remove matches),
    # and ranking ORDER is preserved (a uniform positive rescale)
    assert list(r1["doc_id"]) == list(r2["doc_id"])
    stats = CorpusStats.load(idx)
    n = float(stats.n_docs)
    idf = {
        t: 1.0 + np.log(n / (float(stats.df.get(t, 0)) + 1.0))
        for t in ("the", "data", "zzqq9999xx")
    }
    qn1 = 1.0 / float(
        np.sqrt(np.sum(np.array([idf[t] ** 2 for t in ("data", "the")])))
    )
    qn2 = 1.0 / float(
        np.sqrt(
            np.sum(
                np.array(
                    [idf[t] ** 2 for t in ("data", "the", "zzqq9999xx")]
                )
            )
        )
    )
    # factor = (coord ratio) * (queryNorm ratio) = (2/3)/(2/2) * qn2/qn1
    factor = (2.0 / 3.0) * qn2 / qn1
    assert np.allclose(
        r2["score"].to_numpy(), r1["score"].to_numpy() * factor,
        rtol=1e-12, atol=0,
    )
    assert factor < 1.0


def test_classic_diverges_from_bm25(tiny_index):
    """Non-vacuity: the similarity is genuinely different — some
    multi-term query ranks differently than BM25 on the same index."""
    from mini_ivf_ray.pipelines.query import search

    idx, cfg, docs = tiny_index
    diverged = False
    for qid, text in enumerate(
        ["the data web", "a of data", "w00042 the data"]
    ):
        qds = ray.data.from_items([{"query_id": qid, "text": text}])
        c = _run(idx, cfg, [(qid, text)]).sort_values("rank")
        b = search(idx, qds, cfg).to_pandas().sort_values("rank")
        if list(c["doc_id"]) != list(b["doc_id"]):
            diverged = True
            break
    assert diverged


def test_classic_oov_and_empty(tiny_index):
    idx, cfg, _docs = tiny_index
    assert len(_run(idx, cfg, [(0, "zzqq9999xx")])) == 0
    assert len(_run(idx, cfg, [(0, "")])) == 0

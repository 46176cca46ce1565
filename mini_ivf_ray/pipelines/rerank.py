"""Maximal-marginal-relevance (MMR) diversity rerank.

Carbonell & Goldstein 1998: greedily pick the candidate maximizing
    lam * rel_norm(d) - (1 - lam) * max_{s in selected} cos(d, s)
so near-duplicate results stop crowding the top-k — the standard
diversity pass between retrieval and presentation.

Deterministic by construction (min-max relevance normalization per
query, ties broken doc_id asc), so output rows are stable; the greedy
argmax is iterative and data-dependent — not SQL-expressible — so the
driver query is rows-only and exactness is pinned by property tests
(tests/test_rerank.py).

Scale shape: candidates are k-sized per query, so the rerank itself
is trivially a per-query map; the only data movement is the candidate
embedding fetch — ONE broadcast-id semi-join over the embeddings
table (same pattern as similarity.refine_ann's stage 2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def mmr_select(
    doc_ids: np.ndarray,
    scores: np.ndarray,
    vectors: np.ndarray,
    k: int = 10,
    lam: float = 0.7,
) -> list[int]:
    """Greedy MMR over one query's candidates.  ``vectors`` must be
    L2-normalized rows aligned with ``doc_ids``.  Returns selected
    doc_ids in pick order."""
    n = len(doc_ids)
    if n == 0:
        return []
    lo, hi = float(scores.min()), float(scores.max())
    rel = (scores - lo) / (hi - lo) if hi > lo else np.ones(n)
    sims = vectors @ vectors.T
    selected: list[int] = []
    chosen = np.zeros(n, dtype=bool)
    max_sim = np.full(n, -np.inf)
    for _ in range(min(k, n)):
        if selected:
            mmr = lam * rel - (1.0 - lam) * max_sim
        else:
            mmr = rel.copy()
        mmr[chosen] = -np.inf
        # ties: doc_id asc (stable, engine-independent)
        best = min(
            ((-mmr[i], int(doc_ids[i]), i) for i in range(n) if not chosen[i])
        )[2]
        chosen[best] = True
        selected.append(int(doc_ids[best]))
        max_sim = np.maximum(max_sim, sims[:, best])
    return selected


def fetch_vectors(embeddings_ds, ids) -> tuple[np.ndarray, np.ndarray]:
    """(sorted ids, L2-normalized (n, d) matrix) for the given id set —
    one broadcast-id semi-join over the embeddings table."""
    import pyarrow as pa
    import ray

    from mini_ivf_ray.functions.matview import list_to_matrix

    want = np.unique(np.asarray(list(ids), dtype=np.int64))
    want_ref = ray.put(want)

    def probe(batch: pa.Table) -> pa.Table:
        import ray as _ray

        w = _ray.get(want_ref)
        vid = batch["vec_id"].to_numpy().astype(np.int64)
        pos = np.minimum(np.searchsorted(w, vid), max(0, w.size - 1))
        keep = w[pos] == vid if w.size else np.zeros(len(vid), bool)
        return batch.filter(pa.array(keep))

    got = embeddings_ds.map_batches(probe, batch_format="pyarrow").to_pandas()
    if not len(got):
        return np.empty(0, dtype=np.int64), np.empty((0, 0))
    import pyarrow as pa

    t = pa.Table.from_pandas(got, preserve_index=False)
    ids_arr = t["vec_id"].to_numpy().astype(np.int64)
    V = list_to_matrix(t["embedding"], np.float64)
    order = np.argsort(ids_arr, kind="stable")
    ids_arr, V = ids_arr[order], V[order]
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids_arr, V / norms


def mmr_rerank_results(
    results: pd.DataFrame,
    embeddings_ds,
    k: int = 10,
    lam: float = 0.7,
) -> pd.DataFrame:
    """Rerank (query_id, doc_id, score) retrieval results per query
    with MMR; doc embeddings fetched once.  Output: (query_id, rank,
    doc_id)."""
    vid, V = fetch_vectors(embeddings_ds, results["doc_id"].unique())
    empty = pd.DataFrame(
        {
            "query_id": pd.Series(dtype=np.int64),
            "rank": pd.Series(dtype=np.int64),
            "doc_id": pd.Series(dtype=np.int64),
        }
    )
    if vid.size == 0:
        # no candidate has an embedding: vid[...] below would index an
        # empty array (numpy evaluates both operands of & eagerly)
        return empty
    out = {"query_id": [], "rank": [], "doc_id": []}
    for qid, g in results.groupby("query_id", sort=True):
        ids = g["doc_id"].to_numpy().astype(np.int64)
        pos = np.searchsorted(vid, ids)
        ok = (pos < vid.size) & (vid[np.minimum(pos, vid.size - 1)] == ids)
        ids, sc = ids[ok], g["score"].to_numpy()[ok]
        sel = mmr_select(ids, sc, V[pos[ok]], k=k, lam=lam)
        out["query_id"].extend([int(qid)] * len(sel))
        out["rank"].extend(range(len(sel)))
        out["doc_id"].extend(sel)
    df = pd.DataFrame(out)
    if len(df):
        df = df.astype(
            {"query_id": np.int64, "rank": np.int64, "doc_id": np.int64}
        )
    return df

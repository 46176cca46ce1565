"""Late-interaction multi-vector retrieval (ColBERT's MaxSim —
Khattab & Zaharia 2020; the scoring model behind ES 8.16's
``rank_vectors`` field):

    score(q, d) = sum over query tokens i of
                  max over doc tokens j of  dot(q_i, d_j)

Documents and queries are BAGS of token vectors; the max picks, per
query token, its best-matching document token — the "late" in late
interaction: token-level similarity is computed at query time instead
of being pooled away at encoding time.

Multi-vector synthesis: the testdata embeddings table is one vector
per row, so a "document" here is ``group_size`` consecutive rows
(token vector j of doc D is row D * group_size + j) — deterministic
and SQL-replayable (``vec_id // group_size``); at real scale the
grouping key is a real column and this is a projection (the
has_child relation argument).

Distributed shape (nothing doc-proportional on the driver):

  1. query token matrix fetched once (Q x group_size rows) and
     broadcast via ``ray.put``;
  2. ONE streamed matmul pass over the embeddings: per batch,
     (rows x dim) @ (dim x Q*g) dots, then a per-batch PARTIAL max per
     (doc, query-token) — batches may split a doc, so partials are
     max-mergeable rows (the mergeable-moments argument, max-shaped);
  3. ``groupby(doc, qtok).max`` — the exchange is
     (docs x Q x g) slim rows;
  4. ``groupby(doc, qdoc)`` map_groups sums each query's g maxes in
     FIXED qtok order (sum order pinned — 5 float64 adds);
  5. per-block partial top-k per query + driver merge of
     (blocks x Q x k) candidate rows (the has_parent pattern).

Exactness: dots are float64 (cast up from the stored float32 before
any arithmetic); max is order-independent; the only sums are g-term
fixed-order adds, matched by the oracle under round-4 (the ann-family
convention).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def late_interaction_topk(
    emb_ds,
    query_docs: list[int],
    group_size: int = 5,
    topk: int = 10,
) -> pd.DataFrame:
    """(query_doc, rank, doc, score) — top-k multi-vector documents
    per query document under MaxSim; includes the query doc itself
    (its self-score is the per-token-norm sum, a sanity invariant the
    tests pin)."""
    import ray

    if group_size < 1:
        raise ValueError(f"group_size must be >= 1, got {group_size}")
    if topk < 1:
        raise ValueError(f"topk must be >= 1, got {topk}")
    qset = sorted(set(int(q) for q in query_docs))
    if not qset:
        raise ValueError("query_docs is empty")

    # 1. slim query-side fetch: Q x group_size rows
    lo = min(qset) * group_size
    hi = (max(qset) + 1) * group_size
    qrows = (
        emb_ds.filter(expr=f"vec_id >= {lo} and vec_id < {hi}")
        .to_pandas()
    )
    if not len(qrows):
        raise ValueError("no embedding rows found for query_docs")
    qrows["qd"] = qrows["vec_id"] // group_size
    qrows = qrows[qrows["qd"].isin(qset)].sort_values("vec_id")
    if not len(qrows):
        raise ValueError("no embedding rows found for query_docs")
    qmat = np.stack(
        [np.asarray(v, dtype=np.float64) for v in qrows["embedding"]]
    )
    qdoc_of = qrows["qd"].to_numpy().astype(np.int64)
    qtok_ids = qrows["vec_id"].to_numpy().astype(np.int64)
    q_ref = ray.put(qmat)

    def dots_partial(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        emb = batch["embedding"]
        la = emb.combine_chunks() if hasattr(emb, "combine_chunks") else emb
        dim = qm.shape[1]
        if hasattr(la, "values"):  # plain ListArray (parquet path)
            mat = (
                la.values.to_numpy(zero_copy_only=False)
                .astype(np.float64)
                .reshape(ids.size, dim)
            )
        else:  # Ray's ArrowTensorArray (from_pandas path)
            raw = la.to_numpy(zero_copy_only=False)
            mat = (
                np.stack(raw).astype(np.float64)
                if raw.dtype == object
                else np.asarray(raw, dtype=np.float64).reshape(
                    ids.size, dim
                )
            )
        dp = mat @ qm.T  # (rows x Q*g) float64
        did = ids // group_size
        codes, inv = np.unique(did, return_inverse=True)
        mx = np.full((codes.size, qm.shape[0]), -np.inf)
        np.maximum.at(mx, inv, dp)
        n_q = qm.shape[0]
        return pa.table(
            {
                "did": pa.array(
                    np.repeat(codes, n_q), type=pa.int64()
                ),
                "qtok": pa.array(
                    np.tile(np.arange(n_q, dtype=np.int64), codes.size),
                    type=pa.int64(),
                ),
                "m": pa.array(mx.ravel(), type=pa.float64()),
            }
        )

    partials = emb_ds.select_columns(["vec_id", "embedding"]).map_batches(
        dots_partial, batch_format="pyarrow", batch_size=4096
    )
    merged = partials.groupby(["did", "qtok"]).max("m")

    qdoc_ref = ray.put(qdoc_of)

    def sum_per_query(df: pd.DataFrame) -> pd.DataFrame:
        qd = ray.get(qdoc_ref)
        df = df.sort_values("qtok")  # FIXED sum order
        out = {"did": [], "qd": [], "score": []}
        for did, g in df.groupby("did", sort=False):
            m = g["max(m)"].to_numpy()
            qt = g["qtok"].to_numpy().astype(np.int64)
            for q in np.unique(qd):
                sel = qd[qt] == q
                if sel.any():
                    out["did"].append(int(did))
                    out["qd"].append(int(q))
                    out["score"].append(float(np.sum(m[sel])))
        return pd.DataFrame(out)

    scores = merged.groupby("did").map_groups(
        sum_per_query, batch_format="pandas"
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["qd", "score", "did"], ascending=[True, False, True],
            kind="mergesort",
        )
        return df.groupby("qd", sort=False).head(topk)

    cand = scores.map_batches(block_topk, batch_format="pandas").to_pandas()
    if not len(cand):
        return pd.DataFrame(
            {
                "query_doc": pd.Series([], dtype=np.int64),
                "rank": pd.Series([], dtype=np.int64),
                "doc": pd.Series([], dtype=np.int64),
                "score": pd.Series([], dtype=np.float64),
            }
        )
    cand = cand.sort_values(
        ["qd", "score", "did"], ascending=[True, False, True],
        kind="mergesort",
    )
    cand = cand.groupby("qd", sort=False).head(topk).reset_index(drop=True)
    cand["rank"] = cand.groupby("qd", sort=False).cumcount()
    out = cand.rename(columns={"qd": "query_doc", "did": "doc"})
    return out[["query_doc", "rank", "doc", "score"]]


def maxsim_local(
    emb: np.ndarray, ids: np.ndarray, query_docs, group_size: int
) -> dict:
    """Brute-force reference: {(qdoc, doc): score} over ALL pairs."""
    emb = np.asarray(emb, dtype=np.float64)
    did = np.asarray(ids, dtype=np.int64) // group_size
    docs = {}
    for d in np.unique(did):
        docs[int(d)] = emb[did == d]
    out = {}
    for q in query_docs:
        qm = docs[int(q)]
        for d, dm in docs.items():
            dp = qm @ dm.T
            out[(int(q), int(d))] = float(dp.max(axis=1).sum())
    return out

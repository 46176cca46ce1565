"""Exact duplicated-span detection and removal (cross-document).

Training-data staple (task brief; public method: Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499 — substring-level exact dedup, here at w-token gram
granularity instead of a distributed suffix array):

* ``duplicate_gram_positions`` — every occurrence of a w-token gram
  that appears >= 2 times in the corpus, EXCEPT the globally first
  occurrence (ordered by ``(doc_id, pos)``) per gram: the keep-first
  rule.
* ``dup_spans``            — per-doc merged spans (gaps-and-islands)
  covering those duplicate grams.
* ``remove_duplicate_spans`` — cleaned corpus: tokens covered by any
  duplicate gram removed, text re-joined with single spaces.

Scale shape: stage 1 emits one SLIM row (bucket i64, gram-hash u64,
doc_id i64, pos i64) per gram position — O(total tokens) rows of 32 B,
the unavoidable exchange for substring dedup (the suffix-array
formulation moves the same volume).  Everything downstream is
fixed-width bucket groupbys (pitfall: never O(distinct-grams) keys);
per-bucket work is pandas/numpy vectorized.  Gram identity uses a
64-bit polynomial over per-token md5s — cross-batch/node stable, and a
collision (~n^2/2^64) would surface as a driver hash-gate failure, the
same contract as the siphash bucketed joins (`relational.py`).

The text rewrite co-locates each doc's text row with its duplicate
positions via ONE bucketed exchange of the corpus (union + groupby) —
there is no cheaper rewrite: every surviving byte must be rewritten
anyway.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.functions.hashing import md5_u64
from mini_ivf_ray.functions.tokenize import tokenize_batch

_BASE = np.uint64(1099511628211)  # FNV-1a prime as polynomial base
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates sequential ids for bucketing."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def _group_buckets() -> int:
    import ray

    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(64, 8 * n_cpus)


def _gram_rows(batch: pa.Table, w: int, num_buckets: int) -> pa.Table:
    """One slim row per w-gram position: (gkey, gh, doc_id, pos).

    Vectorized: batch-wide factorize -> md5 per DISTINCT token -> one
    rolling-polynomial pass (w vector ops) over the flat token-hash
    array with per-doc boundaries respected via explicit start indices.
    """
    texts = batch["text"].to_pylist()
    doc_ids = batch["doc_id"].to_numpy().astype(np.int64, copy=False)
    toks, dls = tokenize_batch(texts)
    empty = pa.table(
        {
            "gkey": pa.array([], type=pa.int64()),
            "gh": pa.array([], type=pa.uint64()),
            "doc_id": pa.array([], type=pa.int64()),
            "pos": pa.array([], type=pa.int64()),
        }
    )
    ng = np.maximum(dls - w + 1, 0)
    total = int(ng.sum())
    if total == 0:
        return empty
    flat = np.asarray(
        [t for lst in toks for t in lst], dtype=object
    )
    codes, uniq = pd.factorize(flat)
    uh = np.fromiter((md5_u64(t) for t in uniq), dtype=np.uint64, count=len(uniq))
    th = uh[codes]
    doc_idx = np.repeat(np.arange(len(toks)), ng)
    pos = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(ng) - ng, ng)
    offsets = np.cumsum(dls) - dls
    starts = offsets[doc_idx] + pos
    h = np.zeros(total, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(w):
            h = h * _BASE + th[starts + j]
    gkey = (h % np.uint64(num_buckets)).astype(np.int64)
    return pa.table(
        {
            "gkey": pa.array(gkey, type=pa.int64()),
            "gh": pa.array(h, type=pa.uint64()),
            "doc_id": pa.array(doc_ids[doc_idx], type=pa.int64()),
            "pos": pa.array(pos, type=pa.int64()),
        }
    )


def _bucket_dups(df: pd.DataFrame) -> pd.DataFrame:
    """Within a gram-hash bucket: all occurrences except the global
    first (by (doc_id, pos)) of each gram that occurs >= 2 times."""
    if not len(df):
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype=np.int64), "pos": pd.Series(dtype=np.int64)}
        )
    df = df.sort_values(["gh", "doc_id", "pos"], kind="mergesort")
    m = df.duplicated("gh", keep="first").to_numpy()
    out = df.loc[m, ["doc_id", "pos"]]
    return out.astype({"doc_id": np.int64, "pos": np.int64})


def duplicate_gram_positions(docs_ds, w: int = 8):
    """Dataset of (doc_id, pos): duplicate w-gram occurrences under the
    keep-first rule.  SQL-equivalent: row_number() OVER (PARTITION BY
    gram ORDER BY doc_id, pos) > 1."""
    rows = docs_ds.map_batches(
        _gram_rows,
        fn_kwargs={"w": w, "num_buckets": _group_buckets()},
        batch_format="pyarrow",
    )
    return rows.groupby("gkey").map_groups(_bucket_dups, batch_format="pandas")


def _doc_spans(df: pd.DataFrame, w: int) -> pd.DataFrame:
    """Gaps-and-islands merge of same-length intervals [pos, pos+w):
    island break when the next pos is > previous pos + w (overlap OR
    adjacency merges — matches the SQL lag() oracle rule)."""
    cols = {
        "doc_id": pd.Series(dtype=np.int64),
        "span_start": pd.Series(dtype=np.int64),
        "span_end": pd.Series(dtype=np.int64),
        "n_grams": pd.Series(dtype=np.int64),
    }
    if not len(df):
        return pd.DataFrame(cols)
    df = df.sort_values(["doc_id", "pos"], kind="mergesort")
    doc = df["doc_id"].to_numpy()
    pos = df["pos"].to_numpy()
    brk = np.ones(len(df), dtype=bool)
    if len(df) > 1:
        same_doc = doc[1:] == doc[:-1]
        near = (pos[1:] - pos[:-1]) <= w
        brk[1:] = ~(same_doc & near)
    bounds = np.flatnonzero(brk)
    ends = np.r_[bounds[1:], len(df)]
    return pd.DataFrame(
        {
            "doc_id": doc[bounds],
            "span_start": pos[bounds],
            "span_end": pos[ends - 1] + w,
            "n_grams": ends - bounds,
        }
    ).astype({c: np.int64 for c in cols})


def dup_spans(docs_ds, w: int = 8):
    """(doc_id, span_start, span_end, n_grams): merged duplicate spans
    per document.  ``span_end`` is exclusive (token positions
    [span_start, span_end) are covered)."""
    pos_ds = duplicate_gram_positions(docs_ds, w)
    nb = _group_buckets()

    def add_key(batch: pa.Table) -> pa.Table:
        k = (_mix64(batch["doc_id"].to_numpy().astype(np.uint64)) % np.uint64(nb)).astype(
            np.int64
        )
        return batch.append_column("dkey", pa.array(k, type=pa.int64()))

    keyed = pos_ds.map_batches(add_key, batch_format="pyarrow")
    return (
        keyed.groupby("dkey")
        .map_groups(_doc_spans, fn_kwargs={"w": w}, batch_format="pandas")
    )


def _rebuild_texts(df: pd.DataFrame, w: int) -> pd.DataFrame:
    """Per doc: drop tokens covered by any duplicate gram, re-join with
    single spaces.  Text rows carry pos == -1; dup rows carry the gram
    start position."""
    if not len(df):
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype=np.int64), "text_clean": pd.Series(dtype=object)}
        )
    from mini_ivf_ray.functions.tokenize import tokenize

    out_ids: list[int] = []
    out_texts: list[str] = []
    for doc_id, g in df.groupby("doc_id", sort=True):
        text_rows = g[g["pos"] < 0]
        if not len(text_rows):
            continue  # unreachable: same doc_id -> same bucket
        toks = tokenize(text_rows["text"].iloc[0])
        ps = g.loc[g["pos"] >= 0, "pos"].to_numpy()
        cover = np.zeros(len(toks), dtype=bool)
        if ps.size:
            idx = (ps[:, None] + np.arange(w)[None, :]).ravel()
            cover[idx[idx < len(toks)]] = True
        out_ids.append(int(doc_id))
        out_texts.append(" ".join(t for t, c in zip(toks, cover) if not c))
    return pd.DataFrame(
        {"doc_id": np.asarray(out_ids, dtype=np.int64), "text_clean": out_texts}
    )


def remove_duplicate_spans(docs_ds, w: int = 8):
    """Cleaned corpus (doc_id, text_clean) for ALL documents — docs
    without duplicate spans come back token-normalized (joined by
    single spaces), matching the SQL oracle's LEFT JOIN rule."""
    import ray.data  # noqa: F401  (docs_ds already is one)

    pos_ds = duplicate_gram_positions(docs_ds, w)
    nb = _group_buckets()

    def doc_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64, copy=False)
        k = (_mix64(ids.astype(np.uint64)) % np.uint64(nb)).astype(np.int64)
        return pa.table(
            {
                "dkey": pa.array(k, type=pa.int64()),
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": batch["text"].cast(pa.string()),
                "pos": pa.array(np.full(len(ids), -1, dtype=np.int64), type=pa.int64()),
            }
        )

    def dup_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64, copy=False)
        k = (_mix64(ids.astype(np.uint64)) % np.uint64(nb)).astype(np.int64)
        return pa.table(
            {
                "dkey": pa.array(k, type=pa.int64()),
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array([None] * len(ids), type=pa.string()),
                "pos": batch["pos"].cast(pa.int64()),
            }
        )

    unioned = docs_ds.map_batches(doc_rows, batch_format="pyarrow").union(
        pos_ds.map_batches(dup_rows, batch_format="pyarrow")
    )
    return unioned.groupby("dkey").map_groups(
        _rebuild_texts, fn_kwargs={"w": w}, batch_format="pandas"
    )


def winnow_fingerprints(docs_ds, k: int = 4, w: int = 5):
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    MOSS local document fingerprinting algorithm): k-token-gram hashes,
    sliding windows of ``w`` consecutive gram hashes, select each
    window's minimum (RIGHTMOST occurrence on ties — the paper's rule
    that makes selections self-consistent across overlapping windows),
    emit the distinct selected (position, fingerprint) set per doc.

    Guarantee (the point of winnowing over plain 0 mod p sampling):
    any shared substring of length >= w + k - 1 tokens yields at least
    one shared fingerprint, and selection density is bounded (~2/(w+1))
    — local, position-robust evidence for plagiarism/overlap detection.

    Stateless per-batch map, zero shuffle.  Hashes are the 60-bit md5
    prefix of the gram STRING — the exact ('0x' || substr(md5(g),1,15))
    form the DuckDB oracle replays bit-for-bit.  A doc with fewer than
    ``w`` grams winnows its whole gram list as one window; docs shorter
    than ``k`` tokens emit nothing.

    Output: (doc_id, pos, fp) with pos the 0-based gram position."""
    import hashlib

    import pyarrow as pa

    from mini_ivf_ray.functions.tokenize import tokenize

    def fps(batch: pa.Table) -> pa.Table:
        md5 = hashlib.md5
        out_d, out_p, out_f = [], [], []
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        for did, text in zip(ids, batch["text"].to_pylist()):
            toks = tokenize(text)
            n = len(toks) - k + 1
            if n <= 0:
                continue
            h = np.fromiter(
                (
                    int.from_bytes(
                        md5(" ".join(toks[i : i + k]).encode()).digest()[:8],
                        "big",
                    ) >> 4
                    for i in range(n)
                ),
                dtype=np.int64,
                count=n,
            )
            sel: set[tuple[int, int]] = set()
            n_win = max(1, n - w + 1)
            for i in range(n_win):
                win = h[i : i + w]
                m = win.min()
                # rightmost occurrence of the minimum
                pos = i + (len(win) - 1 - int(np.argmin(win[::-1])))
                sel.add((pos, int(m)))
            for pos, fp in sorted(sel):
                out_d.append(int(did))
                out_p.append(pos)
                out_f.append(fp)
        return pa.table(
            {
                "doc_id": pa.array(out_d, type=pa.int64()),
                "pos": pa.array(out_p, type=pa.int64()),
                "fp": pa.array(out_f, type=pa.int64()),
            }
        )

    return docs_ds.map_batches(fps, batch_format="pyarrow")

"""Deduplication operators — exact and near-duplicate.

Large-scale training-data staples (task brief; SURVEY §2.7 notes the
reference has only partition-set difference, no record dedup — these are
first-class additions):

* exact_dedup        — content-hash groupby, keep min doc_id
* minhash signatures — k-perm MinHash over w-token shingles
* lsh_candidate_pairs— banded LSH buckets -> verified candidate pairs
* simhash            — 64-bit tf-weighted SimHash + hamming buckets
* ngram_jaccard      — exact shingle-set Jaccard for candidate pairs
* embedding_dup_pairs— cosine >= tau over an embedding column

Shuffle discipline: signatures are computed batch-vectorized;
the only all-to-all moves are the (band_id, band_hash) / hamming-chunk
groupbys over SMALL signature rows (never text), and pair outputs are
deduped with a second tiny groupby.  The embedding variant broadcasts
the (normalized) matrix via ``ray.put`` — valid while one node holds
it; the scale path is the SRP/LSH bucketing, same pattern as MinHash.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.functions.tokenize import tokenize

_MERSENNE = (1 << 61) - 1


def _text_hash_batch(batch: pa.Table) -> pa.Table:
    h = [
        hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()
    ]
    return pa.table({"h": pa.array(h, type=pa.string()), "doc_id": batch["doc_id"]})


def exact_dedup(docs_ds):
    """(h, doc_id, n_dups): one row per distinct text, keeping the
    smallest doc_id.  DuckDB oracle: GROUP BY md5(text)."""
    from ray.data.aggregate import Count, Min

    return (
        docs_ds.map_batches(_text_hash_batch, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


_TOKEN_H: dict[str, int] = {}  # per-process stable md5 token hashes


def _token_hashes(tokens: list[str]) -> np.ndarray:
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = _TOKEN_H.get(t)
        if h is None:
            h = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16)
            if len(_TOKEN_H) < 2_000_000:
                _TOKEN_H[t] = h
        out[i] = h
    return out


def _shingle_hashes(tokens: list[str], w: int) -> np.ndarray:
    """uint64 hashes of w-token shingles: md5 per DISTINCT token
    (cached), folded position-wise with splitmix64 — order-sensitive,
    deterministic, and vectorized over all shingles of a doc."""
    th = _token_hashes(tokens)
    if th.size == 0:
        return th
    with np.errstate(over="ignore"):
        if th.size < w:
            acc = _mix64(th[:1])
            for j in range(1, th.size):
                acc = _mix64(acc ^ th[j : j + 1])
            return acc
        n = th.size - w + 1
        acc = _mix64(th[:n])  # mix first so position order matters
        for j in range(1, w):
            acc = _mix64(acc ^ th[j : j + n])
    return acc


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized uint64 (wrapping arithmetic)."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


class MinHasher:
    """Stateful per-actor signature computer.  The k 'permutations' are
    splitmix64 mixes of (shingle ^ seed_i) — a standard, fully
    vectorizable stand-in for (a*x+b) mod p minhashing: E[sig_a == sig_b]
    ~= Jaccard(A, B)."""

    def __init__(self, k: int = 64, w: int = 3, seed: int = 1234):
        self.k, self.w = k, w
        rng = np.random.default_rng(seed)
        self.keys = rng.integers(0, 2**63, size=k, dtype=np.int64).astype(np.uint64)

    def signature(self, tokens: list[str]) -> np.ndarray:
        sh = _shingle_hashes(tokens, self.w)
        if sh.size == 0:
            return np.full(self.k, np.uint64(2**64 - 1), dtype=np.uint64)
        # (k, n) mix then min over shingles — two vectorized ops
        with np.errstate(over="ignore"):
            mixed = _mix64(sh[None, :] ^ self.keys[:, None])
        return mixed.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [
            self.signature(tokenize(t)) for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.array([s.tolist() for s in sigs], type=pa.list_(pa.uint64())),
            }
        )


def minhash_signatures(docs_ds, k: int = 64, w: int = 3, concurrency=(1, 4)):
    return docs_ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"k": k, "w": w},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
        num_cpus=1,
    )


_GROUP_BUCKETS = 64  # low-cardinality shuffle key (O(N)-groups antipattern guard)


def _band_rows(batch: pa.Table, bands: int, rows: int) -> pa.Table:
    """Explode signatures to one row per band with a vectorized band
    hash; shuffle key is gkey = band_hash % B, NOT the raw bucket id."""
    doc_ids = batch["doc_id"].to_numpy()
    sig_list = batch["sig"].to_pylist()
    sigs = np.array([np.asarray(s, dtype=np.uint64) for s in sig_list])  # (n, k)
    n = len(doc_ids)
    out = []
    with np.errstate(over="ignore"):
        for bi in range(bands):
            chunk = sigs[:, bi * rows : (bi + 1) * rows]
            bh = _mix64(
                chunk[:, 0] ^ np.uint64((bi * 0x9E3779B97F4A7C15) & (2**64 - 1))
            )
            for j in range(1, rows):
                bh = _mix64(bh ^ chunk[:, j])
            out.append((np.full(n, bi, dtype=np.int32), bh))
    band = np.concatenate([b for b, _ in out])
    bhash = np.concatenate([h for _, h in out])
    return pa.table(
        {
            "band": pa.array(band),
            "bhash": pa.array(bhash, type=pa.uint64()),
            "gkey": pa.array((bhash % np.uint64(_GROUP_BUCKETS)).astype(np.int64)),
            "doc_id": pa.array(np.tile(doc_ids, bands), type=pa.int64()),
            "sig": pa.array(
                [s for _ in range(bands) for s in sig_list],
                type=pa.list_(pa.uint64()),
            ),
        }
    )


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """One gkey group = many (band, bhash) buckets; emit candidate pairs
    per real bucket, locally deduped."""
    out_a, out_b, out_j = [], [], []
    for _, g in group.groupby(["band", "bhash"], sort=False):
        if len(g) < 2:
            continue
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sigs = np.array([np.asarray(s, dtype=np.uint64) for s in g["sig"]])
        for i in range(len(ids)):
            eq = (sigs[i] == sigs[i + 1 :]).mean(axis=1)
            for off, est in enumerate(eq):
                j = i + 1 + off
                if ids[i] != ids[j]:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    out_j.append(float(est))
    df = pd.DataFrame({"id_a": out_a, "id_b": out_b, "est_jaccard": out_j})
    return df.drop_duplicates(["id_a", "id_b"])


def _dedupe_pairs(group: pd.DataFrame) -> pd.DataFrame:
    return group.drop_duplicates(["id_a", "id_b"]).drop(columns=["pkey"])


def _with_pair_bucket(batch: pa.Table) -> pa.Table:
    a = batch["id_a"].to_numpy().astype(np.uint64)
    b = batch["id_b"].to_numpy().astype(np.uint64)
    with np.errstate(over="ignore"):
        pk = (_mix64(a * np.uint64(0x9E3779B97F4A7C15) ^ b) % np.uint64(_GROUP_BUCKETS))
    return batch.append_column("pkey", pa.array(pk.astype(np.int64)))


def lsh_candidate_pairs(
    docs_ds, k: int = 64, w: int = 3, bands: int = 16, threshold: float = 0.5
):
    """MinHash-LSH near-dup pairs: (id_a, id_b, est_jaccard >= threshold),
    id_a < id_b, deduped across bands.  Both shuffles are keyed by
    fixed-width hash buckets (never by the raw bucket / pair identity,
    whose cardinality is O(N))."""
    rows = k // bands
    sigs = minhash_signatures(docs_ds, k=k, w=w)
    banded = sigs.map_batches(
        _band_rows,
        fn_kwargs={"bands": bands, "rows": rows},
        batch_format="pyarrow",
        batch_size=2048,
    )
    pairs = banded.groupby("gkey").map_groups(_bucket_pairs, batch_format="pandas")
    pairs = pairs.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["est_jaccard"], threshold)),
        batch_format="pyarrow",
    )
    uniq = pairs.map_batches(_with_pair_bucket, batch_format="pyarrow").groupby(
        "pkey"
    ).map_groups(_dedupe_pairs, batch_format="pandas")
    return uniq


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


_SIMHASH_BITS: dict[str, np.ndarray] = {}  # per-process term -> ±1 bit vector


def _term_bits(t: str) -> np.ndarray:
    bits = _SIMHASH_BITS.get(t)
    if bits is None:
        h = np.uint64(int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16))
        bits = (2 * ((h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)) - 1
        if len(_SIMHASH_BITS) < 1_000_000:
            _SIMHASH_BITS[t] = bits
    return bits


def simhash64(tokens: list[str]) -> int:
    """tf-weighted 64-bit SimHash over md5 term hashes (deterministic)."""
    from collections import Counter

    v = np.zeros(64, dtype=np.int64)
    for t, tf in Counter(tokens).items():
        v += tf * _term_bits(t)
    out = 0
    for i in range(64):
        if v[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(batch: pa.Table) -> pa.Table:
    hs = [simhash64(tokenize(t)) for t in batch["text"].to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array(np.array(hs, dtype=np.uint64), type=pa.uint64()),
        }
    )


def simhash_signatures(docs_ds):
    return docs_ds.map_batches(simhash_batch, batch_format="pyarrow", batch_size=1024)


def _sim_chunk_rows(batch: pa.Table, chunks: int = 4) -> pa.Table:
    ids = batch["doc_id"].to_numpy()
    sh = batch["simhash"].to_numpy().astype(np.uint64)
    width = 64 // chunks
    mask = np.uint64((1 << width) - 1)
    out_c, out_v = [], []
    for c in range(chunks):
        out_c.append(np.full(len(ids), c, dtype=np.int32))
        out_v.append((sh >> np.uint64(c * width)) & mask)
    vals = np.concatenate(out_v)
    chunk = np.concatenate(out_c)
    with np.errstate(over="ignore"):
        gkey = _mix64(vals ^ chunk.astype(np.uint64)) % np.uint64(_GROUP_BUCKETS)
    return pa.table(
        {
            "chunk": pa.array(chunk),
            "val": pa.array(vals, type=pa.uint64()),
            "gkey": pa.array(gkey.astype(np.int64)),
            "doc_id": pa.array(np.tile(ids, chunks), type=pa.int64()),
            "simhash": pa.array(np.tile(sh, chunks), type=pa.uint64()),
        }
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def _sim_bucket_pairs(group: pd.DataFrame, max_hamming: int) -> pd.DataFrame:
    out_a, out_b, out_h = [], [], []
    for _, g in group.groupby(["chunk", "val"], sort=False):
        if len(g) < 2:
            continue
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        for i in range(len(ids)):
            ham = _popcount64(sh[i] ^ sh[i + 1 :])
            for off in np.flatnonzero(ham <= max_hamming):
                j = i + 1 + off
                if ids[i] != ids[j]:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    out_h.append(int(ham[off]))
    df = pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_h})
    return df.drop_duplicates(["id_a", "id_b"])


def simhash_dup_pairs(docs_ds, max_hamming: int = 3, chunks: int = 4):
    """Pigeonhole: hamming<=chunks-1 pairs share at least one exact
    16-bit chunk -> bucket by (chunk, value) hashed into fixed-width
    group keys, verify hamming in-bucket (vectorized popcount)."""
    sigs = simhash_signatures(docs_ds)
    rows = sigs.map_batches(
        _sim_chunk_rows, fn_kwargs={"chunks": chunks}, batch_format="pyarrow"
    )
    pairs = rows.groupby("gkey").map_groups(
        _sim_bucket_pairs, fn_kwargs={"max_hamming": max_hamming}, batch_format="pandas"
    )
    uniq = pairs.map_batches(_with_pair_bucket, batch_format="pyarrow").groupby(
        "pkey"
    ).map_groups(_dedupe_pairs, batch_format="pandas")
    return uniq


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (verifier for candidate pairs)
# ---------------------------------------------------------------------------


def ngram_jaccard(texts_a: list[str], texts_b: list[str], w: int = 3) -> np.ndarray:
    out = np.empty(len(texts_a), dtype=np.float64)
    for i, (ta, tb) in enumerate(zip(texts_a, texts_b)):
        sa = set(map(tuple, _ngrams(tokenize(ta), w)))
        sb = set(map(tuple, _ngrams(tokenize(tb), w)))
        u = len(sa | sb)
        out[i] = (len(sa & sb) / u) if u else 1.0
    return out


def _ngrams(tokens: list[str], w: int):
    if len(tokens) < w:
        return [tuple(tokens)] if tokens else []
    return [tuple(tokens[i : i + w]) for i in range(len(tokens) - w + 1)]


def verify_pairs_exact(docs_ds, pairs_df: pd.DataFrame, w: int = 3, threshold: float = 0.6):
    """Join candidate pairs back to texts (broadcast the small pair set;
    texts fetched via a filtered read) and compute exact Jaccard."""
    import ray

    wanted = set(pairs_df["id_a"]) | set(pairs_df["id_b"])
    texts = {}
    for b in docs_ds.map_batches(
        lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for did, tx in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            if did in wanted:
                texts[did] = tx
    ta = [texts[i] for i in pairs_df["id_a"]]
    tb = [texts[i] for i in pairs_df["id_b"]]
    jac = ngram_jaccard(ta, tb, w)
    out = pairs_df.copy()
    out["jaccard"] = np.round(jac, 6)
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


# ---------------------------------------------------------------------------
# Embedding near-dup — SRP-LSH scale path
# ---------------------------------------------------------------------------


class SRPHasher:
    """Signed-random-projection signatures: bit i = sign(<x, r_i>).
    P(bit match) = 1 - angle/pi, so banding buckets near-duplicates.
    This is the scale path for embedding near-dup: shuffle volume is
    O(n x bands) small signature rows, never the vectors themselves."""

    def __init__(self, dim: int, n_bits: int = 64, seed: int = 99):
        rng = np.random.default_rng(seed)
        self.planes = rng.normal(size=(dim, n_bits))
        self.n_bits = n_bits

    def signatures(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes) > 0  # (n, n_bits)
        out = np.zeros(len(mat), dtype=np.uint64)
        for i in range(self.n_bits):
            out |= bits[:, i].astype(np.uint64) << np.uint64(i)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        n = np.linalg.norm(mat, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "srp": pa.array(self.signatures(mat / n), type=pa.uint64()),
                "embedding": batch["embedding"],  # carried for exact verify
            }
        )


def _srp_chunk_rows(batch: pa.Table, chunks: int) -> pa.Table:
    ids = batch["vec_id"].to_numpy()
    sh = batch["srp"].to_numpy().astype(np.uint64)
    emb = batch["embedding"].to_pylist()
    width = 64 // chunks
    mask = np.uint64((1 << width) - 1)
    out_c, out_v = [], []
    for c in range(chunks):
        out_c.append(np.full(len(ids), c, dtype=np.int32))
        out_v.append((sh >> np.uint64(c * width)) & mask)
    vals = np.concatenate(out_v)
    chunk = np.concatenate(out_c)
    with np.errstate(over="ignore"):
        gkey = _mix64(vals ^ (chunk.astype(np.uint64) * np.uint64(0x9E3779B9))) % np.uint64(
            _GROUP_BUCKETS
        )
    return pa.table(
        {
            "chunk": pa.array(chunk),
            "val": pa.array(vals, type=pa.uint64()),
            "gkey": pa.array(gkey.astype(np.int64)),
            "vec_id": pa.array(np.tile(ids, chunks), type=pa.int64()),
            "embedding": pa.array(emb * chunks, type=pa.list_(pa.float64())),
        }
    )


def _srp_bucket_pairs(group: pd.DataFrame, tau: float) -> pd.DataFrame:
    out_a, out_b, out_c = [], [], []
    for _, g in group.groupby(["chunk", "val"], sort=False):
        if len(g) < 2 or len(g) > 2000:  # degenerate mega-bucket guard
            continue
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        mat = np.array([np.asarray(e, dtype=np.float64) for e in g["embedding"]])
        n = np.linalg.norm(mat, axis=1, keepdims=True)
        n[n == 0] = 1.0
        mat = mat / n
        sims = mat @ mat.T
        ii, jj = np.nonzero(np.triu(sims >= tau, k=1))
        for i, j in zip(ii, jj):
            if ids[i] != ids[j]:
                out_a.append(int(ids[i]))
                out_b.append(int(ids[j]))
                out_c.append(round(float(sims[i, j]), 6))
    df = pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_c})
    return df.drop_duplicates(["id_a", "id_b"])


def embedding_dup_pairs_lsh(
    embeddings_ds, tau: float = 0.9, n_bits: int = 64, chunks: int = 8, seed: int = 99
):
    """SRP-LSH near-dup: candidates share at least one exact 8-bit SRP
    chunk (recall is probabilistic — a pair at cosine tau survives a
    chunk with prob (1-acos(tau)/pi)^(64/chunks); chunks=8 at tau=0.9
    gives ~0.76 per chunk, >0.99 across 8 bands); exact cosine verified
    in-bucket.  All shuffles on fixed-width hash keys."""
    import pyarrow.parquet  # noqa: F401

    dim = len(embeddings_ds.take(1)[0]["embedding"])
    sigs = embeddings_ds.map_batches(
        SRPHasher,
        fn_constructor_kwargs={"dim": dim, "n_bits": n_bits, "seed": seed},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=(1, 4),
        num_cpus=1,
    )
    rows = sigs.map_batches(
        _srp_chunk_rows, fn_kwargs={"chunks": chunks}, batch_format="pyarrow"
    )
    pairs = rows.groupby("gkey").map_groups(
        _srp_bucket_pairs, fn_kwargs={"tau": tau}, batch_format="pandas"
    )
    return pairs.map_batches(_with_pair_bucket, batch_format="pyarrow").groupby(
        "pkey"
    ).map_groups(_dedupe_pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# Embedding cosine near-dup (exact broadcast baseline)
# ---------------------------------------------------------------------------


class _CosinePairFinder:
    """Broadcast the full normalized matrix once per actor; per batch a
    blocked matmul emits pairs with cosine >= tau (id_a < id_b)."""

    def __init__(self, mat_ref, ids_ref, tau: float):
        import ray

        self.mat = ray.get(mat_ref)
        self.ids = ray.get(ids_ref)
        self.tau = tau

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        emb = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        emb = emb / norms
        sims = emb @ self.mat.T
        ii, jj = np.nonzero(sims >= self.tau)
        keep = ids[ii] < self.ids[jj]
        return pa.table(
            {
                "id_a": pa.array(ids[ii][keep], type=pa.int64()),
                "id_b": pa.array(self.ids[jj][keep], type=pa.int64()),
                "cosine": pa.array(np.round(sims[ii, jj][keep], 6), type=pa.float64()),
            }
        )


def embedding_dup_pairs(embeddings_ds, tau: float = 0.9, concurrency=(1, 4)):
    """Exact cosine near-dup pairs over an embedding column.  The full
    matrix is broadcast via ray.put (fine to ~1e6 x d per node); beyond
    that swap the finder for SRP-LSH bucketing (same groupby shape as
    MinHash-LSH above)."""
    import ray

    tbl = pa.concat_tables(
        list(embeddings_ds.iter_batches(batch_format="pyarrow"))
    )
    ids = tbl["vec_id"].to_numpy()
    mat = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    mat_ref = ray.put(mat)
    ids_ref = ray.put(ids)
    return embeddings_ds.map_batches(
        _CosinePairFinder,
        fn_constructor_args=(mat_ref, ids_ref, tau),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
        num_cpus=1,
    )

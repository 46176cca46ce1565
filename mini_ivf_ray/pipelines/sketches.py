"""Mergeable-sketch operators.

Task-brief addition ("a novel sketch" class).  First entry: EXACT
corpus-wide heavy hitters via the two-pass sketch-then-verify shape —
the standard way to get exact answers at 100 TB without an O(vocab)
shuffle:

Pass 1 (candidates): per-batch Misra-Gries(k) summaries.  MG summaries
are mergeable (Agarwal et al., "Mergeable Summaries", PODS 2012): after
summing per-batch summaries, any term with true count >= N/(k+1) is
guaranteed present.  With k >= denom/numer, every term with frequency
>= numer/denom of the corpus survives — a PROVABLE superset, never a
heuristic.  Per-batch summaries are <= k rows, so the driver merge
handles B*k tiny rows (same adaptive-combine caveat as
``build.py``'s counter rows; one combine level covers 10^7 batches).

Pass 2 (verify): broadcast the candidate term set; one vectorized
counting pass emits exact per-batch counts for candidates ONLY
(<= k rows per batch); the driver sums and applies the integer
threshold ``cnt * denom >= numer * total_tokens`` — integer arithmetic
on both sides, so the DuckDB ``HAVING count(*) * denom >= total``
oracle matches bit-for-bit (no float phi rounding trap).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.functions.tokenize import tokenize_batch


def _mg_batch(batch: pa.Table, k: int) -> pa.Table:
    """Misra-Gries(k) summary of one batch, computed from exact batch
    counts: subtract the (k+1)-th largest count from every count, keep
    positives.  Per-term decrement <= n_batch/(k+1) — the MG bound."""
    texts = batch["text"].to_pylist()
    toks, dls = tokenize_batch(texts)
    n_tokens = int(dls.sum())
    flat = np.asarray([t for lst in toks for t in lst], dtype=object)
    if flat.size:
        terms, counts = np.unique(flat, return_counts=True)
        if terms.size > k:
            t = np.partition(counts, terms.size - (k + 1))[terms.size - (k + 1)]
            keep = counts > t
            terms, counts = terms[keep], counts[keep] - t
    else:
        terms = np.asarray([], dtype=object)
        counts = np.asarray([], dtype=np.int64)
    # one extra row carries the batch token total (term = NULL)
    return pa.table(
        {
            "term": pa.array(list(terms) + [None], type=pa.string()),
            "cnt": pa.array(
                np.r_[counts.astype(np.int64), n_tokens], type=pa.int64()
            ),
        }
    )


class _CandidateCounter:
    """Pass-2 actor: broadcast candidate terms once, per batch emit
    exact counts for candidates only (vectorized membership via a
    sorted term array + searchsorted, never per-row dict probes)."""

    def __init__(self, cand_ref):
        import ray

        cand = ray.get(cand_ref)
        self.cand = np.sort(np.asarray(cand, dtype=object))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        toks, _ = tokenize_batch(texts)
        flat = np.asarray([t for lst in toks for t in lst], dtype=object)
        if not flat.size or not self.cand.size:
            return pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "cnt": pa.array([], type=pa.int64()),
                }
            )
        terms, counts = np.unique(flat, return_counts=True)
        idx = np.searchsorted(self.cand, terms)
        idx_c = np.minimum(idx, self.cand.size - 1)
        hit = self.cand[idx_c] == terms
        return pa.table(
            {
                "term": pa.array(terms[hit], type=pa.string()),
                "cnt": pa.array(counts[hit].astype(np.int64), type=pa.int64()),
            }
        )


def heavy_hitter_terms(docs_ds, numer: int = 1, denom: int = 100):
    """EXACT heavy hitters: (term, cnt) for every term whose corpus
    token frequency satisfies ``cnt * denom >= numer * total_tokens``
    (i.e. frequency >= numer/denom).  pandas DataFrame result — the
    output is bounded by denom/numer rows, driver-sized by contract."""
    import ray

    k = int(np.ceil(denom / numer))
    mg = docs_ds.map_batches(
        _mg_batch, fn_kwargs={"k": k}, batch_format="pyarrow"
    ).to_pandas()
    total = int(mg.loc[mg["term"].isna(), "cnt"].sum())
    merged = mg.dropna(subset=["term"]).groupby("term", sort=False)["cnt"].sum()
    # provable superset: true_cnt - merged_cnt <= total/(k+1) < total*numer/denom
    cand = merged.index.to_numpy(dtype=object)
    if not len(cand) or total == 0:
        return pd.DataFrame(
            {"term": pd.Series(dtype=object), "cnt": pd.Series(dtype=np.int64)}
        )
    ref = ray.put(cand)
    exact = docs_ds.map_batches(
        _CandidateCounter,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=(1, 8),
        num_cpus=1,
    ).to_pandas()
    cnt = exact.groupby("term", sort=True)["cnt"].sum()
    hh = cnt[cnt * denom >= numer * total]
    return pd.DataFrame(
        {"term": hh.index.to_numpy(dtype=object), "cnt": hh.to_numpy(np.int64)}
    ).reset_index(drop=True)


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch
# ---------------------------------------------------------------------------

HLL_P = 12
HLL_M = 1 << HLL_P  # 4096 registers; rel. std err 1.04/sqrt(m) ~ 1.6%


def _hll_registers(hashes: np.ndarray) -> np.ndarray:
    """uint64 hashes -> (m,) uint8 register array (max rank per
    register).  Fully vectorized; the rank computation stays exact
    because the 52-bit remainder fits float64."""
    regs = np.zeros(HLL_M, dtype=np.uint8)
    if not hashes.size:
        return regs
    idx = (hashes >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = hashes & np.uint64((1 << (64 - HLL_P)) - 1)
    rank = np.full(len(w), 64 - HLL_P + 1, dtype=np.uint8)
    nz = w > 0
    # bit_length(w) = floor(log2(w)) + 1, exact for w < 2^52
    bl = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64) + 1
    rank[nz] = ((64 - HLL_P) - bl + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate (Flajolet et al. 2007) with the
    small-range linear-counting correction; no large-range correction
    needed with 64-bit hashes."""
    m = float(HLL_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if e <= 2.5 * m:
        v = int(np.count_nonzero(regs == 0))
        if v:
            e = m * np.log(m / v)
    return float(e)


def _hll_term_batch(batch: pa.Table) -> pa.Table:
    """One row per batch: the batch's HLL register array over its
    DISTINCT terms (dedup before hashing — md5 runs once per distinct
    term per batch) plus the exact distinct-term list's own hash set
    size is NOT shipped; only the 4 KB register blob is."""
    from mini_ivf_ray.functions.hashing import md5_u64

    texts = batch["text"].to_pylist()
    toks, _ = tokenize_batch(texts)
    flat = np.asarray([t for lst in toks for t in lst], dtype=object)
    uniq = np.unique(flat) if flat.size else np.asarray([], dtype=object)
    h = np.fromiter((md5_u64(t) for t in uniq), dtype=np.uint64, count=len(uniq))
    regs = _hll_registers(h)
    return pa.table({"regs": pa.array([regs.tobytes()], type=pa.binary())})


def distinct_terms_hll(docs_ds) -> float:
    """Approximate distinct terms: per-batch 4 KB register blobs merged
    by elementwise max on the driver (mergeable by construction —
    max commutes; B batches ship B*4 KB, never the vocabulary)."""
    blobs = docs_ds.map_batches(_hll_term_batch, batch_format="pyarrow").to_pandas()
    regs = np.zeros(HLL_M, dtype=np.uint8)
    for b in blobs["regs"]:
        regs = np.maximum(regs, np.frombuffer(b, dtype=np.uint8))
    return _hll_estimate(regs)


def distinct_terms_exact(docs_ds) -> int:
    """Exact distinct terms via per-batch unique -> driver set union.
    Vocab-bounded by Heaps' law — the contract the stats sidecar
    already relies on; the HLL path above is the unbounded-cardinality
    answer (urls, shingles) where this contract breaks."""
    def uniq_batch(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        toks, _ = tokenize_batch(texts)
        flat = np.asarray([t for lst in toks for t in lst], dtype=object)
        u = np.unique(flat) if flat.size else np.asarray([], dtype=object)
        return pa.table({"term": pa.array(list(u), type=pa.string())})

    out = docs_ds.map_batches(uniq_batch, batch_format="pyarrow").to_pandas()
    return int(out["term"].nunique())


# ---------------------------------------------------------------------------
# Bloom-filter membership sketch (crawl seen-list / URL frontier dedup)
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 20  # 128 KB per blob
BLOOM_K = 7


def _bloom_hashes(h: np.ndarray) -> np.ndarray:
    """(n, k) bit positions via Kirsch-Mitzenmacher double hashing:
    g_i = h1 + i*h2 (mod m) — two derived 64-bit streams, k probes."""
    h = h.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        h1 = h
        h2 = h ^ np.uint64(0x9E3779B97F4A7C15)
        h2 ^= h2 >> np.uint64(30)
        h2 *= np.uint64(0xBF58476D1CE4E5B9)
        h2 ^= h2 >> np.uint64(27)
        h2 |= np.uint64(1)  # odd -> full-period stride
        ks = np.arange(BLOOM_K, dtype=np.uint64)
        pos = (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(BLOOM_BITS)
    return pos.astype(np.int64)


def _bloom_bits(hashes: np.ndarray) -> np.ndarray:
    """uint64 value hashes -> packed bit array (BLOOM_BITS/8 bytes)."""
    bits = np.zeros(BLOOM_BITS, dtype=bool)
    if hashes.size:
        bits[_bloom_hashes(hashes).ravel()] = True
    return np.packbits(bits)


def bloom_contains(packed: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Vectorized membership probe: True iff ALL k bits set.  Zero
    false negatives by construction; FPR ~ (1 - e^(-kn/m))^k."""
    bits = np.unpackbits(packed).astype(bool)
    if not hashes.size:
        return np.zeros(0, dtype=bool)
    pos = _bloom_hashes(hashes)
    return bits[pos].all(axis=1)


def build_bloom(ds, col: str, hash_fn=None) -> np.ndarray:
    """Distributed build: per-batch 128 KB packed blobs OR-merged on the
    driver (mergeable by construction — OR commutes).  ``hash_fn`` maps
    a python value to uint64; defaults to md5_u64 of str(value)."""
    from mini_ivf_ray.functions.hashing import md5_u64

    hf = hash_fn or (lambda v: md5_u64(str(v)))

    def blob_batch(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_pylist()
        h = np.fromiter((hf(v) for v in vals), dtype=np.uint64, count=len(vals))
        return pa.table({"bloom": pa.array([_bloom_bits(h).tobytes()], type=pa.binary())})

    blobs = ds.map_batches(blob_batch, batch_format="pyarrow").to_pandas()
    packed = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
    for b in blobs["bloom"]:
        packed |= np.frombuffer(b, dtype=np.uint8)
    return packed

"""Heavy hitters: MG candidate pass must be a provable superset; the
verify pass must make the final answer exact, including when the
per-batch trim path is active (distinct-per-batch >> k)."""

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data

from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.sketches import _mg_batch, heavy_hitter_terms


def _zipf_docs(n_docs=200, vocab=2000, seed=11):
    """Wide-vocab Zipf corpus so per-batch distinct terms far exceed
    the MG counter budget k."""
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    p = ranks**-1.1
    p /= p.sum()
    texts = []
    for _ in range(n_docs):
        ids = rng.choice(vocab, size=int(rng.integers(50, 150)), p=p)
        texts.append(" ".join(f"w{i:05d}" for i in ids))
    return texts


def test_exact_heavy_hitters_with_active_trim():
    texts = _zipf_docs()
    exact = Counter()
    for t in texts:
        exact.update(tokenize(t))
    total = sum(exact.values())
    numer, denom = 1, 50  # k = 50 << ~1000 distinct per batch
    expect = {t: c for t, c in exact.items() if c * denom >= numer * total}

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})
    ).repartition(16)  # force many batches -> many MG summaries merged
    got = heavy_hitter_terms(ds, numer=numer, denom=denom)
    assert dict(zip(got["term"], got["cnt"])) == expect
    assert len(expect) > 0  # non-vacuous


def test_mg_batch_trim_is_bounded_and_small():
    """The per-batch summary keeps <= k terms and decrements each count
    by at most n_batch/(k+1) (the MG mergeability bound)."""
    texts = _zipf_docs(n_docs=30, vocab=500, seed=3)
    batch = pa.table({"text": texts})
    k = 20
    out = _mg_batch(batch, k=k).to_pandas()
    total_row = out[out["term"].isna()]
    n_batch = int(total_row["cnt"].iloc[0])
    kept = out.dropna(subset=["term"])
    assert len(kept) <= k
    exact = Counter()
    for t in texts:
        exact.update(tokenize(t))
    bound = n_batch / (k + 1)
    for term, cnt in zip(kept["term"], kept["cnt"]):
        assert 0 < cnt <= exact[term]
        assert exact[term] - cnt <= bound
    # terms NOT kept must have true count <= bound (superset guarantee)
    dropped = set(exact) - set(kept["term"])
    assert all(exact[t] <= bound for t in dropped)


def test_empty_corpus():
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1], type=pa.int64()), "text": [""]})
    )
    got = heavy_hitter_terms(ds)
    assert len(got) == 0


def test_hll_vs_exact_on_wide_vocab():
    from mini_ivf_ray.pipelines.sketches import distinct_terms_exact, distinct_terms_hll

    texts = _zipf_docs(n_docs=150, vocab=3000, seed=21)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})
    ).repartition(12)  # many batches -> real register merging
    exact = distinct_terms_exact(ds)
    est = distinct_terms_hll(ds)
    assert exact > 1000
    assert abs(est - exact) / exact < 0.08


def test_hll_registers_merge_is_order_invariant():
    from mini_ivf_ray.pipelines.sketches import _hll_estimate, _hll_registers

    rng = np.random.default_rng(5)
    h = rng.integers(0, 2**64, 50_000, dtype=np.uint64)
    whole = _hll_registers(h)
    parts = np.maximum.reduce([_hll_registers(c) for c in np.array_split(h, 7)])
    assert np.array_equal(whole, parts)
    assert _hll_estimate(whole) == _hll_estimate(parts)


def test_bloom_no_false_negatives_and_low_fpr():
    from mini_ivf_ray.pipelines.sketches import (
        BLOOM_BITS,
        BLOOM_K,
        _bloom_bits,
        bloom_contains,
    )

    rng = np.random.default_rng(9)
    present = rng.integers(0, 2**64, 20_000, dtype=np.uint64)
    absent = rng.integers(0, 2**64, 20_000, dtype=np.uint64)
    packed = _bloom_bits(present)
    assert bloom_contains(packed, present).all()  # hard guarantee
    fpr = bloom_contains(packed, absent).mean()
    bound = (1.0 - np.exp(-BLOOM_K * len(present) / BLOOM_BITS)) ** BLOOM_K
    assert fpr <= 3 * bound + 1e-4


def test_bloom_merge_is_or():
    from mini_ivf_ray.pipelines.sketches import _bloom_bits, bloom_contains

    rng = np.random.default_rng(10)
    a = rng.integers(0, 2**64, 5000, dtype=np.uint64)
    b = rng.integers(0, 2**64, 5000, dtype=np.uint64)
    merged = _bloom_bits(a) | _bloom_bits(b)
    whole = _bloom_bits(np.concatenate([a, b]))
    assert np.array_equal(merged, whole)
    assert bloom_contains(merged, a).all() and bloom_contains(merged, b).all()

"""BPE training/encoding vs a textbook reference implementation."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data
from mini_ivf_ray.pipelines.bpe import (
    _symbols,
    bpe_token_counts,
    encode_word,
    train_bpe,
    word_counts,
)


def _train_ref(counts: pd.DataFrame, n_merges: int, min_freq: int = 2):
    """Sennrich-2016 reference: recount EVERY pair from scratch each
    iteration (O(V * L) per merge — correct, slow)."""
    vocab = {w: list(_symbols(w)) for w in counts["word"]}
    freq = dict(zip(counts["word"], counts["count"]))
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in vocab.items():
            f = freq[w]
            for p in zip(syms, syms[1:]):
                pc[p] += f
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_freq:
            break
        merges.append((a, b, int(cnt)))
        for w, syms in vocab.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            vocab[w] = out
    return merges, vocab


CORPUS = [
    "low lower lowest low low",
    "new newer newest new news",
    "wide wider widest new low",
    "the cat sat on the mat the cat",
    "banana bandana ban bananas",
]


def test_train_matches_reference():
    counts = pd.DataFrame(
        sorted(Counter(" ".join(CORPUS).split()).items()),
        columns=["word", "count"],
    )
    got = train_bpe(counts=counts, n_merges=30, min_freq=2)
    ref, _ = _train_ref(counts, 30, min_freq=2)
    assert got == ref


def test_encode_matches_training_rewrite():
    counts = pd.DataFrame(
        sorted(Counter(" ".join(CORPUS).split()).items()),
        columns=["word", "count"],
    )
    merges = train_bpe(counts=counts, n_merges=25, min_freq=2)
    _, final_vocab = _train_ref(counts, 25, min_freq=2)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    # rank-order encoding of a TRAINING word reproduces the training
    # rewrite exactly
    for w, syms in final_vocab.items():
        assert list(encode_word(w, ranks)) == syms, w
    # unseen words encode deterministically through the same ranks
    assert encode_word("lowestest", ranks) is not None
    assert "".join(encode_word("newest", ranks)).replace("</w>", "") == "newest"


def test_distributed_word_counts_and_encode():
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(len(CORPUS))), type=pa.int64()),
            "text": CORPUS,
        }
    )
    ds = ray.data.from_arrow(docs)
    wc_one = word_counts(ds)
    wc_many = word_counts(ray.data.from_arrow(docs).repartition(4))
    pd.testing.assert_frame_equal(wc_one, wc_many)
    assert int(wc_one[wc_one.word == "low"]["count"].iloc[0]) == 4

    merges = train_bpe(counts=wc_one, n_merges=20)
    out = (
        bpe_token_counts(ds, merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    for i, text in enumerate(CORPUS):
        words = text.split()
        want = sum(len(encode_word(w, ranks)) for w in words)
        assert out.loc[i, "n_words"] == len(words)
        assert out.loc[i, "n_bpe_tokens"] == want
    # merges compress: fewer bpe tokens than characters
    assert (out["n_bpe_tokens"].to_numpy()
            < np.array([len(t.replace(" ", "")) for t in CORPUS])).all()

"""Byte-pair-encoding tokenizer: distributed training + encoding.

The canonical LLM-pipeline operator (Sennrich et al. 2016,
arXiv:1508.07909): learn ``n_merges`` symbol merges from corpus
statistics, then encode documents with the learned table.

Scale shape — the insight every production BPE trainer uses: merges
depend only on the WORD FREQUENCY table, which is Heaps-law bounded
(~1e7-1e8 distinct words at 100 TB), not corpus-sized.  So:

  1. ONE distributed tokenize pass produces exact (word, count) —
     per-batch Counter partials, then the same adaptive reduce the
     stats pass uses (driver pandas below a row threshold, bucketed
     groupby above);
  2. the merge loop runs driver-side over that bounded table with
     incremental pair-count maintenance (only words CONTAINING the
     merged pair are revisited — the standard trainer optimization),
     deterministic tie-break (count desc, pair lexicographic asc);
  3. encoding is a stateless ``map_batches`` pass: per batch, each
     DISTINCT word is encoded once through the merge ranks and cached
     (Zipf makes the cache hit rate ~99%), then scattered back.

BPE is not SQL-expressible (iterative, data-dependent), so the driver
query is rows-only; exactness is pinned by pytest identity against a
textbook reference implementation (tests/test_bpe.py).

Word symbols are characters with an end-of-word marker appended to the
last character (the Sennrich formulation), so merges never cross word
boundaries.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.functions.tokenize import tokenize

# end-of-word marker glued to the final character (corpus tokens are
# [a-z0-9]+ so the marker can never collide with text)
_EOW = "</w>"


def word_counts(docs_ds, text_col: str = "text") -> pd.DataFrame:
    """Exact (word, count) over the corpus: per-batch Counter partials,
    merged on the driver (the word table is Heaps-bounded; above a few
    million rows this reduce would route through the same bucketed
    groupby the stats pass uses)."""

    def partials(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            c.update(tokenize(t))
        return pa.table(
            {
                "word": pa.array(list(c.keys()), type=pa.string()),
                "count": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    parts = docs_ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    if "word" not in parts.columns or not len(parts):
        return pd.DataFrame({"word": [], "count": []})
    return (
        parts.groupby("word", sort=True)["count"].sum().reset_index()
    )


def _symbols(word: str) -> tuple[str, ...]:
    if not word:
        return ()
    chars = list(word)
    chars[-1] += _EOW
    return tuple(chars)


def train_bpe(
    docs_ds=None,
    n_merges: int = 100,
    min_freq: int = 2,
    counts: pd.DataFrame | None = None,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` merges; returns [(left, right, count)]
    in merge order.  Stops early when no pair reaches ``min_freq``.
    Pass either a documents Dataset or a precomputed (word, count)
    frame."""
    if counts is None:
        counts = word_counts(docs_ds, text_col=text_col)
    words = [_symbols(w) for w in counts["word"]]
    freqs = counts["count"].to_numpy(dtype=np.int64)

    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        f = int(freqs[i])
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += f
            pair_words.setdefault((a, b), set()).add(i)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # deterministic: count desc, then pair lexicographic asc
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_freq:
            break
        merges.append((a, b, int(cnt)))
        ab = a + b
        for i in list(pair_words.get((a, b), ())):
            syms = words[i]
            f = int(freqs[i])
            # remove old pair contributions of this word
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                s = pair_words.get(p)
                if s is not None:
                    s.discard(i)
                    if not s:
                        del pair_words[p]
            # apply the merge left-to-right
            out = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(ab)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = tuple(out)
            words[i] = syms
            for p in zip(syms, syms[1:]):
                pair_counts[p] += f
                pair_words.setdefault(p, set()).add(i)
    return merges


def encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """Apply merges to one word in rank order (lowest rank first — the
    exact sequence training would have produced)."""
    syms = list(_symbols(word))
    while len(syms) > 1:
        best_rank, best_j = None, -1
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        # merge EVERY occurrence of that pair left-to-right (matches
        # how training rewrites the whole word in one step)
        a, b = syms[best_j], syms[best_j + 1]
        out, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return tuple(syms)


class BPEEncoder:
    """Actor-pool encode stage: merge ranks broadcast once (ray.put),
    per-actor word->tokens cache (Zipf: ~99% hits).  Emits per-doc
    (doc_id, n_words, n_bpe_tokens)."""

    def __init__(self, merges_ref, text_col: str = "text"):
        import ray

        merges = (
            ray.get(merges_ref)
            if not isinstance(merges_ref, list)
            else merges_ref
        )
        self.ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
        self.text_col = text_col
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n_words = np.zeros(len(ids), dtype=np.int64)
        n_tok = np.zeros(len(ids), dtype=np.int64)
        for i, text in enumerate(batch[self.text_col].to_pylist()):
            toks = tokenize(text)
            n_words[i] = len(toks)
            total = 0
            for w in toks:
                n = self.cache.get(w)
                if n is None:
                    n = len(encode_word(w, self.ranks))
                    self.cache[w] = n
                total += n
            n_tok[i] = total
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words, type=pa.int64()),
                "n_bpe_tokens": pa.array(n_tok, type=pa.int64()),
            }
        )


def bpe_token_counts(docs_ds, merges, text_col: str = "text"):
    """Dataset of (doc_id, n_words, n_bpe_tokens) under the learned
    merge table."""
    import ray

    merges_ref = ray.put(list(merges))
    return docs_ds.map_batches(
        BPEEncoder,
        fn_constructor_args=(merges_ref, text_col),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 8),
        num_cpus=1,
    )

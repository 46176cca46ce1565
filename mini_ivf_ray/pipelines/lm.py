"""Statistical text-model operators: bigram-LM scoring, tf-idf
keywords, Naive-Bayes classification.

Training-data pipeline staples with no mini-ivf analog (the reference
is vector-only), but the same two-pass shape as its Train -> Populate
lifecycle (index_ivf.cpp:39-70 then 72-106): one distributed counting
pass produces a bounded model (vocab- or vocab x classes-sized, the
codebook analog), which is broadcast once via ``ray.put`` and applied
by a stateless vectorized ``map_batches`` scoring pass.  Nothing
corpus-sized ever converges on one node; the model is the only shared
state, exactly like ``Quantizer::centers_`` (quantizer.hpp:39).

All rules are deliberately SQL-expressible so the driver's DuckDB
oracle replays them exactly.  Float outputs are rounded to 6 decimals
on both sides; *rankings* (keyword top-k, NB argmax) are taken on the
exact float64 values with a deterministic tie-break, and the decisive
margins are orders of magnitude above summation-order noise.

Lookup discipline: token -> code via ``np.searchsorted`` over a sorted
fixed-width ``S``-dtype vocab array (never a Python dict in the hot
path — memory: dicts pickle per consumer and probe per row); bigram
counts via int64 keys ``code1 * V + code2`` searchsorted against the
sorted trained key array.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.functions.tokenize import tokenize_batch

# sentinel for per-batch / per-class global counter rows ("" is never a token)
_GLOBAL = ""


def _encode_tokens(tokens: np.ndarray, vocab_s: np.ndarray) -> np.ndarray:
    """codes int64 per token; -1 for out-of-vocabulary.  ``vocab_s`` is
    a SORTED fixed-width bytes (dtype S) array; probes longer than its
    itemsize would truncate-compare, so they are forced OOV."""
    if len(tokens) == 0:
        return np.empty(0, dtype=np.int64)
    if len(vocab_s) == 0:
        return np.full(len(tokens), -1, dtype=np.int64)
    toks_s = np.asarray(tokens, dtype="S")
    width = int(vocab_s.dtype.itemsize)
    too_long = (
        np.char.str_len(toks_s) > width
        if toks_s.dtype.itemsize > width
        else np.zeros(len(toks_s), dtype=bool)
    )
    probe = toks_s.astype(f"S{width}")
    idx = np.searchsorted(vocab_s, probe)
    idx[idx >= len(vocab_s)] = 0
    hit = (vocab_s[idx] == probe) & ~too_long
    return np.where(hit, idx, -1).astype(np.int64)


def _flat_tokens(batch: pa.Table):
    """(flat token object array, doc index per token, doc_ids, dls)."""
    toks, dls = tokenize_batch(batch["text"].to_pylist())
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks]) if toks else np.empty(0, object)
    doc_idx = np.repeat(np.arange(len(toks)), dls)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, doc_idx, ids, dls


# ---------------------------------------------------------------------------
# Bigram language model (CCNet-style perplexity filtering, self-trained)
# ---------------------------------------------------------------------------


class BigramModel:
    """Sorted-array form of add-one-smoothed bigram counts.

    P(w2 | w1) = (c(w1,w2) + 1) / (c(w1) + V), V = |vocabulary|.
    """

    def __init__(self, uni: Counter, big: Counter):
        vocab = sorted(uni)
        self.vocab_s = np.asarray(vocab, dtype="S")
        self.uni_c = np.asarray([uni[w] for w in vocab], dtype=np.int64)
        self.V = len(vocab)
        # vectorized (training-time, model-sized): encode both pair
        # sides against the sorted vocab, key = code1 * (V+1) + code2
        w1s = _encode_tokens(np.asarray([p[0] for p in big], dtype=object), self.vocab_s)
        w2s = _encode_tokens(np.asarray([p[1] for p in big], dtype=object), self.vocab_s)
        keys = w1s * (self.V + 1) + w2s
        cnts = np.fromiter((c for c in big.values()), dtype=np.int64, count=len(big))
        order = np.argsort(keys, kind="stable")
        self.big_keys = keys[order]
        self.big_c = cnts[order]

    def bigram_counts(self, c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
        """Trained count for each (code1, code2) pair; 0 if unseen."""
        if len(self.big_keys) == 0 or len(c1) == 0:
            return np.zeros(len(c1), dtype=np.int64)
        key = c1 * (self.V + 1) + c2
        idx = np.searchsorted(self.big_keys, key)
        idx[idx >= len(self.big_keys)] = 0
        found = self.big_keys[idx] == key
        return np.where(found, self.big_c[idx], 0).astype(np.int64)


def train_bigram_counts(docs_ds, driver_threshold: int = 5_000_000) -> BigramModel:
    """One counting pass over the corpus -> BigramModel.

    Per-batch partial Counters bound the exchange at
    O(batches x batch-vocab^2-observed); the aggregate is model-sized
    (Heaps-law vocab), reduced on the driver below the threshold
    (memory pitfall: driver reduce beats the sort-exchange floor for
    small aggregates) and via a bucketed groupby above it.
    """

    def partials(batch: pa.Table) -> pa.Table:
        toks, _ = tokenize_batch(batch["text"].to_pylist())
        uni: Counter = Counter()
        big: Counter = Counter()
        for ts in toks:
            uni.update(ts)
            big.update(zip(ts, ts[1:]))
        w1 = [w for w in uni] + [p[0] for p in big]
        w2 = [_GLOBAL] * len(uni) + [p[1] for p in big]
        c = [uni[w] for w in uni] + [big[p] for p in big]
        return pa.table(
            {
                "w1": pa.array(w1, type=pa.string()),
                "w2": pa.array(w2, type=pa.string()),
                "c": pa.array(c, type=pa.int64()),
            }
        )

    parts = docs_ds.map_batches(partials, batch_format="pyarrow").materialize()
    if parts.count() <= driver_threshold:
        df = parts.to_pandas()
    else:
        import ray

        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        df = (
            parts.repartition(max(8, n_cpus))
            .groupby(["w1", "w2"])
            .sum("c", alias_name="c")
            .to_pandas()
        )
    g = df.groupby(["w1", "w2"], sort=False)["c"].sum()
    uni: Counter = Counter()
    big: Counter = Counter()
    for (w1, w2), c in g.items():
        if w2 == _GLOBAL:
            uni[w1] += int(c)
        else:
            big[(w1, w2)] += int(c)
    return BigramModel(uni, big)


def lm_cross_entropy(docs_ds, model: BigramModel | None = None):
    """Per-doc add-one bigram cross-entropy:

        H(d) = -mean over adjacent pairs of ln((c(w1,w2)+1)/(c(w1)+V))

    Docs with fewer than 2 tokens emit no row (they have no pairs) —
    matching the SQL oracle, whose unnested pair list is empty for
    them.  Output: (doc_id, n_bigrams, cross_entropy_r) rounded 6dp.
    The scoring pass is stateless and shuffle-free; the model rides in
    the task closure (``ray.put`` under the hood), never per batch.
    """
    if model is None:
        model = train_bigram_counts(docs_ds)

    def score(batch: pa.Table) -> pa.Table:
        flat, doc_idx, ids, dls = _flat_tokens(batch)
        codes = _encode_tokens(flat, model.vocab_s)
        n = len(codes)
        if n >= 2:
            same_doc = doc_idx[:-1] == doc_idx[1:]
            c1, c2 = codes[:-1][same_doc], codes[1:][same_doc]
            pair_doc = doc_idx[:-1][same_doc]
        else:
            c1 = c2 = pair_doc = np.empty(0, dtype=np.int64)
        bc = model.bigram_counts(c1, c2)
        # trained on this corpus => c1 always in vocab; guard anyway
        uc = np.where(c1 >= 0, model.uni_c[np.maximum(c1, 0)], 0)
        contrib = np.log((bc + 1.0) / (uc + float(model.V)))
        nd = len(ids)
        n_pairs = np.bincount(pair_doc, minlength=nd).astype(np.int64)
        sums = np.bincount(pair_doc, weights=contrib, minlength=nd)
        keep = n_pairs > 0
        h = -sums[keep] / n_pairs[keep]
        return pa.table(
            {
                "doc_id": pa.array(ids[keep]),
                "n_bigrams": pa.array(n_pairs[keep]),
                "cross_entropy_r": pa.array(np.round(h, 6), type=pa.float64()),
            }
        )

    return docs_ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------


def tfidf_keywords(docs_ds, k: int = 3, driver_threshold: int = 5_000_000):
    """Top-k terms per document by tf-idf = tf * ln(N / df), ranked on
    the exact float64 score with tie-break (score desc, term asc).

    Pass 1 reuses the corpus-stats pass (df + N); pass 2 is a
    stateless per-batch map — per-doc top-k needs no shuffle at all,
    every doc's ranking is local to its batch.  Output:
    (doc_id, rank, term, tfidf_r).
    """
    from mini_ivf_ray.stages.stats_stage import compute_stats

    stats = compute_stats(docs_ds, driver_threshold=driver_threshold)
    vocab = sorted(stats.df)
    vocab_s = np.asarray(vocab, dtype="S")
    df_c = np.asarray([stats.df[w] for w in vocab], dtype=np.float64)
    n_docs = float(stats.n_docs)
    idf = np.log(n_docs / df_c)

    def score(batch: pa.Table) -> pa.Table:
        flat, doc_idx, ids, _ = _flat_tokens(batch)
        codes = _encode_tokens(flat, vocab_s)
        iv = codes >= 0  # vocab is full-corpus, so this is all-True
        doc_idx, codes = doc_idx[iv], codes[iv]
        # per-(doc, code) tf via one unique over the combined key
        keys = doc_idx * (len(vocab) + 1) + codes
        ukeys, tf = np.unique(keys, return_counts=True)
        udoc = (ukeys // (len(vocab) + 1)).astype(np.int64)
        ucode = (ukeys % (len(vocab) + 1)).astype(np.int64)
        s = tf.astype(np.float64) * idf[ucode]
        d = pd.DataFrame(
            {
                "doc_id": ids[udoc],
                "term": vocab_s[ucode].astype("U"),
                "score": s,
            }
        ).sort_values(
            ["doc_id", "score", "term"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        top = d.groupby("doc_id", sort=False).head(k)
        rank = top.groupby("doc_id", sort=False).cumcount() + 1
        return pa.table(
            {
                "doc_id": pa.array(top["doc_id"].to_numpy(np.int64)),
                "rank": pa.array(rank.to_numpy(np.int64)),
                "term": pa.array(top["term"].to_numpy(object), type=pa.string()),
                "tfidf_r": pa.array(
                    np.round(top["score"].to_numpy(), 6), type=pa.float64()
                ),
            }
        )

    return docs_ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Naive-Bayes classifier (multinomial, add-one)
# ---------------------------------------------------------------------------


class NBModel:
    def __init__(self, classes, vocab, class_tok, class_docs, n_docs):
        """class_tok: (V, C) int64 per-class token counts;
        class_docs: (C,) doc counts."""
        self.classes = classes
        self.vocab_s = np.asarray(vocab, dtype="S")
        self.V = len(vocab)
        tot = class_tok.sum(axis=0).astype(np.float64)
        # (V, C) log P(w|c), add-one over the global vocabulary
        self.logp = np.log((class_tok + 1.0) / (tot + float(self.V)))
        self.log_prior = np.log(class_docs.astype(np.float64) / float(n_docs))


def nb_train(docs_ds, label_col: str = "source", driver_threshold: int = 5_000_000) -> NBModel:
    """Distributed multinomial NB training: one pass of per-batch
    (label, term) -> tf partial Counters plus per-label doc counts,
    adaptively reduced (model-sized aggregate: V x C + C)."""

    def partials(batch: pa.Table) -> pa.Table:
        toks, _ = tokenize_batch(batch["text"].to_pylist())
        labels = batch[label_col].to_pylist()
        tok_c: Counter = Counter()
        doc_c: Counter = Counter()
        for lab, ts in zip(labels, toks):
            doc_c[lab] += 1
            for t in ts:
                tok_c[(lab, t)] += 1
        lab = [p[0] for p in tok_c] + list(doc_c)
        term = [p[1] for p in tok_c] + [_GLOBAL] * len(doc_c)
        c = [tok_c[p] for p in tok_c] + [doc_c[s] for s in doc_c]
        return pa.table(
            {
                "lab": pa.array(lab, type=pa.string()),
                "term": pa.array(term, type=pa.string()),
                "c": pa.array(c, type=pa.int64()),
            }
        )

    parts = docs_ds.map_batches(partials, batch_format="pyarrow").materialize()
    if parts.count() <= driver_threshold:
        df = parts.to_pandas()
    else:
        import ray

        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        df = (
            parts.repartition(max(8, n_cpus))
            .groupby(["lab", "term"])
            .sum("c", alias_name="c")
            .to_pandas()
        )
    g = df.groupby(["lab", "term"], sort=False)["c"].sum().reset_index()
    doc_rows = g[g["term"] == _GLOBAL]
    tok_rows = g[g["term"] != _GLOBAL]
    classes = sorted(doc_rows["lab"])
    vocab = sorted(tok_rows["term"].unique())
    cix = {c: i for i, c in enumerate(classes)}
    vix = {w: i for i, w in enumerate(vocab)}
    class_tok = np.zeros((len(vocab), len(classes)), dtype=np.int64)
    class_tok[
        tok_rows["term"].map(vix).to_numpy(np.int64),
        tok_rows["lab"].map(cix).to_numpy(np.int64),
    ] = tok_rows["c"].to_numpy(np.int64)
    class_docs = np.zeros(len(classes), dtype=np.int64)
    class_docs[doc_rows["lab"].map(cix).to_numpy(np.int64)] = doc_rows[
        "c"
    ].to_numpy(np.int64)
    return NBModel(classes, vocab, class_tok, class_docs, int(class_docs.sum()))


def nb_classify(docs_ds, model: NBModel | None = None, label_col: str = "source"):
    """Per-doc argmax_c [ln P(c) + sum_t tf_t ln P(t|c)] with tie-break
    class-name ascending (np.argmax returns the first maximal index and
    classes are sorted).  Output: (doc_id, pred).  Stateless vectorized
    scoring pass; the (V x C) log-prob matrix is the broadcast state.

    Decision margins are sums of O(dl) log-count ratios — orders of
    magnitude above the ~1e-13 summation-order noise, so the argmax is
    stable between numpy and the SQL oracle's aggregate order."""
    if model is None:
        model = nb_train(docs_ds, label_col)

    def score(batch: pa.Table) -> pa.Table:
        flat, doc_idx, ids, _ = _flat_tokens(batch)
        codes = _encode_tokens(flat, model.vocab_s)
        iv = codes >= 0
        nd = len(ids)
        scores = np.tile(model.log_prior, (nd, 1))
        np.add.at(scores, doc_idx[iv], model.logp[codes[iv]])
        pred = np.argmax(scores, axis=1)
        labels = np.asarray(model.classes, dtype=object)[pred]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "pred": pa.array(labels, type=pa.string()),
            }
        )

    return docs_ds.map_batches(score, batch_format="pyarrow")


def collocations(docs_ds, top_n: int = 200, min_count: int = 3):
    """Top adjacent-bigram collocations with the integer evidence a
    PMI/likelihood-ratio test needs: (w1, w2, n_pair, n_w1, n_w2).

    Reuses the single distributed counting pass of
    ``train_bigram_counts`` (per-batch Counter combiners, adaptive
    driver/bucketed reduce); ranking and the unigram attach happen on
    the model-sized aggregate.  Emitting integers rather than the PMI
    float keeps the result exactly comparable (a log/division would
    re-open the float-rounding trap); callers derive
    pmi = log(n_pair * N / (n_w1 * n_w2)) themselves.

    Deterministic order/tiebreak: n_pair DESC, then (w1, w2) ASC."""
    import pandas as pd

    model = train_bigram_counts(docs_ds)
    keep = model.big_c >= min_count
    keys, n_pair = model.big_keys[keep], model.big_c[keep]
    c1 = (keys // (model.V + 1)).astype(np.int64)
    c2 = (keys % (model.V + 1)).astype(np.int64)
    w1 = model.vocab_s[c1].astype("U")
    w2 = model.vocab_s[c2].astype("U")
    df = pd.DataFrame(
        {
            "w1": w1,
            "w2": w2,
            "n_pair": n_pair,
            "n_w1": model.uni_c[c1],
            "n_w2": model.uni_c[c2],
        }
    )
    df = df.sort_values(
        ["n_pair", "w1", "w2"], ascending=[False, True, True], kind="mergesort"
    ).head(top_n)
    return df.reset_index(drop=True)

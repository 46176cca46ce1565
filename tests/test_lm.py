"""Statistical text-model operators (pipelines/lm.py) vs plain
single-process references, including blocking-independence (the
distributed result must not depend on how rows are split into blocks).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mini_ivf_ray.functions.tokenize import tokenize


def _docs(n=300, seed=11, vocab=40, classes=4):
    rng = np.random.default_rng(seed)
    # class-skewed vocab so NB has real signal
    texts, labs = [], []
    for i in range(n):
        c = int(rng.integers(0, classes))
        lo = c * (vocab // classes)
        toks = [
            f"w{rng.integers(lo, lo + vocab // 2) % vocab}"
            for _ in range(int(rng.integers(2, 60)))
        ]
        texts.append(" ".join(toks))
        labs.append(f"s{c}")
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "source": labs,
        }
    )


def _ds(df, nblocks=7):
    import ray.data

    return ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(nblocks)


class TestBigramLM:
    def _ref(self, df):
        uni, big = Counter(), Counter()
        toks = {r.doc_id: tokenize(r.text) for r in df.itertuples()}
        for ts in toks.values():
            uni.update(ts)
            big.update(zip(ts, ts[1:]))
        V = len(uni)
        rows = []
        for did, ts in toks.items():
            pairs = list(zip(ts, ts[1:]))
            if not pairs:
                continue
            h = -np.mean(
                [np.log((big[p] + 1.0) / (uni[p[0]] + float(V))) for p in pairs]
            )
            rows.append((did, len(pairs), round(float(h), 6)))
        return pd.DataFrame(
            rows, columns=["doc_id", "n_bigrams", "cross_entropy_r"]
        ).sort_values("doc_id").reset_index(drop=True)

    def test_matches_reference(self):
        from mini_ivf_ray.pipelines.lm import lm_cross_entropy

        df = _docs()
        got = (
            lm_cross_entropy(_ds(df))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ref = self._ref(df)
        pd.testing.assert_frame_equal(got, ref)

    def test_blocking_independent(self):
        from mini_ivf_ray.pipelines.lm import lm_cross_entropy, train_bigram_counts

        df = _docs(120, seed=3)
        m1 = train_bigram_counts(_ds(df, nblocks=1))
        m9 = train_bigram_counts(_ds(df, nblocks=9))
        assert np.array_equal(m1.vocab_s, m9.vocab_s)
        assert np.array_equal(m1.uni_c, m9.uni_c)
        assert np.array_equal(m1.big_keys, m9.big_keys)
        assert np.array_equal(m1.big_c, m9.big_c)
        a = lm_cross_entropy(_ds(df, 1), m1).to_pandas().sort_values("doc_id")
        b = lm_cross_entropy(_ds(df, 9), m9).to_pandas().sort_values("doc_id")
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )

    def test_short_docs_excluded(self):
        from mini_ivf_ray.pipelines.lm import lm_cross_entropy

        df = pd.DataFrame(
            {
                "doc_id": np.arange(3, dtype=np.int64),
                "text": ["one", "", "two words here"],
            }
        )
        got = lm_cross_entropy(_ds(df, 2)).to_pandas()
        assert set(got["doc_id"]) == {2}


class TestTfidfKeywords:
    def test_matches_reference(self):
        from mini_ivf_ray.pipelines.lm import tfidf_keywords

        df = _docs(200, seed=7)
        got = (
            tfidf_keywords(_ds(df), k=3)
            .to_pandas()
            .sort_values(["doc_id", "rank"])
            .reset_index(drop=True)
        )
        # reference: pandas tf-idf
        rows = []
        toks = {r.doc_id: tokenize(r.text) for r in df.itertuples()}
        dfc = Counter()
        for ts in toks.values():
            dfc.update(set(ts))
        n = float(len(df))
        for did, ts in toks.items():
            tf = Counter(ts)
            scored = sorted(
                ((t, c * np.log(n / dfc[t])) for t, c in tf.items()),
                key=lambda x: (-x[1], x[0]),
            )[:3]
            for r, (t, s) in enumerate(scored, 1):
                rows.append((did, r, t, round(float(s), 6)))
        ref = pd.DataFrame(rows, columns=["doc_id", "rank", "term", "tfidf_r"])
        pd.testing.assert_frame_equal(got, ref)

    def test_rank_is_deterministic_on_ties(self):
        from mini_ivf_ray.pipelines.lm import tfidf_keywords

        # every doc = two equal-score terms -> tie broken term-asc
        df = pd.DataFrame(
            {
                "doc_id": np.arange(4, dtype=np.int64),
                "text": ["zz aa", "bb yy", "cc xx", "dd ww"],
            }
        )
        got = (
            tfidf_keywords(_ds(df, 2), k=2)
            .to_pandas()
            .sort_values(["doc_id", "rank"])
        )
        first = got[got["rank"] == 1].sort_values("doc_id")["term"].tolist()
        assert first == ["aa", "bb", "cc", "dd"]


class TestNaiveBayes:
    def _ref(self, df):
        toks = {r.doc_id: tokenize(r.text) for r in df.itertuples()}
        classes = sorted(df["source"].unique())
        vocab = sorted({t for ts in toks.values() for t in ts})
        vix = {w: i for i, w in enumerate(vocab)}
        cix = {c: i for i, c in enumerate(classes)}
        ct = np.zeros((len(vocab), len(classes)))
        cd = np.zeros(len(classes))
        for r in df.itertuples():
            cd[cix[r.source]] += 1
            for t in toks[r.doc_id]:
                ct[vix[t], cix[r.source]] += 1
        tot = ct.sum(axis=0)
        logp = np.log((ct + 1.0) / (tot + float(len(vocab))))
        prior = np.log(cd / cd.sum())
        preds = []
        for r in df.itertuples():
            s = prior.copy()
            for t in toks[r.doc_id]:
                s += logp[vix[t]]
            preds.append((r.doc_id, classes[int(np.argmax(s))]))
        return pd.DataFrame(preds, columns=["doc_id", "pred"])

    def test_matches_reference(self):
        from mini_ivf_ray.pipelines.lm import nb_classify

        df = _docs(250, seed=19)
        got = (
            nb_classify(_ds(df))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ref = self._ref(df).sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref)
        # the skewed generator gives NB real signal: well above chance
        acc = (got["pred"].to_numpy() == df["source"].to_numpy()).mean()
        assert acc > 0.5

    def test_blocking_independent(self):
        from mini_ivf_ray.pipelines.lm import nb_classify, nb_train

        df = _docs(150, seed=23)
        m1, m9 = nb_train(_ds(df, 1)), nb_train(_ds(df, 9))
        assert m1.classes == m9.classes
        assert np.array_equal(m1.vocab_s, m9.vocab_s)
        assert np.allclose(m1.logp, m9.logp)
        a = nb_classify(_ds(df, 1), m1).to_pandas().sort_values("doc_id")
        b = nb_classify(_ds(df, 9), m9).to_pandas().sort_values("doc_id")
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )

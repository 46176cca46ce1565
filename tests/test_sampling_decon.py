"""stable_split (deterministic salted-hash splits) and decontaminate
(eval-set w-gram overlap scan)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
            }
        )
    )


class TestStableSplit:
    def test_matches_reference_md5(self):
        from mini_ivf_ray.pipelines.sampling import split_bucket

        ids = np.array([0, 1, 42, 10**12, 7], dtype=np.int64)
        got = split_bucket(ids, "v1")
        want = [
            int(hashlib.md5(f"{i}:v1".encode()).hexdigest()[:15], 16) % 1000
            for i in ids
        ]
        assert got.tolist() == want

    def test_deterministic_and_order_independent(self):
        """Same doc -> same split regardless of row order / blocking."""
        from mini_ivf_ray.pipelines.sampling import stable_split

        rows = [(i, f"doc {i}") for i in range(2000)]
        a = stable_split(_docs_ds(rows)).to_pandas()
        b = (
            stable_split(_docs_ds(rows[::-1]).repartition(7))
            .to_pandas()
        )
        a = a.sort_values("doc_id").reset_index(drop=True)
        b = b.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_proportions_and_salt_versioning(self):
        from mini_ivf_ray.pipelines.sampling import stable_split

        rows = [(i, "x") for i in range(20000)]
        df = stable_split(_docs_ds(rows), salt="v1").to_pandas()
        frac_train = (df["split"] == "train").mean()
        # binomial(20000, .98): ±5 sigma ≈ ±0.005
        assert abs(frac_train - 0.98) < 0.01
        assert set(df["split"].unique()) == {"train", "val", "test"}
        df2 = stable_split(_docs_ds(rows), salt="v2").to_pandas()
        merged = df.merge(df2, on="doc_id", suffixes=("_1", "_2"))
        # a new salt is a genuinely different assignment
        assert (merged["bucket_1"] != merged["bucket_2"]).mean() > 0.9


class TestDecontaminate:
    W = 5

    def test_planted_overlap(self):
        from mini_ivf_ray.pipelines.dedup import decontaminate

        leak = "alpha bravo charlie delta echo"  # exactly W tokens
        rows = [
            (0, f"clean words only here none shared {i}") for i in range(20)
        ]
        rows += [(100, f"prefix stuff {leak} suffix tail")]  # 1 shared gram
        rows += [(101, f"{leak} and again {leak}")]  # dup gram counted once
        rows += [(102, "alpha bravo charlie delta foxtrot")]  # near miss
        ds = _docs_ds(rows)
        out = (
            decontaminate(ds, [f"intro {leak} outro"], w=self.W)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [100, 101]
        assert out["n_shared"].tolist() == [1, 1]

    def test_exclude_and_short_docs(self):
        from mini_ivf_ray.pipelines.dedup import decontaminate

        leak = "one two three four five"
        rows = [(1, leak), (2, leak), (3, "one two")]  # 3: shorter than w
        out = decontaminate(
            _docs_ds(rows), [leak], w=self.W, exclude_ids=[1]
        ).to_pandas()
        assert out["doc_id"].tolist() == [2]

    def test_distinct_gram_count(self):
        from mini_ivf_ray.pipelines.dedup import decontaminate

        ev = "a b c d e f"  # two 5-grams: abcde, bcdef
        rows = [(10, "z z a b c d e f z z")]  # contains both
        out = decontaminate(_docs_ds(rows), [ev], w=self.W).to_pandas()
        assert out["n_shared"].tolist() == [2]

    def test_empty_eval(self):
        from mini_ivf_ray.pipelines.dedup import decontaminate

        out = decontaminate(
            _docs_ds([(1, "some text here")]), [], w=self.W
        ).to_pandas()
        assert len(out) == 0


class TestGroupedHead:
    def _ds(self, df, nblocks=9):
        import ray.data

        return ray.data.from_arrow(
            pa.Table.from_pandas(df, preserve_index=False)
        ).repartition(nblocks)

    def test_cap_per_group_exact_vs_pandas(self):
        from mini_ivf_ray.pipelines.sampling import cap_per_group

        rng = np.random.default_rng(3)
        # skewed: one mega-source with 5000 docs, a tail of tiny ones
        src = np.concatenate(
            [np.zeros(5000, np.int64), rng.integers(1, 200, 2000)]
        )
        df = pd.DataFrame(
            {"doc_id": rng.permutation(len(src)).astype(np.int64),
             "source": [f"s{s}" for s in src]}
        )
        got = (
            cap_per_group(self._ds(df), "source", k=7)
            .to_pandas()
            .sort_values(["source", "doc_id"])
            .reset_index(drop=True)
        )
        want = (
            df.sort_values(["source", "doc_id"], kind="mergesort")
            .groupby("source", sort=True)
            .head(7)
            .sort_values(["source", "doc_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["doc_id", "source"]], want)

    def test_stratified_sample_deterministic(self):
        from mini_ivf_ray.pipelines.sampling import salt_hash60, stratified_sample

        df = pd.DataFrame(
            {"doc_id": np.arange(3000, dtype=np.int64),
             "lang": [f"l{i % 4}" for i in range(3000)]}
        )
        got = (
            stratified_sample(self._ds(df), "lang", n=11, salt="s9")
            .to_pandas()
            .sort_values(["lang", "doc_id"])
            .reset_index(drop=True)
        )
        ref = df.assign(_h=salt_hash60(df["doc_id"].to_numpy(), "s9"))
        want = (
            ref.sort_values(["lang", "_h", "doc_id"], kind="mergesort")
            .groupby("lang", sort=True)
            .head(11)
            .drop(columns="_h")
            .sort_values(["lang", "doc_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["doc_id", "lang"]], want[["doc_id", "lang"]])
        # independent of blocking
        got2 = (
            stratified_sample(self._ds(df.iloc[::-1], nblocks=3), "lang", n=11, salt="s9")
            .to_pandas()
            .sort_values(["lang", "doc_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["doc_id", "lang"]], got2[["doc_id", "lang"]])

    def test_group_smaller_than_k(self):
        from mini_ivf_ray.pipelines.sampling import cap_per_group

        df = pd.DataFrame(
            {"doc_id": np.arange(5, dtype=np.int64), "source": ["a"] * 3 + ["b"] * 2}
        )
        got = cap_per_group(self._ds(df, nblocks=2), "source", k=100).to_pandas()
        assert len(got) == 5


class TestWeightedMix:
    def test_exact_repeats(self):
        from mini_ivf_ray.pipelines.sampling import salt_hash60, weighted_mix

        import ray.data

        n = 4000
        df = pd.DataFrame(
            {"doc_id": np.arange(n, dtype=np.int64),
             "source": [f"s{i % 4}" for i in range(n)]}
        )
        w = {"s0": 3000, "s1": 1500, "s2": 0}  # s3 -> default 1000
        ds = ray.data.from_arrow(
            pa.Table.from_pandas(df, preserve_index=False)
        ).repartition(5)
        out = weighted_mix(ds, w, salt="m:t").to_pandas()
        pm = df["source"].map(lambda s: w.get(s, 1000)).to_numpy(np.int64)
        rep = pm // 1000 + (
            salt_hash60(df["doc_id"].to_numpy(), "m:t") % 1000 < pm % 1000
        )
        got = out.groupby("doc_id").size()
        want = pd.Series(rep, index=df["doc_id"])
        want = want[want > 0]
        assert got.sort_index().equals(want.sort_index())
        # copy index is 1..rep for every doc
        mx = out.groupby("doc_id")["copy"].agg(["min", "max", "count"])
        assert (mx["min"] == 1).all() and (mx["max"] == mx["count"]).all()
        # s1 at 1500pm lands near 1.5x, s2 is gone
        bysrc = out.groupby("source").size()
        assert "s2" not in bysrc.index
        assert abs(bysrc["s1"] / 1000 - 1.5) < 0.1


class TestTokenBudget:
    def _mk(self, n, seed=5):
        rng = np.random.default_rng(seed)
        texts = [
            " ".join(f"w{rng.integers(0, 50)}" for _ in range(rng.integers(1, 40)))
            for _ in range(n)
        ]
        return pd.DataFrame(
            {"doc_id": np.arange(n, dtype=np.int64), "text": texts}
        )

    def _ref(self, df, budget, salt="tb:v1"):
        from mini_ivf_ray.functions.tokenize import tokenize_batch
        from mini_ivf_ray.pipelines.sampling import salt_hash60

        _, dls = tokenize_batch(df["text"].tolist())
        r = pd.DataFrame(
            {"doc_id": df["doc_id"], "dl": dls,
             "h": salt_hash60(df["doc_id"].to_numpy(), salt)}
        ).sort_values(["h", "doc_id"], kind="mergesort")
        r = r[r["dl"].cumsum() <= budget]
        return r[["doc_id", "dl"]].sort_values("doc_id").reset_index(drop=True)

    def test_matches_reference(self):
        import ray.data

        from mini_ivf_ray.pipelines.sampling import token_budget_head

        df = self._mk(2500)
        ds = ray.data.from_arrow(
            pa.Table.from_pandas(df, preserve_index=False)
        ).repartition(8)
        for budget in (0, 500, 20000, 10**9):
            got = token_budget_head(ds, budget, num_ranges=64).to_pandas()
            if got.empty:
                # Ray 2.49 to_pandas() drops the schema when every
                # block is empty; rebuild it for the comparison.
                got = pd.DataFrame(
                    {"doc_id": pd.Series(dtype=np.int64),
                     "dl": pd.Series(dtype=np.int64)}
                )
            got = got.sort_values("doc_id").reset_index(drop=True)
            pd.testing.assert_frame_equal(got, self._ref(df, budget))


class TestPackSequences:
    def _reference(self, ids, texts, budget):
        from mini_ivf_ray.functions.tokenize import tokenize

        order = np.argsort(ids, kind="stable")
        dl = np.array([len(tokenize(texts[i])) for i in order], dtype=np.int64)
        before = np.cumsum(dl) - dl
        return pd.DataFrame(
            {
                "doc_id": np.asarray(ids)[order],
                "dl": dl,
                "seq_id": before // budget,
                "seq_off": before % budget,
            }
        )

    def test_matches_reference_multi_range(self):
        from mini_ivf_ray.pipelines.sampling import pack_sequences

        rng = np.random.default_rng(5)
        # sparse non-contiguous ids exercise the linear-range bucketing
        ids = np.sort(rng.choice(100_000, size=300, replace=False)).astype(np.int64)
        texts = [
            " ".join(f"w{rng.integers(0, 50)}" for _ in range(int(rng.integers(0, 40))))
            for _ in ids
        ]
        got = (
            pack_sequences(_docs_ds(list(zip(ids.tolist(), texts))), budget=64,
                           num_ranges=7)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = self._reference(ids.tolist(), texts, 64).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_straddling_doc(self):
        from mini_ivf_ray.pipelines.sampling import pack_sequences

        rows = [(1, "a b c d e"), (2, "f g"), (3, "h")]
        got = (
            pack_sequences(_docs_ds(rows), budget=4, num_ranges=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # doc 1 fills seq0 and straddles into seq1; doc 2 starts at
        # (1, 1); doc 3 at (1, 3)
        assert got["seq_id"].tolist() == [0, 1, 1]
        assert got["seq_off"].tolist() == [0, 1, 3]


def test_chunk_documents_rules():
    import pyarrow as pa

    import ray.data as ray_data

    from mini_ivf_ray.pipelines.sampling import chunk_documents

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": [
                " ".join(f"w{i}" for i in range(10)),   # 1 chunk
                " ".join(f"w{i}" for i in range(100)),  # 3 chunks (64/16)
                "",                                      # empty: 1 empty chunk
            ],
        }
    )
    out = (
        chunk_documents(ray_data.from_arrow(docs), chunk_tokens=64, overlap=16)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    assert list(out[out.doc_id == 1]["n_tokens"]) == [10]
    g2 = out[out.doc_id == 2]
    # chunks cover [0,64) and [48,100) — 1 + ceil((100-64)/48) = 2,
    # every token covered, 16-token overlap between the two
    assert list(g2["n_tokens"]) == [64, 52]
    toks2 = g2["chunk"].tolist()
    assert toks2[0].split()[0] == "w0" and toks2[1].split()[0] == "w48"
    # consecutive chunks share exactly the overlap suffix/prefix
    assert toks2[0].split()[-16:] == toks2[1].split()[:16]
    g3 = out[out.doc_id == 3]
    assert list(g3["n_tokens"]) == [0] and g3["chunk"].iloc[0] == ""
    # blocking independence
    out2 = (
        chunk_documents(
            ray_data.from_arrow(docs).repartition(3), chunk_tokens=64, overlap=16
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(out, out2)

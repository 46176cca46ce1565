"""Pivot / rollup (pipelines/olap.py) and collocations (pipelines/lm.py)
vs driver-side ground truth."""

import numpy as np
import pandas as pd

import ray.data
from mini_ivf_ray.pipelines.olap import cube_agg, pivot_counts, rollup_agg


def test_pivot_counts_matches_crosstab():
    rng = np.random.default_rng(4)
    n = 5000
    vals = ["a", "b", "c"]
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 80, n),
            "kind": rng.choice(vals + ["weird", "other2"], n),
        }
    )
    got = (
        pivot_counts(ray.data.from_pandas(df), "user_id", "kind", vals, num_buckets=8)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ct = pd.crosstab(df["user_id"], df["kind"])
    for v in vals:
        np.testing.assert_array_equal(
            got[f"n_{v}"].to_numpy(), ct[v].to_numpy(), err_msg=v
        )
    np.testing.assert_array_equal(
        got["n_other"].to_numpy(), (ct["weird"] + ct["other2"]).to_numpy()
    )
    assert got["user_id"].is_unique and len(got) == df["user_id"].nunique()


def test_rollup_matches_pandas():
    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame(
        {
            "p": rng.choice(["hi", "lo", "med"], n),
            "s": rng.choice(["X", "Y"], n),
            "v": rng.normal(100, 30, n),
        }
    )
    got = rollup_agg(
        ray.data.from_pandas(df),
        ("p", "s"),
        count_as="n",
        floor_sum_col="v",
        floor_sum_as="sv",
    )
    vf = np.floor(df["v"]).astype(np.int64)
    base = df.assign(vf=vf).groupby(["p", "s"]).agg(n=("vf", "size"), sv=("vf", "sum"))
    for (p, s), row in base.iterrows():
        cell = got[(got["p"] == p) & (got["s"] == s)]
        assert len(cell) == 1
        assert int(cell["n"].iloc[0]) == row["n"] and int(cell["sv"].iloc[0]) == row["sv"]
    lvl1 = df.assign(vf=vf).groupby("p").agg(n=("vf", "size"), sv=("vf", "sum"))
    for p, row in lvl1.iterrows():
        cell = got[(got["p"] == p) & (got["s"].isna())]
        assert len(cell) == 1 and int(cell["n"].iloc[0]) == row["n"]
        assert int(cell["sv"].iloc[0]) == row["sv"]
    total = got[got["p"].isna() & got["s"].isna()]
    assert len(total) == 1 and int(total["n"].iloc[0]) == n
    assert int(total["sv"].iloc[0]) == int(vf.sum())
    assert len(got) == len(base) + len(lvl1) + 1


def test_cube_matches_pandas():
    rng = np.random.default_rng(6)
    n = 3000
    df = pd.DataFrame(
        {
            "p": rng.choice(["hi", "lo", "med"], n),
            "s": rng.choice(["X", "Y"], n),
            "v": rng.normal(100, 30, n),
        }
    )
    got = cube_agg(
        ray.data.from_pandas(df),
        ("p", "s"),
        count_as="n",
        floor_sum_col="v",
        floor_sum_as="sv",
    )
    vf = np.floor(df["v"]).astype(np.int64)
    base = df.assign(vf=vf).groupby(["p", "s"]).agg(n=("vf", "size"), sv=("vf", "sum"))
    lvl_p = df.assign(vf=vf).groupby("p").agg(n=("vf", "size"), sv=("vf", "sum"))
    lvl_s = df.assign(vf=vf).groupby("s").agg(n=("vf", "size"), sv=("vf", "sum"))
    # the rollup levels are delegated to rollup_agg (tested above); here
    # check the cube-only (NULL, s) level, the grand total, and the count
    for s, row in lvl_s.iterrows():
        cell = got[got["p"].isna() & (got["s"] == s)]
        assert len(cell) == 1 and int(cell["n"].iloc[0]) == row["n"]
        assert int(cell["sv"].iloc[0]) == row["sv"]
    total = got[got["p"].isna() & got["s"].isna()]
    assert len(total) == 1 and int(total["n"].iloc[0]) == n
    assert int(total["sv"].iloc[0]) == int(vf.sum())
    assert len(got) == len(base) + len(lvl_p) + len(lvl_s) + 1


def test_collocations_match_counter():
    from collections import Counter

    from mini_ivf_ray.pipelines.lm import collocations

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6),
            "text": [
                "new york is a big city",
                "New York and new jersey",
                "the big apple is new york",
                "big city big dreams",
                "a城市 new york!",
                "",
            ],
        }
    )
    got = collocations(ray.data.from_pandas(docs), top_n=10, min_count=2)
    import re

    uni: Counter = Counter()
    big: Counter = Counter()
    for t in docs["text"]:
        toks = re.findall("[a-z0-9]+", t.lower())
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    assert ("new", "york") in set(zip(got["w1"], got["w2"]))
    for _, r in got.iterrows():
        assert r["n_pair"] == big[(r["w1"], r["w2"])]
        assert r["n_w1"] == uni[r["w1"]] and r["n_w2"] == uni[r["w2"]]
    # ranking: n_pair DESC then lexicographic
    np_ = got["n_pair"].to_numpy()
    assert (np_[:-1] >= np_[1:]).all()
    assert (got["n_pair"] >= 2).all()

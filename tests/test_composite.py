"""Composite aggregation: page == full-groupby slice exactly, walking
pages reconstructs the whole aggregation, partitioning invariance,
end-of-stream empty page, contracts."""

import numpy as np
import pandas as pd
import pytest

import ray.data
from mini_ivf_ray.pipelines.composite import composite_page

KEYS = ["lang", "source"]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(17)
    n = 600
    df = pd.DataFrame(
        {
            "lang": rng.choice(["de", "en", "fr", "zz"], n),
            "source": rng.choice([f"s{i:02d}" for i in range(12)], n),
            "n_chars": rng.integers(10, 500, n).astype(np.int64),
        }
    )
    return df


def _truth(df, after, page_size):
    g = (
        df.groupby(KEYS, as_index=False)
        .agg(doc_count=("lang", "size"), sum_n_chars=("n_chars", "sum"))
        .sort_values(KEYS, kind="mergesort")
        .reset_index(drop=True)
    )
    if after is not None:
        keyed = list(zip(g["lang"], g["source"]))
        g = g[[k > after for k in keyed]]
    return g.head(page_size).reset_index(drop=True)


def test_page_matches_groupby_slice(corpus):
    ds = ray.data.from_pandas(corpus).repartition(7)
    for after in (None, ("de", "s05"), ("en", "s00"), ("fr", "s11")):
        got = composite_page(
            ds, KEYS, page_size=9, after=after, sum_cols=["n_chars"]
        ).to_pandas()
        want = _truth(corpus, after, 9)
        pd.testing.assert_frame_equal(
            got.astype({"doc_count": np.int64, "sum_n_chars": np.int64}),
            want.astype({"doc_count": np.int64, "sum_n_chars": np.int64}),
        )


def test_walking_pages_reconstructs_full_aggregation(corpus):
    ds = ray.data.from_pandas(corpus).repartition(5)
    pages, after = [], None
    while True:
        p = composite_page(
            ds, KEYS, page_size=7, after=after, sum_cols=["n_chars"]
        ).to_pandas()
        if not len(p):
            break
        pages.append(p)
        after = (p["lang"].iloc[-1], p["source"].iloc[-1])
    got = pd.concat(pages, ignore_index=True)
    want = _truth(corpus, None, 10**9)
    pd.testing.assert_frame_equal(
        got.astype(want.dtypes.to_dict()), want
    )
    # every page but the last is exactly full
    assert all(len(p) == 7 for p in pages[:-1])


def test_partitioning_invariance(corpus):
    a = composite_page(
        ray.data.from_pandas(corpus).repartition(2),
        KEYS, page_size=11, after=("de", "s03"), sum_cols=["n_chars"],
    ).to_pandas()
    b = composite_page(
        ray.data.from_pandas(corpus).repartition(13),
        KEYS, page_size=11, after=("de", "s03"), sum_cols=["n_chars"],
    ).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_end_of_stream_and_contracts(corpus):
    ds = ray.data.from_pandas(corpus)
    p = composite_page(
        ds, KEYS, page_size=5, after=("zz", "s99"), sum_cols=["n_chars"]
    )
    assert p.num_rows == 0
    assert p.schema.names == ["lang", "source", "doc_count", "sum_n_chars"]
    with pytest.raises(ValueError, match="page_size"):
        composite_page(ds, KEYS, page_size=0)
    with pytest.raises(ValueError, match="after"):
        composite_page(ds, KEYS, page_size=5, after=("en",))

"""Exact float quantiles (pipelines/quantiles.py) vs driver-side sort."""

import numpy as np
import pandas as pd

import ray.data
from mini_ivf_ray.pipelines.quantiles import exact_quantiles, exact_quantiles_local

FRACS = (0.01, 0.25, 0.5, 0.75, 0.9, 0.99)


def _check(vals, **kw):
    ds = ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(8)
    got = exact_quantiles(ds, "x", fractions=FRACS, **kw).to_pandas()
    exp = exact_quantiles_local(vals, FRACS)
    np.testing.assert_array_equal(got["rank"].to_numpy(), exp["rank"].to_numpy())
    np.testing.assert_array_equal(got["value"].to_numpy(), exp["value"].to_numpy())


def test_multi_pass_matches_sort():
    rng = np.random.default_rng(9)
    vals = np.concatenate(
        [
            rng.normal(100, 25, 120_000),
            rng.exponential(5, 40_000),
            np.full(20_000, 42.0),  # heavy duplicate mass
        ]
    )
    # tiny threshold + few bins force >= 2 histogram passes
    _check(vals, bins=32, fetch_threshold=1_000)


def test_single_fetch_small_input():
    rng = np.random.default_rng(10)
    _check(rng.uniform(-5, 5, 3_000), bins=64, fetch_threshold=100_000)


def test_constant_and_nan_columns():
    ds = ray.data.from_pandas(
        pd.DataFrame({"x": np.r_[np.full(5_000, 7.5), np.full(100, np.nan)]})
    )
    got = exact_quantiles(ds, "x", fractions=(0.5, 0.99)).to_pandas()
    assert (got["value"] == 7.5).all()  # NaNs ignored, constant exact
    assert (got["rank"] == [2500, 4950]).all()


def test_empty_input():
    ds = ray.data.from_pandas(pd.DataFrame({"x": np.array([], dtype=np.float64)}))
    got = exact_quantiles(ds, "x", fractions=(0.5,)).to_pandas()
    assert len(got) == 1 and got["value"].isna().all()

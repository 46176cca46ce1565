"""Date-histogram pipeline aggregations: local pandas replay identity
(densified gaps, derivative NULL head, trailing moving mean), gap
densification non-vacuity, partitioning invariance, contracts."""

import numpy as np
import pandas as pd
import pytest

import ray.data
from mini_ivf_ray.pipelines.pipelineagg import date_histogram_pipeline

W = 3600


@pytest.fixture(scope="module")
def events():
    rng = np.random.default_rng(23)
    n = 400
    # hours 0..11 with hours 4 and 7 deliberately EMPTY for type 'a'
    hours = rng.choice([0, 1, 2, 3, 5, 6, 8, 9, 10, 11], n)
    types = rng.choice(["a", "b"], n)
    offs = rng.integers(0, 3600, n)
    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts = base + (hours * 3600 + offs).astype("timedelta64[s]").astype(
        "timedelta64[us]"
    )
    return pd.DataFrame(
        {
            "ts": ts,
            "event_type": types,
            "value": np.round(rng.uniform(0, 10, n), 2),
        }
    )


def _truth(df, w, mw):
    df = df.copy()
    df["window_start"] = (
        df["ts"].astype("datetime64[s]").astype(np.int64) // w * w
    )
    rows = []
    for et, g in df.groupby("event_type"):
        b = (
            g.groupby("window_start")
            .agg(n=("value", "size"), sv=("value", "sum"))
            .reset_index()
            .sort_values("window_start")
        )
        full = pd.DataFrame(
            {
                "window_start": np.arange(
                    b["window_start"].min(),
                    b["window_start"].max() + 1,
                    w,
                    dtype=np.int64,
                )
            }
        )
        b = full.merge(b, on="window_start", how="left").fillna(
            {"n": 0, "sv": 0.0}
        )
        b["event_type"] = et
        b["deriv"] = b["sv"].diff()
        b["cum_n"] = b["n"].cumsum()
        b["mavg"] = b["sv"].rolling(mw, min_periods=1).mean()
        rows.append(b)
    out = pd.concat(rows, ignore_index=True)
    return out


def test_matches_pandas_replay(events):
    ds = ray.data.from_pandas(events).repartition(6)
    got = date_histogram_pipeline(ds, W, moving_window=3).to_pandas()
    want = _truth(events, W, 3)
    got = got.sort_values(["event_type", "window_start"]).reset_index(drop=True)
    want = want.sort_values(["event_type", "window_start"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert list(got["event_type"]) == list(want["event_type"])
    assert np.array_equal(
        got["window_start"].to_numpy(), want["window_start"].to_numpy()
    )
    assert np.array_equal(got["n"].to_numpy(), want["n"].to_numpy())
    assert np.array_equal(got["cum_n"].to_numpy(), want["cum_n"].to_numpy())
    assert np.allclose(got["sv_r"], want["sv"], atol=1e-4)
    assert np.allclose(
        got["deriv_r"], want["deriv"], atol=1e-4, equal_nan=True
    )
    assert np.allclose(got["mavg_r"], want["mavg"], atol=1e-4)


def test_gaps_are_densified_and_derivative_head_is_null(events):
    ds = ray.data.from_pandas(events)
    got = date_histogram_pipeline(ds, W, moving_window=3).to_pandas()
    a = got[got["event_type"] == "a"].sort_values("window_start")
    # the two planted empty hours exist as zero buckets
    zeros = a[a["n"] == 0]
    assert len(zeros) == 2
    assert set(zeros["sv_r"]) == {0.0}
    # a zero bucket's derivative is -sv(prev), non-trivially negative
    prev = a.shift(1)
    z = a["n"] == 0
    assert np.allclose(
        a.loc[z, "deriv_r"], -prev.loc[z, "sv_r"], atol=1e-4
    )
    # first bucket of each series: NULL derivative
    for et, g in got.groupby("event_type"):
        g = g.sort_values("window_start")
        assert np.isnan(g["deriv_r"].iloc[0])
        assert not np.isnan(g["deriv_r"].iloc[1:]).any()


def test_partitioning_invariance(events):
    a = date_histogram_pipeline(
        ray.data.from_pandas(events).repartition(2), W, 3
    ).to_pandas()
    b = date_histogram_pipeline(
        ray.data.from_pandas(events).repartition(11), W, 3
    ).to_pandas()
    a = a.sort_values(["event_type", "window_start"]).reset_index(drop=True)
    b = b.sort_values(["event_type", "window_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_contracts(events):
    ds = ray.data.from_pandas(events)
    with pytest.raises(ValueError, match="moving_window"):
        date_histogram_pipeline(ds, W, moving_window=0)
    with pytest.raises(ValueError, match="window_sec"):
        date_histogram_pipeline(ds, 0)


# bucket_pipeline_extras: serial_diff / bucket_script / selector / sort


def _truth_extras(df, w, lag, min_count, size):
    df = df.copy()
    df["window_start"] = (
        df["ts"].astype("datetime64[s]").astype(np.int64) // w * w
    )
    rows = []
    for et, g in df.groupby("event_type"):
        b = (
            g.groupby("window_start")
            .agg(n=("value", "size"), sv=("value", "sum"))
            .reset_index()
            .sort_values("window_start")
        )
        full = pd.DataFrame(
            {
                "window_start": np.arange(
                    b["window_start"].min(),
                    b["window_start"].max() + 1,
                    w,
                    dtype=np.int64,
                )
            }
        )
        b = full.merge(b, on="window_start", how="left").fillna(
            {"n": 0, "sv": 0.0}
        )
        b["event_type"] = et
        b["sdiff"] = b["sv"] - b["sv"].shift(lag)
        b["ratio"] = np.where(b["n"] > 0, b["sv"] / b["n"].clip(lower=1), np.nan)
        b = b[b["n"] >= min_count].copy()
        b["_key"] = np.round(b["sv"], 4)
        b = b.sort_values(
            ["_key", "window_start"], ascending=[False, True]
        ).head(size)
        b["rank"] = np.arange(1, len(b) + 1)
        rows.append(b.drop(columns="_key"))
    return pd.concat(rows, ignore_index=True)


def test_extras_matches_pandas_replay(events):
    from mini_ivf_ray.pipelines.pipelineagg import bucket_pipeline_extras

    ds = ray.data.from_pandas(events)
    got = (
        bucket_pipeline_extras(ds, W, lag=2, min_count=2, size=5)
        .to_pandas()
        .sort_values(["event_type", "rank"])
        .reset_index(drop=True)
    )
    want = _truth_extras(events, W, 2, 2, 5).sort_values(
        ["event_type", "rank"]
    ).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert got["window_start"].tolist() == want["window_start"].tolist()
    assert got["n"].tolist() == want["n"].astype(int).tolist()
    assert np.allclose(got["sv_r"], np.round(want["sv"], 4))
    assert np.allclose(
        got["sdiff_r"], np.round(want["sdiff"], 4), equal_nan=True
    )
    assert np.allclose(got["ratio_r"], np.round(want["ratio"], 4))
    assert got["rank"].tolist() == want["rank"].tolist()


def test_extras_declaration_order_contract(events):
    """The lag operand must see the FULL densified series: type 'a'
    has empty hours (n=0, dropped by the selector) whose sv=0 still
    feeds neighbours' sdiff — a post-selector lag would differ."""
    from mini_ivf_ray.pipelines.pipelineagg import bucket_pipeline_extras

    ds = ray.data.from_pandas(events)
    got = bucket_pipeline_extras(ds, W, lag=2, min_count=2, size=12).to_pandas()
    a = got[got["event_type"] == "a"].set_index("window_start")
    base = int(
        events["ts"].astype("datetime64[s]").astype(np.int64).min() // W * W
    )
    # hour 5's lag-2 operand is the EMPTY hour 3... hours 4 is empty:
    # hour 6's lag-2 operand is hour 4 (sv == 0), so sdiff == sv(h6)
    h6 = base + 6 * W
    if h6 in a.index:
        assert a.loc[h6, "sdiff_r"] == a.loc[h6, "sv_r"]
    # selector really dropped the empty buckets
    assert (got["n"] >= 2).all()


def test_extras_contracts(events):
    from mini_ivf_ray.pipelines.pipelineagg import bucket_pipeline_extras

    ds = ray.data.from_pandas(events)
    for kw, msg in (
        ({"lag": 0}, "lag"),
        ({"min_count": -1}, "min_count"),
        ({"size": 0}, "size"),
        ({"window_sec": 0}, "window_sec"),
    ):
        with pytest.raises(ValueError, match=msg):
            bucket_pipeline_extras(ds, **{"window_sec": W, **kw})


def _dense_cents(df, w):
    """Pandas replay of the densified integer-cents bucket series."""
    df = df.copy()
    df["window_start"] = (
        df["ts"].astype("datetime64[s]").astype(np.int64) // w * w
    )
    out = {}
    for et, g in df.groupby("event_type"):
        b = (
            g.groupby("window_start")
            .agg(n=("value", "size"), sv=("value", "sum"))
            .reset_index()
            .sort_values("window_start")
        )
        full = pd.DataFrame(
            {
                "window_start": np.arange(
                    b["window_start"].min(),
                    b["window_start"].max() + 1,
                    w,
                    dtype=np.int64,
                )
            }
        )
        b = full.merge(b, on="window_start", how="left").fillna(
            {"n": 0, "sv": 0.0}
        )
        cents = np.round(b["sv"].to_numpy() * 100.0).astype(np.int64)
        out[et] = (b["window_start"].to_numpy(), b["n"].to_numpy().astype(np.int64), cents)
    return out


def test_sibling_stats_matches_pandas_replay(events):
    import math

    from mini_ivf_ray.pipelines.pipelineagg import bucket_sibling_stats

    got = bucket_sibling_stats(
        ray.data.from_pandas(events), W, fractions=(0.25, 0.5, 0.75)
    ).to_pandas().set_index("event_type")
    truth = _dense_cents(events, W)
    assert set(got.index) == set(truth)
    for et, (ws, n, cents) in truth.items():
        r = got.loc[et]
        nb = cents.size
        assert int(r["n_buckets"]) == nb
        assert r["sum_v"] == round(int(cents.sum()) / 100.0, 4)
        assert r["avg_v"] == round((int(cents.sum()) / 100.0) / nb, 4)
        mn, mx = int(cents.min()), int(cents.max())
        assert r["min_v"] == round(mn / 100.0, 4)
        assert r["max_v"] == round(mx / 100.0, 4)
        assert int(r["min_key"]) == int(ws[cents == mn].min())
        assert int(r["min_keys"]) == int((cents == mn).sum())
        assert int(r["max_key"]) == int(ws[cents == mx].min())
        assert int(r["max_keys"]) == int((cents == mx).sum())
        s = np.sort(cents)
        for q, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75")):
            rk = min(max(math.ceil(q * nb), 1), nb)
            assert r[col] == round(int(s[rk - 1]) / 100.0, 4), (et, col)
    # the planted gaps make the min a ZERO bucket with a tie — the
    # min_keys tie-count path is non-vacuous
    assert int(got.loc["a", "min_keys"]) >= 2
    assert got.loc["a", "min_v"] == 0.0


def test_normalize_matches_pandas_replay_and_degenerates(events):
    from mini_ivf_ray.pipelines.pipelineagg import normalize_buckets

    got = normalize_buckets(ray.data.from_pandas(events), W).to_pandas()
    truth = _dense_cents(events, W)
    for et, (ws, n, cents) in truth.items():
        g = got[got["event_type"] == et].sort_values("window_start")
        assert np.array_equal(g["window_start"].to_numpy(), ws)
        assert np.array_equal(g["n"].to_numpy(), n)
        total, mn, mx = int(cents.sum()), int(cents.min()), int(cents.max())
        exp_pct = np.round(100.0 * cents.astype(np.float64) / float(total), 4)
        exp_rs = np.round((cents - mn).astype(np.float64) / float(mx - mn), 4)
        assert np.array_equal(g["pct_r"].to_numpy(), exp_pct)
        assert np.array_equal(g["rescaled_r"].to_numpy(), exp_rs)
        # rescale bounds: exactly 0 at the min bucket, 1 at the max
        assert g["rescaled_r"].min() == 0.0 and g["rescaled_r"].max() == 1.0
    # degenerate pins: constant series -> NULL rescale; the pct of a
    # one-bucket series is exactly 100
    one = pd.DataFrame(
        {
            "ts": [np.datetime64("2024-03-01T00:10:00", "us")] * 3,
            "event_type": ["c"] * 3,
            "value": [1.0, 2.0, 3.0],
        }
    )
    g = normalize_buckets(ray.data.from_pandas(one), W).to_pandas()
    assert len(g) == 1
    assert g.loc[0, "pct_r"] == 100.0
    assert np.isnan(g.loc[0, "rescaled_r"])  # max == min: ES emits nothing
    # zero-sum series -> NULL pct
    zero = one.copy()
    zero["value"] = [1.0, -2.0, 1.0]
    g = normalize_buckets(ray.data.from_pandas(zero), W).to_pandas()
    assert np.isnan(g.loc[0, "pct_r"])


def test_sibling_contracts():
    from mini_ivf_ray.pipelines.pipelineagg import (
        bucket_sibling_stats,
        normalize_buckets,
    )

    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "ts": [np.datetime64("2024-03-01T00:10:00", "us")],
                "event_type": ["a"],
                "value": [1.0],
            }
        )
    )
    with pytest.raises(ValueError, match="window_sec"):
        bucket_sibling_stats(ds, 0)
    with pytest.raises(ValueError, match="fractions"):
        bucket_sibling_stats(ds, W, fractions=(0.0,))
    with pytest.raises(ValueError, match="window_sec"):
        normalize_buckets(ds, -1)


def test_auto_interval_choice_units():
    from mini_ivf_ray.pipelines.pipelineagg import (
        AUTO_LADDER,
        choose_auto_interval,
    )

    # 0..11 hours span, target 20 -> 1h fits (12 buckets), 30m doesn't
    lo, hi = 0, 11 * 3600
    assert choose_auto_interval(lo, hi, 20) == 3600
    assert choose_auto_interval(lo, hi, 12) == 3600
    assert choose_auto_interval(lo, hi, 11) == 10800
    # alignment matters: [59, 61] is 3 one-second buckets but only 2
    # five-second buckets (floor(59/5)=11, floor(61/5)=12)
    assert choose_auto_interval(59, 61, 3) == 1
    assert choose_auto_interval(59, 61, 2) == 5
    # a 1-bucket fit must clear the 60s boundary at 59->61: 300s is
    # the first rung putting both endpoints in one aligned bucket
    assert choose_auto_interval(59, 61, 1) == 300
    # overflow: even the top rung used when it can't fit
    assert choose_auto_interval(0, 604800 * 1000, 2) == AUTO_LADDER[-1]
    with pytest.raises(ValueError, match="target"):
        choose_auto_interval(0, 1, 0)


def test_auto_histogram_matches_pandas_replay(events):
    from mini_ivf_ray.pipelines.pipelineagg import (
        auto_date_histogram,
        choose_auto_interval,
    )

    target = 6  # forces a rung ABOVE 1h for the 12-hour fixture span
    got = auto_date_histogram(
        ray.data.from_pandas(events), target_buckets=target
    ).to_pandas()
    ep = events["ts"].astype("datetime64[s]").astype(np.int64)
    iv = choose_auto_interval(int(ep.min()), int(ep.max()), target)
    assert iv == 10800  # non-vacuous: the picker climbed the ladder
    assert (got["interval_sec"] == iv).all()
    exp = (
        events.assign(window_start=ep // iv * iv)
        .groupby(["event_type", "window_start"])
        .size()
        .reset_index(name="n")
        .sort_values(["event_type", "window_start"])
    )
    assert len(got) == len(exp) <= target * events["event_type"].nunique()
    assert np.array_equal(
        got["window_start"].to_numpy(), exp["window_start"].to_numpy()
    )
    assert np.array_equal(got["n"].to_numpy(), exp["n"].to_numpy())


def test_moving_percentiles_matches_pandas_replay(events):
    import math

    from mini_ivf_ray.pipelines.pipelineagg import (
        moving_percentiles_buckets,
    )

    mw = 3
    got = moving_percentiles_buckets(
        ray.data.from_pandas(events), W, moving_window=mw,
        fractions=(0.25, 0.5, 0.75),
    ).to_pandas()
    truth = _dense_cents(events, W)
    for et, (ws, n, cents) in truth.items():
        g = got[got["event_type"] == et].sort_values("window_start")
        assert np.array_equal(g["window_start"].to_numpy(), ws)
        for q, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75")):
            exp = []
            for i in range(cents.size):
                w = np.sort(cents[max(0, i - mw + 1): i + 1])
                r = min(max(math.ceil(q * w.size), 1), w.size)
                exp.append(round(int(w[r - 1]) / 100.0, 4))
            assert np.array_equal(
                g[col].to_numpy(), np.array(exp)
            ), (et, col)
        # head-of-series degeneracy: a 1-bucket window's every
        # percentile IS that bucket's metric
        first = round(int(cents[0]) / 100.0, 4)
        assert g.iloc[0][["p25", "p50", "p75"]].tolist() == [first] * 3
    with pytest.raises(ValueError, match="moving_window"):
        moving_percentiles_buckets(ray.data.from_pandas(events), W, 0)

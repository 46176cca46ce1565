"""Join patterns vs pandas ground truth."""

import numpy as np
import pandas as pd

import ray.data
from mini_ivf_ray.pipelines.relational import broadcast_join, bucketed_hash_join


def _sides(seed=7, n_left=500, n_right=1500):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": np.arange(n_left),
            "lv": rng.integers(0, 100, n_left),
            "name": [f"l{i}" for i in range(n_left)],
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_left + 50, n_right),  # some dangling keys
            "rv": rng.normal(size=n_right),
        }
    )
    return left, right


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("float"):
            df[c] = np.round(df[c], 9)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_broadcast_join_matches_pandas():
    left, right = _sides()
    expect = _canon(right.merge(left, on="k", how="inner"))
    got = _canon(
        broadcast_join(ray.data.from_pandas(right), left, on="k").to_pandas()
    )
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_bucketed_hash_join_matches_pandas():
    left, right = _sides(seed=11)
    expect = _canon(left.merge(right, on="k", how="inner"))
    got = _canon(
        bucketed_hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right), on="k",
            num_buckets=8,
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_bucketed_join_colliding_columns():
    left = pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]})
    right = pd.DataFrame({"k": [2, 3, 4], "v": [200, 300, 400]})
    got = bucketed_hash_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), on="k", num_buckets=4
    ).to_pandas()
    got = got.sort_values("k").reset_index(drop=True)
    assert list(got.columns) == ["k", "v", "v_r"]
    assert got["k"].tolist() == [2, 3]
    assert got["v"].tolist() == [20, 30]
    assert got["v_r"].tolist() == [200, 300]


def test_bucketed_join_string_keys():
    """Round-1 regression: string join keys raised/corrupted under the
    int64 cast; keys now hash their bytes."""
    left = pd.DataFrame(
        {"lang": ["en", "de", "fr", "en", "zh"], "v": [1, 2, 3, 4, 5]}
    )
    right = pd.DataFrame({"lang": ["en", "de", "es"], "n": [10, 20, 30]})
    expect = _canon(left.merge(right, on="lang", how="inner"))
    got = _canon(
        bucketed_hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right), on="lang",
            num_buckets=8,
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_bucketed_join_salt_bucket_collision():
    """r2 ADVICE repro: nsalt (8) exceeds the distinct salted-bucket
    count (num_buckets=4), so naive replication would land two right
    replicas in one bucket and emit duplicate join rows (111 vs 60).
    Both sides must use the per-key DISTINCT bucket set."""
    left = pd.DataFrame({"k": np.full(60, 7), "v": np.arange(60)})
    right = pd.DataFrame({"k": [7, 8], "r": [70, 80]})
    expect = _canon(left.merge(right, on="k", how="inner"))
    got = _canon(
        bucketed_hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right), on="k",
            num_buckets=4, hot_keys=[7], nsalt=8,
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_bucketed_join_salted_hot_key_identical():
    """Hot-key salting is a physical layout choice only: salted output
    must equal the unsalted join exactly (left hot rows spread over
    sub-buckets, right hot rows replicated)."""
    rng = np.random.default_rng(3)
    # key 7 is pathologically hot on the left
    left = pd.DataFrame(
        {
            "k": np.concatenate([np.full(400, 7), rng.integers(0, 20, 100)]),
            "v": np.arange(500),
        }
    )
    right = pd.DataFrame({"k": np.arange(20), "r": np.arange(20) * 10})
    expect = _canon(left.merge(right, on="k", how="inner"))
    got = _canon(
        bucketed_hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right), on="k",
            num_buckets=16, hot_keys=[7], nsalt=4,
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_asof_join_matches_naive(ray_session):
    """asof_join vs a per-row naive reference: random (key, ts) data
    with duplicate timestamps (tiebreak -> max id), keys missing from
    the right side (null -> -1), and a hot key."""
    import numpy as np
    import pandas as pd
    import ray.data

    from mini_ivf_ray.pipelines.relational import asof_join

    rng = np.random.default_rng(23)
    nl, nr = 600, 400
    # duplicate-heavy ts grid so ties actually occur
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 12, nl),
            "ts": rng.integers(0, 50, nl).astype(np.int64),
            "lid": np.arange(nl, dtype=np.int64),
            "lval": rng.normal(size=nl),
        }
    )
    left.loc[: nl // 3, "k"] = 3  # hot key
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 10, nr),  # keys 10,11 never on right
            "ts": rng.integers(0, 50, nr).astype(np.int64),
            "rid": np.arange(nr, dtype=np.int64),
        }
    )
    got = (
        asof_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            by="k",
            on="ts",
            tiebreak="rid",
            num_buckets=16,
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert len(got) == nl
    exp = []
    for _, lrow in left.iterrows():
        m = right[(right["k"] == lrow["k"]) & (right["ts"] <= lrow["ts"])]
        if len(m):
            mm = m[m["ts"] == m["ts"].max()]
            exp.append(int(mm["rid"].max()))
        else:
            exp.append(-1)
    exp = pd.Series(exp, index=left["lid"]).sort_index()
    got_r = got["rid"].fillna(-1).astype(np.int64)
    np.testing.assert_array_equal(got_r.to_numpy(), exp.to_numpy())
    # right's own ts survives as ts_r and is <= left ts where matched
    matched = got["rid"].notna()
    assert (got.loc[matched, "ts_r"] <= got.loc[matched, "ts"]).all()
    assert got.loc[~matched, "ts_r"].isna().all()


def test_range_join_both_modes(ray_session):
    """range_join vs a naive nested-loop reference, in keyed-bucket
    mode and in domain-chunked (bounds) mode with overlapping
    intervals spanning multiple chunks."""
    import numpy as np
    import pandas as pd
    import ray.data

    from mini_ivf_ray.pipelines.relational import range_join

    rng = np.random.default_rng(31)
    pts = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 300),
            "x": rng.uniform(0, 100, 300),
            "pid": np.arange(300, dtype=np.int64),
        }
    )
    iv = pd.DataFrame({"k": rng.integers(0, 6, 40), "lo": rng.uniform(0, 80, 40)})
    iv["hi"] = iv["lo"] + rng.uniform(0, 30, 40)
    iv["vid"] = np.arange(40, dtype=np.int64)

    def naive(keyed):
        return sorted(
            (int(p.pid), int(v.vid))
            for _, p in pts.iterrows()
            for _, v in iv.iterrows()
            if (not keyed or p.k == v.k) and v.lo <= p.x <= v.hi
        )

    got = range_join(
        ray.data.from_pandas(pts),
        ray.data.from_pandas(iv),
        on="x",
        lo="lo",
        hi="hi",
        by="k",
        num_buckets=16,
    ).to_pandas()
    assert sorted(zip(got["pid"].astype(int), got["vid"].astype(int))) == naive(True)

    got2 = range_join(
        ray.data.from_pandas(pts.drop(columns="k")),
        ray.data.from_pandas(iv.drop(columns="k")),
        on="x",
        lo="lo",
        hi="hi",
        bounds=[20, 40, 60, 80],
    ).to_pandas()
    assert sorted(zip(got2["pid"].astype(int), got2["vid"].astype(int))) == naive(False)

    # exactly one of by/bounds required
    import pytest

    with pytest.raises(ValueError):
        range_join(
            ray.data.from_pandas(pts), ray.data.from_pandas(iv),
            on="x", lo="lo", hi="hi",
        )


def test_semi_and_anti_join_match_pandas():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from mini_ivf_ray.pipelines.relational import (
        broadcast_semi_join,
        bucketed_semi_join,
    )

    rng = np.random.default_rng(17)
    left = pd.DataFrame(
        {"k": rng.integers(0, 200, 1000), "v": np.arange(1000)}
    )
    right = pd.DataFrame({"k": rng.integers(100, 300, 400), "w": np.arange(400)})
    lds = ray.data.from_arrow(pa.Table.from_pandas(left)).repartition(8)
    rds = ray.data.from_arrow(pa.Table.from_pandas(right)).repartition(4)

    rkeys = set(right["k"])
    want_semi = left[left["k"].isin(rkeys)].sort_values(["k", "v"]).reset_index(drop=True)
    want_anti = left[~left["k"].isin(rkeys)].sort_values(["k", "v"]).reset_index(drop=True)

    got_semi = (
        bucketed_semi_join(lds, rds, on="k")
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    got_anti = (
        bucketed_semi_join(lds, rds, on="k", anti=True)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_semi[["k", "v"]].astype("int64"), want_semi.astype("int64"))
    pd.testing.assert_frame_equal(got_anti[["k", "v"]].astype("int64"), want_anti.astype("int64"))

    # broadcast variant agrees
    got_b = (
        broadcast_semi_join(lds, right["k"].to_numpy(), on="k")
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_b[["k", "v"]].astype("int64"), want_semi.astype("int64"))

    # string keys through the same hash path
    lds2 = ray.data.from_items([{"k": f"s{i%7}", "v": i} for i in range(50)])
    rds2 = ray.data.from_items([{"k": "s1"}, {"k": "s3"}, {"k": "zz"}])
    got2 = bucketed_semi_join(lds2, rds2, on="k").to_pandas()
    assert set(got2["k"]) == {"s1", "s3"} and len(got2) == len(
        [i for i in range(50) if i % 7 in (1, 3)]
    )


def test_bucketed_left_and_outer_join_match_pandas():
    """how='left'/'outer' vs pandas ground truth — unmatched keys on
    BOTH sides (dangling right keys in _sides; left keys missing from
    right by construction), plus duplicate right keys."""
    import pytest

    left, right = _sides(seed=11, n_left=300, n_right=900)
    for how in ("left", "outer"):
        expect = _canon(left.merge(right, on="k", how=how))
        got = _canon(
            bucketed_hash_join(
                ray.data.from_pandas(left),
                ray.data.from_pandas(right),
                on="k",
                num_buckets=16,
                how=how,
            ).to_pandas()
        )
        # NaN sorts are stable in both since _canon uses mergesort on
        # identical values; compare NaN-safely
        pd.testing.assert_frame_equal(got, expect, check_dtype=False)
        if how == "left":
            assert len(got) >= len(left)  # every left row survives
        else:
            n_unmatched_right = (~right.k.isin(left.k)).sum()
            assert got["lv"].isna().sum() == n_unmatched_right
    with pytest.raises(ValueError, match="outer-join-safe"):
        bucketed_hash_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="k",
            hot_keys=[1],
            how="outer",
        )


def test_left_join_with_hot_key_salting():
    """Salting stays exact under how='left': hot-key left rows spread
    over salt buckets still meet every replica'd right row once, and
    unmatched left rows survive exactly once."""
    left, right = _sides(seed=13, n_left=200, n_right=600)
    # make key 5 hot on the right, and add left keys with no right rows
    right = pd.concat(
        [right, pd.DataFrame({"k": [5] * 300, "rv": np.arange(300.0)})],
        ignore_index=True,
    )
    expect = _canon(left.merge(right, on="k", how="left"))
    got = _canon(
        bucketed_hash_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="k",
            num_buckets=32,
            hot_keys=[5],
            nsalt=4,
            how="left",
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_keyed_window_funcs_match_pandas():
    """Window operator vs a driver-side pandas reference: seq, lag
    delta, running and rolling sums, all integer-exact."""
    import pyarrow as pa

    from mini_ivf_ray.pipelines.window import keyed_window_funcs

    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 37, n),
            "ts": pd.to_datetime(
                rng.integers(1_600_000_000, 1_600_900_000, n), unit="s"
            ),
            "value": rng.normal(50, 20, n),
        }
    )
    # force ties: many events share a timestamp within a user
    df.loc[: n // 4, "ts"] = pd.Timestamp("2020-09-13 12:00:00")
    got = (
        keyed_window_funcs(ray.data.from_pandas(df), num_buckets=8)
        .to_pandas()
        .sort_values(["user_id", "ts_us", "event_id"])
        .reset_index(drop=True)
    )
    ref = df.copy()
    ref["ts_us"] = ref["ts"].astype("datetime64[us]").astype(np.int64)
    ref["vfloor"] = np.floor(ref["value"]).astype(np.int64)
    ref = ref.sort_values(["user_id", "ts_us", "event_id"]).reset_index(drop=True)
    g = ref.groupby("user_id", sort=False)
    ref["seq"] = g.cumcount() + 1
    ref["delta_us"] = (ref["ts_us"] - g["ts_us"].shift(1)).fillna(-1).astype(np.int64)
    ref["run_vsum"] = g["vfloor"].cumsum()
    ref["roll_vsum"] = (
        g["vfloor"].rolling(3, min_periods=1).sum().reset_index(drop=True).astype(np.int64)
    )
    for col in ("seq", "delta_us", "run_vsum", "roll_vsum"):
        np.testing.assert_array_equal(
            got[col].to_numpy(), ref[col].to_numpy(), err_msg=col
        )
    assert len(got) == n


def test_table_diff_matches_ground_truth():
    """added/removed/changed/unchanged classification vs a pandas
    reference, including NULL compare values and string keys."""
    from mini_ivf_ray.pipelines.relational import table_diff

    old = pd.DataFrame(
        {
            "k": ["a", "b", "c", "d", "e"],
            "x": [1, 2, 3, 4, 5],
            "s": ["p", None, "r", "s", "t"],
        }
    )
    new = pd.DataFrame(
        {
            "k": ["a", "b", "c", "f"],          # d, e removed; f added
            "x": [1, 2, 99, 7],                  # c changed
            "s": ["p", None, "r", "u"],          # None == None -> unchanged
        }
    )
    got = (
        table_diff(
            ray.data.from_pandas(old),
            ray.data.from_pandas(new),
            key="k",
            compare_cols=["x", "s"],
            num_buckets=4,
        )
        .to_pandas()
        .set_index("k")["status"]
        .to_dict()
    )
    assert got == {
        "a": "unchanged",
        "b": "unchanged",
        "c": "changed",
        "d": "removed",
        "e": "removed",
        "f": "added",
    }

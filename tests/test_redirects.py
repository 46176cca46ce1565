"""Redirect-chain resolution via pointer doubling: must match a local
follow-the-chain replay, resolve any chain of length <= 2**rounds,
flag cycles and over-length chains unresolved, and be invariant to
partitioning."""

import numpy as np
import pandas as pd
import pytest

import ray.data
import pyarrow as pa
from mini_ivf_ray.pipelines.redirects import resolve_redirects, synth_redirects


def _nodes(ids):
    return ray.data.from_arrow(
        pa.table({"doc_id": np.asarray(ids, dtype=np.int64)})
    )


def _red(pairs):
    src = np.array([s for s, _ in pairs], dtype=np.int64)
    dst = np.array([d for _, d in pairs], dtype=np.int64)
    return ray.data.from_arrow(pa.table({"src": src, "dst": dst}))


def _local_resolve(pairs, rounds):
    m = {int(s): int(d) for s, d in pairs}
    out = []
    for s in sorted(m):
        cur = m[s]
        hops = 1
        while cur in m and hops < 2**rounds:
            cur = m[cur]
            hops += 1
        out.append((s, cur, 0 if cur in m else 1))
    return pd.DataFrame(out, columns=["src", "canonical", "resolved"])


def _canon(df):
    df = df.copy()
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values("src").reset_index(drop=True)[
        ["src", "canonical", "resolved"]
    ]


def test_resolve_matches_local_replay_on_synth():
    rng = np.random.default_rng(17)
    ids = np.unique(rng.integers(0, 9_000, size=400)).astype(np.int64)
    red = synth_redirects(_nodes(ids), mod=3, residue=1).materialize()
    pairs = list(
        zip(red.to_pandas()["src"], red.to_pandas()["dst"])
    )
    assert pairs  # non-vacuous: mod=3 gives ~a third of docs
    got = resolve_redirects(red, rounds=3, driver_threshold=0).to_pandas()
    want = _local_resolve(pairs, rounds=3)
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_chain_length_boundary():
    """A pure chain 0->1->...->9 (9 redirect sources, canonical 9):
    rounds=3 resolves up to 2^3 = 8 hops, so src 0 (needing 9 hops)
    stays unresolved while src 1 (8 hops) resolves; rounds=4 resolves
    everything."""
    pairs = [(i, i + 1) for i in range(9)]
    r3 = _canon(resolve_redirects(_red(pairs), rounds=3).to_pandas())
    assert r3.loc[r3["src"] == 0, "resolved"].iloc[0] == 0
    assert r3.loc[r3["src"] == 1, "resolved"].iloc[0] == 1
    assert r3.loc[r3["src"] == 1, "canonical"].iloc[0] == 9
    r4 = _canon(resolve_redirects(_red(pairs), rounds=4).to_pandas())
    assert (r4["resolved"] == 1).all()
    assert (r4["canonical"] == 9).all()


def test_cycle_stays_unresolved():
    pairs = [(1, 2), (2, 1), (3, 1)]
    r = _canon(resolve_redirects(_red(pairs), rounds=5).to_pandas())
    assert (r["resolved"] == 0).all()  # everything feeds the 2-cycle
    # pointer lands somewhere inside the cycle, deterministically
    assert set(r["canonical"]).issubset({1, 2})


def test_partitioning_invariant():
    rng = np.random.default_rng(23)
    ids = np.unique(rng.integers(0, 5_000, size=200)).astype(np.int64)
    red = synth_redirects(_nodes(ids), mod=3, residue=1).materialize()
    a = resolve_redirects(red, rounds=3, driver_threshold=0).to_pandas()
    b = resolve_redirects(
        red.repartition(5), rounds=3, num_buckets=7, driver_threshold=0,
    ).to_pandas()
    pd.testing.assert_frame_equal(_canon(a), _canon(b))


def test_rejects_unrepresentable_ids():
    pairs = [(1, 2**53 + 5)]
    with pytest.raises(ValueError, match="2\\*\\*53"):
        resolve_redirects(_red(pairs), rounds=1)


def test_redirects_driver_shortcut_matches_distributed():
    """The adaptive driver replay == the forced distributed doubling,
    including cycles and over-length chains."""
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (7, 8), (8, 7),
             (10, 11)]
    red = _red(pairs)
    auto = _canon(resolve_redirects(red, rounds=3).to_pandas())
    forced = _canon(
        resolve_redirects(red, rounds=3, driver_threshold=0).to_pandas()
    )
    pd.testing.assert_frame_equal(auto, forced)

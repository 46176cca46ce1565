"""HITS hubs & authorities: the fixed-point max-normalized iteration
must be bit-identical to a local integer replay, invariant to
partitioning, and pin the zero-degree conventions (no in-links ->
auth 0, no out-links -> hub 0)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data
from mini_ivf_ray.pipelines.graph import HITS_SCALE, hits, synth_edges


def _nodes(ids):
    return ray.data.from_arrow(
        pa.table({"doc_id": np.asarray(ids, dtype=np.int64)})
    )


def _local_hits(ids, src, dst, iters, scale=HITS_SCALE):
    ids = np.sort(np.asarray(ids, dtype=np.int64))
    n = ids.size
    ix = {int(v): i for i, v in enumerate(ids)}
    h = np.full(n, scale, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        a = np.zeros(n, dtype=np.int64)
        for s, d in zip(src, dst):
            a[ix[int(d)]] += h[ix[int(s)]]
        a //= max(1, int(a.max()) // scale)
        hh = np.zeros(n, dtype=np.int64)
        for s, d in zip(src, dst):
            hh[ix[int(s)]] += a[ix[int(d)]]
        h = hh // max(1, int(hh.max()) // scale)
    return pd.DataFrame({"doc_id": ids, "auth": a, "hub": h})


def _canon(df):
    df = df.copy()
    for c in ("doc_id", "auth", "hub"):
        df[c] = df[c].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "auth", "hub"]
    ]


def test_hits_matches_local_integer_replay():
    rng = np.random.default_rng(7)
    ids = np.unique(rng.integers(0, 8_000, size=250)).astype(np.int64)
    nodes = _nodes(ids)
    edges = synth_edges(nodes, max_deg=3).materialize()
    e = edges.to_pandas()
    got = hits(edges, nodes, iters=3, driver_threshold=0).to_pandas()
    want = _local_hits(ids, e["src"].to_numpy(), e["dst"].to_numpy(), 3)
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_hits_partitioning_invariant():
    rng = np.random.default_rng(13)
    ids = np.unique(rng.integers(0, 4_000, size=100)).astype(np.int64)
    nodes = _nodes(ids)
    edges = synth_edges(nodes, max_deg=3).materialize()
    a = hits(edges, nodes, iters=2, driver_threshold=0).to_pandas()
    b = hits(
        edges.repartition(7), nodes.repartition(3), iters=2, num_buckets=5,
        driver_threshold=0,
    ).to_pandas()
    pd.testing.assert_frame_equal(_canon(a), _canon(b))


def test_hits_zero_degree_conventions():
    """Star graph 1..5 -> 0: the center is the sole authority (hub 0,
    it links nowhere); the spokes are pure hubs (auth 0, nothing links
    to them); scores land at exactly ``scale`` after normalization."""
    ids = np.arange(6, dtype=np.int64)
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": np.array([1, 2, 3, 4, 5], dtype=np.int64),
                "dst": np.zeros(5, dtype=np.int64),
            }
        )
    )
    r = _canon(hits(edges, _nodes(ids), iters=2).to_pandas())
    center = r[r["doc_id"] == 0].iloc[0]
    spokes = r[r["doc_id"] != 0]
    assert center["auth"] == HITS_SCALE and center["hub"] == 0
    assert (spokes["auth"] == 0).all()
    assert (spokes["hub"] == HITS_SCALE).all()


def test_hits_rejects_unrepresentable_ids():
    big = np.array([1, 2**53 + 10], dtype=np.int64)
    edges = ray.data.from_arrow(pa.table({"src": big[:1], "dst": big[1:]}))
    with pytest.raises(ValueError, match="2\\*\\*53"):
        hits(edges, _nodes(big), iters=1)


def test_cocitation_matches_local_replay():
    from collections import Counter

    from mini_ivf_ray.pipelines.graph import cocitation_topn

    rng = np.random.default_rng(29)
    ids = np.unique(rng.integers(0, 6_000, size=200)).astype(np.int64)
    nodes = _nodes(ids)
    edges = synth_edges(nodes, max_deg=3).materialize()
    e = edges.to_pandas()
    # local replay: every (edge_u, edge_v) combination per src, u < v
    cnt = Counter()
    for _, g in e.groupby("src"):
        ds = g["dst"].to_numpy()
        for i in range(ds.size):
            for j in range(ds.size):
                if ds[i] < ds[j]:
                    cnt[(int(ds[i]), int(ds[j]))] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = cocitation_topn(edges, n=20).to_pandas()
    assert len(got) == min(20, len(cnt))
    for row, ((u, v), c) in zip(got.itertuples(index=False), want):
        assert (row.u, row.v, row.cnt) == (u, v, c)


def test_cocitation_partitioning_invariant():
    from mini_ivf_ray.pipelines.graph import cocitation_topn

    rng = np.random.default_rng(31)
    ids = np.unique(rng.integers(0, 3_000, size=120)).astype(np.int64)
    edges = synth_edges(_nodes(ids), max_deg=3).materialize()
    a = cocitation_topn(edges, n=15).to_pandas()
    b = cocitation_topn(edges.repartition(9), n=15, num_buckets=5).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_coupling_matches_local_replay():
    """Bibliographic coupling == co-citation of the reversed graph;
    verify against a direct local replay over shared out-targets."""
    from collections import Counter

    from mini_ivf_ray.pipelines.graph import coupling_topn

    rng = np.random.default_rng(37)
    ids = np.unique(rng.integers(0, 6_000, size=200)).astype(np.int64)
    edges = synth_edges(_nodes(ids), max_deg=3).materialize()
    e = edges.to_pandas()
    cnt = Counter()
    for _, g in e.groupby("dst"):
        ss = g["src"].to_numpy()
        for i in range(ss.size):
            for j in range(ss.size):
                if ss[i] < ss[j]:
                    cnt[(int(ss[i]), int(ss[j]))] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = coupling_topn(edges, n=20).to_pandas()
    assert len(got) == min(20, len(cnt))
    for row, ((u, v), c) in zip(got.itertuples(index=False), want):
        assert (row.u, row.v, row.cnt) == (u, v, c)


# ---------------------------------------------------------------------------
# SALSA (stochastic HITS)
# ---------------------------------------------------------------------------


def _local_salsa(ids, src, dst, iters, scale=HITS_SCALE):
    ids = np.sort(np.asarray(ids, dtype=np.int64))
    n = ids.size
    ix = {int(v): i for i, v in enumerate(ids)}
    od = np.zeros(n, dtype=np.int64)
    idg = np.zeros(n, dtype=np.int64)
    for s, d in zip(src, dst):
        od[ix[int(s)]] += 1
        idg[ix[int(d)]] += 1
    h = np.full(n, scale, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        a = np.zeros(n, dtype=np.int64)
        for s, d in zip(src, dst):
            a[ix[int(d)]] += h[ix[int(s)]] // od[ix[int(s)]]
        a //= max(1, int(a.max()) // scale)
        hh = np.zeros(n, dtype=np.int64)
        for s, d in zip(src, dst):
            hh[ix[int(s)]] += a[ix[int(d)]] // idg[ix[int(d)]]
        h = hh // max(1, int(hh.max()) // scale)
    return pd.DataFrame({"doc_id": ids, "auth": a, "hub": h})


def test_salsa_matches_local_integer_replay():
    from mini_ivf_ray.pipelines.graph import salsa

    rng = np.random.default_rng(31)
    ids = np.unique(rng.integers(0, 8_000, size=220)).astype(np.int64)
    nodes = _nodes(ids)
    edges = synth_edges(nodes, max_deg=3).materialize()
    e = edges.to_pandas()
    got = salsa(edges, nodes, iters=2, driver_threshold=0).to_pandas()
    want = _local_salsa(ids, e["src"].to_numpy(), e["dst"].to_numpy(), 2)
    pd.testing.assert_frame_equal(_canon(got), _canon(want))
    # SALSA must actually differ from HITS on this graph (degree
    # normalization bites) — otherwise the test is vacuous
    plain = hits(edges, nodes, iters=2, driver_threshold=0).to_pandas()
    assert not _canon(plain).equals(_canon(got))


def test_salsa_partitioning_invariant():
    from mini_ivf_ray.pipelines.graph import salsa

    rng = np.random.default_rng(37)
    ids = np.unique(rng.integers(0, 4_000, size=90)).astype(np.int64)
    nodes = _nodes(ids)
    edges = synth_edges(nodes, max_deg=3).materialize()
    a = salsa(edges, nodes, iters=2, driver_threshold=0).to_pandas()
    b = salsa(
        edges.repartition(9), nodes.repartition(4), iters=2, num_buckets=5,
        driver_threshold=0,
    ).to_pandas()
    pd.testing.assert_frame_equal(_canon(a), _canon(b))


def test_salsa_degree_normalization_pins():
    """Two authorities: 0 receives from hub 10 (outdeg 3, split 3
    ways) and 1 receives from hub 11 (outdeg 1, undivided) — under
    SALSA node 1 outranks node 0 even though 0 has more in-links
    under HITS semantics."""
    from mini_ivf_ray.pipelines.graph import salsa

    src = np.array([10, 10, 10, 11], dtype=np.int64)
    dst = np.array([0, 2, 3, 1], dtype=np.int64)
    ids = np.arange(12, dtype=np.int64)
    edges = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    out = salsa(edges, _nodes(ids), iters=1).to_pandas().set_index("doc_id")
    assert int(out.loc[1, "auth"]) > int(out.loc[0, "auth"])
    e = pd.DataFrame({"src": src, "dst": dst})
    want = _local_salsa(ids, e["src"], e["dst"], 1)
    got = salsa(edges, _nodes(ids), iters=1).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_hits_and_salsa_driver_shortcut_matches_distributed():
    from mini_ivf_ray.pipelines.graph import salsa

    rng = np.random.default_rng(47)
    ids = np.unique(rng.integers(0, 6_000, size=150)).astype(np.int64)
    nodes = _nodes(ids)
    edges = synth_edges(nodes, max_deg=3).materialize()
    for fn in (hits, salsa):
        auto = fn(edges, nodes, iters=2).to_pandas()
        forced = fn(edges, nodes, iters=2, driver_threshold=0).to_pandas()
        pd.testing.assert_frame_equal(_canon(auto), _canon(forced))

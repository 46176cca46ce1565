"""Geo surface: exact integer geohash kernel (classic vector +
independent interval-halving reference + edge clamps), synthesized
coordinate determinism, grid == local facet replay, bbox contract."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.pipelines.geo import (
    BASE32,
    bbox_mask,
    geohash_cells,
    synth_coords_e6,
)


def _reference_geohash(lat: float, lon: float, precision: int) -> str:
    """Independent implementation: the textbook float interval-halving
    walk (Niemeyer's published algorithm), no shared code."""
    lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
    bits, out, ch, even = 0, [], 0, True
    while len(out) < precision:
        rng, v = (lon_rng, lon) if even else (lat_rng, lat)
        mid = (rng[0] + rng[1]) / 2
        ch <<= 1
        if v >= mid:
            ch |= 1
            rng[0] = mid
        else:
            rng[1] = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(BASE32[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_classic_vector_and_edges():
    assert geohash_cells([57649110], [10407440], 5)[0] == "u4pru"
    assert geohash_cells([57649110], [10407440], 11)[0] == "u4pruydqqvj"
    # poles/antimeridian clamp into the last cell; origin is s000...
    assert geohash_cells([90_000_000], [180_000_000], 4)[0] == "zzzz"
    assert geohash_cells([-90_000_000], [-180_000_000], 4)[0] == "0000"
    assert geohash_cells([0], [0], 4)[0] == "s000"


def test_matches_interval_halving_reference():
    rng = np.random.RandomState(11)
    lat = rng.randint(-90_000_000, 90_000_001, size=300).astype(np.int64)
    lon = rng.randint(-180_000_000, 180_000_001, size=300).astype(np.int64)
    for p in (1, 2, 5, 8):
        got = geohash_cells(lat, lon, p)
        for i in range(lat.size):
            want = _reference_geohash(lat[i] / 1e6, lon[i] / 1e6, p)
            assert got[i] == want, (lat[i], lon[i], p)


def test_synth_coords_deterministic_and_in_range():
    ids = np.arange(1000, dtype=np.int64)
    lat1, lon1 = synth_coords_e6(ids)
    lat2, lon2 = synth_coords_e6(ids)
    assert np.array_equal(lat1, lat2) and np.array_equal(lon1, lon2)
    assert np.abs(lat1).max() <= 90_000_000
    assert np.abs(lon1).max() <= 180_000_000
    # not degenerate: both hemispheres populated
    assert (lat1 > 0).any() and (lat1 < 0).any()


def test_grid_equals_local_facet_replay(tiny_index):
    from mini_ivf_ray.functions.tokenize import tokenize
    from mini_ivf_ray.pipelines.facets import faceted_search

    idx, cfg, docs = tiny_index
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    lat, lon = synth_coords_e6(ids)
    cells = geohash_cells(lat, lon, 2)
    qds = ray.data.from_items([{"query_id": 0, "text": "the data"}])
    res = faceted_search(idx, qds, ids, cells, cfg).to_pandas()
    toks = [set(tokenize(t)) for t in docs["text"]]
    matched = np.array(
        [bool({"the", "data"} & tk) for tk in toks], dtype=bool
    )
    want = {}
    for c, m in zip(cells, matched):
        if m:
            want[c] = want.get(c, 0) + 1
    got = dict(zip(res["facet"], (int(x) for x in res["n_docs"])))
    assert got == want


def test_bbox_mask_contract():
    lat = np.array([0, 10, -10, 29_999_999, 30_000_000], dtype=np.int64)
    lon = np.array([0, 50, 50, 89_999_999, 10], dtype=np.int64)
    m = bbox_mask(lat, lon, (-30_000_000, 30_000_000, 0, 90_000_000))
    # half-open: lat 30e6 excluded, lat -10 with lon 50 included
    assert m.tolist() == [True, True, True, True, False]
    with pytest.raises(ValueError, match="empty"):
        bbox_mask(lat, lon, (5, 5, 0, 1))
    with pytest.raises(ValueError, match="range"):
        geohash_cells([95_000_000], [0], 3)
    with pytest.raises(ValueError, match="precision"):
        geohash_cells([0], [0], 0)


def test_geo_sort_matches_local_replay(tiny_index):
    from mini_ivf_ray.functions.tokenize import tokenize
    from mini_ivf_ray.pipelines.geo import (
        geo_distance_search,
        planar_dist2_e6,
    )

    idx, cfg, docs = tiny_index
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    lat, lon = synth_coords_e6(ids)
    d2 = planar_dist2_e6(lat, lon, (10_000_000, -20_000_000))
    qds = ray.data.from_items(
        [{"query_id": 0, "text": "the data"}, {"query_id": 1, "text": "zz9q"}]
    )
    res = (
        geo_distance_search(idx, qds, ids, d2, cfg, topk=7)
        .to_pandas()
        .sort_values(["query_id", "rank"])
    )
    assert set(res["query_id"]) == {0}  # OOV query empty
    toks = [set(tokenize(t)) for t in docs["text"]]
    cand = [
        (int(dd), int(i))
        for i, dd, tk in zip(ids, d2, toks)
        if {"the", "data"} & tk
    ]
    want = sorted(cand)[:7]
    got = list(
        zip(
            (int(x) for x in res["dist2"]),
            (int(x) for x in res["doc_id"].astype(np.uint64)),
        )
    )
    assert got == want
    # distances are nonnegative and ascending
    assert res["dist2"].is_monotonic_increasing


def test_geo_centroid_matches_local_replay_and_is_additive(tiny_index):
    from mini_ivf_ray.functions.tokenize import tokenize
    from mini_ivf_ray.pipelines.geo import geo_centroid_search

    idx, cfg, docs = tiny_index
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    lat, lon = synth_coords_e6(ids)
    qds = ray.data.from_items(
        [{"query_id": 0, "text": "the data"}, {"query_id": 1, "text": "zz9q"}]
    )
    res = geo_centroid_search(idx, qds, ids, lat, lon, cfg).to_pandas()
    assert set(res["query_id"]) == {0}  # empty match set -> no row
    toks = [set(tokenize(t)) for t in docs["text"]]
    m = np.array([bool({"the", "data"} & tk) for tk in toks])
    row = res.iloc[0]
    assert int(row["n_docs"]) == int(m.sum())
    assert int(row["sum_lat_e6"]) == int(lat[m].sum())
    assert int(row["sum_lon_e6"]) == int(lon[m].sum())
    # additivity of the mergeable triple over a doc split
    half = ids < np.median(ids)
    a = (m & half, m & ~half)
    assert int(lat[a[0]].sum()) + int(lat[a[1]].sum()) == int(lat[m].sum())


def test_geo_bounds_matches_local_replay(tiny_index):
    from mini_ivf_ray.functions.tokenize import tokenize
    from mini_ivf_ray.pipelines.geo import geo_bounds_search

    idx, cfg, docs = tiny_index
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    lat, lon = synth_coords_e6(ids)
    qds = ray.data.from_items(
        [{"query_id": 0, "text": "the data"}, {"query_id": 1, "text": "zz9q"}]
    )
    res = geo_bounds_search(idx, qds, ids, lat, lon, cfg).to_pandas()
    assert set(res["query_id"]) == {0}
    toks = [set(tokenize(t)) for t in docs["text"]]
    m = np.array([bool({"the", "data"} & tk) for tk in toks])
    r = res.iloc[0]
    assert int(r["n_docs"]) == int(m.sum())
    assert int(r["min_lat_e6"]) == int(lat[m].min())
    assert int(r["max_lat_e6"]) == int(lat[m].max())
    assert int(r["min_lon_e6"]) == int(lon[m].min())
    assert int(r["max_lon_e6"]) == int(lon[m].max())
    # min/max merge over a split == global (the sharding argument)
    half = ids < np.median(ids)
    lo, hi = m & half, m & ~half
    assert min(lat[lo].min(), lat[hi].min()) == lat[m].min()

"""Geo query surface over integer micro-degree coordinates:
Elasticsearch's ``geohash_grid`` aggregation and ``geo_bounding_box``
filter, exact and SQL-replayable.

Coordinates.  The testdata carries no geo columns, so each document
gets deterministic synthesized coordinates (the synth_edges /
hc-parent convention — md5-derived, engine == any-SQL-engine):

    lat_e6 = h60(doc_id, 'geo-lat') % 180_000_001 - 90_000_000
    lon_e6 = h60(doc_id, 'geo-lon') % 360_000_001 - 180_000_000

held as INTEGER micro-degrees throughout.  At real scale lat/lon are
real columns and ``synth_coords_e6`` degenerates to a projection
(scaled by 1e6) — everything downstream is unchanged.

Geohash (Niemeyer 2008, the public base32 interleave): micro-degree
integers make the cell computation EXACT —

    x = ((lon_e6 + 180e6) << ceil(5p/2)) // 360e6    (clamped)
    y = ((lat_e6 +  90e6) << floor(5p/2)) // 180e6   (clamped)

then bit-interleave (longitude first) and emit base32 groups of 5.
This is the textbook float interval-halving algorithm with the
halving replaced by integer division — no float ever touches a cell
boundary, so engine and SQL replay agree bit-for-bit (the pytest pins
the classic (57.64911, 10.40744) -> 'u4pru...' vector and an
independent interval-halving reference).

geohash_grid = the facet panel over the cell attribute: the counting,
tombstone, and doc-sharding machinery is facets.py's, reused verbatim
— this module only supplies the (doc_id -> cell) sidecar columns.

geo_bounding_box = filtered retrieval: the box predicate over the
integer coordinates yields the allowed-docs set for
``query.search(allowed_docs=...)`` (the bm25_filtered machinery).
Half-open box edges [lo, hi) keep the predicate integer-exact and
unambiguous at boundaries.
"""

from __future__ import annotations

import numpy as np

from mini_ivf_ray.pipelines.sampling import salt_hash60

GEO_LAT_SALT = "geo-lat"
GEO_LON_SALT = "geo-lon"
BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"

LAT_SPAN = 180_000_000
LON_SPAN = 360_000_000


def synth_coords_e6(doc_ids) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (lat_e6, lon_e6) int64 micro-degrees per doc id."""
    ids = np.asarray(doc_ids)
    lat = salt_hash60(ids, GEO_LAT_SALT) % (LAT_SPAN + 1) - LAT_SPAN // 2
    lon = salt_hash60(ids, GEO_LON_SALT) % (LON_SPAN + 1) - LON_SPAN // 2
    return lat.astype(np.int64), lon.astype(np.int64)


def geohash_cells(lat_e6, lon_e6, precision: int) -> np.ndarray:
    """Vectorized exact geohash strings at ``precision`` chars."""
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in [1, 12], got {precision}")
    lat_e6 = np.asarray(lat_e6, dtype=np.int64)
    lon_e6 = np.asarray(lon_e6, dtype=np.int64)
    if (np.abs(lat_e6) > LAT_SPAN // 2).any() or (
        np.abs(lon_e6) > LON_SPAN // 2
    ).any():
        raise ValueError("coordinates out of range")
    bits = 5 * precision
    lonbits = (bits + 1) // 2
    latbits = bits // 2
    x = ((lon_e6 + LON_SPAN // 2) << lonbits) // LON_SPAN
    y = ((lat_e6 + LAT_SPAN // 2) << latbits) // LAT_SPAN
    np.minimum(x, (1 << lonbits) - 1, out=x)
    np.minimum(y, (1 << latbits) - 1, out=y)
    z = np.zeros(x.shape, dtype=np.int64)
    # interleave msb-first, longitude taking the even (leading) slots
    for j in range(lonbits):
        z |= ((x >> (lonbits - 1 - j)) & 1) << (bits - 1 - 2 * j)
    for j in range(latbits):
        z |= ((y >> (latbits - 1 - j)) & 1) << (bits - 2 - 2 * j)
    alpha = np.frombuffer(BASE32.encode(), dtype=np.uint8)
    chars = np.empty((precision, z.size), dtype=np.uint8)
    for g in range(precision):
        chars[g] = alpha[(z >> (5 * (precision - 1 - g))) & 31]
    return (
        chars.T.copy().view(f"S{precision}").reshape(z.size).astype(str)
    )


def geohash_sql_stages(
    precision: int, lat: str = "lat_e6", lon: str = "lon_e6"
) -> tuple[str, str, str, str]:
    """(gx_expr, gy_expr, gz_expr, cell_expr) — DuckDB expressions
    mirroring ``geohash_cells`` bit for bit (integer ops only), meant
    for CTE staging: gx/gy read the coordinate columns, gz reads
    gx/gy, cell reads gz."""
    bits = 5 * precision
    lonbits = (bits + 1) // 2
    latbits = bits // 2
    gx = (f"LEAST((({lon} + {LON_SPAN // 2}) * {1 << lonbits})"
          f" // {LON_SPAN}, {(1 << lonbits) - 1})")
    gy = (f"LEAST((({lat} + {LAT_SPAN // 2}) * {1 << latbits})"
          f" // {LAT_SPAN}, {(1 << latbits) - 1})")
    terms = []
    for j in range(lonbits):
        terms.append(
            f"(((gx >> {lonbits - 1 - j}) & 1) << {bits - 1 - 2 * j})"
        )
    for j in range(latbits):
        terms.append(
            f"(((gy >> {latbits - 1 - j}) & 1) << {bits - 2 - 2 * j})"
        )
    gz = " + ".join(terms)
    cell = " || ".join(
        f"substr('{BASE32}', CAST(((gz >> {5 * (precision - 1 - g)}) & 31)"
        " AS INTEGER) + 1, 1)"
        for g in range(precision)
    )
    return gx, gy, gz, cell


def coords_sql_cte(table: str = "documents") -> str:
    """CTE body computing (doc_id, lat_e6, lon_e6) — the h60 replay."""
    h = (
        "CAST(CAST(('0x' || substr(md5(doc_id || ':{salt}'), 1, 15)) "
        "AS UBIGINT) AS BIGINT)"
    )
    return (
        f"SELECT doc_id, "
        f"{h.format(salt=GEO_LAT_SALT)} % {LAT_SPAN + 1}"
        f" - {LAT_SPAN // 2} AS lat_e6, "
        f"{h.format(salt=GEO_LON_SALT)} % {LON_SPAN + 1}"
        f" - {LON_SPAN // 2} AS lon_e6 FROM {table}"
    )


def bbox_mask(lat_e6, lon_e6, box: tuple[int, int, int, int]) -> np.ndarray:
    """Half-open [lat_lo, lat_hi) x [lon_lo, lon_hi) membership."""
    lat_lo, lat_hi, lon_lo, lon_hi = box
    if not (lat_lo < lat_hi and lon_lo < lon_hi):
        raise ValueError(f"empty bounding box {box}")
    return (
        (lat_e6 >= lat_lo)
        & (lat_e6 < lat_hi)
        & (lon_e6 >= lon_lo)
        & (lon_e6 < lon_hi)
    )


def planar_dist2_e6(lat_e6, lon_e6, origin: tuple[int, int]) -> np.ndarray:
    """EXACT integer squared planar distance (micro-degrees^2) to
    ``origin`` — the engine's pinned geo-distance ordering key.

    Documented divergence from ES's ``_geo_distance`` sort: ES orders
    by haversine meters; planar micro-degrees ignore latitude
    shrinkage and the antimeridian wrap, so orderings can differ away
    from the origin's neighborhood.  The integer form is what keeps
    the operator bit-exact and SQL-replayable; at real scale the
    kernel swaps for haversine and everything around it (match set,
    sidecar gather, partial top-k) is unchanged."""
    lat0, lon0 = int(origin[0]), int(origin[1])
    dlat = np.asarray(lat_e6, dtype=np.int64) - lat0
    dlon = np.asarray(lon_e6, dtype=np.int64) - lon0
    return dlat * dlat + dlon * dlon


class GeoSortSearcher:
    """Actor-pool stage: (query_id, text) -> the query's top-k matched
    docs by (dist2 asc, doc asc) — ES sort-by-_geo_distance over the
    disjunctive match set.  Reuses FacetCounter's match-set + sorted
    (doc_id -> int64 value) sidecar machinery with the squared
    distance as the code column."""

    def __init__(self, *args, topk: int = 10, **kwargs):
        from mini_ivf_ray.pipelines.facets import FacetCounter

        self._fc = FacetCounter(*args, **kwargs)
        self.topk = int(topk)

    def __call__(self, batch):
        import pyarrow as pa_

        fc = self._fc
        qids, ranks, docs_out, dists = [], [], [], []
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            docs = fc.disjunctive_matches_for_text(qtext)
            if not docs.size:
                continue
            idx = np.searchsorted(fc.facet_ids, docs)
            np.minimum(idx, fc.facet_ids.size - 1, out=idx)
            valid = fc.facet_ids[idx] == docs
            docs = docs[valid]
            d2 = fc.facet_codes[idx[valid]]
            order = np.argsort(docs, kind="stable")
            order = order[np.argsort(d2[order], kind="stable")][: self.topk]
            for r, i in enumerate(order):
                qids.append(qid)
                ranks.append(r)
                docs_out.append(int(docs[i]))
                dists.append(int(d2[i]))
        return pa_.table(
            {
                "query_id": pa_.array(qids, type=pa_.int64()),
                "rank": pa_.array(ranks, type=pa_.int32()),
                "doc_id": pa_.array(
                    np.array(docs_out, dtype=np.uint64), type=pa_.uint64()
                ),
                "dist2": pa_.array(dists, type=pa_.int64()),
            }
        )


def geo_distance_search(
    index_dir: str,
    queries_ds,
    doc_ids,
    dist2,
    cfg=None,
    topk: int = 10,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> (query_id, rank, doc_id, dist2):
    matched docs by squared planar distance ascending.  The
    (doc_id -> dist2) sidecar is broadcast once (the facet-panel
    deployment, value column instead of dictionary codes)."""
    import ray

    from mini_ivf_ray.config import PipelineConfig

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    ids = np.asarray(doc_ids, dtype=np.uint64)
    vals = np.asarray(dist2, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids, vals = ids[order], vals[order]
    shared = decoded = None
    if share == "decoded":
        from mini_ivf_ray.sources.decoded import share_decoded_index

        decoded = share_decoded_index(index_dir, cfg)
    elif share:
        from mini_ivf_ray.pipelines.query import share_segments

        shared = share_segments(index_dir, cfg.num_partitions)
    from mini_ivf_ray.pipelines.serving import _tombstone_ref

    denied_ref = _tombstone_ref(index_dir) if respect_deletes else None
    side_ref = ray.put((ids, vals))
    return queries_ds.map_batches(
        GeoSortSearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded, side_ref, []),
        fn_constructor_kwargs={
            "denied_ref": denied_ref, "topk": topk,
        },
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )


class GeoCentroidSearcher:
    """Actor-pool stage: (query_id, text) -> ONE row per query with
    the match set's size and INTEGER coordinate sums — ES's
    ``geo_centroid`` aggregation in its mergeable form.

    The (n, sum_lat_e6, sum_lon_e6) triple is the textbook additive
    partial (the extstats moments argument): disjoint doc ranges sum
    component-wise, so doc-sharding ships a 3-integer row per
    (query, shard).  The centroid itself (sum / n, scaled to degrees)
    is derived at the edge — division never enters the mergeable
    state.  ES's geo_centroid is the same arithmetic lat/lon mean
    (it does not great-circle-average), so unlike the distance sort
    this carries no kernel divergence — only the e6 integer carrier
    is ours.  Sum bounds: |sum| <= n_docs * 1.8e8, int64-safe to
    ~5e10 matched docs per query."""

    def __init__(self, index_dir, cfg=None, shared_tables=None,
                 decoded_refs=None, side_ref=None, denied_ref=None):
        import ray

        from mini_ivf_ray.pipelines.facets import FacetCounter

        ids, lat, lon = (
            ray.get(side_ref)
            if isinstance(side_ref, ray.ObjectRef)
            else side_ref
        )
        # reuse FacetCounter's match-set kernel with lat as the code
        # column (codes are opaque int64 there); lon rides alongside
        self._fc = FacetCounter(
            index_dir, cfg, shared_tables, decoded_refs,
            facet_ref=(ids, lat), facet_labels=[], denied_ref=denied_ref,
        )
        self.geo_lon = np.asarray(lon, dtype=np.int64)
        if self.geo_lon.size != self._fc.facet_ids.size:
            raise ValueError("lat/lon sidecars must align with doc ids")

    def __call__(self, batch):
        import pyarrow as pa_

        fc = self._fc
        qids, ns, slats, slons = [], [], [], []
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            docs = fc.disjunctive_matches_for_text(qtext)
            if not docs.size:
                continue
            idx = np.searchsorted(fc.facet_ids, docs)
            np.minimum(idx, fc.facet_ids.size - 1, out=idx)
            valid = fc.facet_ids[idx] == docs
            hit = idx[valid]
            if not hit.size:
                continue
            qids.append(qid)
            ns.append(int(hit.size))
            slats.append(int(fc.facet_codes[hit].sum()))
            slons.append(int(self.geo_lon[hit].sum()))
        return pa_.table(
            {
                "query_id": pa_.array(qids, type=pa_.int64()),
                "n_docs": pa_.array(ns, type=pa_.int64()),
                "sum_lat_e6": pa_.array(slats, type=pa_.int64()),
                "sum_lon_e6": pa_.array(slons, type=pa_.int64()),
            }
        )


def geo_centroid_search(
    index_dir: str,
    queries_ds,
    doc_ids,
    lat_e6,
    lon_e6,
    cfg=None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> (query_id, n_docs, sum_lat_e6,
    sum_lon_e6): the mergeable geo_centroid state per query (empty
    match sets emit no row, ES's absent-agg rule)."""
    import ray

    from mini_ivf_ray.config import PipelineConfig

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    ids = np.asarray(doc_ids, dtype=np.uint64)
    lat = np.asarray(lat_e6, dtype=np.int64)
    lon = np.asarray(lon_e6, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids, lat, lon = ids[order], lat[order], lon[order]
    shared = decoded = None
    if share == "decoded":
        from mini_ivf_ray.sources.decoded import share_decoded_index

        decoded = share_decoded_index(index_dir, cfg)
    elif share:
        from mini_ivf_ray.pipelines.query import share_segments

        shared = share_segments(index_dir, cfg.num_partitions)
    from mini_ivf_ray.pipelines.serving import _tombstone_ref

    denied_ref = _tombstone_ref(index_dir) if respect_deletes else None
    side_ref = ray.put((ids, lat, lon))
    return queries_ds.map_batches(
        GeoCentroidSearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded, side_ref),
        fn_constructor_kwargs={"denied_ref": denied_ref},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )


class GeoBoundsSearcher(GeoCentroidSearcher):
    """ES ``geo_bounds`` aggregation: the match set's bounding box —
    per query ONE row (n_docs, min/max lat_e6, min/max lon_e6).
    Same deployment and sidecar as the centroid; the mergeable state
    swaps additive sums for min/max (idempotent, order-free, equally
    shardable).  ES's wrap_longitude=false box (plain min/max, no
    dateline wrapping) — the wrapping variant is a driver-side
    post-pass over the same per-shard state and is not implemented."""

    def __call__(self, batch):
        import pyarrow as pa_

        fc = self._fc
        out = {k: [] for k in (
            "query_id", "n_docs", "min_lat_e6", "max_lat_e6",
            "min_lon_e6", "max_lon_e6",
        )}
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            docs = fc.disjunctive_matches_for_text(qtext)
            if not docs.size:
                continue
            idx = np.searchsorted(fc.facet_ids, docs)
            np.minimum(idx, fc.facet_ids.size - 1, out=idx)
            valid = fc.facet_ids[idx] == docs
            hit = idx[valid]
            if not hit.size:
                continue
            la = fc.facet_codes[hit]
            lo = self.geo_lon[hit]
            out["query_id"].append(qid)
            out["n_docs"].append(int(hit.size))
            out["min_lat_e6"].append(int(la.min()))
            out["max_lat_e6"].append(int(la.max()))
            out["min_lon_e6"].append(int(lo.min()))
            out["max_lon_e6"].append(int(lo.max()))
        return pa_.table(
            {
                "query_id": pa_.array(out["query_id"], type=pa_.int64()),
                "n_docs": pa_.array(out["n_docs"], type=pa_.int64()),
                "min_lat_e6": pa_.array(out["min_lat_e6"], type=pa_.int64()),
                "max_lat_e6": pa_.array(out["max_lat_e6"], type=pa_.int64()),
                "min_lon_e6": pa_.array(out["min_lon_e6"], type=pa_.int64()),
                "max_lon_e6": pa_.array(out["max_lon_e6"], type=pa_.int64()),
            }
        )


def geo_bounds_search(
    index_dir: str,
    queries_ds,
    doc_ids,
    lat_e6,
    lon_e6,
    cfg=None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> per query the match set's exact
    integer bounding box (empty match sets emit no row)."""
    import ray

    from mini_ivf_ray.config import PipelineConfig

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    ids = np.asarray(doc_ids, dtype=np.uint64)
    lat = np.asarray(lat_e6, dtype=np.int64)
    lon = np.asarray(lon_e6, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids, lat, lon = ids[order], lat[order], lon[order]
    shared = decoded = None
    if share == "decoded":
        from mini_ivf_ray.sources.decoded import share_decoded_index

        decoded = share_decoded_index(index_dir, cfg)
    elif share:
        from mini_ivf_ray.pipelines.query import share_segments

        shared = share_segments(index_dir, cfg.num_partitions)
    from mini_ivf_ray.pipelines.serving import _tombstone_ref

    denied_ref = _tombstone_ref(index_dir) if respect_deletes else None
    side_ref = ray.put((ids, lat, lon))
    return queries_ds.map_batches(
        GeoBoundsSearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded, side_ref),
        fn_constructor_kwargs={"denied_ref": denied_ref},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )

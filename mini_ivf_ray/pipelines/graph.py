"""Web link-graph operators: deterministic graph synthesis + distributed
PageRank over an edge Dataset.

A web-scale corpus carries a link graph (href edges between pages), and
the canonical whole-graph computation over it is PageRank.  The
operator here is the scale-shaped piece: ``pagerank(edges_ds,
nodes_ds)`` — bulk-synchronous iterations where each round is ONE
bucketed hash join (ranks -> edges on src, reusing
relational.bucketed_hash_join) plus ONE groupby-sum exchange
(contributions -> dst).  Nothing corpus-sized ever lands on the driver
and no O(N) array is broadcast: ranks travel as a slim (doc_id, rank)
dataset, edges stay put as the join's large side, and nodes with no
in-links fall out of a zero-row union instead of an outer join.

**Exact replay.**  Ranks are FIXED-POINT integers (``scale`` =
10^12): r0 = scale // N, share(u) = rank(u) // outdeg(u), and
r_{t+1}(v) = (15 * (scale // N)) // 100 + (85 * sum(shares into v)) // 100.
Integer sums are order-independent, so the result is bit-identical
across partitionings AND hash-identical to an unrolled SQL replay —
the float formulation would drift by summation order.  This is the
damped PageRank of Brin & Page 1998 with the "lost mass" convention
for rank leaked through zero-outdegree nodes (their share is dropped,
not redistributed — both sides of the oracle agree by construction).

**Synthetic graph.**  The testdata tables carry no hrefs, so
``synth_edges`` derives a deterministic multigraph from doc ids alone,
in the engine and in ANY SQL engine (the md5-substr form shared with
sampling.py): out-degree 1 + h60(id, "pr-deg") % max_deg, j-th target =
the (h60(id, "pr-dst:j") % N)-th doc in doc-id order, self-loops
dropped.  The id-order lookup table is a synthesis-only scaffold
(broadcast once; at real scale edges come from href extraction and
this helper is unused) — ``pagerank`` itself never sees it.

Reference analog: the iterative refinement loop of KMeans training
(mini-ivf index_ivfpq.cpp train/update passes) — same
"recompute-global-state-per-round" shape, re-expressed as Dataset
exchanges instead of shared-memory passes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.pipelines.sampling import salt_hash60

PR_SCALE = 10**12
HITS_SCALE = 10**9


def synth_edges(docs_ds, max_deg: int = 3, concurrency: int | None = None):
    """Deterministic synthetic link multigraph over a (doc_id) dataset:
    returns an edge Dataset (src, dst int64), self-loops removed.
    Replayable in SQL via the md5-substr UBIGINT form (see the
    ``pagerank`` oracle in __ray_entry__.py)."""
    import ray

    ids = np.sort(
        docs_ds.select_columns(["doc_id"])
        .to_pandas()["doc_id"]
        .to_numpy()
        .astype(np.int64)
    )
    n = ids.size
    ids_ref = ray.put(ids)

    def gen(batch: pa.Table) -> pa.Table:
        lut = ray.get(ids_ref)
        src = batch["doc_id"].to_numpy().astype(np.int64)
        deg = 1 + (salt_hash60(src, "pr-deg") % max_deg)
        out_s: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        for j in range(max_deg):
            has = deg > j
            s = src[has]
            if not s.size:
                break
            pos = salt_hash60(s, f"pr-dst:{j}") % n
            d = lut[pos]
            keep = d != s  # drop self-loops
            out_s.append(s[keep])
            out_d.append(d[keep])
        return pa.table(
            {
                "src": pa.array(
                    np.concatenate(out_s) if out_s else np.empty(0, np.int64),
                    type=pa.int64(),
                ),
                "dst": pa.array(
                    np.concatenate(out_d) if out_d else np.empty(0, np.int64),
                    type=pa.int64(),
                ),
            }
        )

    return docs_ds.select_columns(["doc_id"]).map_batches(
        gen, batch_format="pyarrow"
    )


def _share_partials(batch: pa.Table) -> pa.Table:
    """Combiner: per-batch (dst, share-sum) partials before the global
    groupby — the exchange carries at most (batches x distinct-dst)
    rows instead of one row per edge."""
    dst = batch["dst"].to_numpy().astype(np.int64)
    share = batch["rank"].to_numpy().astype(np.int64) // batch[
        "deg"
    ].to_numpy().astype(np.int64)
    uniq, inv = np.unique(dst, return_inverse=True)
    sums = np.zeros(uniq.size, dtype=np.int64)
    np.add.at(sums, inv, share)
    return pa.table(
        {
            "doc_id": pa.array(uniq, type=pa.int64()),
            "m": pa.array(sums, type=pa.int64()),
        }
    )


def _check_endpoints(
    ids: np.ndarray, src: np.ndarray, dst: np.ndarray, op: str
) -> None:
    """Edge endpoints must be a subset of the node set — the documented
    precondition of pagerank/hits (synth_edges and href extraction over
    the same corpus both satisfy it by construction).  The driver
    shortcut validates and raises LOUDLY; searchsorted index-mapping
    would otherwise misattribute an absent endpoint to a neighboring
    node.  The distributed path does not re-check at scale (an
    anti-join per call); callers own endpoint validity there."""
    for name, arr in (("src", src), ("dst", dst)):
        if not arr.size:
            continue
        ix = np.searchsorted(ids, arr)
        np.minimum(ix, ids.size - 1, out=ix)
        if not np.all(ids[ix] == arr):
            raise ValueError(
                f"{op}: edge {name} endpoints not in nodes_ds — edge "
                "endpoints must be a subset of the node set"
            )


def _pagerank_local(
    ids: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    iters: int,
    scale: int,
    seed_arr: np.ndarray | None,
) -> pa.Table:
    """Driver replay of the EXACT distributed fixed-point recurrence
    (vectorized np.add.at over index-mapped endpoints) — the
    small-graph shortcut, same integer ops, bit-identical labels."""
    n = ids.size
    s_ix = np.searchsorted(ids, src)
    d_ix = np.searchsorted(ids, dst)
    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, s_ix, 1)
    if seed_arr is None:
        base_v = (15 * (scale // n)) // 100
        r = np.full(n, scale // n, dtype=np.int64)
        base = np.full(n, base_v, dtype=np.int64)
    else:
        base_v = (15 * (scale // int(seed_arr.size))) // 100
        r0 = scale // int(seed_arr.size)
        mask = np.zeros(n, dtype=bool)
        ix = np.searchsorted(ids, seed_arr)
        np.minimum(ix, n - 1, out=ix)
        hit = ids[ix] == seed_arr
        mask[ix[hit]] = True
        r = np.where(mask, r0, 0).astype(np.int64)
        base = np.where(mask, base_v, 0).astype(np.int64)
    safe_deg = np.maximum(deg, 1)
    for _ in range(iters):
        m = np.zeros(n, dtype=np.int64)
        np.add.at(m, d_ix, r[s_ix] // safe_deg[s_ix])
        r = base + (85 * m) // 100
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "rank": pa.array(r, type=pa.int64()),
        }
    )


def pagerank(
    edges_ds,
    nodes_ds,
    iters: int = 5,
    scale: int = PR_SCALE,
    num_buckets: int | None = None,
    seeds=None,
    driver_threshold: int = 2_000_000,
):
    """Distributed fixed-point PageRank: (doc_id, rank int64) after
    ``iters`` damped rounds (d = 85/100).  Each round is one bucketed
    hash join (ranks onto edges by src) + one groupby-sum (shares by
    dst, combiner-first); zero-in-link nodes get the base rank via a
    zero-row union, never an outer join.  Bit-identical across
    partitionings and to the unrolled integer SQL replay.

    ``seeds`` (optional iterable of doc ids): PERSONALIZED PageRank
    (topic-sensitive PR, Haveliwala 2002) — the teleport mass lands
    only on the seed set: r0 and the per-round base term are
    scale // |seeds| on seeds and 0 elsewhere.  The seed set is
    broadcast once (``ray.put``, sorted int64) and must be small —
    it is the personalization vector, not a corpus-sized sidecar.
    Seeds absent from ``nodes_ds`` contribute no mass (total teleport
    mass is then < scale) — callers own seed validity.

    Graphs with edges + nodes at or below ``driver_threshold`` take
    the driver-replay shortcut (same convention as
    dedup.connected_components_ds): the identical integer recurrence
    runs vectorized on the driver — same labels, none of the
    per-exchange latency floors that dominate small graphs.  Pass 0 to
    force the distributed path (tests do)."""
    import ray
    import ray.data

    from mini_ivf_ray.pipelines.relational import bucketed_hash_join

    nodes = nodes_ds.select_columns(["doc_id"]).materialize()
    n = nodes.count()
    if n:
        # the bucketed join pads missing-side columns through float64,
        # so endpoint ids must be exactly float64-representable — raise
        # loudly rather than corrupt silently (testdata ids are far
        # below); enforced in BOTH modes so behavior never depends on
        # graph size
        agg = nodes.aggregate(ray.data.aggregate.Max("doc_id"))
        if int(agg["max(doc_id)"]) >= 2**53:
            raise ValueError(
                "pagerank requires doc ids < 2**53 (join padding is exact "
                "only in the float64-representable range); remap ids first"
            )
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                }
            )
        )
    seed_local = None
    if seeds is not None:
        seed_local = np.unique(np.asarray(list(seeds), dtype=np.int64))
        if not seed_local.size:
            raise ValueError("seeds must be non-empty when given")
    edges_cached = edges_ds.select_columns(["src", "dst"]).materialize()
    if n + edges_cached.count() <= driver_threshold:
        e = edges_cached.to_pandas()
        ids = np.sort(
            nodes.to_pandas()["doc_id"].to_numpy().astype(np.int64)
        )
        src = e["src"].to_numpy().astype(np.int64)
        dst = e["dst"].to_numpy().astype(np.int64)
        _check_endpoints(ids, src, dst, "pagerank")
        return ray.data.from_arrow(
            _pagerank_local(ids, src, dst, iters, scale, seed_local)
        )
    edges_ds = edges_cached
    seeds_ref = None
    if seed_local is not None:
        base = (15 * (scale // int(seed_local.size))) // 100
        r0 = scale // int(seed_local.size)
        seeds_ref = ray.put(seed_local)
    else:
        base = (15 * (scale // n)) // 100
        r0 = scale // n

    def _base_mask(doc_ids: np.ndarray) -> np.ndarray:
        """Per-doc teleport base: uniform, or seed-only when
        personalized."""
        if seeds_ref is None:
            return np.full(doc_ids.size, base, dtype=np.int64)
        sd = ray.get(seeds_ref)
        out = np.zeros(doc_ids.size, dtype=np.int64)
        idx = np.searchsorted(sd, doc_ids)
        np.minimum(idx, sd.size - 1, out=idx)
        out[sd[idx] == doc_ids] = base
        return out

    # per-edge out-degree, attached to edges ONCE and reused every
    # round (the static side of the iteration)
    deg = edges_ds.groupby("src").count()

    def _deg_col(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.compute.cast(batch["src"], pa.int64()),
                "deg": pa.compute.cast(batch["count()"], pa.int64()),
            }
        )

    deg = deg.map_batches(_deg_col, batch_format="pyarrow")
    edges_deg = bucketed_hash_join(
        edges_ds, deg, on="src", num_buckets=num_buckets
    ).materialize()

    def _init(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        if seeds_ref is None:
            init = np.full(ids.size, r0, dtype=np.int64)
        else:
            sd = ray.get(seeds_ref)
            init = np.zeros(ids.size, dtype=np.int64)
            idx = np.searchsorted(sd, ids)
            np.minimum(idx, sd.size - 1, out=idx)
            init[sd[idx] == ids] = r0
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "rank": pa.array(init, type=pa.int64()),
            }
        )

    def _zero(batch: pa.Table) -> pa.Table:
        k = batch.num_rows
        return pa.table(
            {
                "doc_id": pa.compute.cast(batch["doc_id"], pa.int64()),
                "m": pa.array(np.zeros(k, dtype=np.int64), type=pa.int64()),
            }
        )

    def _finish(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        m = batch["sum(m)"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "rank": pa.array(
                    _base_mask(ids) + (85 * m) // 100, type=pa.int64()
                ),
            }
        )

    ranks = nodes.map_batches(_init, batch_format="pyarrow")
    zeros = nodes.map_batches(_zero, batch_format="pyarrow").materialize()

    def _rename_src(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["src", "rank"])

    for _ in range(iters):
        rsrc = ranks.map_batches(_rename_src, batch_format="pyarrow")
        joined = bucketed_hash_join(
            edges_deg, rsrc, on="src", num_buckets=num_buckets
        )
        partials = joined.map_batches(_share_partials, batch_format="pyarrow")
        summed = partials.union(zeros).groupby("doc_id").sum("m")
        ranks = summed.map_batches(_finish, batch_format="pyarrow").materialize()
    return ranks


def cocitation_topn(edges_ds, n: int = 50, num_buckets: int | None = None):
    """Co-citation related-pages counts (Dean & Henzinger 1999, "Finding
    related pages in the World Wide Web"): two pages u < v are co-cited
    once for every page that links to both; the top-``n`` pairs by
    (count desc, u asc, v asc) are the corpus's strongest relatedness
    signals.  Returns (u, v, cnt int64).

    Shape: ONE bucketed hash self-join of the edge list on src (the
    fan-out is outdeg^2 per source — bounded by the per-page link cap,
    the standard co-citation practice) -> per-batch (u, v) count
    partials -> ONE groupby-sum -> per-block top-n partials merged
    driver-side ((blocks x n) rows, never pair-proportional).
    Multigraph semantics: parallel edges multiply pair counts (each
    (edge_u, edge_v) combination counts — both oracle sides agree by
    construction)."""
    import ray.data

    from mini_ivf_ray.pipelines.relational import bucketed_hash_join

    edges = edges_ds.select_columns(["src", "dst"])

    def _rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["src", "dst2"])

    other = edges.map_batches(_rename, batch_format="pyarrow")
    joined = bucketed_hash_join(edges, other, on="src", num_buckets=num_buckets)

    def _pair_partials(batch: pa.Table) -> pa.Table:
        u = batch["dst"].to_numpy().astype(np.int64)
        v = batch["dst2"].to_numpy().astype(np.int64)
        keep = u < v
        u, v = u[keep], v[keep]
        if not u.size:
            e = pa.array([], type=pa.int64())
            return pa.table({"u": e, "v": e, "c": e})
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        first = np.ones(u.size, dtype=bool)
        first[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, u.size))
        return pa.table(
            {
                "u": pa.array(u[starts], type=pa.int64()),
                "v": pa.array(v[starts], type=pa.int64()),
                "c": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    summed = (
        joined.map_batches(_pair_partials, batch_format="pyarrow")
        .groupby(["u", "v"])
        .sum("c")
    )

    def _block_topn(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy().astype(np.int64)
        v = batch["v"].to_numpy().astype(np.int64)
        c = batch["sum(c)"].to_numpy().astype(np.int64)
        order = np.lexsort((v, u, -c))[:n]
        return pa.table(
            {
                "u": pa.array(u[order], type=pa.int64()),
                "v": pa.array(v[order], type=pa.int64()),
                "cnt": pa.array(c[order], type=pa.int64()),
            }
        )

    parts = summed.map_batches(_block_topn, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["cnt", "u", "v"], ascending=[False, True, True], kind="mergesort"
    ).head(n)
    return pa.table(
        {
            "u": pa.array(parts["u"].to_numpy(), type=pa.int64()),
            "v": pa.array(parts["v"].to_numpy(), type=pa.int64()),
            "cnt": pa.array(parts["cnt"].to_numpy(), type=pa.int64()),
        }
    )


def coupling_topn(edges_ds, n: int = 50, num_buckets: int | None = None):
    """Bibliographic coupling (Kessler 1963, the dual of co-citation):
    two pages u < v are coupled once for every page BOTH link to.
    Exactly co-citation over the reversed edge list — one column swap,
    the same join/groupby/top-n machinery."""

    def _swap(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.compute.cast(batch["dst"], pa.int64()),
                "dst": pa.compute.cast(batch["src"], pa.int64()),
            }
        )

    rev = edges_ds.select_columns(["src", "dst"]).map_batches(
        _swap, batch_format="pyarrow"
    )
    return cocitation_topn(rev, n=n, num_buckets=num_buckets)


def _value_partials(key: str, deg_key: str | None = None):
    """Combiner for HITS/SALSA half-rounds: per-batch (endpoint,
    value-sum) partials before the global groupby — the exchange
    carries at most (batches x distinct-endpoint) rows instead of one
    row per edge.  ``deg_key``: divide each edge's contribution by the
    propagating endpoint's degree first (the SALSA random-walk step,
    integer floor division — exactly replayable)."""

    def f(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy().astype(np.int64)
        v = batch["v"].to_numpy().astype(np.int64)
        if deg_key is not None:
            v = v // batch[deg_key].to_numpy().astype(np.int64)
        uniq, inv = np.unique(k, return_inverse=True)
        sums = np.zeros(uniq.size, dtype=np.int64)
        np.add.at(sums, inv, v)
        return pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "m": pa.array(sums, type=pa.int64()),
            }
        )

    return f


def _hits_local(
    ids: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    iters: int,
    scale: int,
    stochastic: bool,
) -> pa.Table:
    """Driver replay of the EXACT HITS/SALSA fixed-point recurrence
    (vectorized np.add.at) — the small-graph shortcut, same integer
    ops, bit-identical scores."""
    n = ids.size
    s_ix = np.searchsorted(ids, src)
    d_ix = np.searchsorted(ids, dst)
    od = np.zeros(n, dtype=np.int64)
    idg = np.zeros(n, dtype=np.int64)
    np.add.at(od, s_ix, 1)
    np.add.at(idg, d_ix, 1)
    safe_od = np.maximum(od, 1)
    safe_id = np.maximum(idg, 1)
    h = np.full(n, scale, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        a = np.zeros(n, dtype=np.int64)
        hv = h[s_ix] // safe_od[s_ix] if stochastic else h[s_ix]
        np.add.at(a, d_ix, hv)
        a //= max(1, int(a.max(initial=0)) // scale)
        hh = np.zeros(n, dtype=np.int64)
        av = a[d_ix] // safe_id[d_ix] if stochastic else a[d_ix]
        np.add.at(hh, s_ix, av)
        h = hh // max(1, int(hh.max(initial=0)) // scale)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "auth": pa.array(a, type=pa.int64()),
            "hub": pa.array(h, type=pa.int64()),
        }
    )


def hits(edges_ds, nodes_ds, iters: int = 3, scale: int = HITS_SCALE,
         num_buckets: int | None = None, stochastic: bool = False,
         driver_threshold: int = 2_000_000):
    """Distributed fixed-point HITS (Kleinberg 1999, "Authoritative
    sources in a hyperlinked environment"): returns (doc_id, auth, hub)
    after ``iters`` mutual-reinforcement rounds over a (src, dst) edge
    Dataset.  Each round is two half-rounds, each ONE bucketed hash
    join (scores onto edges by the propagating endpoint, reusing
    relational.bucketed_hash_join) + ONE combiner-first groupby-sum:

        auth_raw(v) = sum over edges u->v of hub(u)
        hub_raw(u)  = sum over edges u->v of auth(v)

    **Exact replay.**  Scores are fixed-point int64.  Power iteration
    converges to the principal eigenvectors under ANY positive
    rescaling, so instead of the float L2 norm each half-round
    MAX-normalizes with an integer divisor:

        D = max(1, max_raw // scale);   score = raw // D

    which keeps every score < 2 * scale (mx // max(1, mx // scale) is
    maximal just below an exact multiple; magnitudes stay bounded, no
    int64 overflow: a node's raw value is <= degree * 2 * scale) and
    — because
    integer sums and divisions are order-independent — makes the result
    bit-identical across partitionings and hash-identical to an
    unrolled SQL replay.  h_0 = scale on every node; a node with no
    in-links has auth 0, no out-links hub 0 (zero-row union, never an
    outer join).  Multigraph semantics: parallel edges each contribute
    (both sides of the oracle agree by construction).

    ``stochastic=True`` is SALSA (Lempel & Moran 2000, "The stochastic
    approach for link-structure analysis"): each half-round divides the
    propagating endpoint's score by its degree first —
    auth_raw(v) = sum over u->v of hub(u) // outdeg(u),
    hub_raw(u) = sum over u->v of auth(v) // indeg(v) — the
    random-walk normalization that makes SALSA robust to the
    tightly-knit-community effect HITS suffers from.  Degrees are
    attached to the edge Dataset ONCE (two bucketed joins before the
    loop) and reused every round; the floor division is part of the
    exact fixed-point convention, replayed verbatim by the SQL oracle.

    Graphs at or below ``driver_threshold`` (nodes + edges) take the
    driver-replay shortcut — identical integer recurrence, vectorized,
    bit-identical scores; pass 0 to force the distributed path (the
    connected_components_ds convention).

    Reference analog: the same recompute-global-state-per-round shape
    as KMeans training (mini-ivf index_ivfpq.cpp train/update passes),
    like ``pagerank`` above."""
    import ray
    import ray.data

    from mini_ivf_ray.pipelines.relational import bucketed_hash_join

    nodes = nodes_ds.select_columns(["doc_id"]).materialize()
    n = nodes.count()
    if n == 0:
        empty = pa.array([], type=pa.int64())
        return ray.data.from_arrow(
            pa.table({"doc_id": empty, "auth": empty, "hub": empty})
        )
    agg = nodes.aggregate(ray.data.aggregate.Max("doc_id"))
    if int(agg["max(doc_id)"]) >= 2**53:
        raise ValueError(
            "hits requires doc ids < 2**53 (join padding is exact "
            "only in the float64-representable range); remap ids first"
        )
    edges_cached = edges_ds.select_columns(["src", "dst"]).materialize()
    if n + edges_cached.count() <= driver_threshold:
        # small-graph driver replay (same convention as
        # connected_components_ds; distributed path forced in tests)
        e = edges_cached.to_pandas()
        ids = np.sort(
            nodes.to_pandas()["doc_id"].to_numpy().astype(np.int64)
        )
        src = e["src"].to_numpy().astype(np.int64)
        dst = e["dst"].to_numpy().astype(np.int64)
        _check_endpoints(ids, src, dst, "hits")
        return ray.data.from_arrow(
            _hits_local(ids, src, dst, iters, scale, stochastic)
        )
    edges_ds = edges_cached

    def _zero(batch: pa.Table) -> pa.Table:
        k = batch.num_rows
        return pa.table(
            {
                "doc_id": pa.compute.cast(batch["doc_id"], pa.int64()),
                "m": pa.array(np.zeros(k, dtype=np.int64), type=pa.int64()),
            }
        )

    def _init(batch: pa.Table) -> pa.Table:
        k = batch.num_rows
        return pa.table(
            {
                "doc_id": pa.compute.cast(batch["doc_id"], pa.int64()),
                "v": pa.array(np.full(k, scale, dtype=np.int64), type=pa.int64()),
            }
        )

    def _raw(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.compute.cast(batch["doc_id"], pa.int64()),
                "v": pa.compute.cast(batch["sum(m)"], pa.int64()),
            }
        )

    def _rename(col: str):
        def f(batch: pa.Table) -> pa.Table:
            return batch.rename_columns([col, "v"])

        return f

    def _div(d: int):
        def f(batch: pa.Table) -> pa.Table:
            v = batch["v"].to_numpy().astype(np.int64) // d
            return pa.table(
                {
                    "doc_id": pa.compute.cast(batch["doc_id"], pa.int64()),
                    "v": pa.array(v, type=pa.int64()),
                }
            )

        return f

    zeros = nodes.map_batches(_zero, batch_format="pyarrow").materialize()
    edges = edges_ds  # already slim + materialized by the threshold check
    if stochastic:
        # SALSA: per-edge degrees of BOTH endpoints, attached once and
        # reused every round (the static side of the iteration)
        def _deg(key: str, out: str):
            def f(batch: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        key: pa.compute.cast(batch[key], pa.int64()),
                        out: pa.compute.cast(batch["count()"], pa.int64()),
                    }
                )

            return f

        odeg = edges.groupby("src").count().map_batches(
            _deg("src", "odeg"), batch_format="pyarrow"
        )
        ideg = edges.groupby("dst").count().map_batches(
            _deg("dst", "ideg"), batch_format="pyarrow"
        )
        edges = bucketed_hash_join(
            edges, odeg, on="src", num_buckets=num_buckets
        )
        edges = bucketed_hash_join(
            edges, ideg, on="dst", num_buckets=num_buckets
        ).materialize()

    def _half(scores, prop_key: str, sum_key: str):
        """One half-round: propagate ``scores`` along edges keyed by
        ``prop_key``, sum at ``sum_key``, max-normalize."""
        keyed = scores.map_batches(_rename(prop_key), batch_format="pyarrow")
        joined = bucketed_hash_join(
            edges, keyed, on=prop_key, num_buckets=num_buckets
        )
        deg_key = None
        if stochastic:
            deg_key = "odeg" if prop_key == "src" else "ideg"
        partials = joined.map_batches(
            _value_partials(sum_key, deg_key), batch_format="pyarrow"
        )
        raw = (
            partials.union(zeros)
            .groupby("doc_id")
            .sum("m")
            .map_batches(_raw, batch_format="pyarrow")
            .materialize()
        )
        mx = int(raw.aggregate(ray.data.aggregate.Max("v"))["max(v)"])
        d = max(1, mx // scale)
        return raw.map_batches(_div(d), batch_format="pyarrow").materialize()

    hub = nodes.map_batches(_init, batch_format="pyarrow").materialize()
    auth = None
    for _ in range(iters):
        auth = _half(hub, "src", "dst")
        hub = _half(auth, "dst", "src")

    def _auth_col(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["doc_id", "auth"])

    def _hub_col(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["doc_id", "hub"])

    return bucketed_hash_join(
        auth.map_batches(_auth_col, batch_format="pyarrow"),
        hub.map_batches(_hub_col, batch_format="pyarrow"),
        on="doc_id",
        num_buckets=num_buckets,
    )


def salsa(edges_ds, nodes_ds, iters: int = 3, scale: int = HITS_SCALE,
          num_buckets: int | None = None,
          driver_threshold: int = 2_000_000):
    """SALSA hubs & authorities (Lempel & Moran 2000): the random-walk
    variant of HITS — every propagated score is first divided by the
    propagating endpoint's degree, damping the tightly-knit-community
    effect.  Thin alias for ``hits(..., stochastic=True)``; see there
    for the exact fixed-point replay convention."""
    return hits(
        edges_ds, nodes_ds, iters=iters, scale=scale,
        num_buckets=num_buckets, stochastic=True,
        driver_threshold=driver_threshold,
    )


def _bfs_local(
    src: np.ndarray, dst: np.ndarray, seed_arr: np.ndarray, max_hops: int
) -> pa.Table:
    """Driver replay of the exact level-synchronous BFS (vectorized
    per level) — the small-graph shortcut, identical (doc_id, dist)."""
    order = np.argsort(src, kind="stable")
    s_sorted, d_sorted = src[order], dst[order]
    dist_ids = seed_arr.copy()
    dist_vals = np.zeros(seed_arr.size, dtype=np.int64)
    frontier = seed_arr
    for t in range(1, max_hops + 1):
        if not frontier.size or not s_sorted.size:
            break
        lo = np.searchsorted(s_sorted, frontier, side="left")
        hi = np.searchsorted(s_sorted, frontier, side="right")
        spans = hi - lo
        if not spans.sum():
            break
        take = np.concatenate(
            [d_sorted[a:b] for a, b in zip(lo, hi) if b > a]
        )
        cand = np.unique(take)
        new = cand[~np.isin(cand, dist_ids)]
        if not new.size:
            break
        dist_ids = np.concatenate([dist_ids, new])
        dist_vals = np.concatenate(
            [dist_vals, np.full(new.size, t, dtype=np.int64)]
        )
        frontier = new
    order = np.argsort(dist_ids, kind="stable")
    return pa.table(
        {
            "doc_id": pa.array(dist_ids[order], type=pa.int64()),
            "dist": pa.array(dist_vals[order], type=pa.int64()),
        }
    )


def bfs_hops(edges_ds, seeds, max_hops: int = 3,
             num_buckets: int | None = None,
             driver_threshold: int = 2_000_000):
    """Multi-source BFS hop distance over the link graph: (doc_id,
    dist int64) for every node reachable from ``seeds`` within
    ``max_hops`` directed hops — dist is the MINIMAL hop count, seeds
    are dist 0.  The crawl-scheduling / seed-neighborhood primitive
    (how far is every page from the trusted seed set).

    Level-synchronous frontier expansion: round t is ONE bucketed hash
    join (frontier ids onto edges by src), ONE groupby dedup of the
    targets, and ONE bucketed LEFT anti-join against the visited set
    (unmatched rows are the newly reached nodes — frontier t+1).
    State is two slim int64 columns over REACHED nodes only; nothing
    corpus-sized lands on the driver and the loop exits early when a
    frontier is empty.  No 2**53 id guard is needed here: the LEFT
    join's missing side contributes only the ``dist`` column, whose
    float64 NaN-ness is all the anti-join reads — the ids themselves
    ride the join KEY, which pandas keeps int64.

    Correctness frame shared with the SQL oracle: min-over-walks ==
    min-over-paths, so an oracle that unions "reachable in exactly i
    hops along some walk" levels and takes min(dist) agrees exactly
    with the engine's revisit-suppressed frontier (the anti-join only
    keeps frontiers from re-inflating; it never changes min dist).
    """
    import ray
    import ray.data

    from mini_ivf_ray.pipelines.relational import bucketed_hash_join

    seed_arr = np.unique(np.asarray(list(seeds), dtype=np.int64))
    if not seed_arr.size:
        raise ValueError("seeds must be non-empty")
    edges_cached = edges_ds.select_columns(["src", "dst"]).materialize()
    if seed_arr.size + edges_cached.count() <= driver_threshold:
        # small-graph driver replay (connected_components_ds
        # convention; the distributed path is forced in tests)
        e = edges_cached.to_pandas()
        return ray.data.from_arrow(
            _bfs_local(
                e["src"].to_numpy().astype(np.int64),
                e["dst"].to_numpy().astype(np.int64),
                seed_arr,
                max_hops,
            )
        )
    edges_ds = edges_cached

    def _tbl(ids: np.ndarray, dist: int) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "dist": pa.array(
                    np.full(ids.size, dist, dtype=np.int64), type=pa.int64()
                ),
            }
        )

    visited = ray.data.from_arrow(_tbl(seed_arr, 0)).materialize()
    frontier = ray.data.from_arrow(
        pa.table({"src": pa.array(seed_arr, type=pa.int64())})
    )
    edges = edges_ds  # already slim + materialized by the threshold check

    def _dst_only(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": pa.compute.cast(batch["dst"], pa.int64())}
        )

    def _ids_only(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": pa.compute.cast(batch["doc_id"], pa.int64())}
        )

    def _keep_unseen(dist: int):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy().astype(np.int64)
            # arrow-cast first: int64-with-nulls reaches numpy as object
            # dtype, float64 nulls become NaN uniformly (redirects.py)
            seen = pa.compute.cast(batch["dist"], pa.float64()).to_numpy(
                zero_copy_only=False
            )
            new = ids[np.isnan(seen)]
            return _tbl(new, dist)

        return f

    def _as_src(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"src": pa.compute.cast(batch["doc_id"], pa.int64())}
        )

    for t in range(1, max_hops + 1):
        joined = bucketed_hash_join(
            edges, frontier, on="src", num_buckets=num_buckets
        )
        dsts = (
            joined.map_batches(_dst_only, batch_format="pyarrow")
            .groupby("doc_id")
            .count()
            .map_batches(_ids_only, batch_format="pyarrow")
        ).materialize()
        if dsts.count() == 0:
            # dead frontier (no out-edges at all): nothing left to reach
            break
        anti = bucketed_hash_join(
            dsts, visited, on="doc_id", num_buckets=num_buckets, how="left"
        )
        new = anti.map_batches(
            _keep_unseen(t), batch_format="pyarrow"
        ).materialize()
        if new.count() == 0:
            break
        visited = visited.union(new).materialize()
        frontier = new.map_batches(_as_src, batch_format="pyarrow")
    return visited


def _triangles_local(src: np.ndarray, dst: np.ndarray) -> pa.Table:
    """Driver replay of the exact degree-ordered triangle count —
    VECTORIZED (pandas merges mirror the distributed wedge/closure
    joins; no per-edge Python loops, so the 2M-edge threshold costs
    seconds, not minutes): canonical undirected simple graph, per-node
    triangle counts for nodes in >= 1 triangle."""
    import pandas as pd

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "triangles": pa.array([], type=pa.int64()),
        }
    )
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    keep = lo != hi
    if not keep.any():
        return empty
    pairs = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
    nodes, inv = np.unique(pairs.ravel(), return_inverse=True)
    deg = np.bincount(inv, minlength=nodes.size)
    ui = inv[0::2].astype(np.int64)  # pairs[:, 0] index-mapped
    vi = inv[1::2].astype(np.int64)
    du, dv = deg[ui], deg[vi]
    u_first = (du < dv) | ((du == dv) & (ui < vi))
    a = np.where(u_first, ui, vi)  # oriented low -> high in (deg, id)
    b = np.where(u_first, vi, ui)
    oriented = pd.DataFrame({"a": a, "b": b})
    # wedges: self-merge on the pivot, keep canonical (deg,id)-ordered
    # endpoint pairs (each unordered wedge once, diagonal dropped)
    w = oriented.merge(oriented, on="a", suffixes=("", "_c"))
    bb, cc = w["b"].to_numpy(), w["b_c"].to_numpy()
    dbb, dcc = deg[bb], deg[cc]
    keep_w = (dbb < dcc) | ((dbb == dcc) & (bb < cc))
    wedges = pd.DataFrame(
        {"p": w["a"].to_numpy()[keep_w], "b": bb[keep_w], "c": cc[keep_w]}
    )
    closed = wedges.merge(
        oriented.rename(columns={"a": "b", "b": "c"}),
        on=["b", "c"],
        how="inner",
    )
    if not len(closed):
        return empty
    corners = np.concatenate(
        [closed["p"].to_numpy(), closed["b"].to_numpy(),
         closed["c"].to_numpy()]
    )
    counts = np.bincount(corners, minlength=nodes.size)
    nz = np.flatnonzero(counts)
    return pa.table(
        {
            "doc_id": pa.array(nodes[nz], type=pa.int64()),
            "triangles": pa.array(
                counts[nz].astype(np.int64), type=pa.int64()
            ),
        }
    )


def _enumerate_triangles(und, num_buckets=None):
    """Canonical triangle Dataset (pivot, b, c) from a CANONICAL unique
    edge Dataset (id_a < id_b): the Schank & Wagner 2005 degree
    orientation — degrees attached by two bucketed joins, edges
    oriented low->high in (degree, id) order so any node's forward
    fan-out is O(sqrt(m)), ONE bucketed wedge self-join on the pivot,
    ONE bucketed semi-join of wedge endpoints against the oriented
    edge set.  Every triangle appears exactly ONCE (its unique
    (deg,id)-minimal pivot).  Shared by triangle_counts (per-node
    credit) and ktruss (per-edge credit, re-run per peel round)."""
    from mini_ivf_ray.pipelines.relational import bucketed_hash_join

    def _explode(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy().astype(np.int64)
        b = batch["id_b"].to_numpy().astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(np.concatenate([a, b]), type=pa.int64())}
        )

    deg = und.map_batches(_explode, batch_format="pyarrow").groupby(
        "doc_id"
    ).count()

    def _deg(key: str):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key: pa.compute.cast(batch["doc_id"], pa.int64()),
                    f"deg_{key}": pa.compute.cast(
                        batch["count()"], pa.int64()
                    ),
                }
            )

        return f

    da = deg.map_batches(_deg("id_a"), batch_format="pyarrow")
    db = deg.map_batches(_deg("id_b"), batch_format="pyarrow")
    j = bucketed_hash_join(und, da, on="id_a", num_buckets=num_buckets)
    j = bucketed_hash_join(j, db, on="id_b", num_buckets=num_buckets)

    def _orient(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy().astype(np.int64)
        b = batch["id_b"].to_numpy().astype(np.int64)
        ka = batch["deg_id_a"].to_numpy().astype(np.int64)
        kb = batch["deg_id_b"].to_numpy().astype(np.int64)
        a_first = (ka < kb) | ((ka == kb) & (a < b))
        lo = np.where(a_first, a, b)
        hi = np.where(a_first, b, a)
        dlo = np.where(a_first, ka, kb)
        dhi = np.where(a_first, kb, ka)
        return pa.table(
            {
                "u": pa.array(lo, type=pa.int64()),
                "v": pa.array(hi, type=pa.int64()),
                "du": pa.array(dlo, type=pa.int64()),
                "dv": pa.array(dhi, type=pa.int64()),
            }
        )

    oriented = j.map_batches(_orient, batch_format="pyarrow").materialize()

    def _as_wedge_side(batch: pa.Table) -> pa.Table:
        # second copy of the oriented edges for the self-join, renamed
        return pa.table(
            {
                "u": pa.compute.cast(batch["u"], pa.int64()),
                "w": pa.compute.cast(batch["v"], pa.int64()),
                "dw": pa.compute.cast(batch["dv"], pa.int64()),
            }
        )

    wside = oriented.map_batches(_as_wedge_side, batch_format="pyarrow")
    wj = bucketed_hash_join(oriented, wside, on="u", num_buckets=num_buckets)

    def _wedges(batch: pa.Table) -> pa.Table:
        v = batch["v"].to_numpy().astype(np.int64)
        dv = batch["dv"].to_numpy().astype(np.int64)
        w = batch["w"].to_numpy().astype(np.int64)
        dw = batch["dw"].to_numpy().astype(np.int64)
        u = batch["u"].to_numpy().astype(np.int64)
        # canonical wedge (b, c) with k(b) < k(c): keeps each unordered
        # pair once and drops the v == w diagonal
        keep = (dv < dw) | ((dv == dw) & (v < w))
        b, c = v[keep], w[keep]
        key = np.char.add(
            np.char.add(b.astype("U20"), ":"), c.astype("U20")
        )
        return pa.table(
            {
                "key": pa.array(key.tolist(), type=pa.string()),
                "pivot": pa.array(u[keep], type=pa.int64()),
                "b": pa.array(b, type=pa.int64()),
                "c": pa.array(c, type=pa.int64()),
            }
        )

    wedges = wj.map_batches(_wedges, batch_format="pyarrow")

    def _edge_keys(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy().astype(np.int64)
        v = batch["v"].to_numpy().astype(np.int64)
        key = np.char.add(
            np.char.add(u.astype("U20"), ":"), v.astype("U20")
        )
        return pa.table(
            {
                "key": pa.array(key.tolist(), type=pa.string()),
                "closed": pa.array(
                    np.ones(u.size, dtype=np.int64), type=pa.int64()
                ),
            }
        )

    ekeys = oriented.map_batches(_edge_keys, batch_format="pyarrow")
    closed = bucketed_hash_join(
        wedges, ekeys, on="key", num_buckets=num_buckets
    )

    return closed


def triangle_counts(edges_ds, num_buckets: int | None = None,
                    driver_threshold: int = 2_000_000):
    """Per-node triangle counts over the UNDIRECTED simple graph
    derived from the link multigraph (parallel edges collapse, self
    loops drop): (doc_id, triangles int64) for every node in at least
    one triangle — the local community-structure / clustering signal
    (global triangle total = sum // 3).

    Distributed shape (node-iterator++ with degree ordering, Schank &
    Wagner 2005): canonical pair dedup (ONE bucketed groupby), degree
    counts (ONE groupby), degrees attached to both endpoints (two
    bucketed joins), edges ORIENTED low->high in (degree, id) order —
    the classic bound that caps any node's forward fan-out at
    O(sqrt(m)) so hub skew cannot blow up the wedge join — then ONE
    bucketed self-join on the wedge pivot and ONE bucketed semi-join of
    wedge endpoints against the oriented edge set (exact string pair
    keys, never hashes), and a final per-node groupby-sum.  Every
    triangle is generated exactly once (its unique (deg,id)-minimal
    pivot), so per-node counts need no dedup.

    Graphs at or below ``driver_threshold`` edges take the
    driver-replay shortcut (connected_components_ds convention; 0
    forces distributed — tests do)."""
    import ray
    import ray.data

    from mini_ivf_ray.pipelines.relational import bucketed_hash_join

    raw = edges_ds.select_columns(["src", "dst"]).materialize()
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "triangles": pa.array([], type=pa.int64()),
        }
    )
    if raw.count() == 0:
        return ray.data.from_arrow(empty)
    if raw.count() <= driver_threshold:
        e = raw.to_pandas()
        return ray.data.from_arrow(
            _triangles_local(
                e["src"].to_numpy().astype(np.int64),
                e["dst"].to_numpy().astype(np.int64),
            )
        )

    def _canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy().astype(np.int64)
        d = batch["dst"].to_numpy().astype(np.int64)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        keep = lo != hi
        return pa.table(
            {
                "id_a": pa.array(lo[keep], type=pa.int64()),
                "id_b": pa.array(hi[keep], type=pa.int64()),
            }
        )

    from mini_ivf_ray.pipelines.dedup import dedup_pairs_ds

    und = dedup_pairs_ds(
        raw.map_batches(_canon, batch_format="pyarrow"),
        num_buckets=num_buckets,
    ).materialize()

    closed = _enumerate_triangles(und, num_buckets)

    def _tri_nodes(batch: pa.Table) -> pa.Table:
        p = batch["pivot"].to_numpy().astype(np.int64)
        b = batch["b"].to_numpy().astype(np.int64)
        c = batch["c"].to_numpy().astype(np.int64)
        nodes = np.concatenate([p, b, c])
        uniq, inv = np.unique(nodes, return_inverse=True)
        sums = np.zeros(uniq.size, dtype=np.int64)
        np.add.at(sums, inv, 1)
        return pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "t": pa.array(sums, type=pa.int64()),
            }
        )

    per_node = (
        closed.map_batches(_tri_nodes, batch_format="pyarrow")
        .groupby("doc_id")
        .sum("t")
    )

    def _finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.compute.cast(batch["doc_id"], pa.int64()),
                "triangles": pa.compute.cast(batch["sum(t)"], pa.int64()),
            }
        )

    return per_node.map_batches(_finish, batch_format="pyarrow")


def clustering_coefficient(edges_ds, num_buckets: int | None = None,
                           driver_threshold: int = 2_000_000):
    """Local clustering coefficient over the undirected simple graph
    (Watts & Strogatz 1998): for every node with degree >= 2,
    cc = 2 * triangles(v) / (deg(v) * (deg(v) - 1)) — how close the
    node's neighborhood is to a clique, the standard community-density
    signal.  Returns (doc_id, deg, triangles, cc float64); nodes in no
    triangle get cc = 0.0.

    Composition: ``triangle_counts`` (its exactness and skew story
    apply unchanged) + ONE degree groupby over the canonical pair set
    + ONE bucketed LEFT join (triangles onto degrees — zero-triangle
    nodes pad to 0).  The cc division is one IEEE float64 multiply /
    divide, identical in the SQL oracle.  Same adaptive threshold
    convention; 0 forces distributed."""
    import ray
    import ray.data

    from mini_ivf_ray.pipelines.relational import bucketed_hash_join

    raw = edges_ds.select_columns(["src", "dst"]).materialize()
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "deg": pa.array([], type=pa.int64()),
            "triangles": pa.array([], type=pa.int64()),
            "cc": pa.array([], type=pa.float64()),
        }
    )
    if raw.count() == 0:
        return ray.data.from_arrow(empty)

    def _cc_tbl(ids, deg, tri) -> pa.Table:
        cc = (2.0 * tri.astype(np.float64)) / (
            deg.astype(np.float64) * (deg.astype(np.float64) - 1.0)
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "deg": pa.array(deg, type=pa.int64()),
                "triangles": pa.array(tri, type=pa.int64()),
                "cc": pa.array(cc, type=pa.float64()),
            }
        )

    if raw.count() <= driver_threshold:
        e = raw.to_pandas()
        src = e["src"].to_numpy().astype(np.int64)
        dst = e["dst"].to_numpy().astype(np.int64)
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        keep = lo != hi
        if not keep.any():
            return ray.data.from_arrow(empty)
        pairs = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
        nodes, inv = np.unique(pairs.ravel(), return_inverse=True)
        deg = np.bincount(inv, minlength=nodes.size).astype(np.int64)
        tri_tbl = _triangles_local(src, dst)
        tmap = dict(
            zip(
                tri_tbl["doc_id"].to_numpy().tolist(),
                tri_tbl["triangles"].to_numpy().tolist(),
            )
        )
        m = deg >= 2
        ids = nodes[m]
        tri = np.array([tmap.get(int(i), 0) for i in ids], dtype=np.int64)
        return ray.data.from_arrow(_cc_tbl(ids, deg[m], tri))

    def _canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy().astype(np.int64)
        d = batch["dst"].to_numpy().astype(np.int64)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        keep = lo != hi
        return pa.table(
            {
                "id_a": pa.array(lo[keep], type=pa.int64()),
                "id_b": pa.array(hi[keep], type=pa.int64()),
            }
        )

    from mini_ivf_ray.pipelines.dedup import dedup_pairs_ds

    und = dedup_pairs_ds(
        raw.map_batches(_canon, batch_format="pyarrow"),
        num_buckets=num_buckets,
    ).materialize()

    def _explode(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy().astype(np.int64)
        b = batch["id_b"].to_numpy().astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(np.concatenate([a, b]), type=pa.int64())}
        )

    def _deg_named(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.compute.cast(batch["doc_id"], pa.int64()),
                "deg": pa.compute.cast(batch["count()"], pa.int64()),
            }
        )

    degs = (
        und.map_batches(_explode, batch_format="pyarrow")
        .groupby("doc_id")
        .count()
        .map_batches(_deg_named, batch_format="pyarrow")
    )
    tri = triangle_counts(raw, num_buckets=num_buckets, driver_threshold=0)
    joined = bucketed_hash_join(
        degs, tri, on="doc_id", num_buckets=num_buckets, how="left"
    )

    def _finish(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        deg = batch["deg"].to_numpy().astype(np.int64)
        # LEFT-join padding: zero-triangle nodes arrive as float NaN
        t = pa.compute.cast(batch["triangles"], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        tri = np.where(np.isnan(t), 0, t).astype(np.int64)
        m = deg >= 2
        return _cc_tbl(ids[m], deg[m], tri[m])

    return joined.map_batches(_finish, batch_format="pyarrow")


def undirected_pairs(edges_ds, num_buckets: int | None = None):
    """Canonical undirected simple pair set from a directed multigraph
    edge Dataset: parallel edges collapse, self-loops drop, each edge
    appears once as (id_a < id_b).  The shared preprocessing of the
    triangle / clustering / k-core family."""
    from mini_ivf_ray.pipelines.dedup import dedup_pairs_ds

    def _canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy().astype(np.int64)
        d = batch["dst"].to_numpy().astype(np.int64)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        keep = lo != hi
        return pa.table(
            {
                "id_a": pa.array(lo[keep], type=pa.int64()),
                "id_b": pa.array(hi[keep], type=pa.int64()),
            }
        )

    return dedup_pairs_ds(
        edges_ds.select_columns(["src", "dst"]).map_batches(
            _canon, batch_format="pyarrow"
        ),
        num_buckets=num_buckets,
    )


def _kcore_local(src: np.ndarray, dst: np.ndarray, k: int) -> pa.Table:
    """Driver-side k-core: the identical parallel-peeling recurrence,
    vectorized (all deg<k nodes drop each round)."""
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    keep = lo != hi
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "deg": pa.array([], type=pa.int64()),
        }
    )
    if not keep.any():
        return empty
    pairs = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
    pu, pv = pairs[:, 0], pairs[:, 1]
    while pu.size:
        nodes, inv = np.unique(np.concatenate([pu, pv]), return_inverse=True)
        deg = np.bincount(inv, minlength=nodes.size)
        if (deg >= k).all():
            return pa.table(
                {
                    "doc_id": pa.array(nodes, type=pa.int64()),
                    "deg": pa.array(deg.astype(np.int64), type=pa.int64()),
                }
            )
        alive = nodes[deg >= k]
        m = np.isin(pu, alive) & np.isin(pv, alive)
        pu, pv = pu[m], pv[m]
    return empty


def kcore(edges_ds, k: int, num_buckets: int | None = None,
          driver_threshold: int = 2_000_000, max_rounds: int = 64):
    """k-core decomposition (Seidman 1983): the unique maximal subgraph
    of the undirected simple graph in which every node has degree >= k
    — the standard dense-community / crawl-frontier-prioritization
    signal.  Returns (doc_id, deg int64) with ``deg`` the IN-CORE
    degree (so every row has deg >= k); an empty core returns an empty
    Dataset.

    Distributed as bulk-synchronous parallel peeling: each round ONE
    explode + groupby degree count over the surviving edge set and TWO
    bucketed semi-joins (an edge survives iff BOTH endpoints keep
    degree >= k); ALL deg<k nodes drop simultaneously, so the number
    of rounds is the graph's peel depth, not its node count.  The
    k-core is the greatest fixed point of the peel operator, which is
    order-independent — parallel and sequential peeling converge to
    the same set, so the driver shortcut and the SQL oracle's unrolled
    replay agree exactly.

    ``max_rounds`` bounds the loop; exceeding it raises loudly (the
    oracle unrolls a fixed number of rounds, so a silently-truncated
    peel could hash-mismatch — callers with legitimately deeper graphs
    pass a larger bound).  Same adaptive threshold convention as the
    rest of the family; ``driver_threshold=0`` forces distributed."""
    import ray
    import ray.data

    from mini_ivf_ray.pipelines.relational import bucketed_hash_join

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    raw = edges_ds.select_columns(["src", "dst"]).materialize()
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "deg": pa.array([], type=pa.int64()),
        }
    )
    if raw.count() == 0:
        return ray.data.from_arrow(empty)

    if raw.count() <= driver_threshold:
        e = raw.to_pandas()
        return ray.data.from_arrow(
            _kcore_local(
                e["src"].to_numpy().astype(np.int64),
                e["dst"].to_numpy().astype(np.int64),
                k,
            )
        )

    und = undirected_pairs(raw, num_buckets=num_buckets).materialize()

    def _explode(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy().astype(np.int64)
        b = batch["id_b"].to_numpy().astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(np.concatenate([a, b]), type=pa.int64())}
        )

    def _deg_named(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.compute.cast(batch["doc_id"], pa.int64()),
                "deg": pa.compute.cast(batch["count()"], pa.int64()),
            }
        )

    def _rename(col: str):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {col: pa.compute.cast(batch["doc_id"], pa.int64())}
            )

        return f

    for _ in range(max_rounds):
        if und.count() == 0:
            return ray.data.from_arrow(empty)
        degs = (
            und.map_batches(_explode, batch_format="pyarrow")
            .groupby("doc_id")
            .count()
            .map_batches(_deg_named, batch_format="pyarrow")
            .materialize()
        )
        low = degs.filter(expr=f"deg < {int(k)}")
        if low.count() == 0:
            return degs
        alive = degs.filter(expr=f"deg >= {int(k)}").select_columns(
            ["doc_id"]
        ).materialize()
        if alive.count() == 0:
            return ray.data.from_arrow(empty)
        und = bucketed_hash_join(
            bucketed_hash_join(
                und,
                alive.map_batches(_rename("id_a"), batch_format="pyarrow"),
                on="id_a",
                num_buckets=num_buckets,
            ),
            alive.map_batches(_rename("id_b"), batch_format="pyarrow"),
            on="id_b",
            num_buckets=num_buckets,
        ).materialize()
    raise RuntimeError(
        f"k-core did not converge within {max_rounds} peeling rounds — "
        f"raise max_rounds for deeper graphs"
    )


def _ktruss_local(src: np.ndarray, dst: np.ndarray, k: int) -> pa.Table:
    """Driver-side k-truss: the identical parallel edge-peeling
    recurrence over neighbor-set intersections."""
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    keep = lo != hi
    empty = pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "support": pa.array([], type=pa.int64()),
        }
    )
    if not keep.any():
        return empty
    pairs = {
        (int(a), int(b))
        for a, b in np.unique(
            np.stack([lo[keep], hi[keep]], axis=1), axis=0
        )
    }
    while pairs:
        adj: dict[int, set[int]] = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {e: len(adj[e[0]] & adj[e[1]]) for e in pairs}
        bad = {e for e, s in sup.items() if s < k - 2}
        if not bad:
            es = sorted(pairs)
            return pa.table(
                {
                    "id_a": pa.array([a for a, _ in es], type=pa.int64()),
                    "id_b": pa.array([b for _, b in es], type=pa.int64()),
                    "support": pa.array(
                        [sup[e] for e in es], type=pa.int64()
                    ),
                }
            )
        pairs -= bad
    return empty


def ktruss(edges_ds, k: int, num_buckets: int | None = None,
           driver_threshold: int = 2_000_000, max_rounds: int = 32):
    """k-truss decomposition (Cohen 2008): the maximal subgraph of the
    undirected simple graph in which every EDGE closes at least k-2
    triangles within the subgraph — the edge-level strengthening of
    k-core (a k-truss is always inside the (k-1)-core) used for
    cohesive web-community extraction.  Returns canonical edges
    (id_a < id_b, support int64) with ``support`` the IN-TRUSS
    triangle count (>= k-2 on every row); an empty truss returns an
    empty Dataset.

    Distributed as bulk-synchronous parallel peeling: each round ONE
    triangle enumeration over the surviving edge set
    (_enumerate_triangles — the degree-oriented wedge join shared with
    triangle_counts, O(m^1.5) wedges regardless of hub skew), each
    triangle crediting its THREE canonical edges (one groupby-sum),
    then one bucketed semi-join keeps edges with support >= k-2.  ALL
    under-supported edges drop simultaneously; the k-truss is the
    greatest fixed point of the peel operator (order-independent), so
    the driver shortcut and the SQL oracle's unrolled replay agree
    exactly.

    ``k >= 3`` required: the k=2 "truss" is every edge (support >= 0
    constrains nothing) and its zero-support rows would also break the
    oracle's inner-join replay.  ``max_rounds`` exceeded raises loudly
    (the kcore convention — a silent truncation could hash-mismatch
    the unrolled oracle)."""
    import ray
    import ray.data

    from mini_ivf_ray.pipelines.dedup import dedup_pairs_ds
    from mini_ivf_ray.pipelines.relational import bucketed_hash_join

    if k < 3:
        raise ValueError(f"k must be >= 3, got {k}")

    raw = edges_ds.select_columns(["src", "dst"]).materialize()
    empty = pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "support": pa.array([], type=pa.int64()),
        }
    )
    if raw.count() == 0:
        return ray.data.from_arrow(empty)
    if raw.count() <= driver_threshold:
        e = raw.to_pandas()
        return ray.data.from_arrow(
            _ktruss_local(
                e["src"].to_numpy().astype(np.int64),
                e["dst"].to_numpy().astype(np.int64),
                k,
            )
        )

    def _canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy().astype(np.int64)
        d = batch["dst"].to_numpy().astype(np.int64)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        keep = lo != hi
        return pa.table(
            {
                "id_a": pa.array(lo[keep], type=pa.int64()),
                "id_b": pa.array(hi[keep], type=pa.int64()),
            }
        )

    und = dedup_pairs_ds(
        raw.map_batches(_canon, batch_format="pyarrow"),
        num_buckets=num_buckets,
    ).materialize()

    def _tri_edges(batch: pa.Table) -> pa.Table:
        p = batch["pivot"].to_numpy().astype(np.int64)
        b = batch["b"].to_numpy().astype(np.int64)
        c = batch["c"].to_numpy().astype(np.int64)
        # the three canonical (lo:hi) edge keys of each triangle
        e1a, e1b = np.minimum(p, b), np.maximum(p, b)
        e2a, e2b = np.minimum(p, c), np.maximum(p, c)
        e3a, e3b = np.minimum(b, c), np.maximum(b, c)
        ea = np.concatenate([e1a, e2a, e3a])
        eb = np.concatenate([e1b, e2b, e3b])
        key = np.char.add(
            np.char.add(ea.astype("U20"), ":"), eb.astype("U20")
        )
        return pa.table(
            {
                "ekey": pa.array(key.tolist(), type=pa.string()),
                "t": pa.array(np.ones(ea.size, dtype=np.int64),
                              type=pa.int64()),
            }
        )

    def _sup_named(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ekey": pa.compute.cast(batch["ekey"], pa.string()),
                "support": pa.compute.cast(batch["sum(t)"], pa.int64()),
            }
        )

    def _und_keyed(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy().astype(np.int64)
        b = batch["id_b"].to_numpy().astype(np.int64)
        key = np.char.add(
            np.char.add(a.astype("U20"), ":"), b.astype("U20")
        )
        return pa.table(
            {
                "ekey": pa.array(key.tolist(), type=pa.string()),
                "id_a": pa.array(a, type=pa.int64()),
                "id_b": pa.array(b, type=pa.int64()),
            }
        )

    for _ in range(max_rounds):
        n_edges = und.count()
        if n_edges == 0:
            return ray.data.from_arrow(empty)
        closed = _enumerate_triangles(und, num_buckets)
        sup = (
            closed.map_batches(_tri_edges, batch_format="pyarrow")
            .groupby("ekey")
            .sum("t")
            .map_batches(_sup_named, batch_format="pyarrow")
        )
        keyed = und.map_batches(_und_keyed, batch_format="pyarrow")
        scored = bucketed_hash_join(
            keyed, sup, on="ekey", num_buckets=num_buckets
        ).materialize()
        good = scored.filter(expr=f"support >= {int(k) - 2}").materialize()
        if good.count() == n_edges:
            return good.select_columns(["id_a", "id_b", "support"])
        und = good.select_columns(["id_a", "id_b"]).materialize()
    raise RuntimeError(
        f"k-truss did not converge within {max_rounds} peeling rounds — "
        f"raise max_rounds for deeper graphs"
    )


def _lpa_round_mode(
    nodes_pos: np.ndarray, lab_pos: np.ndarray, n_nodes: int
) -> tuple[np.ndarray, np.ndarray]:
    """(nodes_with_neighbors, their new label positions): per node the
    most frequent incoming label position, ties -> min label position
    — one lexsort + reduceat, no Python loop."""
    if not nodes_pos.size:
        e = np.empty(0, dtype=np.int64)
        return e, e
    key = nodes_pos * np.int64(n_nodes) + lab_pos
    uk, cnt = np.unique(key, return_counts=True)
    nd = uk // n_nodes
    lb = uk % n_nodes
    # per node: argmax by (count desc, label asc); uk is sorted, so
    # within a node labels are ascending — a stable sort by -count
    # keeps the min label first among equal counts
    order = np.argsort(-cnt, kind="stable")
    nd_o, lb_o = nd[order], lb[order]
    first_idx = np.unique(nd_o, return_index=True)[1]
    return nd_o[first_idx], lb_o[first_idx]


def _lpa_local(
    src: np.ndarray, dst: np.ndarray, node_ids: np.ndarray, iters: int
) -> pa.Table:
    """Driver replay of synchronous LPA (vectorized rounds)."""
    nodes = np.unique(node_ids.astype(np.int64))
    n = nodes.size
    # undirected multigraph view
    u = np.concatenate([src, dst]).astype(np.int64)
    v = np.concatenate([dst, src]).astype(np.int64)
    up = np.searchsorted(nodes, u)
    vp = np.searchsorted(nodes, v)
    ok = (
        (up < n) & (vp < n)
        & (nodes[np.minimum(up, n - 1)] == u)
        & (nodes[np.minimum(vp, n - 1)] == v)
    )
    up, vp = up[ok], vp[ok]
    labels = np.arange(n, dtype=np.int64)  # label pos == node pos
    for _ in range(iters):
        nd, lb = _lpa_round_mode(vp, labels[up], n)
        nxt = labels.copy()  # neighbor-less nodes keep their label
        nxt[nd] = lb
        labels = nxt
    return pa.table(
        {
            "doc_id": pa.array(nodes, type=pa.int64()),
            "label": pa.array(nodes[labels], type=pa.int64()),
        }
    )


def lpa_communities(
    edges_ds,
    nodes_ds,
    iters: int = 3,
    num_buckets: int | None = None,
    driver_threshold: int = 2_000_000,
):
    """Label propagation communities (Raghavan-Albert-Kumara 2007 —
    the GraphX / GraphFrames LPA): init label(v) = v; each SYNCHRONOUS
    round every node adopts the most frequent label among its
    UNDIRECTED multigraph neighbors (count desc, label asc — the
    deterministic tie rule), keeping its label when it has no
    neighbors; exactly ``iters`` rounds -> (doc_id, label).

    Fixed-round semantics are the point: classic sync LPA can
    oscillate on bipartite structure, so termination-by-convergence
    is ill-defined — the fixed-``iters`` contract (GraphX's
    maxIterations) makes the output a pure function of the graph,
    bit-identical across partitionings and replayable by an unrolled
    SQL oracle.

    Distributed shape per round (the pagerank/hits BSP discipline):
    ONE bucketed hash join (labels onto the undirected edge list by
    src) + ONE ``groupby(node).map_groups`` mode reduction + ONE
    keep-labels merge groupby for neighbor-less nodes — state is one
    slim (node, label) table, nothing corpus-sized on the driver.
    Graphs at or below ``driver_threshold`` take the vectorized
    driver replay (the connected_components_ds convention; the
    distributed path is forced in tests and pinned identical)."""
    import pandas as pd
    import ray
    import ray.data

    from mini_ivf_ray.pipelines.relational import bucketed_hash_join

    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    edges_cached = edges_ds.select_columns(["src", "dst"]).materialize()
    node_arr = np.unique(
        nodes_ds.select_columns(["doc_id"]).to_pandas()["doc_id"]
        .to_numpy()
        .astype(np.int64)
    )
    if node_arr.size + edges_cached.count() <= driver_threshold:
        e = edges_cached.to_pandas()
        return ray.data.from_arrow(
            _lpa_local(
                e["src"].to_numpy().astype(np.int64),
                e["dst"].to_numpy().astype(np.int64),
                node_arr,
                iters,
            )
        )

    def _swap(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["dst"], "dst": batch["src"]})

    und = edges_cached.union(
        edges_cached.map_batches(_swap, batch_format="pyarrow")
    ).materialize()
    labels = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(node_arr, type=pa.int64()),
                "label": pa.array(node_arr, type=pa.int64()),
            }
        )
    ).materialize()

    def _mode(group: pd.DataFrame) -> pd.DataFrame:
        g = (
            group.groupby("label", as_index=False)
            .size()
            .sort_values(["size", "label"], ascending=[False, True],
                         kind="mergesort")
        )
        return pd.DataFrame(
            {"node": [int(group["node"].iloc[0])],
             "new_label": [int(g["label"].iloc[0])]}
        )

    def _rename_for_join(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["src"], "dst": batch["dst"]})

    for _ in range(iters):
        nb = bucketed_hash_join(
            und.map_batches(_rename_for_join, batch_format="pyarrow"),
            labels,
            on="node",
            num_buckets=num_buckets,
        ).map_batches(
            lambda b: pa.table({"node": b["dst"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        new = nb.groupby("node").map_groups(_mode, batch_format="pandas")
        # keep-label merge: nodes with no incoming rows keep theirs
        merged = bucketed_hash_join(
            labels, new, on="node", how="left", num_buckets=num_buckets
        )

        def _pick(batch: pa.Table) -> pa.Table:
            old = batch["label"].to_numpy(zero_copy_only=False)
            newc = batch["new_label"].to_numpy(zero_copy_only=False)
            lab = np.where(np.isnan(newc.astype(np.float64)),
                           old.astype(np.int64),
                           np.nan_to_num(newc).astype(np.int64))
            return pa.table(
                {
                    "node": batch["node"],
                    "label": pa.array(lab.astype(np.int64),
                                      type=pa.int64()),
                }
            )

        labels = merged.map_batches(
            _pick, batch_format="pyarrow"
        ).materialize()

    return labels.map_batches(
        lambda b: pa.table(
            {"doc_id": b["node"], "label": b["label"]}
        ),
        batch_format="pyarrow",
    )

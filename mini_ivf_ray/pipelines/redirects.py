"""Redirect-chain resolution (URL canonicalization): every crawl
carries HTTP 3xx / <meta refresh> redirect pages, and canonicalizing a
corpus means following each redirect chain to its final non-redirect
target.  Chains can be long and can contain cycles, so the operator is
POINTER DOUBLING (the classic parallel list-ranking shortcut, e.g.
Wyllie 1979): round i advances every pointer up to 2^i hops with ONE
bucketed LEFT self-join of the slim (src, cur) state onto itself —
``rounds`` rounds resolve every chain of length <= 2^rounds, in
O(log chain) exchanges instead of O(chain).

Semantics (mirrored exactly by the SQL oracle):

* each redirect source has exactly ONE target (the mapping is a
  function), so self-joins never fan out;
* after ``rounds`` rounds, ``canonical`` is wherever the pointer
  stopped; ``resolved`` = 1 iff that node is NOT itself a redirect
  source — cycles (and chains longer than 2^rounds) come back
  resolved = 0 rather than looping forever, a documented convention;
* self-redirects (src == dst) are dropped at synthesis.

Scale shape: the state is two int64 columns over the redirect subset
(never the corpus); each round is one bucketed hash join; nothing
lands on the driver.  The LEFT join pads its missing side through
float64, so node ids must be < 2**53 — guarded loudly, same as
pagerank/hits.

Reference analog: the iterative-refinement-until-fixed-point shape of
KMeans training (mini-ivf index_ivfpq.cpp), here with a doubling step
instead of a linear one.

**Synthetic redirects.**  The testdata carries no redirects, so
``synth_redirects`` derives a deterministic set from doc ids alone
(replayable in SQL via the md5-substr UBIGINT form shared with
graph.synth_edges): docs with doc_id % mod == residue are redirect
pages; the target is the (h60(id, "rd-dst") % N)-th doc in doc-id
order."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.pipelines.sampling import salt_hash60


def synth_redirects(docs_ds, mod: int = 7, residue: int = 1):
    """Deterministic synthetic redirect mapping over a (doc_id)
    dataset: (src, dst int64), one target per source, self-redirects
    dropped."""
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
        d = batch["doc_id"].to_numpy().astype(np.int64)
        src = d[d % mod == residue]
        if src.size:
            dst = lut[salt_hash60(src, "rd-dst") % n]
            keep = dst != src
            src, dst = src[keep], dst[keep]
        else:
            dst = np.empty(0, np.int64)
        return pa.table(
            {
                "src": pa.array(src, type=pa.int64()),
                "dst": pa.array(dst, type=pa.int64()),
            }
        )

    return docs_ds.select_columns(["doc_id"]).map_batches(
        gen, batch_format="pyarrow"
    )


def _redirects_local(
    src: np.ndarray, dst: np.ndarray, rounds: int
) -> pa.Table:
    """Driver replay of the EXACT pointer-doubling recurrence
    (vectorized searchsorted lookups) — the small-mapping shortcut,
    identical (src, canonical, resolved) rows."""
    order = np.argsort(src, kind="stable")
    s_sorted = src[order]
    cur = dst.copy()
    for _ in range(rounds):
        cur_s = cur[order]  # current pointer of each sorted source
        idx = np.searchsorted(s_sorted, cur)
        np.minimum(idx, max(s_sorted.size - 1, 0), out=idx)
        match = s_sorted[idx] == cur
        cur = np.where(match, cur_s[idx], cur)
    idx = np.searchsorted(s_sorted, cur)
    np.minimum(idx, max(s_sorted.size - 1, 0), out=idx)
    resolved = (s_sorted[idx] != cur).astype(np.int64)
    return pa.table(
        {
            "src": pa.array(src, type=pa.int64()),
            "canonical": pa.array(cur, type=pa.int64()),
            "resolved": pa.array(resolved, type=pa.int64()),
        }
    )


def resolve_redirects(redirects_ds, rounds: int = 3,
                      num_buckets: int | None = None,
                      driver_threshold: int = 2_000_000):
    """(src, dst) redirect mapping -> (src, canonical, resolved int64)
    for every redirect source, after ``rounds`` pointer-doubling
    rounds (resolves chains of length <= 2**rounds exactly).

    Mappings at or below ``driver_threshold`` rows take the
    driver-replay shortcut (connected_components_ds convention) — the
    identical doubling recurrence runs vectorized on the driver; pass
    0 to force the distributed path (tests do)."""
    import ray
    import ray.data

    from mini_ivf_ray.pipelines.relational import bucketed_hash_join

    red = redirects_ds.select_columns(["src", "dst"]).materialize()
    if red.count() == 0:
        empty = pa.array([], type=pa.int64())
        return ray.data.from_arrow(
            pa.table({"src": empty, "canonical": empty, "resolved": empty})
        )
    mx = red.aggregate(
        ray.data.aggregate.Max("src"), ray.data.aggregate.Max("dst")
    )
    if max(int(mx["max(src)"]), int(mx["max(dst)"])) >= 2**53:
        raise ValueError(
            "resolve_redirects requires node ids < 2**53 (LEFT-join "
            "padding is exact only in the float64-representable range)"
        )
    if red.count() <= driver_threshold:
        e = red.to_pandas()
        return ray.data.from_arrow(
            _redirects_local(
                e["src"].to_numpy().astype(np.int64),
                e["dst"].to_numpy().astype(np.int64),
                rounds,
            )
        )

    def _init(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.compute.cast(batch["src"], pa.int64()),
                "cur": pa.compute.cast(batch["dst"], pa.int64()),
            }
        )

    state = red.map_batches(_init, batch_format="pyarrow").materialize()

    def _as_hop(batch: pa.Table) -> pa.Table:
        # the same state, keyed for the doubling join: cur = the node
        # being hopped FROM (the original src), nxt = where it points
        return pa.table(
            {
                "cur": pa.compute.cast(batch["src"], pa.int64()),
                "nxt": pa.compute.cast(batch["cur"], pa.int64()),
            }
        )

    def _advance(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy().astype(np.int64)
        cur = batch["cur"].to_numpy().astype(np.int64)
        # arrow-cast first: an int64-with-nulls column reaches numpy as
        # object dtype, but float64 nulls become NaN uniformly
        nxt = pa.compute.cast(batch["nxt"], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        has = ~np.isnan(nxt)
        cur = np.where(has, nxt, cur).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(src, type=pa.int64()),
                "cur": pa.array(cur, type=pa.int64()),
            }
        )

    for _ in range(rounds):
        hop = state.map_batches(_as_hop, batch_format="pyarrow")
        joined = bucketed_hash_join(
            state, hop, on="cur", num_buckets=num_buckets, how="left"
        )
        state = joined.map_batches(
            _advance, batch_format="pyarrow"
        ).materialize()

    # resolved = canonical is not itself a redirect source (cycles and
    # over-length chains stay unresolved): one more LEFT join against
    # the mapping keyed by src
    def _as_flag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cur": pa.compute.cast(batch["src"], pa.int64()),
                "tgt": pa.compute.cast(batch["dst"], pa.int64()),
            }
        )

    flags = red.map_batches(_as_flag, batch_format="pyarrow")
    joined = bucketed_hash_join(
        state, flags, on="cur", num_buckets=num_buckets, how="left"
    )

    def _finish(batch: pa.Table) -> pa.Table:
        tgt = pa.compute.cast(batch["tgt"], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "src": pa.compute.cast(batch["src"], pa.int64()),
                "canonical": pa.compute.cast(batch["cur"], pa.int64()),
                "resolved": pa.array(
                    np.isnan(tgt).astype(np.int64), type=pa.int64()
                ),
            }
        )

    return joined.map_batches(_finish, batch_format="pyarrow")

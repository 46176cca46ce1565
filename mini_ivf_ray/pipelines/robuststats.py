"""Boxplot and median-absolute-deviation aggregations: Elasticsearch
``boxplot`` and ``median_absolute_deviation`` over the match set —
per query, (count, min, q1, median, q3, max, mad) of a numeric
per-document field, EXACT.

Both ES aggregations are TDigest sketches (rank error grows with
``compression``); this analog is exact under ONE pinned interpolation
rule — numpy's 'linear' (== SQL ``quantile_cont``): for quantile q
over n sorted values, h = (n-1)*q and

    value = v[floor(h)] + (h - floor(h)) * (v[ceil(h)] - v[floor(h)])

MAD = median(|v - median(v)|) under the same rule (== DuckDB
``mad()``).  For integer-valued fields every step is exact float64
arithmetic (integers scaled by quarters), so engine, sharded, and SQL
agree bit-for-bit, not merely to rounding.

Scale shape — the interesting part.  Quantiles are NOT mergeable
moments: a per-shard quantile says nothing about the global one, and
shipping each shard's match VALUES to the driver is doc-proportional.
The doc-sharded path (serving.ShardedIndex.boxplot) therefore runs
EXACT DISTRIBUTED SELECTION instead: the k-th order statistic is the
smallest integer t with count(v <= t) > k, and count(v <= t) is an
ADDITIVE per-shard integer (the percentile-ranks primitive), so a
binary search over the value domain finds each needed order statistic
in ceil(log2(span)) rounds of (queries x ranks) slim threshold-count
probes — never a value shipped, never a doc-proportional exchange.
Each shard walks its postings ONCE per selection (the sorted
match-value slice is cached actor-side under a generation token,
RangeSearcher.count_le_probe).  MAD runs the same bisection a second
time over the transformed variable w = |2v - 2*median| — an integer
when v is integer and 2*median is integer (median of integers lies on
the half-integer grid) — using the identity

    count(w <= T) = count(v <= m + T/2) - count(v <= m - (T+1)/2)

whose right side is two plain v-space probes (the lower one lands at
a half-integer, which for integer v means "strictly below m - T/2").
The sharded path requires an integer-valued field for this exactness
contract and validates it loudly; the single-index path has no such
restriction.

ES semantics pinned: matched docs missing the field are skipped; a
query with no field-carrying matches emits NO row (the SQL GROUP BY
shape).  Reference analogy: QueryObs' per-query histogram walk
(index_ivfpq.cpp:412-470) promoted to exact rank selection.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.pipelines.extstats import ExtStatsSearcher

BOX_COLUMNS = [
    "query_id", "n_docs", "min_v", "q1", "q2", "q3", "max_v", "mad",
]

QS = (0.25, 0.5, 0.75)


def interp(v_lo: float, v_hi: float, h: float) -> float:
    """numpy-'linear' interpolation at fractional rank h — the ONE
    float64 op sequence every path and the SQL oracle replay."""
    lo = np.floor(h)
    return v_lo + (h - lo) * (v_hi - v_lo)


def boxplot_row(v: np.ndarray):
    """(n, min, q1, q2, q3, max, mad) over one value array — the
    single-pass kernel; also the local oracle the sharded selection is
    pinned against."""
    n = int(v.size)
    if not n:
        return None
    vs = np.sort(v)
    out = []
    for q in QS:
        h = (n - 1) * q
        lo, hi = int(np.floor(h)), int(np.ceil(h))
        out.append(interp(float(vs[lo]), float(vs[hi]), h))
    q1, q2, q3 = out
    w = np.sort(np.abs(v - q2))
    h = (n - 1) * 0.5
    lo, hi = int(np.floor(h)), int(np.ceil(h))
    mad = interp(float(w[lo]), float(w[hi]), h)
    return n, float(vs[0]), q1, q2, q3, float(vs[-1]), mad


def select_order_stats(count_le, domains, ranks):
    """Exact distributed k-selection by threshold-count bisection.

    ``count_le``: callable ``{qid: [thresholds]} -> {qid: [counts]}``
    returning GLOBAL count(v <= t) per probe (additive across shards).
    ``domains``: {qid: (lo, hi)} integer search bounds containing all
    values.  ``ranks``: {qid: sorted 0-indexed ranks}.  Returns
    {qid: {rank: value}} where value is the smallest integer t with
    count(v <= t) >= rank + 1 — the rank-th order statistic for
    integer-valued data.  Rounds = ceil(log2(max span)); each round is
    ONE slim (queries x live-ranks) probe exchange.
    """
    state = {}  # (qid, rank) -> [lo, hi] with invariant: stat in [lo, hi]
    for qid, rs in ranks.items():
        lo, hi = domains[qid]
        for r in rs:
            state[(qid, r)] = [int(lo), int(hi)]
    result: dict[int, dict[int, int]] = {qid: {} for qid in ranks}
    while True:
        live = [(k, v) for k, v in state.items() if v[0] < v[1]]
        if not live:
            break
        probes: dict[int, list[float]] = {}
        keys: dict[int, list[tuple]] = {}
        for (qid, r), (lo, hi) in live:
            mid = (lo + hi) // 2
            probes.setdefault(qid, []).append(float(mid))
            keys.setdefault(qid, []).append((qid, r, mid))
        counts = count_le(probes)
        for qid, ks in keys.items():
            got = counts[qid]
            for (q, r, mid), c in zip(ks, got):
                st = state[(q, r)]
                if c >= r + 1:
                    st[1] = mid
                else:
                    st[0] = mid + 1
    for (qid, r), (lo, _) in state.items():
        result[qid][r] = lo
    return result


class BoxplotSearcher(ExtStatsSearcher):
    """Actor-pool stage: (query_id, text) -> one exact boxplot + MAD
    row per query over the disjunctive match set's field values."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {c: [] for c in BOX_COLUMNS}
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            docs = self.disjunctive_matches_for_text(qtext)
            if not docs.size or not self.value_ids.size:
                continue
            idx = np.searchsorted(self.value_ids, docs)
            np.minimum(idx, self.value_ids.size - 1, out=idx)
            hit = self.value_ids[idx] == docs
            row = boxplot_row(self.values[idx[hit]])
            if row is None:
                continue
            rows["query_id"].append(qid)
            for c, val in zip(BOX_COLUMNS[1:], row):
                rows[c].append(val)
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "n_docs": pa.array(rows["n_docs"], type=pa.int64()),
                **{
                    c: pa.array(rows[c], type=pa.float64())
                    for c in BOX_COLUMNS[2:]
                },
            }
        )


def boxplot_search(
    index_dir: str,
    queries_ds,
    value_ids,
    values,
    cfg: PipelineConfig | None = None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> one (query_id, n_docs, min_v, q1,
    q2, q3, max_v, mad) row per query — ES boxplot +
    median_absolute_deviation, exact under the pinned linear
    interpolation rule (module docstring).  Matched docs missing the
    field are skipped; empty queries emit no row."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    ids = np.asarray(value_ids, dtype=np.uint64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    vals = np.asarray(values, dtype=np.float64)[order]
    if np.isnan(vals).any():
        raise ValueError(
            "values contains NaN; drop missing-field docs from the "
            "sidecar instead (they are skipped by construction)"
        )

    shared = decoded = None
    if share == "decoded":
        from mini_ivf_ray.sources.decoded import share_decoded_index

        decoded = share_decoded_index(index_dir, cfg)
    elif share:
        from mini_ivf_ray.pipelines.query import share_segments

        shared = share_segments(index_dir, cfg.num_partitions)
    import ray

    from mini_ivf_ray.pipelines.serving import _tombstone_ref

    denied_ref = _tombstone_ref(index_dir) if respect_deletes else None
    values_ref = ray.put((ids, vals))
    return queries_ds.map_batches(
        BoxplotSearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded, values_ref),
        fn_constructor_kwargs={"denied_ref": denied_ref},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )


def sharded_boxplot(sharded, queries, chunk: int = 512) -> pd.DataFrame:
    """The ShardedIndex.boxplot implementation (lives here so the
    selection machinery stays beside its kernels): exact distributed
    boxplot + MAD via threshold-count bisection — see module
    docstring.  Requires an integer-valued attached value sidecar
    (validated by attach_value_sidecar's caller contract below)."""
    import ray

    stats = sharded.ext_stats(queries, chunk)  # n, min, max (additive)
    if not len(stats):
        return pd.DataFrame(columns=BOX_COLUMNS)

    qtext = dict(queries)
    gen = getattr(sharded, "_probe_generation", 0) + 1
    sharded._probe_generation = gen

    def count_le(probes: dict[int, list[float]]) -> dict[int, list[int]]:
        items = [
            (int(qid), qtext[int(qid)], tuple(ts))
            for qid, ts in probes.items()
        ]
        futs = [
            a.count_le_probe.remote(gen, items) for a in sharded.actors
        ]
        frames = [f for f in ray.get(futs) if len(f)]
        merged = (
            pd.concat(frames, ignore_index=True)
            .groupby(["query_id", "ti"], sort=True, as_index=False)["c"]
            .sum()
        )
        out: dict[int, list[int]] = {
            int(qid): [0] * len(ts) for qid, ts in probes.items()
        }
        for _, r in merged.iterrows():
            out[int(r["query_id"])][int(r["ti"])] = int(r["c"])
        return out

    # phase 1: the order statistics the three quantiles interpolate
    domains, ranks, hs = {}, {}, {}
    for _, r in stats.iterrows():
        qid, n = int(r["query_id"]), int(r["n_docs"])
        lo, hi = int(r["min_v"]), int(r["max_v"])
        if float(r["min_v"]) != lo or float(r["max_v"]) != hi:
            raise ValueError(
                "sharded boxplot requires an integer-valued field "
                "(exact-selection contract; use boxplot_search for "
                "fractional fields)"
            )
        domains[qid] = (lo, hi)
        hs[qid] = [(n - 1) * q for q in QS]
        need = sorted(
            {int(np.floor(h)) for h in hs[qid]}
            | {int(np.ceil(h)) for h in hs[qid]}
        )
        ranks[qid] = need
    sel = select_order_stats(count_le, domains, ranks)

    med = {}
    quants: dict[int, list[float]] = {}
    for qid, h3 in hs.items():
        vals = []
        for h in h3:
            lo, hi = int(np.floor(h)), int(np.ceil(h))
            vals.append(
                interp(float(sel[qid][lo]), float(sel[qid][hi]), h)
            )
        quants[qid] = vals
        med[qid] = vals[1]

    # phase 2: MAD over w = |2v - 2m| (integer when v integer and m on
    # the half-integer grid) — two v-space probes per w-threshold
    def count_le_w(probes: dict[int, list[float]]) -> dict[int, list[int]]:
        vprobes: dict[int, list[float]] = {}
        for qid, ts in probes.items():
            m = med[qid]
            vp = []
            for t in ts:
                vp.append(m + t / 2.0)            # v <= m + T/2
                vp.append(m - (t + 1.0) / 2.0)    # v <  m - T/2
            vprobes[qid] = vp
        raw = count_le(vprobes)
        return {
            qid: [
                raw[qid][2 * j] - raw[qid][2 * j + 1]
                for j in range(len(ts))
            ]
            for qid, ts in probes.items()
        }

    wdom, wranks, whs = {}, {}, {}
    for _, r in stats.iterrows():
        qid, n = int(r["query_id"]), int(r["n_docs"])
        span = int(r["max_v"]) - int(r["min_v"])
        wdom[qid] = (0, 2 * span)
        h = (n - 1) * 0.5
        whs[qid] = h
        wranks[qid] = sorted({int(np.floor(h)), int(np.ceil(h))})
    wsel = select_order_stats(count_le_w, wdom, wranks)

    rows = []
    for _, r in stats.iterrows():
        qid, n = int(r["query_id"]), int(r["n_docs"])
        h = whs[qid]
        lo, hi = int(np.floor(h)), int(np.ceil(h))
        w_lo, w_hi = float(wsel[qid][lo]), float(wsel[qid][hi])
        # w = |2v - 2m| = 2*|v - m|: halve AFTER interpolation so the
        # op order matches boxplot_row's interp over |v - m| exactly
        mad = interp(w_lo / 2.0, w_hi / 2.0, h)
        q1, q2, q3 = quants[qid]
        rows.append(
            (qid, n, float(r["min_v"]), q1, q2, q3, float(r["max_v"]), mad)
        )
    out = pd.DataFrame(rows, columns=BOX_COLUMNS)
    out["query_id"] = out["query_id"].astype(np.int64)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out

"""Relational join patterns on Ray Data.

The reference has no relational joins (SURVEY §2.4), but a standalone
data-processing engine needs the two canonical distributed shapes:

* broadcast_join — small side shipped once via ``ray.put``, probed
  per batch with a pandas merge (no shuffle at all);
* bucketed_hash_join — both sides bucketed by key hash into a fixed
  number of group keys, matching buckets joined pairwise inside
  ``map_groups`` (the explicit partitioned hash join; salt-extendable
  for hot keys).

Both preserve exact SQL inner-join semantics and are oracle-checked.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def broadcast_join(big_ds, small_df: pd.DataFrame, on: str, how: str = "inner"):
    """big ⨝ small with the small side broadcast (dimension-table join).
    No shuffle: every batch probes the in-memory small side.

    Arrow-native probe (r2 ADVICE #8): the small side is shipped once as
    an Arrow table and each batch joins via ``pa.Table.join`` (Acero
    hash join) — no per-batch pandas round-trip.  Falls back to pandas
    merge only when non-key column names collide (pandas ``_x/_y``
    suffix semantics, which Acero does not reproduce)."""
    import ray

    small_ref = ray.put(pa.Table.from_pandas(small_df, preserve_index=False))
    join_type = {"inner": "inner", "left": "left outer"}.get(how, how)

    class Probe:
        def __init__(self):
            self.small = ray.get(small_ref)
            self.small_cols = set(self.small.column_names)

        def __call__(self, batch: pa.Table) -> pa.Table:
            overlap = (set(batch.column_names) & self.small_cols) - {on}
            if overlap:
                out = batch.to_pandas().merge(
                    self.small.to_pandas(), on=on, how=how
                )
                return pa.Table.from_pandas(out, preserve_index=False)
            return batch.join(self.small, keys=on, join_type=join_type)

    return big_ds.map_batches(Probe, batch_format="pyarrow", batch_size=8192,
                              concurrency=(1, 8), num_cpus=1)


def _key_hash(key: np.ndarray) -> np.ndarray:
    """Deterministic uint64 hash of a join-key column — any dtype
    (pandas siphash with the fixed default key: stable across
    processes, nodes and runs).  String keys hash their utf-8 bytes;
    numeric keys their values — never ``astype(int64)`` (which raises
    or silently corrupts on strings)."""
    if key.dtype == object or key.dtype.kind in "US":
        return pd.util.hash_array(key.astype(object))
    return pd.util.hash_array(key)


def bucketed_hash_join(
    left_ds,
    right_ds,
    on: str,
    num_buckets: int | None = None,
    suffix: str = "_r",
    hot_keys=None,
    nsalt: int = 8,
    how: str = "inner",
):
    """Large ⨝ large: explicit partitioned hash join.  Both sides get
    ``bucket = hash64(key) [+ salt stride] % B`` columns plus a side
    tag, are unioned, shuffled ONCE by bucket, and each bucket joins
    its two sides with a pandas merge.

    * Keys of ANY dtype (string keys hash their bytes — the round-1
      int64 cast is gone).
    * ``num_buckets`` defaults to ``max(64, 8 x cluster CPUs)`` so join
      parallelism and per-bucket memory scale with the cluster instead
      of a fixed 32-way fan-out; at N-node scale pass ~8x total cores.
      Each map_groups task materializes ~1/B of both sides — B is the
      memory knob.
    * ``hot_keys`` (iterable): skew salting, same shape as the postings
      shuffle's head-term salting — LEFT rows with a hot key spread
      round-robin over ``nsalt`` sub-buckets; RIGHT rows with that key
      are replicated into all ``nsalt`` sub-buckets, so every left row
      still meets every matching right row exactly once.  Use for
      power-law foreign keys (the classic web-data join killer).
    """

    def _pa_schema(ds) -> pa.Schema:
        base = ds.schema().base_schema
        if isinstance(base, pa.Schema):
            return base
        # PandasBlockSchema (pandas-sourced datasets): names + numpy dtypes
        def conv(t):
            try:
                return pa.from_numpy_dtype(t)
            except pa.ArrowNotImplementedError:
                return pa.string()  # object dtype: strings

        return pa.schema([(n, conv(t)) for n, t in zip(base.names, base.types)])

    ls = _pa_schema(left_ds)
    rs = _pa_schema(right_ds)
    # canonical join-key type: both sides are CAST to it before hashing
    # — an int64 key on one side and a float64 on the other (pandas
    # merge upcasts nullable ints) would otherwise hash into different
    # buckets and silently drop matches
    lt, rt = ls.field(on).type, rs.field(on).type
    if lt.equals(rt):
        key_type = lt
    elif (pa.types.is_integer(lt) or pa.types.is_floating(lt)) and (
        pa.types.is_integer(rt) or pa.types.is_floating(rt)
    ):
        key_type = (
            pa.float64()
            if pa.types.is_floating(lt) or pa.types.is_floating(rt)
            else pa.int64()
        )
    else:
        key_type = pa.string()
    l_names = [f for f in ls.names if f != on]
    rename = {
        f: (f + suffix if f in set(ls.names) else f) for f in rs.names if f != on
    }
    r_names = list(rename.values())
    # canonical combined schema both sides are padded to
    fields = [(on, key_type)]
    fields += [(n, ls.field(n).type) for n in l_names]
    fields += [(rename_inv, rs.field(orig).type) for orig, rename_inv in rename.items()]
    canon = pa.schema(fields)

    if num_buckets is None:
        import ray

        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        num_buckets = max(64, 8 * n_cpus)
    hot = frozenset(hot_keys) if hot_keys is not None else frozenset()
    _STRIDE = np.uint64(0x9E3779B97F4A7C15)

    def tag(side: int, ren: dict[str, str] | None):
        def fn(batch: pa.Table) -> pa.Table:
            if ren:
                batch = batch.rename_columns([ren.get(c, c) for c in batch.column_names])
            cols = {}
            for f in canon:
                if f.name == on:
                    import pyarrow.compute as pc

                    cols[on] = pc.cast(batch[on], key_type)
                elif f.name in batch.column_names:
                    cols[f.name] = batch[f.name]
                else:
                    cols[f.name] = pa.nulls(batch.num_rows, type=f.type)
            out = pa.table(cols)
            key = out[on].to_numpy(zero_copy_only=False)
            h = _key_hash(key)
            is_hot = np.isin(key, list(hot)) if hot else None
            if is_hot is None or not is_hot.any():
                with np.errstate(over="ignore"):
                    b = (h % np.uint64(num_buckets)).astype(np.int64)
                return out.append_column("bucket", pa.array(b)).append_column(
                    "side", pa.array(np.full(len(b), side, dtype=np.int8))
                )
            # Per hot KEY, both sides use the same DISTINCT bucket set
            # D(h) = unique((h + s*STRIDE) % B, s < nsalt).  Replicating
            # the raw (possibly colliding) sequence instead — e.g. when
            # num_buckets/gcd(STRIDE, num_buckets) <= nsalt — would put
            # two right replicas in one bucket and emit duplicate join
            # rows (ADVICE r2).  np.unique's sorted order is the shared
            # convention; left rows round-robin over D, right rows land
            # in each bucket of D exactly once.
            with np.errstate(over="ignore"):
                b0 = (h % np.uint64(num_buckets)).astype(np.int64)
                hot_idx = np.flatnonzero(is_hot)
                hot_h = h[hot_idx]
                if side == 0:
                    b = b0.copy()
                    for hh in np.unique(hot_h):
                        d = np.unique(
                            (hh + np.arange(nsalt, dtype=np.uint64) * _STRIDE)
                            % np.uint64(num_buckets)
                        ).astype(np.int64)
                        rows = hot_idx[hot_h == hh]
                        b[rows] = d[np.arange(len(rows)) % len(d)]
                    return out.append_column("bucket", pa.array(b)).append_column(
                        "side", pa.array(np.full(len(b), side, dtype=np.int8))
                    )
                # right: replicate each hot row once per DISTINCT bucket
                cold = out.filter(pa.array(~is_hot)).append_column(
                    "bucket", pa.array(b0[~is_hot])
                )
                reps = [cold]
                for hh in np.unique(hot_h):
                    d = np.unique(
                        (hh + np.arange(nsalt, dtype=np.uint64) * _STRIDE)
                        % np.uint64(num_buckets)
                    ).astype(np.int64)
                    rows = out.take(pa.array(hot_idx[hot_h == hh]))
                    for bs in d:
                        reps.append(
                            rows.append_column(
                                "bucket",
                                pa.array(np.full(rows.num_rows, bs, dtype=np.int64)),
                            )
                        )
                rep = pa.concat_tables(reps)
                return rep.append_column(
                    "side", pa.array(np.full(rep.num_rows, side, dtype=np.int8))
                )

        return fn

    left = left_ds.map_batches(tag(0, None), batch_format="pyarrow")
    right = right_ds.map_batches(tag(1, rename), batch_format="pyarrow")

    if how not in ("inner", "left", "outer"):
        raise ValueError(f"how must be inner/left/outer, got {how!r}")
    if how == "outer" and hot:
        # a replicated-but-unmatched hot right row would surface once
        # per salt replica; left/inner drop those rows so salting stays
        # exact there
        raise ValueError("hot_keys salting is not outer-join-safe")

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["side"] == 0][[on] + l_names]
        r = group[group["side"] == 1][[on] + r_names]
        if len(l) == 0 and how != "outer":
            return pd.DataFrame({c: [] for c in [on] + l_names + r_names})
        if len(r) == 0 and how == "inner":
            return pd.DataFrame({c: [] for c in [on] + l_names + r_names})
        out = l.merge(r, on=on, how=how)
        if how != "inner":
            # unmatched string cells: pandas pads with NaN, SQL NULL is
            # None — emit proper nulls so Arrow/consumers see NULL
            for c in out.columns:
                if out[c].dtype == object:
                    out[c] = out[c].where(out[c].notna(), None)
        return out

    return left.union(right).groupby("bucket").map_groups(
        join_bucket, batch_format="pandas"
    )


def asof_join(
    left_ds,
    right_ds,
    by: str,
    on: str,
    tiebreak: str | None = None,
    suffix: str = "_r",
    num_buckets: int | None = None,
):
    """Distributed backward as-of join: every left row picks the single
    right row with the same ``by`` key and the greatest ``on`` value
    <= the left row's (left-outer: unmatched left rows keep nulls).
    Ties on equal ``on`` break deterministically to the greatest
    ``tiebreak`` value (pass a unique id column for reproducible runs).

    Shape: both sides tagged with ``bucket = hash64(by) % B`` and a side
    flag, unioned, shuffled ONCE by bucket, and each bucket runs one
    vectorized ``pd.merge_asof(..., by=key)`` over its co-located keys —
    the classic distributed as-of plan (time-series attribution,
    dimension-history lookup).

    Partitioning assumption (documented per task brief): all rows of one
    ``by`` key land in one bucket task, so per-key history must fit a
    worker.  The skew extension at extreme scale is time-range
    sub-splitting with right-side boundary replication (each left time
    slice also receives the latest right row before its slice start);
    not needed at sandbox scale.
    """

    def _schema(ds) -> pa.Schema:
        base = ds.schema().base_schema
        if isinstance(base, pa.Schema):
            return base
        return pa.schema(
            [(n, pa.from_numpy_dtype(t)) for n, t in zip(base.names, base.types)]
        )

    ls, rs = _schema(left_ds), _schema(right_ds)
    l_rest = [f for f in ls.names if f not in (by, on)]
    taken = set(ls.names)
    rename = {
        f: (f + suffix if f in taken else f)
        for f in rs.names
        if f not in (by, on)
    }
    on_r = on + suffix  # right side's own `on` value survives the merge
    r_rest = list(rename.values()) + [on_r]
    fields = [(by, ls.field(by).type), (on, ls.field(on).type)]
    fields += [(n, ls.field(n).type) for n in l_rest]
    fields += [(new, rs.field(old).type) for old, new in rename.items()]
    fields += [(on_r, rs.field(on).type)]
    canon = pa.schema(fields)

    if num_buckets is None:
        import ray

        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        num_buckets = max(64, 8 * n_cpus)

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            if side == 1:
                batch = batch.rename_columns(
                    [rename.get(c, c) for c in batch.column_names]
                )
                batch = batch.append_column(on_r, batch[on])
            cols = {}
            for f in canon:
                cols[f.name] = (
                    batch[f.name]
                    if f.name in batch.column_names
                    else pa.nulls(batch.num_rows, type=f.type)
                )
            out = pa.table(cols)
            h = _key_hash(out[by].to_numpy(zero_copy_only=False))
            b = (h % np.uint64(num_buckets)).astype(np.int64)
            return out.append_column("bucket", pa.array(b)).append_column(
                "side", pa.array(np.full(len(b), side, dtype=np.int8))
            )

        return fn

    left = left_ds.map_batches(tag(0), batch_format="pyarrow")
    right = right_ds.map_batches(tag(1), batch_format="pyarrow")
    out_cols = [by, on] + l_rest + r_rest

    def join_bucket(group: pd.DataFrame):
        # returns Arrow with the canonical schema: pandas upcasts
        # unmatched int64 right columns to float64 (and only in buckets
        # that HAVE unmatched rows) — per-group Arrow conversion with
        # from_pandas NaN->null keeps every block's schema identical
        l = group[group["side"] == 0][[by, on] + l_rest]
        r = group[group["side"] == 1][[by, on] + r_rest]
        if len(l) == 0:
            return canon.empty_table()
        l = l.sort_values(on, kind="stable")
        r = r.sort_values(
            [on] + ([rename.get(tiebreak, tiebreak)] if tiebreak else []),
            kind="stable",
        )
        # merge_asof(backward) takes the LAST right row at each
        # qualifying `on`; the (on, tiebreak) sort makes that the max
        # tiebreak among equal timestamps — deterministic
        m = pd.merge_asof(l, r, on=on, by=by, direction="backward")
        return pa.table(
            {
                c: pa.array(m[c], type=canon.field(c).type, from_pandas=True)
                for c in out_cols
            }
        )

    return left.union(right).groupby("bucket").map_groups(
        join_bucket, batch_format="pandas"
    )


def range_join(
    points_ds,
    intervals_ds,
    on: str,
    lo: str,
    hi: str,
    by: str | None = None,
    bounds=None,
    suffix: str = "_r",
    num_buckets: int | None = None,
):
    """Interval-containment join: every point row pairs with every
    interval row satisfying ``lo <= point[on] <= hi`` (inclusive), plus
    an equal ``by`` key when given.  Inner semantics; overlapping
    intervals yield one output row per covering interval.

    Distribution strategy (one shuffle either way):

    * ``by`` given — both sides bucket on ``hash64(by) % B`` (the
      asof_join co-location plan); per bucket a pandas key-merge then a
      vectorized containment filter.  Assumes per-key interval counts
      are moderate (sessions, calendars, SLA windows) — the key-merge
      materializes |points_k| x |intervals_k| per key before filtering.
    * ``bounds`` given (sorted domain cut points, no key) — the classic
      domain-chunked interval join: each point lands in its chunk via
      ``searchsorted``; each interval is REPLICATED into every chunk it
      overlaps, so any (point, interval) containment pair co-locates in
      exactly the point's chunk (no cross-chunk dedup needed).  Chunk
      count is the parallelism/memory knob; pick ~8x cluster cores from
      a sampled quantile sketch of the domain.
    """
    if (by is None) == (bounds is None):
        raise ValueError("pass exactly one of `by` or `bounds`")

    def _schema(ds) -> pa.Schema:
        base = ds.schema().base_schema
        if isinstance(base, pa.Schema):
            return base
        return pa.schema(
            [(n, pa.from_numpy_dtype(t)) for n, t in zip(base.names, base.types)]
        )

    ps, vs = _schema(points_ds), _schema(intervals_ds)
    p_names = list(ps.names)
    taken = set(p_names)
    rename = {f: (f + suffix if f in taken else f) for f in vs.names}
    v_names = list(rename.values())
    lo_c, hi_c = rename[lo], rename[hi]
    by_v = rename[by] if by is not None else None
    fields = [(n, ps.field(n).type) for n in p_names]
    fields += [(new, vs.field(old).type) for old, new in rename.items()]
    canon = pa.schema(fields)
    out_cols = p_names + v_names

    if num_buckets is None:
        import ray

        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        num_buckets = max(64, 8 * n_cpus)
    cuts = np.asarray(bounds, dtype=np.float64) if bounds is not None else None

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            if side == 1:
                batch = batch.rename_columns(
                    [rename.get(c, c) for c in batch.column_names]
                )
            cols = {}
            for f in canon:
                cols[f.name] = (
                    batch[f.name]
                    if f.name in batch.column_names
                    else pa.nulls(batch.num_rows, type=f.type)
                )
            out = pa.table(cols)
            if by is not None:
                key = out[by if side == 0 else by_v].to_numpy(zero_copy_only=False)
                b = (_key_hash(key) % np.uint64(num_buckets)).astype(np.int64)
                rep = out.append_column("bucket", pa.array(b))
            elif side == 0:
                x = out[on].to_numpy(zero_copy_only=False).astype(np.float64)
                b = np.searchsorted(cuts, x, side="right")
                rep = out.append_column("bucket", pa.array(b.astype(np.int64)))
            else:
                l = out[lo_c].to_numpy(zero_copy_only=False).astype(np.float64)
                h = out[hi_c].to_numpy(zero_copy_only=False).astype(np.float64)
                c0 = np.searchsorted(cuts, l, side="right")
                c1 = np.searchsorted(cuts, h, side="right")
                parts = []
                for off in range(int((c1 - c0).max()) + 1 if len(c0) else 0):
                    m = c0 + off <= c1
                    if not m.any():
                        break
                    sel = out.filter(pa.array(m))
                    parts.append(
                        sel.append_column(
                            "bucket",
                            pa.array((c0[m] + off).astype(np.int64)),
                        )
                    )
                rep = (
                    pa.concat_tables(parts)
                    if parts
                    else out.append_column(
                        "bucket", pa.array(np.empty(0, dtype=np.int64))
                    ).slice(0, 0)
                )
            return rep.append_column(
                "side", pa.array(np.full(rep.num_rows, side, dtype=np.int8))
            )

        return fn

    points = points_ds.map_batches(tag(0), batch_format="pyarrow")
    ivals = intervals_ds.map_batches(tag(1), batch_format="pyarrow")

    def join_bucket(group: pd.DataFrame):
        p = group[group["side"] == 0][p_names]
        v = group[group["side"] == 1][v_names]
        if len(p) == 0 or len(v) == 0:
            return canon.empty_table()
        if by is not None:
            m = p.merge(v, left_on=by, right_on=by_v, how="inner")
        else:
            m = p.assign(_one=1).merge(v.assign(_one=1), on="_one").drop(
                columns="_one"
            )
        keep = (m[lo_c] <= m[on]) & (m[on] <= m[hi_c])
        m = m[keep]
        return pa.table(
            {
                c: pa.array(m[c], type=canon.field(c).type, from_pandas=True)
                for c in out_cols
            }
        )

    return points.union(ivals).groupby("bucket").map_groups(
        join_bucket, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Semi / anti joins
# ---------------------------------------------------------------------------


def broadcast_semi_join(big_ds, keys, on: str, anti: bool = False):
    """Filter ``big_ds`` to rows whose ``on`` is (semi) / is not (anti)
    in the broadcast key set.  ``keys``: small array-like — shipped once
    via ``ray.put``, probed per batch with one vectorized ``np.isin``.
    The decontaminate/fetch_by_ids shape, exposed as a named operator."""
    import ray

    karr = np.unique(np.asarray(keys))
    ref = ray.put(karr)

    class _Filter:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vals = batch[on].to_numpy(zero_copy_only=False)
            m = np.isin(vals, self.keys)
            return batch.filter(pa.array(~m if anti else m))

    return big_ds.map_batches(
        _Filter, batch_format="pyarrow", concurrency=(1, 8), num_cpus=1
    )


def bucketed_semi_join(
    left_ds, right_ds, on: str, anti: bool = False, num_buckets: int | None = None
):
    """Large ⋉ large semi/anti join, both sides distributed.

    The right side is slimmed to DISTINCT keys per batch before the
    exchange (a semi join never needs right payload — only membership),
    so the shuffle carries left rows + right keys, never right rows.
    One bucket groupby co-locates each left row with every right key
    that could match it (same ``_key_hash`` discipline as
    ``bucketed_hash_join``); per bucket one vectorized ``isin``.
    """
    import ray

    if num_buckets is None:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        num_buckets = max(64, 8 * n_cpus)

    lschema = left_ds.schema()
    lnames = list(lschema.base_schema.names)

    def left_rows(batch: pa.Table) -> pa.Table:
        key = batch[on].to_numpy(zero_copy_only=False)
        b = (_key_hash(key) % np.uint64(num_buckets)).astype(np.int64)
        batch = batch.append_column("__bucket", pa.array(b, type=pa.int64()))
        return batch.append_column(
            "__side", pa.array(np.zeros(len(b), dtype=np.int8), type=pa.int8())
        )

    def right_keys(batch: pa.Table) -> pa.Table:
        key = np.unique(batch[on].to_numpy(zero_copy_only=False))
        b = (_key_hash(key) % np.uint64(num_buckets)).astype(np.int64)
        cols = {}
        for name in lnames:
            if name == on:
                cols[name] = pa.array(key)
            else:
                cols[name] = pa.nulls(
                    len(key), type=left_ds.schema().base_schema.field(name).type
                )
        t = pa.table(cols)
        t = t.append_column("__bucket", pa.array(b, type=pa.int64()))
        return t.append_column(
            "__side", pa.array(np.ones(len(key), dtype=np.int8), type=pa.int8())
        )

    # the null-padded right rows make integer left columns nullable ->
    # pandas float64 inside map_groups; cast back once rights are gone
    base = left_ds.schema().base_schema
    int_cols = [
        n for n in lnames if pa.types.is_integer(base.field(n).type)
    ]

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = [c for c in df.columns if c not in ("__bucket", "__side")]
        left = df[df["__side"] == 0]
        rk = df.loc[df["__side"] == 1, on].unique()
        m = left[on].isin(rk).to_numpy()
        kept = left.loc[~m if anti else m, out_cols]
        return kept.astype({c: np.int64 for c in int_cols if c in kept.columns})

    unioned = left_ds.map_batches(left_rows, batch_format="pyarrow").union(
        right_ds.map_batches(right_keys, batch_format="pyarrow")
    )
    return unioned.groupby("__bucket").map_groups(bucket_fn, batch_format="pandas")


def table_diff(
    old_ds,
    new_ds,
    key: str,
    compare_cols: list[str],
    num_buckets: int | None = None,
):
    """Snapshot diff for recurring-crawl tables: classify every key as
    ``added`` / ``removed`` / ``changed`` / ``unchanged``.

    Each side shrinks to (key, row fingerprint) per batch BEFORE the
    exchange — the fingerprint is a stable 64-bit hash over the compare
    columns' string forms — then ONE bucketed full-outer pass assigns
    the status.  Payload through the shuffle is 16 bytes/row regardless
    of row width, the same slim-shuffle discipline as the LSH dedup
    family.  Output: (key, status) with status one of the four labels.
    """
    import pyarrow.compute as pc

    def fingerprint(batch: pa.Table) -> pa.Table:
        parts = None
        for c in compare_cols:
            s = pc.cast(batch[c], pa.string())
            s = pc.fill_null(s, "\x00NULL")
            parts = s if parts is None else pc.binary_join_element_wise(parts, s, "\x1f")
        fp = pd.util.hash_pandas_object(
            pd.Series(parts.to_pandas()), index=False
        ).to_numpy()
        return pa.table(
            {
                key: batch[key],
                "fp": pa.array(fp.view(np.int64)),
            }
        )

    old_fp = old_ds.map_batches(fingerprint, batch_format="pyarrow")
    new_fp = new_ds.map_batches(fingerprint, batch_format="pyarrow")
    joined = bucketed_hash_join(
        old_fp, new_fp, on=key, num_buckets=num_buckets, suffix="_new", how="outer"
    )

    def classify(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        old_fp_ = df["fp"]
        new_fp_ = df["fp_new"]
        status = np.where(
            old_fp_.isna(),
            "added",
            np.where(
                new_fp_.isna(),
                "removed",
                np.where(old_fp_ == new_fp_, "unchanged", "changed"),
            ),
        )
        return pa.table({key: pa.array(df[key]), "status": pa.array(status)})

    return joined.map_batches(classify, batch_format="pyarrow")

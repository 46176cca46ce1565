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
    No shuffle: every batch probes the in-memory small side."""
    import ray

    small_ref = ray.put(small_df)

    class Probe:
        def __init__(self):
            self.small = ray.get(small_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            left = batch.to_pandas()
            out = left.merge(self.small, on=on, how=how)
            return pa.Table.from_pandas(out, preserve_index=False)

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
            with np.errstate(over="ignore"):
                if side == 0:
                    # left: round-robin salt per hot row
                    salt = np.zeros(len(key), dtype=np.uint64)
                    salt[is_hot] = (
                        np.arange(int(is_hot.sum()), dtype=np.uint64)
                        % np.uint64(nsalt)
                    )
                    b = ((h + salt * _STRIDE) % np.uint64(num_buckets)).astype(np.int64)
                    return out.append_column("bucket", pa.array(b)).append_column(
                        "side", pa.array(np.full(len(b), side, dtype=np.int8))
                    )
                # right: replicate hot rows into every salt sub-bucket
                b0 = (h % np.uint64(num_buckets)).astype(np.int64)
                cold = out.filter(pa.array(~is_hot)).append_column(
                    "bucket", pa.array(b0[~is_hot])
                )
                reps = [cold]
                hot_rows = out.filter(pa.array(is_hot))
                hh = h[is_hot]
                for s in range(nsalt):
                    bs = ((hh + np.uint64(s) * _STRIDE) % np.uint64(num_buckets)).astype(np.int64)
                    reps.append(hot_rows.append_column("bucket", pa.array(bs)))
                rep = pa.concat_tables(reps)
                return rep.append_column(
                    "side", pa.array(np.full(rep.num_rows, side, dtype=np.int8))
                )

        return fn

    left = left_ds.map_batches(tag(0, None), batch_format="pyarrow")
    right = right_ds.map_batches(tag(1, rename), batch_format="pyarrow")

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["side"] == 0][[on] + l_names]
        r = group[group["side"] == 1][[on] + r_names]
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame({c: [] for c in [on] + l_names + r_names})
        return l.merge(r, on=on, how="inner")

    return left.union(right).groupby("bucket").map_groups(
        join_bucket, batch_format="pandas"
    )

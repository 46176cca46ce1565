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


def bucketed_hash_join(
    left_ds, right_ds, on: str, num_buckets: int = 32, suffix: str = "_r"
):
    """Large ⨝ large: explicit partitioned hash join.  Both sides get
    ``bucket = key % B`` columns plus a side tag, are unioned, shuffled
    ONCE by bucket, and each bucket joins its two sides with a pandas
    merge.  Hot keys can be salted into sub-buckets the same way the
    postings shuffle salts head terms."""

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
    l_names = [f for f in ls.names if f != on]
    rename = {
        f: (f + suffix if f in set(ls.names) else f) for f in rs.names if f != on
    }
    r_names = list(rename.values())
    # canonical combined schema both sides are padded to
    fields = [(on, ls.field(on).type)]
    fields += [(n, ls.field(n).type) for n in l_names]
    fields += [(rename_inv, rs.field(orig).type) for orig, rename_inv in rename.items()]
    canon = pa.schema(fields)

    def tag(side: int, ren: dict[str, str] | None):
        def fn(batch: pa.Table) -> pa.Table:
            if ren:
                batch = batch.rename_columns([ren.get(c, c) for c in batch.column_names])
            cols = {}
            for f in canon:
                if f.name in batch.column_names:
                    cols[f.name] = batch[f.name]
                else:
                    cols[f.name] = pa.nulls(batch.num_rows, type=f.type)
            out = pa.table(cols)
            key = out[on].to_numpy(zero_copy_only=False)
            b = (key.astype(np.int64) % num_buckets).astype(np.int64)
            return out.append_column("bucket", pa.array(b)).append_column(
                "side", pa.array(np.full(len(b), side, dtype=np.int8))
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

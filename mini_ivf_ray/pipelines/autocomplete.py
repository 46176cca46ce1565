"""Prefix autocomplete ("search-as-you-type") over the index dictionary.

The other query-side companion a web search box needs next to spell
correction (pipelines/spell.py): given a typed prefix, return the
top-n vocabulary completions ranked by document frequency — the
classic df-ordered prefix suggester.

Ray-Data-first shape:

  * the (tiny) prefix list is broadcast ONCE (``ray.put``);
  * ONE ``map_batches`` pass streams the dictionary; each batch
    matches every prefix with a vectorized Arrow
    ``pyarrow.compute.starts_with`` kernel (zero-copy over the
    dictionary block) and emits only its PARTIAL top-n per prefix —
    so at most ``n_prefixes x topn`` slim (prefix, term, df) rows
    leave each block regardless of corpus vocabulary size;
  * the driver merges the partials (a few hundred rows) with the same
    deterministic order (df desc, term asc).

At 100-TB scale the dictionary is already term-sorted inside each
committed segment, so a serving-side variant would replace the scan
with a ``searchsorted`` range per prefix; the streaming form here is
the right shape for the batch/pipeline context and needs no
assumption about block sort order.

The reference has no text-side analog (mini-ivf is vector-only); this
extends SURVEY §2.10's query-side surface the same way spell /
phrase / facets do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _partial_topn(
    prefix: str, terms: np.ndarray, dfs: np.ndarray, topn: int
) -> tuple[list[str], list[int]]:
    """Deterministic (df desc, term asc) head of one batch's matches."""
    if terms.size == 0:
        return [], []
    # lexsort: last key is primary -> sort by (term asc) then stable
    # by (-df) is not expressible directly for strings; do it in two
    # steps: order by term asc (mergesort-stable), then stable argsort
    # by -df keeps term order inside equal df.
    order = np.argsort(terms, kind="stable")
    t_sorted = terms[order]
    d_sorted = dfs[order]
    order2 = np.argsort(-d_sorted, kind="stable")[:topn]
    return list(t_sorted[order2]), [int(x) for x in d_sorted[order2]]


def prefix_suggest(
    dictionary_ds, prefixes: list[str], topn: int = 10
) -> pd.DataFrame:
    """(prefix, rank, term, df) — for each prefix the ``topn``
    dictionary terms starting with it, ranked (df desc, term asc).
    ``dictionary_ds`` is a Ray Dataset with (term, df) columns."""
    import ray

    prefixes = list(dict.fromkeys(prefixes))
    pref_ref = ray.put((prefixes, topn))

    def probe(batch: pa.Table) -> pa.Table:
        import ray as _ray

        prefs, n = _ray.get(pref_ref)
        term_col = batch["term"]
        dfs_all = batch["df"].to_numpy()
        out_p, out_t, out_df = [], [], []
        terms_np: np.ndarray | None = None
        for p in prefs:
            mask = pc.starts_with(term_col, pattern=p)
            idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
            if idx.size == 0:
                continue
            if terms_np is None:
                terms_np = term_col.to_numpy(zero_copy_only=False)
            ts, ds = _partial_topn(p, terms_np[idx], dfs_all[idx], n)
            out_p.extend([p] * len(ts))
            out_t.extend(ts)
            out_df.extend(ds)
        return pa.table(
            {
                "prefix": pa.array(out_p, type=pa.string()),
                "term": pa.array(out_t, type=pa.string()),
                "df": pa.array(out_df, type=pa.int64()),
            }
        )

    cands = dictionary_ds.map_batches(probe, batch_format="pyarrow").to_pandas()
    rows = []
    if len(cands):
        # dictionary terms are globally unique, so no de-dup needed;
        # merge the per-block partials with the same order.
        for p, g in cands.groupby("prefix", sort=True):
            g = g.sort_values(
                ["df", "term"], ascending=[False, True], kind="mergesort"
            ).head(topn)
            for r, (_, row) in enumerate(g.iterrows()):
                rows.append((p, r, row["term"], int(row["df"])))
    out = pd.DataFrame(rows, columns=["prefix", "rank", "term", "df"])
    for c in ("rank", "df"):
        out[c] = out[c].astype(np.int64) if len(out) else out[c]
    return out


def prefix_suggest_for_index(
    index_dir: str, prefixes: list[str], topn: int = 10
) -> pd.DataFrame:
    """Completions from a committed index's dictionary (term, df)."""
    import ray.data

    from mini_ivf_ray.stages.merge import load_dictionary

    d = load_dictionary(index_dir)
    return prefix_suggest(
        ray.data.from_arrow(d.select(["term", "df"])), prefixes, topn=topn
    )

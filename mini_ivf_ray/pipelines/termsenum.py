"""Terms enumeration over the index dictionary — Elasticsearch's
``_terms_enum`` API (Lucene ``TermsEnum.seekCeil`` + next): for a
prefix (and an optional ``search_after`` cursor term), the first
``size`` index terms in lexicographic order.

Where ES returns bare term strings, each row also carries the term's
document frequency straight from the index dictionary — the same
BOOKKEEPING (not a recompute) that ``dict_topdf`` pins hash-exact
against tokenize truth, so the oracle can verify both the enumeration
and the stored counts in one query.

Ray-Data-first shape (the wildcard.py companion):

  * the (tiny) request list is broadcast ONCE (``ray.put``);
  * ONE ``map_batches`` pass streams the dictionary; each block
    keeps terms with the prefix AND strictly after the cursor, and
    emits only its PARTIAL first-``size`` (term asc) per request — at
    most ``n_requests x size`` slim rows leave a block regardless of
    vocabulary size, and merging ascending partials is exact (the
    global first-N is a subset of the union of per-block first-Ns);
  * the driver merges (blocks x requests x size) rows and cuts the
    final first-``size`` per request.

Pagination contract (ES's): ``after`` is exclusive and composes with
the prefix — walking pages with ``after = last term of the previous
page`` enumerates every matching term exactly once (pytest-pinned).

Prefixes are restricted to ``[a-z0-9]*`` so the LIKE 'prefix%' replay
needs no escaping on either side; an empty prefix enumerates the
whole dictionary (ES allows ``string: ""``).

The reference has no text-side analog (mini-ivf is vector-only); this
extends SURVEY §2.10's query-side surface the same way wildcard /
autocomplete / dict_topdf do.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_PREFIX_RE = re.compile(r"^[a-z0-9]*$")


def terms_enum(
    dictionary_ds,
    requests: list[tuple[int, str, str | None]],
    size: int = 10,
) -> pd.DataFrame:
    """(request_id, pos, term, df) — for each (request_id, prefix,
    after) the first ``size`` dictionary terms with the prefix,
    strictly after ``after`` (None = from the start), term-ascending;
    ``pos`` is the 0-based position within the page.
    ``dictionary_ds`` is a Ray Dataset with (term, df) columns."""
    import ray

    if size <= 0:
        raise ValueError(f"size must be > 0, got {size}")
    reqs = []
    for rid, prefix, after in requests:
        if not _PREFIX_RE.match(prefix):
            raise ValueError(
                f"terms_enum prefix must match [a-z0-9]*: {prefix!r}"
            )
        reqs.append((int(rid), prefix, after))
    bundle_ref = ray.put((reqs, size))

    def probe(batch: pa.Table) -> pa.Table:
        import ray as _ray

        rq, n = _ray.get(bundle_ref)
        terms = batch["term"].to_numpy(zero_copy_only=False)
        terms_s = terms.astype(str)  # one '<U' view for all requests
        dfs = batch["df"].to_numpy()
        out_r, out_t, out_df = [], [], []
        for rid, prefix, after in rq:
            mask = (
                np.char.startswith(terms_s, prefix)
                if prefix
                else np.ones(terms_s.size, dtype=bool)
            )
            if after is not None:
                mask &= terms_s > after
            idx = np.flatnonzero(mask)
            if idx.size == 0:
                continue
            # partial ascending first-n — exact under the driver merge
            keep = idx[np.argsort(terms[idx], kind="stable")][:n]
            out_r.extend([rid] * keep.size)
            out_t.extend(terms[keep].tolist())
            out_df.extend(int(x) for x in dfs[keep])
        return pa.table(
            {
                "request_id": pa.array(out_r, type=pa.int64()),
                "term": pa.array(out_t, type=pa.string()),
                "df": pa.array(out_df, type=pa.int64()),
            }
        )

    parts = dictionary_ds.map_batches(probe, batch_format="pyarrow").to_pandas()
    rows = []
    if len(parts):
        for rid, g in parts.groupby("request_id", sort=True):
            g = g.sort_values("term", kind="mergesort").head(size)
            for pos, (_, row) in enumerate(g.iterrows()):
                rows.append((int(rid), pos, row["term"], int(row["df"])))
    out = pd.DataFrame(rows, columns=["request_id", "pos", "term", "df"])
    for c in ("request_id", "pos", "df"):
        out[c] = out[c].astype(np.int64) if len(out) else out[c]
    return out


def terms_enum_for_index(
    index_dir: str,
    requests: list[tuple[int, str, str | None]],
    size: int = 10,
) -> pd.DataFrame:
    """terms_enum over a committed index's dictionary (term, df)."""
    import ray.data

    from mini_ivf_ray.stages.merge import load_dictionary

    d = load_dictionary(index_dir)
    return terms_enum(
        ray.data.from_arrow(d.select(["term", "df"])), requests, size=size
    )

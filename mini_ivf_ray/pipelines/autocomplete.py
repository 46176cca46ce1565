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


def prefix_dl(prefix: str, term: str, max_edits: int) -> int:
    """Fuzzy-completion metric (ES completion suggester ``fuzzy``):
    min over k of DL(prefix, term[:k]) — a term completes ``prefix``
    within e edits iff SOME prefix of the term is within
    Damerau-Levenshtein e of it.  Since DL >= |length difference|,
    only k in [len(p)-e, len(p)+e] can qualify — the scan is 2e+1
    capped DPs, not len(term)."""
    from mini_ivf_ray.pipelines.spell import damerau_levenshtein

    lp = len(prefix)
    best = max_edits + 1
    lo = max(0, lp - max_edits)
    hi = min(len(term), lp + max_edits)
    for k in range(lo, hi + 1):
        d = damerau_levenshtein(prefix, term[:k], cap=max_edits)
        if d < best:
            best = d
            if best == 0:
                break
    return best


def fuzzy_suggest(
    dictionary_ds,
    prefixes: list[str],
    topn: int = 10,
    max_edits: int = 1,
) -> pd.DataFrame:
    """(prefix, rank, term, df, dl) — for each typed prefix the
    ``topn`` dictionary completions within ``max_edits`` Damerau
    edits OF THE PREFIX (ES completion suggester with ``fuzzy``),
    ranked (dl asc, df desc, term asc) — exact-prefix completions
    always outrank fuzzy ones (ES's boost of non-fuzzy matches,
    pinned as a hard sort key).

    Same deployment as prefix_suggest: prefixes broadcast once, ONE
    streamed dictionary pass with a length prefilter (len(term) >=
    len(p) - e) and per-block partial top-n, driver merge.  At 100-TB
    dictionary scale the SymSpell delete-key index over stored
    prefixes (spell.py's machinery) would replace the per-term DP
    scan; the one-pass form is the right trade for a
    vocabulary-sized dictionary."""
    import ray

    if max_edits < 0:
        raise ValueError(f"max_edits must be >= 0, got {max_edits}")
    prefixes = list(dict.fromkeys(prefixes))
    pref_ref = ray.put((prefixes, topn, max_edits))

    def probe(batch: pa.Table) -> pa.Table:
        import ray as _ray

        prefs, n, e = _ray.get(pref_ref)
        terms = batch["term"].to_numpy(zero_copy_only=False)
        dfs_all = batch["df"].to_numpy()
        lens = np.fromiter(
            (len(t) for t in terms), dtype=np.int64, count=len(terms)
        )
        out_p, out_t, out_df, out_dl = [], [], [], []
        for p in prefs:
            # ES fuzzy min_length: prefixes shorter than 3 chars are
            # completed exactly (a 1-char prefix at e=1 would match
            # the whole dictionary through the k=0 deletion)
            pe = e if len(p) >= 3 else 0
            cand = np.flatnonzero(lens >= len(p) - pe)
            rows = []
            for i in cand:
                d = prefix_dl(p, terms[i], pe)
                if d <= pe:
                    rows.append((d, -int(dfs_all[i]), terms[i], int(i)))
            rows.sort()
            for d, ndf, t, i in rows[:n]:
                out_p.append(p)
                out_t.append(t)
                out_df.append(-ndf)
                out_dl.append(d)
        return pa.table(
            {
                "prefix": pa.array(out_p, type=pa.string()),
                "term": pa.array(out_t, type=pa.string()),
                "df": pa.array(out_df, type=pa.int64()),
                "dl": pa.array(out_dl, type=pa.int64()),
            }
        )

    cands = dictionary_ds.map_batches(probe, batch_format="pyarrow").to_pandas()
    rows = []
    if len(cands):
        for p, g in cands.groupby("prefix", sort=True):
            g = g.sort_values(
                ["dl", "df", "term"],
                ascending=[True, False, True],
                kind="mergesort",
            ).head(topn)
            for r, (_, row) in enumerate(g.iterrows()):
                rows.append(
                    (p, r, row["term"], int(row["df"]), int(row["dl"]))
                )
    out = pd.DataFrame(rows, columns=["prefix", "rank", "term", "df", "dl"])
    for c in ("rank", "df", "dl"):
        out[c] = out[c].astype(np.int64) if len(out) else out[c]
    return out


def fuzzy_suggest_for_index(
    index_dir: str,
    prefixes: list[str],
    topn: int = 10,
    max_edits: int = 1,
) -> pd.DataFrame:
    """Fuzzy completions from a committed index's dictionary."""
    import ray.data

    from mini_ivf_ray.stages.merge import load_dictionary

    d = load_dictionary(index_dir)
    return fuzzy_suggest(
        ray.data.from_arrow(d.select(["term", "df"])),
        prefixes,
        topn=topn,
        max_edits=max_edits,
    )


def context_suggest(
    docs_ds,
    requests: list[tuple[int, str, str]],
    topn: int = 5,
    context_col: str = "lang",
) -> pd.DataFrame:
    """ES completion-suggester CONTEXTS (category context): for each
    (request_id, prefix, context) the ``topn`` completions ranked by
    the term's document frequency WITHIN the context's documents
    (df desc, term asc) — "suggest 's...' for German users" ranks by
    German df, not global df.

    Shape: ONE streamed tokenize pass emits per-block PARTIAL
    (context, term, n) counts restricted to the requested contexts
    and to terms carrying any requested prefix (both prefilters keep
    partial rows context-and-prefix-bounded, never vocabulary-sized);
    ONE ``groupby(context, term).sum`` exchange makes the counts
    exact; the driver ranks the per-request windows over the summed
    panel.  Per-doc DISTINCT terms (df semantics, not cf)."""
    import ray

    if topn < 1:
        raise ValueError(f"topn must be >= 1, got {topn}")
    reqs = [(int(r), p, c) for r, p, c in requests]
    ctxs = sorted({c for _, _, c in reqs})
    prefs = sorted({p for _, p, _ in reqs})
    bundle_ref = ray.put((ctxs, tuple(prefs)))

    def partial(batch: pa.Table) -> pa.Table:
        from mini_ivf_ray.functions.tokenize import tokenize as _tok

        ctx_l, pref_l = ray.get(bundle_ref)
        counts: dict[tuple[str, str], int] = {}
        for ctx, text in zip(
            batch[context_col].to_pylist(), batch["text"].to_pylist()
        ):
            if ctx not in ctx_l:
                continue
            for t in set(_tok(text)):
                if t.startswith(pref_l):
                    counts[(ctx, t)] = counts.get((ctx, t), 0) + 1
        if not counts:
            return pa.table(
                {
                    "ctx": pa.array([], type=pa.string()),
                    "term": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        cs, ts = zip(*counts.keys())
        return pa.table(
            {
                "ctx": pa.array(list(cs), type=pa.string()),
                "term": pa.array(list(ts), type=pa.string()),
                "n": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    merged = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["ctx", "term"])
        .sum("n")
        .to_pandas()
    )
    rows = []
    if len(merged):
        merged = merged.rename(columns={"sum(n)": "df"})
        for rid, p, c in sorted(reqs):
            g = merged[
                (merged["ctx"] == c)
                & merged["term"].str.startswith(p)
            ]
            g = g.sort_values(
                ["df", "term"], ascending=[False, True], kind="mergesort"
            ).head(topn)
            for r, (_, row) in enumerate(g.iterrows()):
                rows.append((rid, r, row["term"], int(row["df"])))
    out = pd.DataFrame(rows, columns=["request_id", "rank", "term", "df"])
    for col in ("request_id", "rank", "df"):
        out[col] = out[col].astype(np.int64) if len(out) else out[col]
    return out

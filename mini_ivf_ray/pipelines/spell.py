"""Spell correction / "did you mean" over the index dictionary.

The query-side companion the fulltext engine needs for web search:
a misspelled query term is matched against the corpus vocabulary
within Levenshtein distance ``max_edits`` and ranked by
(distance asc, document frequency desc, term asc).

Ray-Data-first shape (SymSpell candidate generation, Garbe 2012 —
public algorithm): a pair of terms with lev(a, b) <= e always shares
at least one deletion variant of depth <= e (substitution deletes one
char from each side, insertion into ``a`` is a deletion from ``b``),
so candidates are found by intersecting DELETE-KEY sets instead of
scanning vocab x queries with a DP:

  * the (tiny) query side's delete keys are broadcast ONCE (ray.put);
  * ONE ``map_batches`` pass streams the dictionary — each batch
    length-prefilters (exact for Levenshtein: |len difference| <= e),
    generates its terms' delete keys, and emits only intersecting
    candidates — zero shuffle, no driver-side vocab scan;
  * the candidate set (per query a handful of terms) is verified with
    an exact banded DP on the driver — common-delete pairs can sit at
    distance up to 2e, so verification is required for exactness —
    and ranked deterministically.

At serving scale the delete-key table would be built once and kept as
a persisted sorted lookup next to the dictionary (the same
searchsorted S-dtype pattern sources/decoded.py uses); the one-pass
form here recomputes it per call, which is the right trade for a
batch pipeline and keeps the operator stateless.

The reference has no text-side analog (mini-ivf is vector-only); this
extends SURVEY §2.10's query-side surface the same way phrase and
conjunctive retrieval do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def deletion_keys(term: str, max_edits: int) -> set[str]:
    """All strings reachable from ``term`` by deleting up to
    ``max_edits`` characters (including ``term`` itself)."""
    keys = {term}
    frontier = {term}
    for _ in range(max_edits):
        nxt = set()
        for s in frontier:
            for i in range(len(s)):
                nxt.add(s[:i] + s[i + 1 :])
        nxt -= keys
        keys |= nxt
        frontier = nxt
    return keys


def levenshtein(a: str, b: str, cap: int | None = None) -> int:
    """Standard Levenshtein DP (insert/delete/substitute, unit costs —
    the same metric DuckDB's ``levenshtein()`` computes).  ``cap``
    short-circuits rows whose minimum already exceeds it."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return max(la, lb)
    prev = np.arange(lb + 1, dtype=np.int64)
    cur = np.empty(lb + 1, dtype=np.int64)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    for i, ca in enumerate(a, 1):
        cur[0] = i
        sub = prev[:-1] + (bb != ord(ca))
        # vectorized ins/sub, then the sequential delete relaxation
        np.minimum(prev[1:] + 1, sub, out=cur[1:])
        for j in range(1, lb + 1):  # delete chain is inherently serial
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        if cap is not None and cur.min() > cap:
            return cap + 1
        prev, cur = cur, prev
    return int(prev[lb])


def damerau_levenshtein(a: str, b: str, cap: int | None = None) -> int:
    """Full (unrestricted) Damerau-Levenshtein distance — the
    Lowrance-Wagner 1975 DP with the per-character last-seen table,
    the same metric DuckDB's ``damerau_levenshtein()`` computes
    (pytest-pinned against it on random pairs; e.g. DL('ca','abc')=2
    where the restricted/OSA variant gives 3).  ``cap`` short-circuits
    once a full DP row exceeds it."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return max(la, lb)
    inf = la + lb
    d = np.empty((la + 2, lb + 2), dtype=np.int64)
    d[0, :] = inf
    d[:, 0] = inf
    d[1, 1:] = np.arange(lb + 1)
    d[2:, 1] = np.arange(2, la + 2) - 1
    da: dict[str, int] = {}
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            i1 = da.get(b[j - 1], 0)
            j1 = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1, j + 1] = min(
                d[i, j] + cost,  # substitution / match
                d[i + 1, j] + 1,  # insertion
                d[i, j + 1] + 1,  # deletion
                # transposition across the gap since the chars last met
                d[i1, j1] + (i - i1 - 1) + 1 + (j - j1 - 1),
            )
        da[a[i - 1]] = i
        if cap is not None and d[i + 1, 1:].min() > cap:
            return cap + 1
    return int(d[la + 1, lb + 1])


def suggest_terms(
    dictionary_ds,
    queries: list[str],
    max_edits: int = 2,
    topn: int = 3,
    transpositions: bool = False,
    sort: str = "score",
) -> pd.DataFrame:
    """(query, suggestion, lev, df, rank) for each query term: the
    ``topn`` vocabulary terms within ``max_edits``, ranked
    (lev asc, df desc, term asc).  ``dictionary_ds`` is a Ray Dataset
    with (term, df) — e.g. the index dictionary.

    ``transpositions=True`` switches the verify metric to the full
    Damerau-Levenshtein (adjacent transposition = one edit — ES
    fuzziness' default behavior; the ``lev`` column then holds DL).
    Candidate generation is unchanged: a transposition pair shares a
    depth-1 deletion variant ('ab'/'ba' -> 'a'), and in general
    DL <= e pairs share a delete of depth <= e (SymSpell's Damerau
    guarantee, Garbe 2012), and every DL edit changes length by at
    most 1 so the length prefilter stays exact.

    ``sort``: "score" (default) ranks (lev asc, df desc, term asc) —
    ES term suggester ``sort: score``; "frequency" ranks
    (df desc, lev asc, term asc) — ES ``sort: frequency``, preferring
    popular corrections over close ones."""
    import ray

    queries = list(dict.fromkeys(queries))  # de-dup, keep order
    qkeys: dict[str, set[str]] = {
        q: deletion_keys(q, max_edits) for q in queries
    }
    all_keys = frozenset().union(*qkeys.values()) if queries else frozenset()
    bundle_ref = ray.put(
        (sorted(qkeys.items()), all_keys, max_edits)
    )

    def probe(batch: pa.Table) -> pa.Table:
        import ray as _ray

        q_items, keys, e = _ray.get(bundle_ref)
        terms = batch["term"].to_numpy(zero_copy_only=False)
        dfs = batch["df"].to_numpy()
        lens = np.fromiter((len(t) for t in terms), dtype=np.int64,
                           count=len(terms))
        out_q, out_t, out_df = [], [], []
        for q, qk in q_items:
            lq = len(q)
            # exact length prefilter: lev >= |len(a) - len(b)|
            cand = np.flatnonzero(np.abs(lens - lq) <= e)
            for i in cand:
                t = terms[i]
                if t in keys or not qk.isdisjoint(deletion_keys(t, e)):
                    out_q.append(q)
                    out_t.append(t)
                    out_df.append(int(dfs[i]))
        return pa.table(
            {
                "query": pa.array(out_q, type=pa.string()),
                "term": pa.array(out_t, type=pa.string()),
                "df": pa.array(out_df, type=pa.int64()),
            }
        )

    cands = dictionary_ds.map_batches(
        probe, batch_format="pyarrow"
    ).to_pandas()
    rows = []
    dist = damerau_levenshtein if transpositions else levenshtein
    if len(cands):
        cands = cands.drop_duplicates(["query", "term"])
        for q, g in cands.groupby("query", sort=True):
            g = g.assign(
                lev=[dist(q, t, cap=max_edits) for t in g["term"]]
            )
            g = g[g["lev"] <= max_edits]
            if sort == "frequency":
                keys, asc = ["df", "lev", "term"], [False, True, True]
            elif sort == "score":
                keys, asc = ["lev", "df", "term"], [True, False, True]
            else:
                raise ValueError(f"unknown sort mode {sort!r}")
            g = g.sort_values(
                keys, ascending=asc, kind="mergesort"
            ).head(topn)
            for r, (_, row) in enumerate(g.iterrows()):
                rows.append((q, row["term"], int(row["lev"]),
                             int(row["df"]), r))
    out = pd.DataFrame(
        rows, columns=["query", "suggestion", "lev", "df", "rank"]
    )
    for c in ("lev", "df", "rank"):
        out[c] = out[c].astype(np.int64) if len(out) else out[c]
    return out


def suggest_for_index(
    index_dir: str, queries: list[str], max_edits: int = 2, topn: int = 3,
    sort: str = "score",
) -> pd.DataFrame:
    """Suggestions from a committed index's dictionary (term, df)."""
    import ray.data

    from mini_ivf_ray.stages.merge import load_dictionary

    d = load_dictionary(index_dir)
    return suggest_terms(
        ray.data.from_arrow(d.select(["term", "df"])),
        queries, max_edits=max_edits, topn=topn, sort=sort,
    )

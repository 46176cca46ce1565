"""T-test aggregation: Elasticsearch ``t_test`` over the match set —
per query, Student's t statistic for the difference in means of a
numeric per-document field between two filter-defined sides of the
match set ("is the mean doc length of results mentioning X different
from those mentioning Y?").

Modes, exactly ES's two unpaired ones:

  * ``heteroscedastic`` (ES default) — Welch's t:
        t  = (ma - mb) / sqrt(va/na + vb/nb)
        df = (va/na + vb/nb)^2
             / ((va/na)^2/(na-1) + (vb/nb)^2/(nb-1))   (Welch
                                                        - Satterthwaite)
  * ``homoscedastic`` — pooled:
        vp = ((na-1)*va + (nb-1)*vb) / (na + nb - 2)
        t  = (ma - mb) / sqrt(vp * (1/na + 1/nb))
        df = na + nb - 2

with SAMPLE variances v = (ss - s*s/n) / (n - 1) (ddof=1, the t-test
convention — unlike extstats' population variance).  ES's ``paired``
mode needs two fields on one doc and is the matrix_stats xy shape; it
is omitted here (documented divergence #1).  ES returns the p-value;
inverting the t CDF needs the regularized incomplete beta function,
which a SQL oracle cannot replay, so this analog reports (t, df) — the
sufficient statistics every t-table keys on (documented divergence
#2).

Each side's partial is the additive triple (n, sum, sumsq), so the
distributed shape is extstats twice: one slim 6-number row per
(query, shard), merged by plain addition (exact below 2^53 on
integer-valued fields), derived once driver-side by the fixed float64
op sequence in :func:`derived_ttest` that the SQL oracle replays
verbatim.  Side membership is INDEX-LOCAL — each side is "matched docs
also containing filter term a/b", and the filter postings are fetched
once per actor through the same partition-selective reader the query
terms use (the adjacency/boosting pattern: no sidecar beyond the value
one, nothing broadcast but the two filter strings).

Guard rules, pinned: a side needs n >= 2 (a variance needs a second
observation) and the denominator must be > 0 (two constant equal-mean
sides have no t) — queries failing either emit NO row, and the SQL
oracle's HAVING replays both.  Filters may overlap; a doc matching
both filters contributes to both sides (ES's filters are independent).

Reference analogy: QueryObs' per-cluster histogram
(index_ivfpq.cpp:412-470) reduced to two-sample moments.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.pipelines.extstats import ExtStatsSearcher
from mini_ivf_ray.pipelines.query import _allowed_mask

TTEST_COLUMNS = ["query_id", "na", "nb", "mean_a", "mean_b", "t", "df"]

MODES = ("heteroscedastic", "homoscedastic")


def derived_ttest(na, sa, ssa, nb, sb, ssb, mode: str):
    """(mean_a, mean_b, t, df) from merged side moments — the ONE
    float64 op sequence every path and the SQL oracle replay; returns
    None when a guard fails (side too small / zero denominator)."""
    if na < 2 or nb < 2:
        return None
    ma = sa / na
    mb = sb / nb
    va = (ssa - sa * sa / na) / (na - 1)
    vb = (ssb - sb * sb / nb) / (nb - 1)
    va = va if va > 0.0 else 0.0
    vb = vb if vb > 0.0 else 0.0
    if mode == "heteroscedastic":
        sea = va / na
        seb = vb / nb
        denom2 = sea + seb
        if denom2 <= 0.0:
            return None
        t = (ma - mb) / float(np.sqrt(denom2))
        df = (denom2 * denom2) / (
            sea * sea / (na - 1) + seb * seb / (nb - 1)
        )
    else:
        vp = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
        denom2 = vp * (1.0 / na + 1.0 / nb)
        if denom2 <= 0.0:
            return None
        t = (ma - mb) / float(np.sqrt(denom2))
        df = float(na + nb - 2)
    return ma, mb, t, df


class TTestSearcher(ExtStatsSearcher):
    """Actor-pool stage: (query_id, text) -> one t-test row per query.
    Filter postings for both sides are fetched ONCE per actor in
    __init__ (query-independent, partition-selective)."""

    def __init__(self, *args, term_a=None, term_b=None,
                 mode="heteroscedastic", **kwargs):
        super().__init__(*args, **kwargs)
        if mode not in MODES:
            raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
        self.mode = mode
        self.side_docs = []
        for term in (term_a, term_b):
            if not term:
                raise ValueError("t_test needs two non-empty filter terms")
            if self.stats.df.get(term, 0) <= 0:
                self.side_docs.append(np.empty(0, dtype=np.uint64))
                continue
            wanted = {term: self.stats.term_locations(term, self.cfg)}
            b = self.reader.fetch_terms(wanted).get(term)
            if b is None or not b.n_blocks:
                self.side_docs.append(np.empty(0, dtype=np.uint64))
                continue
            b.set_scoring(
                bm25.idf(self.stats.df[term], self.stats.n_docs),
                self.stats.avgdl,
                self.cfg.k1,
                self.cfg.b,
            )
            self.side_docs.append(b.all_postings()[0])

    def side_moments_for_text(self, qtext: str):
        """((na, sa, ssa), (nb, sb, ssb)) over the match set's
        field-carrying docs per filter side — the additive partials."""
        docs = self.disjunctive_matches_for_text(qtext)
        if not docs.size or not self.value_ids.size:
            return None
        idx = np.searchsorted(self.value_ids, docs)
        np.minimum(idx, self.value_ids.size - 1, out=idx)
        hit = self.value_ids[idx] == docs
        docs = docs[hit]
        vals = self.values[idx[hit]]
        out = []
        for fd in self.side_docs:
            m = _allowed_mask(docs, fd)
            v = vals[m]
            out.append(
                (int(v.size), float(np.sum(v)), float(np.sum(v * v)))
            )
        return out[0], out[1]

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {c: [] for c in TTEST_COLUMNS}
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sm = self.side_moments_for_text(qtext)
            if sm is None:
                continue
            (na, sa, ssa), (nb, sb, ssb) = sm
            d = derived_ttest(na, sa, ssa, nb, sb, ssb, self.mode)
            if d is None:
                continue
            ma, mb, t, df = d
            rows["query_id"].append(qid)
            rows["na"].append(na)
            rows["nb"].append(nb)
            rows["mean_a"].append(ma)
            rows["mean_b"].append(mb)
            rows["t"].append(t)
            rows["df"].append(df)
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "na": pa.array(rows["na"], type=pa.int64()),
                "nb": pa.array(rows["nb"], type=pa.int64()),
                **{
                    c: pa.array(rows[c], type=pa.float64())
                    for c in TTEST_COLUMNS[3:]
                },
            }
        )


def t_test_search(
    index_dir: str,
    queries_ds,
    value_ids,
    values,
    term_a: str,
    term_b: str,
    mode: str = "heteroscedastic",
    cfg: PipelineConfig | None = None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> one (query_id, na, nb, mean_a,
    mean_b, t, df) row per query: the two-sample t statistic for the
    field between matched docs containing ``term_a`` vs ``term_b``
    (ES t_test; modes/guards/divergences in the module docstring)."""
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
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
        TTestSearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded, values_ref),
        fn_constructor_kwargs={
            "denied_ref": denied_ref,
            "term_a": term_a,
            "term_b": term_b,
            "mode": mode,
        },
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )

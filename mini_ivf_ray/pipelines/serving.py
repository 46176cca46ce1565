"""Document-sharded query serving: partition searcher actors + merge.

Reference analog (SURVEY T2): query serving as an actor pool of
partition searchers, each holding its partitions' segments, fan-out per
query, merge heaps.  The data-parallel ``query.search`` path replicates
per-actor decode caches (every actor eventually touches every hot
term), which caps scaling; here each ``RangeSearcher`` actor owns a
docID RANGE — it decodes only the posting blocks overlapping its range
(~1/R of the index) regardless of pool size, so warm-up work scales
down as actors scale up.

Exactness: blocks are docID-range-contiguous, so a doc's HOME shard
(the one whose [lo, hi] contains its docID) sees every block that
contains the doc and computes its FULL score with the canonical
accumulation; a neighbouring shard reached via a boundary block may
score the same doc with only the subset of query terms whose blocks
cross into its range — a PARTIAL (lower-or-equal, contributions are
positive) score.  The merge therefore keeps the MAX score per
(query_id, doc_id) (== the home shard's full score), then ranks
(score desc, doc_id asc).  Any global top-k doc makes its home
shard's local top-k: every candidate that locally outranks it does so
with a partial score <= its own full score, hence also outranks it
globally — so the merged union contains the exact global top-k.

This module deliberately uses raw Ray actors (not Dataset): serving
needs query fan-out to ALL shards + a merge, which ``map_batches``'s
one-actor-per-batch routing cannot express (SURVEY §2 custom-operator
rule (b))."""

from __future__ import annotations

import numpy as np
import pandas as pd

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import (
    _taat_accumulate,
    share_segments,
    topk_from_blocks,
)
from mini_ivf_ray.sources.segments import PostingBlocks, SegmentReader
from mini_ivf_ray.state.stats import CorpusStats


def _tombstone_ref(index_dir: str):
    """ray.put of the index's persisted tombstone set (None when
    empty): the same live-docs mask ``query.search`` merges in by
    default, broadcast ONCE for the pool/shard actors.  Tombstone sets
    are increment-sized (Lucene deleted-docs: compaction physically
    removes them), never corpus-sized."""
    from mini_ivf_ray.pipelines.maintenance import deleted_ids

    tomb = deleted_ids(index_dir)
    if not tomb.size:
        return None
    import ray

    return ray.put(tomb)


class RangeSearcher:
    """One shard: all terms, posting blocks overlapping [lo, hi]."""

    def __init__(
        self,
        index_dir: str,
        cfg: PipelineConfig,
        lo: int,
        hi: int,
        shared_tables: dict | None = None,
        denied_ref=None,
    ):
        self.cfg = cfg
        self.lo, self.hi = lo, hi
        self.stats = CorpusStats.load(index_dir)
        self.reader = SegmentReader(index_dir, shared_tables=shared_tables)
        self._range_cache: dict[str, PostingBlocks | None] = {}
        # persisted tombstones (Lucene deleted-docs semantics): the FULL
        # set, not a range slice — a foreign boundary doc's partial-score
        # row must also be masked, or it would become the deleted doc's
        # only (and surviving) row at the merge
        if denied_ref is not None:
            import ray

            arr = (
                ray.get(denied_ref)
                if isinstance(denied_ref, ray.ObjectRef)
                else denied_ref
            )
            self.denied = np.asarray(arr, dtype=np.uint64)
        else:
            self.denied = None
        # shard-local attribute sidecar: (doc ids sorted asc, int64
        # codes) covering ONLY [lo, hi] — set via set_sidecar; this is
        # what keeps facet/collapse serving O(corpus / num_shards) per
        # node instead of an O(corpus) broadcast (facets.py:11-18)
        self.side_ids = np.empty(0, dtype=np.uint64)
        self.side_codes = np.empty(0, dtype=np.int64)
        # shard-local NUMERIC sidecar (float64 values) for moment
        # aggregations — set via set_value_sidecar
        self.val_ids = np.empty(0, dtype=np.uint64)
        self.vals = np.empty(0, dtype=np.float64)

    def set_sidecar(self, ref) -> int:
        """Install this shard's (ids, codes) sidecar SLICE (already
        restricted to [lo, hi] by the driver).  Returns the slice length
        so the driver can assert full coverage."""
        import ray

        ids, codes = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        ids = np.asarray(ids, dtype=np.uint64)
        if ids.size and (int(ids[0]) < self.lo or int(ids[-1]) > self.hi):
            raise ValueError(
                f"sidecar slice [{ids[0]}, {ids[-1]}] escapes shard "
                f"range [{self.lo}, {self.hi}]"
            )
        if ids.size > 1 and not np.all(ids[:-1] < ids[1:]):
            raise ValueError("sidecar slice must be sorted by unique doc_id")
        self.side_ids = ids
        self.side_codes = np.asarray(codes, dtype=np.int64)
        return int(ids.size)

    def set_value_sidecar(self, ref) -> int:
        """Install this shard's (ids, float64 values) slice (already
        restricted to [lo, hi] by the driver) for moment aggregations
        (extstats.py).  Returns the slice length for coverage asserts."""
        import ray

        ids, vals = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        ids = np.asarray(ids, dtype=np.uint64)
        if ids.size and (int(ids[0]) < self.lo or int(ids[-1]) > self.hi):
            raise ValueError(
                f"value-sidecar slice [{ids[0]}, {ids[-1]}] escapes "
                f"shard range [{self.lo}, {self.hi}]"
            )
        if ids.size > 1 and not np.all(ids[:-1] < ids[1:]):
            raise ValueError(
                "value-sidecar slice must be sorted by unique doc_id"
            )
        self.val_ids = ids
        self.vals = np.asarray(vals, dtype=np.float64)
        return int(ids.size)

    def set_xy_sidecar(self, ref) -> int:
        """Install this shard's (ids, x, y) joined slice (already
        restricted to [lo, hi] by the driver) for joint-moment
        aggregations (matrix.py).  Returns the slice length for
        coverage asserts."""
        import ray

        ids, x, y = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        ids = np.asarray(ids, dtype=np.uint64)
        if ids.size and (int(ids[0]) < self.lo or int(ids[-1]) > self.hi):
            raise ValueError(
                f"xy-sidecar slice [{ids[0]}, {ids[-1]}] escapes "
                f"shard range [{self.lo}, {self.hi}]"
            )
        if ids.size > 1 and not np.all(ids[:-1] < ids[1:]):
            raise ValueError("xy-sidecar slice must be sorted by unique doc_id")
        self.xy_ids = ids
        self.xy_x = np.asarray(x, dtype=np.float64)
        self.xy_y = np.asarray(y, dtype=np.float64)
        return int(ids.size)

    def matrix_batch(self, queries: list[tuple[int, str]]) -> pd.DataFrame:
        """Per-shard matrix-stats PARTIALS: the additive co-moments
        (n, sx, sy, sxx, syy, sxy) over this shard's slice of the
        match set's both-fields docs — one slim row per (query,
        shard), mergeable by plain addition (matrix.merge_comoments,
        exact in any order for integer-valued fields below 2^53)."""
        from mini_ivf_ray.pipelines.matrix import co_moments

        cols = ["query_id", "n", "sx", "sy", "sxx", "syy", "sxy"]
        out = {c: [] for c in cols}
        xy_ids = getattr(self, "xy_ids", np.empty(0, dtype=np.uint64))
        for qid, qtext in queries:
            docs, _ = self._in_range_scored(qtext, full=False)
            if not docs.size or not xy_ids.size:
                continue
            idx = np.searchsorted(xy_ids, docs)
            np.minimum(idx, xy_ids.size - 1, out=idx)
            hit = xy_ids[idx] == docs
            sel = idx[hit]
            if not sel.size:
                continue
            m = co_moments(self.xy_x[sel], self.xy_y[sel])
            out["query_id"].append(qid)
            for c, v in zip(cols[1:], m):
                out[c].append(v)
        return pd.DataFrame(out)

    def weighted_batch(self, queries: list[tuple[int, str]]) -> pd.DataFrame:
        """Per-shard weighted-avg PARTIALS (n, sw, svw) over this
        shard's slice of the match set's both-fields docs (x = value,
        y = weight of the xy sidecar) — additive, one slim row per
        (query, shard).  Zero-weight handling happens at the DRIVER
        after the merge (a shard-local zero sum says nothing about the
        global sum)."""
        out = {"query_id": [], "n": [], "sw": [], "svw": []}
        xy_ids = getattr(self, "xy_ids", np.empty(0, dtype=np.uint64))
        for qid, qtext in queries:
            docs, _ = self._in_range_scored(qtext, full=False)
            if not docs.size or not xy_ids.size:
                continue
            idx = np.searchsorted(xy_ids, docs)
            np.minimum(idx, xy_ids.size - 1, out=idx)
            hit = xy_ids[idx] == docs
            sel = idx[hit]
            if not sel.size:
                continue
            w = self.xy_y[sel]
            out["query_id"].append(qid)
            out["n"].append(int(sel.size))
            out["sw"].append(float(np.sum(w)))
            out["svw"].append(float(np.sum(self.xy_x[sel] * w)))
        return pd.DataFrame(out)

    def top_metrics_batch(
        self, queries: list[tuple[int, str]], size: int
    ) -> pd.DataFrame:
        """Per query, this shard's LOCAL top-``size`` rows by (sort_v
        desc, doc asc) over its slice of the match set's both-fields
        docs (x = sort, y = metric of the xy sidecar).  Each doc lives
        in exactly one shard's slice, so a global top row is its home
        shard's local top row and the driver re-cut over (queries x
        shards x size) slim rows is exact."""
        from mini_ivf_ray.pipelines.metricsagg import top_metrics_rows

        out = {"query_id": [], "doc_id": [], "sort_v": [], "metric_v": []}
        xy_ids = getattr(self, "xy_ids", np.empty(0, dtype=np.uint64))
        for qid, qtext in queries:
            docs, _ = self._in_range_scored(qtext, full=False)
            if not docs.size or not xy_ids.size:
                continue
            idx = np.searchsorted(xy_ids, docs)
            np.minimum(idx, xy_ids.size - 1, out=idx)
            hit = xy_ids[idx] == docs
            sel = idx[hit]
            if not sel.size:
                continue
            d, sv, mv = top_metrics_rows(
                xy_ids[sel], self.xy_x[sel], self.xy_y[sel], size
            )
            out["query_id"].extend([qid] * d.size)
            out["doc_id"].extend(d.tolist())
            out["sort_v"].extend(sv.tolist())
            out["metric_v"].extend(mv.tolist())
        df = pd.DataFrame(out)
        if len(df):
            df["doc_id"] = df["doc_id"].astype(np.uint64)
        return df

    def extstats_batch(self, queries: list[tuple[int, str]]) -> pd.DataFrame:
        """Per query, this shard's PARTIAL moments (n, sum, sumsq, min,
        max) over its slice of the disjunctive match set — additive /
        min-max mergeable (extstats.merge_moments), one slim row per
        (query, shard), never doc-proportional."""
        out = {"query_id": [], "n": [], "s": [], "ss": [], "lo_v": [], "hi_v": []}
        for qid, qtext in queries:
            docs, _ = self._in_range_scored(qtext, full=False)
            if not docs.size or not self.val_ids.size:
                continue
            idx = np.searchsorted(self.val_ids, docs)
            np.minimum(idx, self.val_ids.size - 1, out=idx)
            hit = self.val_ids[idx] == docs
            v = self.vals[idx[hit]]
            if not v.size:
                continue
            out["query_id"].append(qid)
            out["n"].append(int(v.size))
            out["s"].append(float(np.sum(v)))
            out["ss"].append(float(np.sum(v * v)))
            out["lo_v"].append(float(np.min(v)))
            out["hi_v"].append(float(np.max(v)))
        return pd.DataFrame(out)

    def rerank_batch(
        self, queries: list[tuple], mode: str, params: dict
    ) -> pd.DataFrame:
        """Per-shard top-k under a per-doc rerank — the doc-sharded
        scale path for the whole rerank family:

          mode "rank_feature": score + feature_contrib(value)  (additive)
          mode "decay":        score * decay_multiplier(value)
          mode "boosting":     score * nb on the negative match set
                               (queries carry (qid, positive,
                               negative, nb) in that mode)

        Exactness relies on the `_in_range_scored` mask, NOT the
        max-merge trick `search_batch` uses: a per-doc factor does not
        commute with max over PARTIAL scores (a foreign boundary
        shard lacks the doc's sidecar value — decay * 1.0 on a partial
        score could outrank the home shard's full * 0.2), so every doc
        is scored fully in exactly ONE shard (its home range) and the
        driver merge is a plain (score desc, doc asc) top-k over
        shards x k candidate rows."""
        import numpy as _np

        out = {"query_id": [], "doc_id": [], "score": []}
        k = self.cfg.topk
        if mode in ("rank_feature", "decay"):
            if mode == "rank_feature":
                from mini_ivf_ray.pipelines.rankfeature import feature_contrib

                adjust = feature_contrib(self.vals, **params)
                additive = True
            else:
                from mini_ivf_ray.pipelines.decay import decay_multiplier

                adjust = decay_multiplier(self.vals, **params)
                additive = False
            for qid, qtext in queries:
                docs, scores = self._in_range_scored(qtext, full=True)
                if scores is None or not docs.size:
                    continue
                if self.val_ids.size:
                    idx = _np.searchsorted(self.val_ids, docs)
                    _np.minimum(idx, self.val_ids.size - 1, out=idx)
                    hit = self.val_ids[idx] == docs
                    if additive:
                        scores = scores + _np.where(hit, adjust[idx], 0.0)
                    else:
                        scores = scores * _np.where(hit, adjust[idx], 1.0)
                self._emit_topk(out, qid, docs, scores, k)
        elif mode == "has_child":
            # parentjoin.HasChildSearcher shard-local: the value
            # sidecar holds ONLY qualifying parents' contributions
            # (min_children already applied driver-side), so the hit
            # mask IS the must-gate — non-hits are DROPPED, hits add
            for qid, qtext in queries:
                docs, scores = self._in_range_scored(qtext, full=True)
                if scores is None or not docs.size or not self.val_ids.size:
                    continue
                idx = _np.searchsorted(self.val_ids, docs)
                _np.minimum(idx, self.val_ids.size - 1, out=idx)
                hit = self.val_ids[idx] == docs
                docs = docs[hit]
                scores = scores[hit] + self.vals[idx[hit]]
                if docs.size:
                    self._emit_topk(out, qid, docs, scores, k)
        elif mode == "boosting":
            for qid, positive, negative, nb in queries:
                nbf = float(nb)
                if not (0.0 <= nbf <= 1.0):
                    raise ValueError(
                        f"negative_boost must be in [0, 1], got {nb}"
                    )
                docs, scores = self._in_range_scored(positive, full=True)
                if scores is None or not docs.size:
                    continue
                neg_parts = []
                for t in sorted(set(tokenize(negative))):
                    if self.stats.df.get(t, 0) <= 0:
                        continue
                    b = self._term_blocks_in_range(t)
                    if b is None or not b.n_blocks:
                        continue
                    b.set_scoring(
                        bm25.idf(self.stats.df[t], self.stats.n_docs),
                        self.stats.avgdl,
                        self.cfg.k1,
                        self.cfg.b,
                    )
                    neg_parts.append(b.all_postings()[0])
                if neg_parts:
                    neg = np.unique(np.concatenate(neg_parts))
                    from mini_ivf_ray.pipelines.query import _allowed_mask

                    demoted = _allowed_mask(docs, neg)
                    scores = np.where(
                        demoted, scores * np.float64(nbf), scores
                    )
                self._emit_topk(out, qid, docs, scores, k)
        else:
            raise ValueError(f"unknown rerank mode {mode!r}")
        # explicit uint64: a mixed int64/uint64 pd.concat at the merge
        # would promote to float64 and corrupt large hashed doc ids
        df = pd.DataFrame(out)
        if len(df):
            df["doc_id"] = df["doc_id"].astype(np.uint64)
        return df

    def similarity_batch(
        self, queries: list[tuple[int, str]], model: str, params: dict
    ) -> pd.DataFrame:
        """Per-shard top-k under a pluggable similarity over RAW
        in-range postings:

          model "dirichlet": LM Dirichlet (lm_dirichlet.py formula)
          model "jm":        LM Jelinek-Mercer
          model "classic":   Lucene ClassicSimilarity (classic.py)
          model "sparse":    sparse-vector dot product (sparse.py);
                             per-query weight maps arrive in
                             ``params["weights_by_query"][qid]`` and
                             the query text is ignored

        Exactness uses search_batch's max-merge argument, which holds
        for all four: per-term contributions are >= 0 (Dirichlet
        clips, JM's log1p of a positive is positive, classic's factors
        are positive, sparse weights are validated > 0 and tf > 0 by
        construction), and classic's coord shrinks with partial
        overlap — so a boundary shard's partial score is <= the home
        shard's full score and the driver's max-dedup keeps the full
        one.  Collection statistics are GLOBAL (stats.df / stats.cf /
        stats.total_tokens — the dictionary bookkeeping dict_topdf
        pins to SQL), so per-shard contributions are bit-equal to the
        single-index searchers'."""
        from mini_ivf_ray.pipelines.synonyms import _raw_postings

        if model not in ("dirichlet", "jm", "classic", "sparse"):
            raise ValueError(f"unknown similarity model {model!r}")
        out = {"query_id": [], "doc_id": [], "score": []}
        k = self.cfg.topk
        total = float(self.stats.total_tokens)
        n = float(self.stats.n_docs)
        for qid, qtext in queries:
            if model == "sparse":
                wmap = params["weights_by_query"][qid]
                terms = sorted(wmap)
            else:
                terms = sorted(set(tokenize(qtext)))
            if not terms:
                continue
            if model == "classic":
                idf = {
                    t: 1.0 + np.log(n / (float(self.stats.df.get(t, 0)) + 1.0))
                    for t in terms
                }
                qnorm = 1.0 / float(
                    np.sqrt(np.sum(np.array([idf[t] * idf[t] for t in terms])))
                )
                maxov = float(len(terms))
            per_term = []
            for t in terms:
                if self.stats.df.get(t, 0) <= 0:
                    continue
                b = self._term_blocks_in_range(t)
                if b is None or not b.n_blocks:
                    continue
                docs, tfs, dls = _raw_postings(b)
                if not docs.size:
                    continue
                if model == "dirichlet":
                    # lm_dirichlet.DirichletSearcher._term_contribs
                    mu = float(params.get("mu", 2000.0))
                    cf = float(self.stats.cf[t])
                    c = np.log1p(tfs / (mu * cf / total)) + np.log(
                        mu / (dls + mu)
                    )
                    np.maximum(c, 0.0, out=c)
                elif model == "jm":
                    # lm_dirichlet.JelinekMercerSearcher._term_contribs
                    lam = float(params.get("lam", 0.1))
                    cf = float(self.stats.cf[t])
                    c = np.log1p(
                        ((1.0 - lam) / lam) * (tfs / dls) / (cf / total)
                    )
                elif model == "sparse":
                    # sparse.SparseVectorSearcher per-term contribution
                    c = np.float64(wmap[t]) * tfs
                else:
                    # classic.ClassicSearcher per-term contribution
                    c = np.sqrt(tfs) * (idf[t] * idf[t]) / np.sqrt(dls)
                per_term.append((docs, c))
            if not per_term:
                continue
            docs_cat = np.concatenate([d for d, _ in per_term])
            con_cat = np.concatenate([c for _, c in per_term])
            uniq, inv = np.unique(docs_cat, return_inverse=True)
            scores = np.zeros(uniq.size, dtype=np.float64)
            np.add.at(scores, inv, con_cat)
            if model == "classic":
                overlap = np.zeros(uniq.size, dtype=np.float64)
                np.add.at(overlap, inv, 1.0)
                scores = scores * (overlap / maxov) * qnorm
            if self.denied is not None and self.denied.size:
                from mini_ivf_ray.pipelines.query import _allowed_mask

                live = ~_allowed_mask(uniq, self.denied)
                uniq, scores = uniq[live], scores[live]
            if uniq.size:
                self._emit_topk(out, qid, uniq, scores, k)
        # explicit uint64 (see rerank_batch: concat promotion hazard)
        df = pd.DataFrame(out)
        if len(df):
            df["doc_id"] = df["doc_id"].astype(np.uint64)
        return df

    def _emit_topk(self, out: dict, qid, docs, scores, k: int) -> None:
        from mini_ivf_ray.pipelines.query import _topk_exact

        for d, s in _topk_exact(docs, scores, k):
            out["query_id"].append(qid)
            out["doc_id"].append(int(d))
            out["score"].append(float(s))

    def range_buckets_batch(
        self, queries: list[tuple[int, str]], ranges
    ) -> pd.DataFrame:
        """Per-shard range-agg PARTIALS: for each named (possibly
        overlapping) range, (n, sum) over this shard's slice of the
        match set's field values — additive, (queries x ranges) slim
        rows per shard (rangeagg.py's sharded analog, wired)."""
        from mini_ivf_ray.pipelines.rangeagg import range_partials

        out = {"query_id": [], "range_key": [], "n": [], "s": []}
        for qid, qtext in queries:
            docs, _ = self._in_range_scored(qtext, full=False)
            if not docs.size or not self.val_ids.size:
                continue
            idx = np.searchsorted(self.val_ids, docs)
            np.minimum(idx, self.val_ids.size - 1, out=idx)
            hit = self.val_ids[idx] == docs
            v = self.vals[idx[hit]]
            for key, n, s in range_partials(v, ranges):
                out["query_id"].append(qid)
                out["range_key"].append(key)
                out["n"].append(n)
                out["s"].append(s)
        return pd.DataFrame(out)

    def pct_ranks_batch(
        self, queries: list[tuple[int, str]], thresholds: list[float]
    ) -> pd.DataFrame:
        """Per-shard percentile-rank PARTIALS: for each (query,
        threshold), this shard's (count <= threshold, n) over its
        slice of the match set's field values — 1 + k integers per
        (query, shard), additive (extstats.py PercentileRanksSearcher's
        sharded analog, wired)."""
        t = np.asarray(thresholds, dtype=np.float64)
        out = {"query_id": [], "value": [], "c": [], "n": []}
        for qid, qtext in queries:
            docs, _ = self._in_range_scored(qtext, full=False)
            if not docs.size or not self.val_ids.size:
                continue
            idx = np.searchsorted(self.val_ids, docs)
            np.minimum(idx, self.val_ids.size - 1, out=idx)
            hit = self.val_ids[idx] == docs
            v = np.sort(self.vals[idx[hit]])
            if not v.size:
                continue
            below = np.searchsorted(v, t, side="right")
            for tv, c in zip(t.tolist(), below.tolist()):
                out["query_id"].append(qid)
                out["value"].append(tv)
                out["c"].append(int(c))
                out["n"].append(int(v.size))
        return pd.DataFrame(out)

    def count_le_probe(
        self, gen: int, items: list[tuple[int, str, tuple]]
    ) -> pd.DataFrame:
        """Threshold-count primitive for exact distributed selection
        (robuststats.py): for each (query, [t...]) item, this shard's
        count(v <= t) over its slice of the match set's field values —
        len(thresholds) integers per (query, shard), additive.  The
        per-query sorted value slice is cached under ``gen`` so a
        k-round bisection walks the postings ONCE, not once per round;
        a new ``gen`` drops the previous selection's cache."""
        if getattr(self, "_probe_gen", None) != gen:
            self._probe_gen = gen
            self._probe_cache: dict[str, np.ndarray] = {}
        out = {"query_id": [], "ti": [], "c": [], "n": []}
        for qid, qtext, ts in items:
            v = self._probe_cache.get(qtext)
            if v is None:
                docs, _ = self._in_range_scored(qtext, full=False)
                if docs.size and self.val_ids.size:
                    idx = np.searchsorted(self.val_ids, docs)
                    np.minimum(idx, self.val_ids.size - 1, out=idx)
                    hit = self.val_ids[idx] == docs
                    v = np.sort(self.vals[idx[hit]])
                else:
                    v = np.empty(0, dtype=np.float64)
                self._probe_cache[qtext] = v
            t = np.asarray(ts, dtype=np.float64)
            below = np.searchsorted(v, t, side="right")
            for j, c in enumerate(below.tolist()):
                out["query_id"].append(qid)
                out["ti"].append(j)
                out["c"].append(int(c))
                out["n"].append(int(v.size))
        return pd.DataFrame(out)

    def grouped_metric_batch(
        self, queries: list[tuple[int, str]]
    ) -> pd.DataFrame:
        """Per-shard grouped-metric PARTIALS: (query_id, code, n, s)
        over docs in this shard's match-set slice carrying BOTH the
        label sidecar (set_sidecar) and the value sidecar
        (set_value_sidecar) — panel-sized rows, additive
        (extstats.py GroupedMetricSearcher's sharded analog, wired)."""
        out = {"query_id": [], "code": [], "n": [], "s": []}
        for qid, qtext in queries:
            docs, _ = self._in_range_scored(qtext, full=False)
            if not docs.size or not self.side_ids.size or not self.val_ids.size:
                continue
            li = np.searchsorted(self.side_ids, docs)
            np.minimum(li, self.side_ids.size - 1, out=li)
            has_l = self.side_ids[li] == docs
            vi = np.searchsorted(self.val_ids, docs)
            np.minimum(vi, self.val_ids.size - 1, out=vi)
            has_v = self.val_ids[vi] == docs
            both = has_l & has_v
            if not both.any():
                continue
            codes = self.side_codes[li[both]]
            vals = self.vals[vi[both]]
            k = int(codes.max()) + 1
            n = np.bincount(codes, minlength=k)
            s = np.bincount(codes, weights=vals, minlength=k)
            for code in np.flatnonzero(n):
                out["query_id"].append(qid)
                out["code"].append(int(code))
                out["n"].append(int(n[code]))
                out["s"].append(float(s[code]))
        return pd.DataFrame(out)

    def adjacency_batch(
        self, queries: list[tuple[int, str]], filters: list[tuple[str, str]]
    ) -> pd.DataFrame:
        """Per-shard adjacency-bucket PARTIALS: the k x k membership
        matmul over this shard's match-set slice, flattened to
        (query_id, i, j, c) upper-triangle-with-diagonal rows —
        additive integer matrices (adjacency.py's sharded analog,
        wired).  Filter postings come from this shard's own
        partition-selective reader."""
        from mini_ivf_ray.pipelines.query import _allowed_mask

        fd = []
        for _name, term in filters:
            if self.stats.df.get(term, 0) <= 0:
                fd.append(np.empty(0, dtype=np.uint64))
                continue
            b = self._term_blocks_in_range(term)
            if b is None or not b.n_blocks:
                fd.append(np.empty(0, dtype=np.uint64))
                continue
            b.set_scoring(
                bm25.idf(self.stats.df[term], self.stats.n_docs),
                self.stats.avgdl,
                self.cfg.k1,
                self.cfg.b,
            )
            fd.append(b.all_postings()[0])
        out = {"query_id": [], "i": [], "j": [], "c": []}
        k = len(filters)
        for qid, qtext in queries:
            docs, _ = self._in_range_scored(qtext, full=False)
            if not docs.size or not k:
                continue
            b = np.stack(
                [_allowed_mask(docs, f).astype(np.int64) for f in fd]
            )
            mat = b @ b.T
            for i in range(k):
                for j in range(i, k):
                    if mat[i, j]:
                        out["query_id"].append(qid)
                        out["i"].append(i)
                        out["j"].append(j)
                        out["c"].append(int(mat[i, j]))
        return pd.DataFrame(out)

    def filters_batch(
        self, queries: list[tuple[int, str]], filters: list[tuple[str, str]]
    ) -> pd.DataFrame:
        """Per-shard filters-agg PARTIALS: the (k+1) counts vector
        (named filters + the _other_ complement) over this shard's
        match-set slice, as (query_id, bi, c) rows — additive integer
        vectors (adjacency.FiltersAggSearcher's sharded analog,
        wired).  bi == k is the _other_ slot."""
        from mini_ivf_ray.pipelines.query import _allowed_mask

        fd = []
        for _name, term in filters:
            if self.stats.df.get(term, 0) <= 0:
                fd.append(np.empty(0, dtype=np.uint64))
                continue
            b = self._term_blocks_in_range(term)
            if b is None or not b.n_blocks:
                fd.append(np.empty(0, dtype=np.uint64))
                continue
            b.set_scoring(
                bm25.idf(self.stats.df[term], self.stats.n_docs),
                self.stats.avgdl,
                self.cfg.k1,
                self.cfg.b,
            )
            fd.append(b.all_postings()[0])
        out = {"query_id": [], "bi": [], "c": []}
        k = len(filters)
        for qid, qtext in queries:
            docs, _ = self._in_range_scored(qtext, full=False)
            if not docs.size:
                continue
            any_mask = np.zeros(docs.size, dtype=bool)
            for i, f in enumerate(fd):
                m = _allowed_mask(docs, f)
                c = int(m.sum())
                any_mask |= m
                if c:
                    out["query_id"].append(qid)
                    out["bi"].append(i)
                    out["c"].append(c)
            other = int(docs.size - any_mask.sum())
            if other:
                out["query_id"].append(qid)
                out["bi"].append(k)
                out["c"].append(other)
        return pd.DataFrame(out)

    def _in_range_scored(self, qtext: str, full: bool):
        """(docs, scores) of the query's match set restricted to THIS
        shard's [lo, hi].  Boundary payload blocks may carry docs outside
        the range with partial scores (module docstring) — those are
        masked off, so each doc appears in exactly one shard, at its
        FULL canonical score.  ``full=False`` skips accumulation and
        returns (docs, None) — the disjunctive match set only."""
        terms = sorted(set(tokenize(qtext)))
        blocks = []
        for t in terms:
            if self.stats.df.get(t, 0) <= 0:
                continue
            b = self._term_blocks_in_range(t)
            if b is None or not b.n_blocks:
                continue
            b.set_scoring(
                bm25.idf(self.stats.df[t], self.stats.n_docs),
                self.stats.avgdl,
                self.cfg.k1,
                self.cfg.b,
            )
            blocks.append(b)
        if not blocks:
            return np.empty(0, dtype=np.uint64), None
        if full:
            docs, scores, _ = _taat_accumulate(blocks)
        else:
            parts = [b.all_postings()[0] for b in blocks]
            docs = parts[0] if len(parts) == 1 else np.unique(np.concatenate(parts))
            scores = None
        m = (docs >= np.uint64(self.lo)) & (docs <= np.uint64(self.hi))
        if self.denied is not None and self.denied.size:
            from mini_ivf_ray.pipelines.query import _allowed_mask

            m &= ~_allowed_mask(docs, self.denied)
        return docs[m], (scores[m] if scores is not None else None)

    def facet_counts_batch(
        self, queries: list[tuple[int, str]], n_labels: int
    ) -> pd.DataFrame:
        """Per query, this shard's exact facet counts over its slice of
        the disjunctive match set -> sparse (query_id, code, n_docs)
        rows.  The driver SUM-merges across shards: counts are additive
        because each doc lives in exactly one shard's range."""
        out = {"query_id": [], "code": [], "n_docs": []}
        for qid, qtext in queries:
            docs, _ = self._in_range_scored(qtext, full=False)
            if not docs.size or not self.side_ids.size:
                continue
            idx = np.searchsorted(self.side_ids, docs)
            np.minimum(idx, self.side_ids.size - 1, out=idx)
            valid = self.side_ids[idx] == docs
            counts = np.bincount(
                self.side_codes[idx[valid]], minlength=n_labels
            )
            for code in np.flatnonzero(counts):
                out["query_id"].append(qid)
                out["code"].append(int(code))
                out["n_docs"].append(int(counts[code]))
        return pd.DataFrame(out)

    def value_stats_batch(
        self, queries: list[tuple[int, str]], n_labels: int
    ) -> pd.DataFrame:
        """Per query, this shard's value-stats PARTIAL over its slice
        of the disjunctive match set: sparse (query_id, code, n) panel
        rows plus ONE code = -1 row carrying the shard's matched-doc
        count.  Both are additive across disjoint doc ranges; the
        driver derives cardinality/value_count/missing from the MERGED
        panel (valuestats.py)."""
        out = {"query_id": [], "code": [], "n": []}
        for qid, qtext in queries:
            docs, _ = self._in_range_scored(qtext, full=False)
            if not docs.size:
                continue
            out["query_id"].append(qid)
            out["code"].append(-1)
            out["n"].append(int(docs.size))
            if not self.side_ids.size:
                continue
            idx = np.searchsorted(self.side_ids, docs)
            np.minimum(idx, self.side_ids.size - 1, out=idx)
            valid = self.side_ids[idx] == docs
            counts = np.bincount(
                self.side_codes[idx[valid]], minlength=n_labels
            )
            for code in np.flatnonzero(counts):
                out["query_id"].append(qid)
                out["code"].append(int(code))
                out["n"].append(int(counts[code]))
        return pd.DataFrame(out)

    def collapse_batch(self, queries: list[tuple[int, str]]) -> pd.DataFrame:
        """Per query, this shard's per-group winner (score desc, doc
        asc) over its slice of the full accumulated match set ->
        (query_id, code, doc_id, score) rows, <= one row per (query,
        group).  The driver re-collapses winners across shards — a
        (queries x groups) merge, never doc-proportional."""
        out = {"query_id": [], "code": [], "doc_id": [], "score": []}
        for qid, qtext in queries:
            docs, scores = self._in_range_scored(qtext, full=True)
            if docs is None or not docs.size or not self.side_ids.size:
                continue
            idx = np.searchsorted(self.side_ids, docs)
            np.minimum(idx, self.side_ids.size - 1, out=idx)
            valid = self.side_ids[idx] == docs
            docs, scores = docs[valid], scores[valid]
            codes = self.side_codes[idx[valid]]
            if not docs.size:
                continue
            order = np.lexsort((docs, -scores, codes))
            codes_s = codes[order]
            first = np.ones(codes_s.size, dtype=bool)
            first[1:] = codes_s[1:] != codes_s[:-1]
            w = order[first]
            out["query_id"].extend([qid] * w.size)
            out["code"].extend(codes[w].tolist())
            out["doc_id"].extend(docs[w].tolist())
            out["score"].extend(scores[w].tolist())
        df = pd.DataFrame(out)
        if len(df):
            df["doc_id"] = df["doc_id"].astype(np.uint64)
        return df

    def top_hits_batch(
        self, queries: list[tuple[int, str]], n_per_group: int
    ):
        """Per query, this shard's per-group match COUNTS plus its
        per-group top ``n_per_group`` hits (score desc, doc asc) over
        its slice of the full accumulated match set.  Returns
        (counts_df, hits_df); counts are additive across shards and
        hits merge under the same order rule, so the driver's
        group-selection and per-group top-n are exact over the full
        corpus while the exchange stays (queries x groups x n) rows —
        never doc-proportional."""
        counts = {"query_id": [], "code": [], "n_docs": []}
        hits = {"query_id": [], "code": [], "doc_id": [], "score": []}
        for qid, qtext in queries:
            docs, scores = self._in_range_scored(qtext, full=True)
            if docs is None or not docs.size or not self.side_ids.size:
                continue
            idx = np.searchsorted(self.side_ids, docs)
            np.minimum(idx, self.side_ids.size - 1, out=idx)
            valid = self.side_ids[idx] == docs
            docs, scores = docs[valid], scores[valid]
            codes = self.side_codes[idx[valid]]
            if not docs.size:
                continue
            cnt = np.bincount(codes)
            for code in np.flatnonzero(cnt):
                counts["query_id"].append(qid)
                counts["code"].append(int(code))
                counts["n_docs"].append(int(cnt[code]))
            order = np.lexsort((docs, -scores, codes))
            codes_s = codes[order]
            first = np.ones(codes_s.size, dtype=bool)
            first[1:] = codes_s[1:] != codes_s[:-1]
            run = np.cumsum(first) - 1
            starts = np.nonzero(first)[0]
            rank_in_group = np.arange(codes_s.size) - starts[run]
            keep = order[rank_in_group < n_per_group]
            hits["query_id"].extend([qid] * keep.size)
            hits["code"].extend(codes[keep].tolist())
            hits["doc_id"].extend(docs[keep].tolist())
            hits["score"].extend(scores[keep].tolist())
        cdf, hdf = pd.DataFrame(counts), pd.DataFrame(hits)
        if len(hdf):
            hdf["doc_id"] = hdf["doc_id"].astype(np.uint64)
        return cdf, hdf

    def _term_blocks_in_range(self, term: str) -> PostingBlocks | None:
        hit = self._range_cache.get(term, False)
        if hit is not False:
            return hit
        blocks = self.reader.term_blocks(
            term, self.stats.term_locations(term, self.cfg)
        )
        # handles every storage mode (payload / views / raw): raw blocks
        # from multi-epoch partitions trim postings exactly to the range
        out = blocks.subset_range(self.lo, self.hi) if blocks is not None else None
        self._range_cache[term] = out
        return out

    def search_batch(self, queries: list[tuple[int, str]]) -> pd.DataFrame:
        out = {"query_id": [], "doc_id": [], "score": []}
        for qid, qtext in queries:
            terms = sorted(set(tokenize(qtext)))
            fetched = {
                t: self._term_blocks_in_range(t)
                for t in terms
                if self.stats.df.get(t, 0) > 0
            }
            for d, s in topk_from_blocks(
                fetched, self.stats, self.cfg, denied=self.denied
            ):
                out["query_id"].append(qid)
                out["doc_id"].append(d)
                out["score"].append(s)
        df = pd.DataFrame(out)
        if len(df):
            df["doc_id"] = df["doc_id"].astype(np.uint64)
        return df


class _ServingWorker:
    """One persistent data-parallel serving actor: a full BM25Searcher
    (whole index view) fed whole queries."""

    def __init__(
        self,
        index_dir: str,
        cfg: PipelineConfig,
        decoded_refs: dict | None,
        denied_ref=None,
    ):
        from mini_ivf_ray.pipelines.query import BM25Searcher

        self.searcher = BM25Searcher(
            index_dir, cfg, decoded_refs=decoded_refs, denied_ref=denied_ref
        )

    def search_batch(self, queries: list[tuple[int, str]]) -> pd.DataFrame:
        out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
        for qid, qtext in queries:
            for r, (d, s) in enumerate(self.searcher.topk_for_text(qtext)):
                out["query_id"].append(qid)
                out["rank"].append(r)
                out["doc_id"].append(d)
                out["score"].append(s)
        df = pd.DataFrame(out)
        if len(df):
            df["doc_id"] = df["doc_id"].astype(np.uint64)
            df["rank"] = df["rank"].astype(np.int32)
        return df

    def get_counters(self) -> dict:
        return dict(self.searcher.counters)


class ServingPool:
    """Persistent data-parallel serving (reference: the resident index
    object queried by an OMP thread pool, test_ivfpq_sift1m_baseline
    :63-76).  Each query goes to exactly ONE actor (no fan-out); the
    decoded index is shared zero-copy via plasma, so N actors hold ~one
    copy per node, not N.  ``warmup()`` exercises per-actor lazy caches
    so steady-state QPS can be measured separately from pool spin-up."""

    def __init__(
        self,
        index_dir: str,
        cfg: PipelineConfig | None = None,
        num_actors: int = 8,
        share: bool = True,
        respect_deletes: bool = True,
    ):
        import ray

        self.cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
        decoded = None
        if share:
            from mini_ivf_ray.sources.decoded import share_decoded_index

            decoded = share_decoded_index(index_dir, self.cfg)
        denied_ref = _tombstone_ref(index_dir) if respect_deletes else None
        cls = ray.remote(num_cpus=1)(_ServingWorker)
        self.actors = [
            cls.remote(index_dir, self.cfg, decoded, denied_ref)
            for _ in range(num_actors)
        ]

    def warmup(self, queries: list[tuple[int, str]]) -> None:
        import ray

        ray.get([a.search_batch.remote(queries) for a in self.actors])

    def search(self, queries: list[tuple[int, str]], chunk: int = 32) -> pd.DataFrame:
        """Dynamic dispatch: each actor pulls the next chunk as it
        finishes (ray.wait loop) instead of a static round-robin —
        head-term queries are 10-100x costlier than tail ones, and a
        static assignment leaves the pool idle behind one hot straggler
        at the end of the run."""
        import ray

        chunks = [queries[s : s + chunk] for s in range(0, len(queries), chunk)]
        it = iter(chunks)
        inflight: dict = {}
        frames = []
        for a in self.actors:
            c = next(it, None)
            if c is None:
                break
            inflight[a.search_batch.remote(c)] = a
        while inflight:
            done, _ = ray.wait(list(inflight), num_returns=1)
            f = done[0]
            a = inflight.pop(f)
            r = ray.get(f)
            if len(r):
                frames.append(r)
            c = next(it, None)
            if c is not None:
                inflight[a.search_batch.remote(c)] = a
        if not frames:
            return pd.DataFrame({"query_id": [], "rank": [], "doc_id": [], "score": []})
        return (
            pd.concat(frames, ignore_index=True)
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )

    def metrics(self) -> dict:
        """Aggregated A3/A4-style counters (reference: avg_searched_cnt,
        test_ivfpq_sift1m_baseline.cpp:90) + the QueryObs analog: the
        ``partition_probes`` histogram {pid: times a query consulted
        that segment} (reference per-cluster hit histogram,
        index_ivfpq.cpp:412-470)."""
        import ray

        totals: dict = {}
        for c in ray.get([a.get_counters.remote() for a in self.actors]):
            for k, v in c.items():
                if isinstance(v, dict):
                    d = totals.setdefault(k, {})
                    for kk, vv in v.items():
                        d[kk] = d.get(kk, 0) + vv
                else:
                    totals[k] = totals.get(k, 0) + v
        nq = max(1, totals.get("n_queries", 0))
        totals["avg_searched_cnt"] = round(totals.get("searched_cnt", 0) / nq, 1)
        return totals

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []


class ShardedIndex:
    """Driver-side handle over R RangeSearcher actors."""

    def __init__(
        self,
        index_dir: str,
        cfg: PipelineConfig | None = None,
        num_shards: int = 8,
        share: bool = True,
        respect_deletes: bool = True,
    ):
        import ray

        self.cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
        self.num_shards = num_shards
        stats = CorpusStats.load(index_dir)
        space = 2**64 if self.cfg.doc_id_from_url else stats.max_doc_id + 1
        bounds = [(s * space) // num_shards for s in range(num_shards + 1)]
        self.bounds = bounds
        shared = share_segments(index_dir, self.cfg.num_partitions) if share else None
        denied_ref = _tombstone_ref(index_dir) if respect_deletes else None
        cls = ray.remote(num_cpus=1)(RangeSearcher)
        self.actors = [
            cls.remote(
                index_dir, self.cfg, bounds[s], bounds[s + 1] - 1, shared,
                denied_ref,
            )
            for s in range(num_shards)
        ]
        self.side_labels: list[str] = []

    def attach_sidecar(self, doc_ids, values) -> None:
        """Partition a doc->attribute sidecar on THIS index's doc-shard
        ranges and install each slice on its shard actor.  Labels are
        dictionary-encoded driver-side (facet/group cardinality is
        panel-sized by definition); each actor receives ONLY its range's
        (ids, codes) slice — at scale every node holds 1/R of the
        sidecar, never the whole corpus (the r4 scale fix over
        facets.py:156 / collapse.py:181's full broadcast)."""
        import pyarrow as pa
        import ray

        ids = np.asarray(doc_ids, dtype=np.uint64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        vals = pa.array(
            np.asarray(values, dtype=object)[order], type=pa.string()
        )
        if vals.null_count:
            raise ValueError(
                f"sidecar values contain {vals.null_count} null(s); "
                "map nulls to a sentinel label first"
            )
        enc = pa.compute.dictionary_encode(vals)
        self.side_labels = enc.dictionary.to_pylist()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        futs, total = [], 0
        for s, a in enumerate(self.actors):
            lo, hi = self.bounds[s], self.bounds[s + 1] - 1
            i = int(np.searchsorted(ids, np.uint64(lo), side="left"))
            j = int(np.searchsorted(ids, np.uint64(min(hi, 2**64 - 1)), side="right"))
            futs.append(a.set_sidecar.remote(ray.put((ids[i:j], codes[i:j]))))
            total += j - i
        if total != ids.size:
            raise AssertionError(
                f"sidecar slices cover {total} of {ids.size} docs"
            )
        ray.get(futs)

    def attach_value_sidecar(self, doc_ids, values) -> None:
        """Partition a doc -> float64 value sidecar on this index's
        doc-shard ranges for moment aggregations (ext_stats) — same
        slicing contract as attach_sidecar: each actor receives ONLY
        its range's slice, 1/R of the sidecar per node at scale."""
        import ray

        ids = np.asarray(doc_ids, dtype=np.uint64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        vals = np.asarray(values, dtype=np.float64)[order]
        if np.isnan(vals).any():
            raise ValueError(
                "values contain NaN; drop missing-field docs from the "
                "sidecar instead"
            )
        futs, total = [], 0
        for s, a in enumerate(self.actors):
            lo, hi = self.bounds[s], self.bounds[s + 1] - 1
            i = int(np.searchsorted(ids, np.uint64(lo), side="left"))
            j = int(np.searchsorted(ids, np.uint64(min(hi, 2**64 - 1)), side="right"))
            futs.append(
                a.set_value_sidecar.remote(ray.put((ids[i:j], vals[i:j])))
            )
            total += j - i
        if total != ids.size:
            raise AssertionError(
                f"value-sidecar slices cover {total} of {ids.size} docs"
            )
        ray.get(futs)
        self._has_value_sidecar = True

    def attach_xy_sidecar(self, doc_ids, x_vals, y_vals) -> None:
        """Partition a joined doc -> (x, y) sidecar (matrix.join_xy
        output: docs carrying BOTH fields) on this index's doc-shard
        ranges for joint-moment aggregations (matrix_stats) — same
        slicing contract as attach_sidecar: each actor receives ONLY
        its range's slice, 1/R of the sidecar per node at scale."""
        import ray

        ids = np.asarray(doc_ids, dtype=np.uint64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        x = np.asarray(x_vals, dtype=np.float64)[order]
        y = np.asarray(y_vals, dtype=np.float64)[order]
        if np.isnan(x).any() or np.isnan(y).any():
            raise ValueError(
                "xy sidecar contains NaN; drop missing-field docs instead"
            )
        futs, total = [], 0
        for s, a in enumerate(self.actors):
            lo, hi = self.bounds[s], self.bounds[s + 1] - 1
            i = int(np.searchsorted(ids, np.uint64(lo), side="left"))
            j = int(np.searchsorted(ids, np.uint64(min(hi, 2**64 - 1)), side="right"))
            futs.append(
                a.set_xy_sidecar.remote(ray.put((ids[i:j], x[i:j], y[i:j])))
            )
            total += j - i
        if total != ids.size:
            raise AssertionError(
                f"xy-sidecar slices cover {total} of {ids.size} docs"
            )
        ray.get(futs)
        self._has_xy_sidecar = True

    def matrix_stats(
        self, queries: list[tuple[int, str]], chunk: int = 512
    ) -> pd.DataFrame:
        """Shard-local matrix stats -> one (query_id, n_docs, mean_x,
        mean_y, var_x, var_y, cov_xy, corr_xy) row per query,
        identical to pipelines.matrix.matrix_stats_search on
        integer-valued fields (co-moment sums below 2^53 are exact in
        any order, so the shard merge is bit-equal to the single
        pass).  The merge combines (queries x shards) slim co-moment
        rows — never doc-proportional."""
        import ray

        from mini_ivf_ray.pipelines.matrix import (
            MATRIX_COLUMNS,
            derived_matrix,
            merge_comoments,
        )

        if not getattr(self, "_has_xy_sidecar", False):
            raise ValueError("attach_xy_sidecar first")
        futs = []
        for i in range(0, len(queries), chunk):
            part = queries[i : i + chunk]
            futs.extend(a.matrix_batch.remote(part) for a in self.actors)
        frames = [f for f in ray.get(futs) if len(f)]
        rows = []
        if frames:
            allp = pd.concat(frames, ignore_index=True)
            merged = merge_comoments(
                zip(
                    allp["query_id"], allp["n"], allp["sx"], allp["sy"],
                    allp["sxx"], allp["syy"], allp["sxy"],
                )
            )
            for qid in sorted(merged):
                m = merged[qid]
                rows.append((qid, m[0], *derived_matrix(*m)))
        out = pd.DataFrame(rows, columns=MATRIX_COLUMNS)
        out["query_id"] = out["query_id"].astype(np.int64)
        out["n_docs"] = out["n_docs"].astype(np.int64)
        return out

    def weighted_avg(
        self, queries: list[tuple[int, str]], chunk: int = 512
    ) -> pd.DataFrame:
        """Shard-local weighted average -> one (query_id, n_docs,
        sum_w, sum_vw, weighted_avg) row per query, identical to
        pipelines.metricsagg.weighted_avg_search on integer-valued
        fields (additive partials exact below 2^53).  Zero-total-weight
        queries are dropped HERE, after the merge — the global rule the
        single pass applies."""
        import ray

        from mini_ivf_ray.pipelines.metricsagg import (
            WEIGHTED_COLUMNS,
            derived_weighted,
        )

        if not getattr(self, "_has_xy_sidecar", False):
            raise ValueError("attach_xy_sidecar first")
        futs = []
        for i in range(0, len(queries), chunk):
            part = queries[i : i + chunk]
            futs.extend(a.weighted_batch.remote(part) for a in self.actors)
        frames = [f for f in ray.get(futs) if len(f)]
        rows = []
        if frames:
            allp = pd.concat(frames, ignore_index=True)
            g = allp.groupby("query_id", sort=True).sum()
            for qid, r in g.iterrows():
                sw = float(r["sw"])
                if sw == 0.0:
                    continue
                svw = float(r["svw"])
                rows.append(
                    (int(qid), int(r["n"]), sw, svw, derived_weighted(sw, svw))
                )
        out = pd.DataFrame(rows, columns=WEIGHTED_COLUMNS)
        out["query_id"] = out["query_id"].astype(np.int64)
        out["n_docs"] = out["n_docs"].astype(np.int64)
        return out

    def top_metrics(
        self, queries: list[tuple[int, str]], size: int = 3, chunk: int = 512
    ) -> pd.DataFrame:
        """Shard-local top-metrics -> up to ``size`` (query_id, rank,
        doc_id, sort_v, metric_v) rows per query, identical to
        pipelines.metricsagg.top_metrics_search: each doc lives in
        exactly one shard's sidecar slice, so the global (sort desc,
        doc asc) top-``size`` is a re-cut of the shards' local tops —
        (queries x shards x size) slim rows, never doc-proportional."""
        import ray

        from mini_ivf_ray.pipelines.metricsagg import (
            TOP_METRICS_COLUMNS,
            top_metrics_rows,
        )

        if not getattr(self, "_has_xy_sidecar", False):
            raise ValueError("attach_xy_sidecar first")
        if size < 1:
            raise ValueError(f"size must be >= 1, got {size}")
        futs = []
        for i in range(0, len(queries), chunk):
            part = queries[i : i + chunk]
            futs.extend(
                a.top_metrics_batch.remote(part, size) for a in self.actors
            )
        frames = [f for f in ray.get(futs) if len(f)]
        rows = {c: [] for c in TOP_METRICS_COLUMNS}
        if frames:
            allp = pd.concat(frames, ignore_index=True)
            for qid, g in allp.groupby("query_id", sort=True):
                d, sv, mv = top_metrics_rows(
                    g["doc_id"].to_numpy().astype(np.uint64),
                    g["sort_v"].to_numpy(),
                    g["metric_v"].to_numpy(),
                    size,
                )
                for r in range(d.size):
                    rows["query_id"].append(int(qid))
                    rows["rank"].append(r + 1)
                    rows["doc_id"].append(int(d[r]))
                    rows["sort_v"].append(float(sv[r]))
                    rows["metric_v"].append(float(mv[r]))
        out = pd.DataFrame(rows)
        out["query_id"] = out["query_id"].astype(np.int64)
        out["rank"] = out["rank"].astype(np.int64)
        out["doc_id"] = out["doc_id"].astype(np.uint64)
        return out

    def ext_stats(
        self, queries: list[tuple[int, str]], chunk: int = 512
    ) -> pd.DataFrame:
        """Shard-local extended stats -> one (query_id, n_docs, min_v,
        max_v, sum_v, sumsq_v, avg_v, variance, std_dev) row per query,
        identical to pipelines.extstats.ext_stats_search on an
        integer-valued field (float64 sums below 2^53 are exact, so the
        shard merge is bit-equal to the single pass).  The merge
        combines (queries x shards) slim moment rows — never
        doc-proportional."""
        import ray

        from mini_ivf_ray.pipelines.extstats import (
            STAT_COLUMNS,
            derived_stats,
            merge_moments,
        )

        if not getattr(self, "_has_value_sidecar", False):
            raise ValueError("attach_value_sidecar first")
        futs = []
        for i in range(0, len(queries), chunk):
            part = queries[i : i + chunk]
            futs.extend(a.extstats_batch.remote(part) for a in self.actors)
        frames = [f for f in ray.get(futs) if len(f)]
        rows = []
        if frames:
            allp = pd.concat(frames, ignore_index=True)
            merged = merge_moments(
                zip(
                    allp["query_id"], allp["n"], allp["s"], allp["ss"],
                    allp["lo_v"], allp["hi_v"],
                )
            )
            for qid in sorted(merged):
                n, s, ss, lo, hi = merged[qid]
                avg, var, std = derived_stats(n, s, ss)
                rows.append((qid, n, lo, hi, s, ss, avg, var, std))
        out = pd.DataFrame(rows, columns=STAT_COLUMNS)
        out["query_id"] = out["query_id"].astype(np.int64)
        out["n_docs"] = out["n_docs"].astype(np.int64)
        return out

    def boxplot(
        self, queries: list[tuple[int, str]], chunk: int = 512
    ) -> pd.DataFrame:
        """Shard-local EXACT boxplot + MAD -> one (query_id, n_docs,
        min_v, q1, q2, q3, max_v, mad) row per query, identical to
        pipelines.robuststats.boxplot_search on an integer-valued
        field.  Quantiles are not mergeable moments, so this runs
        exact distributed SELECTION: ceil(log2(span)) rounds of slim
        (queries x ranks) threshold-count probes against the value
        sidecar (RangeSearcher.count_le_probe; postings walked once
        per shard, values never shipped) — see robuststats.py."""
        from mini_ivf_ray.pipelines.robuststats import sharded_boxplot

        if not getattr(self, "_has_value_sidecar", False):
            raise ValueError("attach_value_sidecar first")
        return sharded_boxplot(self, queries, chunk)

    def facet_search(
        self, queries: list[tuple[int, str]], chunk: int = 512
    ) -> pd.DataFrame:
        """Shard-local faceted search -> (query_id, facet, n_docs),
        identical to pipelines.facets.faceted_search.  Each shard counts
        its own doc range; the merge SUMS (query x label) rows — the
        shuffle volume is queries x facet-cardinality, independent of
        corpus size."""
        import ray

        if not self.side_labels:
            raise ValueError("attach_sidecar first")
        n_labels = len(self.side_labels)
        futs = []
        for i in range(0, len(queries), chunk):
            part = queries[i : i + chunk]
            futs.extend(
                a.facet_counts_batch.remote(part, n_labels)
                for a in self.actors
            )
        frames = [f for f in ray.get(futs) if len(f)]
        if not frames:
            return pd.DataFrame({"query_id": [], "facet": [], "n_docs": []})
        merged = (
            pd.concat(frames, ignore_index=True)
            .groupby(["query_id", "code"], sort=True, as_index=False)["n_docs"]
            .sum()
        )
        merged["facet"] = [self.side_labels[int(c)] for c in merged["code"]]
        out = merged[["query_id", "facet", "n_docs"]].reset_index(drop=True)
        out["query_id"] = out["query_id"].astype(np.int64)
        out["n_docs"] = out["n_docs"].astype(np.int64)
        return out

    def value_stats(
        self, queries: list[tuple[int, str]], chunk: int = 512
    ) -> pd.DataFrame:
        """Shard-local value-stats -> (query_id, n_matched,
        value_count, cardinality, missing), identical to
        valuestats.value_stats_search.  Per-shard partials are sparse
        additive (code, n) panel rows + a matched-count row; the merge
        is queries x (cardinality + 1) rows, corpus-independent, and
        cardinality comes from the MERGED panel (a per-shard nonzero
        count would overcount labels present in several shards)."""
        import ray

        if not self.side_labels:
            raise ValueError("attach_sidecar first")
        n_labels = len(self.side_labels)
        futs = []
        for i in range(0, len(queries), chunk):
            part = queries[i : i + chunk]
            futs.extend(
                a.value_stats_batch.remote(part, n_labels)
                for a in self.actors
            )
        frames = [f for f in ray.get(futs) if len(f)]
        cols = [
            "query_id", "n_matched", "value_count", "cardinality", "missing",
        ]
        if not frames:
            return pd.DataFrame({c: [] for c in cols})
        merged = (
            pd.concat(frames, ignore_index=True)
            .groupby(["query_id", "code"], sort=True, as_index=False)["n"]
            .sum()
        )
        out = {c: [] for c in cols}
        for qid, g in merged.groupby("query_id", sort=True):
            matched = g[g["code"] == -1]["n"]
            n_matched = int(matched.iloc[0]) if len(matched) else 0
            if n_matched == 0:
                continue
            panel = g[g["code"] >= 0]
            vc = int(panel["n"].sum())
            out["query_id"].append(int(qid))
            out["n_matched"].append(n_matched)
            out["value_count"].append(vc)
            out["cardinality"].append(int((panel["n"] > 0).sum()))
            out["missing"].append(n_matched - vc)
        df = pd.DataFrame(out)
        if len(df):
            for c in cols:
                df[c] = df[c].astype(np.int64)
        return df

    def rare_terms(
        self,
        queries: list[tuple[int, str]],
        max_doc_count: int,
        chunk: int = 512,
    ) -> pd.DataFrame:
        """Shard-local rare-terms -> (query_id, facet, n_docs) buckets
        with GLOBAL count <= max_doc_count, identical to
        pipelines.termsagg.rare_terms_search.  Rarity is a global
        property, so the cut (termsagg.rare_cut — the shared kernel)
        runs strictly AFTER the additive facet merge; a shard-local
        count could both over- and under-qualify a bucket."""
        from mini_ivf_ray.pipelines.termsagg import rare_cut

        return rare_cut(self.facet_search(queries, chunk), max_doc_count)

    def multi_terms(
        self,
        queries: list[tuple[int, str]],
        num_buckets: int,
        chunk: int = 512,
    ) -> pd.DataFrame:
        """Shard-local multi-terms -> each query's top ``num_buckets``
        composite (key_a, key_b) buckets by (count desc, keys asc),
        identical to pipelines.termsagg.multi_terms_search.  The
        attached sidecar must carry the SEP-joined composite labels
        (termsagg._composite_labels); counts merge additively and the
        cut (termsagg.multi_cut — the shared kernel) runs on the
        fully-merged panel, so no bucket is shard-pruned (exact where
        ES's shard_size heuristic is not)."""
        from mini_ivf_ray.pipelines.termsagg import multi_cut

        return multi_cut(self.facet_search(queries, chunk), num_buckets)

    def string_stats(
        self, queries: list[tuple[int, str]], chunk: int = 512
    ) -> pd.DataFrame:
        """Shard-local string stats -> one (query_id, n_docs, min_len,
        max_len, avg_len, entropy) row per query, identical to
        pipelines.stringstats.string_stats_search: every statistic is
        a function of the ADDITIVE facet panel plus panel-sized label
        metadata, so the distributed stage is facet_search verbatim
        and the string math is the shared reduce kernel."""
        from mini_ivf_ray.pipelines.stringstats import string_stats_reduce

        return string_stats_reduce(self.facet_search(queries, chunk))

    def collapsed_search(
        self, queries: list[tuple[int, str]], chunk: int = 512
    ) -> pd.DataFrame:
        """Shard-local field collapsing -> (query_id, rank, doc_id, grp,
        score), identical to pipelines.collapse.collapsed_search.  Each
        shard emits its per-group winner; the merge re-collapses
        (query x group) rows under the same (score desc, doc asc) rule,
        then takes the global top-k of group winners."""
        import ray

        if not self.side_labels:
            raise ValueError("attach_sidecar first")
        futs = []
        for i in range(0, len(queries), chunk):
            part = queries[i : i + chunk]
            futs.extend(a.collapse_batch.remote(part) for a in self.actors)
        frames = [f for f in ray.get(futs) if len(f)]
        cols = ["query_id", "rank", "doc_id", "grp", "score"]
        if not frames:
            return pd.DataFrame({c: [] for c in cols})
        cand = pd.concat(frames, ignore_index=True)
        # re-collapse across shards: winner per (query, group) under
        # (score desc, doc asc) — mergesort keeps the doc-asc tiebreak
        cand = cand.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).drop_duplicates(["query_id", "code"])
        out = {c: [] for c in cols}
        k = self.cfg.topk
        for qid, g in cand.groupby("query_id", sort=True):
            g = g.sort_values(
                ["score", "doc_id"], ascending=[False, True], kind="mergesort"
            ).head(k)
            out["query_id"].extend([int(qid)] * len(g))
            out["rank"].extend(range(len(g)))
            out["doc_id"].extend(g["doc_id"].tolist())
            out["grp"].extend(self.side_labels[int(c)] for c in g["code"])
            out["score"].extend(g["score"].tolist())
        df = pd.DataFrame(out)
        if len(df):
            df["doc_id"] = df["doc_id"].astype(np.uint64)
            df["rank"] = df["rank"].astype(np.int32)
        return df

    def grouped_top_hits(
        self,
        queries: list[tuple[int, str]],
        n_per_group: int = 5,
        max_groups: int = 3,
        chunk: int = 512,
    ) -> pd.DataFrame:
        """Shard-local grouped top-hits -> (query_id, grp, grp_count,
        hit_rank, doc_id, score), identical to
        pipelines.collapse.grouped_top_hits.  Each shard reports its
        per-group counts (additive — each doc lives in exactly one
        shard) and per-group top-n hits; the driver sums counts, picks
        the ``max_groups`` groups per (count desc, label asc), and
        re-merges each selected group's hits under (score desc, doc
        asc).  Exchange volume: (queries x groups x n) rows."""
        import ray

        if not self.side_labels:
            raise ValueError("attach_sidecar first")
        futs = []
        for i in range(0, len(queries), chunk):
            part = queries[i : i + chunk]
            futs.extend(
                a.top_hits_batch.remote(part, n_per_group)
                for a in self.actors
            )
        pairs = ray.get(futs)
        cframes = [c for c, _ in pairs if len(c)]
        hframes = [h for _, h in pairs if len(h)]
        cols = ["query_id", "grp", "grp_count", "hit_rank", "doc_id", "score"]
        if not cframes:
            return pd.DataFrame({c: [] for c in cols})
        counts = (
            pd.concat(cframes, ignore_index=True)
            .groupby(["query_id", "code"], sort=True, as_index=False)["n_docs"]
            .sum()
        )
        counts["label"] = [self.side_labels[int(c)] for c in counts["code"]]
        hits = pd.concat(hframes, ignore_index=True)
        out = {c: [] for c in cols}
        for qid, g in counts.groupby("query_id", sort=True):
            sel = g.sort_values(
                ["n_docs", "label"], ascending=[False, True], kind="mergesort"
            ).head(max_groups)
            hq = hits[hits["query_id"] == qid]
            for _, row in sel.iterrows():
                hg = hq[hq["code"] == row["code"]].sort_values(
                    ["score", "doc_id"], ascending=[False, True],
                    kind="mergesort",
                ).head(n_per_group)
                out["query_id"].extend([int(qid)] * len(hg))
                out["grp"].extend([row["label"]] * len(hg))
                out["grp_count"].extend([int(row["n_docs"])] * len(hg))
                out["hit_rank"].extend(range(len(hg)))
                out["doc_id"].extend(hg["doc_id"].tolist())
                out["score"].extend(hg["score"].tolist())
        df = pd.DataFrame(out)
        if len(df):
            df["doc_id"] = df["doc_id"].astype(np.uint64)
            df["hit_rank"] = df["hit_rank"].astype(np.int32)
            df["grp_count"] = df["grp_count"].astype(np.int64)
        return df

    def rerank_search(
        self, queries: list[tuple], mode: str, params: dict | None = None,
        chunk: int = 512,
    ) -> pd.DataFrame:
        """Doc-sharded serving for the rerank family — bit-identical to
        the single-index pipelines (pytest-pinned):

          mode "rank_feature" -> rankfeature.rank_feature_search
          mode "decay"        -> decay.decay_search
          mode "has_child"    -> parentjoin.has_child_search
                                 (sidecar = QUALIFYING parents'
                                 contributions from has_child_contrib;
                                 the hit mask is the must-gate)
          mode "boosting"     -> boosting.boosting_search
                                 (queries = (qid, positive, negative, nb);
                                 needs NO sidecar)

        rank_feature/decay/has_child need ``attach_value_sidecar``
        first (each shard holds its corpus/R value slice).  Every doc is scored
        fully in exactly ONE shard (RangeSearcher.rerank_batch's range
        mask), so the merge is a plain (score desc, doc asc) top-k
        over shards x k slim candidate rows — never doc-proportional."""
        import ray

        params = dict(params or {})
        if mode in ("rank_feature", "decay", "has_child") and not getattr(
            self, "_has_value_sidecar", False
        ):
            raise ValueError("attach_value_sidecar first")
        futs = []
        for i in range(0, len(queries), chunk):
            part = queries[i : i + chunk]
            futs.extend(
                a.rerank_batch.remote(part, mode, params)
                for a in self.actors
            )
        frames = [f for f in ray.get(futs) if len(f)]
        out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
        k = self.cfg.topk
        if frames:
            cand = pd.concat(frames, ignore_index=True)
            for qid, g in cand.groupby("query_id", sort=True):
                g = g.sort_values(
                    ["score", "doc_id"],
                    ascending=[False, True],
                    kind="mergesort",
                ).head(k)
                out["query_id"].extend([int(qid)] * len(g))
                out["rank"].extend(range(len(g)))
                out["doc_id"].extend(g["doc_id"].tolist())
                out["score"].extend(g["score"].tolist())
        df = pd.DataFrame(out)
        if len(df):
            df["doc_id"] = df["doc_id"].astype(np.uint64)
            df["rank"] = df["rank"].astype(np.int32)
        return df

    def range_buckets(
        self, queries: list[tuple[int, str]], ranges, chunk: int = 512
    ) -> pd.DataFrame:
        """Shard-local range aggregation -> (query_id, range_key,
        n_docs, avg_v), identical to rangeagg.range_buckets_search on
        integer-valued fields: the merge sums (n, s) pairs per
        (query, range) — exact in any order — then one s / n per
        surviving bucket."""
        import ray

        from mini_ivf_ray.pipelines.rangeagg import validate_ranges

        r = validate_ranges(ranges)
        if not getattr(self, "_has_value_sidecar", False):
            raise ValueError("attach_value_sidecar first")
        futs = []
        for i in range(0, len(queries), chunk):
            part = queries[i : i + chunk]
            futs.extend(
                a.range_buckets_batch.remote(part, r) for a in self.actors
            )
        frames = [f for f in ray.get(futs) if len(f)]
        if not frames:
            return pd.DataFrame(
                {"query_id": [], "range_key": [], "n_docs": [], "avg_v": []}
            )
        merged = (
            pd.concat(frames, ignore_index=True)
            .groupby(["query_id", "range_key"], sort=True, as_index=False)
            .sum()
        )
        merged["avg_v"] = merged["s"].to_numpy() / merged["n"].to_numpy()
        out = merged[["query_id", "range_key"]].copy()
        out["n_docs"] = merged["n"].astype(np.int64)
        out["avg_v"] = merged["avg_v"].astype(np.float64)
        out["query_id"] = out["query_id"].astype(np.int64)
        return out.reset_index(drop=True)

    def pct_ranks(
        self, queries: list[tuple[int, str]], thresholds: list[float],
        chunk: int = 512,
    ) -> pd.DataFrame:
        """Shard-local percentile ranks -> (query_id, value, pct,
        n_docs), identical to extstats.percentile_ranks_search: the
        merge sums 1 + k integers per (query, shard), exact in any
        order, then one (100.0 * c) / n per row."""
        import ray

        t = [float(x) for x in thresholds]
        if not t:
            raise ValueError("percentile_ranks needs >= 1 threshold value")
        if not getattr(self, "_has_value_sidecar", False):
            raise ValueError("attach_value_sidecar first")
        futs = []
        for i in range(0, len(queries), chunk):
            part = queries[i : i + chunk]
            futs.extend(
                a.pct_ranks_batch.remote(part, t) for a in self.actors
            )
        frames = [f for f in ray.get(futs) if len(f)]
        if not frames:
            return pd.DataFrame(
                {"query_id": [], "value": [], "pct": [], "n_docs": []}
            )
        merged = (
            pd.concat(frames, ignore_index=True)
            .groupby(["query_id", "value"], sort=True, as_index=False)
            .sum()
        )
        merged["pct"] = (100.0 * merged["c"].to_numpy().astype(np.float64)) / (
            merged["n"].to_numpy().astype(np.float64)
        )
        out = merged[["query_id", "value", "pct"]].copy()
        out["n_docs"] = merged["n"].astype(np.int64)
        out["query_id"] = out["query_id"].astype(np.int64)
        return out.reset_index(drop=True)

    def grouped_metric_top(
        self, queries: list[tuple[int, str]], num_buckets: int = 3,
        chunk: int = 512,
    ) -> pd.DataFrame:
        """Shard-local terms-agg-by-metric -> top num_buckets
        (query_id, facet, n_docs, avg_v) by (avg desc, facet asc),
        identical to extstats.grouped_metric_top: ALL groups' (n, sum)
        partials survive to the ordering (the exactness ES gives up to
        shard-local bucket pruning).  Needs BOTH sidecars attached."""
        import ray

        if num_buckets < 1:
            raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
        if not self.side_labels:
            raise ValueError("attach_sidecar first")
        if not getattr(self, "_has_value_sidecar", False):
            raise ValueError("attach_value_sidecar first")
        futs = []
        for i in range(0, len(queries), chunk):
            part = queries[i : i + chunk]
            futs.extend(
                a.grouped_metric_batch.remote(part) for a in self.actors
            )
        frames = [f for f in ray.get(futs) if len(f)]
        rows = []
        if frames:
            merged = (
                pd.concat(frames, ignore_index=True)
                .groupby(["query_id", "code"], sort=True, as_index=False)
                .sum()
            )
            for qid, g in merged.groupby("query_id", sort=True):
                n = g["n"].to_numpy().astype(np.float64)
                s = g["s"].to_numpy().astype(np.float64)
                avg = s / n
                names = [self.side_labels[int(c)] for c in g["code"]]
                order = sorted(
                    range(len(names)), key=lambda i: (-avg[i], names[i])
                )[:num_buckets]
                for i in order:
                    rows.append(
                        (int(qid), names[i], int(n[i]), float(avg[i]))
                    )
        return pd.DataFrame(
            rows, columns=["query_id", "facet", "n_docs", "avg_v"]
        )

    def adjacency_buckets(
        self, queries: list[tuple[int, str]],
        filters: list[tuple[str, str]], chunk: int = 512,
    ) -> pd.DataFrame:
        """Shard-local adjacency matrix -> (query_id, key, n_docs),
        identical to adjacency.adjacency_search: per-shard k x k
        integer matrices merge by summation (exact in any order),
        then one bucket_rows pass per query."""
        import ray

        from mini_ivf_ray.pipelines.adjacency import (
            bucket_rows,
            validate_filters,
        )

        filters = validate_filters(filters)
        names = [n for n, _ in filters]
        k = len(names)
        futs = []
        for i in range(0, len(queries), chunk):
            part = queries[i : i + chunk]
            futs.extend(
                a.adjacency_batch.remote(part, filters) for a in self.actors
            )
        frames = [f for f in ray.get(futs) if len(f)]
        out = {"query_id": [], "key": [], "n_docs": []}
        if frames:
            merged = (
                pd.concat(frames, ignore_index=True)
                .groupby(["query_id", "i", "j"], sort=True, as_index=False)
                .sum()
            )
            for qid, g in merged.groupby("query_id", sort=True):
                mat = np.zeros((k, k), dtype=np.int64)
                ii = g["i"].to_numpy()
                jj = g["j"].to_numpy()
                cc = g["c"].to_numpy()
                mat[ii, jj] = cc
                mat[jj, ii] = cc
                for key, c in bucket_rows(names, mat):
                    out["query_id"].append(int(qid))
                    out["key"].append(key)
                    out["n_docs"].append(c)
        return pd.DataFrame(out)

    def filters_agg(
        self, queries: list[tuple[int, str]],
        filters: list[tuple[str, str]], chunk: int = 512,
    ) -> pd.DataFrame:
        """Shard-local filters aggregation -> (query_id, key, n_docs),
        identical to adjacency.filters_agg_search: per-shard (k+1)
        integer count vectors merge by summation; every named bucket
        plus _other_ is emitted per query even at 0 (the single-index
        contract)."""
        import ray

        from mini_ivf_ray.pipelines.adjacency import (
            OTHER_BUCKET_KEY,
            validate_filters,
        )

        filters = validate_filters(filters)
        names = [n for n, _ in filters] + [OTHER_BUCKET_KEY]
        k1 = len(names)
        futs = []
        for i in range(0, len(queries), chunk):
            part = queries[i : i + chunk]
            futs.extend(
                a.filters_batch.remote(part, filters) for a in self.actors
            )
        frames = [f for f in ray.get(futs) if len(f)]
        totals: dict[int, np.ndarray] = {
            int(qid): np.zeros(k1, dtype=np.int64) for qid, _ in queries
        }
        if frames:
            merged = (
                pd.concat(frames, ignore_index=True)
                .groupby(["query_id", "bi"], sort=True, as_index=False)
                .sum()
            )
            for qid, bi, c in zip(
                merged["query_id"], merged["bi"], merged["c"]
            ):
                totals[int(qid)][int(bi)] += int(c)
        out = {"query_id": [], "key": [], "n_docs": []}
        for qid, _ in queries:
            for name, c in zip(names, totals[int(qid)]):
                out["query_id"].append(int(qid))
                out["key"].append(name)
                out["n_docs"].append(int(c))
        return pd.DataFrame(out)

    def similarity_search(
        self, queries: list[tuple[int, str]], model: str,
        params: dict | None = None, chunk: int = 512,
    ) -> pd.DataFrame:
        """Doc-sharded serving for the pluggable-similarity family —
        bit-identical to the single-index pipelines (pytest-pinned):
        model "dirichlet" -> lm_dirichlet.dirichlet_search, "jm" ->
        jelinek_mercer_search, "classic" -> classic.classic_search,
        "sparse" -> sparse.sparse_vector_search (weight maps in
        ``params["weights_by_query"]``, pre-validated via
        sparse.validate_weights; query text is ignored).
        No sidecar needed; collection stats are global per shard.  The
        merge is search()'s max-dedup (partial boundary scores are <=
        the home shard's full score for all four models)."""
        import ray

        params = dict(params or {})
        futs = []
        for i in range(0, len(queries), chunk):
            part = queries[i : i + chunk]
            futs.extend(
                a.similarity_batch.remote(part, model, params)
                for a in self.actors
            )
        frames = [f for f in ray.get(futs) if len(f)]
        out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
        k = self.cfg.topk
        if frames:
            cand = pd.concat(frames, ignore_index=True)
            cand = cand.sort_values(
                "score", ascending=False, kind="mergesort"
            ).drop_duplicates(["query_id", "doc_id"])
            for qid, g in cand.groupby("query_id", sort=True):
                g = g.sort_values(
                    ["score", "doc_id"],
                    ascending=[False, True],
                    kind="mergesort",
                ).head(k)
                out["query_id"].extend([int(qid)] * len(g))
                out["rank"].extend(range(len(g)))
                out["doc_id"].extend(g["doc_id"].tolist())
                out["score"].extend(g["score"].tolist())
        df = pd.DataFrame(out)
        if len(df):
            df["doc_id"] = df["doc_id"].astype(np.uint64)
            df["rank"] = df["rank"].astype(np.int32)
        return df

    def search(
        self, queries: list[tuple[int, str]], chunk: int = 512
    ) -> pd.DataFrame:
        """-> (query_id, rank, doc_id, score), rank-identical to the
        exact oracle.  Fan-out: every chunk goes to every shard."""
        import ray

        futs = []
        for i in range(0, len(queries), chunk):
            part = queries[i : i + chunk]
            futs.extend(a.search_batch.remote(part) for a in self.actors)
        frames = [f for f in ray.get(futs) if len(f)]
        if not frames:
            return pd.DataFrame(
                {"query_id": [], "rank": [], "doc_id": [], "score": []}
            )
        cand = pd.concat(frames, ignore_index=True)
        # A doc's home shard sees every block containing it (blocks are
        # docID-contiguous, so first <= doc <= last overlaps the home
        # range) and thus computes the FULL score; a neighbouring shard
        # scoring the same doc via a boundary block may only see the
        # query terms whose blocks cross into its range — a PARTIAL
        # score.  BM25 contributions are positive, so max == full:
        # keep the max score per (query_id, doc_id) before ranking.
        cand = cand.sort_values(
            "score", ascending=False, kind="mergesort"
        ).drop_duplicates(["query_id", "doc_id"])
        out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
        k = self.cfg.topk
        for qid, g in cand.groupby("query_id", sort=True):
            g = g.sort_values(
                ["score", "doc_id"], ascending=[False, True], kind="mergesort"
            ).head(k)
            out["query_id"].extend([int(qid)] * len(g))
            out["rank"].extend(range(len(g)))
            out["doc_id"].extend(g["doc_id"].tolist())
            out["score"].extend(g["score"].tolist())
        df = pd.DataFrame(out)
        if len(df):
            df["doc_id"] = df["doc_id"].astype(np.uint64)
            df["rank"] = df["rank"].astype(np.int32)
        return df

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []

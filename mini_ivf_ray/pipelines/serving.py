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
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import share_segments, topk_from_blocks
from mini_ivf_ray.sources.segments import PostingBlocks, SegmentReader
from mini_ivf_ray.state.stats import CorpusStats


class RangeSearcher:
    """One shard: all terms, posting blocks overlapping [lo, hi]."""

    def __init__(
        self,
        index_dir: str,
        cfg: PipelineConfig,
        lo: int,
        hi: int,
        shared_tables: dict | None = None,
    ):
        self.cfg = cfg
        self.lo, self.hi = lo, hi
        self.stats = CorpusStats.load(index_dir)
        self.reader = SegmentReader(index_dir, shared_tables=shared_tables)
        self._range_cache: dict[str, PostingBlocks | None] = {}

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
            for d, s in topk_from_blocks(fetched, self.stats, self.cfg):
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

    def __init__(self, index_dir: str, cfg: PipelineConfig, decoded_refs: dict | None):
        from mini_ivf_ray.pipelines.query import BM25Searcher

        self.searcher = BM25Searcher(index_dir, cfg, decoded_refs=decoded_refs)

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
    ):
        import ray

        self.cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
        decoded = None
        if share:
            from mini_ivf_ray.sources.decoded import share_decoded_index

            decoded = share_decoded_index(index_dir, self.cfg)
        cls = ray.remote(num_cpus=1)(_ServingWorker)
        self.actors = [
            cls.remote(index_dir, self.cfg, decoded) for _ in range(num_actors)
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
    ):
        import ray

        self.cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
        self.num_shards = num_shards
        stats = CorpusStats.load(index_dir)
        space = 2**64 if self.cfg.doc_id_from_url else stats.max_doc_id + 1
        bounds = [(s * space) // num_shards for s in range(num_shards + 1)]
        shared = share_segments(index_dir, self.cfg.num_partitions) if share else None
        cls = ray.remote(num_cpus=1)(RangeSearcher)
        self.actors = [
            cls.remote(index_dir, self.cfg, bounds[s], bounds[s + 1] - 1, shared)
            for s in range(num_shards)
        ]

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

"""Query engine: block-max WAND top-k + the exact BM25 oracles.

Reference analogs:
* ``QueryBaseline`` (index_ivfpq.cpp:351-410): rank centroids, scan the
  W nearest posting lists, ADist-score every member, partial_sort top-k.
  Ours: the query's terms NAME their posting lists (no geometric
  ranking); block-max WAND scans them document-at-a-time with a
  fixed-size min-heap and per-block upper-bound skipping.
* ``toolkits/get_groundtruth.cpp``: the oracle is the same engine run
  exhaustively (ncentroids=1).  Ours: ``brute_force_topk`` (local) and
  ``exhaustive_topk`` (distributed map_batches) score every document.

Rank-identity contract: all three scorers follow functions/bm25.py's
canonical accumulation (float64, distinct query terms in lexicographic
order) and the tie-break (score desc, doc_id asc), so their top-k agree
bit-for-bit.  WAND prunes only on STRICT upper-bound inequality, so
score-ties at the heap threshold are never wrongly skipped.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import term_freqs, tokenize
from mini_ivf_ray.sources.segments import PostingBlocks, SegmentReader
from mini_ivf_ray.state.stats import CorpusStats


class TermIterator:
    """Cursor over one term's globally sorted posting blocks.  Blocks are
    decoded lazily — block-level skips (``shallow_to``) touch only the
    (first, last, max_score) metadata, the analog of IVF's
    posting_lists_lens-driven scan bookkeeping."""

    __slots__ = (
        "term", "blocks", "idf", "global_ub", "bi", "pos",
        "_docs", "_contribs", "_ctx", "exhausted",
    )

    def __init__(self, blocks: PostingBlocks, idf: float, n_docs: int, avgdl: float, cfg):
        self.term = blocks.term
        self.blocks = blocks
        self.idf = idf
        self.global_ub = float(blocks.max_scores.max())
        self.bi = 0
        self.pos = 0
        self._docs = None
        self._contribs = None
        self.exhausted = blocks.n_blocks == 0
        # scoring context captured for decode
        self._ctx = (n_docs, avgdl, cfg.k1, cfg.b)

    @property
    def cur_doc(self) -> int:
        if self._docs is not None:
            return int(self._docs[self.pos])
        return int(self.blocks.firsts[self.bi])

    @property
    def block_last(self) -> int:
        return int(self.blocks.lasts[self.bi])

    @property
    def block_ub(self) -> float:
        return float(self.blocks.max_scores[self.bi])

    def _decode(self) -> None:
        docs, tfs, dls = self.blocks.decode(self.bi)
        n_docs, avgdl, k1, b = self._ctx
        self._docs = docs
        self._contribs = self.idf * bm25.tf_norm(tfs, dls, avgdl, k1, b)

    def score_current(self) -> float:
        if self._docs is None:
            self._decode()
        return float(self._contribs[self.pos])

    def shallow_to(self, target: int) -> None:
        """Move the block cursor (metadata only) so current block's last
        >= target; never decodes."""
        b = self.blocks
        while self.bi < b.n_blocks and int(b.lasts[self.bi]) < target:
            self.bi += 1
            self._docs = None
            self.pos = 0
        if self.bi >= b.n_blocks:
            self.exhausted = True

    def next_geq(self, target: int) -> None:
        """Advance to the first posting with doc_id >= target."""
        if self.exhausted:
            return
        if self._docs is not None and int(self._docs[-1]) >= target:
            # stay within the decoded block
            self.pos = int(np.searchsorted(self._docs, np.uint64(target), side="left"))
            return
        self.shallow_to(target)
        if self.exhausted:
            return
        if int(self.blocks.firsts[self.bi]) >= target:
            self.pos = 0
            self._docs = None  # cur_doc readable from metadata; decode deferred
            return
        self._decode()
        self.pos = int(np.searchsorted(self._docs, np.uint64(target), side="left"))

    def advance(self) -> None:
        """One posting forward."""
        if self._docs is None:
            self._decode()
        if self.pos + 1 < len(self._docs):
            self.pos += 1
            return
        self.bi += 1
        self._docs = None
        self.pos = 0
        if self.bi >= self.blocks.n_blocks:
            self.exhausted = True


def wand_topk(iters: list[TermIterator], k: int) -> list[tuple[int, float]]:
    """Block-max WAND.  Returns [(doc_id, score)] ranked by
    (score desc, doc_id asc), only docs containing >=1 query term.

    Heap entries are (score, -doc_id): the min-heap top is the weakest
    result under the exact tie-break, so threshold pruning with STRICT
    inequality can never drop a true top-k member.
    """
    heap: list[tuple[float, int]] = []
    active = [it for it in iters if not it.exhausted]
    while active:
        active = [it for it in active if not it.exhausted]
        if not active:
            break
        active.sort(key=lambda it: it.cur_doc)
        full = len(heap) >= k
        theta = heap[0][0] if full else float("-inf")

        # --- pivot: first prefix whose summed global UBs could enter ---
        acc = 0.0
        pivot = -1
        for i, it in enumerate(active):
            acc += it.global_ub
            if not full or acc >= theta:
                pivot = i
                break
        if pivot < 0:
            break  # even all terms together cannot reach theta
        pivot_doc = active[pivot].cur_doc
        # extend the pivot over cur_doc ties: every iterator sitting at
        # pivot_doc must be inside the block-max sum / evaluation set,
        # both for bound soundness and for strict forward progress
        while pivot + 1 < len(active) and active[pivot + 1].cur_doc == pivot_doc:
            pivot += 1

        if active[0].cur_doc == pivot_doc:
            # --- block-max refinement ---
            for it in active[: pivot + 1]:
                it.shallow_to(pivot_doc)
            sub = [it for it in active[: pivot + 1] if not it.exhausted]
            bub = sum(it.block_ub for it in sub)
            if full and bub < theta:
                # no doc up to the nearest block boundary can enter
                boundary = min(it.block_last for it in sub) if sub else pivot_doc
                nxt = boundary + 1
                if pivot + 1 < len(active):
                    nxt = min(nxt, active[pivot + 1].cur_doc)
                for it in sub:
                    it.next_geq(nxt)
                continue
            # --- full evaluation of pivot_doc ---
            hitters = []
            for it in active[: pivot + 1]:
                it.next_geq(pivot_doc)
                if not it.exhausted and it.cur_doc == pivot_doc:
                    hitters.append(it)
            score = 0.0
            for it in sorted(hitters, key=lambda it: it.term):  # canonical order
                score += it.score_current()
            if hitters:
                cand = (score, -pivot_doc)
                if not full:
                    heapq.heappush(heap, cand)
                elif cand > heap[0]:
                    heapq.heapreplace(heap, cand)
            for it in hitters:
                it.advance()
        else:
            # align the leading iterators up to the pivot document
            for it in active[:pivot]:
                if it.cur_doc < pivot_doc:
                    it.next_geq(pivot_doc)
    # rank by (score desc, doc_id asc); entries hold -doc_id, negate again
    return [(-nd, s) for s, nd in sorted(heap, key=lambda e: (-e[0], -e[1]))]


class BM25Searcher:
    """Stateful query-serving stage (actor pool; SURVEY T2): corpus
    stats + segment readers loaded once per actor in ``__init__``, then
    ``__call__`` serves query batches.  Deployed via
    ``queries_ds.map_batches(BM25Searcher, concurrency=N, ...)``."""

    def __init__(self, index_dir: str, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        self.stats = CorpusStats.load(index_dir)
        self.reader = SegmentReader(index_dir)

    def topk_for_text(self, qtext: str) -> list[tuple[int, float]]:
        terms = sorted(set(tokenize(qtext)))
        iters = []
        for t in terms:
            df = self.stats.df.get(t, 0)
            if df <= 0:
                continue  # out-of-vocabulary term: empty posting list
            blocks = self.reader.term_blocks(t, self.stats.term_locations(t, self.cfg))
            if blocks is None:
                continue
            iters.append(
                TermIterator(
                    blocks,
                    bm25.idf(df, self.stats.n_docs),
                    self.stats.n_docs,
                    self.stats.avgdl,
                    self.cfg,
                )
            )
        return wand_topk(iters, self.cfg.topk)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        ids = batch["query_id"].to_pylist()
        texts = batch["text"].to_pylist()
        for qid, qtext in zip(ids, texts):
            for r, (d, s) in enumerate(self.topk_for_text(qtext)):
                qids.append(qid)
                ranks.append(r)
                docs.append(d)
                scores.append(s)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int32()),
                "doc_id": pa.array(np.array(docs, dtype=np.uint64), type=pa.uint64()),
                "score": pa.array(scores, type=pa.float64()),
            }
        )


def search(index_dir: str, queries_ds, cfg: PipelineConfig | None = None):
    """queries (query_id, text) -> results (query_id, rank, doc_id, score)."""
    cfg = cfg or PipelineConfig()
    return queries_ds.map_batches(
        BM25Searcher,
        fn_constructor_args=(index_dir, cfg),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=cfg.query_concurrency,
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# Oracles (reference: toolkits/get_groundtruth.cpp — same engine, exhaustive)
# ---------------------------------------------------------------------------


def brute_force_topk(
    docs: pd.DataFrame, queries: list[tuple[int, str]], cfg: PipelineConfig | None = None
) -> pd.DataFrame:
    """Local exact oracle over a small corpus (columns doc_id, text).
    Canonical accumulation; used by pytest for rank-identity."""
    cfg = cfg or PipelineConfig()
    doc_ids = docs["doc_id"].to_numpy().astype(np.uint64)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order]
    texts = docs["text"].to_numpy()[order]
    tfs_per_doc = [term_freqs(t) for t in texts]
    dls = np.array([sum(c.values()) for c in tfs_per_doc], dtype=np.int64)
    n_docs = len(doc_ids)
    avgdl = dls.sum() / n_docs if n_docs else 0.0

    postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    tmp: dict[str, tuple[list, list]] = {}
    for i, c in enumerate(tfs_per_doc):
        for t, f in c.items():
            slot = tmp.setdefault(t, ([], []))
            slot[0].append(i)
            slot[1].append(f)
    for t, (idx, f) in tmp.items():
        postings[t] = (np.array(idx, dtype=np.int64), np.array(f, dtype=np.int64))

    out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
    for qid, qtext in queries:
        scores = np.zeros(n_docs, dtype=np.float64)
        touched = np.zeros(n_docs, dtype=bool)
        for t in sorted(set(tokenize(qtext))):
            if t not in postings:
                continue
            idx, f = postings[t]
            scores[idx] += bm25.contributions(
                f, dls[idx], int(len(idx)), n_docs, avgdl, cfg.k1, cfg.b
            )
            touched[idx] = True
        cand = np.flatnonzero(touched)
        if cand.size == 0:
            continue
        rank_order = np.lexsort((doc_ids[cand], -scores[cand]))[: cfg.topk]
        sel = cand[rank_order]
        for r, i in enumerate(sel):
            out["query_id"].append(qid)
            out["rank"].append(r)
            out["doc_id"].append(int(doc_ids[i]))
            out["score"].append(float(scores[i]))
    df = pd.DataFrame(out)
    df["doc_id"] = df["doc_id"].astype(np.uint64) if len(df) else df.get("doc_id")
    return df


class _ExhaustiveScorer:
    """Distributed exhaustive scorer: each doc batch scored against ALL
    queries (doc-at-a-time), emitting per-batch top-k candidates — the
    map side of the distributed oracle.  Needs the global stats
    (broadcast) so per-doc scores are final, not partial."""

    def __init__(self, stats_ref, queries: list[tuple[int, str]], cfg: PipelineConfig):
        import ray

        self.stats: CorpusStats = (
            ray.get(stats_ref) if not isinstance(stats_ref, CorpusStats) else stats_ref
        )
        self.cfg = cfg
        self.queries = [
            (qid, sorted(set(tokenize(qtext)))) for qid, qtext in queries
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        doc_ids = batch["doc_id"].to_numpy().astype(np.uint64)
        tfs_per_doc = [term_freqs(t) for t in texts]
        dls = np.array([sum(c.values()) for c in tfs_per_doc], dtype=np.int64)
        n = len(texts)
        st, cfg = self.stats, self.cfg

        # per-batch term -> (doc positions, tf)
        tmp: dict[str, tuple[list, list]] = {}
        for i, c in enumerate(tfs_per_doc):
            for t, f in c.items():
                slot = tmp.setdefault(t, ([], []))
                slot[0].append(i)
                slot[1].append(f)

        out = {"query_id": [], "doc_id": [], "score": []}
        for qid, terms in self.queries:
            scores = np.zeros(n, dtype=np.float64)
            touched = np.zeros(n, dtype=bool)
            for t in terms:  # already sorted
                hit = tmp.get(t)
                df = st.df.get(t, 0)
                if hit is None or df <= 0:
                    continue
                idx = np.array(hit[0], dtype=np.int64)
                f = np.array(hit[1], dtype=np.int64)
                scores[idx] += bm25.contributions(
                    f, dls[idx], df, st.n_docs, st.avgdl, cfg.k1, cfg.b
                )
                touched[idx] = True
            cand = np.flatnonzero(touched)
            if cand.size == 0:
                continue
            sel = cand[np.lexsort((doc_ids[cand], -scores[cand]))[: cfg.topk]]
            out["query_id"].extend([qid] * len(sel))
            out["doc_id"].extend(int(doc_ids[i]) for i in sel)
            out["score"].extend(float(scores[i]) for i in sel)
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], type=pa.int64()),
                "doc_id": pa.array(
                    np.array(out["doc_id"], dtype=np.uint64), type=pa.uint64()
                ),
                "score": pa.array(out["score"], type=pa.float64()),
            }
        )


def exhaustive_topk(
    docs_ds, stats: CorpusStats, queries: list[tuple[int, str]], cfg: PipelineConfig | None = None
) -> pd.DataFrame:
    """Distributed exact oracle: per-batch top-k candidates, merged to a
    global top-k per query on the driver (candidate set is
    O(batches * nq * k) — small).  Same accumulation contract as WAND."""
    import ray

    cfg = cfg or PipelineConfig()
    stats_ref = ray.put(stats)
    cands = docs_ds.map_batches(
        _ExhaustiveScorer,
        fn_constructor_args=(stats_ref, queries, cfg),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=cfg.query_concurrency,
        num_cpus=1,
    ).to_pandas()
    out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
    for qid, g in cands.groupby("query_id", sort=True):
        g = g.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(cfg.topk)
        out["query_id"].extend([qid] * len(g))
        out["rank"].extend(range(len(g)))
        out["doc_id"].extend(g["doc_id"].tolist())
        out["score"].extend(g["score"].tolist())
    df = pd.DataFrame(out)
    if len(df):
        df["doc_id"] = df["doc_id"].astype(np.uint64)
        df["rank"] = df["rank"].astype(np.int32)
    return df

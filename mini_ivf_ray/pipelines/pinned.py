"""Pinned query: Elasticsearch's ``pinned`` query — promote a curated
list of documents to the TOP of the result list, in the given order,
with organic (BM25) results filling the remaining slots.

Semantics, pinned to ES's:

* promoted docs come first, in their GIVEN order, regardless of their
  organic score (even score-0 non-matches of the organic query);
* the organic ranking (full exact TAAT, score desc / doc asc) fills
  the rest of the top-k, with promoted ids EXCLUDED (no doc appears
  twice);
* a query pins at most ``topk`` docs (extra pins are cut — they could
  never be shown).

Scores: ES assigns pinned hits descending constants just above any
practical relevance score (1.7e38 - rank).  Here the pinned score is
the documented stand-in ``PIN_BASE - rank`` (PIN_BASE = 1e9, far
above any BM25 sum and exactly representable), so the combined column
stays one float64 ranking key the SQL oracle replays verbatim.

Documented divergence: promoted ids are caller-trusted — ES verifies
each pinned id exists in the index before returning it; this engine
emits the pins as given (the id directory is sharded away from the
query path), so pinning a nonexistent id shows it with a pinned score
and no text.  Pytest-pinned behavior, not an accident.

Scale shape: the pin table is (queries x pins) slim rows carried
inside the query batch itself — nothing is broadcast; the organic
path is the unchanged exact TAAT.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import (
    BM25Searcher,
    _allowed_mask,
    _taat_accumulate,
    _topk_exact,
)

PIN_BASE = 1e9


class PinnedSearcher(BM25Searcher):
    """Actor-pool stage: rows (query_id, text, pins list<uint64>) ->
    (query_id, rank, doc_id, score): pins first in order at
    PIN_BASE - rank, organic fills the rest, pins excluded from the
    organic tail."""

    def pinned_topk_for(self, qtext: str, pins: list[int]):
        k = self.cfg.topk
        # tombstone consistency (the round-5 serving rule): a deleted
        # doc never surfaces, pinned or not
        dead = (
            set(map(int, self.denied.tolist()))
            if self.denied is not None and self.denied.size
            else set()
        )
        seen = set()
        ordered_pins = []
        for p in pins:
            if int(p) not in seen and int(p) not in dead:
                seen.add(int(p))
                ordered_pins.append(int(p))
            if len(ordered_pins) >= k:
                break
        rows = [
            (p, PIN_BASE - float(r)) for r, p in enumerate(ordered_pins)
        ]
        slots = k - len(rows)
        if slots > 0:
            terms = sorted(set(tokenize(qtext)))
            wanted = {
                t: self.stats.term_locations(t, self.cfg)
                for t in terms
                if self.stats.df.get(t, 0) > 0
            }
            fetched = self.reader.fetch_terms(wanted)
            blocks = []
            for t in sorted(wanted):
                b = fetched.get(t)
                if b is None or not b.n_blocks:
                    continue
                from mini_ivf_ray.functions import bm25

                b.set_scoring(
                    bm25.idf(self.stats.df[b.term], self.stats.n_docs),
                    self.stats.avgdl,
                    self.cfg.k1,
                    self.cfg.b,
                )
                blocks.append(b)
            if blocks:
                docs, scores, scored = _taat_accumulate(blocks)
                if self.denied is not None and self.denied.size:
                    keep = ~_allowed_mask(docs, self.denied)
                    docs, scores = docs[keep], scores[keep]
                if docs.size and ordered_pins:
                    pin_arr = np.sort(
                        np.array(ordered_pins, dtype=np.uint64)
                    )
                    keep = ~_allowed_mask(docs, pin_arr)
                    docs, scores = docs[keep], scores[keep]
                if docs.size:
                    rows.extend(_topk_exact(docs, scores, slots))
                self.counters["searched_cnt"] = (
                    self.counters.get("searched_cnt", 0) + scored
                )
        self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
        return rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, qtext, pins in zip(
            batch["query_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["pins"].to_pylist(),
        ):
            for r, (d, s) in enumerate(
                self.pinned_topk_for(qtext, list(pins or []))
            ):
                qids.append(qid)
                ranks.append(r)
                docs.append(int(d))
                scores.append(float(s))
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int32()),
                "doc_id": pa.array(
                    np.array(docs, dtype=np.uint64), type=pa.uint64()
                ),
                "score": pa.array(scores, type=pa.float64()),
            }
        )


def pinned_search(
    index_dir: str,
    queries_ds,
    cfg: PipelineConfig | None = None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text, pins) -> (query_id, rank, doc_id,
    score): ES pinned query — curated ids first, organic BM25 after."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    shared = decoded = None
    if share == "decoded":
        from mini_ivf_ray.sources.decoded import share_decoded_index

        decoded = share_decoded_index(index_dir, cfg)
    elif share:
        from mini_ivf_ray.pipelines.query import share_segments

        shared = share_segments(index_dir, cfg.num_partitions)

    from mini_ivf_ray.pipelines.serving import _tombstone_ref

    denied_ref = _tombstone_ref(index_dir) if respect_deletes else None
    return queries_ds.map_batches(
        PinnedSearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded),
        fn_constructor_kwargs={"denied_ref": denied_ref},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )

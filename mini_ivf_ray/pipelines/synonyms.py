"""Synonym-group retrieval: Lucene ``SynonymQuery`` scoring.

Naive query expansion ("fast quick speedy" as three disjuncts)
over-scores documents that use several surface forms of the same
concept: each variant brings its own idf and its own tf-saturation
curve.  The principled fix (Lucene's SynonymQuery) scores a synonym
group as ONE pseudo-term:

  * tf  = the SUM of member-term frequencies in the doc, summed
    BEFORE the BM25 saturation nonlinearity;
  * df  = the number of docs containing ANY member (union), so the
    group idf reflects the concept's true rarity.

Query syntax here: groups separated by whitespace, members joined by
``|`` — ``"fast|quick sort"`` scores the {fast, quick} group plus the
plain term ``sort`` (a 1-member group degenerates to exact BM25).

Serving shape: SynonymSearcher subclasses the BM25Searcher actor —
same once-per-actor state, same ``map_batches`` deployment — but
fetches RAW postings (doc, tf, dl) instead of baked contributions,
because the group tf-sum must happen inside the saturation.  It
therefore runs over payload-mode segment readers (``share=False`` /
``share="segments"``) or multi-epoch raw partitions, never the
baked shared-decode views.

Vectorized group merge per query: concatenate members' (doc, tf, dl)
arrays, one ``np.unique(return_inverse)`` + ``bincount`` sums tfs per
doc (integer-valued float64 sums — exact), the group df is the unique
count, and the final per-doc score accumulates group contributions in
group order (``np.add.at``) — deterministic, SQL-replayable.

The reference has no text-side analog (mini-ivf is vector-only); this
extends SURVEY §2.10's query-side surface the same way fuzzy /
wildcard / boolean retrieval do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import BM25Searcher, accumulate_topk
from mini_ivf_ray.sources.segments import decode_block


def parse_groups(qtext: str) -> list[list[str]]:
    """``"fast|quick sort"`` -> [["fast", "quick"], ["sort"]]; members
    go through the indexing tokenizer, duplicates dropped."""
    groups = []
    for part in qtext.split():
        members = sorted(
            {t for m in part.split("|") for t in tokenize(m)}
        )
        if members:
            groups.append(members)
    return groups


def _raw_postings(blocks) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(docs, tfs, dls) of one term across all its blocks — from
    payload mode (decode, scoring-free) or raw multi-epoch mode."""
    if blocks.payloads is not None:
        ds, ts, ls = [], [], []
        for p, f, c in zip(blocks.payloads, blocks.firsts, blocks.counts):
            d, t, l = decode_block(p, int(f), int(c))
            ds.append(d)
            ts.append(t)
            ls.append(l)
        if not ds:
            e = np.empty(0)
            return e.astype(np.uint64), e, e
        return np.concatenate(ds), np.concatenate(ts), np.concatenate(ls)
    if blocks._raw is not None:
        tfs, dls = blocks._raw
        return blocks._all[0], tfs, dls
    raise ValueError(
        "synonym scoring needs raw (tf, dl) postings; baked decoded "
        "views cannot be inverted — serve with share=False/'segments'"
    )


class SynonymSearcher(BM25Searcher):
    """Actor-pool synonym retrieval: the ``text`` column carries the
    ``a|b c`` group syntax; groups score as single pseudo-terms."""

    def synonym_topk_for_text(self, qtext: str) -> list[tuple[int, float]]:
        groups = parse_groups(qtext)
        all_terms = sorted({t for g in groups for t in g})
        wanted = {
            t: self.stats.term_locations(t, self.cfg)
            for t in all_terms
            if self.stats.df.get(t, 0) > 0
        }
        fetched = self.reader.fetch_terms(wanted)
        scored = 0
        per_group: list[tuple[np.ndarray, np.ndarray]] = []
        for g in groups:
            ds, ts, ls = [], [], []
            for t in g:
                b = fetched.get(t)
                if b is None:
                    continue
                d, tf, dl = _raw_postings(b)
                ds.append(d)
                ts.append(tf)
                ls.append(dl)
                scored += d.size
            if not ds:
                continue
            docs_cat = np.concatenate(ds)
            uniq, inv = np.unique(docs_cat, return_inverse=True)
            gtf = np.bincount(
                inv, weights=np.concatenate(ts), minlength=uniq.size
            )
            dl_u = np.zeros(uniq.size, dtype=np.float64)
            dl_u[inv] = np.concatenate(ls)  # same doc -> same dl
            idf_g = bm25.idf(int(uniq.size), self.stats.n_docs)
            contribs = idf_g * bm25.tf_norm(
                gtf, dl_u, self.stats.avgdl, self.cfg.k1, self.cfg.b
            )
            per_group.append((uniq, contribs))
        self.counters["searched_cnt"] = (
            self.counters.get("searched_cnt", 0) + scored
        )
        self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
        return accumulate_topk(per_group, self.cfg.topk)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, text in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for r, (d, s) in enumerate(self.synonym_topk_for_text(text)):
                qids.append(qid)
                ranks.append(r)
                docs.append(d)
                scores.append(s)
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


def synonym_search(index_dir: str, queries_ds, cfg=None, share: bool = True):
    """queries (query_id, text="a|b c" groups) -> (query_id, rank,
    doc_id, score) — the same deployment shape as query.search(), over
    payload-mode readers (raw tf needed; see module docstring)."""
    from mini_ivf_ray.config import PipelineConfig
    from mini_ivf_ray.pipelines.query import share_segments

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    shared = share_segments(index_dir, cfg.num_partitions) if share else None
    return queries_ds.map_batches(
        SynonymSearcher,
        fn_constructor_args=(index_dir, cfg, shared, None),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )

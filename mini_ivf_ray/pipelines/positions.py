"""Positional postings payload: an optional per-index positions store
so phrase and proximity queries verify from the INDEX instead of
re-reading the corpus.

Reference analog: mini-ivf packs a per-list payload next to each
cluster's ids (``db_codes_``, index_ivfpq.hpp:157; gathered by the scan
loop index_ivfpq.cpp:111-117).  Here the payload is token positions —
the Lucene ``.pos`` layout re-expressed as Arrow: a doc-hash-partitioned
parquet store under ``<index_dir>/positions/part=K/`` with rows

    (doc_id uint64, term string, positions list<int32>)

sorted by (term, doc_id) inside each partition file.

Why THIS shape at 100 TB:

* **Doc-hash partitioning** puts ALL of a document's term rows in one
  file, so the per-candidate phrase/window check is file-local — no
  shuffle joins positions back together at query time.
* **(term, doc_id) sort within a partition** gives parquet row-group
  min/max pruning on ``term``: a phrase query reads only the row groups
  covering its terms (~sum df(term)/P rows per partition), never the
  whole store.
* **Query-time verify is candidate-only**: the conjunctive AND set is
  broadcast once (sorted uint64 ids, the phrase.py pattern) and each
  partition task reads its term-pruned rows, filters to candidates, and
  checks positions locally — work proportional to candidates, not
  corpus.

The build is ONE ``map_batches`` tokenize pass + ONE exchange
(``groupby(part).map_groups`` sort) — the same single-exchange bucketed
shape as the spill stage.  The store records the corpus size it was
built from; a store that is stale relative to the index's current
CorpusStats (e.g. after an incremental append without a positions
rebuild) is never silently trusted — ``positions="auto"`` falls back to
the corpus-verify path and ``positions="index"`` raises.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.tokenize import tokenize_batch

_MIX = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci hashing multiplier


def _doc_part(doc_ids: np.ndarray, num_partitions: int) -> np.ndarray:
    """Deterministic doc -> partition assignment (multiplicative hash so
    sequential ids spread uniformly)."""
    with np.errstate(over="ignore"):
        mixed = doc_ids.astype(np.uint64) * _MIX
    return (mixed % np.uint64(num_partitions)).astype(np.int64)


def _meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, "positions", "meta.json")


def positions_meta(index_dir: str) -> dict | None:
    """The positions store's metadata, or None if no store exists."""
    p = _meta_path(index_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _explode_positions(num_partitions: int):
    """Batch UDF: (doc_id, text) -> (part, doc_id, term, positions)."""

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy().astype(np.uint64)
        toks, _ = tokenize_batch(batch["text"].to_pylist())
        parts = _doc_part(doc_ids, num_partitions)
        out_p: list[int] = []
        out_d: list[int] = []
        out_t: list[str] = []
        out_pos: list[list[int]] = []
        for i, tk in enumerate(toks):
            pos_by_term: dict[str, list[int]] = {}
            for p, t in enumerate(tk):
                pos_by_term.setdefault(t, []).append(p)
            out_p.extend([int(parts[i])] * len(pos_by_term))
            out_d.extend([int(doc_ids[i])] * len(pos_by_term))
            out_t.extend(pos_by_term.keys())
            out_pos.extend(pos_by_term.values())
        return pa.table(
            {
                "part": pa.array(out_p, type=pa.int64()),
                "doc_id": pa.array(
                    np.array(out_d, dtype=np.uint64), type=pa.uint64()
                ),
                "term": pa.array(out_t, type=pa.string()),
                "positions": pa.array(out_pos, type=pa.list_(pa.int32())),
            }
        )

    return explode


def build_positions(
    index_dir: str,
    docs_ds,
    cfg: PipelineConfig | None = None,
    num_partitions: int | None = None,
) -> dict:
    """Build the positions store for ``index_dir`` from the SAME
    prepared documents dataset the index was built from.  One tokenize
    pass, one exchange, atomic commit (tmp dir + rename).  Returns the
    committed metadata."""
    import pyarrow.parquet as pq

    from mini_ivf_ray.state.stats import CorpusStats

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    P = num_partitions if num_partitions is not None else cfg.num_partitions
    stats = CorpusStats.load(index_dir)

    final_dir = os.path.join(index_dir, "positions")
    tmp_dir = final_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir)

    exploded = docs_ds.map_batches(
        _explode_positions(P), batch_format="pyarrow"
    )

    def write_part(group: pa.Table) -> pa.Table:
        part = int(group["part"][0].as_py())
        tbl = group.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        tbl = tbl.drop_columns(["part"])
        d = os.path.join(tmp_dir, f"part={part}")
        os.makedirs(d, exist_ok=True)
        # row groups sized so term min/max pruning has granularity
        pq.write_table(
            tbl, os.path.join(d, "positions.parquet"), row_group_size=16384
        )
        return pa.table(
            {
                "part": pa.array([part], type=pa.int64()),
                "n_rows": pa.array([tbl.num_rows], type=pa.int64()),
            }
        )

    written = (
        exploded.groupby("part")
        .map_groups(write_part, batch_format="pyarrow")
        .to_pandas()
    )
    meta = {
        "num_partitions": P,
        "parts_written": sorted(int(p) for p in written["part"]),
        "n_rows": int(written["n_rows"].sum()),
        "built_from_n_docs": int(stats.n_docs),
    }
    with open(os.path.join(tmp_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    shutil.rmtree(final_dir, ignore_errors=True)
    os.replace(tmp_dir, final_dir)
    return meta


def append_positions(
    index_dir: str,
    docs_ds,
    cfg: PipelineConfig | None = None,
) -> dict:
    """Incrementally extend the positions store with an increment's
    documents — the positions-side mirror of ``append_index``'s
    incremental mode: the increment is exploded and each doc-hash
    partition gains a new ``positions_inc<k>.parquet`` file (existing
    files untouched; cost ∝ increment).  The verifier reads every file
    of a partition, so per-file (term, doc_id) sort — and therefore
    row-group term pruning — is preserved.  Call AFTER the matching
    ``append_index`` commit: freshness is re-derived from the index's
    CURRENT CorpusStats, so a positions append that doesn't bring the
    store up to the committed corpus size leaves it (correctly) stale."""
    import glob as globmod

    import pyarrow.parquet as pq

    from mini_ivf_ray.state.stats import CorpusStats

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    meta = positions_meta(index_dir)
    if meta is None:
        raise FileNotFoundError(
            f"append_positions: no positions store under {index_dir} "
            "(build_positions first)"
        )
    P = int(meta["num_partitions"])
    pos_dir = os.path.join(index_dir, "positions")
    exploded = docs_ds.map_batches(
        _explode_positions(P), batch_format="pyarrow"
    )

    def write_inc(group: pa.Table) -> pa.Table:
        part = int(group["part"][0].as_py())
        tbl = group.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        tbl = tbl.drop_columns(["part"])
        d = os.path.join(pos_dir, f"part={part}")
        os.makedirs(d, exist_ok=True)
        k = len(globmod.glob(os.path.join(d, "positions_inc*.parquet")))
        final = os.path.join(d, f"positions_inc{k:05d}.parquet")
        tmp = final + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=16384)
        os.replace(tmp, final)  # atomic per-file commit
        return pa.table(
            {
                "part": pa.array([part], type=pa.int64()),
                "n_rows": pa.array([tbl.num_rows], type=pa.int64()),
            }
        )

    written = (
        exploded.groupby("part")
        .map_groups(write_inc, batch_format="pyarrow")
        .to_pandas()
    )
    stats = CorpusStats.load(index_dir)
    new_meta = dict(
        meta,
        n_rows=int(meta["n_rows"]) + int(written["n_rows"].sum()),
        built_from_n_docs=int(stats.n_docs),
        increments=int(meta.get("increments", 0)) + 1,
    )
    tmp = _meta_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(new_meta, f)
    os.replace(tmp, _meta_path(index_dir))
    return new_meta


def positions_fresh(index_dir: str) -> bool:
    """True iff a positions store exists AND was built from the index's
    current corpus size (stale stores are never silently trusted)."""
    from mini_ivf_ray.state.stats import CorpusStats

    meta = positions_meta(index_dir)
    if meta is None:
        return False
    return int(meta["built_from_n_docs"]) == int(
        CorpusStats.load(index_dir).n_docs
    )


class _TermVectorReader:
    """Partition-task stage: each input row is one positions partition
    file; the task reads its doc-filtered rows and emits the per-doc
    term vector (doc_id, term, tf, first_pos).  Doc-hash partitioning
    guarantees every doc's term rows are file-local, and a doc's rows
    live entirely within one epoch's file — so per-file emission is
    complete and no cross-file merge is needed."""

    def __init__(self, wanted_ref):
        import ray

        self.wanted = (
            ray.get(wanted_ref)
            if isinstance(wanted_ref, ray.ObjectRef)
            else wanted_ref
        )  # sorted uint64 doc ids

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        # typed expression: doc ids are uint64 and may exceed int64 —
        # a plain python-list filter would overflow arrow's inference
        flt = pc.field("doc_id").isin(pa.array(self.wanted, type=pa.uint64()))
        out_d: list[int] = []
        out_t: list[str] = []
        out_tf: list[int] = []
        out_fp: list[int] = []
        for path in batch["path"].to_pylist():
            tbl = pq.read_table(
                path,
                columns=["doc_id", "term", "positions"],
                filters=flt,
            )
            if tbl.num_rows == 0:
                continue
            doc_ids = tbl["doc_id"].to_numpy().astype(np.uint64)
            la = tbl["positions"].combine_chunks()
            offs = la.offsets.to_numpy()
            vals = la.values.to_numpy()
            # positions are recorded in token-stream order, so the
            # first element of each list is the minimum
            out_d.extend(doc_ids.tolist())
            out_t.extend(tbl["term"].to_pylist())
            out_tf.extend((offs[1:] - offs[:-1]).tolist())
            out_fp.extend(vals[offs[:-1]].tolist())
        return pa.table(
            {
                "doc_id": pa.array(
                    np.array(out_d, dtype=np.uint64), type=pa.uint64()
                ),
                "term": pa.array(out_t, type=pa.string()),
                "tf": pa.array(out_tf, type=pa.int64()),
                "first_pos": pa.array(out_fp, type=pa.int64()),
            }
        )


def term_vectors(
    index_dir: str,
    doc_ids,
    cfg: PipelineConfig | None = None,
    strict: bool = True,
):
    """Per-document term vectors (the Lucene/Elasticsearch
    ``termvectors`` API): (doc_id, term, tf, first_pos) for every term
    of every requested document, served from the positions store ONLY —
    no document text is read.

    Partition-selective: requested docs are hashed to their home
    partitions and only those partitions' files are read (epoch files
    included), each with a doc-id row filter — work proportional to
    the request, never the corpus.  ``strict`` (default) raises on a
    stale store, mirroring the ``positions="index"`` freshness rule;
    docs absent from the store yield no rows.  Returns a
    ``ray.data.Dataset``."""
    import glob as globmod

    import ray
    import ray.data

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    meta = positions_meta(index_dir)
    if meta is None:
        raise FileNotFoundError(f"no positions store under {index_dir}")
    if strict and not positions_fresh(index_dir):
        raise RuntimeError(
            f"positions store under {index_dir} is stale relative to the "
            "index's current corpus; rebuild or append_positions first"
        )
    wanted = np.unique(np.asarray(doc_ids, dtype=np.uint64))
    parts = np.unique(_doc_part(wanted, int(meta["num_partitions"])))
    pos_dir = os.path.join(index_dir, "positions")
    files = sorted(
        f
        for p in parts.tolist()
        for f in globmod.glob(
            os.path.join(pos_dir, f"part={p}", "positions*.parquet")
        )
    )
    if not files:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.uint64()),
                    "term": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64()),
                    "first_pos": pa.array([], type=pa.int64()),
                }
            )
        )
    wanted_ref = ray.put(wanted)
    return ray.data.from_items([{"path": f} for f in files]).map_batches(
        _TermVectorReader,
        fn_constructor_args=(wanted_ref,),
        batch_format="pyarrow",
        batch_size=1,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )


def phrase_match_positions(pos_lists: list[np.ndarray]) -> bool:
    """Contiguity check over per-token position arrays (in phrase
    order): positions of token i+1 must contain some p+1 for a
    surviving p of token i — the classic positional-intersection
    phrase algorithm."""
    cur = pos_lists[0]
    for nxt in pos_lists[1:]:
        if not cur.size:
            return False
        step = cur + np.int32(1)
        # advance the anchor to the CURRENT token's matched positions
        # (keeping the first token's positions would test token i at a
        # fixed +1 offset instead of +i)
        cur = step[np.isin(step, nxt)]
    return bool(cur.size)


def cover_window_positions(pos_lists: list[np.ndarray], w: int) -> bool:
    """Minimal-cover-window test over per-distinct-term position
    arrays: True iff some window of <= w consecutive token positions
    contains >= 1 occurrence of EVERY term (identical semantics to
    phrase.within_window, evaluated on stored positions)."""
    k = len(pos_lists)
    if k == 0 or w <= 0:
        return False
    if k == 1:
        return pos_lists[0].size > 0
    if any(not p.size for p in pos_lists):
        return False
    pos = np.concatenate(pos_lists)
    lab = np.concatenate(
        [np.full(p.size, i, dtype=np.int32) for i, p in enumerate(pos_lists)]
    )
    order = np.argsort(pos, kind="stable")
    pos, lab = pos[order], lab[order]
    cnt = np.zeros(k, dtype=np.int64)
    covered, lo = 0, 0
    for hi in range(pos.size):
        t = lab[hi]
        cnt[t] += 1
        if cnt[t] == 1:
            covered += 1
        while covered == k:
            if int(pos[hi]) - int(pos[lo]) + 1 <= w:
                return True
            tl = lab[lo]
            cnt[tl] -= 1
            if cnt[tl] == 0:
                covered -= 1
            lo += 1
    return False


def ordered_window_positions(pos_lists: list[np.ndarray], w: int) -> bool:
    """Ordered-window test (Lucene SpanNearQuery inOrder=true): True
    iff there exist positions p1 < p2 < ... < pk, pi drawn from the
    i-th list (query-token order, duplicates allowed), with
    pk - p1 + 1 <= w.  For each start p1 the greedy chain — smallest
    pi+1 strictly greater than pi — minimizes pk, so checking the
    greedy chain per start is exact."""
    k = len(pos_lists)
    if k == 0 or w <= 0:
        return False
    if any(not p.size for p in pos_lists):
        return False
    if k == 1:
        return True
    for p1 in pos_lists[0].tolist():
        p = p1
        dead = False
        for nxt in pos_lists[1:]:
            j = int(np.searchsorted(nxt, p, side="right"))
            if j >= nxt.size:
                dead = True
                break
            p = int(nxt[j])
        if dead:
            # no successor exists for this p — none exists for any
            # LARGER start either (lists are sorted): stop
            return False
        if p - p1 + 1 <= w:
            return True
    return False


def containing_span_positions(
    big_lists: list[np.ndarray], little: np.ndarray, w: int
) -> bool:
    """SpanContaining test (Lucene SpanContainingQuery with an
    in-order SpanNear big and a term little): True iff there exist
    big positions p1 < ... < pk (pi from the i-th big list,
    pk - p1 + 1 <= w) and a little position l with p1 <= l <= pk.

    Exactness: for a start p1 the greedy chain minimizes the end
    e_min, and every last-term occurrence e in [e_min, p1 + w - 1] is
    an achievable end (the greedy chain's intermediates stay strictly
    below e_min <= e), so achievable ends for p1 are exactly the last
    list's occurrences in that range — the containment test per start
    reduces to: does a little position fall in [p1, e_max]?  A dead
    greedy chain stays dead for every later start (sorted lists), so
    the scan stops there, mirroring ordered_window_positions."""
    k = len(big_lists)
    if k < 2:
        raise ValueError(f"big span needs >= 2 terms, got {k}")
    if w <= 0:
        raise ValueError(f"window must be >= 1, got {w}")
    if not little.size or any(not p.size for p in big_lists):
        return False
    last = big_lists[-1]
    for p1 in big_lists[0].tolist():
        p = p1
        dead = False
        for nxt in big_lists[1:]:
            j = int(np.searchsorted(nxt, p, side="right"))
            if j >= nxt.size:
                dead = True
                break
            p = int(nxt[j])
        if dead:
            return False
        if p - p1 + 1 <= w:
            hi = int(np.searchsorted(last, p1 + w - 1, side="right")) - 1
            e_max = int(last[hi])  # >= p: p itself is such an occurrence
            li = int(np.searchsorted(little, p1, side="left"))
            if li < little.size and int(little[li]) <= e_max:
                return True
    return False


def span_not_survives(inc: np.ndarray, exc: np.ndarray, w: int) -> bool:
    """SpanNot (Lucene SpanNotQuery with symmetric pre/post slop):
    does ANY include-term occurrence have NO exclude-term occurrence
    within ``w`` token positions (|p_inc - p_exc| <= w excludes)?
    Both arrays sorted ascending; an absent exclude term (empty
    ``exc``) leaves every include occurrence standing.  Vectorized:
    one searchsorted + two neighbor gathers per doc."""
    if inc.size == 0:
        return False
    if exc.size == 0:
        return True
    inc64 = inc.astype(np.int64, copy=False)
    exc64 = exc.astype(np.int64, copy=False)
    idx = np.searchsorted(exc64, inc64)
    big = np.int64(np.iinfo(np.int64).max // 2)
    left = np.where(idx > 0, inc64 - exc64[np.maximum(idx - 1, 0)], big)
    right = np.where(
        idx < exc64.size, exc64[np.minimum(idx, exc64.size - 1)] - inc64, big
    )
    return bool((np.minimum(left, right) > w).any())


class _IndexPosVerifier:
    """Partition-task verify stage: each input row is one positions
    partition file; the task reads its term-pruned rows, filters to the
    broadcast candidate sets, and runs the per-doc positional check —
    emitting (query_id, doc_id) hit rows.  Work per task is
    candidate-proportional; doc-hash partitioning guarantees every
    doc's term rows are file-local."""

    def __init__(self, cand_ref, items, mode: str):
        import ray

        self.cand = ray.get(cand_ref)  # {qid: sorted uint64 ids}
        self.items = items  # phrase: (qid, tokens); prox: (qid, terms, w)
        self.mode = mode
        terms: set[str] = set()
        for it in items:
            terms.update(it[1])
            if mode == "phrase_prefix":
                # it[2] is the capped expansion list — its position
                # rows feed the final phrase slot
                terms.update(it[2])
        self.all_terms = sorted(terms)
        union = [v for v in self.cand.values() if v.size]
        self.union_cand = (
            np.unique(np.concatenate(union))
            if union
            else np.empty(0, dtype=np.uint64)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out_q: list[int] = []
        out_d: list[int] = []
        for path in batch["path"].to_pylist():
            tbl = pq.read_table(
                path,
                columns=["doc_id", "term", "positions"],
                filters=[("term", "in", self.all_terms)],
            )
            if tbl.num_rows == 0 or not self.union_cand.size:
                continue
            doc_ids = tbl["doc_id"].to_numpy().astype(np.uint64)
            keep = np.isin(doc_ids, self.union_cand)
            if not keep.any():
                continue
            rows = np.flatnonzero(keep)
            terms = tbl["term"].take(pa.array(rows)).to_pylist()
            la = tbl["positions"].combine_chunks()
            offs = la.offsets.to_numpy()
            vals = la.values.to_numpy()
            lut: dict[tuple[int, str], np.ndarray] = {}
            docs_here: set[int] = set()
            for j, i in enumerate(rows.tolist()):
                d = int(doc_ids[i])
                lut[(d, terms[j])] = vals[offs[i] : offs[i + 1]]
                docs_here.add(d)
            here = np.fromiter(
                docs_here, dtype=np.uint64, count=len(docs_here)
            )
            for it in self.items:
                qid = it[0]
                ids = self.cand.get(qid)
                if ids is None or not ids.size:
                    continue
                cand_local = ids[np.isin(ids, here)]
                for d in cand_local.tolist():
                    pls = [lut.get((int(d), t)) for t in it[1]]
                    if self.mode == "phrase_prefix":
                        # fixed chain + the UNION of the doc's
                        # expansion position lists as the final slot
                        if any(p is None for p in pls):
                            continue
                        eps = [
                            lut[(int(d), e)]
                            for e in it[2]
                            if (int(d), e) in lut
                        ]
                        if not eps:
                            continue
                        union = (
                            eps[0]
                            if len(eps) == 1
                            else np.unique(np.concatenate(eps))
                        )
                        if phrase_match_positions(pls + [union]):
                            out_q.append(qid)
                            out_d.append(int(d))
                        continue
                    if self.mode == "not":
                        # SpanNot: candidates come from the include
                        # term's postings so pls[0] exists; a MISSING
                        # exclude term means nothing excludes (empty)
                        if pls[0] is None:
                            continue
                        exc = (
                            pls[1]
                            if len(pls) > 1 and pls[1] is not None
                            else np.empty(0, dtype=np.int64)
                        )
                        if span_not_survives(pls[0], exc, it[2]):
                            out_q.append(qid)
                            out_d.append(int(d))
                        continue
                    if self.mode == "multi_phrase":
                        # it[2] = slots: per slot the UNION of the
                        # doc's alternative position lists, then the
                        # plain phrase positional intersection (the
                        # phrase_prefix final-slot trick, every slot)
                        slot_pls = []
                        ok = True
                        for slot in it[2]:
                            lists = [
                                lut[(int(d), t)]
                                for t in slot
                                if (int(d), t) in lut
                            ]
                            if not lists:
                                ok = False
                                break
                            slot_pls.append(
                                lists[0]
                                if len(lists) == 1
                                else np.unique(np.concatenate(lists))
                            )
                        if ok and phrase_match_positions(slot_pls):
                            out_q.append(qid)
                            out_d.append(int(d))
                        continue
                    if any(p is None for p in pls):
                        continue
                    if self.mode == "phrase":
                        ok = phrase_match_positions(pls)
                    elif self.mode == "containing":
                        # it[1] = big terms + [little]: an ordered big
                        # window must contain a little occurrence
                        ok = containing_span_positions(
                            pls[:-1], pls[-1], it[2]
                        )
                    elif self.mode == "ordered":
                        ok = ordered_window_positions(pls, it[2])
                    elif self.mode == "first":
                        # SpanFirst: the term's FIRST occurrence lands
                        # inside the opening window (positions are
                        # stored token-ascending, so [0] is the min)
                        ok = int(pls[0][0]) < it[2]
                    else:
                        ok = cover_window_positions(pls, it[2])
                    if ok:
                        out_q.append(qid)
                        out_d.append(int(d))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "doc_id": pa.array(
                    np.array(out_d, dtype=np.uint64), type=pa.uint64()
                ),
            }
        )


def positional_hits(
    index_dir: str,
    cand: dict[int, np.ndarray],
    items: list,
    mode: str,
    cfg: PipelineConfig,
) -> pd.DataFrame:
    """(query_id, doc_id) rows verified from the positions store only.
    ``items``: (qid, token-list) for ``mode="phrase"``, (qid,
    distinct-term-list, window) for ``mode="prox"``."""
    import ray
    import ray.data

    meta = positions_meta(index_dir)
    if meta is None:
        raise FileNotFoundError(f"no positions store under {index_dir}")
    import glob as globmod

    pos_dir = os.path.join(index_dir, "positions")
    # base file + any positions_inc<k>.parquet epochs (append_positions);
    # a doc's rows live entirely within its epoch's file, so per-FILE
    # processing still sees every term of every doc it covers
    files = sorted(
        f
        for d in os.listdir(pos_dir)
        if d.startswith("part=")
        for f in globmod.glob(os.path.join(pos_dir, d, "positions*.parquet"))
    )
    if not files:
        return pd.DataFrame({"query_id": [], "doc_id": []})
    cand_ref = ray.put({q: cand[q] for q, *_ in items})
    hits = (
        ray.data.from_items([{"path": f} for f in files])
        .map_batches(
            _IndexPosVerifier,
            fn_constructor_args=(cand_ref, items, mode),
            batch_format="pyarrow",
            batch_size=1,
            concurrency=(1, cfg.query_concurrency),
            num_cpus=1,
        )
        .to_pandas()
    )
    return hits


def positions_epochs(index_dir: str) -> int:
    """Maximum number of positions files in any partition: 1 for a
    fresh or compacted store, 1 + k after k ``append_positions``
    increments touched that partition — the positional-query cost
    driver (every epoch file is opened and scanned per verify pass)."""
    import glob as globmod

    pos_dir = os.path.join(index_dir, "positions")
    if not os.path.isdir(pos_dir):
        return 0
    return max(
        (
            len(globmod.glob(os.path.join(pos_dir, d, "positions*.parquet")))
            for d in os.listdir(pos_dir)
            if d.startswith("part=")
        ),
        default=0,
    )


def compact_positions(index_dir: str) -> dict:
    """Merge every partition's epoch files (base + ``positions_inc*``)
    back into ONE (term, doc_id)-sorted ``positions.parquet`` — the
    positions-side mirror of ``maintenance.compact_index``'s file
    hygiene.  Partitions merge in parallel (one Ray task each — raw
    tasks are the right tool for per-partition file rewrites); the
    commit is the same whole-store atomic protocol as
    ``build_positions`` (full ``.ctmp`` directory + replace), so a
    crash mid-compaction leaves either the old multi-epoch store or the
    new single-epoch one, never a half-merged hybrid that a glob-based
    reader would double-count.  Row content is unchanged (each doc's
    rows live in exactly one epoch file), so freshness carries over
    verbatim.  No-op when no partition has more than one file."""
    import glob as globmod

    import pyarrow.parquet as pq
    import ray

    meta = positions_meta(index_dir)
    if meta is None:
        raise FileNotFoundError(
            f"compact_positions: no positions store under {index_dir}"
        )
    pos_dir = os.path.join(index_dir, "positions")
    parts = {
        int(d.split("=", 1)[1]): sorted(
            globmod.glob(os.path.join(pos_dir, d, "positions*.parquet"))
        )
        for d in os.listdir(pos_dir)
        if d.startswith("part=")
    }
    epochs = max((len(v) for v in parts.values()), default=0)
    if epochs <= 1:
        return {"compacted": False, "epochs_before": epochs, "meta": meta}

    tmp_dir = pos_dir + ".ctmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir)

    @ray.remote(num_cpus=1)
    def merge_part(part: int, files: list[str]) -> int:
        tbl = pa.concat_tables([pq.read_table(f) for f in files])
        tbl = tbl.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        d = os.path.join(tmp_dir, f"part={part}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            tbl, os.path.join(d, "positions.parquet"), row_group_size=16384
        )
        return tbl.num_rows

    n_rows = ray.get(
        [merge_part.remote(p, fs) for p, fs in sorted(parts.items()) if fs]
    )
    new_meta = dict(
        meta,
        n_rows=int(sum(n_rows)),
        parts_written=sorted(p for p, fs in parts.items() if fs),
        compactions=int(meta.get("compactions", 0)) + 1,
    )
    with open(os.path.join(tmp_dir, "meta.json"), "w") as f:
        json.dump(new_meta, f)
    shutil.rmtree(pos_dir, ignore_errors=True)
    os.replace(tmp_dir, pos_dir)
    return {"compacted": True, "epochs_before": epochs, "meta": new_meta}

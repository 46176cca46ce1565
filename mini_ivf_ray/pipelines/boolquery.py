"""Boolean query retrieval: AND / OR / NOT expression trees over
posting lists, ranked by BM25 over the positive clauses.

The missing sibling of conjunctive retrieval (query.py mode="and"):
a web search engine's advanced-query surface is a boolean expression
evaluated as SET ALGEBRA over sorted posting-list id arrays —
intersections, unions and differences are single vectorized numpy
set ops, never per-doc loops.

Grammar (uppercase keywords, parenthesized, terms go through the
indexing tokenizer; a leaf that tokenizes to several tokens is an
implicit AND of them):

    expr   := and_expr (OR and_expr)*
    and_expr := unary (AND unary)*
    unary  := NOT unary | '(' expr ')' | TERM

NOT is handled with a lazy-complement algebra (De Morgan folding), so
negations never materialize the corpus universe:

    AND:  (A, +) & (B, +) -> intersect       (A, +) & (B, ~) -> A \\ B
          (A, ~) & (B, ~) -> (A | B, ~)
    OR:   (A, +) | (B, +) -> union           (A, +) | (B, ~) -> (B \\ A, ~)
          (A, ~) | (B, ~) -> (A & B, ~)

A query whose FINAL value is complemented (e.g. plain ``NOT x``) is
rejected — the match set would be corpus-sized; engines require at
least one positive clause (Lucene's pure-negation rule).

Ranking: Lucene's scoring rule — only POSITIVE clauses score (leaves
under an even number of NOTs); the BM25 sum over those terms is
accumulated with the same vectorized float64 pattern as every other
query path, then masked to the boolean match set, so scores are
bit-comparable with bm25_topk for the same terms.  Docs matching only
via structure (no positive term; impossible under this algebra but
guarded anyway) would score 0.

Serving shape: BooleanSearcher subclasses the BM25Searcher actor —
same once-per-actor index state, same zero-copy shared decode, same
``map_batches`` deployment — only the per-query evaluation differs.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import (
    BM25Searcher,
    _taat_accumulate,
    _topk_exact,
)

_TOKEN_RE = re.compile(r"\(|\)|[^\s()]+")


class BoolNode:
    __slots__ = ("op", "children", "tokens")

    def __init__(self, op: str, children=None, tokens=None):
        self.op = op  # "term" | "and" | "or" | "not"
        self.children = children or []
        self.tokens = tokens or []

    def __repr__(self):  # pragma: no cover - debug aid
        if self.op == "term":
            return "+".join(self.tokens)
        if self.op == "not":
            return f"NOT({self.children[0]!r})"
        return f"({f' {self.op.upper()} '.join(map(repr, self.children))})"


def parse_bool(expr: str) -> BoolNode:
    """Recursive-descent parse of the grammar above.  Raises
    ValueError on malformed input (imbalanced parens, dangling
    operators, empty leaves)."""
    toks = _TOKEN_RE.findall(expr)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_or() -> BoolNode:
        parts = [parse_and()]
        while peek() == "OR":
            take()
            parts.append(parse_and())
        return parts[0] if len(parts) == 1 else BoolNode("or", parts)

    def parse_and() -> BoolNode:
        parts = [parse_unary()]
        while peek() == "AND":
            take()
            parts.append(parse_unary())
        return parts[0] if len(parts) == 1 else BoolNode("and", parts)

    def parse_unary() -> BoolNode:
        t = peek()
        if t is None or t in (")", "AND", "OR"):
            raise ValueError(f"dangling operator near token {pos} in {expr!r}")
        if t == "NOT":
            take()
            return BoolNode("not", [parse_unary()])
        if t == "(":
            take()
            node = parse_or()
            if peek() != ")":
                raise ValueError(f"missing ')' in {expr!r}")
            take()
            return node
        word = take()
        tokens = tokenize(word)
        if not tokens:
            raise ValueError(f"leaf {word!r} tokenizes to nothing")
        return BoolNode("term", tokens=tokens)

    node = parse_or()
    if pos != len(toks):
        raise ValueError(f"trailing input {toks[pos:]!r} in {expr!r}")
    return node


def positive_terms(node: BoolNode, under_not: bool = False) -> set[str]:
    """Leaves under an even number of NOTs — the scoring clauses."""
    if node.op == "term":
        return set() if under_not else set(node.tokens)
    if node.op == "not":
        return positive_terms(node.children[0], not under_not)
    out: set[str] = set()
    for c in node.children:
        out |= positive_terms(c, under_not)
    return out


def all_terms(node: BoolNode) -> set[str]:
    if node.op == "term":
        return set(node.tokens)
    out: set[str] = set()
    for c in node.children:
        out |= all_terms(c)
    return out


_EMPTY = np.empty(0, dtype=np.uint64)


def _combine_and(a, ac, b, bc):
    if not ac and not bc:
        return np.intersect1d(a, b, assume_unique=True), False
    if not ac:  # A AND NOT B
        return np.setdiff1d(a, b, assume_unique=True), False
    if not bc:
        return np.setdiff1d(b, a, assume_unique=True), False
    return np.union1d(a, b), True  # NOT A AND NOT B = NOT(A OR B)


def _combine_or(a, ac, b, bc):
    if not ac and not bc:
        return np.union1d(a, b), False
    if not ac:  # A OR NOT B = NOT(B \\ A)
        return np.setdiff1d(b, a, assume_unique=True), True
    if not bc:
        return np.setdiff1d(a, b, assume_unique=True), True
    return np.intersect1d(a, b, assume_unique=True), True


def eval_bool(node: BoolNode, leaf_docs: dict[str, np.ndarray]) -> np.ndarray:
    """Evaluate the tree to the sorted uint64 match-id array.
    ``leaf_docs`` maps token -> sorted unique doc-id array (empty for
    OOV).  Raises ValueError if the final value is complemented."""
    ids, comp = _eval(node, leaf_docs)
    if comp:
        raise ValueError(
            "boolean query needs at least one positive clause "
            "(pure negation would match the whole corpus)"
        )
    return ids


def _eval(node: BoolNode, leaf_docs) -> tuple[np.ndarray, bool]:
    if node.op == "term":
        acc, comp = None, False
        for t in node.tokens:  # multi-token leaf: implicit AND
            d = leaf_docs.get(t, _EMPTY)
            acc = d if acc is None else np.intersect1d(acc, d, assume_unique=True)
        return acc, comp
    if node.op == "not":
        ids, comp = _eval(node.children[0], leaf_docs)
        return ids, not comp
    fold = _combine_and if node.op == "and" else _combine_or
    acc, comp = _eval(node.children[0], leaf_docs)
    for c in node.children[1:]:
        ids, cc = _eval(c, leaf_docs)
        acc, comp = fold(acc, comp, ids, cc)
    return acc, comp


class BooleanSearcher(BM25Searcher):
    """Actor-pool boolean retrieval: the ``text`` column carries a
    boolean expression; results are the match set ranked by the BM25
    sum over the positive clauses (top cfg.topk)."""

    def boolean_topk_for_expr(self, expr: str) -> list[tuple[int, float]]:
        node = parse_bool(expr)
        terms = sorted(all_terms(node))
        wanted = {
            t: self.stats.term_locations(t, self.cfg)
            for t in terms
            if self.stats.df.get(t, 0) > 0
        }
        fetched = self.reader.fetch_terms(wanted)
        leaf_docs: dict[str, np.ndarray] = {}
        scored = 0
        for t, b in fetched.items():
            if b is None:
                continue
            # all_postings() computes contributions too, so scoring
            # params must be pinned before the first decode
            b.set_scoring(
                bm25.idf(self.stats.df[b.term], self.stats.n_docs),
                self.stats.avgdl,
                self.cfg.k1,
                self.cfg.b,
            )
            d, _ = b.all_postings()
            scored += d.size
            leaf_docs[t] = d
        match = eval_bool(node, leaf_docs)
        if match.size == 0:
            self.counters["bool_queries"] = self.counters.get("bool_queries", 0) + 1
            self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
            return []
        pos = positive_terms(node)
        pos_blocks = [
            fetched[t] for t in sorted(pos) if fetched.get(t) is not None
        ]
        scores = np.zeros(match.size, dtype=np.float64)
        if pos_blocks:
            uniq, acc, _ = _taat_accumulate(pos_blocks)
            # map scored docs into the match set (both sorted unique)
            idx = np.searchsorted(match, uniq)
            idx_ok = idx < match.size
            hit = np.zeros(uniq.size, dtype=bool)
            hit[idx_ok] = match[idx[idx_ok]] == uniq[idx_ok]
            scores[idx[hit]] = acc[hit]
        self.counters["searched_cnt"] = (
            self.counters.get("searched_cnt", 0) + scored
        )
        self.counters["bool_queries"] = self.counters.get("bool_queries", 0) + 1
        self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
        return _topk_exact(match, scores, self.cfg.topk)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, expr in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for r, (d, s) in enumerate(self.boolean_topk_for_expr(expr)):
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


def boolean_search(index_dir: str, queries_ds, cfg=None, share: str | bool = "decoded"):
    """queries (query_id, text=boolean expr) -> (query_id, rank,
    doc_id, score), the same deployment shape as query.search()."""
    from mini_ivf_ray.config import PipelineConfig
    from mini_ivf_ray.pipelines.query import share_segments
    from mini_ivf_ray.sources.decoded import share_decoded_index

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    shared = decoded = None
    if share == "decoded":
        decoded = share_decoded_index(index_dir, cfg)
    elif share:
        shared = share_segments(index_dir, cfg.num_partitions)
    return queries_ds.map_batches(
        BooleanSearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )

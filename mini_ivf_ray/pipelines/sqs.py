"""simple_query_string: Elasticsearch's lenient end-user query
language (Lucene SimpleQueryParser), compiled onto this engine's
existing primitives:

    +        AND                      (binds tighter than |)
    |        OR
    -        NOT (prefix, single clause)
    "..."    phrase (positional verify, phrase.py machinery)
    term*    prefix (dictionary expansion, phrase_prefix's capped rule)
    ( )      grouping
    juxtaposition joins with ``default_operator`` ("or" — ES's
    default — joins at the | level; "and" at the + level), so
    precedence is always NOT > AND > OR (Lucene SimpleQueryParser).

Leniency, pinned (ES never raises on syntax): an unmatched quote
phrases the rest of the input; a dangling operator or empty group is
DROPPED from its parent; an unmatched ')' closes the nearest group.
The ONE hard error is Lucene's pure-negation rule (a query whose
final value is complemented matches the whole corpus) — inherited
from boolquery.eval semantics.

Leaf evaluation (all index-local):

  * term leaf   — postings ids; a leaf tokenizing to several tokens
    is an implicit AND of them (boolquery convention); an OOV token
    empties the leaf.
  * prefix leaf — the UNION of the FIRST ``max_expansions`` dictionary
    terms in term order (phraseprefix.expand_prefix — the capped
    semantics shared with match_phrase_prefix and its SQL replay).
  * phrase leaf — conjunctive candidates + ONE batched positional
    verify for ALL (query, phrase) leaves together: positions="index"
    reads the positions store (docs_ds may be None), "corpus"
    re-tokenizes candidates; composite (query, leaf) keys ride the
    positional_hits cand dict.

Boolean combine: boolquery's lazy-complement algebra (De Morgan
folding — negations never materialize the corpus universe), after the
Lucene must_not hoist: a '-' clause negates within its ENCLOSING
boolean (``a b -c`` under default OR is (a OR b) AND NOT c — Lucene
renders should/should/mustNot), so OR nodes rewrite their direct NOT
children into an enclosing AND before evaluation (_hoist_must_not).

Scoring, pinned: BM25 sum over the POSITIVE term- and phrase-leaves'
distinct tokens (a token under an even number of NOTs), masked to the
match set; prefix leaves gate matching but contribute NO score (the
phrase_prefix / autocomplete weight-to-zero rule — deterministic and
SQL-replayable instead of depending on which expansion matched).
Docs matching only through a prefix leaf score 0 and rank by doc id.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.boolquery import _combine_and, _combine_or
from mini_ivf_ray.pipelines.phraseprefix import expand_prefix
from mini_ivf_ray.pipelines.query import (
    BM25Searcher,
    _taat_accumulate,
    _topk_exact,
)

_EMPTY = np.empty(0, dtype=np.uint64)

_LEX = re.compile(
    r'"([^"]*)"'      # closed phrase
    r'|"(.*)$'        # unmatched quote: phrase to end of input
    r"|(\()|(\))|(\+)|(\|)|(-)"
    r'|([^\s()+|"-]+)'  # word (may end in *)
)


class Node:
    __slots__ = ("op", "children", "payload")

    def __init__(self, op, children=None, payload=None):
        self.op = op  # "and" | "or" | "not" | "term" | "phrase" | "prefix"
        self.children = children or []
        self.payload = payload


def _lex(text: str) -> list[tuple[str, str]]:
    out = []
    for m in _LEX.finditer(text):
        if m.group(1) is not None or m.group(2) is not None:
            out.append(("phrase", m.group(1) or m.group(2)))
        elif m.group(3):
            out.append(("lp", "("))
        elif m.group(4):
            out.append(("rp", ")"))
        elif m.group(5):
            out.append(("and", "+"))
        elif m.group(6):
            out.append(("or", "|"))
        elif m.group(7):
            out.append(("not", "-"))
        else:
            out.append(("word", m.group(8)))
    return out


def parse_sqs(text: str, default_operator: str = "or") -> Node | None:
    """Lenient parse -> Node tree (None for an effectively empty
    query).  Grammar + leniency rules in the module docstring."""
    if default_operator not in ("or", "and"):
        raise ValueError(
            f"default_operator must be 'or' or 'and', got {default_operator!r}"
        )
    toks = _lex(text)
    pos = 0

    def peek():
        return toks[pos][0] if pos < len(toks) else None

    def starts_unary(k):
        return k in ("word", "phrase", "lp", "not")

    def parse_or():
        nonlocal pos
        nodes = []
        first = parse_and()
        if first is not None:
            nodes.append(first)
        while True:
            k = peek()
            if k == "or":
                pos += 1
            elif (
                default_operator == "or"
                and k is not None
                and starts_unary(k)
            ):
                pass  # implicit juxtaposition at the OR level
            else:
                break
            nxt = parse_and()
            if nxt is not None:
                nodes.append(nxt)
        if not nodes:
            return None
        return nodes[0] if len(nodes) == 1 else Node("or", nodes)

    def parse_and():
        nonlocal pos
        nodes = []
        first = parse_unary()
        if first is not None:
            nodes.append(first)
        while True:
            k = peek()
            if k == "and":
                pos += 1
            elif (
                default_operator == "and"
                and k is not None
                and starts_unary(k)
            ):
                pass  # implicit juxtaposition at the AND level
            else:
                break
            nxt = parse_unary()
            if nxt is not None:
                nodes.append(nxt)
        if not nodes:
            return None
        return nodes[0] if len(nodes) == 1 else Node("and", nodes)

    def parse_unary():
        nonlocal pos
        k = peek()
        if k is None or k in ("rp", "or", "and"):
            return None  # dangling operator / empty slot: dropped
        if k == "not":
            pos += 1
            inner = parse_unary()
            return None if inner is None else Node("not", [inner])
        if k == "lp":
            pos += 1
            inner = parse_or()
            if peek() == "rp":
                pos += 1
            return inner  # empty group dropped (None)
        if k == "phrase":
            raw = toks[pos][1]
            pos += 1
            ptoks = tokenize(raw)
            if not ptoks:
                return None
            if len(ptoks) == 1:
                return Node("term", payload=ptoks)
            return Node("phrase", payload=ptoks)
        # word
        w = toks[pos][1]
        pos += 1
        if w.endswith("*") and len(w) > 1:
            stem = w[:-1].lower()
            stem_toks = tokenize(stem)
            if not stem_toks:
                return None
            return Node("prefix", payload=stem_toks[-1])
        wtoks = tokenize(w)
        if not wtoks:
            return None
        return Node("term", payload=wtoks)

    root = parse_or()
    # lenient: trailing unconsumed ')' etc. are ignored
    return _hoist_must_not(root)


def _hoist_must_not(node: Node | None) -> Node | None:
    """Lucene SimpleQueryParser's '-' semantics: a negated clause is a
    MUST_NOT of its enclosing boolean, not an OR-algebra complement —
    ``a b -c`` (default OR) means (a OR b) AND NOT c, because Lucene
    renders should(a) should(b) mustNot(c) with minimum_should_match=1.
    Rewrite every OR node's direct NOT children into an enclosing AND:
    or(p..., not(n)...) -> and(or(p...), not(n)...).  AND nodes already
    have the right semantics under the lazy-complement algebra."""
    if node is None:
        return None
    node.children = [_hoist_must_not(c) for c in node.children]
    if node.op == "or":
        neg = [c for c in node.children if c.op == "not"]
        if neg:
            pos = [c for c in node.children if c.op != "not"]
            if not pos:
                # all-negative OR: collapses to one complemented
                # clause; eval's pure-negation rule will reject it at
                # the top level exactly like Lucene's empty bool
                return (
                    neg[0]
                    if len(neg) == 1
                    else Node("and", neg)
                )
            inner = pos[0] if len(pos) == 1 else Node("or", pos)
            return Node("and", [inner] + neg)
    return node


def _collect(node: Node, kind: str, out: list, under_not: bool = False):
    if node.op == "not":
        _collect(node.children[0], kind, out, not under_not)
        return
    if node.op in ("and", "or"):
        for c in node.children:
            _collect(c, kind, out, under_not)
        return
    if kind == "leaves":
        out.append(node)
    elif kind == "positive_tokens" and not under_not:
        if node.op == "term":
            out.extend(node.payload)
        elif node.op == "phrase":
            out.extend(node.payload)
        # prefix: weight-0 by design
    elif kind == "all_tokens":
        if node.op in ("term", "phrase"):
            out.extend(node.payload)


def _eval(node: Node, leaf_sets: dict[int, np.ndarray]):
    if node.op == "not":
        ids, comp = _eval(node.children[0], leaf_sets)
        return ids, not comp
    if node.op in ("and", "or"):
        fold = _combine_and if node.op == "and" else _combine_or
        acc, comp = _eval(node.children[0], leaf_sets)
        for c in node.children[1:]:
            ids, cc = _eval(c, leaf_sets)
            acc, comp = fold(acc, comp, ids, cc)
        return acc, comp
    return leaf_sets.get(id(node), _EMPTY), False


def simple_query_string_topk(
    index_dir: str,
    docs_ds,
    queries: list[tuple[int, str]],
    cfg: PipelineConfig | None = None,
    default_operator: str = "or",
    max_expansions: int = 50,
    positions: str = "auto",
) -> pd.DataFrame:
    """(query_id, rank, doc_id, score) for each simple_query_string,
    ranked by the positive term/phrase tokens' BM25 sum (score desc,
    doc asc).  ``positions`` as in phrase_topk (phrase-leaf verify
    backend)."""
    parsed: list[tuple[int, Node | None]] = [
        (qid, parse_sqs(text, default_operator)) for qid, text in queries
    ]
    return _evaluate_trees(
        index_dir, docs_ds, parsed, cfg, positions, max_expansions
    )


def _evaluate_trees(
    index_dir: str,
    docs_ds,
    parsed: list[tuple[int, "Node | None"]],
    cfg: PipelineConfig | None = None,
    positions: str = "auto",
    max_expansions: int = 50,
) -> pd.DataFrame:
    """Shared evaluator for pre-built query trees (simple_query_string
    and the synonym-graph rewrite): leaf sets, one batched phrase
    verify, lazy-complement combine, positive-token scoring, top-k."""
    import ray

    from mini_ivf_ray.pipelines.phrase import (
        _PhraseVerifier,
        _resolve_positions_mode,
    )

    if max_expansions < 1:
        raise ValueError(f"max_expansions must be >= 1, got {max_expansions}")
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    use_index = _resolve_positions_mode(index_dir, positions)
    searcher = BM25Searcher(index_dir, cfg)
    dict_terms = sorted(searcher.stats.df)

    # fetch every referenced token (term/phrase leaves + prefix
    # expansions) once per query set
    needed: set[str] = set()
    expansions: dict[str, list[str]] = {}
    for _, root in parsed:
        if root is None:
            continue
        toks: list = []
        _collect(root, "all_tokens", toks)
        needed.update(toks)
        leaves: list = []
        _collect(root, "leaves", leaves)
        for lf in leaves:
            if lf.op == "prefix" and lf.payload not in expansions:
                exp = expand_prefix(dict_terms, lf.payload, max_expansions)
                expansions[lf.payload] = exp
                needed.update(exp)
    wanted = {
        t: searcher.stats.term_locations(t, cfg)
        for t in sorted(needed)
        if searcher.stats.df.get(t, 0) > 0
    }
    fetched = searcher.reader.fetch_terms(wanted)
    postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    blocks = {}
    for t in sorted(wanted):
        b = fetched.get(t)
        if b is None or not b.n_blocks:
            continue
        b.set_scoring(
            bm25.idf(searcher.stats.df[b.term], searcher.stats.n_docs),
            searcher.stats.avgdl,
            cfg.k1,
            cfg.b,
        )
        blocks[t] = b
        postings[t] = b.all_postings()

    def term_set(toks: list[str]) -> np.ndarray:
        acc = None
        for t in toks:
            d = postings.get(t, (_EMPTY,))[0]
            acc = d if acc is None else np.intersect1d(
                acc, d, assume_unique=True
            )
            if not acc.size:
                return _EMPTY
        return acc if acc is not None else _EMPTY

    # leaf candidate sets; phrase leaves defer to one batched verify
    leaf_sets: dict[int, np.ndarray] = {}
    phrase_items: list[tuple[int, list[str]]] = []
    phrase_cand: dict[int, np.ndarray] = {}
    phrase_key_of: dict[int, int] = {}  # composite key -> leaf id
    next_key = 0
    for _, root in parsed:
        if root is None:
            continue
        leaves: list = []
        _collect(root, "leaves", leaves)
        for lf in leaves:
            if lf.op == "term":
                leaf_sets[id(lf)] = term_set(lf.payload)
            elif lf.op == "prefix":
                parts = [
                    postings[t][0]
                    for t in expansions.get(lf.payload, [])
                    if t in postings
                ]
                leaf_sets[id(lf)] = (
                    parts[0]
                    if len(parts) == 1
                    else (
                        np.unique(np.concatenate(parts))
                        if parts
                        else _EMPTY
                    )
                )
            else:  # phrase
                cand = term_set(lf.payload)
                leaf_sets[id(lf)] = _EMPTY  # filled after verify
                if cand.size:
                    phrase_items.append((next_key, lf.payload))
                    phrase_cand[next_key] = cand
                    phrase_key_of[next_key] = id(lf)
                    next_key += 1

    if phrase_items:
        if use_index:
            from mini_ivf_ray.pipelines.positions import positional_hits

            hits = positional_hits(
                index_dir, phrase_cand, phrase_items, "phrase", cfg
            )
        else:
            cand_ref = ray.put(phrase_cand)
            hits = docs_ds.map_batches(
                _PhraseVerifier,
                fn_constructor_args=(cand_ref, phrase_items),
                batch_format="pyarrow",
                concurrency=(1, cfg.query_concurrency),
                num_cpus=1,
            ).to_pandas()
        for key, grp in hits.groupby("query_id"):
            leaf_sets[phrase_key_of[int(key)]] = np.sort(
                grp["doc_id"].to_numpy().astype(np.uint64)
            )

    out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
    for qid, root in parsed:
        if root is None:
            continue
        match, comp = _eval(root, leaf_sets)
        if comp:
            raise ValueError(
                f"query {qid}: pure negation matches the whole corpus "
                "(needs >= 1 positive clause)"
            )
        if not match.size:
            continue
        ptoks: list = []
        _collect(root, "positive_tokens", ptoks)
        pos_blocks = [blocks[t] for t in sorted(set(ptoks)) if t in blocks]
        scores = np.zeros(match.size, dtype=np.float64)
        if pos_blocks:
            uniq, acc, _ = _taat_accumulate(pos_blocks)
            idx = np.searchsorted(match, uniq)
            ok = idx < match.size
            hit = np.zeros(uniq.size, dtype=bool)
            hit[ok] = match[idx[ok]] == uniq[ok]
            scores[idx[hit]] = acc[hit]
        for r, (d, s) in enumerate(_topk_exact(match, scores, cfg.topk)):
            out["query_id"].append(qid)
            out["rank"].append(r)
            out["doc_id"].append(d)
            out["score"].append(s)
    df = pd.DataFrame(out)
    if len(df):
        df["doc_id"] = df["doc_id"].astype(np.uint64)
    return df


def synonym_graph_query(
    text: str, rules: dict[str, list[str]], default_operator: str = "and"
) -> Node | None:
    """ES ``synonym_graph`` token-filter semantics at query time,
    expressed as a rewrite onto this module's tree: each query token
    with a synonym rule becomes an OR of alternatives, where a
    MULTI-WORD alternative is a phrase node — exactly the token graph
    Lucene builds (the reason multi-word synonyms need the *graph*
    filter: "ml" => "machine learning" must match as a contiguous
    phrase, not a bag).  The rewritten query is

        AND/OR over slots of  (token | "alt one" | alt2 ...)

    joined by ``default_operator`` like any analyzed match query.
    Rule keys are single analyzed tokens; alternatives may be multi
    word.  Evaluation, scoring and leniency are inherited verbatim
    from simple_query_string_topk (positive tokens = the original
    token plus every alternative's tokens — ES scores expanded
    synonyms at full weight in the blended term-frequency model; the
    phrase-gating keeps multi-word alternatives contiguous)."""
    norm_rules: dict[str, list[list[str]]] = {}
    for k, alts in rules.items():
        kt = tokenize(k)
        if len(kt) != 1:
            raise ValueError(
                f"synonym rule key {k!r} must analyze to one token"
            )
        outs = []
        for a in alts:
            at = tokenize(a)
            if not at:
                raise ValueError(f"synonym alternative {a!r} is empty")
            outs.append(at)
        norm_rules[kt[0]] = outs
    slots: list[Node] = []
    for tok in tokenize(text):
        alts: list[Node] = [Node("term", payload=[tok])]
        for at in norm_rules.get(tok, []):
            if len(at) == 1:
                alts.append(Node("term", payload=at))
            else:
                alts.append(Node("phrase", payload=at))
        slots.append(alts[0] if len(alts) == 1 else Node("or", alts))
    if not slots:
        return None
    if len(slots) == 1:
        return slots[0]
    op = "and" if default_operator == "and" else "or"
    return Node(op, slots)


def synonym_graph_topk(
    index_dir: str,
    docs_ds,
    queries: list[tuple[int, str]],
    rules: dict[str, list[str]],
    cfg: PipelineConfig | None = None,
    default_operator: str = "and",
    positions: str = "auto",
) -> pd.DataFrame:
    """Match query under a multi-word synonym graph: rewrite each
    query with ``synonym_graph_query`` and evaluate through the
    simple_query_string machinery (same candidates / batched phrase
    verify / scoring / top-k)."""
    trees = [
        (qid, synonym_graph_query(text, rules, default_operator))
        for qid, text in queries
    ]
    return _evaluate_trees(index_dir, docs_ds, trees, cfg, positions)

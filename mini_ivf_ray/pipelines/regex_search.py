"""Index-accelerated regex search: required-literal prefilter from the
term index + candidate-only verify.

The classic trigram-index trick (R. Cox, "Regular Expression Matching
with a Trigram Index", 2012 — the public write-up of Google Code
Search) adapted to a TERM index: any document matching the pattern
must contain every whole token the pattern is guaranteed to emit, so
those tokens' posting lists (already built for BM25) give an exact
candidate SUPERSET, and the expensive regex engine runs only on
candidate documents.  Patterns that guarantee no whole-token literal
fall back to a full — still streaming — corpus scan.

Extraction is CONSERVATIVE, which is the correctness contract: a
token is required only when NO match of the pattern can avoid
containing it as a whole index term (tokens = maximal ``[a-z0-9]+``
runs of the lowercased text, functions/tokenize.py).  Key semantics:

* ``re.search`` matches SUBSTRINGS, so a literal run touching the
  pattern's start or end is unbounded on that side (``data web`` can
  match inside ``bigdata website``) — only runs bounded by guaranteed
  token breaks INSIDE the pattern (space, ``\\s``, ``\\W``, ``\\b``,
  ``^``/``$``/``\\A``/``\\Z``, punctuation literals) are whole tokens;
* anything that may consume a word character poisons adjacency:
  ``.``, ``\\w`` ``\\d`` ``\\D`` ``\\S``, character classes, hex/unicode
  escapes, backreferences;
* a quantifier (``?`` ``*`` ``{m,n}``) makes its element optional or
  variable — the element degrades to "may extend" (``datas?`` can
  match inside ``datas``; ``data[0-9]*`` inside ``data7``);
* ``+`` keeps a literal present but with unknown repeat count, so the
  run it ends is not a known term;
* any ``(``, ``)`` or ``|`` disables extraction entirely (a branch
  might avoid the literal).

Scale shape: candidate generation reads only the required terms'
posting lists (driver-side, index-sized not corpus-sized); the
verify stage broadcasts each pattern's sorted candidate id set once
(``ray.put``) and each corpus batch masks itself with one
``searchsorted`` before running the regex on survivors — the
expensive stage is candidate-proportional, not corpus-proportional.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_WORD_CHARS = set("abcdefghijklmnopqrstuvwxyz0123456789")
# escaped classes/escapes that may consume a word character
_EXT_ESCAPES = set("wdDS") | set("xuUN") | set("123456789")
# escaped elements guaranteed to be a token break (consume only
# non-word chars, or zero-width boundary assertions)
_BRK_ESCAPES = set("sWbAZ") | set("ntrfva0")


def _lex(pattern: str) -> list[tuple[str, str]] | None:
    """Pattern -> [('lit', ch) | ('ext', '') | ('brk', '') |
    ('quant', '') | ('plus', '')], or None when unanalyzable."""
    elems: list[tuple[str, str]] = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            if i + 1 >= len(pattern):
                return None
            nxt = pattern[i + 1]
            if nxt in _BRK_ESCAPES:
                elems.append(("brk", ""))
            elif nxt in _EXT_ESCAPES or nxt in _WORD_CHARS:
                elems.append(("ext", ""))  # conservative for unknowns
            else:
                elems.append(("brk", ""))  # escaped punctuation literal
            i += 2
        elif c == "[":
            j = i + 2 if i + 1 < len(pattern) and pattern[i + 1] == "]" else i + 1
            j = pattern.find("]", j)
            if j == -1:
                return None
            elems.append(("ext", ""))  # a class may hold word chars
            i = j + 1
        elif c == "{":
            j = pattern.find("}", i + 1)
            if j == -1:
                return None
            elems.append(("quant", ""))
            i = j + 1
        elif c in "?*":
            elems.append(("quant", ""))
            i += 1
        elif c == "+":
            elems.append(("plus", ""))
            i += 1
        elif c == ".":
            elems.append(("ext", ""))
            i += 1
        elif c in _WORD_CHARS:
            elems.append(("lit", c))
            i += 1
        else:  # space, punctuation, ^, $ — guaranteed token breaks
            elems.append(("brk", ""))
            i += 1
    return elems


def required_terms(pattern: str) -> list[str]:
    """Whole index terms every ``re.search`` match of ``pattern`` (on
    lowercased text) must contain.  Possibly empty — then the caller
    must full-scan.  Conservative by construction (module docstring)."""
    if any(c in pattern for c in "(|)"):
        return []
    elems = _lex(pattern)
    if elems is None:
        return []
    folded: list[tuple[str, str]] = []
    for kind, ch in elems:
        if kind == "quant":
            if folded:
                # optional/variable element: may be absent, may extend
                folded[-1] = ("ext", "")
            continue
        if kind == "plus":
            if folded:
                if folded[-1][0] == "lit":
                    folded[-1] = ("lit+", folded[-1][1])
                elif folded[-1][0] == "brk":
                    pass  # a repeated break is still a break
                else:
                    folded[-1] = ("ext", "")
            continue
        folded.append((kind, ch))
    out: set[str] = set()
    run: list[str] = []
    poisoned = True  # pattern start: unbounded on the left
    for kind, ch in folded:
        if kind == "lit":
            run.append(ch)
        elif kind == "lit+":
            run.append(ch)
            poisoned = True  # unknown repeat count ends the known term
        elif kind == "brk":
            if run and not poisoned:
                out.add("".join(run))
            run, poisoned = [], False
        else:  # ext
            run, poisoned = [], True
    # trailing run: unbounded on the right — never extractable
    return sorted(out)


class _RegexVerifier:
    """Actor-pool stage over the corpus: mask each batch to candidate
    docs (one searchsorted against the broadcast id set), then run the
    compiled pattern on the survivors only."""

    def __init__(self, specs_ref):
        import ray

        specs = (
            ray.get(specs_ref)
            if isinstance(specs_ref, ray.ObjectRef)
            else specs_ref
        )
        # [(query_id, compiled pattern, sorted cand ids | None)]
        self.specs = [(qid, re.compile(pat), cand) for qid, pat, cand in specs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        lowered: list[str] | None = None
        qids, dids = [], []
        for qid, rx, cand in self.specs:
            if cand is not None:
                if not cand.size:
                    continue
                idx = np.searchsorted(cand, doc_ids)
                np.minimum(idx, cand.size - 1, out=idx)
                rows = np.flatnonzero(cand[idx] == doc_ids)
            else:
                rows = np.arange(doc_ids.size)
            if not rows.size:
                continue
            if lowered is None:
                lowered = [t.lower() for t in batch["text"].to_pylist()]
            for r in rows:
                if rx.search(lowered[r]):
                    qids.append(qid)
                    dids.append(doc_ids[r])
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "doc_id": pa.array(
                    np.array(dids, dtype=np.uint64), type=pa.uint64()
                ),
            }
        )


def regex_search(
    index_dir: str,
    patterns: list[tuple[int, str]],
    docs_ds,
    cfg=None,
):
    """(query_id, pattern) over the corpus -> (query_id, doc_id) for
    every document whose lowercased text matches the pattern
    (``re.search`` semantics, identical to RE2 partial match for the
    ASCII-class patterns this engine registers).  Uses the BM25 term
    index to prefilter candidates via ``required_terms``; patterns
    yielding no required literal scan the full corpus."""
    import ray

    from mini_ivf_ray.config import PipelineConfig
    from mini_ivf_ray.pipelines.query import BM25Searcher

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    searcher = BM25Searcher(index_dir, cfg, shared_tables=None, decoded_refs=None)
    specs = []
    for qid, pat in patterns:
        terms = required_terms(pat)
        if terms:
            # conjunctive candidate set straight off the posting lists
            # (an OOV required term correctly yields zero candidates)
            docs, _ = searcher.conjunctive_matches_for_text(" ".join(terms))
            cand = np.asarray(docs, dtype=np.uint64)
        else:
            cand = None
        specs.append((qid, pat, cand))
    specs_ref = ray.put(specs)
    return docs_ds.map_batches(
        _RegexVerifier,
        fn_constructor_args=(specs_ref,),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )

"""Deterministic tokenizer (analog of the coarse assignment map M1/M2).

Pinned rule — must match the DuckDB oracle expression exactly:
    ``regexp_extract_all(lower(text), '[a-z0-9]+')``
i.e. unicode lowercase, then maximal runs of ASCII ``[a-z0-9]``.  Python
``str.lower()`` and DuckDB ``lower()`` agree on full-unicode simple
lowercasing; the token class itself is ASCII so RE2-vs-``re`` semantics
are identical.

The hot path is vectorized: one compiled regex applied per Arrow batch
via ``pc.extract_regex`` is unavailable for findall-semantics, so we use
a single C-speed ``re.findall`` per document over a pandas/NumPy string
array — no Python-level per-character work, and the stage parallelizes
across batches under Ray.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np

TOKEN_PATTERN = r"[a-z0-9]+"
TOKEN_RE = re.compile(TOKEN_PATTERN)

# The matching DuckDB expression, for oracle builders.
DUCKDB_TOKENS_EXPR = "regexp_extract_all(lower({col}), '[a-z0-9]+')"


def tokenize(text: str) -> list[str]:
    """All tokens of one document, in order."""
    return TOKEN_RE.findall(text.lower())


def term_freqs(text: str) -> Counter:
    """term -> tf for one document."""
    return Counter(tokenize(text))


def tokenize_batch(texts) -> tuple[list[list[str]], np.ndarray]:
    """Tokenize a column of texts.  Returns (per-doc token lists,
    per-doc length array int64)."""
    toks = [TOKEN_RE.findall(t.lower()) for t in texts]
    dls = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
    return toks, dls


def postings_arrays(texts, doc_ids: np.ndarray):
    """Explode a batch of documents into flat postings arrays.

    Reference analog: ``InsertIvf``'s per-row nearest-centroid assignment
    (index_ivfpq.cpp:99-105), intentionally widened to one row per
    *distinct term* per doc (SURVEY.md §2.2 M2).

    Returns dict of equal-length numpy arrays:
      term (object), doc_id (uint64), tf (int64), dl (int64)

    Batch-vectorized: the per-doc regex findall is the irreducible C
    core; everything after (per-(doc, term) tf counting, dl broadcast)
    is ONE factorize + ONE int64 unique over the whole batch instead of
    a Python Counter per document.  Rows come out sorted by
    (doc position, term code) — callers that need a specific order sort
    downstream (the spill lexsorts by (pid, term, doc) anyway)."""
    import pandas as pd

    tok_lists = [TOKEN_RE.findall(t.lower()) for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists))
    total = int(lens.sum())
    if total == 0:
        return {
            "term": np.empty(0, dtype=object),
            "doc_id": np.empty(0, dtype=np.uint64),
            "tf": np.empty(0, dtype=np.int64),
            "dl": np.empty(0, dtype=np.int64),
        }
    flat = np.empty(total, dtype=object)
    pos = 0
    for tl in tok_lists:
        flat[pos : pos + len(tl)] = tl
        pos += len(tl)
    didx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    codes, uniques = pd.factorize(flat)
    key = didx * len(uniques) + codes  # (doc, term) composite, int64-safe
    uk, counts = np.unique(key, return_counts=True)
    u_doc = uk // len(uniques)
    u_code = uk % len(uniques)
    return {
        "term": np.asarray(uniques, dtype=object)[u_code],
        "doc_id": np.asarray(doc_ids)[u_doc].astype(np.uint64),
        "tf": counts.astype(np.int64),
        "dl": lens[u_doc],
    }

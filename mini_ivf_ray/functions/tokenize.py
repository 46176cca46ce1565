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
    """
    terms_out: list[str] = []
    docs_out: list[np.ndarray] = []
    tfs_out: list[np.ndarray] = []
    dls_out: list[np.ndarray] = []
    for text, did in zip(texts, doc_ids):
        c = term_freqs(text)
        n = len(c)
        if n == 0:
            continue
        dl = sum(c.values())
        terms_out.extend(c.keys())
        docs_out.append(np.full(n, did, dtype=np.uint64))
        tfs_out.append(np.fromiter(c.values(), dtype=np.int64, count=n))
        dls_out.append(np.full(n, dl, dtype=np.int64))
    if not docs_out:
        return {
            "term": np.empty(0, dtype=object),
            "doc_id": np.empty(0, dtype=np.uint64),
            "tf": np.empty(0, dtype=np.int64),
            "dl": np.empty(0, dtype=np.int64),
        }
    return {
        "term": np.asarray(terms_out, dtype=object),
        "doc_id": np.concatenate(docs_out),
        "tf": np.concatenate(tfs_out),
        "dl": np.concatenate(dls_out),
    }

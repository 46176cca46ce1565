"""Fielded (BM25F-style) scoring via token replication.

BM25F (Robertson & Zaragoza 2009, §3.3 — the "simple BM25F" variant
with shared k1/b) scores a multi-field document by replacing tf and dl
with field-weighted sums:

    tf'(t, d) = sum_f w_f * tf_f(t, d)      dl'(d) = sum_f w_f * |d_f|

With INTEGER field weights this is exactly ordinary BM25 over a
corpus in which each field's token stream is repeated w_f times: both
tf' and dl' (and therefore avgdl') coincide, while df is untouched
(duplicating tokens inside a document never changes which documents
contain a term).  So field boosting reduces to ONE deterministic text
transform in front of the standard build pipeline — no new index
format, no scorer fork, and every downstream path (WAND/MaxScore
bounds, append, compaction) stays exact because it sees a plain
corpus.

The documents table has a single ``text`` column, so the "title" field
is derived deterministically: the first ``n_title`` tokens (a web
page's title/lede proxy).  ``boost_title_texts`` prepends that title
``boost - 1`` extra times, giving w_title = boost, w_body = 1.
"""

from __future__ import annotations

from mini_ivf_ray.functions.tokenize import tokenize_batch


def boost_title_texts(
    texts: list[str], n_title: int = 8, boost: int = 2
) -> list[str]:
    """Replicated-token-stream boost: title (first ``n_title`` tokens)
    prepended ``boost - 1`` extra times.  boost=1 is the identity."""
    if boost < 1:
        raise ValueError("boost must be >= 1")
    if boost == 1:
        return list(texts)
    toks, _ = tokenize_batch(texts)
    out = []
    for text, tk in zip(texts, toks):
        title = " ".join(tk[:n_title])
        prefix = (title + " ") * (boost - 1) if title else ""
        out.append(prefix + text)
    return out

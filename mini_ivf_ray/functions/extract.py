"""Deterministic HTML <-> text extraction (the per-row invariant).

BASELINE.json input_hint requires byte-identical extracted text per url
vs the reference extractor.  The reference repo has no HTML stage (its
input is raw vectors), so WE pin the canonical pair: ``wrap_html`` is the
page synthesizer's wrapper and ``extract_text`` is the one pinned,
pure-Python, dependency-free extractor; ``extract_text(wrap_html(t)) ==
t`` byte-identically for every unicode string ``t`` (golden + property
tested in tests/test_extract.py).

Extraction rule (deterministic, order-preserving):
  1. take the contents of every ``<p>...</p>`` element in document order,
  2. join with "\\n",
  3. HTML-unescape entities.
"""

from __future__ import annotations

import html as _html
import re

_P_RE = re.compile(rb"<p>(.*?)</p>", re.S)
_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.S)


def wrap_html(text: str, title: str = "") -> bytes:
    """Deterministic page wrapper used by the synthetic corpus: entity-
    escaped text inside one <p> per paragraph ("\\n"-separated)."""
    paras = text.split("\n")
    body = "".join(f"<p>{_html.escape(p, quote=False)}</p>" for p in paras)
    return (
        f"<html><head><title>{_html.escape(title, quote=False)}</title></head>"
        f"<body>{body}</body></html>"
    ).encode("utf-8")


def extract_text(html_bytes: bytes) -> str:
    """The pinned extractor.  Must never change once golden-tested:
    downstream docIDs, postings and scores all depend on its bytes."""
    parts = _P_RE.findall(html_bytes)
    return _html.unescape(b"\n".join(parts).decode("utf-8"))


def extract_title(html_bytes: bytes) -> str:
    m = _TITLE_RE.search(html_bytes)
    return _html.unescape(m.group(1).decode("utf-8")) if m else ""

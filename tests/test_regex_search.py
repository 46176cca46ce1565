"""Index-accelerated regex search (pipelines/regex_search.py).

The correctness contract is CONSERVATIVE extraction: for every pattern
p and every text t, ``re.search(p, t.lower())`` implies
``set(required_terms(p)) <= set(tokenize(t))``.  The battery pins the
adversarial cases (substring matching at pattern edges, quantified
literals, char classes); the hypothesis test fuzzes the implication
itself; the Ray test checks the full pipeline against a regex-only
full scan.
"""

import re

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.regex_search import regex_search, required_terms


def test_required_terms_battery():
    cases = {
        # substring semantics: edge runs are unbounded
        "data web": [],
        "data": [],
        # internal runs bounded by breaks are whole tokens
        "the data [a-z]+": ["data"],
        "x\\.data\\.y": ["data"],
        "\\bdata\\b": ["data"],
        "\\bkey value\\b.*\\btable\\b": ["key", "table", "value"],
        "\\bsort order\\b": ["order", "sort"],
        # anchors are boundaries
        "^data web$": ["data", "web"],
        # quantifiers poison their element and its run
        "a datas? b": [],
        "a data[0-9]* b": [],
        "a data+ b": [],
        "a da{2}ta b": [],
        # extending elements poison adjacency
        "a .data b": [],
        "a \\wdata b": [],
        "a [xy]data b": [],
        # but a break after the poison re-opens extraction
        "a .  data b": ["data"],
        # groups / alternation disable extraction entirely
        "\\bdata\\b (web|net)": [],
        # \s and \W and punctuation are breaks
        "x\\sdata\\sy": ["data"],
        "x,data;y": ["data"],
        # escaped punctuation/controls break, hex escapes extend
        "a\\tdata\\ny": ["data"],
        "a \\x64ata b": [],
        # malformed class: refuse
        "a [unclosed": [],
    }
    for pat, want in cases.items():
        assert required_terms(pat) == want, pat


_PIECES = st.sampled_from(
    [
        "data", "web", "a", " ", ".", "[a-z]", "[0-9]+", "\\b", "\\s",
        "\\w", "x", "7", "?", "*", ",", "\\.", "q+", "{1,2}", "^", "$",
    ]
)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(_PIECES, min_size=1, max_size=8),
    st.text(alphabet="adtwebq7 .x,", min_size=0, max_size=40),
)
def test_required_terms_conservative(pieces, text):
    pat = "".join(pieces)
    try:
        rx = re.compile(pat)
    except re.error:
        return
    req = required_terms(pat)
    if rx.search(text.lower()):
        toks = set(tokenize(text))
        assert set(req) <= toks, (pat, text, req)


def test_regex_search_matches_full_scan(tiny_index):
    idx, cfg, docs = tiny_index
    patterns = [
        (0, "\\bthe\\b [a-z]+ \\bdata\\b"),  # prefiltered
        (1, "w00[0-9]+ data"),  # no guaranteed literal -> full scan
        (2, "\\bzz9999qq\\b"),  # OOV required term -> zero candidates
        (3, "\\bdata\\b"),  # single-term prefilter
    ]
    ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    got = (
        regex_search(idx, patterns, ds, cfg)
        .to_pandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    rows = []
    for qid, pat in patterns:
        rx = re.compile(pat)
        for did, txt in zip(docs["doc_id"], docs["text"]):
            if rx.search(txt.lower()):
                rows.append((qid, np.uint64(did)))
    expect = (
        pd.DataFrame(rows, columns=["query_id", "doc_id"])
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"query_id": np.int64, "doc_id": np.uint64}),
        expect.astype({"query_id": np.int64, "doc_id": np.uint64}),
    )
    assert not (got["query_id"] == 2).any()
    assert (got["query_id"] == 3).any()  # 'data' occurs in the corpus

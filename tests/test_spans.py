"""Duplicated-span detection/removal: distributed pipeline vs a direct
single-process reference implementation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.spans import (
    dup_spans,
    duplicate_gram_positions,
    remove_duplicate_spans,
)


def _reference(docs: list[tuple[int, str]], w: int):
    """Keep-first duplicate w-gram positions, spans, cleaned texts —
    computed the obvious O(n) way with a dict."""
    seen: dict[tuple, tuple] = {}
    occurrences: dict[tuple, list] = {}
    for doc_id, text in sorted(docs):
        toks = tokenize(text)
        for p in range(len(toks) - w + 1):
            occurrences.setdefault(tuple(toks[p : p + w]), []).append((doc_id, p))
    dup = sorted(
        (d, p) for occ in occurrences.values() if len(occ) > 1 for d, p in sorted(occ)[1:]
    )
    spans = []
    by_doc: dict[int, list[int]] = {}
    for d, p in dup:
        by_doc.setdefault(d, []).append(p)
    for d, ps in sorted(by_doc.items()):
        ps = sorted(ps)
        start, last, n = ps[0], ps[0], 1
        for p in ps[1:]:
            if p - last <= w:
                last, n = p, n + 1
            else:
                spans.append((d, start, last + w, n))
                start, last, n = p, p, 1
        spans.append((d, start, last + w, n))
    cleaned = {}
    for doc_id, text in docs:
        toks = tokenize(text)
        cover = np.zeros(len(toks), dtype=bool)
        for d, p in dup:
            if d == doc_id:
                cover[p : p + w] = True
        cleaned[doc_id] = " ".join(t for t, c in zip(toks, cover) if not c)
    return dup, spans, cleaned


def _mkdocs():
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    return [
        (10, base + " lam mu nu xi"),
        (20, "prefix words here " + base + " suffix tail words"),
        (30, "totally different content with no overlap whatsoever at all"),
        (40, base + " lam mu nu xi"),  # exact duplicate of 10
        (50, "alpha beta gamma delta " * 3),  # self-repeating
        (60, "tiny doc"),  # shorter than w
    ]


def test_duplicate_positions_and_spans_match_reference():
    docs = _mkdocs()
    w = 4
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                "text": [t for _, t in docs],
            }
        )
    )
    ref_dup, ref_spans, ref_clean = _reference(docs, w)

    got_dup = duplicate_gram_positions(ds, w=w).to_pandas()
    got_dup = sorted(zip(got_dup["doc_id"], got_dup["pos"]))
    assert [(int(a), int(b)) for a, b in got_dup] == ref_dup

    got_spans = dup_spans(ds, w=w).to_pandas().sort_values(["doc_id", "span_start"])
    got = [tuple(int(x) for x in r) for r in got_spans.to_numpy()]
    assert got == ref_spans

    got_clean = remove_duplicate_spans(ds, w=w).to_pandas()
    assert dict(zip(got_clean["doc_id"], got_clean["text_clean"])) == ref_clean
    # every doc comes back, even short/untouched ones
    assert sorted(got_clean["doc_id"]) == sorted(d for d, _ in docs)


def test_no_duplicates_is_identity_modulo_whitespace():
    docs = [(1, "one two three four five"), (2, "six seven eight nine ten")]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                "text": [t for _, t in docs],
            }
        )
    )
    assert dup_spans(ds, w=3).to_pandas().empty
    out = remove_duplicate_spans(ds, w=3).to_pandas()
    assert dict(zip(out["doc_id"], out["text_clean"])) == dict(docs)


def test_fully_covered_doc_becomes_empty_string():
    docs = [(1, "a b c d"), (2, "a b c d")]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": ["a b c d", "a b c d"],
            }
        )
    )
    out = remove_duplicate_spans(ds, w=4).to_pandas()
    got = dict(zip(out["doc_id"], out["text_clean"]))
    assert got == {1: "a b c d", 2: ""}


def test_winnowing_guarantee_and_density():
    """Schleimer-2003 guarantee: any shared run of >= w+k-1 tokens
    yields >= 1 shared fingerprint; selection density stays well below
    1 fingerprint per gram."""
    import pyarrow as pa

    import ray.data
    from mini_ivf_ray.pipelines.spans import winnow_fingerprints

    rng = __import__("numpy").random.default_rng(13)
    words = [f"w{i}" for i in range(50)]
    shared = " ".join(rng.choice(words, size=12))  # 12 >= w + k - 1 = 8
    doc_a = " ".join(rng.choice(words, size=30)) + " " + shared
    doc_b = shared + " " + " ".join(rng.choice(words, size=30))
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": [doc_a, doc_b, "too short"],
        }
    )
    out = winnow_fingerprints(
        ray.data.from_arrow(docs), k=4, w=5
    ).to_pandas()
    fa = set(out[out.doc_id == 1]["fp"])
    fb = set(out[out.doc_id == 2]["fp"])
    assert fa & fb, "shared 12-token run must share a fingerprint"
    # doc 3 has < k tokens -> nothing emitted
    assert (out.doc_id == 3).sum() == 0
    # density bound: far fewer selections than grams (~2/(w+1))
    n_grams_a = len(doc_a.split()) - 3
    assert len(out[out.doc_id == 1]) <= n_grams_a * 0.7
    # blocking independence
    out2 = winnow_fingerprints(
        ray.data.from_arrow(docs).repartition(3), k=4, w=5
    ).to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(
        out.sort_values(["doc_id", "pos", "fp"]).reset_index(drop=True),
        out2.sort_values(["doc_id", "pos", "fp"]).reset_index(drop=True),
    )

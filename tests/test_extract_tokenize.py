"""Extractor byte-identity (golden + property) and tokenizer/duckdb parity.

The per-row invariant (BASELINE.json input_hint): byte-identical
extracted text per url.  Golden bytes are pinned — if wrap/extract ever
change, these fail and docIDs/postings would silently shift.
"""

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from mini_ivf_ray.functions.extract import extract_text, extract_title, wrap_html
from mini_ivf_ray.functions.tokenize import TOKEN_PATTERN, tokenize

GOLDEN = [
    ("hello world", b"<html><head><title></title></head><body><p>hello world</p></body></html>"),
    (
        "a & b < c > d",
        b"<html><head><title></title></head><body><p>a &amp; b &lt; c &gt; d</p></body></html>",
    ),
    ("l1\nl2", b"<html><head><title></title></head><body><p>l1</p><p>l2</p></body></html>"),
]


def test_wrap_golden_bytes():
    for text, html in GOLDEN:
        assert wrap_html(text) == html


def test_extract_golden():
    for text, html in GOLDEN:
        assert extract_text(html) == text


def test_title_roundtrip():
    h = wrap_html("body", title="T & <i>")
    assert extract_title(h) == "T & <i>"


@settings(max_examples=200, deadline=None)
@given(st.text())
def test_extract_inverts_wrap(text):
    assert extract_text(wrap_html(text, title="t")) == text


def test_tokenizer_matches_duckdb():
    samples = [
        "Hello, World! foo_bar 42x",
        "the quick-brown fox 123",
        "ALLCAPS MiXeD über naïve",
        "",
        "...",
        "a1b2c3",
    ]
    con = duckdb.connect()
    for s in samples:
        sql = con.execute(
            "SELECT regexp_extract_all(lower(?), ?)", [s, TOKEN_PATTERN]
        ).fetchone()[0]
        assert tokenize(s) == sql, s


def test_tokenizer_on_driver_documents():
    df = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    con = duckdb.connect()
    for t in df["text"].head(50):
        sql = con.execute(
            "SELECT regexp_extract_all(lower(?), ?)", [t, TOKEN_PATTERN]
        ).fetchone()[0]
        assert tokenize(t) == sql


def test_units_helpers():
    """Reference util.cpp:16-31 parity: config-naming + path helpers."""
    from mini_ivf_ray.functions.units import modify_path, to_string_with_units

    assert to_string_with_units(1_000_000) == "1m"
    assert to_string_with_units(500_000) == "500k"
    assert to_string_with_units(1_500_000) == "1500k"
    assert to_string_with_units(2_000_000_000) == "2b"
    assert to_string_with_units(42) == "42"
    assert to_string_with_units(0) == "0"
    assert modify_path("/a/b") == "/a/b/"
    assert modify_path("/a/b///") == "/a/b/"


def test_repetition_signals():
    """repetition_batch vs a per-doc naive reference (hand-checkable
    fractions; empty and single-token docs are zeros)."""
    import numpy as np
    import pyarrow as pa

    from mini_ivf_ray.functions.tokenize import tokenize
    from mini_ivf_ray.pipelines.analysis import repetition_batch

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(12)]
    texts = ["a b a b c", "x y z", "q q q q", "", "solo"]
    for _ in range(40):
        n = int(rng.integers(0, 30))
        texts.append(" ".join(rng.choice(vocab, size=n)))
    b = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.uint64()),
            "text": pa.array(texts),
        }
    )
    got = repetition_batch(b).to_pandas()
    assert list(got["dup_2gram_frac"][:5]) == [0.25, 0.0, 2 / 3, 0.0, 0.0]
    assert list(got["dup_3gram_frac"][:5]) == [0.0, 0.0, 0.5, 0.0, 0.0]
    assert list(got["top_token_frac"][:5]) == [0.4, 1 / 3, 1.0, 0.0, 1.0]

    def naive(text, n):
        t = tokenize(text)
        grams = [tuple(t[i : i + n]) for i in range(len(t) - n + 1)]
        if not grams:
            return 0.0
        return (len(grams) - len(set(grams))) / len(grams)

    for i, t in enumerate(texts):
        assert got["dup_2gram_frac"][i] == naive(t, 2), (i, t)
        assert got["dup_3gram_frac"][i] == naive(t, 3), (i, t)
        toks = tokenize(t)
        exp_top = (
            max(toks.count(x) for x in set(toks)) / len(toks) if toks else 0.0
        )
        assert got["top_token_frac"][i] == exp_top, (i, t)


def test_scrub_terms():
    """Denylist scrub: whole-word-only replacement + exact counts."""
    import pyarrow as pa
    import ray.data

    from mini_ivf_ray.pipelines.analysis import scrub_terms

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": pa.array(
                    [
                        "customer value customers",  # 'customers' must survive
                        "the value of value",
                        "nothing here",
                    ]
                ),
            }
        )
    )
    got = (
        scrub_terms(ds, ["customer", "value"], repl="<X>")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["clean_text"].tolist() == [
        "<X> <X> customers",
        "the <X> of <X>",
        "nothing here",
    ]
    assert got["n_redacted"].tolist() == [2, 2, 0]

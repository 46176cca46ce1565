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

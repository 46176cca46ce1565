"""Ingest pipelines: per-processor kernels, chain order sensitivity,
schema threading/validation, md5 fingerprint identity."""

import hashlib

import pytest

import ray.data
from mini_ivf_ray.pipelines.ingest import run_pipeline, validate_pipeline


def _ds():
    return ray.data.from_items(
        [
            {"doc_id": 0, "text": "  Hello World 42  ", "lang": "en"},
            {"doc_id": 1, "text": "FOO9bar", "lang": "de"},
        ]
    )


def test_chain_order_and_kernels(ray_session):
    out = run_pipeline(
        _ds(),
        [
            {"op": "trim", "field": "text"},
            {"op": "lowercase", "field": "text"},
            {"op": "gsub", "field": "text", "pattern": "[0-9]+",
             "replacement": "#"},
            {"op": "copy", "from": "lang", "to": "lang2"},
            {"op": "set", "field": "src", "value": "crawl"},
            {"op": "fingerprint", "fields": ["text", "lang"],
             "target": "fp"},
            {"op": "remove", "field": "lang2"},
        ],
    ).to_pandas().sort_values("doc_id")
    assert out["text"].tolist() == ["hello world #", "foo#bar"]
    assert out["src"].tolist() == ["crawl", "crawl"]
    assert "lang2" not in out.columns
    # fingerprint hashes the PROCESSED text (chain order) — md5 of
    # 'text|lang' after trim+lower+gsub
    want = hashlib.md5("hello world #|en".encode()).hexdigest()
    assert out["fp"].iloc[0] == want


def test_order_sensitivity_witness(ray_session):
    """gsub-then-lowercase != lowercase-then-gsub on a case-sensitive
    pattern — chains are ordered, not a set."""
    a = run_pipeline(
        _ds(),
        [
            {"op": "gsub", "field": "text", "pattern": "FOO",
             "replacement": "X"},
            {"op": "lowercase", "field": "text"},
        ],
    ).to_pandas().sort_values("doc_id")
    b = run_pipeline(
        _ds(),
        [
            {"op": "lowercase", "field": "text"},
            {"op": "gsub", "field": "text", "pattern": "FOO",
             "replacement": "X"},
        ],
    ).to_pandas().sort_values("doc_id")
    assert a["text"].iloc[1] == "x9bar"
    assert b["text"].iloc[1] == "foo9bar"


def test_validation_threads_schema():
    cols = validate_pipeline(
        [
            {"op": "set", "field": "x", "value": "1"},
            {"op": "lowercase", "field": "x"},  # added upstream -> ok
            {"op": "remove", "field": "x"},
        ],
        ["doc_id", "text"],
    )
    assert cols == ["doc_id", "text"]
    with pytest.raises(ValueError, match="unknown field"):
        validate_pipeline([{"op": "lowercase", "field": "nope"}], ["a"])
    with pytest.raises(ValueError, match="unknown field"):
        # removed field is gone for later processors
        validate_pipeline(
            [{"op": "remove", "field": "a"},
             {"op": "trim", "field": "a"}],
            ["a"],
        )
    with pytest.raises(ValueError, match="unknown op"):
        validate_pipeline([{"op": "explode"}], ["a"])
    with pytest.raises(ValueError, match="pattern"):
        validate_pipeline([{"op": "gsub", "field": "a"}], ["a"])

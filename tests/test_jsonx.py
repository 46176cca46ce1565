"""Vectorized flat-JSON extraction: regex kernel vs real parser."""

import json

import pyarrow as pa

from mini_ivf_ray.functions.jsonx import (
    json_extract_int,
    json_extract_py,
    json_extract_string,
)


def test_int_extraction_matches_parser():
    rows = [
        '{"k": 87}',
        '{"k":0}',
        '{ "k" : -12 , "x": 5}',
        '{"other": 3}',
        "{}",
        None,
        '{"k": "notanint"}',
    ]
    col = pa.array(rows, type=pa.string())
    got = json_extract_int(col, "k").to_pylist()
    want = []
    for r in rows:
        v = None
        if r is not None:
            try:
                obj = json.loads(r)
                v = obj.get("k")
            except ValueError:
                v = None
        want.append(v if isinstance(v, int) else None)
    assert got == want


def test_string_extraction():
    col = pa.array(
        ['{"name": "alpha", "k": 1}', '{"name":""}', '{"k": 2}', None]
    )
    assert json_extract_string(col, "name").to_pylist() == [
        "alpha", "", None, None,
    ]


def test_key_with_regex_metachars():
    col = pa.array(['{"a.b": 9}', '{"aXb": 5}'])
    # the dot must be escaped: only the literal "a.b" key matches
    assert json_extract_int(col, "a.b").to_pylist() == [9, None]


def test_py_fallback_handles_nested():
    col = pa.array(['{"k": {"inner": 1}}', '{"k": [1,2]}', "not json"])
    got = json_extract_py(col, "k")
    assert got[0] == {"inner": 1} or got[0] is not None
    assert got[2] is None


def test_empty_column():
    col = pa.array([], type=pa.string())
    assert json_extract_int(col, "k").to_pylist() == []
    assert json_extract_int(col, "k").type == pa.int64()

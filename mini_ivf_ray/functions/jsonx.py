"""Vectorized extraction from flat JSON string columns.

Semi-structured event payloads (the ``events.props`` column) carry
small flat JSON objects.  Parsing them row-by-row with ``json.loads``
is a Python loop in the hot path; for the overwhelmingly common case —
pull ONE scalar field out of a flat object — a compiled RE2-class
regex over the Arrow string column does the same work zero-copy and
stays vectorized (``pyarrow.compute.extract_regex``).

Boundary (documented, not silent): the regex path handles flat
objects with primitive values — numbers, plain strings without
escaped quotes.  Nested objects / escaped strings need a real parser;
``json_extract_py`` is the row-loop fallback for those, kept out of
hot paths.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc


def _re_escape(key: str) -> str:
    return "".join("\\" + c if not c.isalnum() else c for c in key)


def json_extract_int(col, key: str) -> pa.Array:
    """Extract an integer field from a flat JSON string column.

    Returns an int64 array; rows without the key (or with a non-integer
    value) come back null.  Vectorized: one extract_regex + one cast,
    no Python per-row work."""
    pat = f'"{_re_escape(key)}"\\s*:\\s*(?P<v>-?[0-9]+)'
    st = pc.extract_regex(col, pattern=pat)
    v = pc.struct_field(st, "v")
    return pc.cast(v, pa.int64())


def json_extract_string(col, key: str) -> pa.Array:
    """Extract a plain (unescaped) string field from a flat JSON
    string column; null where absent."""
    pat = f'"{_re_escape(key)}"\\s*:\\s*"(?P<v>[^"\\\\]*)"'
    st = pc.extract_regex(col, pattern=pat)
    return pc.struct_field(st, "v")


def json_extract_py(col, key: str) -> list:
    """Row-loop fallback with a real JSON parser — exact for nested /
    escaped payloads; returns a Python list (values may be scalars or
    containers, so no single Arrow type fits).  Use only off the hot
    path."""
    out = []
    for v in col.to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            obj = json.loads(v)
        except (ValueError, TypeError):
            out.append(None)
            continue
        out.append(obj.get(key) if isinstance(obj, dict) else None)
    return out

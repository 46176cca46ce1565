"""Tiny naming/path utilities (reference util.cpp:16-31).

``to_string_with_units`` mirrors the reference's config-naming helper
(1'000'000 -> "1m"): used for human-readable dataset-size tags in index
paths and manifests.  ``modify_path`` normalizes a directory path to a
trailing-slash form, the reference's ModifyPath contract.
"""

from __future__ import annotations


def to_string_with_units(n: int) -> str:
    """1000000 -> '1m', 500000 -> '500k', 1500000 -> '1500k', 42 -> '42'
    (largest unit that divides exactly, reference util.cpp:20-31)."""
    if n % 1_000_000_000 == 0 and n:
        return f"{n // 1_000_000_000}b"
    if n % 1_000_000 == 0 and n:
        return f"{n // 1_000_000}m"
    if n % 1_000 == 0 and n:
        return f"{n // 1_000}k"
    return str(n)


def modify_path(path: str) -> str:
    """Ensure exactly one trailing '/' (reference ModifyPath,
    util.cpp:16-19)."""
    return path.rstrip("/") + "/"

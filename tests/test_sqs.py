"""simple_query_string: parser leniency matrix, index-only ==
corpus-verify == brute replay, boolquery/phrase equivalence pins,
prefix-cap bite, default-operator semantics, pure-negation rule."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.sqs import (
    parse_sqs,
    simple_query_string_topk,
)

pp_fixture = pytest.importorskip("tests.test_multiphrase")


@pytest.fixture(scope="module")
def sqs_index(tmp_path_factory):
    from mini_ivf_ray.pipelines.build import build_index
    from mini_ivf_ray.pipelines.positions import build_positions
    from mini_ivf_ray.stages.prepare import prepare_documents
    from mini_ivf_ray.sources.pages import generate_pages

    cfg = PipelineConfig(num_partitions=3, topk=10)
    tbl = generate_pages(400, seed=37, vocab_size=300)
    idx = str(tmp_path_factory.mktemp("sqsidx") / "idx")
    build_index(lambda: ray.data.from_arrow(tbl), idx, cfg)
    docs = prepare_documents(ray.data.from_arrow(tbl), cfg).to_pandas()
    build_positions(idx, ray.data.from_pandas(docs[["doc_id", "text"]]), cfg)
    return idx, cfg, docs


def _shape(n):
    if n is None:
        return None
    if n.op in ("term", "phrase", "prefix"):
        return (n.op, tuple(n.payload) if isinstance(n.payload, list) else n.payload)
    return (n.op,) + tuple(_shape(c) for c in n.children)


def test_parser_matrix():
    assert _shape(parse_sqs("a + b", "or")) == (
        "and", ("term", ("a",)), ("term", ("b",)))
    assert _shape(parse_sqs("a b", "or")) == (
        "or", ("term", ("a",)), ("term", ("b",)))
    assert _shape(parse_sqs("a b", "and")) == (
        "and", ("term", ("a",)), ("term", ("b",)))
    # precedence: + binds tighter than |, NOT tightest
    assert _shape(parse_sqs("a | b + -c", "or")) == (
        "or", ("term", ("a",)),
        ("and", ("term", ("b",)), ("not", ("term", ("c",)))))
    assert _shape(parse_sqs('"x y"', "or")) == ("phrase", ("x", "y"))
    assert _shape(parse_sqs('"x"', "or")) == ("term", ("x",))  # 1-token
    assert _shape(parse_sqs("pre*", "or")) == ("prefix", "pre")
    # leniency: dangling operators / empty groups dropped, unmatched
    # quote phrases the rest, stray ')' ignored
    assert _shape(parse_sqs("a (", "or")) == ("term", ("a",))
    assert _shape(parse_sqs("a + ()", "or")) == ("term", ("a",))
    assert _shape(parse_sqs('a "b c', "or")) == (
        "or", ("term", ("a",)), ("phrase", ("b", "c")))
    assert _shape(parse_sqs("a )", "or")) == ("term", ("a",))
    assert parse_sqs("", "or") is None
    assert parse_sqs("+ | -", "or") is None
    with pytest.raises(ValueError, match="default_operator"):
        parse_sqs("a", "xor")


def _brute(docs, idx, queries, cfg, default_op, max_exp):
    """Pure-python replay: token sets + phrase scan + capped prefix."""
    from mini_ivf_ray.functions import bm25
    from mini_ivf_ray.pipelines.phraseprefix import expand_prefix
    from mini_ivf_ray.state.stats import CorpusStats

    stats = CorpusStats.load(idx)
    toks = [tokenize(t) for t in docs["text"]]
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    tsets = [set(t) for t in toks]
    dict_terms = sorted(stats.df)

    def leaf_set(node):
        if node.op == "term":
            return {
                int(ids[i])
                for i in range(len(ids))
                if all(t in tsets[i] for t in node.payload)
            }
        if node.op == "prefix":
            exp = set(expand_prefix(dict_terms, node.payload, max_exp))
            return {
                int(ids[i])
                for i in range(len(ids))
                if tsets[i] & exp
            }
        k = len(node.payload)
        out = set()
        for i in range(len(ids)):
            tk = toks[i]
            for s in range(len(tk) - k + 1):
                if tk[s : s + k] == node.payload:
                    out.add(int(ids[i]))
                    break
        return out

    def ev(node):
        if node.op == "not":
            s, c = ev(node.children[0])
            return s, not c
        if node.op in ("and", "or"):
            acc, comp = ev(node.children[0])
            for ch in node.children[1:]:
                s, c = ev(ch)
                if node.op == "and":
                    if not comp and not c:
                        acc = acc & s
                    elif not comp:
                        acc = acc - s
                    elif not c:
                        acc, comp = s - acc, False
                    else:
                        acc = acc | s
                        comp = True
                else:
                    if not comp and not c:
                        acc = acc | s
                    elif not comp:
                        acc, comp = s - acc, True
                    elif not c:
                        acc, comp = acc - s, True
                    else:
                        acc = acc & s
                        comp = True
            return acc, comp
        return leaf_set(node), False

    import pandas as pd

    rows = []
    for qid, text in queries:
        root = parse_sqs(text, default_op)
        if root is None:
            continue
        match, comp = ev(root)
        assert not comp
        ptoks: list = []
        from mini_ivf_ray.pipelines.sqs import _collect

        _collect(root, "positive_tokens", ptoks)
        pset = sorted(set(ptoks))
        cands = []
        for i in range(len(ids)):
            if int(ids[i]) not in match:
                continue
            s = 0.0
            dl = float(len(toks[i]))
            for t in pset:
                tf = float(toks[i].count(t))
                if tf > 0 and stats.df.get(t, 0) > 0:
                    s += float(
                        bm25.contributions(
                            np.array([tf]), np.array([dl]),
                            stats.df[t], stats.n_docs, stats.avgdl,
                        )[0]
                    )
            cands.append((int(ids[i]), s))
        cands.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, s) in enumerate(cands[: cfg.topk]):
            rows.append((qid, r, d, s))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


QUERIES = [
    (0, '"the data" | "the web"'),
    (1, "data + w0*"),
    (2, "the data -web"),
    (3, "(web | page) + the"),
    (4, "zzqq | data"),
]


def test_index_corpus_brute_identity(sqs_index):
    idx, cfg, docs = sqs_index
    docs_ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    kw = dict(default_operator="and", max_expansions=5)
    via_index = simple_query_string_topk(
        idx, None, QUERIES, cfg, positions="index", **kw
    ).sort_values(["query_id", "rank"]).reset_index(drop=True)
    via_corpus = simple_query_string_topk(
        idx, docs_ds, QUERIES, cfg, positions="corpus", **kw
    ).sort_values(["query_id", "rank"]).reset_index(drop=True)
    brute = _brute(docs, idx, QUERIES, cfg, "and", 5)
    assert len(via_index) == len(via_corpus) == len(brute) > 0
    for other in (via_corpus, brute):
        assert np.array_equal(
            via_index["doc_id"].to_numpy().astype(np.uint64),
            other["doc_id"].to_numpy().astype(np.uint64),
        )
        assert np.allclose(
            via_index["score"].to_numpy(), other["score"].to_numpy(),
            rtol=0, atol=1e-9,
        )


def test_equivalence_pins(sqs_index):
    """'a + b -c' == boolquery 'a AND b AND NOT c'; a single-phrase
    query == phrase_topk — both bit-identically."""
    from mini_ivf_ray.pipelines.boolquery import boolean_search
    from mini_ivf_ray.pipelines.phrase import phrase_topk

    idx, cfg, docs = sqs_index
    got = simple_query_string_topk(
        idx, None, [(0, "the + data -web")], cfg, positions="index"
    ).sort_values("rank")
    bq = ray.data.from_items(
        [{"query_id": 0, "text": "the AND data AND NOT web"}]
    )
    exp = boolean_search(idx, bq, cfg).to_pandas().sort_values("rank")
    assert np.array_equal(
        got["doc_id"].to_numpy().astype(np.uint64),
        exp["doc_id"].to_numpy().astype(np.uint64),
    )
    assert np.array_equal(got["score"].to_numpy(), exp["score"].to_numpy())

    got = simple_query_string_topk(
        idx, None, [(0, '"the data"')], cfg, positions="index"
    ).sort_values("rank")
    exp = phrase_topk(
        idx, None, [(0, "the data")], cfg, positions="index"
    ).sort_values("rank")
    assert np.array_equal(
        got["doc_id"].to_numpy().astype(np.uint64),
        exp["doc_id"].to_numpy().astype(np.uint64),
    )
    assert np.array_equal(got["score"].to_numpy(), exp["score"].to_numpy())


def test_prefix_cap_bites_and_default_operator(sqs_index):
    idx, cfg, docs = sqs_index
    big = PipelineConfig(**{**cfg.__dict__, "topk": 10_000})
    capped = simple_query_string_topk(
        idx, None, [(0, "w0*")], big, max_expansions=2, positions="index"
    )
    uncapped = simple_query_string_topk(
        idx, None, [(0, "w0*")], big, max_expansions=1000, positions="index"
    )
    assert 0 < len(capped) < len(uncapped)
    assert set(map(int, capped["doc_id"])) < set(map(int, uncapped["doc_id"]))
    # default operator: or == union >= and == intersection
    u = simple_query_string_topk(
        idx, None, [(0, "the data")], big,
        default_operator="or", positions="index",
    )
    i = simple_query_string_topk(
        idx, None, [(0, "the data")], big,
        default_operator="and", positions="index",
    )
    assert set(map(int, i["doc_id"])) < set(map(int, u["doc_id"]))
    # pure negation raises (Lucene's rule)
    with pytest.raises(ValueError, match="positive clause"):
        simple_query_string_topk(
            idx, None, [(0, "-data")], cfg, positions="index"
        )


def test_synonym_graph_rewrite_and_equivalence(sqs_index):
    """Multi-word synonym graph: the rewrite equals the hand-written
    sqs expression bit-identically; the expansion provably widens the
    match set; contracts."""
    from mini_ivf_ray.pipelines.sqs import (
        synonym_graph_query,
        synonym_graph_topk,
    )

    idx, cfg, docs = sqs_index
    rules = {"web": ["the data"], "zz": ["a b"]}
    # rewrite shape: slot OR of term + phrase alternative
    t = synonym_graph_query("web page", rules, "and")
    assert _shape(t) == (
        "and",
        ("or", ("term", ("web",)), ("phrase", ("the", "data"))),
        ("term", ("page",)),
    )
    # equivalence with the explicit sqs expression
    big = PipelineConfig(**{**cfg.__dict__, "topk": 10_000})
    got = synonym_graph_topk(
        idx, None, [(0, "web page")], rules, big,
        default_operator="and", positions="index",
    ).sort_values("rank").reset_index(drop=True)
    exp = simple_query_string_topk(
        idx, None, [(0, '(web | "the data") + page')], big,
        default_operator="and", positions="index",
    ).sort_values("rank").reset_index(drop=True)
    assert len(got) == len(exp) > 0
    assert np.array_equal(
        got["doc_id"].to_numpy().astype(np.uint64),
        exp["doc_id"].to_numpy().astype(np.uint64),
    )
    assert np.array_equal(got["score"].to_numpy(), exp["score"].to_numpy())
    # the multi-word expansion bites: strict superset of the no-rules
    # match set, and some matched doc lacks the original token
    plain = simple_query_string_topk(
        idx, None, [(0, "web + page")], big,
        default_operator="and", positions="index",
    )
    got_set = set(map(int, got["doc_id"]))
    plain_set = set(map(int, plain["doc_id"]))
    assert plain_set < got_set
    from mini_ivf_ray.functions.tokenize import tokenize as tok

    by_id = dict(zip(map(int, docs["doc_id"]), docs["text"]))
    extra = next(iter(got_set - plain_set))
    assert "web" not in tok(by_id[extra])
    # contracts
    import pytest as _pt

    with _pt.raises(ValueError, match="one token"):
        synonym_graph_query("x", {"two words": ["y"]})
    with _pt.raises(ValueError, match="empty"):
        synonym_graph_query("x", {"x": ["!!"]})
    assert synonym_graph_query("", rules) is None

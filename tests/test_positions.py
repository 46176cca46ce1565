"""Positional postings payload (pipelines/positions.py): index-only
phrase/proximity verify must equal the corpus-verify path and the
brute-force oracle; stale stores are never silently trusted."""

import json
import os

import numpy as np
import pandas as pd
import pytest

import ray.data
from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.phrase import (
    brute_force_phrase_topk,
    contains_phrase,
    phrase_topk,
    proximity_topk,
    within_window,
)
from mini_ivf_ray.pipelines.positions import (
    _doc_part,
    build_positions,
    cover_window_positions,
    phrase_match_positions,
    positions_fresh,
    positions_meta,
)

PHRASES = [
    (0, "the data"),
    (1, "data web"),
    (2, "the"),  # single token: no verify needed
    (3, "zz_oov_zz data"),  # OOV conjunct: empty
    (4, "the the"),  # duplicate-token phrase
    (5, "the data web"),  # 3-token phrase (exercises anchor advance)
]
PROX = [
    (0, "the data", 3),
    (1, "data web index", 8),
    (2, "the", 1),
    (3, "the data", 1),  # window 1 can never cover 2 distinct terms
]


@pytest.fixture(scope="module")
def pos_index(tmp_path_factory):
    from mini_ivf_ray.pipelines.build import build_index
    from mini_ivf_ray.sources.pages import generate_pages
    from mini_ivf_ray.stages.prepare import prepare_documents

    cfg = PipelineConfig(num_partitions=3, topk=10)
    tbl = generate_pages(400, seed=23, vocab_size=300)
    idx = str(tmp_path_factory.mktemp("posidx") / "idx")
    build_index(lambda: ray.data.from_arrow(tbl), idx, cfg)
    docs = prepare_documents(ray.data.from_arrow(tbl), cfg).to_pandas()
    meta = build_positions(
        idx, ray.data.from_pandas(docs[["doc_id", "text"]]), cfg
    )
    return idx, cfg, docs, meta


def test_store_layout_and_meta(pos_index):
    idx, cfg, docs, meta = pos_index
    assert meta["num_partitions"] == cfg.num_partitions
    assert meta["built_from_n_docs"] == len(docs)
    assert positions_fresh(idx)
    pos_dir = os.path.join(idx, "positions")
    parts = [d for d in os.listdir(pos_dir) if d.startswith("part=")]
    assert len(parts) == len(meta["parts_written"])
    # doc-hash partitioning: every doc's rows live in its assigned part
    import pyarrow.parquet as pq

    for d in parts:
        k = int(d.split("=")[1])
        t = pq.read_table(os.path.join(pos_dir, d, "positions.parquet"))
        ids = t["doc_id"].to_numpy().astype(np.uint64)
        assert (_doc_part(ids, meta["num_partitions"]) == k).all()
        # sorted by (term, doc_id) for row-group pruning
        terms = t["term"].to_pylist()
        assert terms == sorted(terms)


def _canon(df):
    df = df.copy()
    df["doc_id"] = df["doc_id"].astype("int64")
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def test_phrase_index_only_equals_corpus_and_oracle(pos_index):
    idx, cfg, docs, _ = pos_index
    dds = ray.data.from_pandas(docs[["doc_id", "text"]])
    via_corpus = phrase_topk(idx, dds, PHRASES, cfg, positions="corpus")
    # docs_ds=None proves the index path never touches document text
    via_index = phrase_topk(idx, None, PHRASES, cfg, positions="index")
    oracle = brute_force_phrase_topk(docs, PHRASES, cfg)
    pd.testing.assert_frame_equal(_canon(via_corpus), _canon(via_index))
    pd.testing.assert_frame_equal(_canon(via_index), _canon(oracle))
    assert list(_canon(via_index)["score"]) == list(_canon(oracle)["score"])
    assert len(via_index)  # non-vacuous


def test_prox_index_only_equals_corpus(pos_index):
    idx, cfg, docs, _ = pos_index
    dds = ray.data.from_pandas(docs[["doc_id", "text"]])
    via_corpus = proximity_topk(idx, dds, PROX, cfg, positions="corpus")
    via_index = proximity_topk(idx, None, PROX, cfg, positions="index")
    pd.testing.assert_frame_equal(_canon(via_corpus), _canon(via_index))
    assert len(via_index)
    # window 1 over 2 distinct terms is impossible
    assert not (via_index["query_id"] == 3).any()


def test_auto_prefers_fresh_store_and_rejects_stale(pos_index):
    idx, cfg, docs, _ = pos_index
    auto = phrase_topk(idx, None, PHRASES, cfg, positions="auto")
    via_index = phrase_topk(idx, None, PHRASES, cfg, positions="index")
    pd.testing.assert_frame_equal(_canon(auto), _canon(via_index))
    # corrupt freshness -> auto falls back to corpus, index raises
    mp = os.path.join(idx, "positions", "meta.json")
    meta = positions_meta(idx)
    stale = dict(meta, built_from_n_docs=meta["built_from_n_docs"] + 1)
    with open(mp, "w") as f:
        json.dump(stale, f)
    try:
        assert not positions_fresh(idx)
        with pytest.raises(FileNotFoundError):
            phrase_topk(idx, None, PHRASES, cfg, positions="index")
        dds = ray.data.from_pandas(docs[["doc_id", "text"]])
        fb = phrase_topk(idx, dds, PHRASES, cfg, positions="auto")
        pd.testing.assert_frame_equal(_canon(fb), _canon(via_index))
    finally:
        with open(mp, "w") as f:
            json.dump(meta, f)


def test_positional_kernels_match_token_kernels():
    """phrase_match_positions / cover_window_positions agree with the
    token-stream kernels on deterministic random docs."""
    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(6)]
    for trial in range(200):
        n = int(rng.integers(1, 30))
        toks = [vocab[int(i)] for i in rng.integers(0, len(vocab), n)]
        plen = int(rng.integers(2, 4))
        phrase = [vocab[int(i)] for i in rng.integers(0, len(vocab), plen)]
        pos = {
            t: np.array(
                [i for i, x in enumerate(toks) if x == t], dtype=np.int32
            )
            for t in set(toks) | set(phrase)
        }
        want = contains_phrase(toks, phrase)
        got = phrase_match_positions([pos[t] for t in phrase])
        assert got == want, (toks, phrase)
        terms = sorted(set(phrase))
        w = int(rng.integers(1, 8))
        want_w = within_window(toks, terms, w)
        got_w = cover_window_positions([pos[t] for t in terms], w)
        assert got_w == want_w, (toks, terms, w)


ORDERED = [
    (0, "the data", 3),
    (1, "data web index", 9),
    (2, "data the", 2),  # order matters: reverse of a common bigram
    (3, "the", 5),
    (4, "the zz_oov_zz", 4),
]


def _brute_ordered(tokens, qtoks, w):
    """Exhaustive ordered-window reference: try every position tuple."""
    import itertools

    pos = {t: [i for i, x in enumerate(tokens) if x == t] for t in set(qtoks)}
    lists = [pos.get(t, []) for t in qtoks]
    if any(not l for l in lists):
        return False
    if len(lists) == 1:
        return True
    for combo in itertools.product(*lists):
        if all(a < b for a, b in zip(combo, combo[1:])) and (
            combo[-1] - combo[0] + 1 <= w
        ):
            return True
    return False


def test_ordered_kernel_matches_bruteforce():
    from mini_ivf_ray.pipelines.positions import ordered_window_positions

    rng = np.random.default_rng(13)
    vocab = [f"t{i}" for i in range(5)]
    for trial in range(300):
        n = int(rng.integers(1, 25))
        toks = [vocab[int(i)] for i in rng.integers(0, len(vocab), n)]
        k = int(rng.integers(2, 4))
        qtoks = [vocab[int(i)] for i in rng.integers(0, len(vocab), k)]
        w = int(rng.integers(1, 10))
        pos = {
            t: np.array(
                [i for i, x in enumerate(toks) if x == t], dtype=np.int32
            )
            for t in set(qtoks)
        }
        got = ordered_window_positions([pos[t] for t in qtoks], w)
        want = _brute_ordered(toks, qtoks, w)
        assert got == want, (toks, qtoks, w)


def test_ordered_prox_index_equals_corpus_and_replay(pos_index):
    from mini_ivf_ray.pipelines.phrase import ordered_proximity_topk

    idx, cfg, docs, _ = pos_index
    dds = ray.data.from_pandas(docs[["doc_id", "text"]])
    via_corpus = ordered_proximity_topk(idx, dds, ORDERED, cfg, positions="corpus")
    via_index = ordered_proximity_topk(idx, None, ORDERED, cfg, positions="index")
    pd.testing.assert_frame_equal(_canon(via_corpus), _canon(via_index))
    assert list(_canon(via_corpus)["score"]) == list(_canon(via_index)["score"])
    # local replay: conjunctive BM25 widened, filtered by brute ordered
    import dataclasses

    from mini_ivf_ray.functions.tokenize import tokenize as tok
    from mini_ivf_ray.pipelines.query import brute_force_topk

    wide = dataclasses.replace(cfg, topk=len(docs))
    toks_per_doc = {
        int(d): tok(t) for d, t in zip(docs["doc_id"], docs["text"])
    }
    rows = []
    for qid, text, w in ORDERED:
        qtoks = tok(text)
        scored = brute_force_topk(
            docs, [(qid, " ".join(sorted(set(qtoks))))], wide, mode="and"
        )
        keep = [
            (int(d), float(s))
            for d, s in zip(scored["doc_id"], scored["score"])
            if _brute_ordered(toks_per_doc[int(d)], qtoks, w)
        ]
        keep.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, s) in enumerate(keep[: cfg.topk]):
            rows.append((qid, r, d, s))
    want = pd.DataFrame(
        rows, columns=["query_id", "rank", "doc_id", "score"]
    )
    got = _canon(via_index)
    assert got["doc_id"].tolist() == want["doc_id"].astype("int64").tolist()
    assert got["score"].tolist() == want["score"].tolist()
    # order sensitivity: 'data the' (qid 2) differs from unordered
    from mini_ivf_ray.pipelines.phrase import proximity_topk

    unord = proximity_topk(
        idx, None, [(2, "data the", 2)], cfg, positions="index"
    )
    assert len(unord) >= len(got[got["query_id"] == 2])


def test_append_positions_incremental(tmp_path):
    """Positions-store incremental append mirrors append_index: the
    increment lands in new per-partition positions_inc files, the store
    is fresh again, and index-only phrase/ordered results equal the
    corpus-verify path over the UNION corpus."""
    from mini_ivf_ray.pipelines.append import append_index
    from mini_ivf_ray.pipelines.build import build_index
    from mini_ivf_ray.pipelines.phrase import ordered_proximity_topk
    from mini_ivf_ray.pipelines.positions import append_positions
    from mini_ivf_ray.sources.pages import generate_pages
    from mini_ivf_ray.stages.prepare import prepare_documents

    cfg = PipelineConfig(num_partitions=3, topk=10)
    pages = generate_pages(500, seed=41, vocab_size=300, dup_frac=0.0)
    a, b = pages.slice(0, 350), pages.slice(350)
    idx = str(tmp_path / "idx")
    build_index(lambda: ray.data.from_arrow(a), idx, cfg)
    docs_a = prepare_documents(ray.data.from_arrow(a), cfg).to_pandas()
    build_positions(idx, ray.data.from_pandas(docs_a[["doc_id", "text"]]), cfg)
    assert positions_fresh(idx)
    # index append makes the store stale; positions append refreshes it
    append_index(lambda: ray.data.from_arrow(b), idx, cfg)
    assert not positions_fresh(idx)
    with pytest.raises(FileNotFoundError):
        phrase_topk(idx, None, PHRASES, cfg, positions="index")
    docs_b = prepare_documents(ray.data.from_arrow(b), cfg).to_pandas()
    meta2 = append_positions(
        idx, ray.data.from_pandas(docs_b[["doc_id", "text"]]), cfg
    )
    assert positions_fresh(idx) and meta2["increments"] == 1
    # inc files exist, base files untouched
    import glob as globmod

    incs = globmod.glob(
        os.path.join(idx, "positions", "part=*", "positions_inc*.parquet")
    )
    assert incs
    docs = prepare_documents(
        ray.data.from_arrow(pages), cfg
    ).to_pandas()
    dds = ray.data.from_pandas(docs[["doc_id", "text"]])
    vi = phrase_topk(idx, None, PHRASES, cfg, positions="index")
    vc = phrase_topk(idx, dds, PHRASES, cfg, positions="corpus")
    pd.testing.assert_frame_equal(_canon(vi), _canon(vc))
    oi = ordered_proximity_topk(idx, None, ORDERED, cfg, positions="index")
    oc = ordered_proximity_topk(idx, dds, ORDERED, cfg, positions="corpus")
    pd.testing.assert_frame_equal(_canon(oi), _canon(oc))
    assert len(vi) and len(oi)


def test_term_vectors_match_local_tokenize(pos_index):
    """Index-only term vectors == per-doc tokenize replay: exact tf and
    first position for every term of every requested doc."""
    from mini_ivf_ray.pipelines.positions import term_vectors

    idx, cfg, docs, _ = pos_index
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    wanted = ids[::7]
    got = (
        term_vectors(idx, wanted, cfg)
        .to_pandas()
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    rows = []
    by_id = dict(zip(ids.tolist(), docs["text"].tolist()))
    for d in sorted(int(x) for x in wanted):
        tf: dict[str, int] = {}
        fp: dict[str, int] = {}
        for p, t in enumerate(tokenize(by_id[d])):
            tf[t] = tf.get(t, 0) + 1
            fp.setdefault(t, p)
        for t in sorted(tf):
            rows.append((d, t, tf[t], fp[t]))
    want = pd.DataFrame(rows, columns=["doc_id", "term", "tf", "first_pos"])
    # ids are md5-u64 and may exceed int64 — compare in uint64
    want["doc_id"] = want["doc_id"].astype("uint64")
    got["doc_id"] = got["doc_id"].astype("uint64")
    got["tf"] = got["tf"].astype("int64")
    got["first_pos"] = got["first_pos"].astype("int64")
    want["tf"] = want["tf"].astype("int64")
    want["first_pos"] = want["first_pos"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_term_vectors_stale_store_raises(pos_index):
    from mini_ivf_ray.pipelines.positions import _meta_path, term_vectors

    idx, cfg, docs, _ = pos_index
    mp = _meta_path(idx)
    with open(mp) as f:
        saved = f.read()
    meta = json.loads(saved)
    meta["built_from_n_docs"] = int(meta["built_from_n_docs"]) + 1
    try:
        with open(mp, "w") as f:
            json.dump(meta, f)
        with pytest.raises(RuntimeError, match="stale"):
            term_vectors(idx, docs["doc_id"].to_numpy()[:3], cfg)
    finally:
        with open(mp, "w") as f:
            f.write(saved)


def test_term_vectors_unknown_docs_yield_no_rows(pos_index):
    from mini_ivf_ray.pipelines.positions import term_vectors

    idx, cfg, docs, _ = pos_index
    missing = np.array([2**63 + 5, 2**63 + 9], dtype=np.uint64)
    got = term_vectors(idx, missing, cfg).to_pandas()
    assert len(got) == 0


def test_compact_positions_restores_single_epoch(tmp_path):
    """After two positions appends the store is multi-epoch;
    compact_positions merges every partition back to one file with
    BIT-IDENTICAL positional results, preserved freshness, and the
    whole-store atomic commit (no .ctmp left behind)."""
    from mini_ivf_ray.pipelines.append import append_index
    from mini_ivf_ray.pipelines.build import build_index
    from mini_ivf_ray.pipelines.phrase import ordered_proximity_topk
    from mini_ivf_ray.pipelines.positions import (
        append_positions,
        compact_positions,
        positions_epochs,
    )
    from mini_ivf_ray.sources.pages import generate_pages
    from mini_ivf_ray.stages.prepare import prepare_documents

    cfg = PipelineConfig(num_partitions=3, topk=10)
    pages = generate_pages(600, seed=43, vocab_size=300, dup_frac=0.0)
    a, b, c = pages.slice(0, 400), pages.slice(400, 100), pages.slice(500)
    idx = str(tmp_path / "idx")
    build_index(lambda: ray.data.from_arrow(a), idx, cfg)
    docs_a = prepare_documents(ray.data.from_arrow(a), cfg).to_pandas()
    build_positions(idx, ray.data.from_pandas(docs_a[["doc_id", "text"]]), cfg)
    for part in (b, c):
        append_index(lambda part=part: ray.data.from_arrow(part), idx, cfg)
        docs_p = prepare_documents(ray.data.from_arrow(part), cfg).to_pandas()
        append_positions(
            idx, ray.data.from_pandas(docs_p[["doc_id", "text"]]), cfg
        )
    assert positions_epochs(idx) == 3 and positions_fresh(idx)
    before_p = _canon(phrase_topk(idx, None, PHRASES, cfg, positions="index"))
    before_o = _canon(
        ordered_proximity_topk(idx, None, ORDERED, cfg, positions="index")
    )

    out = compact_positions(idx)
    assert out["compacted"] and out["epochs_before"] == 3
    assert positions_epochs(idx) == 1 and positions_fresh(idx)
    assert not os.path.exists(os.path.join(idx, "positions.ctmp"))
    import glob as globmod

    assert not globmod.glob(
        os.path.join(idx, "positions", "part=*", "positions_inc*.parquet")
    )
    after_p = _canon(phrase_topk(idx, None, PHRASES, cfg, positions="index"))
    after_o = _canon(
        ordered_proximity_topk(idx, None, ORDERED, cfg, positions="index")
    )
    pd.testing.assert_frame_equal(before_p, after_p)
    pd.testing.assert_frame_equal(before_o, after_o)
    assert len(after_p)
    # idempotent: a second call is a no-op
    again = compact_positions(idx)
    assert not again["compacted"] and again["epochs_before"] == 1


# ---------------------------------------------------------------------------
# span_first (SpanFirstQuery)
# ---------------------------------------------------------------------------

SPAN_FIRST = [
    (0, "the", 3),
    (1, "data", 1),   # strictly the opening token
    (2, "web", 6),
    (3, "the", 0),    # empty window matches nothing
]


def _local_span_first(docs, queries, cfg):
    """Exhaustive local oracle: tokenize every doc, keep docs whose
    term first occurs before the limit, score = single-term BM25
    (brute_force_topk with one term), rank (score desc, doc asc)."""
    import dataclasses

    from mini_ivf_ray.functions.tokenize import tokenize as tok
    from mini_ivf_ray.pipelines.query import brute_force_topk

    wide = dataclasses.replace(cfg, topk=len(docs))
    rows = []
    for qid, term, limit in queries:
        full = brute_force_topk(docs, [(qid, term)], wide)
        keep = []
        tmap = {
            int(d): tok(t) for d, t in zip(docs["doc_id"], docs["text"])
        }
        for d, s in zip(
            full["doc_id"].to_numpy().astype(np.uint64), full["score"]
        ):
            tk = tmap[int(d)]
            if term in tk and tk.index(term) < limit:
                keep.append((int(d), float(s)))
        keep.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, s) in enumerate(keep[: cfg.topk]):
            rows.append((qid, r, d, s))
    return pd.DataFrame(
        rows, columns=["query_id", "rank", "doc_id", "score"]
    )


def test_span_first_index_equals_corpus_and_oracle(pos_index):
    from mini_ivf_ray.pipelines.phrase import span_first_topk

    idx, cfg, docs, _ = pos_index
    dds = ray.data.from_pandas(docs[["doc_id", "text"]])
    via_corpus = span_first_topk(
        idx, dds, SPAN_FIRST, cfg, positions="corpus"
    )
    via_index = span_first_topk(idx, None, SPAN_FIRST, cfg, positions="index")
    oracle = _local_span_first(docs, SPAN_FIRST, cfg)
    pd.testing.assert_frame_equal(_canon(via_corpus), _canon(via_index))
    pd.testing.assert_frame_equal(
        _canon(via_index),
        _canon(oracle).astype({"doc_id": "int64"}),
        check_dtype=False,
    )
    assert len(via_index)  # non-vacuous
    assert not (via_index["query_id"] == 3).any()  # limit 0 empty
    # the filter bites: some query keeps fewer docs than its term's df
    got1 = via_index[via_index["query_id"] == 1]
    full1 = _local_span_first(docs, [(1, "data", 10**9)], cfg)
    assert len(got1) <= len(full1)


def test_span_first_rejects_multi_term(pos_index):
    from mini_ivf_ray.pipelines.phrase import span_first_topk

    idx, cfg, _docs, _ = pos_index
    with pytest.raises(ValueError, match="one term"):
        span_first_topk(idx, None, [(0, "the data", 3)], cfg, positions="index")


def test_span_first_corpus_verify_equal_length_docs(tmp_path):
    """Regression: a verify batch whose kept docs ALL tokenize to the
    same length used to collapse np.array(toks, dtype=object) into a
    2D array whose rows have no .index() — corpus-backend span_first
    crashed with AttributeError."""
    import pyarrow as pa

    from mini_ivf_ray.functions.extract import wrap_html
    from mini_ivf_ray.pipelines.build import build_index
    from mini_ivf_ray.pipelines.phrase import span_first_topk

    texts = [
        "alpha beta gamma delta",
        "beta alpha gamma delta",
        "gamma delta alpha beta",
        "delta gamma beta alpha",
    ]  # all exactly 4 tokens
    n = len(texts)
    tbl = pa.table(
        {
            "url": pa.array(
                [f"https://e.example/{i}" for i in range(n)], type=pa.string()
            ),
            "warc_ts": pa.array(
                np.full(n, np.datetime64("2024-01-01", "us"))
            ),
            "html": pa.array(
                [wrap_html(t) for t in texts], type=pa.binary()
            ),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * n, type=pa.string()),
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    from mini_ivf_ray.config import PipelineConfig

    cfg = PipelineConfig(num_partitions=2, topk=5, doc_id_from_url=False)
    idx = str(tmp_path / "eq_idx")
    build_index(lambda: ray.data.from_arrow(tbl), idx, cfg, dedup=False)
    docs_ds = ray.data.from_arrow(tbl.select(["doc_id", "text"]))
    res = span_first_topk(
        idx, docs_ds, [(0, "alpha", 1)], cfg, positions="corpus"
    )
    # 'alpha' is the FIRST token of exactly docs 0 and 1? doc 0 yes,
    # doc 1 starts with beta -> only docs whose first token is alpha
    got = sorted(res["doc_id"].astype(np.int64))
    assert got == [0]


# ---------------------------------------------------------------------------
# span_not (SpanNotQuery)
# ---------------------------------------------------------------------------

SPAN_NOT = [
    (0, "the", "data", 1),
    (1, "data", "web", 2),
    (2, "web", "zz9999qq", 3),   # OOV exclude == plain single-term
    (3, "the", "the", 0),        # self-exclusion: always empty
    (4, "the", "web", 0),        # w=0 over distinct terms: excludes nothing
]


def _local_span_not(docs, queries, cfg):
    """Exhaustive local oracle: pure-Python position scan — a doc
    matches iff some include position has every exclude position
    farther than w away."""
    import dataclasses

    from mini_ivf_ray.functions.tokenize import tokenize as tok
    from mini_ivf_ray.pipelines.query import brute_force_topk

    wide = dataclasses.replace(cfg, topk=len(docs))
    tmap = {int(d): tok(t) for d, t in zip(docs["doc_id"], docs["text"])}
    rows = []
    for qid, inc, exc, w in queries:
        full = brute_force_topk(docs, [(qid, inc)], wide)
        keep = []
        for d, s in zip(
            full["doc_id"].to_numpy().astype(np.uint64), full["score"]
        ):
            tk = tmap[int(d)]
            ip = [i for i, t in enumerate(tk) if t == inc]
            ep = [i for i, t in enumerate(tk) if t == exc]
            if any(all(abs(p - q) > w for q in ep) for p in ip):
                keep.append((int(d), float(s)))
        keep.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, s) in enumerate(keep[: cfg.topk]):
            rows.append((qid, r, d, s))
    return pd.DataFrame(
        rows, columns=["query_id", "rank", "doc_id", "score"]
    )


def test_span_not_index_equals_corpus_and_oracle(pos_index):
    from mini_ivf_ray.pipelines.phrase import span_not_topk
    from mini_ivf_ray.pipelines.query import brute_force_topk

    idx, cfg, docs, _ = pos_index
    dds = ray.data.from_pandas(docs[["doc_id", "text"]])
    via_corpus = span_not_topk(idx, dds, SPAN_NOT, cfg, positions="corpus")
    via_index = span_not_topk(idx, None, SPAN_NOT, cfg, positions="index")
    oracle = _local_span_not(docs, SPAN_NOT, cfg)
    pd.testing.assert_frame_equal(_canon(via_corpus), _canon(via_index))
    pd.testing.assert_frame_equal(
        _canon(via_index),
        _canon(oracle).astype({"doc_id": "int64"}),
        check_dtype=False,
    )
    assert len(via_index)  # non-vacuous
    # self-exclusion at w=0: every occurrence excludes itself -> empty
    assert not (via_index["query_id"] == 3).any()
    # OOV exclude == the plain single-term ranking, bit-identically
    got2 = via_index[via_index["query_id"] == 2].sort_values("rank")
    plain = brute_force_topk(docs, [(2, "web")], cfg).sort_values("rank")
    assert list(got2["doc_id"].to_numpy().astype(np.uint64)) == list(
        plain["doc_id"].to_numpy().astype(np.uint64)
    )
    assert list(got2["score"]) == list(plain["score"])
def test_span_not_exclusion_bites_planted(tmp_path):
    """A planted corpus where the exclusion provably removes a doc:
    every 'apple' in doc 1 sits next to a 'pie', doc 2 has no 'pie',
    doc 3's 'apple' is 2 tokens from its 'pie' (survives at w=1)."""
    import pyarrow as pa

    from mini_ivf_ray.pipelines.build import build_index
    from mini_ivf_ray.pipelines.phrase import span_not_topk
    from mini_ivf_ray.pipelines.positions import build_positions
    from mini_ivf_ray.stages.prepare import prepare_documents

    import datetime as dtmod

    pages = pa.table(
        {
            "url": [f"http://x.test/{i}" for i in range(4)],
            "warc_ts": pa.array(
                [dtmod.datetime(2026, 1, 1)] * 4, type=pa.timestamp("us")
            ),
            "html": [
                b"<html><body><p>apple pie recipe apple pie</p></body></html>",
                b"<html><body><p>apple orchard tour today</p></body></html>",
                b"<html><body><p>pie crust fresh apple batch</p></body></html>",
                b"<html><body><p>plain filler text here</p></body></html>",
            ],
        }
    )
    cfg = PipelineConfig(num_partitions=2, topk=10)
    idx = str(tmp_path / "idx")
    build_index(lambda: ray.data.from_arrow(pages), idx, cfg)
    docs = prepare_documents(ray.data.from_arrow(pages), cfg).to_pandas()
    build_positions(idx, ray.data.from_pandas(docs[["doc_id", "text"]]), cfg)
    by_url = dict(zip(docs["url"], docs["doc_id"].astype(np.uint64)))

    q = [(0, "apple", "pie", 1)]
    for backend, dds in (
        ("index", None),
        ("corpus", ray.data.from_pandas(docs[["doc_id", "text"]])),
    ):
        res = span_not_topk(idx, dds, q, cfg, positions=backend)
        got = set(res["doc_id"].to_numpy().astype(np.uint64).tolist())
        assert int(by_url["http://x.test/0"]) not in got, backend
        assert int(by_url["http://x.test/1"]) in got, backend
        assert int(by_url["http://x.test/2"]) in got, backend


def test_span_not_kernel_and_contracts(pos_index):
    from mini_ivf_ray.pipelines.phrase import span_not_topk
    from mini_ivf_ray.pipelines.positions import span_not_survives

    # kernel edges
    e = np.empty(0, dtype=np.int64)
    assert not span_not_survives(e, e, 3)
    assert span_not_survives(np.array([5]), e, 3)
    assert not span_not_survives(np.array([5]), np.array([4]), 1)
    assert span_not_survives(np.array([5]), np.array([3]), 1)
    assert span_not_survives(np.array([5, 9]), np.array([4, 6]), 1)  # 9 survives
    assert not span_not_survives(np.array([5, 9]), np.array([4, 9]), 1)
    # same-position exclusion at w=0
    assert not span_not_survives(np.array([7]), np.array([7]), 0)
    assert span_not_survives(np.array([7]), np.array([8]), 0)

    idx, cfg, _docs, _ = pos_index
    with pytest.raises(ValueError, match="one include"):
        span_not_topk(idx, None, [(0, "the data", "web", 1)], cfg,
                      positions="index")
    with pytest.raises(ValueError, match=">= 0"):
        span_not_topk(idx, None, [(0, "the", "web", -1)], cfg,
                      positions="index")


# ---------------------------------------------------------------------------
# SpanContaining / SpanWithin
# ---------------------------------------------------------------------------

SPAN_CONTAINING = [
    (0, "the data", "web", 6),
    (1, "data web", "the", 8),
    (2, "the data", "zzoovzz", 5),     # OOV little: empty
    (3, "the data", "the", 4),          # little == a big term
    (4, "the data", "web", 2),          # window 2: chain width 2 max
]


def _brute_containing(tokens, big, little, w):
    """Exhaustive chain enumeration: any ordered big chain within w
    containing a little occurrence."""
    import itertools

    pls = [[p for p, t in enumerate(tokens) if t == b] for b in big]
    lit = [p for p, t in enumerate(tokens) if t == little]
    if not lit or any(not p for p in pls):
        return False
    for combo in itertools.product(*pls):
        if all(a < b for a, b in zip(combo, combo[1:])):
            if combo[-1] - combo[0] + 1 <= w:
                if any(combo[0] <= l <= combo[-1] for l in lit):
                    return True
    return False


def _local_span_containing(docs, queries, cfg, score_from="big"):
    import dataclasses

    from mini_ivf_ray.functions.tokenize import tokenize as tok
    from mini_ivf_ray.pipelines.query import brute_force_topk

    wide = dataclasses.replace(cfg, topk=len(docs))
    tmap = {int(d): tok(t) for d, t in zip(docs["doc_id"], docs["text"])}
    rows = []
    for qid, big_text, little_text, w in queries:
        big, little = tok(big_text), tok(little_text)[0]
        src = big_text if score_from == "big" else little_text
        full = brute_force_topk(docs, [(qid, src)], wide)
        smap = dict(
            zip(
                full["doc_id"].to_numpy().astype(np.uint64).tolist(),
                full["score"].tolist(),
            )
        )
        keep = []
        for d, tk in tmap.items():
            if _brute_containing(tk, big, little, w):
                keep.append((int(d), float(smap[d])))
        keep.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, s) in enumerate(keep[: cfg.topk]):
            rows.append((qid, r, d, s))
    return pd.DataFrame(
        rows, columns=["query_id", "rank", "doc_id", "score"]
    )


def test_containing_kernel_matches_brute_force():
    from mini_ivf_ray.pipelines.positions import containing_span_positions

    rng = np.random.default_rng(99)
    vocab = ["a", "b", "c", "x"]
    for trial in range(300):
        n = int(rng.integers(3, 30))
        toks = [vocab[i] for i in rng.integers(0, len(vocab), n)]
        for big, little, w in (
            (["a", "b"], "c", int(rng.integers(1, 8))),
            (["a", "b", "c"], "x", int(rng.integers(2, 10))),
            (["b", "a"], "a", 4),
        ):
            pls = [
                np.array(
                    [p for p, t in enumerate(toks) if t == b], dtype=np.int32
                )
                for b in big
            ]
            lit = np.array(
                [p for p, t in enumerate(toks) if t == little], dtype=np.int32
            )
            got = containing_span_positions(pls, lit, w)
            want = _brute_containing(toks, big, little, w)
            assert got == want, (trial, toks, big, little, w)


def test_span_containing_index_equals_corpus_and_oracle(pos_index):
    from mini_ivf_ray.pipelines.phrase import span_containing_topk

    idx, cfg, docs, _ = pos_index
    dds = ray.data.from_pandas(docs[["doc_id", "text"]])
    via_corpus = span_containing_topk(
        idx, dds, SPAN_CONTAINING, cfg, positions="corpus"
    )
    via_index = span_containing_topk(
        idx, None, SPAN_CONTAINING, cfg, positions="index"
    )
    oracle = _local_span_containing(docs, SPAN_CONTAINING, cfg)
    pd.testing.assert_frame_equal(_canon(via_corpus), _canon(via_index))
    pd.testing.assert_frame_equal(
        _canon(via_index), _canon(oracle), check_dtype=False
    )
    assert len(via_index)  # non-vacuous
    assert not (via_index["query_id"] == 2).any()  # OOV little empty
    # containment bites: the FULL verified match set for query 0 is a
    # strict, non-empty subset of the plain ordered-window match set
    # (compare at wide topk so neither side is truncation-censored)
    import dataclasses

    from mini_ivf_ray.pipelines.phrase import ordered_proximity_topk

    wide = dataclasses.replace(cfg, topk=len(docs))
    ow = ordered_proximity_topk(
        idx, None, [(0, "the data", 6)], wide, positions="index"
    )
    sc = span_containing_topk(
        idx, None, [(0, "the data", "web", 6)], wide, positions="index"
    )
    ow_ids = set(ow["doc_id"].astype("int64"))
    sc_ids = set(sc["doc_id"].astype("int64"))
    assert sc_ids and sc_ids < ow_ids


def test_span_within_same_docs_little_scores(pos_index):
    from mini_ivf_ray.pipelines.phrase import (
        span_containing_topk,
        span_within_topk,
    )

    import dataclasses

    idx, cfg, docs, _ = pos_index
    q = [(0, "the data", "web", 6)]
    within = span_within_topk(idx, None, q, cfg, positions="index")
    oracle = _local_span_containing(docs, q, cfg, score_from="little")
    pd.testing.assert_frame_equal(
        _canon(within), _canon(oracle), check_dtype=False
    )
    # identical doc-level match SET (ranked differently) — compare at
    # wide topk so scoring-order differences can't censor either side
    wide = dataclasses.replace(cfg, topk=len(docs))
    cont = span_containing_topk(idx, None, q, wide, positions="index")
    withw = span_within_topk(idx, None, q, wide, positions="index")
    assert set(cont["doc_id"].astype("int64")) == set(
        withw["doc_id"].astype("int64")
    )
    # scoring provably differs: within uses the little term only
    assert not np.array_equal(
        cont.sort_values("doc_id")["score"].to_numpy(),
        withw.sort_values("doc_id")["score"].to_numpy(),
    )


def test_span_containing_planted_and_contracts(pos_index, tmp_path):
    import shutil

    import pyarrow as pa

    from mini_ivf_ray.pipelines.build import build_index
    from mini_ivf_ray.pipelines.phrase import span_containing_topk
    from mini_ivf_ray.pipelines.positions import build_positions as bp

    idx0, cfg0, _docs, _ = pos_index
    # planted pins: "data filter row" contains filter inside the
    # (data, row) w=3 span; "data row filter" does NOT (filter is
    # outside the only achievable span [0, 1])
    from mini_ivf_ray.functions.extract import wrap_html

    texts = ["data filter row", "data row filter", "data row x filter row"]
    docs = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.uint64), "text": texts}
    )
    cfg = PipelineConfig(num_partitions=2, topk=10, doc_id_from_url=False)
    idx = str(tmp_path / "planted")
    shutil.rmtree(idx, ignore_errors=True)
    n = len(texts)
    tbl = pa.table(
        {
            "url": pa.array(
                [f"https://e.example/{i}" for i in range(n)],
                type=pa.string(),
            ),
            "warc_ts": pa.array(
                np.full(n, np.datetime64("2024-01-01", "us"))
            ),
            "html": pa.array(
                [wrap_html(t) for t in texts], type=pa.binary()
            ),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * n, type=pa.string()),
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    build_index(lambda: ray.data.from_arrow(tbl), idx, cfg, dedup=False)
    bp(idx, ray.data.from_pandas(docs[["doc_id", "text"]]), cfg)
    q = [(0, "data row", "filter", 3)]
    for mode, dds in (("index", None), ("corpus", ray.data.from_pandas(docs))):
        got = span_containing_topk(idx, dds, q, cfg, positions=mode)
        ids = set(got["doc_id"].astype("int64"))
        assert 0 in ids, mode      # filter inside the span
        assert 1 not in ids, mode  # filter after the only span
        # doc 2: spans (0,1) and (4-start? no 'data' at 4) -> only
        # [0,1]; filter@3 outside -> excluded... unless the wider
        # last-occurrence end (row@4) admits [0,4] at w=3? width 5 > 3:
        # excluded.
        assert 2 not in ids, mode
    # contracts
    with pytest.raises(ValueError, match=">= 2 big terms"):
        span_containing_topk(idx0, None, [(0, "data", "web", 4)], cfg0,
                             positions="index")
    with pytest.raises(ValueError, match="little"):
        span_containing_topk(idx0, None, [(0, "the data", "a b", 4)], cfg0,
                             positions="index")
    with pytest.raises(ValueError, match="window"):
        span_containing_topk(idx0, None, [(0, "the data", "web", 0)], cfg0,
                             positions="index")
    with pytest.raises(ValueError, match="score_from"):
        span_containing_topk(idx0, None, [(0, "the data", "web", 4)], cfg0,
                             positions="index", score_from="both")

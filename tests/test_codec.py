"""Codec round-trip tests (reference analog: test_binary_io.cpp write->
read->assert-equal, SURVEY §5.3)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mini_ivf_ray.functions.codec import (
    decode_block,
    decode_varints,
    encode_block,
    encode_posting_run,
    encode_varints,
)


def test_varint_known_values():
    vals = np.array([0, 1, 127, 128, 300, 2**32, 2**63, 2**64 - 1], dtype=np.uint64)
    enc = encode_varints(vals)
    assert decode_varints(enc).tolist() == vals.tolist()
    # single-byte values encode to single bytes
    assert encode_varints(np.array([5], dtype=np.uint64)).tolist() == [5]
    assert encode_varints(np.array([128], dtype=np.uint64)).tolist() == [0x80, 0x01]


def test_varint_empty():
    assert encode_varints(np.empty(0, dtype=np.uint64)).size == 0
    assert decode_varints(b"").size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert decode_varints(encode_varints(arr)).tolist() == arr.tolist()


@pytest.mark.parametrize("n,block_size", [(1, 128), (127, 128), (128, 128), (129, 128), (1000, 64)])
def test_posting_run_roundtrip(n, block_size):
    rng = np.random.default_rng(n)
    doc = np.sort(rng.choice(2**62, n, replace=False)).astype(np.uint64)
    tf = rng.integers(1, 100, n).astype(np.int64)
    dl = rng.integers(1, 1000, n).astype(np.int64)
    firsts, lasts, counts, payloads = encode_posting_run(doc, tf, dl, block_size)
    assert counts.sum() == n
    assert len(payloads) == -(-n // block_size)
    off = 0
    for f, l, c, p in zip(firsts, lasts, counts, payloads):
        d2, t2, l2 = decode_block(p, int(f), int(c))
        np.testing.assert_array_equal(d2, doc[off : off + c])
        np.testing.assert_array_equal(t2, tf[off : off + c])
        np.testing.assert_array_equal(l2, dl[off : off + c])
        assert int(f) == int(doc[off]) and int(l) == int(doc[off + c - 1])
        off += c


def test_encode_block_single():
    doc = np.array([42], dtype=np.uint64)
    p = encode_block(doc, np.array([3]), np.array([7]))
    d, t, l = decode_block(p, 42, 1)
    assert d.tolist() == [42] and t.tolist() == [3] and l.tolist() == [7]


def test_run_merger_property():
    """Property: the k-way streaming merge over arbitrary sorted run
    files equals concat+sort, for random run/row-group shapes
    (reference analog: the write->read->assert round-trips of
    test_binary_io.cpp:11-79, lifted to the merge invariant)."""
    import os
    import tempfile

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pqm

    from mini_ivf_ray.stages.spimi import _RunMerger

    rng = np.random.default_rng(123)
    vocab = [f"t{i:03d}" for i in range(40)]
    with tempfile.TemporaryDirectory() as d:
        runs = []
        seen = set()
        for r in range(7):
            n = int(rng.integers(1, 400))
            rows = []
            for _ in range(n):
                t = vocab[int(rng.integers(0, len(vocab)))]
                doc = int(rng.integers(0, 10_000))
                if (t, doc) in seen:  # keys globally unique by contract
                    continue
                seen.add((t, doc))
                rows.append((t, doc, int(rng.integers(1, 9)), int(rng.integers(1, 99))))
            if not rows:
                continue
            df = pd.DataFrame(rows, columns=["term", "doc_id", "tf", "dl"])
            df = df.sort_values(["term", "doc_id"]).reset_index(drop=True)
            tbl = pa.table(
                {
                    "term": pa.array(df["term"], type=pa.string()),
                    "doc_id": pa.array(df["doc_id"].to_numpy().astype(np.uint64), type=pa.uint64()),
                    "tf": pa.array(df["tf"], type=pa.int64()),
                    "dl": pa.array(df["dl"], type=pa.int64()),
                }
            )
            path = os.path.join(d, f"run_{r}.parquet")
            # random row-group sizes exercise chunked iteration
            pqm.write_table(tbl, path, row_group_size=int(rng.integers(16, 120)))
            runs.append((pqm.ParquetFile(path), list(range(pqm.ParquetFile(path).metadata.num_row_groups))))
        chunks = list(_RunMerger(runs, chunk_rows=64))
        merged = pa.concat_tables(chunks)
        got = merged.to_pandas()
        # chunk boundaries partition the key space in increasing order
        expect = got.sort_values(["term", "doc_id"], kind="mergesort").reset_index(drop=True)
        all_rows = pa.concat_tables(
            [pqm.read_table(os.path.join(d, f)) for f in sorted(os.listdir(d))]
        ).to_pandas().sort_values(["term", "doc_id"], kind="mergesort").reset_index(drop=True)
        pd.testing.assert_frame_equal(expect, all_rows)
        # within the stream, keys across successive chunks never go back
        last = None
        for c in chunks:
            cdf = c.to_pandas().sort_values(["term", "doc_id"])
            first = (cdf["term"].iloc[0], int(cdf["doc_id"].iloc[0]))
            if last is not None:
                assert first > last
            last = (cdf["term"].iloc[-1], int(cdf["doc_id"].iloc[-1]))

"""Posting-block codec: delta + varint (LEB128) packing, NumPy-vectorized.

Reference analog: ``Quantizer::Encode`` packing raw vectors into
fixed-width uint8 PQ codes per posting list (quantizer.cpp:133-188,
gathered per list in index_ivfpq.cpp:111-117).  Here each posting list
is cut into blocks of ``block_size`` postings; a block stores

    varint(doc_id[0] delta vs block's base=first_doc_id is implicit: the
    first delta encodes doc_id[1]-doc_id[0], ...),
    then all tf varints, then all dl varints

as one contiguous bytes payload, with (first_doc_id, last_doc_id, count,
max_score) carried as typed sidecar columns — the block-max metadata
that drives WAND skipping (north_star "per-block max-score metadata").

dl (doc length) is stored per posting so BM25 scoring is join-free at
query time: a posting block is self-contained given global (N, avgdl)
and the term's df.  Cost ≈1 varint byte per posting; at 10^12 docs this
trades ~1 byte/posting for never shuffling a doclen table.

Both encode and decode are O(bytes) NumPy kernels (no per-posting Python
loop): encode writes each of the ≤10 varint byte positions with one
masked assignment; decode uses cumsum segmentation + reduceat.
"""

from __future__ import annotations

import numpy as np

_THRESH = np.array([1 << (7 * k) for k in range(1, 10)], dtype=np.uint64)


def encode_varints(values: np.ndarray) -> np.ndarray:
    """uint64 array -> LEB128 byte stream (uint8 array)."""
    v = values.astype(np.uint64, copy=False)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8)
    nbytes = (np.searchsorted(_THRESH, v, side="right") + 1).astype(np.int64)
    # searchsorted on uint64 vs thresholds: values >= 2^63 compare fine (same dtype)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(ends[-1], dtype=np.uint8)
    for k in range(int(nbytes.max())):
        mask = nbytes > k
        byte = ((v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[starts[mask] + k] = byte | cont
    return out


def decode_varints(buf: np.ndarray | bytes) -> np.ndarray:
    """LEB128 byte stream -> uint64 array.

    Per-byte-POSITION gathers instead of the old arange+repeat+reduceat
    segmentation: k iterates over varint byte slots (<= 10, and the
    loop body shrinks to the values that long), so the intermediates
    are value-sized, not 8x-stream-sized — ~4x fewer allocated bytes,
    which is what the spin-up decode burst's first-touch page faults
    charge for.  Bit-identical (pure integer ops, same OR-composition
    order)."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, memoryview)) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    last = (b & 0x80) == 0
    ends = np.flatnonzero(last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts
    out = (b[ends] & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * lengths.astype(np.uint64)
    )
    sel = np.flatnonzero(lengths)  # multi-byte values only
    k = 0
    while sel.size:
        out[sel] |= (b[starts[sel] + k] & np.uint8(0x7F)).astype(
            np.uint64
        ) << np.uint64(7 * k)
        k += 1
        sel = sel[lengths[sel] > k]
    return out


def encode_block(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> bytes:
    """One block: doc_ids strictly increasing uint64; tf, dl >= 0.
    Payload = varint deltas (len n-1) ++ varint tf (len n) ++ varint dl (len n);
    counts live in sidecar metadata, so streams are split by element count."""
    deltas = np.diff(doc_ids.astype(np.uint64))
    parts = [
        encode_varints(deltas),
        encode_varints(tfs.astype(np.uint64, copy=False)),
        encode_varints(dls.astype(np.uint64, copy=False)),
    ]
    return np.concatenate(parts).tobytes()


def encode_posting_run(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, block_size: int
):
    """Encode one term's full docID-sorted posting run into blocks.

    Vectorized across blocks: the delta/tf/dl varint streams are encoded
    ONCE for the whole run, then sliced per block via cumulative
    byte-length offsets (a block's payload never includes the delta that
    crosses its leading boundary, so slicing is exact).

    Returns (firsts u64, lasts u64, counts i64, payloads list[bytes]).
    """
    n = doc_ids.size
    starts = np.arange(0, n, block_size, dtype=np.int64)
    ends = np.minimum(starts + block_size, n)

    deltas = np.diff(doc_ids.astype(np.uint64, copy=False))
    d_bytes = encode_varints(deltas)
    t_bytes = encode_varints(tfs.astype(np.uint64, copy=False))
    l_bytes = encode_varints(dls.astype(np.uint64, copy=False))

    def offsets(values: np.ndarray) -> np.ndarray:
        if values.size == 0:
            return np.zeros(1, dtype=np.int64)
        nb = np.searchsorted(_THRESH, values.astype(np.uint64, copy=False), side="right") + 1
        out = np.zeros(values.size + 1, dtype=np.int64)
        np.cumsum(nb, out=out[1:])
        return out

    d_off, t_off, l_off = offsets(deltas), offsets(tfs.astype(np.uint64)), offsets(
        dls.astype(np.uint64)
    )
    payloads = []
    for s, e in zip(starts, ends):
        payloads.append(
            d_bytes[d_off[s] : d_off[e - 1]].tobytes()
            + t_bytes[t_off[s] : t_off[e]].tobytes()
            + l_bytes[l_off[s] : l_off[e]].tobytes()
        )
    return (
        doc_ids[starts].astype(np.uint64),
        doc_ids[ends - 1].astype(np.uint64),
        (ends - starts),
        payloads,
    )


def decode_block(payload: bytes, first_doc_id: int, count: int):
    """-> (doc_ids uint64[count], tf int64[count], dl int64[count])."""
    vals = decode_varints(np.frombuffer(payload, dtype=np.uint8))
    n = count
    deltas, tfs, dls = vals[: n - 1], vals[n - 1 : 2 * n - 1], vals[2 * n - 1 :]
    doc_ids = np.empty(n, dtype=np.uint64)
    doc_ids[0] = first_doc_id
    if n > 1:
        doc_ids[1:] = np.uint64(first_doc_id) + np.cumsum(deltas)
    return doc_ids, tfs.astype(np.int64), dls.astype(np.int64)

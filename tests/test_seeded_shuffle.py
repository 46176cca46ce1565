"""Seeded shuffle export: local replay, permutation shape, seed effect."""

import hashlib

import numpy as np

import ray.data
from mini_ivf_ray.pipelines.sampling import seeded_shuffle


def _h60(i: int, salt: str) -> int:
    return (
        int.from_bytes(
            hashlib.md5(f"{i}:{salt}".encode()).digest()[:8], "big"
        )
        >> 4
    )


def test_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    ds = ray.data.from_pandas(docs[["doc_id", "text"]]).repartition(6)
    res = seeded_shuffle(ds, seed=42, n_shards=4).to_pandas()
    ids = [int(np.uint64(d)) for d in docs["doc_id"]]
    want = {}
    for s in range(4):
        members = sorted(
            (i for i in ids if _h60(i, "shuf-shard:42") % 4 == s),
            key=lambda i: (_h60(i, "shuf-order:42"), i),
        )
        for pos, i in enumerate(members):
            want[i] = (s, pos)
    assert len(res) == len(ids)
    for d, s, p in zip(
        res["doc_id"].to_numpy().astype(np.uint64),
        res["shard"],
        res["pos"],
    ):
        assert want[int(d)] == (int(s), int(p))


def test_positions_are_contiguous_per_shard(tiny_index):
    idx, cfg, docs = tiny_index
    ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    res = seeded_shuffle(ds, seed=7, n_shards=3).to_pandas()
    for s, g in res.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))
    assert set(res["doc_id"].to_numpy().astype(np.uint64)) == set(
        docs["doc_id"].to_numpy().astype(np.uint64)
    )


def test_seed_changes_order(tiny_index):
    idx, cfg, docs = tiny_index
    ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    a = seeded_shuffle(ds, seed=1, n_shards=2).to_pandas()
    b = seeded_shuffle(ds, seed=2, n_shards=2).to_pandas()
    ka = dict(zip(a["doc_id"].to_numpy().astype(np.uint64),
                  zip(a["shard"], a["pos"])))
    kb = dict(zip(b["doc_id"].to_numpy().astype(np.uint64),
                  zip(b["shard"], b["pos"])))
    assert any(ka[d] != kb[d] for d in ka)

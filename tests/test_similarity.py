"""ANN: brute-force vs IVF (exact at nprobe=all), IVFPQ recall
(reference analog: recall@k checks, test_ivfpq.cpp:30-113)."""

import os

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa

import ray.data
from mini_ivf_ray.pipelines.similarity import (
    _normalize,
    ann_search,
    brute_force_ann,
    build_ivf_index,
)


def _clustered_embeddings(n=400, d=32, k=8, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)) * 3
    labels = rng.integers(0, k, n)
    mat = centers[labels] + rng.normal(size=(n, d))
    return pd.DataFrame(
        {"vec_id": np.arange(n), "embedding": [v.tolist() for v in mat], "label": labels}
    )


def test_ivf_exact_at_full_nprobe(tmp_path):
    df = _clustered_embeddings()
    ds = ray.data.from_pandas(df[["vec_id", "embedding"]])
    idx = str(tmp_path / "ivf")
    meta = build_ivf_index(ds, idx, n_centroids=8, seed=7)
    assert meta["counters"]["n_vectors"] == len(df)

    qdf = df.head(10)[["vec_id", "embedding"]]
    qds = ray.data.from_pandas(qdf)
    res = (
        ann_search(idx, qds, k=5, nprobe=8)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    Q = np.array(qdf["embedding"].tolist())
    bf = brute_force_ann(ds, Q, qdf["vec_id"].to_numpy(), k=5).sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)
    np.testing.assert_array_equal(res["vec_id"].to_numpy(), bf["vec_id"].to_numpy())
    np.testing.assert_allclose(res["cosine"].to_numpy(), bf["cosine"].to_numpy(), atol=2e-6)
    # self is its own nearest neighbour at rank 0
    assert (res[res["rank"] == 0]["vec_id"].to_numpy() == qdf["vec_id"].to_numpy()).all()


def test_ivf_partial_nprobe_recall(tmp_path):
    df = _clustered_embeddings(n=600)
    ds = ray.data.from_pandas(df[["vec_id", "embedding"]])
    idx = str(tmp_path / "ivf2")
    build_ivf_index(ds, idx, n_centroids=8, seed=7)
    qdf = df.head(20)[["vec_id", "embedding"]]
    Q = np.array(qdf["embedding"].tolist())
    bf = brute_force_ann(ds, Q, qdf["vec_id"].to_numpy(), k=10)
    res = ann_search(idx, ray.data.from_pandas(qdf), k=10, nprobe=3).to_pandas()
    recall = _recall(res, bf, 10)
    assert recall >= 0.8  # clustered data, 3/8 probes


def test_ivfpq_recall(tmp_path):
    df = _clustered_embeddings(n=600, d=32)
    ds = ray.data.from_pandas(df[["vec_id", "embedding"]])
    idx = str(tmp_path / "ivfpq")
    meta = build_ivf_index(ds, idx, n_centroids=8, pq_m=16, pq_ks=64, seed=7)
    assert meta["kind"] == "ivfpq"
    qdf = df.head(20)[["vec_id", "embedding"]]
    Q = np.array(qdf["embedding"].tolist())
    bf = brute_force_ann(ds, Q, qdf["vec_id"].to_numpy(), k=10)
    res = ann_search(idx, ray.data.from_pandas(qdf), k=10, nprobe=8, use_pq=True).to_pandas()
    # PQ on raw (non-residual) vectors is lossy — the reference quantizes
    # raw data the same way (index_ivfpq.cpp:84-86); recall bound matches
    # an offline param sweep (m=16, ks=64 -> ~0.79 on this corpus)
    assert _recall(res, bf, 10) >= 0.7


def _recall(res: pd.DataFrame, truth: pd.DataFrame, k: int) -> float:
    hits = tot = 0
    for qid, g in truth.groupby("query_id"):
        t = set(g["vec_id"])
        p = set(res[res["query_id"] == qid]["vec_id"])
        hits += len(t & p)
        tot += len(t)
    return hits / tot


def test_normalize_zero_vector():
    m = _normalize(np.array([[0.0, 0.0], [3.0, 4.0]]))
    assert np.allclose(m[1], [0.6, 0.8]) and np.allclose(m[0], 0)


def test_ivfpq_residual_beats_raw(tmp_path):
    """Residual PQ (Faiss-style) should recall better than raw-vector PQ
    (the reference's mode) on clustered data."""
    df = _clustered_embeddings(n=600, d=32)
    ds = ray.data.from_pandas(df[["vec_id", "embedding"]])
    qdf = df.head(20)[["vec_id", "embedding"]]
    Q = np.array(qdf["embedding"].tolist())
    bf = brute_force_ann(ds, Q, qdf["vec_id"].to_numpy(), k=10)

    raw_idx = str(tmp_path / "raw")
    build_ivf_index(ds, raw_idx, n_centroids=8, pq_m=16, pq_ks=64, seed=7)
    raw = ann_search(raw_idx, ray.data.from_pandas(qdf), k=10, nprobe=8, use_pq=True).to_pandas()

    res_idx = str(tmp_path / "res")
    build_ivf_index(ds, res_idx, n_centroids=8, pq_m=16, pq_ks=64, pq_residual=True, seed=7)
    res = ann_search(res_idx, ray.data.from_pandas(qdf), k=10, nprobe=8, use_pq=True).to_pandas()

    r_raw = _recall(raw, bf, 10)
    r_res = _recall(res, bf, 10)
    assert r_res >= r_raw
    assert r_res >= 0.8


# ---------------------------------------------------------------------------
# fvecs/bvecs/ivecs io + uint8 L2 path (reference binary_io.hpp:16-133,
# uint8 SIFT configuration index_ivf.cpp:254-255)
# ---------------------------------------------------------------------------


def test_vecs_roundtrip(tmp_path):
    from mini_ivf_ray.sources.vectors import read_vecs, write_vecs

    rng = np.random.default_rng(3)
    cases = [
        ("a.fvecs", rng.normal(size=(37, 16)).astype(np.float32)),
        ("b.bvecs", rng.integers(0, 256, size=(53, 8)).astype(np.uint8)),
        ("c.ivecs", rng.integers(-5, 99, size=(11, 4)).astype(np.int32)),
    ]
    for name, mat in cases:
        p = str(tmp_path / name)
        write_vecs(p, mat)
        back = read_vecs(p)
        assert back.dtype == mat.dtype
        np.testing.assert_array_equal(back, mat)


def test_read_vectors_distributed_matches_local(tmp_path):
    from mini_ivf_ray.sources.vectors import read_vecs, read_vectors, write_vecs

    rng = np.random.default_rng(5)
    mat = rng.integers(0, 256, size=(3000, 12)).astype(np.uint8)
    p = str(tmp_path / "x.bvecs")
    write_vecs(p, mat)
    ds = read_vectors(p, override_num_blocks=7)
    df = ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert len(df) == 3000
    got = np.array(df["embedding"].tolist(), dtype=np.uint8)
    np.testing.assert_array_equal(got, mat)
    assert df["vec_id"].tolist() == list(range(3000))


def test_uint8_l2_ivf_matches_bruteforce(tmp_path):
    """uint8 vectors, L2 metric, nprobe=all: IVF result must be
    rank-identical to the exhaustive L2 oracle (the reference's SIFT
    shape: uint8 base + L2, test_ivf_sift100m_baseline.cpp:27-28)."""
    import ray.data

    from mini_ivf_ray.pipelines.similarity import (
        ann_search,
        brute_force_ann,
        build_ivf_index,
    )
    from mini_ivf_ray.sources.vectors import read_vectors, write_vecs

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=(1200, 16)).astype(np.uint8)
    p = str(tmp_path / "base.bvecs")
    write_vecs(p, base)
    idx = str(tmp_path / "u8idx")
    build_ivf_index(
        read_vectors(p), idx, n_centroids=8, seed=3, metric="l2"
    )
    Q = rng.integers(0, 256, size=(6, 16)).astype(np.uint8)
    qids = np.arange(6)
    qds = ray.data.from_items(
        [
            {"vec_id": int(i), "embedding": q.tolist()}
            for i, q in zip(qids, Q)
        ]
    )
    got = (
        ann_search(idx, qds, k=10, nprobe=8)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    oracle = brute_force_ann(
        read_vectors(p), Q, qids, k=10, metric="l2"
    ).sort_values(["query_id", "rank"]).reset_index(drop=True)
    np.testing.assert_array_equal(
        got["vec_id"].to_numpy(), oracle["vec_id"].to_numpy()
    )
    np.testing.assert_allclose(
        got["dist2"].to_numpy(), oracle["dist2"].to_numpy(), rtol=0, atol=1e-6
    )
    # segments actually stored uint8 (the 8x memory point)
    import pyarrow.parquet as pqm

    from mini_ivf_ray.state import manifest as mf

    seg = pqm.read_table(
        os.path.join(mf.partition_dir(idx, 0), "vectors.parquet")
    )
    assert seg.schema.field("embedding").type.value_type == pa.uint8()


def test_hdf5_roundtrip_and_distributed_read(tmp_path):
    """HDF5 IO (reference hdf5_io.h:52-87), now dependency-free via
    h5lite: write/read round-trip plus the distributed Ray range-read
    surface.  No h5py required."""
    from mini_ivf_ray.sources import hdf5 as h5

    mat = np.arange(60, dtype=np.float32).reshape(10, 6)
    p = str(tmp_path / "x.hdf5")
    h5.write_hdf5_matrix(p, mat, "train")
    np.testing.assert_array_equal(h5.read_hdf5_matrix(p, "train"), mat)
    # append a second dataset; the first must survive (h5py "a" mode)
    gt = np.arange(20, dtype=np.int32).reshape(5, 4)
    h5.write_hdf5_matrix(p, gt, "neighbors")
    np.testing.assert_array_equal(h5.read_hdf5_matrix(p, "train"), mat)
    np.testing.assert_array_equal(h5.read_hdf5_matrix(p, "neighbors"), gt)
    df = h5.read_hdf5_vectors(p, "train").to_pandas().sort_values("vec_id")
    np.testing.assert_array_equal(
        np.array(df["embedding"].tolist(), dtype=np.float32), mat
    )


def test_groundtruth_cli(tmp_path):
    """Reference toolkits/get_groundtruth.cpp parity: exhaustive top-k
    written as .ivecs neighbors + .fvecs scores; each query's first
    neighbor is itself."""
    from mini_ivf_ray.__main__ import main
    from mini_ivf_ray.sources.vectors import read_fvecs, read_ivecs

    out = str(tmp_path / "gt")
    rc = main(
        ["groundtruth", "/root/testdata/sf0.001/embeddings.parquet", out,
         "--k", "3", "--nq", "5"]
    )
    assert rc == 0
    ids = read_ivecs(out + ".ivecs")
    sc = read_fvecs(out + ".fvecs")
    assert ids.shape == (5, 3) and sc.shape == (5, 3)
    np.testing.assert_array_equal(ids[:, 0], np.arange(5))


def test_ivf_build_resume(tmp_path):
    """ANN build resume parity with the fulltext build: committed
    partitions are skipped; the resumed index answers identically."""
    import json
    import shutil

    from mini_ivf_ray.pipelines.similarity import ann_search, build_ivf_index
    from mini_ivf_ray.state import manifest as mf

    df = _clustered_embeddings(n=300, seed=9)
    rows = [
        {"vec_id": int(i), "embedding": e}
        for i, e in zip(df["vec_id"], df["embedding"])
    ]
    ds = ray.data.from_items(rows)
    clean = str(tmp_path / "clean")
    build_ivf_index(ds, clean, n_centroids=6, seed=5)
    broken = str(tmp_path / "broken")
    shutil.copytree(clean, broken)
    os.remove(os.path.join(broken, "manifest.json"))
    shutil.rmtree(mf.partition_dir(broken, 2))
    assert 2 in mf.pending_partitions(broken, 6)
    kept = os.path.getmtime(mf.partition_manifest_path(broken, 0))
    build_ivf_index(ray.data.from_items(rows), broken, n_centroids=6, seed=5)
    assert os.path.getmtime(mf.partition_manifest_path(broken, 0)) == kept
    qds = ray.data.from_items(rows[:5])
    a = ann_search(clean, qds, k=5, nprobe=6).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    qds2 = ray.data.from_items(rows[:5])
    b = ann_search(broken, qds2, k=5, nprobe=6).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_codebook_fvecs_roundtrip(tmp_path):
    """Reference codebook interop (quantizer.cpp:108-131): export the
    trained codebooks as <prefix>centers.fvecs (one flat record), then
    re-import into a fresh index dir and verify float32-exact equality
    plus unchanged search results."""
    import os

    import numpy as np

    import ray.data
    from mini_ivf_ray.pipelines.similarity import (
        ann_search,
        build_ivf_index,
        export_codebook_fvecs,
        import_codebook_fvecs,
    )

    rng = np.random.default_rng(17)
    mat = rng.normal(size=(300, 16)).astype(np.float32)
    ds = ray.data.from_items(
        [
            {"vec_id": i, "embedding": v.tolist()}
            for i, v in enumerate(mat)
        ]
    )
    idx = str(tmp_path / "idx")
    build_ivf_index(ds, idx, n_centroids=4, pq_m=4, pq_ks=8, seed=5)
    assert os.path.exists(os.path.join(idx, "cq_centers.fvecs"))
    assert os.path.exists(os.path.join(idx, "pq_centers.fvecs"))

    z = np.load(os.path.join(idx, "centroids.npz"))
    idx2 = str(tmp_path / "idx2")
    os.makedirs(idx2)
    for f in ("cq_centers.fvecs", "pq_centers.fvecs"):
        with open(os.path.join(idx, f), "rb") as a, open(
            os.path.join(idx2, f), "wb"
        ) as b:
            b.write(a.read())
    import_codebook_fvecs(idx2, dim=16, n_centroids=4, pq_m=4, pq_ks=8)
    z2 = np.load(os.path.join(idx2, "centroids.npz"))
    # float32 fvecs storage: exact at float32 resolution
    assert np.array_equal(z["cent"].astype(np.float32), z2["cent"].astype(np.float32))
    assert np.array_equal(z["books"].astype(np.float32), z2["books"].astype(np.float32))

    # populate idx2 on the imported codebooks (the reference
    # SetCentroids -> Populate workflow) and compare searches
    build_ivf_index(ds, idx2, n_centroids=4, pq_m=4, pq_ks=8, seed=5)
    qds = ray.data.from_items(
        [{"vec_id": 900 + i, "embedding": mat[i].tolist()} for i in range(5)]
    )
    a = ann_search(idx, qds, k=5, nprobe=4).to_pandas()
    b = ann_search(idx2, qds, k=5, nprobe=4).to_pandas()
    # imported codebooks are float32-rounded; ranks must match
    assert a[["query_id", "rank", "vec_id"]].equals(
        b[["query_id", "rank", "vec_id"]]
    )


def test_sq8_codec_error_bound():
    from mini_ivf_ray.pipelines.similarity import _sq_encode, _train_sq

    rng = np.random.default_rng(11)
    x = rng.normal(size=(500, 24))
    vmin, vscale = _train_sq(x)
    codes = _sq_encode(x, vmin, vscale)
    decoded = vmin + codes.astype(np.float64) * vscale
    # in-range values decode within half a quantization step per dim
    assert (np.abs(decoded - x) <= vscale / 2 + 1e-12).all()
    # constant dims survive (scale 0 -> code 0 -> exact decode)
    xc = np.hstack([x, np.full((500, 1), 3.7)])
    vmin2, vscale2 = _train_sq(xc)
    codes2 = _sq_encode(xc, vmin2, vscale2)
    assert (codes2[:, -1] == 0).all()
    assert np.allclose(vmin2[-1], 3.7)


def test_sq8_full_probe_high_recall(tmp_path):
    df = _clustered_embeddings(n=600)
    ds = ray.data.from_pandas(df[["vec_id", "embedding"]])
    idx = str(tmp_path / "sq8")
    meta = build_ivf_index(ds, idx, n_centroids=8, seed=7, sq_bits=8)
    assert meta["kind"] == "ivfsq8"
    # segments carry only uint8 codes, no float embedding column
    import pyarrow.parquet as pqm

    from mini_ivf_ray.state import manifest as mf

    seg = pqm.read_table(
        os.path.join(mf.partition_dir(idx, meta["partitions"][0]["partition"]),
                     "vectors.parquet")
    )
    assert "sq" in seg.column_names and "embedding" not in seg.column_names

    qdf = df.head(20)[["vec_id", "embedding"]]
    Q = np.array(qdf["embedding"].tolist())
    bf = brute_force_ann(ds, Q, qdf["vec_id"].to_numpy(), k=10)
    res = ann_search(idx, ray.data.from_pandas(qdf), k=10, nprobe=8).to_pandas()
    # full probe: quantization is the only error source
    assert _recall(res, bf, 10) >= 0.95
    # self is still its own nearest neighbour under quantized scores
    r0 = res[res["rank"] == 0].sort_values("query_id")
    assert (r0["vec_id"].to_numpy() == qdf["vec_id"].to_numpy()).all()
    # partial probe still works (routing unchanged by quantization)
    res3 = ann_search(idx, ray.data.from_pandas(qdf), k=10, nprobe=3).to_pandas()
    assert _recall(res3, bf, 10) >= 0.8


def test_ivf_append_populate(tmp_path):
    """Reference LoadIndex -> Populate (index_ivfpq.cpp:83-120): new
    vectors onto committed codebooks; full-probe search over the union
    equals brute force exactly (raw IVF stores exact vectors)."""
    from mini_ivf_ray.pipelines.similarity import append_ivf_index

    df = _clustered_embeddings(n=600)
    a, b = df.iloc[:400], df.iloc[400:]
    ds_a = ray.data.from_pandas(a[["vec_id", "embedding"]])
    idx = str(tmp_path / "ivfapp")
    build_ivf_index(ds_a, idx, n_centroids=8, seed=7)

    meta = append_ivf_index(
        lambda: ray.data.from_pandas(b[["vec_id", "embedding"]]), idx
    )
    assert meta["counters"]["n_vectors"] == 600
    assert meta["lineage"]["increments"][-1]["new_vectors"] == 200

    union = ray.data.from_pandas(df[["vec_id", "embedding"]])
    qdf = df.iloc[390:410][["vec_id", "embedding"]]  # straddles A/B
    Q = np.array(qdf["embedding"].tolist())
    bf = brute_force_ann(union, Q, qdf["vec_id"].to_numpy(), k=5).sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    res = (
        ann_search(idx, ray.data.from_pandas(qdf), k=5, nprobe=8)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    np.testing.assert_array_equal(res["vec_id"].to_numpy(), bf["vec_id"].to_numpy())
    np.testing.assert_allclose(res["cosine"].to_numpy(), bf["cosine"].to_numpy(), atol=2e-6)

    # duplicate ids raise; skip mode drops them
    import pytest as _pytest

    with _pytest.raises(Exception, match="already"):
        append_ivf_index(
            lambda: ray.data.from_pandas(b[["vec_id", "embedding"]]), idx
        )
    # a failed append leaves a marker: plain build refuses, resume works
    assert os.path.exists(os.path.join(idx, "ivf_append.json"))
    with _pytest.raises(RuntimeError, match="append"):
        build_ivf_index(ds_a, idx, n_centroids=8, seed=7)
    meta2 = append_ivf_index(
        lambda: ray.data.from_pandas(b[["vec_id", "embedding"]]), idx,
        on_existing="skip",
    )
    assert meta2["counters"]["n_vectors"] == 600  # nothing re-added
    assert meta2["lineage"]["increments"][-1]["new_vectors"] == 0


def test_ivf_append_resume_no_duplicates(tmp_path):
    """Crash after SOME partitions merged, then resume: per-partition
    increment lineage prevents double-merging."""
    from mini_ivf_ray.pipelines.similarity import append_ivf_index
    from mini_ivf_ray.state import manifest as mf_mod

    df = _clustered_embeddings(n=500, seed=5)
    a, b = df.iloc[:350], df.iloc[350:]
    idx = str(tmp_path / "ivfres")
    build_ivf_index(
        ray.data.from_pandas(a[["vec_id", "embedding"]]), idx,
        n_centroids=8, seed=7,
    )

    # first attempt dies before merging partition 0 (other partitions
    # may or may not have committed first -- ray schedules groups in
    # any order, which is exactly the crash window being tested)
    with pytest.raises(Exception, match="simulated crash"):
        append_ivf_index(
            lambda: ray.data.from_pandas(b[["vec_id", "embedding"]]), idx,
            _fail_parts=(0, 1),
        )
    assert os.path.exists(os.path.join(idx, "ivf_append.json"))
    meta = append_ivf_index(
        lambda: ray.data.from_pandas(b[["vec_id", "embedding"]]), idx
    )
    assert meta["counters"]["n_vectors"] == 500
    # no vec_id appears twice anywhere
    import pyarrow.parquet as pqm

    seen = []
    for p in range(8):
        path = os.path.join(mf_mod.partition_dir(idx, p), "vectors.parquet")
        if os.path.exists(path):
            seen.append(pqm.read_table(path)["vec_id"].to_numpy())
    seen = np.concatenate(seen)
    assert len(seen) == 500 and len(np.unique(seen)) == 500


def test_refine_sq8_equals_bruteforce(tmp_path):
    """Two-stage refine (Faiss IndexRefine pattern): SQ8 candidates at
    depth 50, exact re-rank -> identical to exact brute force."""
    from mini_ivf_ray.pipelines.similarity import refine_ann

    df = _clustered_embeddings(n=600)
    ds = ray.data.from_pandas(df[["vec_id", "embedding"]])
    idx = str(tmp_path / "sq8r")
    build_ivf_index(ds, idx, n_centroids=8, seed=7, sq_bits=8)

    qdf = df.head(15)[["vec_id", "embedding"]]
    Q = np.array(qdf["embedding"].tolist())
    bf = brute_force_ann(ds, Q, qdf["vec_id"].to_numpy(), k=10).sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    res = refine_ann(
        idx, Q, qdf["vec_id"].to_numpy(), ds, k=10, depth=50
    ).sort_values(["query_id", "rank"]).reset_index(drop=True)
    np.testing.assert_array_equal(res["vec_id"].to_numpy(), bf["vec_id"].to_numpy())
    np.testing.assert_allclose(res["cosine"].to_numpy(), bf["cosine"].to_numpy(), atol=1e-9)


def test_vector_delete_and_compact(tmp_path):
    """ANN maintenance lifecycle: tombstoned vectors vanish from search
    immediately (survivor scores unchanged); compaction physically
    removes them and search equals brute force over the remainder."""
    from mini_ivf_ray.pipelines.similarity import (
        compact_ivf_index,
        delete_vectors,
        deleted_vec_ids,
    )
    from mini_ivf_ray.state import manifest as mf_mod

    df = _clustered_embeddings(n=500, seed=9)
    ds = ray.data.from_pandas(df[["vec_id", "embedding"]])
    idx = str(tmp_path / "ivfdel")
    build_ivf_index(ds, idx, n_centroids=8, seed=7)

    victims = df["vec_id"].to_numpy()[::4]
    out = delete_vectors(idx, victims)
    assert out["total_tombstones"] == len(victims)
    assert np.array_equal(deleted_vec_ids(idx), np.sort(victims))
    with pytest.raises(KeyError):
        delete_vectors(idx, [999999])

    qdf = df.head(12)[["vec_id", "embedding"]]
    Q = np.array(qdf["embedding"].tolist())
    keep_df = df[~df["vec_id"].isin(victims)]
    bf = brute_force_ann(
        ray.data.from_pandas(keep_df[["vec_id", "embedding"]]),
        Q, qdf["vec_id"].to_numpy(), k=5,
    ).sort_values(["query_id", "rank"]).reset_index(drop=True)

    res = (
        ann_search(idx, ray.data.from_pandas(qdf), k=5, nprobe=8)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    np.testing.assert_array_equal(res["vec_id"].to_numpy(), bf["vec_id"].to_numpy())
    np.testing.assert_allclose(res["cosine"].to_numpy(), bf["cosine"].to_numpy(), atol=2e-6)

    meta = compact_ivf_index(idx)
    assert deleted_vec_ids(idx).size == 0
    assert meta["counters"]["n_vectors"] == len(df) - len(victims)
    # victims physically gone from every segment
    import pyarrow.parquet as pqm

    for p in range(8):
        path = os.path.join(mf_mod.partition_dir(idx, p), "vectors.parquet")
        if os.path.exists(path):
            vid = pqm.read_table(path)["vec_id"].to_numpy()
            assert not np.isin(vid, victims).any()
    # search after compaction still equals brute force over survivors
    res2 = (
        ann_search(idx, ray.data.from_pandas(qdf), k=5, nprobe=8)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    np.testing.assert_array_equal(res2["vec_id"].to_numpy(), bf["vec_id"].to_numpy())
    # compaction with no tombstones is a no-op
    again = compact_ivf_index(idx)
    assert again["counters"]["n_vectors"] == meta["counters"]["n_vectors"]

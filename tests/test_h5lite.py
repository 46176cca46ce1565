"""h5lite: the dependency-free HDF5 subset (sources/h5lite.py).

Covers the reference's ann-benchmarks surface (hdf5_io.h:52-87 —
train/test/neighbors/distances 2-D numeric datasets) plus structural
spec conformance of the files the writer emits (superblock v0 layout,
EOF address, sorted SNOD entries) and the unsupported-feature escape
hatch to h5py.
"""

import os
import struct

import numpy as np
import pytest

from mini_ivf_ray.sources import h5lite


def test_roundtrip_all_dtypes_and_ranks(tmp_path):
    rng = np.random.default_rng(3)
    p = str(tmp_path / "t.h5")
    ds = {
        "f4": rng.standard_normal((17, 5)).astype("<f4"),
        "f8": rng.standard_normal((4, 9)).astype("<f8"),
        "i4": rng.integers(-(2**30), 2**30, (6, 3)).astype("<i4"),
        "i8": rng.integers(-(2**60), 2**60, 11).astype("<i8"),
        "u1": rng.integers(0, 256, (3, 2, 4)).astype("<u1"),  # rank 3
        "u2": rng.integers(0, 2**16, 8).astype("<u2"),
    }
    h5lite.write_h5(p, ds)
    meta = h5lite.read_h5_meta(p)
    assert sorted(meta) == sorted(ds)
    for k, a in ds.items():
        assert meta[k].shape == a.shape and meta[k].dtype == a.dtype
        out = h5lite.read_h5(p, k)
        np.testing.assert_array_equal(out.reshape(a.shape), a)


def test_ann_benchmarks_surface(tmp_path):
    """The exact file shape the reference ingests (hdf5_io.h:52-87)."""
    rng = np.random.default_rng(4)
    p = str(tmp_path / "glove-like.hdf5")
    train = rng.standard_normal((200, 25)).astype(np.float32)
    test = rng.standard_normal((20, 25)).astype(np.float32)
    neighbors = rng.integers(0, 200, (20, 10)).astype(np.int32)
    distances = rng.standard_normal((20, 10)).astype(np.float32)
    h5lite.write_h5(
        p,
        {
            "train": train,
            "test": test,
            "neighbors": neighbors,
            "distances": distances,
        },
    )
    np.testing.assert_array_equal(h5lite.read_h5(p, "train"), train)
    np.testing.assert_array_equal(h5lite.read_h5(p, "neighbors"), neighbors)
    # row-range reads (the distributed reader's primitive)
    np.testing.assert_array_equal(
        h5lite.read_h5(p, "train", rows=(50, 75)), train[50:75]
    )
    np.testing.assert_array_equal(
        h5lite.read_h5(p, "test", rows=(19, 99)), test[19:]
    )


def test_structural_spec_conformance(tmp_path):
    """Byte-level checks against the public HDF5 file format spec."""
    p = str(tmp_path / "s.h5")
    h5lite.write_h5(p, {"b": np.ones((2, 2), "<f4"), "a": np.zeros(3, "<i4")})
    raw = open(p, "rb").read()
    assert raw[:8] == b"\x89HDF\r\n\x1a\n"
    # superblock v0: versions 0, offsets/lengths 8 bytes
    assert raw[8] == 0 and raw[13] == 8 and raw[14] == 8
    leaf_k, internal_k = struct.unpack_from("<HH", raw, 16)
    assert leaf_k == 4 and internal_k == 16
    (eof,) = struct.unpack_from("<Q", raw, 40)
    assert eof == os.path.getsize(p) == len(raw)
    assert b"HEAP" in raw and b"TREE" in raw and b"SNOD" in raw
    # SNOD entries sorted by link name ('a' before 'b')
    meta = h5lite.read_h5_meta(p)
    assert list(meta) == ["a", "b"]
    # heap names NUL-terminated ASCII
    assert b"a\x00" in raw and b"b\x00" in raw


def test_empty_and_errors(tmp_path):
    p = str(tmp_path / "e.h5")
    h5lite.write_h5(p, {"train": np.empty((0, 7), "<f4")})
    out = h5lite.read_h5(p, "train")
    assert out.shape == (0, 7) and out.dtype == np.dtype("<f4")

    with pytest.raises(ValueError, match="not an HDF5 file"):
        open(str(tmp_path / "junk"), "wb").write(b"nope" * 4)
        h5lite.read_h5_meta(str(tmp_path / "junk"))
    with pytest.raises(ValueError, match="unsupported dtype"):
        h5lite.write_h5(str(tmp_path / "x.h5"), {"c": np.array(["a", "b"])})
    with pytest.raises(ValueError, match="scalar"):
        h5lite.write_h5(str(tmp_path / "x.h5"), {"s": np.float32(1.0)})
    with pytest.raises(ValueError, match="bad dataset name"):
        h5lite.write_h5(str(tmp_path / "x.h5"), {"a/b": np.ones(2, "<f4")})


def test_chunked_roundtrip_plain(tmp_path):
    """Chunked layout (v1 chunk B-tree), no filters: full reads and row
    ranges equal the source, including EDGE chunks (shape not divisible
    by the chunk shape)."""
    p = str(tmp_path / "c.h5")
    a = np.arange(7 * 5, dtype="<f4").reshape(7, 5)
    h5lite.write_h5(p, {"train": a}, chunks={"train": (3, 2)})
    info = h5lite.read_h5_meta(p)["train"]
    assert info.is_chunked and info.chunk_shape == (3, 2)
    assert len(info.chunks) == 3 * 3  # ceil(7/3) x ceil(5/2)
    np.testing.assert_array_equal(h5lite.read_h5(p, "train"), a)
    for lo, hi in ((0, 3), (2, 5), (5, 7), (6, 6), (0, 7)):
        np.testing.assert_array_equal(
            h5lite.read_h5(p, "train", rows=(lo, hi)), a[lo:hi]
        )


def test_chunked_roundtrip_gzip_shuffle(tmp_path):
    """gzip + byte-shuffle filters (the stock h5py compression combo):
    bit-exact round trip for float and int, 1-D and 2-D, plus mixed
    contiguous/chunked datasets in one file."""
    p = str(tmp_path / "cz.h5")
    rng = np.random.default_rng(3)
    mat = rng.standard_normal((50, 17)).astype("<f8")
    vec = rng.integers(0, 1000, size=201).astype("<i4")
    plain = np.arange(6, dtype="<u2")
    h5lite.write_h5(
        p,
        {"train": mat, "ids": vec, "plain": plain},
        chunks={"train": (16, 17), "ids": (64,)},
        gzip_level=6,
        shuffle=True,
    )
    meta = h5lite.read_h5_meta(p)
    assert [f[0] for f in meta["train"].filters] == [2, 1]  # shuffle, deflate
    assert not meta["plain"].is_chunked
    # compression actually happened (random floats still shrink a bit
    # via shuffle+deflate framing; integers compress hard)
    assert meta["ids"].nbytes < vec.nbytes
    np.testing.assert_array_equal(h5lite.read_h5(p, "train"), mat)
    np.testing.assert_array_equal(h5lite.read_h5(p, "ids"), vec)
    np.testing.assert_array_equal(h5lite.read_h5(p, "plain"), plain)
    np.testing.assert_array_equal(
        h5lite.read_h5(p, "train", rows=(10, 40)), mat[10:40]
    )
    np.testing.assert_array_equal(
        h5lite.read_h5(p, "ids", rows=(100, 201)), vec[100:201]
    )


def test_chunked_unknown_filter_escape_hatch(tmp_path):
    """An unregistered filter id must raise the use-h5py error — never a
    silent wrong answer."""
    p = str(tmp_path / "cf.h5")
    a = np.arange(12, dtype="<f4").reshape(3, 4)
    h5lite.write_h5(p, {"train": a}, chunks={"train": (3, 4)}, gzip_level=1)
    raw = bytearray(open(p, "rb").read())
    # the filter pipeline message encodes deflate as id 1 with one
    # client value: rewrite the id to an unregistered 0x00FF
    needle = struct.pack("<HHHH", 1, 0, 1, 1)
    i = raw.find(needle)
    assert i > 0
    raw[i : i + 2] = struct.pack("<H", 0x00FF)
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="filter id 255 unsupported"):
        h5lite.read_h5(p, "train")


def test_big_endian_and_subgroup_rejected(tmp_path):
    with pytest.raises(ValueError, match="at most 8 datasets"):
        h5lite.write_h5(
            str(tmp_path / "m.h5"),
            {f"d{i}": np.ones(1, "<f4") for i in range(9)},
        )
    # big-endian input is transparently converted on write
    p = str(tmp_path / "be.h5")
    a = np.arange(6, dtype=">f4").reshape(2, 3)
    h5lite.write_h5(p, {"train": a})
    np.testing.assert_array_equal(
        h5lite.read_h5(p, "train"), a.astype("<f4")
    )


def test_distributed_reader_over_chunked_gzip(tmp_path, ray_session):
    """sources.hdf5.read_hdf5_vectors streams a CHUNKED+gzip dataset:
    per-task row ranges decompress only their overlapping chunks."""
    from mini_ivf_ray.sources.hdf5 import read_hdf5_vectors

    p = str(tmp_path / "dist.h5")
    rng = np.random.default_rng(11)
    mat = rng.standard_normal((300, 9)).astype("<f4")
    h5lite.write_h5(
        p, {"train": mat}, chunks={"train": (64, 9)}, gzip_level=4, shuffle=True
    )
    df = read_hdf5_vectors(p, "train").to_pandas().sort_values("vec_id")
    assert len(df) == 300
    got = np.stack(df["embedding"].to_numpy())
    np.testing.assert_array_equal(got, mat)

"""h5lite — dependency-free HDF5 subset (struct + numpy only).

The reference ingests ann-benchmarks HDF5 files (hdf5_io.h:52-87: 2-D
float/int datasets named train/test/neighbors/distances).  ``h5py`` is
not installed in this container, so this module implements the needed
subset of the PUBLIC HDF5 File Format Specification directly:

* **superblock version 0** (spec section II.A.1) — what stock libhdf5 /
  h5py write by default,
* **version-1 object headers** (IV.A.1.a) with Dataspace (IV.A.2.b),
  Datatype classes 0/1 = fixed-point/IEEE-float (IV.A.2.d), Data Layout
  version 3 class 1 = contiguous (IV.A.2.i), and Object Header
  Continuation (IV.A.2.q) messages,
* **version-1 group B-trees + SNOD symbol-table nodes + local heaps**
  (III.A.1, III.B, III.D) for the root group's link table.

That subset is exactly the layout ``h5py.File(p, "w").create_dataset
(name, data=mat)`` produces for plain numeric arrays (default libver),
so the reader handles real ann-benchmarks files, and files this writer
produces are readable by stock h5py/libhdf5.  CHUNKED datasets
(Data Layout v3 class 2 + version-1 chunk B-trees, III.A.1 node type
1) with the standard deflate(gzip)/shuffle/fletcher32 filter pipeline
(IV.A.2.l) are supported too — the ``h5py.create_dataset(...,
chunks=..., compression="gzip", shuffle=True)`` combination — with
row-range reads touching only overlapping chunks.  Everything else
(v2+ superblocks, compact layout, unregistered filters, sub-groups)
raises a clear error naming h5py as the escape hatch.

Scale note: contiguous layout means a dataset is (address, nbytes) of
raw little-endian rows — the distributed reader in ``sources/hdf5.py``
parses metadata once on the driver and lets every task seek+read only
its own row range, the same fixed-record pattern as the fvecs reader
(`sources/vectors.py`).
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF

# datatype class ids (spec IV.A.2.d)
_CLS_FIXED, _CLS_FLOAT = 0, 1

# message type ids
_MSG_NIL = 0x0000
_MSG_DATASPACE = 0x0001
_MSG_DATATYPE = 0x0003
_MSG_FILTER = 0x000B
_MSG_LAYOUT = 0x0008
_MSG_CONTINUATION = 0x0010
_MSG_SYMBOL_TABLE = 0x0011

# filter ids (spec IV.A.2.l; registered standard filters)
_FILTER_DEFLATE = 1
_FILTER_SHUFFLE = 2
_FILTER_FLETCHER32 = 3

_SUPPORTED_DTYPES = {
    np.dtype(t)
    for t in ("<f4", "<f8", "<i1", "<i2", "<i4", "<i8", "<u1", "<u2", "<u4", "<u8")
}


@dataclass(frozen=True)
class DatasetInfo:
    """Everything needed to range-read a dataset.

    Contiguous layout: (offset, nbytes) of raw little-endian rows.
    Chunked layout (v1 chunk B-tree, spec III.A.1 node type 1):
    ``chunk_shape`` + ``chunks`` = ((coords, addr, stored_nbytes,
    filter_mask), ...) + ``filters`` = ((filter_id, client_values),
    ...) applied in pipeline order at write time."""

    name: str
    shape: tuple[int, ...]
    dtype: np.dtype
    offset: int  # byte address of the first element (UNDEF if empty/chunked)
    nbytes: int
    chunk_shape: tuple[int, ...] | None = None
    chunks: tuple = ()
    filters: tuple = ()

    @property
    def is_chunked(self) -> bool:
        return self.chunk_shape is not None

    @property
    def row_nbytes(self) -> int:
        per = self.dtype.itemsize
        for d in self.shape[1:]:
            per *= d
        return per


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _dtype_message(dt: np.dtype) -> bytes:
    """Datatype message body for a little-endian numeric dtype."""
    size = dt.itemsize
    if dt.kind == "f":
        cls_ver = (1 << 4) | _CLS_FLOAT
        # bit field: byte order LE (bit0=0), mantissa normalization =
        # "msb of mantissa is implied and set" (bits 4-5 = 2)
        bits0 = 0x20
        sign_pos = size * 8 - 1
        if size == 4:
            exp_loc, exp_sz, man_sz, bias = 23, 8, 23, 127
        elif size == 8:
            exp_loc, exp_sz, man_sz, bias = 52, 11, 52, 1023
        else:
            raise ValueError(f"h5lite: unsupported float size {size}")
        props = struct.pack(
            "<HHBBBBI", 0, size * 8, exp_loc, exp_sz, 0, man_sz, bias
        )
        body = struct.pack("<BBBBI", cls_ver, bits0, sign_pos, 0, size) + props
    elif dt.kind in ("i", "u"):
        cls_ver = (1 << 4) | _CLS_FIXED
        bits0 = 0x08 if dt.kind == "i" else 0x00  # bit 3 = signed
        props = struct.pack("<HH", 0, size * 8)
        body = struct.pack("<BBBBI", cls_ver, bits0, 0, 0, size) + props
    else:
        raise ValueError(f"h5lite: unsupported dtype {dt}")
    return _pad8(body)


def _dataspace_message(shape: tuple[int, ...]) -> bytes:
    body = struct.pack("<BBBB", 1, len(shape), 0, 0) + b"\x00" * 4
    for d in shape:
        body += struct.pack("<Q", d)
    return _pad8(body)


def _layout_message(addr: int, nbytes: int) -> bytes:
    # version 3, class 1 (contiguous)
    return _pad8(struct.pack("<BBQQ", 3, 1, addr, nbytes))


def _chunk_layout_message(
    btree_addr: int, chunk_dims: tuple[int, ...], itemsize: int
) -> bytes:
    # version 3, class 2 (chunked): dimensionality = rank+1, B-tree
    # address, u32 dims with the element size as the final entry
    nd = len(chunk_dims) + 1
    return _pad8(
        struct.pack("<BBB", 3, 2, nd)
        + struct.pack("<Q", btree_addr)
        + struct.pack(f"<{nd}I", *chunk_dims, itemsize)
    )


def _filter_message(filters: tuple) -> bytes:
    # version 1 pipeline; standard filters carry no name
    body = struct.pack("<BB6x", 1, len(filters))
    for fid, cds in filters:
        body += struct.pack("<HHHH", fid, 0, 1, len(cds))
        body += struct.pack(f"<{len(cds)}I", *cds) if cds else b""
        if len(cds) % 2:
            body += b"\x00" * 4
    return _pad8(body)


def _chunk_grid(shape: tuple[int, ...], cs: tuple[int, ...]):
    """Chunk origin coordinates in increasing (row-major) order."""
    import itertools

    axes = [range(0, shape[d], cs[d]) for d in range(len(cs))]
    return list(itertools.product(*axes))


def _encode_chunks(a: np.ndarray, cs: tuple[int, ...], filters: tuple):
    """-> [(coords, stored bytes)] — edge chunks padded to full size
    (libhdf5 convention), filters applied in pipeline order."""
    import zlib

    out = []
    for coords in _chunk_grid(a.shape, cs):
        sel = tuple(
            slice(coords[d], min(coords[d] + cs[d], a.shape[d]))
            for d in range(len(cs))
        )
        block = np.zeros(cs, dtype=a.dtype)
        piece = a[sel]
        block[tuple(slice(0, s) for s in piece.shape)] = piece
        raw = block.tobytes()
        for fid, cds in filters:
            if fid == _FILTER_SHUFFLE:
                raw = (
                    np.frombuffer(raw, dtype=np.uint8)
                    .reshape(-1, a.dtype.itemsize)
                    .T.tobytes()
                )
            elif fid == _FILTER_DEFLATE:
                raw = zlib.compress(raw, int(cds[0]) if cds else 6)
            else:
                raise ValueError(f"h5lite writer: filter {fid} unsupported")
        out.append((coords, raw))
    return out


def _chunk_btree_blob(
    chunk_meta: list, chunk_addrs: list[int], shape, cs
) -> bytes:
    """One level-0 node-type-1 B-tree over all chunks (test-scale
    writer: a single node; the reader handles multi-level trees)."""
    nd = len(cs) + 1
    out = b"TREE" + struct.pack("<BBHQQ", 1, 0, len(chunk_meta), _UNDEF, _UNDEF)
    for (coords, raw), addr in zip(chunk_meta, chunk_addrs):
        out += struct.pack("<II", len(raw), 0)
        out += struct.pack(f"<{nd}Q", *coords, 0)
        out += struct.pack("<Q", addr)
    # rightmost key: one-past-last chunk origin per dimension
    end = tuple(-(-shape[d] // cs[d]) * cs[d] for d in range(len(cs)))
    out += struct.pack("<II", 0, 0)
    out += struct.pack(f"<{nd}Q", *end, 0)
    return out


def _chunk_btree_size(nchunks: int, rank: int) -> int:
    key_sz = 8 + 8 * (rank + 1)
    return 24 + nchunks * (key_sz + 8) + key_sz


def _message(mtype: int, body: bytes) -> bytes:
    assert len(body) % 8 == 0
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _object_header(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    # v1 prefix: version, reserved, nmsgs, refcount, header size, 4-byte pad
    return struct.pack("<BBHII4x", 1, 0, len(messages), 1, len(blob)) + blob


def write_h5(
    path: str,
    datasets: dict[str, np.ndarray],
    chunks: dict[str, tuple[int, ...]] | None = None,
    gzip_level: int | None = None,
    shuffle: bool = False,
) -> str:
    """Write ``{name: array}`` as a minimal-but-conformant HDF5 file
    (superblock v0, little-endian datasets in the root group).  Arrays
    must be numeric, rank >= 1.

    ``chunks[name]`` switches that dataset to the chunked layout (v1
    chunk B-tree, one level-0 node — test-scale); ``gzip_level`` /
    ``shuffle`` add the standard deflate / byte-shuffle filters to
    every chunked dataset (the combination stock
    ``h5py.create_dataset(..., chunks=..., compression="gzip",
    shuffle=True)`` produces)."""
    names = sorted(datasets)
    chunks = chunks or {}
    if not names:
        raise ValueError("h5lite: need at least one dataset")
    if len(names) > 8:
        # one SNOD holds at most 2 * leaf_K = 8 entries; the reference
        # surface needs 4 (train/test/neighbors/distances)
        raise ValueError("h5lite writer supports at most 8 datasets per file")
    arrays: dict[str, np.ndarray] = {}
    for name in names:
        if not name or "/" in name or not name.isascii():
            raise ValueError(f"h5lite: bad dataset name {name!r}")
        if np.ndim(datasets[name]) < 1:
            raise ValueError("h5lite: scalar datasets not supported")
        a = np.ascontiguousarray(datasets[name])
        if a.dtype.byteorder == ">":
            a = a.astype(a.dtype.newbyteorder("<"))
        if np.dtype(a.dtype.str.replace(">", "<")) not in _SUPPORTED_DTYPES:
            raise ValueError(f"h5lite: unsupported dtype {a.dtype} for {name!r}")
        arrays[name] = a

    # local heap data: offset 0 is the root group's empty link name
    heap_data = bytearray(b"\x00" * 8)
    name_off = {}
    for name in names:
        name_off[name] = len(heap_data)
        heap_data += _pad8(name.encode() + b"\x00")
    heap_data = bytes(heap_data)

    # per-dataset chunk plan (filters in pipeline/application order)
    wfilters: tuple = ()
    if shuffle:
        wfilters += ((_FILTER_SHUFFLE, ()),)  # itemsize filled per dataset
    if gzip_level is not None:
        wfilters += ((_FILTER_DEFLATE, (int(gzip_level),)),)
    chunk_plan: dict[str, tuple] = {}
    for name, cs in chunks.items():
        a = arrays[name]
        cs = tuple(int(c) for c in cs)
        if len(cs) != a.ndim or any(c < 1 for c in cs):
            raise ValueError(f"h5lite: bad chunk shape {cs} for {name!r}")
        fl = tuple(
            (fid, (a.dtype.itemsize,) if fid == _FILTER_SHUFFLE else cds)
            for fid, cds in wfilters
        )
        meta = _encode_chunks(a, cs, fl)
        if len(meta) > 512:
            raise ValueError(
                "h5lite writer: more than 512 chunks needs a multi-node "
                "B-tree (use h5py)"
            )
        chunk_plan[name] = (cs, fl, meta)

    # layout: superblock | root OH | heap hdr | heap data | btree | snod
    #         | dataset OHs | raw data (chunked: btree node + chunks)
    superblock_sz = 96
    root_oh = _object_header([_message(_MSG_SYMBOL_TABLE, b"\x00" * 16)])  # patched
    addr_root_oh = superblock_sz
    addr_heap_hdr = addr_root_oh + len(root_oh)
    addr_heap_data = addr_heap_hdr + 32
    addr_btree = addr_heap_data + len(heap_data)
    btree_sz = 24 + 8 + 8 + 8  # one child: key0, child0, key1
    addr_snod = addr_btree + btree_sz
    snod_sz = 8 + 40 * len(names)
    pos = addr_snod + snod_sz

    def ds_header(name: str, addr: int) -> bytes:
        a = arrays[name]
        msgs = [
            _message(_MSG_DATASPACE, _dataspace_message(a.shape)),
            _message(_MSG_DATATYPE, _dtype_message(a.dtype)),
        ]
        if name in chunk_plan:
            cs, fl, _meta = chunk_plan[name]
            if fl:
                msgs.append(_message(_MSG_FILTER, _filter_message(fl)))
            msgs.append(
                _message(
                    _MSG_LAYOUT,
                    _chunk_layout_message(addr, cs, a.dtype.itemsize),
                )
            )
        else:
            msgs.append(_message(_MSG_LAYOUT, _layout_message(addr, a.nbytes)))
        return _object_header(msgs)

    oh_addr, data_addr = {}, {}
    oh_blobs = {}
    chunk_addrs: dict[str, list[int]] = {}
    for name in names:
        oh = ds_header(name, 0)  # address patched in the emit pass
        oh_addr[name] = pos
        oh_blobs[name] = oh
        pos += len(oh)
    pos += -pos % 8
    for name in names:
        if name in chunk_plan:
            cs, _fl, meta = chunk_plan[name]
            data_addr[name] = pos  # the chunk B-tree node address
            pos += _chunk_btree_size(len(meta), len(cs))
            pos += -pos % 8
            addrs = []
            for _coords, raw in meta:
                addrs.append(pos)
                pos += len(raw)
            chunk_addrs[name] = addrs
            pos += -pos % 8
        else:
            data_addr[name] = pos if arrays[name].nbytes else _UNDEF
            pos += arrays[name].nbytes
            pos += -pos % 8
    eof = pos

    # now emit with real addresses
    out = bytearray()
    out += _SIG
    out += struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0)
    out += struct.pack("<HHI", 4, 16, 0)  # leaf K, internal K, flags
    out += struct.pack("<QQQQ", 0, _UNDEF, eof, _UNDEF)
    # root symbol table entry: name offset 0, OH addr, cache type 1,
    # scratch = (btree addr, heap addr)
    out += struct.pack("<QQII", 0, addr_root_oh, 1, 0)
    out += struct.pack("<QQ", addr_btree, addr_heap_hdr)
    assert len(out) == superblock_sz

    out += _object_header(
        [_message(_MSG_SYMBOL_TABLE, struct.pack("<QQ", addr_btree, addr_heap_hdr))]
    )
    out += b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data), _UNDEF, addr_heap_data)
    out += heap_data
    # group B-tree v1: one level-0 node with one SNOD child
    out += b"TREE" + struct.pack("<BBHQQ", 0, 0, 1, _UNDEF, _UNDEF)
    out += struct.pack("<QQQ", 0, addr_snod, name_off[names[-1]])
    out += b"SNOD" + struct.pack("<BBH", 1, 0, len(names))
    for name in names:  # sorted == heap-name order requirement
        out += struct.pack("<QQII16x", name_off[name], oh_addr[name], 0, 0)
    for name in names:
        oh = ds_header(name, data_addr[name])
        assert len(oh) == len(oh_blobs[name])
        out += oh
    out += b"\x00" * (-len(out) % 8)
    for name in names:
        if name in chunk_plan:
            cs, _fl, meta = chunk_plan[name]
            assert data_addr[name] == len(out)
            out += _chunk_btree_blob(
                meta, chunk_addrs[name], arrays[name].shape, cs
            )
            out += b"\x00" * (-len(out) % 8)
            for (_coords, raw), addr in zip(meta, chunk_addrs[name]):
                assert addr == len(out)
                out += raw
            out += b"\x00" * (-len(out) % 8)
        else:
            assert data_addr[name] in (_UNDEF, len(out))
            out += arrays[name].tobytes()
            out += b"\x00" * (-len(out) % 8)
    assert len(out) == eof

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out)
    os.replace(tmp, path)
    return path


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def _parse_datatype(body: bytes) -> np.dtype:
    cls_ver, bits0 = body[0], body[1]
    cls, ver = cls_ver & 0x0F, cls_ver >> 4
    if ver not in (1, 2, 3):
        raise ValueError(f"h5lite: datatype version {ver} unsupported")
    (size,) = struct.unpack_from("<I", body, 4)
    if bits0 & 0x01:
        raise ValueError("h5lite: big-endian datasets unsupported (use h5py)")
    if cls == _CLS_FLOAT:
        if size not in (4, 8):
            raise ValueError(f"h5lite: float{size * 8} unsupported")
        return np.dtype(f"<f{size}")
    if cls == _CLS_FIXED:
        kind = "i" if bits0 & 0x08 else "u"
        if size not in (1, 2, 4, 8):
            raise ValueError(f"h5lite: fixed-point size {size} unsupported")
        return np.dtype(f"<{kind}{size}")
    raise ValueError(f"h5lite: datatype class {cls} unsupported (use h5py)")


def _parse_dataspace(body: bytes) -> tuple[int, ...]:
    ver, rank = body[0], body[1]
    if ver == 1:
        off = 8
    elif ver == 2:
        off = 4
    else:
        raise ValueError(f"h5lite: dataspace version {ver} unsupported")
    return tuple(
        struct.unpack_from("<Q", body, off + 8 * i)[0] for i in range(rank)
    )


def _parse_layout(body: bytes):
    """-> ("contig", addr, nbytes) or ("chunked", btree_addr, chunk_dims)
    (chunk_dims excludes the trailing element-size pseudo-dimension)."""
    ver = body[0]
    if ver == 3:
        cls = body[1]
        if cls == 1:
            addr, nbytes = struct.unpack_from("<QQ", body, 2)
            return ("contig", addr, nbytes)
        if cls == 2:
            # chunked: dimensionality (= rank+1), B-tree address, then
            # u32 dim sizes whose LAST entry is the element size
            ndims = body[2]
            (btree_addr,) = struct.unpack_from("<Q", body, 3)
            dims = struct.unpack_from(f"<{ndims}I", body, 11)
            return ("chunked", btree_addr, tuple(int(d) for d in dims[:-1]))
        raise ValueError("h5lite: compact layout unsupported (use h5py)")
    if ver in (1, 2):
        # old-style layout message: dimensionality, class, then for
        # contiguous: address + dim sizes + element size
        rank, cls = body[1], body[2]
        if cls != 1:
            raise ValueError("h5lite: non-contiguous old-layout unsupported")
        (addr,) = struct.unpack_from("<Q", body, 8)
        dims = struct.unpack_from(f"<{rank}I", body, 16)
        (esize,) = struct.unpack_from("<I", body, 16 + 4 * rank)
        n = esize
        for d in dims:
            n *= d
        return ("contig", addr, n)
    raise ValueError(f"h5lite: layout version {ver} unsupported")


def _parse_filters(body: bytes) -> tuple:
    """Filter Pipeline message (IV.A.2.l) -> ((filter_id, client_vals),
    ...) in write/application order."""
    ver, n = body[0], body[1]
    if ver == 1:
        off = 8
    elif ver == 2:
        off = 2
    else:
        raise ValueError(f"h5lite: filter pipeline version {ver} unsupported")
    out = []
    for _ in range(n):
        fid, nlen, _flags, ncd = struct.unpack_from("<HHHH", body, off)
        off += 8
        if ver == 1:
            off += nlen + (-nlen % 8)  # name, padded to 8
        elif fid >= 256:
            off += nlen
        cds = struct.unpack_from(f"<{ncd}I", body, off)
        off += 4 * ncd
        if ver == 1 and ncd % 2:
            off += 4  # v1 pads odd client-data counts
        out.append((int(fid), tuple(int(c) for c in cds)))
    return tuple(out)


def _walk_chunk_btree(f, addr: int, ndims: int) -> tuple:
    """v1 B-tree, node type 1 (raw data chunks, spec III.A.1) ->
    ((chunk coords, chunk addr, stored nbytes, filter mask), ...).
    Keys carry rank+1 offsets (the trailing element-size dim is 0)."""
    if addr == _UNDEF:
        return ()
    f.seek(addr)
    if f.read(4) != b"TREE":
        raise ValueError("h5lite: bad chunk B-tree signature")
    ntype, level, used = struct.unpack("<BBH", f.read(4))
    if ntype != 1:
        raise ValueError("h5lite: expected node type 1 in chunk B-tree")
    f.read(16)  # left/right siblings
    key_sz = 8 + 8 * ndims
    raw = f.read(used * (key_sz + 8) + key_sz)
    out = []
    for i in range(used):
        base = i * (key_sz + 8)
        size, mask = struct.unpack_from("<II", raw, base)
        coords = struct.unpack_from(f"<{ndims}Q", raw, base + 8)
        (child,) = struct.unpack_from("<Q", raw, base + key_sz)
        if level > 0:
            out.extend(_walk_chunk_btree(f, child, ndims))
        else:
            out.append(
                (tuple(int(c) for c in coords[:-1]), int(child), int(size), int(mask))
            )
    return tuple(out)


def _defilter_chunk(
    raw: bytes, filters: tuple, mask: int, itemsize: int
) -> bytes:
    """Undo the filter pipeline (reverse order; mask bit i set == filter
    i was SKIPPED for this chunk)."""
    import zlib

    for i in range(len(filters) - 1, -1, -1):
        if mask & (1 << i):
            continue
        fid, cds = filters[i]
        if fid == _FILTER_DEFLATE:
            raw = zlib.decompress(raw)
        elif fid == _FILTER_SHUFFLE:
            es = int(cds[0]) if cds else itemsize
            arr = np.frombuffer(raw, dtype=np.uint8)
            raw = arr.reshape(es, -1).T.tobytes()
        elif fid == _FILTER_FLETCHER32:
            raw = raw[:-4]  # checksum not re-verified
        else:
            raise ValueError(f"h5lite: filter id {fid} unsupported (use h5py)")
    return raw


def _walk_v1_messages(f, oh_addr: int):
    """Yield (type, body bytes) for every message of a v1 object
    header, following continuation blocks."""
    f.seek(oh_addr)
    ver, _, nmsgs, _refs, hsize = struct.unpack("<BBHII", f.read(12))
    if ver != 1:
        raise ValueError(
            f"h5lite: object header version {ver} unsupported (use h5py)"
        )
    f.read(4)  # v1 prefix pad
    blocks = [f.read(hsize)]
    seen = 0
    bi = 0
    while bi < len(blocks):
        blob, pos = blocks[bi], 0
        while seen < nmsgs and pos + 8 <= len(blob):
            mtype, msize, _flags = struct.unpack_from("<HHB", blob, pos)
            body = blob[pos + 8 : pos + 8 + msize]
            pos += 8 + msize
            seen += 1
            if mtype == _MSG_CONTINUATION:
                caddr, clen = struct.unpack_from("<QQ", body, 0)
                f.seek(caddr)
                blocks.append(f.read(clen))
            else:
                yield mtype, body
        bi += 1
    if seen != nmsgs:
        raise ValueError("h5lite: truncated object header")


def _read_heap_name(f, heap_data_addr: int, off: int) -> str:
    f.seek(heap_data_addr + off)
    raw = b""
    while True:
        chunk = f.read(64)
        if not chunk:
            break
        raw += chunk
        if b"\x00" in chunk:
            break
    return raw.split(b"\x00", 1)[0].decode()


def read_h5_meta(path: str) -> dict[str, DatasetInfo]:
    """Parse superblock + root group, return contiguous-dataset
    metadata.  Raises ValueError naming h5py for unsupported features."""
    with open(path, "rb") as f:
        if f.read(8) != _SIG:
            raise ValueError(f"{path}: not an HDF5 file")
        ver = f.read(1)[0]
        if ver != 0:
            raise ValueError(
                f"h5lite: superblock version {ver} unsupported (use h5py)"
            )
        f.seek(13)
        so, sl = f.read(1)[0], f.read(1)[0]
        if (so, sl) != (8, 8):
            raise ValueError("h5lite: only 8-byte offsets/lengths supported")
        f.seek(56)  # root group symbol table entry
        _name_off, root_oh, cache = struct.unpack("<QQI", f.read(20))
        f.seek(56 + 24)
        btree_addr, heap_addr = struct.unpack("<QQ", f.read(16))
        if cache != 1:
            btree_addr = heap_addr = None
        # the root OH's symbol table message is authoritative
        for mtype, body in _walk_v1_messages(f, root_oh):
            if mtype == _MSG_SYMBOL_TABLE:
                btree_addr, heap_addr = struct.unpack_from("<QQ", body, 0)
                break
        if btree_addr is None:
            raise ValueError("h5lite: root group has no symbol table (use h5py)")
        f.seek(heap_addr)
        if f.read(4) != b"HEAP":
            raise ValueError("h5lite: bad local heap signature")
        f.seek(heap_addr + 24)
        (heap_data_addr,) = struct.unpack("<Q", f.read(8))

        # walk the group B-tree to SNOD leaves
        entries: list[tuple[int, int]] = []  # (name heap offset, OH addr)

        def walk(addr: int):
            f.seek(addr)
            sig = f.read(4)
            if sig == b"TREE":
                ntype, level, used = struct.unpack("<BBH", f.read(4))
                if ntype != 0:
                    raise ValueError("h5lite: unexpected B-tree node type")
                f.read(16)  # siblings
                # key0, child0, key1, child1, ... keyN
                raw = f.read(8 * (2 * used + 1))
                children = [
                    struct.unpack_from("<Q", raw, 8 * (2 * i + 1))[0]
                    for i in range(used)
                ]
                for c in children:
                    walk(c)
            elif sig == b"SNOD":
                _v, _r, nsym = struct.unpack("<BBH", f.read(4))
                raw = f.read(40 * nsym)
                for i in range(nsym):
                    noff, oaddr = struct.unpack_from("<QQ", raw, 40 * i)
                    entries.append((noff, oaddr))
            else:
                raise ValueError(f"h5lite: unexpected node signature {sig!r}")

        walk(btree_addr)

        out: dict[str, DatasetInfo] = {}
        for noff, oaddr in entries:
            name = _read_heap_name(f, heap_data_addr, noff)
            shape, dtype, layout, filters = None, None, None, ()
            for mtype, body in _walk_v1_messages(f, oaddr):
                if mtype == _MSG_DATASPACE:
                    shape = _parse_dataspace(body)
                elif mtype == _MSG_DATATYPE:
                    dtype = _parse_datatype(body)
                elif mtype == _MSG_LAYOUT:
                    layout = _parse_layout(body)
                elif mtype == _MSG_FILTER:
                    filters = _parse_filters(body)
                elif mtype == _MSG_SYMBOL_TABLE:
                    raise ValueError(
                        f"h5lite: {name!r} is a sub-group; only root-level "
                        "datasets supported (use h5py)"
                    )
            if shape is None or dtype is None or layout is None:
                raise ValueError(f"h5lite: {name!r} missing dataset messages")
            if layout[0] == "contig":
                _, addr, nbytes = layout
                out[name] = DatasetInfo(name, shape, dtype, addr, nbytes)
            else:
                _, btree_addr, chunk_dims = layout
                chunks = _walk_chunk_btree(f, btree_addr, len(chunk_dims) + 1)
                out[name] = DatasetInfo(
                    name,
                    shape,
                    dtype,
                    _UNDEF,
                    sum(c[2] for c in chunks),
                    chunk_shape=chunk_dims,
                    chunks=chunks,
                    filters=filters,
                )
        return out


def read_h5(
    path: str, dataset: str, rows: tuple[int, int] | None = None
) -> np.ndarray:
    """Read a dataset (optionally only rows [lo, hi)).

    Contiguous: one seek + one read — the range-read primitive the
    distributed reader builds on.  Chunked (optionally gzip/shuffle
    filtered): touches ONLY the chunks overlapping the row range, so a
    distributed reader's per-task row ranges read per-task chunks."""
    info = read_h5_meta(path)[dataset]
    n = info.shape[0] if info.shape else 0
    lo, hi = (0, n) if rows is None else rows
    lo, hi = max(0, lo), min(n, hi)
    tail = info.shape[1:]
    if hi <= lo:
        return np.empty((0, *tail), dtype=info.dtype)
    if info.is_chunked:
        return _read_chunked_rows(path, info, lo, hi)
    if info.offset == _UNDEF:
        return np.empty((0, *tail), dtype=info.dtype)
    rb = info.row_nbytes
    with open(path, "rb") as f:
        f.seek(info.offset + lo * rb)
        raw = f.read((hi - lo) * rb)
    if len(raw) != (hi - lo) * rb:
        raise ValueError(f"{path}: truncated dataset {dataset!r}")
    return np.frombuffer(raw, dtype=info.dtype).reshape(hi - lo, *tail).copy()


def _read_chunked_rows(
    path: str, info: DatasetInfo, lo: int, hi: int
) -> np.ndarray:
    """Assemble rows [lo, hi) of a chunked dataset from the chunks that
    overlap the range (edge chunks are stored full-size and clipped)."""
    cs = info.chunk_shape
    out = np.zeros((hi - lo, *info.shape[1:]), dtype=info.dtype)
    n_per_chunk = 1
    for d in cs:
        n_per_chunk *= d
    with open(path, "rb") as f:
        for coords, addr, nbytes, mask in info.chunks:
            c0 = coords[0]
            if c0 >= hi or c0 + cs[0] <= lo:
                continue
            f.seek(addr)
            raw = f.read(nbytes)
            if len(raw) != nbytes:
                raise ValueError(f"{path}: truncated chunk at {addr}")
            raw = _defilter_chunk(raw, info.filters, mask, info.dtype.itemsize)
            chunk = np.frombuffer(raw, dtype=info.dtype)
            if chunk.size < n_per_chunk:
                raise ValueError(f"{path}: short chunk at {addr}")
            chunk = chunk[:n_per_chunk].reshape(cs)
            # clip the (full-size) chunk to the dataset bounds
            valid = tuple(
                slice(0, min(cs[d], info.shape[d] - coords[d]))
                for d in range(len(cs))
            )
            chunk = chunk[valid]
            r0 = max(c0, lo)
            r1 = min(c0 + chunk.shape[0], hi)
            if r1 <= r0:
                continue
            dst = (slice(r0 - lo, r1 - lo),) + tuple(
                slice(coords[d], coords[d] + chunk.shape[d])
                for d in range(1, len(cs))
            )
            out[dst] = chunk[r0 - c0 : r1 - c0]
    return out

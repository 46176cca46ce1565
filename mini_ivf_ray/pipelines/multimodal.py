"""Multimodal columns: opaque binary payloads + typed metadata.

Task-brief addition (no reference analog): image decode / feature
extraction, video frame sampling, audio features — each as an
actor-pool ``map_batches`` stage over ``binary`` columns.  Batches stay
in ``batch_format="pyarrow"`` end-to-end: binary columns do not survive
pandas round-trips cleanly (ray_guide pitfall).

Decode paths, in order of preference (sniffed per payload by magic
bytes, `functions/mediacodec.sniff`):

* **Real, dependency-free** — BMP (uncompressed 24-bit), PNG (8-bit,
  all five scanline filters, zlib via stdlib), baseline JPEG
  (`functions/jpegcodec.py`: Annex K tables, DCT, 4:4:4/4:2:0),
  RIFF/WAV PCM16, and the MVF1 multi-frame BMP container — all decoded
  for real (struct + zlib + numpy only).  Round 3: the former "honest
  stub" gate is gone; no third-party codec library is needed.
* Compressed VIDEO (H.26x/MP4) has no dependency-free path; video
  rows use the MVF1 container of real per-frame images.
* **Synthetic fallback** — the legacy 16-byte header
  ``[kind u8 | height u16 | width u16 | channels u8 | n_frames u16 |
  sample_rate u32 | reserved]`` + pseudo-pixel bytes (``synth_media``),
  kept for plumbing tests and byte-level feature fakes.

``synth_media_real`` produces REAL BMP/WAV/MVF1 payloads so the full
decode path is exercised end-to-end in this sandbox.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.functions import mediacodec

KIND_IMAGE, KIND_VIDEO, KIND_AUDIO = 0, 1, 2

_HEADER = np.dtype(
    [
        ("kind", "u1"),
        ("height", "<u2"),
        ("width", "<u2"),
        ("channels", "u1"),
        ("n_frames", "<u2"),
        ("sample_rate", "<u4"),
        ("reserved", "<u4"),
    ]
)

def synth_media(n: int, kind: int, seed: int = 42) -> pa.Table:
    """Deterministic media table (media_id, kind, payload, n_bytes)."""
    rng = np.random.default_rng(seed + kind)
    rows_payload, ids = [], []
    for i in range(n):
        h, w, c = int(rng.integers(8, 32)), int(rng.integers(8, 32)), 3
        frames = int(rng.integers(2, 8)) if kind == KIND_VIDEO else 1
        sr = 16000 if kind == KIND_AUDIO else 0
        header = np.zeros(1, dtype=_HEADER)
        header["kind"] = kind
        header["height"], header["width"], header["channels"] = h, w, c
        header["n_frames"], header["sample_rate"] = frames, sr
        body_len = h * w * c * frames if kind != KIND_AUDIO else sr // 4
        body = rng.integers(0, 256, body_len, dtype=np.uint8)
        rows_payload.append(header.tobytes() + body.tobytes())
        ids.append(i)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array([kind] * n, type=pa.int32()),
            "payload": pa.array(rows_payload, type=pa.binary()),
            "n_bytes": pa.array([len(p) for p in rows_payload], type=pa.int64()),
        }
    )


def synth_media_real(n: int, kind: int, seed: int = 42) -> pa.Table:
    """Deterministic media table whose payloads are REAL files: BMP
    images, PCM16 WAV audio, MVF1 (per-frame BMP) video.  Same schema
    as ``synth_media`` so every stage accepts either."""
    rng = np.random.default_rng(seed + 100 + kind)
    rows_payload, ids = [], []
    for i in range(n):
        if kind == KIND_IMAGE:
            h, w = int(rng.integers(8, 32)), int(rng.integers(8, 32))
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            # rotate containers so ALL THREE real decode paths run in
            # every pipeline (PNG cycles through all filter types;
            # JPEG alternates 4:4:4 / 4:2:0)
            if i % 3 == 0:
                rows_payload.append(mediacodec.encode_bmp(img))
            elif i % 3 == 1:
                ftype = ("none", "sub", "up", "average", "paeth")[(i // 3) % 5]
                rows_payload.append(mediacodec.encode_png(img, filter_type=ftype))
            else:
                from mini_ivf_ray.functions.jpegcodec import encode_jpeg

                sub = "444" if (i // 3) % 2 == 0 else "420"
                rows_payload.append(encode_jpeg(img, quality=92, subsample=sub))
        elif kind == KIND_VIDEO:
            h, w = int(rng.integers(8, 24)), int(rng.integers(8, 24))
            frames = [
                rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                for _ in range(int(rng.integers(2, 8)))
            ]
            rows_payload.append(mediacodec.encode_bmv(frames))
        else:
            sr = 16000
            x = (
                np.sin(np.arange(sr // 4) * (2 * np.pi * float(rng.integers(50, 800)) / sr))
                * 12000
            ).astype(np.int16)
            rows_payload.append(mediacodec.encode_wav(x, sr))
        ids.append(i)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array([kind] * n, type=pa.int32()),
            "payload": pa.array(rows_payload, type=pa.binary()),
            "n_bytes": pa.array([len(p) for p in rows_payload], type=pa.int64()),
        }
    )


def _parse(payload: bytes) -> tuple[np.void, np.ndarray]:
    header = np.frombuffer(payload[: _HEADER.itemsize], dtype=_HEADER)[0]
    body = np.frombuffer(payload[_HEADER.itemsize :], dtype=np.uint8)
    return header, body


class ImageDecode:
    """Actor stage: payload binary -> (height, width, channels,
    features list<float>).  BMP, PNG and baseline JPEG payloads are
    all decoded FOR REAL (`mediacodec.decode_image` — stdlib + numpy
    codecs, no PIL) and featurized from actual pixels; legacy
    synthetic payloads keep the byte-histogram fake; anything else
    (e.g. an audio payload routed to the image stage) raises instead
    of silently faking."""

    def __init__(self, bins: int = 16):
        self.bins = bins
        self.edges = np.linspace(0, 256, bins + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs, ws, cs, feats = [], [], [], []
        for payload in batch["payload"].to_pylist():
            fmt = mediacodec.sniff(payload)
            if fmt in ("bmp", "png", "jpeg"):
                img = mediacodec.decode_image(payload)  # real pixel decode
                h, w, c = img.shape
                body = img.reshape(-1)
            elif fmt == "synthetic":
                header, body = _parse(payload)
                h, w = int(header["height"]), int(header["width"])
                c = int(header["channels"])
            else:
                raise ValueError(
                    f"image decode got a non-image payload ({fmt!r})"
                )
            hist, _ = np.histogram(body, bins=self.edges)
            f = hist / max(1, body.size)
            hs.append(h)
            ws.append(w)
            cs.append(c)
            feats.append(np.round(f, 6).tolist())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "height": pa.array(hs, type=pa.int32()),
                "width": pa.array(ws, type=pa.int32()),
                "channels": pa.array(cs, type=pa.int32()),
                "features": pa.array(feats, type=pa.list_(pa.float64())),
            }
        )


class FrameSample:
    """Video payload -> one row per sampled frame (every ``stride``-th),
    a flat_map-shaped explosion done batch-wise."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, fidx, frames = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            if mediacodec.sniff(payload) == "bmv":
                # real path: per-frame BMP decode, sampled frames
                # re-emitted as standalone real BMP files
                decoded = mediacodec.decode_bmv(payload)
                for f in range(0, len(decoded), self.stride):
                    mids.append(mid)
                    fidx.append(f)
                    frames.append(mediacodec.encode_bmp(decoded[f]))
                continue
            header, body = _parse(payload)
            n = int(header["n_frames"])
            fsize = int(header["height"]) * int(header["width"]) * int(header["channels"])
            for f in range(0, n, self.stride):
                mids.append(mid)
                fidx.append(f)
                frames.append(body[f * fsize : (f + 1) * fsize].tobytes())
        return pa.table(
            {
                "media_id": pa.array(mids, type=pa.int64()),
                "frame_idx": pa.array(fidx, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


class AudioFeatures:
    """Audio payload -> windowed RMS energy over the byte stream
    interpreted as u8 samples (deterministic fake of real DSP)."""

    def __init__(self, window: int = 512):
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, srs, rms = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            if mediacodec.sniff(payload) == "wav":
                # real path: RIFF/PCM16 decode, RMS over true samples
                samples, sr = mediacodec.decode_wav(payload)
                x = samples.mean(axis=1)  # downmix to mono, float64
                nwin = max(1, x.size // self.window)
                wins = x[: nwin * self.window].reshape(nwin, -1)
                mids.append(mid)
                srs.append(sr)
                rms.append(np.round(np.sqrt((wins**2).mean(1)), 6).tolist())
                continue
            header, body = _parse(payload)
            x = body.astype(np.float64) - 128.0
            nwin = max(1, x.size // self.window)
            wins = x[: nwin * self.window].reshape(nwin, -1)
            mids.append(mid)
            srs.append(int(header["sample_rate"]))
            rms.append(np.round(np.sqrt((wins**2).mean(1)), 6).tolist())
        return pa.table(
            {
                "media_id": pa.array(mids, type=pa.int64()),
                "sample_rate": pa.array(srs, type=pa.int32()),
                "rms": pa.array(rms, type=pa.list_(pa.float64())),
            }
        )


def decode_images(media_ds, concurrency=(1, 4), batch_size: int = 64):
    """Small batch_size on purpose: wide binary rows (ray_guide:
    memory-aware batching for image/audio payloads)."""
    return media_ds.map_batches(
        ImageDecode,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def sample_frames(media_ds, stride: int = 2, concurrency=(1, 4), batch_size: int = 32):
    return media_ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def audio_features(media_ds, concurrency=(1, 4), batch_size: int = 64):
    return media_ds.map_batches(
        AudioFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class ImageResize:
    """Actor stage: payload -> nearest-neighbor resized pixel buffer.
    Unlike the decode stubs, the RESIZE KERNEL itself is fully real
    (pure-numpy nearest-neighbor index sampling over the (h, w, c)
    buffer) — only the codec boundary (parsing real JPEG/PNG instead of
    the synthetic header+body payload) stays behind the decode stub.
    Output rows: (media_id, height, width, channels, pixels binary)."""

    def __init__(self, out_h: int = 8, out_w: int = 8):
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, pixels, chans = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            fmt = mediacodec.sniff(payload)
            if fmt in ("bmp", "png", "jpeg"):
                img = mediacodec.decode_image(payload)  # real pixel decode
                h, w, c = img.shape
            else:
                header, body = _parse(payload)
                h, w = int(header["height"]), int(header["width"])
                c = int(header["channels"])
                img = body[: h * w * c].reshape(h, w, c)
            yi = np.minimum((np.arange(self.out_h) * h) // self.out_h, h - 1)
            xi = np.minimum((np.arange(self.out_w) * w) // self.out_w, w - 1)
            out = img[yi[:, None], xi[None, :], :]
            mids.append(mid)
            chans.append(c)
            pixels.append(out.tobytes())
        return pa.table(
            {
                "media_id": pa.array(mids, type=pa.int64()),
                "height": pa.array(
                    np.full(len(mids), self.out_h, dtype=np.int32), type=pa.int32()
                ),
                "width": pa.array(
                    np.full(len(mids), self.out_w, dtype=np.int32), type=pa.int32()
                ),
                "channels": pa.array(chans, type=pa.int32()),
                "pixels": pa.array(pixels, type=pa.binary()),
            }
        )


def resize_images(media_ds, out_h: int = 8, out_w: int = 8, concurrency=(1, 4), batch_size: int = 64):
    return media_ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={"out_h": out_h, "out_w": out_w},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )

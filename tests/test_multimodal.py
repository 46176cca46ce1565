"""Multimodal plumbing: schemas, actor stages, deterministic fakes."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.pipelines.multimodal import (
    KIND_AUDIO,
    KIND_IMAGE,
    KIND_VIDEO,
    AudioFeatures,
    ImageDecode,
    audio_features,
    decode_images,
    sample_frames,
    synth_media,
)


def test_image_decode_schema_and_determinism():
    media = synth_media(20, KIND_IMAGE)
    ds = ray.data.from_arrow(media)
    out = decode_images(ds).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert list(out.columns) == ["media_id", "height", "width", "channels", "features"]
    assert len(out) == 20
    assert (out["channels"] == 3).all()
    # deterministic: same input -> same features
    out2 = decode_images(ray.data.from_arrow(media)).to_pandas().sort_values("media_id")
    assert all(
        np.array_equal(a, b) for a, b in zip(out["features"], out2["features"].to_numpy())
    )
    # features are a normalized histogram
    sums = np.array([np.sum(f) for f in out["features"]])
    np.testing.assert_allclose(sums, 1.0, atol=1e-4)


def test_frame_sampling_counts():
    media = synth_media(10, KIND_VIDEO, seed=1)
    out = sample_frames(ray.data.from_arrow(media), stride=2).to_pandas()
    # per video: ceil(n_frames / 2) sampled frames, each the right size
    import pyarrow as pa

    from mini_ivf_ray.pipelines.multimodal import _HEADER, _parse

    for mid, payload in zip(media["media_id"].to_pylist(), media["payload"].to_pylist()):
        header, _ = _parse(payload)
        n, h, w, c = (int(header[k]) for k in ("n_frames", "height", "width", "channels"))
        g = out[out.media_id == mid]
        assert len(g) == -(-n // 2)
        assert all(len(fr) == h * w * c for fr in g["frame"])


def test_audio_features():
    media = synth_media(5, KIND_AUDIO, seed=2)
    out = audio_features(ray.data.from_arrow(media)).to_pandas()
    assert (out["sample_rate"] == 16000).all()
    assert all(len(r) >= 1 for r in out["rms"])


def test_image_decode_rejects_non_image_payloads():
    """A WAV payload routed to the image stage raises instead of
    silently faking features (the former PIL stub gate is gone: BMP,
    PNG and baseline JPEG all decode for real without PIL)."""
    import pyarrow as pa

    from mini_ivf_ray.functions import mediacodec as mc

    wav = mc.encode_wav(np.zeros(100, np.int16), 8000)
    batch = pa.table(
        {"media_id": pa.array([0], pa.int64()), "payload": pa.array([wav], pa.binary())}
    )
    with pytest.raises(ValueError, match="non-image payload"):
        ImageDecode()(batch)


def test_resize_images_real_kernel():
    """The resize kernel is real: output pixels are exact nearest-
    neighbor samples of the source buffer."""
    import numpy as np

    import ray.data
    from mini_ivf_ray.pipelines.multimodal import (
        KIND_IMAGE,
        _parse,
        resize_images,
        synth_media,
    )

    media = synth_media(20, KIND_IMAGE, seed=5)
    out = resize_images(ray.data.from_arrow(media), out_h=4, out_w=4).to_pandas()
    assert len(out) == 20
    src = {m: p for m, p in zip(media["media_id"].to_pylist(), media["payload"].to_pylist())}
    row = out.iloc[0]
    header, body = _parse(src[row["media_id"]])
    h, w, c = int(header["height"]), int(header["width"]), int(header["channels"])
    img = body[: h * w * c].reshape(h, w, c)
    yi = np.minimum((np.arange(4) * h) // 4, h - 1)
    xi = np.minimum((np.arange(4) * w) // 4, w - 1)
    expect = img[yi[:, None], xi[None, :], :].tobytes()
    assert row["pixels"] == expect
    assert (out["height"] == 4).all() and (out["width"] == 4).all()


# ---------------------------------------------------------------------------
# Real codec paths (round 3): BMP / WAV / MVF1 decoded for real
# ---------------------------------------------------------------------------


def test_mediacodec_roundtrips():
    from mini_ivf_ray.functions import mediacodec as mc

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (7, 5), (16, 16), (33, 2)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(mc.decode_bmp(mc.encode_bmp(img)), img)
    x = rng.integers(-32768, 32767, (1000,), dtype=np.int16)
    s, sr = mc.decode_wav(mc.encode_wav(x, 16000))
    assert sr == 16000 and np.array_equal(s[:, 0], x)
    x2 = rng.integers(-32768, 32767, (500, 2), dtype=np.int16)
    s2, sr2 = mc.decode_wav(mc.encode_wav(x2, 44100))
    assert np.array_equal(s2, x2) and sr2 == 44100
    frames = [rng.integers(0, 256, (9, 11, 3), dtype=np.uint8) for _ in range(4)]
    dec = mc.decode_bmv(mc.encode_bmv(frames))
    assert len(dec) == 4 and all(np.array_equal(a, b) for a, b in zip(dec, frames))
    assert mc.sniff(mc.encode_bmp(img)) == "bmp"
    assert mc.sniff(mc.encode_wav(x, 8000)) == "wav"
    assert mc.sniff(mc.encode_bmv(frames)) == "bmv"
    assert mc.sniff(b"\x00" * 32) == "synthetic"
    # unsupported BMP variants raise instead of mis-decoding
    with pytest.raises(ValueError):
        mc.decode_bmp(mc.encode_wav(x, 8000))


def test_image_decode_real_bmp_pixels():
    """Features of a real BMP payload come from the ACTUAL pixels:
    decode a known image and compare to a directly-computed histogram."""
    from mini_ivf_ray.functions import mediacodec as mc
    from mini_ivf_ray.pipelines.multimodal import synth_media_real

    media = synth_media_real(20, KIND_IMAGE, seed=3)
    out = decode_images(ray.data.from_arrow(media)).to_pandas()
    out = out.sort_values("media_id").reset_index(drop=True)
    assert len(out) == 20 and (out["channels"] == 3).all()
    payloads = media["payload"].to_pylist()
    # even ids are BMP, odd ids are PNG (synth_media_real alternates)
    assert mc.sniff(payloads[0]) == "bmp" and mc.sniff(payloads[7]) == "png"
    for i in (0, 7, 19):
        img = mc.decode_image(payloads[i])
        assert (out.loc[i, "height"], out.loc[i, "width"]) == img.shape[:2]
        hist, _ = np.histogram(img.reshape(-1), bins=np.linspace(0, 256, 17))
        expect = np.round(hist / img.size, 6)
        np.testing.assert_array_equal(np.asarray(out.loc[i, "features"]), expect)


def test_audio_features_real_wav():
    """RMS over a real WAV: decode independently and recompute."""
    from mini_ivf_ray.functions import mediacodec as mc
    from mini_ivf_ray.pipelines.multimodal import synth_media_real

    media = synth_media_real(5, KIND_AUDIO, seed=4)
    out = audio_features(ray.data.from_arrow(media)).to_pandas()
    out = out.sort_values("media_id").reset_index(drop=True)
    assert (out["sample_rate"] == 16000).all()
    samples, sr = mc.decode_wav(media["payload"].to_pylist()[0])
    x = samples.mean(axis=1)
    nwin = x.size // 512
    expect = np.round(np.sqrt((x[: nwin * 512].reshape(nwin, -1) ** 2).mean(1)), 6)
    np.testing.assert_array_equal(np.asarray(out.loc[0, "rms"]), expect)


def test_frame_sampling_real_bmv():
    """Sampled frames of an MVF1 payload are standalone real BMPs whose
    pixels equal the source frames at the sampled indices."""
    from mini_ivf_ray.functions import mediacodec as mc
    from mini_ivf_ray.pipelines.multimodal import synth_media_real

    media = synth_media_real(8, KIND_VIDEO, seed=5)
    out = sample_frames(ray.data.from_arrow(media), stride=2).to_pandas()
    src = {
        m: mc.decode_bmv(p)
        for m, p in zip(media["media_id"].to_pylist(), media["payload"].to_pylist())
    }
    for mid, frames in src.items():
        g = out[out.media_id == mid].sort_values("frame_idx")
        assert list(g["frame_idx"]) == list(range(0, len(frames), 2))
        for fi, fb in zip(g["frame_idx"], g["frame"]):
            assert np.array_equal(mc.decode_bmp(fb), frames[fi])


def test_resize_real_bmp():
    from mini_ivf_ray.functions import mediacodec as mc
    from mini_ivf_ray.pipelines.multimodal import resize_images, synth_media_real

    media = synth_media_real(10, KIND_IMAGE, seed=6)
    out = resize_images(ray.data.from_arrow(media), out_h=4, out_w=4).to_pandas()
    out = out.sort_values("media_id").reset_index(drop=True)
    for i in (0, 1):  # 0 = BMP path, 1 = PNG path
        img = mc.decode_image(media["payload"].to_pylist()[i])
        h, w = img.shape[:2]
        yi = np.minimum((np.arange(4) * h) // 4, h - 1)
        xi = np.minimum((np.arange(4) * w) // 4, w - 1)
        assert out.loc[i, "pixels"] == img[yi[:, None], xi[None, :], :].tobytes()


def test_png_roundtrip_all_filters_and_colortypes():
    """Full PNG codec: every fixed filter × channel count round-trips
    bit-exactly; palette images expand through PLTE; corrupt CRC and
    unsupported variants raise."""
    import struct as _struct
    import zlib as _zlib

    from mini_ivf_ray.functions import mediacodec as mc

    rng = np.random.default_rng(11)
    for c in (1, 2, 3, 4):
        for f in ("none", "sub", "up", "average", "paeth"):
            img = rng.integers(0, 256, (19, 13, c), dtype=np.uint8)
            out = mc.decode_png(mc.encode_png(img, filter_type=f))
            assert out.shape == img.shape and np.array_equal(out, img), (c, f)
    # smooth gradient exercises the predictive filters' win
    g = (np.arange(48 * 48, dtype=np.uint32).reshape(48, 48) % 256).astype(np.uint8)
    assert np.array_equal(mc.decode_png(mc.encode_png(g, "paeth"))[:, :, 0], g)
    assert len(mc.encode_png(g, "paeth")) < len(mc.encode_png(g, "none"))
    assert mc.sniff(mc.encode_png(g)) == "png"
    # palette (color type 3): hand-built PLTE + indexed scanlines
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    scan = np.hstack([np.zeros((2, 1), np.uint8), idx])
    body = (
        mc._PNG_SIG
        + mc._png_chunk(b"IHDR", _struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + mc._png_chunk(b"PLTE", pal.tobytes())
        + mc._png_chunk(b"IDAT", _zlib.compress(scan.tobytes()))
        + mc._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(mc.decode_png(body), pal[idx])
    # corrupt CRC raises
    good = bytearray(mc.encode_png(g))
    good[-5] ^= 0xFF  # flip a bit inside IEND's CRC
    with pytest.raises(ValueError):
        mc.decode_png(bytes(good))
    with pytest.raises(ValueError):
        mc.decode_png(b"not a png")
    # decode_image dispatch
    img = rng.integers(0, 256, (5, 5, 3), dtype=np.uint8)
    assert np.array_equal(mc.decode_image(mc.encode_png(img)), img)
    assert np.array_equal(mc.decode_image(mc.encode_bmp(img)), img)
    with pytest.raises(ValueError):
        mc.decode_image(b"\xff\xd8\xff fake-jpeg")

"""Baseline JPEG codec (functions/jpegcodec.py, ITU-T T.81).

Lossy codec, so round-trips assert PSNR bands and structural
invariants rather than bit equality — except the cases where baseline
JPEG IS exact (constant blocks) or must be bit-identical (restart
markers changing the framing but not the content).
"""

import numpy as np
import pytest

from mini_ivf_ray.functions import jpegcodec as jc
from mini_ivf_ray.functions import mediacodec as mc


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _smooth(h=64, w=96):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            128 + 100 * np.sin(xx / 12) * np.cos(yy / 9),
            128 + 80 * np.cos(xx / 20),
            128 + 60 * np.sin((xx + yy) / 15),
        ],
        axis=2,
    ).clip(0, 255).astype(np.uint8)


def test_roundtrip_quality_and_subsampling_bands():
    img = _smooth()
    last = 0.0
    for q in (50, 85, 95):
        out = jc.decode_jpeg(jc.encode_jpeg(img, quality=q, subsample="444"))
        assert out.shape == img.shape
        p = _psnr(img, out)
        assert p > last and p > 35.0, (q, p)
        last = p
    # 4:2:0 loses chroma detail but still reconstructs well
    out420 = jc.decode_jpeg(jc.encode_jpeg(img, quality=85, subsample="420"))
    assert _psnr(img, out420) > 33.0
    # and compresses better than 4:4:4 at the same quality
    assert len(jc.encode_jpeg(img, 85, "420")) < len(jc.encode_jpeg(img, 85, "444"))


def test_constant_blocks_are_exact():
    """A constant image quantizes to DC-only blocks that reconstruct
    exactly — a strong end-to-end check of DCT/quant/Huffman/zigzag."""
    for v in (0, 64, 130, 255):
        c = np.full((24, 40, 3), v, np.uint8)
        out = jc.decode_jpeg(jc.encode_jpeg(c, quality=90))
        assert np.array_equal(out, c), v


def test_grayscale_and_odd_sizes():
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:40, 0:56]
    g = ((yy * 2 + xx) % 256).astype(np.uint8)
    out = jc.decode_jpeg(jc.encode_jpeg(g, quality=90))
    assert out.shape == (40, 56, 1) and _psnr(g, out[:, :, 0]) > 45.0
    for shape in [(1, 1, 3), (7, 5, 3), (17, 23, 3), (8, 8, 3), (16, 16, 3)]:
        im = rng.integers(0, 256, shape, dtype=np.uint8)
        for sub in ("444", "420"):
            o = jc.decode_jpeg(jc.encode_jpeg(im, quality=95, subsample=sub))
            assert o.shape == shape


def test_restart_markers_do_not_change_pixels():
    img = _smooth(48, 80)
    plain = jc.decode_jpeg(jc.encode_jpeg(img, quality=85))
    for ri in (1, 3, 7):
        withrst = jc.decode_jpeg(
            jc.encode_jpeg(img, quality=85, restart_interval=ri)
        )
        assert np.array_equal(plain, withrst), ri


def test_markers_and_errors():
    img = _smooth(16, 16)
    b = jc.encode_jpeg(img, quality=85)
    assert b[:3] == b"\xff\xd8\xff" and b[-2:] == b"\xff\xd9"
    assert b[6:10] == b"JFIF"
    assert mc.sniff(b) == "jpeg"
    with pytest.raises(ValueError, match="SOI"):
        jc.decode_jpeg(b"\x00\x01\x02")
    # progressive SOF2 rejected explicitly
    prog = bytearray(b)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        jc.decode_jpeg(bytes(prog))
    with pytest.raises(ValueError):
        jc.encode_jpeg(np.zeros((0, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        jc.encode_jpeg(np.zeros((4, 4, 2), np.uint8))


def test_image_stage_dispatch():
    """decode_image routes JPEG payloads through the real decoder."""
    img = _smooth(24, 24)
    out = mc.decode_image(jc.encode_jpeg(img, quality=95))
    assert out.shape == img.shape and _psnr(img, out) > 35.0

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


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        ImageDecode(use_real_decoder=True)


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

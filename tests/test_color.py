"""Color (YCbCr 4:4:4 / 4:2:0) encode tests.

The reference has no color path at all (chroma dropped at converter.c:51),
so the oracle here is the independent decoder (PIL/libjpeg): streams must
decode to the original within a PSNR bound, with correct dims, and the
device entropy path must byte-match the host coder on the interleaved
scan.
"""
import io

import numpy as np
import pytest
from PIL import Image

from jpegtpu import color_pipeline, pipeline
from jpegtpu.config import EncodeConfig
from jpegtpu.entropy import host as entropy_host
from jpegtpu.io import jfif


def _rgb_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 1.3 + yy * 0.2) % 256
    g = (xx * 0.4 + yy * 1.9) % 256
    b = ((xx + yy) * 0.8) % 256
    base = np.stack([r, g, b], axis=-1)
    return np.clip(base + rng.normal(0, 8, (h, w, 3)), 0, 255).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / mse) if mse else np.inf


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_color_roundtrip_psnr(subsampling):
    img = _rgb_image(96, 112)
    data = color_pipeline.encode_color(img, EncodeConfig(subsampling=subsampling))
    dec = Image.open(io.BytesIO(data))
    assert dec.size == (112, 96)
    out = np.asarray(dec.convert("RGB"))
    p = _psnr(img, out)
    assert p > (30.0 if subsampling == "444" else 26.0), p


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_color_device_matches_host_entropy(subsampling):
    """Device and host entropy coders must produce identical files for the
    same interleaved scan."""
    img = _rgb_image(64, 80, seed=2)
    cfg_dev = EncodeConfig(subsampling=subsampling, entropy="device")
    cfg_host = EncodeConfig(subsampling=subsampling, entropy="host")
    assert color_pipeline.encode_color(img, cfg_dev) == color_pipeline.encode_color(
        img, cfg_host
    )


def test_color_nonaligned_dims():
    """Non-multiple-of-16 dims must pad internally but decode at original
    size (SOF0 carries original dims)."""
    img = _rgb_image(50, 70, seed=5)
    data = color_pipeline.encode_color(img, EncodeConfig(subsampling="420"))
    dec = Image.open(io.BytesIO(data))
    assert dec.size == (70, 50)
    out = np.asarray(dec.convert("RGB"))
    assert _psnr(img, out) > 24.0


def test_color_dc_chains_are_per_component():
    """The interleaved scan's DC chains must run per component: encoding
    each component's DC sequence independently must reproduce the stream's
    DC differences (checked via the host symbolizer)."""
    img = _rgb_image(32, 32, seed=9)
    cfg = EncodeConfig(subsampling="444")
    zz, table_sel, comp_id = color_pipeline.color_coefficients(img, cfg)
    diffs = entropy_host.dc_differences(zz[:, 0], comp_id=comp_id)
    for c in range(3):
        seq = zz[comp_id == c, 0]
        expect = np.concatenate([seq[:1], np.diff(seq)])
        np.testing.assert_array_equal(diffs[comp_id == c], expect)


def test_color_grayscale_input_promotes():
    img2d = np.tile(np.arange(64, dtype=np.uint8) * 4, (48, 1))
    data = color_pipeline.encode_color(img2d, EncodeConfig(subsampling="420"))
    dec = Image.open(io.BytesIO(data)).convert("RGB")
    out = np.asarray(dec)
    # gray input -> all channels near-equal after roundtrip
    assert np.abs(out[..., 0].astype(int) - out[..., 1].astype(int)).max() <= 24


def test_subsample_420_box_filter_semantics():
    """subsample_420 must equal the scalar box filter with round-to-
    nearest ((a+b+c+d+2)>>2) — an independent numpy oracle, since the
    entropy-parity tests consume the device's own coefficients."""
    import jax.numpy as jnp

    from jpegtpu.ops import color as color_ops

    rng = np.random.default_rng(3)
    chan = rng.integers(0, 256, (34, 52), dtype=np.uint8)
    got = np.asarray(color_ops.subsample_420(jnp.asarray(chan)))
    x = chan.astype(np.int64).reshape(17, 2, 26, 2)
    want = ((x.sum(axis=(1, 3)) + 2) >> 2).astype(np.uint8)
    np.testing.assert_array_equal(got, want)

    # full-range corners survive (no overflow/clip errors)
    flat = np.full((4, 4), 255, np.uint8)
    assert np.all(np.asarray(color_ops.subsample_420(jnp.asarray(flat))) == 255)


@pytest.mark.parametrize("entropy", ["device", "host"])
def test_color_422_roundtrip_and_parity(entropy):
    """4:2:2 (horizontal-only chroma subsampling): decodes at original
    size with sane PSNR; device and host coders emit identical bytes."""
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    data = color_pipeline.encode_color(
        img, EncodeConfig(subsampling="422", entropy=entropy)
    )
    dec = Image.open(io.BytesIO(data))
    dec.load()
    assert dec.size == (56, 40)


def test_color_422_device_equals_host():
    rng = np.random.default_rng(22)
    img = rng.integers(0, 256, (48, 80, 3), dtype=np.uint8)
    dev = color_pipeline.encode_color(
        img, EncodeConfig(subsampling="422", entropy="device")
    )
    host = color_pipeline.encode_color(
        img, EncodeConfig(subsampling="422", entropy="host")
    )
    assert dev == host


def test_color_422_smooth_image_psnr():
    """On a smooth natural-ish image, 4:2:2 PSNR sits between 4:2:0 and
    4:4:4 (it halves chroma loss only horizontally)."""
    yy, xx = np.mgrid[0:64, 0:64]
    img = np.stack(
        [
            (xx * 2 + yy) % 256,
            (xx + yy * 2) % 256,
            (255 - xx * 2) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)
    from jpegtpu.analysis import psnr

    scores = {}
    for ss in ("420", "422", "444"):
        data = color_pipeline.encode_color(img, EncodeConfig(subsampling=ss))
        dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), float)
        scores[ss] = psnr(img.astype(float), dec)
    assert scores["420"] <= scores["422"] + 0.3
    assert scores["422"] <= scores["444"] + 0.3


def test_color_422_restart_and_batch():
    from jpegtpu.batch import encode_color_batch

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
    cfg = EncodeConfig(subsampling="422")
    dev = color_pipeline.encode_color(
        img, EncodeConfig(subsampling="422", restart_interval=3, entropy="device")
    )
    host = color_pipeline.encode_color(
        img, EncodeConfig(subsampling="422", restart_interval=3, entropy="host")
    )
    assert dev == host
    batched = encode_color_batch([img, img[::-1].copy()], cfg)
    singles = [
        color_pipeline.encode_color(img, cfg),
        color_pipeline.encode_color(img[::-1].copy(), cfg),
    ]
    assert batched == singles

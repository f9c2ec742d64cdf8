"""Integer-mode transform: determinism and quality parity."""
import io

import numpy as np
from PIL import Image

from jpegtpu import pipeline
from jpegtpu.analysis import psnr
from jpegtpu.config import EncodeConfig


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return np.clip((xx * 1.1 + yy * 1.7) % 256 + rng.normal(0, 15, (h, w)), 0, 255).astype(
        np.uint8
    )


def test_int_mode_decodes_near_float_mode():
    img = _img(128, 160)
    f = pipeline.encode_grayscale(img, EncodeConfig(dct_dtype="float32"))
    i = pipeline.encode_grayscale(img, EncodeConfig(dct_dtype="int32"))
    df = np.asarray(Image.open(io.BytesIO(f)).convert("L"))
    di = np.asarray(Image.open(io.BytesIO(i)).convert("L"))
    pf, pi = psnr(img, df), psnr(img, di)
    # 11-bit fixed-point basis costs a small fraction of a dB at most
    assert pi > pf - 0.2, (pf, pi)


def test_int_mode_levels_are_integer_exact():
    """The int path must equal a pure numpy int64 recomputation exactly —
    the property that makes it backend-independent."""
    from jpegtpu import tables
    from jpegtpu.ops import int_transform

    img = _img(128, 128, seed=4)
    cfg = EncodeConfig(dct_dtype="int32")
    got = pipeline.grayscale_coefficients(img, cfg)

    t8 = np.round(tables.dct_basis_reference(np.float64) * 2048).astype(np.int64)
    x = img.astype(np.int64) - 128
    nbh, nbw = img.shape[0] // 8, img.shape[1] // 8
    blocks = x.reshape(nbh, 8, nbw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    y1 = np.einsum("ux,nxy->nuy", t8, blocks)
    y1 = (y1 + 1024) >> 11
    y2 = np.einsum("nuy,vy->nuv", y1, t8)
    f = (y2 + 1024) >> 11
    q = EncodeConfig().luma_quant.astype(np.int64)
    mag = (2 * np.abs(f) + q) // (2 * q)
    levels = np.where(f < 0, -mag, mag).reshape(-1, 64)[:, tables.ZIGZAG_ORDER]
    np.testing.assert_array_equal(got, levels)


def test_int_mode_stream_stable_across_runs():
    img = _img(96, 96, seed=9)
    cfg = EncodeConfig(dct_dtype="int32")
    a = pipeline.encode_grayscale(img, cfg)
    b = pipeline.encode_grayscale(img, cfg)
    assert a == b


def test_int_mode_color_deterministic_and_close_to_float():
    """dct_dtype='int32' now applies to the color path too: the stream
    must be identical across repeated encodes (determinism) and decode
    within a small PSNR delta of the float path."""
    import io

    from PIL import Image

    from jpegtpu import color_pipeline
    from jpegtpu.analysis import psnr

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    cfg_i = EncodeConfig(subsampling="420", dct_dtype="int32")
    a = color_pipeline.encode_color(img, cfg_i)
    b = color_pipeline.encode_color(img, cfg_i)
    assert a == b
    f = color_pipeline.encode_color(img, EncodeConfig(subsampling="420"))
    da = np.asarray(Image.open(io.BytesIO(a)).convert("RGB"), float)
    df = np.asarray(Image.open(io.BytesIO(f)).convert("RGB"), float)
    for c in range(3):
        pi = psnr(img[..., c].astype(float), da[..., c])
        pf = psnr(img[..., c].astype(float), df[..., c])
        assert abs(pi - pf) < 0.2, (c, pi, pf)

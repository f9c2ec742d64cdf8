"""Device transform (Y, level shift, DCT, quant, zigzag) vs reference goldens.

Parity contract (SURVEY.md §7.3): Y and level-shift stages are bit-exact.
Quantized coefficients are bit-exact except for coefficients whose exact
value (under the reference's own LUT literals) sits on a 0.5 rounding
boundary of its float32 summation — those are coin flips in the reference
itself. We assert the mismatch fraction is tiny and every mismatch is a
+-1 boundary case.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from jpegtpu import EncodeConfig, grayscale_coefficients, tables
from jpegtpu.io import bmp
from jpegtpu.ops import blocks, color, dct, quant, zigzag

CFG = EncodeConfig()


def _load_rgb(golden):
    if golden["bmp_path"] is None:
        pytest.skip("input bmp not available")
    return bmp.read(golden["bmp_path"])


def test_y_conversion_bitexact(golden):
    rgb = _load_rgb(golden)
    ph, pw = int(golden["pad_height"]), int(golden["pad_width"])
    h, w = rgb.shape[:2]
    padded = np.pad(rgb, [(0, ph - h), (0, pw - w), (0, 0)], mode="edge")
    y = np.asarray(color.rgb_to_y_reference(jnp.asarray(padded)))
    assert np.array_equal(y, golden["y"])


def test_level_shift_bitexact(golden):
    shifted = np.asarray(color.level_shift(jnp.asarray(golden["y"])))
    assert np.array_equal(shifted.astype(np.int8), golden["centered"])


def test_quantized_coefficients_parity(golden):
    rgb = _load_rgb(golden)
    zz = grayscale_coefficients(rgb, CFG)
    ref = golden["zigzag"].astype(np.int32)
    assert zz.shape == ref.shape
    mism = zz != ref
    frac = mism.sum() / zz.size
    assert frac < 1e-4, f"{mism.sum()} mismatches ({frac:.2e})"
    if mism.any():
        # Every mismatch must be a +-1 level at an exact 0.5 boundary of the
        # reference's arithmetic.
        assert np.abs(zz[mism] - ref[mism]).max() == 1
        centered = golden["centered"].astype(np.float64)
        ph, pw = centered.shape
        t = tables.dct_basis_reference(np.float64)
        b = centered.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        f = np.einsum("ux,...xy,vy->...uv", t, b, t).reshape(-1, 64)
        q = CFG.luma_quant.reshape(64).astype(np.float64)
        scaled = (f / q)[:, tables.ZIGZAG_ORDER][mism]
        dist = np.abs(np.abs(scaled - np.trunc(scaled)) - 0.5)
        assert dist.max() < 1e-4, f"non-boundary mismatch, dist {dist.max()}"


def test_zigzag_matches_reference_gather(golden):
    q = golden["quant"].astype(np.int32)
    b = blocks.blockify(jnp.asarray(q))
    zz = np.asarray(zigzag.zigzag_scan(b))
    assert np.array_equal(zz, golden["zigzag"].astype(np.int32))


def test_pad_edge_replicates():
    img = jnp.arange(6, dtype=jnp.uint8).reshape(2, 3)
    out = np.asarray(blocks.pad_edge(img))
    assert out.shape == (8, 8)
    assert (out[2:, :3] == np.asarray(img)[1]).all()  # rows replicate last row
    assert (out[:, 3:] == out[:, 2:3]).all()  # cols replicate last col


def test_blockify_roundtrip():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(-128, 128, (24, 40), dtype=np.int32))
    b = blocks.blockify(img)
    assert b.shape == (15, 8, 8)
    assert np.array_equal(np.asarray(blocks.deblockify(b, 24, 40)), np.asarray(img))


def test_dct_known_flat_block():
    # A constant block has only a DC coefficient: 8 * value for orthonormal
    # scaling (T X T^T with X = c * ones -> DC = 8c).
    t = jnp.asarray(tables.dct_basis(np.float32))
    x = jnp.full((1, 8, 8), 10.0)
    f = np.asarray(dct.dct_blocks(x, t))
    assert abs(f[0, 0, 0] - 80.0) < 1e-3
    assert np.abs(f[0].reshape(-1)[1:]).max() < 1e-3


def test_round_half_away():
    x = jnp.asarray([2.5, -2.5, 0.5, -0.5, 2.49, -2.49, 0.0])
    out = np.asarray(quant.round_half_away(x))
    assert list(out) == [3, -3, 1, -1, 2, -2, 0]


def test_quality_sweep_changes_levels():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    z10 = grayscale_coefficients(img, EncodeConfig(quality=10))
    z95 = grayscale_coefficients(img, EncodeConfig(quality=95))
    assert (z95 != 0).sum() > (z10 != 0).sum()

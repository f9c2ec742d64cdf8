"""Unit tests for the fused Pallas transform kernel (ops/pallas_transform).

Bit-parity oracle: the XLA tiled transform (ops/fused_transform), which is
itself golden-tested against natural_c's quantized coefficients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jpegtpu.config import EncodeConfig
from jpegtpu.ops import fused_transform, pallas_transform as pt


def _ref_zz(img, qt):
    ph = -(-img.shape[0] // fused_transform.TILE) * fused_transform.TILE
    pw = -(-img.shape[1] // fused_transform.TILE) * fused_transform.TILE
    padded = jnp.pad(
        jnp.asarray(img),
        ((0, ph - img.shape[0]), (0, pw - img.shape[1])),
    )
    return np.asarray(
        fused_transform.transform_tiled(
            padded, qt, True,
            out_blocks=(img.shape[0] // 8, img.shape[1] // 8),
        )
    )


def _kernel_zz(img, qt):
    h, w = img.shape
    kh, kw = pt.padded_dims_kernel(h, w)
    padded = jnp.pad(jnp.asarray(img), ((0, kh - h), (0, kw - w)))
    raw = pt.transform_plane_raw(padded, qt, True, interpret=True)
    return np.asarray(
        pt.raw_to_scan(raw, h // 8, w // 8, kw // pt.TILE_W)
    ).T


@pytest.mark.parametrize("shape", [(64, 1024), (128, 2048), (200, 1500)])
def test_matches_xla_transform(shape):
    rng = np.random.default_rng(hash(shape) & 0xFFFF)
    h8, w8 = -(-shape[0] // 8) * 8, -(-shape[1] // 8) * 8
    img = rng.integers(0, 256, size=(h8, w8), dtype=np.uint8)
    qt = jnp.asarray(EncodeConfig().luma_quant.astype(np.float32))
    np.testing.assert_array_equal(_kernel_zz(img, qt), _ref_zz(img, qt))


def test_chroma_table_and_flat_image():
    img = np.full((64, 1024), 97, np.uint8)
    qt = jnp.asarray(EncodeConfig().chroma_quant.astype(np.float32))
    got = _kernel_zz(img, qt)
    np.testing.assert_array_equal(got, _ref_zz(img, qt))
    assert (got[:, 1:] == 0).all()  # constant image: AC all zero


def test_scan_raw_roundtrip():
    rng = np.random.default_rng(3)
    nbh, nbw, ncg = 11, 300, 3
    arr = rng.integers(-1000, 1000, size=(nbh * nbw,)).astype(np.int32)
    raw = pt.scan_to_raw(jnp.asarray(arr), nbh, nbw, ncg)
    back = pt.raw_to_scan(raw[:, None], nbh, nbw, ncg)[0]
    np.testing.assert_array_equal(np.asarray(back), arr)


# --- fused RGB color convert + transform kernels -------------------------
# Oracle: the unfused chain (rgb_planar_to_ycbcr + subsample_420/422 +
# transform_plane_raw), itself golden-tested end to end. The fused
# kernels must be BIT-identical: they are the production color path
# (color_pipeline._fused_raw_planes, batch._color_batch_plane_raw).

def _unfused_raw(rgb, sub, qtl, qtc, int_mode=False):
    from jpegtpu.ops import color as cops

    y, cb, cr = cops.rgb_planar_to_ycbcr(jnp.asarray(rgb))
    if sub == "420":
        cb, cr = cops.subsample_420(cb), cops.subsample_420(cr)
    elif sub == "422":
        cb, cr = cops.subsample_422(cb), cops.subsample_422(cr)
    ry = pt.transform_plane_raw(y, qtl, True, interpret=True,
                                int_mode=int_mode)
    rc = pt.transform_plane_raw(jnp.concatenate([cb, cr]), qtc, True,
                                interpret=True, int_mode=int_mode)
    return np.asarray(ry), np.asarray(rc)


@pytest.mark.parametrize("sub", ["420", "422", "444"])
@pytest.mark.parametrize("int_mode", [False, True])
def test_fused_rgb_kernels_bit_equal_unfused(sub, int_mode):
    fy = 2 if sub == "420" else 1
    fx = 1 if sub == "444" else 2
    kh, kw = 64, 1024  # one chroma tile
    rng = np.random.default_rng(0x5EED + fy + fx + int_mode)
    rgb = rng.integers(0, 256, (3, fy * kh, fx * kw), dtype=np.uint8)
    cfg = EncodeConfig(subsampling=sub)
    dt = np.int32 if int_mode else np.float32
    qtl = jnp.asarray(cfg.luma_quant.astype(dt))
    qtc = jnp.asarray(cfg.chroma_quant.astype(dt))
    ry0, rc0 = _unfused_raw(rgb, sub, qtl, qtc, int_mode)
    ry1 = pt.transform_rgb_y_raw(jnp.asarray(rgb), qtl, True,
                                 interpret=True, int_mode=int_mode)
    rc1 = pt.transform_rgb_chroma_raw(jnp.asarray(rgb), qtc, sub, True,
                                      interpret=True, int_mode=int_mode)
    np.testing.assert_array_equal(np.asarray(ry1), ry0)
    np.testing.assert_array_equal(np.asarray(rc1), rc0)


def test_fused_rgb_multi_tile_grid():
    # 2x2 chroma tile grid: BlockSpec index mapping across both grid axes
    sub, fy, fx = "420", 2, 2
    kh, kw = 128, 2048
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (3, fy * kh, fx * kw), dtype=np.uint8)
    cfg = EncodeConfig(subsampling=sub)
    qtl = jnp.asarray(cfg.luma_quant.astype(np.float32))
    qtc = jnp.asarray(cfg.chroma_quant.astype(np.float32))
    ry0, rc0 = _unfused_raw(rgb, sub, qtl, qtc)
    ry1 = pt.transform_rgb_y_raw(jnp.asarray(rgb), qtl, True, interpret=True)
    rc1 = pt.transform_rgb_chroma_raw(jnp.asarray(rgb), qtc, sub, True,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(ry1), ry0)
    np.testing.assert_array_equal(np.asarray(rc1), rc0)


def test_fused_y_reference_kind():
    # gray-from-RGB: the reference's (77R+150G+29B)>>8 (converter.c:51)
    from jpegtpu.ops import color as cops

    rng = np.random.default_rng(11)
    rgb_il = rng.integers(0, 256, (64, 1024, 3), dtype=np.uint8)
    yref = np.asarray(cops.rgb_to_y_reference(jnp.asarray(rgb_il)))
    qt = jnp.asarray(EncodeConfig().luma_quant.astype(np.float32))
    r0 = pt.transform_plane_raw(jnp.asarray(yref), qt, True, interpret=True)
    r1 = pt.transform_rgb_y_raw(
        jnp.asarray(np.moveaxis(rgb_il, -1, 0)), qt, True, interpret=True,
        kind="y_ref",
    )
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r0))

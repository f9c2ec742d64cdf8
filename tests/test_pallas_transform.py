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

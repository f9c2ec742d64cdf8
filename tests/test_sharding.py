"""Multi-chip sharded encode: equivalence with single-chip semantics.

Runs on the virtual 8-device CPU mesh (conftest). The sharded encoder's
contract: shard = restart segment, so its output must be byte-identical to
the single-device host coder producing the same restart-interval stream,
and must decode to the same pixels as a no-restart single-chip encode.
"""
import io

import numpy as np
import pytest

import jax

from jpegtpu import pipeline
from jpegtpu.config import EncodeConfig
from jpegtpu.parallel import sharding


def _mesh(n):
    return sharding.make_mesh(n)


def _decode(data: bytes) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)).convert("L"))


def _image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 1.7 + yy * 0.9) % 256
    return np.clip(base + rng.normal(0, 12, (h, w)), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("n", [2, 8])
def test_sharded_stream_equals_host_restart_stream(n):
    """For shard-aligned dims, the sharded device encode must produce the
    exact bytes of the host coder at restart_interval = MCUs per shard."""
    h, w = 8 * n * 2, 64
    img = _image(h, w)
    mcu_per_shard = (h // n // 8) * (w // 8)
    got = sharding.encode_grayscale_sharded(img, EncodeConfig(), mesh=_mesh(n))
    want = pipeline.encode_grayscale(
        img, EncodeConfig(restart_interval=mcu_per_shard, entropy="host")
    )
    assert got == want


def test_sharded_decodes_like_single_chip():
    """Restart markers change the container, not the dequantized pixels:
    a sharded encode must decode to exactly the pixels of the single-chip
    no-restart encode (same quantized coefficients)."""
    img = _image(100, 120, seed=3)  # unaligned dims -> exercise padding
    single = pipeline.encode_grayscale(img, EncodeConfig())
    shard8 = sharding.encode_grayscale_sharded(img, EncodeConfig(), mesh=_mesh(8))
    a, b = _decode(single), _decode(shard8)
    # sharded path pads height to a multiple of 8*n; decoded dims match the
    # original in both cases because SOF0 carries original dims
    assert a.shape == b.shape == img.shape
    np.testing.assert_array_equal(a, b)


def test_sharded_offsets_match_layout():
    """The on-device all_gather offsets must equal each segment's byte
    offset in the assembled scan (segments + 2-byte RSTn separators)."""
    n = 4
    h, w = 8 * n, 32
    img = _image(h, w, seed=7)
    mesh = _mesh(n)
    cfg = EncodeConfig()
    ph, pw = sharding.shard_padded_dims(h, w, n)
    fn = sharding._sharded_encode_fn(
        mesh, ph, pw, cfg, False, cfg.capacity_words_per_block
    )
    import jax.numpy as jnp

    bufs, nbytes, overflow, offsets = jax.device_get(fn(jnp.asarray(img)))
    assert not overflow.any()
    expect = 0
    for i in range(n):
        assert offsets[i] == expect
        expect += int(nbytes[i]) + 2  # segment + RSTn

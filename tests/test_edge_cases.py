"""Shape and content edge cases through the full public API."""
import io

import numpy as np
import pytest
from PIL import Image

from jpegtpu import pipeline
from jpegtpu.config import EncodeConfig


@pytest.mark.parametrize(
    "h,w",
    [(1, 1), (8, 8), (7, 3), (1, 100), (100, 1), (9, 16), (128, 8)],
)
def test_tiny_and_skinny_shapes(h, w):
    rng = np.random.default_rng(h * 100 + w)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    data = pipeline.encode_grayscale(img, EncodeConfig())
    dec = Image.open(io.BytesIO(data))
    assert dec.size == (w, h)
    out = np.asarray(dec.convert("L"))
    assert out.shape == (h, w)


def test_flat_image_minimal_stream():
    """A constant image is the all-EOB extreme: every block is DC-only and
    all DC diffs after the first are zero."""
    img = np.full((64, 64), 128, dtype=np.uint8)
    data = pipeline.encode_grayscale(img, EncodeConfig())
    assert len(data) < 1000
    out = np.asarray(Image.open(io.BytesIO(data)).convert("L"))
    assert np.abs(out.astype(int) - 128).max() <= 1


def test_extreme_contrast_checkerboard():
    """Maximal high-frequency content: the capacity-overflow retry path
    must engage transparently if needed and still produce a valid file."""
    yy, xx = np.mgrid[0:64, 0:64]
    img = ((xx + yy) % 2 * 255).astype(np.uint8)
    data = pipeline.encode_grayscale(img, EncodeConfig(quality=100))
    dec = Image.open(io.BytesIO(data))
    assert dec.size == (64, 64)


def test_all_black_all_white():
    for v in (0, 255):
        img = np.full((24, 24), v, dtype=np.uint8)
        data = pipeline.encode_grayscale(img)
        out = np.asarray(Image.open(io.BytesIO(data)).convert("L"))
        assert np.abs(out.astype(int) - v).max() <= 2


def test_host_and_device_entropy_agree_on_edges():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (17, 23), dtype=np.uint8)
    a = pipeline.encode_grayscale(img, EncodeConfig(entropy="device"))
    b = pipeline.encode_grayscale(img, EncodeConfig(entropy="host"))
    assert a == b


def test_jfif_rejects_oversize_dims():
    """T.81 SOF X/Y are 16-bit: dims outside [1, 65535] must raise a
    clear ValueError at the JFIF layer, not a struct.error."""
    import pytest

    from jpegtpu.io import jfif

    with pytest.raises(ValueError, match="65535"):
        jfif.sof0(65536, 64, [(1, 1, 1, 0)])
    with pytest.raises(ValueError, match="65535"):
        jfif.sof0(64, 70000, [(1, 1, 1, 0)])
    with pytest.raises(ValueError, match="65535"):
        jfif.grayscale_headers(0, 64, __import__("jpegtpu").EncodeConfig())
    # the limit itself is legal
    assert jfif.sof0(65535, 65535, [(1, 1, 1, 0)])

"""BMP container I/O."""
import numpy as np
import pytest

from jpegtpu.io import bmp


def test_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    assert np.array_equal(bmp.decode(bmp.encode(img)), img)


def test_corpus_matches_pil(golden):
    if golden["bmp_path"] is None:
        pytest.skip("input bmp not available")
    from PIL import Image

    ours = bmp.read(golden["bmp_path"])
    theirs = np.asarray(Image.open(golden["bmp_path"]).convert("RGB"))
    assert np.array_equal(ours, theirs)


def test_rejects_bad_magic():
    with pytest.raises(bmp.BMPError):
        bmp.decode(b"XX" + b"\x00" * 60)


def test_rejects_truncated():
    rng = np.random.default_rng(1)
    data = bmp.encode(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
    with pytest.raises(bmp.BMPError):
        bmp.decode(data[:-10])

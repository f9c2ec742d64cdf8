"""2-pass optimal Huffman tables: legality, decode parity, size wins."""
import io

import numpy as np
import pytest
from PIL import Image

from jpegtpu import color_pipeline, pipeline, tables
from jpegtpu.config import EncodeConfig


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 1.7 + yy * 0.9) % 256 + 18 * np.sin(xx / 3) * np.cos(yy / 4)
    return np.clip(base + rng.normal(0, 5, (h, w)), 0, 255).astype(np.uint8)


def test_optimal_spec_legality():
    rng = np.random.default_rng(1)
    for trial in range(5):
        freqs = np.zeros(256, np.int64)
        n = int(rng.integers(1, 180))
        idx = rng.choice(256, n, replace=False)
        freqs[idx] = rng.integers(1, 10000, n)
        bits, values = tables.optimal_spec(freqs)
        assert bits.sum() == n
        assert sorted(values) == sorted(idx)
        # Kraft inequality (strict: the all-ones code is reserved)
        kraft = sum(int(bits[l]) * 2 ** (15 - l) for l in range(16))
        assert kraft < 2 ** 16
        codes, lengths = tables.canonical_codes(bits, values)
        # prefix-free and no all-ones codeword
        seen = set()
        for s in idx:
            L = int(lengths[s])
            assert 1 <= L <= 16
            assert codes[s] != (1 << L) - 1, "all-ones code assigned"
            seen.add((L, int(codes[s])))
        assert len(seen) == n

    # single-symbol alphabet
    freqs = np.zeros(256, np.int64)
    freqs[42] = 7
    bits, values = tables.optimal_spec(freqs)
    assert list(values) == [42] and bits[0] == 1


def test_optimal_tables_beat_standard_rate():
    """Optimal tables must shrink the file while decoding to IDENTICAL
    pixels (same quantized coefficients, different entropy code)."""
    img = _img(96, 120, seed=3)
    cfg_std = EncodeConfig(entropy="host")
    cfg_opt = EncodeConfig(optimize_huffman=True)
    std = pipeline.encode_grayscale(img, cfg_std)
    opt = pipeline.encode_grayscale(img, cfg_opt)
    assert len(opt) < len(std)
    a = np.asarray(Image.open(io.BytesIO(std)).convert("L"))
    b = np.asarray(Image.open(io.BytesIO(opt)).convert("L"))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("ss", ["420", "444"])
def test_optimal_tables_color(ss):
    rng = np.random.default_rng(9)
    img = np.stack([_img(64, 80, s) for s in range(3)], axis=-1)
    cfg_std = EncodeConfig(subsampling=ss, entropy="host")
    cfg_opt = EncodeConfig(subsampling=ss, optimize_huffman=True)
    std = color_pipeline.encode_color(img, cfg_std)
    opt = color_pipeline.encode_color(img, cfg_opt)
    assert len(opt) < len(std)
    a = np.asarray(Image.open(io.BytesIO(std)).convert("RGB"))
    b = np.asarray(Image.open(io.BytesIO(opt)).convert("RGB"))
    np.testing.assert_array_equal(a, b)


def test_optimal_tables_with_restart():
    img = _img(64, 64, seed=5)
    cfg = EncodeConfig(optimize_huffman=True, restart_interval=16)
    data = pipeline.encode_grayscale(img, cfg)
    plain = pipeline.encode_grayscale(img, EncodeConfig(entropy="host"))
    a = np.asarray(Image.open(io.BytesIO(plain)).convert("L"))
    b = np.asarray(Image.open(io.BytesIO(data)).convert("L"))
    np.testing.assert_array_equal(a, b)


def test_device_two_pass_matches_host_two_pass():
    """The device 2-pass (on-device histograms + runtime-table fused
    kernel) must produce byte-identical files to the host 2-pass."""
    img = _img(96, 120, seed=3)
    dev = pipeline.encode_grayscale(img, EncodeConfig(optimize_huffman=True))
    host = pipeline.encode_grayscale(
        img, EncodeConfig(optimize_huffman=True, entropy="host")
    )
    assert dev == host


@pytest.mark.parametrize("ss", ["420", "422", "444"])
def test_color_device_two_pass_matches_host_two_pass(ss):
    rng = np.random.default_rng(11)
    img = np.stack([_img(96, 112, s) for s in range(3)], axis=-1)
    dev = color_pipeline.encode_color(
        img, EncodeConfig(subsampling=ss, optimize_huffman=True)
    )
    host = color_pipeline.encode_color(
        img, EncodeConfig(subsampling=ss, optimize_huffman=True,
                          entropy="host")
    )
    assert dev == host
    std = color_pipeline.encode_color(img, EncodeConfig(subsampling=ss))
    assert len(dev) < len(std)
    a = np.asarray(Image.open(io.BytesIO(std)).convert("RGB"))
    b = np.asarray(Image.open(io.BytesIO(dev)).convert("RGB"))
    np.testing.assert_array_equal(a, b)

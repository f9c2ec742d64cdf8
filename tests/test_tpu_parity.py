"""On-silicon byte-parity sweep — the one-command TPU gate.

Every Pallas kernel in this framework has CPU-interpret-mode twins the
normal suite validates, but interpret mode cannot catch Mosaic-lowering
and bf16-MXU traps (a silent rounding difference in the MXU deposit
matmuls once produced wrong bytes that only real hardware revealed —
BENCH_NOTES.md "Default MXU matmul precision"). This module re-runs the
byte-parity oracles ON THE REAL TPU: device-produced entropy bytes vs
the numpy host coder, for every production path — gray, color
420/422/444, restart segments (per-segment Pallas concat), batched raw
kernels, the runtime-SMEM-table 2-pass optimal coder, and int32 mode.

Run with:  make tpu-parity      (JPEGTPU_TPU=1 pytest -n0 this file)

Skipped automatically when the default backend is not a TPU (the normal
CPU suite), so it is always safe to leave in tests/.

Mirrors the reference's own verification workflow — cross-implementation
stream diffing (natural_c jpeg_handler.c:168-175 vs dsp main.c:519-525)
— but byte-exact over whole files instead of eyeballing block 0.
"""
import io

import numpy as np
import pytest
from PIL import Image

import jax

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="requires a real TPU backend (run via `make tpu-parity`)",
    ),
]

from jpegtpu import batch, color_pipeline, pipeline
from jpegtpu.config import EncodeConfig


def _decodes(data: bytes, w: int, h: int):
    im = Image.open(io.BytesIO(data))
    im.load()
    assert im.size == (w, h)


def _gray(h, w, seed=0):
    """Photographic-complexity content: dense symbol coverage."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 1.7 + yy * 0.9) % 256 + 25 * np.sin(xx / 2.9) * np.cos(yy / 3.3)
    return np.clip(base + rng.normal(0, 10, (h, w)), 0, 255).astype(np.uint8)


def _rgb(h, w, seed=0):
    return np.stack([_gray(h, w, seed + s) for s in range(3)], axis=-1)


def _spiky(h, w, seed=1):
    """ZRL-stress content: flat background + isolated bright spikes =
    long zero runs, max-amplitude coefficients (range-split ZRL and the
    f32-exponent size_of under maximal |level|)."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 128, np.uint8)
    ys = rng.integers(0, h, 160)
    xs = rng.integers(0, w, 160)
    img[ys, xs] = np.where(rng.random(160) < 0.5, 0, 255).astype(np.uint8)
    return img


# ---------- grayscale single ----------

@pytest.mark.parametrize("quality", [50, 85])
def test_gray_device_bytes_equal_host(quality):
    img = _gray(120, 168, seed=quality)
    cfg_d = EncodeConfig(quality=quality, entropy="device")
    cfg_h = EncodeConfig(quality=quality, entropy="host")
    dev = pipeline.encode_grayscale(img, cfg_d)
    assert dev == pipeline.encode_grayscale(img, cfg_h)
    _decodes(dev, 168, 120)


def test_gray_zrl_stress_bytes_equal_host():
    img = _spiky(128, 160)
    dev = pipeline.encode_grayscale(img, EncodeConfig(entropy="device"))
    host = pipeline.encode_grayscale(img, EncodeConfig(entropy="host"))
    assert dev == host


def test_gray_rounding_tie_content():
    """Uniform mid-tones land DC terms on .5 rounding boundaries — the
    biased-cast (±0.5 + truncate) path must match numpy's roundf twin."""
    img = np.tile(np.arange(256, dtype=np.uint8), (64, 1))[:, :192]
    dev = pipeline.encode_grayscale(img, EncodeConfig(entropy="device"))
    host = pipeline.encode_grayscale(img, EncodeConfig(entropy="host"))
    assert dev == host


# ---------- color ----------

@pytest.mark.parametrize("ss", ["420", "422", "444"])
def test_color_device_bytes_equal_host(ss):
    img = _rgb(112, 144, seed=7)
    dev = color_pipeline.encode_color(
        img, EncodeConfig(subsampling=ss, entropy="device")
    )
    host = color_pipeline.encode_color(
        img, EncodeConfig(subsampling=ss, entropy="host")
    )
    assert dev == host
    _decodes(dev, 144, 112)


# ---------- restart segments (per-segment Pallas concat path) ----------

def test_gray_restart_device_bytes_equal_host():
    img = _gray(128, 160, seed=3)
    cfg_d = EncodeConfig(restart_interval=5, entropy="device")
    cfg_h = EncodeConfig(restart_interval=5, entropy="host")
    dev = pipeline.encode_grayscale(img, cfg_d)
    assert dev == pipeline.encode_grayscale(img, cfg_h)


def test_color_restart_device_bytes_equal_host():
    img = _rgb(96, 128, seed=4)
    cfg_d = EncodeConfig(subsampling="420", restart_interval=3, entropy="device")
    cfg_h = EncodeConfig(subsampling="420", restart_interval=3, entropy="host")
    dev = color_pipeline.encode_color(img, cfg_d)
    assert dev == color_pipeline.encode_color(img, cfg_h)


# ---------- batched raw kernels ----------

def test_gray_batch_bytes_equal_singles():
    imgs = [_gray(96, 96, seed=s) for s in range(4)] + [_spiky(96, 96)]
    cfg = EncodeConfig()
    outs = batch.encode_grayscale_batch(imgs, cfg)
    for img, data in zip(imgs, outs):
        assert data == pipeline.encode_grayscale(img, cfg)


def test_color_batch_bytes_equal_singles():
    imgs = [_rgb(96, 96, seed=10 + s) for s in range(3)]
    cfg = EncodeConfig(subsampling="420")
    outs = batch.encode_color_batch(imgs, cfg)
    for img, data in zip(imgs, outs):
        assert data == color_pipeline.encode_color(img, cfg)


def test_color_batch_raw_bytes_equal_singles():
    """The all-Pallas batched color body (side-by-side packed planes,
    natural-layout MCU merge, chunked per-image concat) on silicon."""
    imgs = [_rgb(120, 512, seed=20 + s) for s in range(3)]
    cfg = EncodeConfig(subsampling="420")
    from jpegtpu.batch import _color_raw_ok

    assert _color_raw_ok(4, 128, 512, cfg, 8)
    outs = batch.encode_color_batch(imgs, cfg)
    for img, data in zip(imgs, outs):
        assert data == color_pipeline.encode_color(img, cfg)


# ---------- 2-pass optimal Huffman (runtime SMEM tables) ----------

def test_gray_optimized_device_bytes_equal_host_two_pass():
    img = _gray(120, 144, seed=5)
    dev = pipeline.encode_grayscale(img, EncodeConfig(optimize_huffman=True))
    host = pipeline.encode_grayscale(
        img, EncodeConfig(optimize_huffman=True, entropy="host")
    )
    assert dev == host


@pytest.mark.parametrize("ss", ["420", "444"])
def test_color_optimized_device_bytes_equal_host_two_pass(ss):
    img = _rgb(96, 112, seed=6)
    dev = color_pipeline.encode_color(
        img, EncodeConfig(subsampling=ss, optimize_huffman=True)
    )
    host = color_pipeline.encode_color(
        img, EncodeConfig(subsampling=ss, optimize_huffman=True, entropy="host")
    )
    assert dev == host


# ---------- int32 deterministic mode ----------

def test_int32_mode_stable_and_equals_host_entropy():
    img = _gray(112, 128, seed=8)
    cfg_d = EncodeConfig(dct_dtype="int32", entropy="device")
    cfg_h = EncodeConfig(dct_dtype="int32", entropy="host")
    a = pipeline.encode_grayscale(img, cfg_d)
    b = pipeline.encode_grayscale(img, cfg_d)
    assert a == b  # run-to-run determinism on silicon
    assert a == pipeline.encode_grayscale(img, cfg_h)


def test_batched_optimized_gray_on_silicon():
    """Batched 2-pass shared-table coding: the runtime-SMEM-table batch
    kernel must produce decodable, smaller files on real hardware."""
    imgs = [_gray(120, 512, seed=30 + s) for s in range(3)]
    cfg = EncodeConfig(optimize_huffman=True)
    outs = batch.encode_grayscale_batch(imgs, cfg)
    plain = batch.encode_grayscale_batch(imgs, EncodeConfig())
    for im, o, p in zip(imgs, outs, plain):
        assert len(o) < len(p)
        _decodes(o, im.shape[1], im.shape[0])


def test_batched_optimized_color_on_silicon():
    imgs = [_rgb(120, 512, seed=40 + s) for s in range(3)]
    cfg = EncodeConfig(subsampling="420", optimize_huffman=True)
    outs = batch.encode_color_batch(imgs, cfg)
    plain = batch.encode_color_batch(imgs, EncodeConfig(subsampling="420"))
    for im, o, p in zip(imgs, outs, plain):
        assert len(o) < len(p)
        _decodes(o, im.shape[1], im.shape[0])


def test_int32_raw_kernel_on_silicon_equals_numpy_oracle():
    """The int-mode Pallas kernel's exactness argument (integer-valued
    f32 MXU dots below 2^24 are error-free) is only PROVEN on real
    Mosaic lowering: compare the full TPU int32 stream against a stream
    built from a pure numpy int64 recomputation of the levels."""
    from jpegtpu import tables
    from jpegtpu.entropy import host as entropy_host
    from jpegtpu.io import jfif

    img = _gray(112, 136, seed=21)
    cfg = EncodeConfig(dct_dtype="int32")
    dev = pipeline.encode_grayscale(img, cfg)

    t8 = np.round(
        tables.dct_basis_reference(np.float64) * 2048
    ).astype(np.int64)
    x = img.astype(np.int64) - 128
    nbh, nbw = img.shape[0] // 8, img.shape[1] // 8
    blks = x.reshape(nbh, 8, nbw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    y1 = (np.einsum("ux,nxy->nuy", t8, blks) + 1024) >> 11
    f = (np.einsum("nuy,vy->nuv", y1, t8) + 1024) >> 11
    q = cfg.luma_quant.astype(np.int64)
    mag = (2 * np.abs(f) + q) // (2 * q)
    lv = np.where(f < 0, -mag, mag).reshape(-1, 64)[:, tables.ZIGZAG_ORDER]
    segs = entropy_host.encode_scan(
        lv.astype(np.int32), pad_ones=cfg.pad_ones
    )
    oracle = jfif.assemble(img.shape[1], img.shape[0], cfg, segs)
    assert dev == oracle


def test_int32_color_on_silicon_stable_and_equals_host_entropy():
    img = _rgb(96, 112, seed=22)
    for ss in ("420", "444"):
        cfg_d = EncodeConfig(subsampling=ss, dct_dtype="int32",
                             entropy="device")
        cfg_h = EncodeConfig(subsampling=ss, dct_dtype="int32",
                             entropy="host")
        a = color_pipeline.encode_color(img, cfg_d)
        assert a == color_pipeline.encode_color(img, cfg_d)
        assert a == color_pipeline.encode_color(img, cfg_h)


def test_int32_batch_on_silicon_equals_singles():
    cfg = EncodeConfig(dct_dtype="int32")
    imgs = [_gray(64, 512, seed=50 + s) for s in range(3)]
    outs = batch.encode_grayscale_batch(imgs, cfg)
    for im, o in zip(imgs, outs):
        assert o == pipeline.encode_grayscale(im, cfg)


@pytest.mark.parametrize("forced_mode", ["pallas-chunked", "treepack-fallback"])
def test_concat_fallback_modes_on_silicon(monkeypatch, forced_mode):
    """Images past the VMEM budget take the chunked Pallas concat, and
    geometries past even that take the XLA treepack tree
    (pallas_concat.concat_mode) — force each branch on a small image
    and assert byte parity, so both large-image paths are
    hardware-verified. The chunked case pins rg_per_chunk to 1 so the
    multi-chunk split + device OR-combine actually exercises."""
    from jpegtpu.entropy import pallas_concat
    from jpegtpu.entropy import host as entropy_host
    from jpegtpu.io import jfif

    monkeypatch.setattr(
        pallas_concat, "concat_mode", lambda *a, **k: forced_mode
    )
    if forced_mode == "pallas-chunked":
        monkeypatch.setattr(
            pallas_concat, "chunk_plan", lambda *a, **k: 1
        )
    # the jitted encode is lru-cached on (shape, cfg); a cached trace
    # from any earlier encode of this geometry would bypass the forced
    # branch and make the test vacuous
    pipeline._encode_gray_device.cache_clear()
    img = _gray(104 if forced_mode == "treepack-fallback" else 112,
                128, seed=60)
    cfg = EncodeConfig()
    dev = pipeline.encode_grayscale(img, cfg)
    zz = pipeline.grayscale_coefficients(img, cfg)
    segs = entropy_host.encode_scan(zz, pad_ones=cfg.pad_ones)
    want = jfif.assemble(img.shape[1], img.shape[0], cfg, segs)
    assert dev == want

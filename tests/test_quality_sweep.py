"""Quality sweep Q10–Q95: decode validity, monotonicity, and external
encoder cross-check (SURVEY.md §7.1 step 8).

The reference has numbers only at its fixed Q50 point; for the sweep the
oracles are (a) an independent decoder, (b) rate/quality monotonicity,
(c) PIL's own libjpeg encoder at the same quality as a sanity band —
our streams should land in the same rate-distortion neighborhood.
"""
import io
import os

import numpy as np
import pytest
from PIL import Image

from jpegtpu import pipeline
from jpegtpu.analysis import psnr
from jpegtpu.config import EncodeConfig

LENA = "/root/reference/assets/input/lena.bmp"
QUALITIES = [10, 25, 50, 75, 95]


@pytest.fixture(scope="module")
def lena_gray():
    if not os.path.exists(LENA):
        pytest.skip("reference corpus missing")
    img = Image.open(LENA).convert("RGB")
    return np.asarray(img)


@pytest.fixture(scope="module")
def sweep(lena_gray):
    out = {}
    for q in QUALITIES:
        data = pipeline.encode_grayscale(lena_gray, EncodeConfig(quality=q))
        dec = np.asarray(Image.open(io.BytesIO(data)).convert("L"))
        out[q] = (data, dec)
    return out


def test_all_decode_at_original_size(sweep, lena_gray):
    for q, (data, dec) in sweep.items():
        assert dec.shape == lena_gray.shape[:2], q


def test_rate_monotonic(sweep):
    sizes = [len(sweep[q][0]) for q in QUALITIES]
    assert sizes == sorted(sizes), sizes


def test_quality_monotonic(sweep, lena_gray):
    from jpegtpu.ops import color as color_ops
    import jax.numpy as jnp

    y = np.asarray(color_ops.rgb_to_y_reference(jnp.asarray(lena_gray)))
    psnrs = [psnr(y, sweep[q][1]) for q in QUALITIES]
    assert psnrs == sorted(psnrs), psnrs
    assert psnrs[0] > 25 and psnrs[-1] > 40, psnrs


def test_rate_distortion_vs_libjpeg(sweep, lena_gray):
    """At each quality our (size, PSNR) must be in libjpeg's
    neighborhood: PSNR within 1.5 dB of libjpeg's at <= 1.35x its size
    (both use the same Annex-K scaling, so they should track closely)."""
    from jpegtpu.ops import color as color_ops
    import jax.numpy as jnp

    y = np.asarray(color_ops.rgb_to_y_reference(jnp.asarray(lena_gray)))
    for q in QUALITIES:
        data, dec = sweep[q]
        buf = io.BytesIO()
        Image.fromarray(y).save(buf, "JPEG", quality=q)
        lib_dec = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("L"))
        ours, theirs = psnr(y, dec), psnr(y, lib_dec)
        assert ours > theirs - 1.5, (q, ours, theirs)
        assert len(data) <= 1.35 * buf.getbuffer().nbytes, (
            q, len(data), buf.getbuffer().nbytes,
        )


def test_corpus_psnr_beats_reference_natural_c():
    """BASELINE.md parity bar: PSNR >= natural_c (rounding quantizer) on
    the corpus at the reference's Q50 point. natural_c measured values
    (this environment): lena 35.76, offset_sample 28.26."""
    bars = {"lena": 35.76, "offset_sample": 28.26}
    for name, bar in bars.items():
        path = f"/root/reference/assets/input/{name}.bmp"
        if not os.path.exists(path):
            pytest.skip("corpus missing")
        rgb = np.asarray(Image.open(path).convert("RGB"))
        data = pipeline.encode_grayscale(rgb, EncodeConfig(quality=50))
        dec = np.asarray(Image.open(io.BytesIO(data)).convert("L"))
        orig = np.asarray(Image.open(path).convert("L"))
        assert psnr(orig, dec) >= bar - 0.01, name


def test_color_sweep_monotonic(lena_gray):
    """Color 4:2:0 rate and quality must be monotone in Q, and decode at
    original size (the gray sweep's guarantees extended to the color
    path the reference lacks)."""
    from jpegtpu import color_pipeline

    sizes, psnrs = [], []
    for q in (10, 50, 95):
        data = color_pipeline.encode_color(
            lena_gray, EncodeConfig(quality=q, subsampling="420")
        )
        dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert dec.shape == lena_gray.shape, q
        sizes.append(len(data))
        psnrs.append(psnr(lena_gray.astype(float), dec.astype(float)))
    assert sizes == sorted(sizes), sizes
    assert psnrs == sorted(psnrs), psnrs
    assert psnrs[-1] > 35

"""CLI + analysis layer tests (reference L5/L6: main.c, analyze_results.py)."""
import io
import os

import numpy as np
import pytest
from PIL import Image

from jpegtpu import analysis, cli


@pytest.fixture(scope="module")
def encoded(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    src = "/root/reference/assets/input/lena.bmp"
    if not os.path.exists(src):
        pytest.skip("reference corpus missing")
    out = str(d / "lena.jpg")
    rc = cli.main(["encode", src, out, "--entropy", "host"])
    assert rc == 0
    return src, out


def test_cli_encode_decodes(encoded):
    src, out = encoded
    img = Image.open(out)
    assert img.size == (512, 512)


def test_cli_quality_flag(tmp_path, encoded):
    src, _ = encoded
    lo = str(tmp_path / "q10.jpg")
    hi = str(tmp_path / "q90.jpg")
    cli.main(["encode", src, lo, "--quality", "10", "--entropy", "host"])
    cli.main(["encode", src, hi, "--quality", "90", "--entropy", "host"])
    assert os.path.getsize(lo) < os.path.getsize(hi)


def test_analysis_metrics_match_reference_table(encoded):
    """PSNR on our own encode must beat the natural_c bar (BASELINE.md:
    lena natural_c PSNR 35.76 dB; the committed DSP output scores 33.84)."""
    src, out = encoded
    r = analysis.analyze_pair(src, out)
    assert r.psnr_db >= 35.7
    assert 0 < r.ssim <= 1
    assert r.compression_ratio > 10
    assert r.bits_per_pixel < 1.0


def test_analysis_of_reference_output_matches_report():
    """Running our analyzer on the reference's OWN committed output must
    reproduce the report's Table 4.1 numbers (BASELINE.md): lena MSE 26.85,
    PSNR 33.84, CR 50.9:1 — validates metric parity with
    analyze_results.py."""
    orig = "/root/reference/assets/input/lena.bmp"
    comp = "/root/reference/assets/output/lena.jpeg"
    if not (os.path.exists(orig) and os.path.exists(comp)):
        pytest.skip("reference corpus missing")
    r = analysis.analyze_pair(orig, comp)
    assert abs(r.mse - 26.85) < 0.1
    assert abs(r.psnr_db - 33.84) < 0.05
    assert abs(r.ssim - 0.8997) < 0.0005
    assert abs(r.compression_ratio - 50.9) < 0.5


def test_difference_figure_written(tmp_path, encoded):
    src, out = encoded
    fig = str(tmp_path / "diff.png")
    r = analysis.analyze_pair(src, out, diff_path=fig)
    assert os.path.getsize(fig) > 1000
    assert r.mse > 0


def test_cli_analyze_command(capsys, encoded):
    src, out = encoded
    rc = cli.main(["analyze", src, out])
    assert rc == 0
    captured = capsys.readouterr()
    assert "PSNR" in captured.out and "SSIM" in captured.out

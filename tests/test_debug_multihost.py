"""Debug observability + multihost helpers."""
import numpy as np

import jax

from jpegtpu import debug
from jpegtpu.config import EncodeConfig
from jpegtpu.parallel import multihost


def test_first_block_report_matches_golden(golden):
    from jpegtpu.io import bmp

    if golden["bmp_path"] is None:
        import pytest

        pytest.skip("input bmp missing")
    rgb = bmp.read(golden["bmp_path"])
    rep = debug.first_block_report(rgb, EncodeConfig())
    assert np.array_equal(rep["y"], golden["y"][:8, :8])
    np.testing.assert_array_equal(
        rep["quant"].astype(np.int16), golden["quant"][:8, :8]
    )
    assert np.array_equal(rep["zigzag"], golden["zigzag"][0].astype(np.int32))
    text = debug.format_block_report(rep)
    assert "--- quant ---" in text


def test_multihost_helpers_single_host():
    multihost.initialize()  # no-op here
    mesh = multihost.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert multihost.is_coordinator()
    mine = multihost.local_shard_indices(mesh)
    assert mine == list(range(len(jax.devices())))

"""Two-half ILP pack loop (JPEGTPU_PACK_SPLIT) byte parity.

The experimental split walks [1,16) and [16,kmax) as independent
dependency chains (half B seeded by a trailing-zero prologue) and
funnel-merges the two frames. It must be bit-identical to the serial
walk for every boundary shape: runs crossing the split, first/last
nonzero at the split, all-zero AC, tail nonzero at 63, triple-ZRL runs,
and the runtime-table path.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from jpegtpu.entropy import pallas_pack as pp


@pytest.fixture(autouse=True)
def _clean_jit_cache():
    """The jit cache keys on call signature, not on _PACK_SPLIT — drop
    split-traced entries so later tests in this worker get the default
    serial trace back."""
    yield
    pp.encode_blocks_pallas.clear_cache()


@pytest.fixture
def tricky_blocks():
    rng = np.random.default_rng(2)
    nb = 4096
    zz = (
        rng.integers(-40, 40, (nb, 64))
        * (rng.random((nb, 64)) < 0.15)
    ).astype(np.int32)
    zz[0, 1:] = 0                                  # all-zero AC
    zz[1, 63] = -1023                              # nonzero at element 63
    zz[2, 1:] = 0; zz[2, 35] = 3                   # run crossing the split
    zz[3, 1:] = 0; zz[3, 16] = 5                   # first nonzero AT split
    zz[4, 1:] = 0; zz[4, 15] = 7                   # last nonzero below split
    zz[5, 1:] = 0; zz[5, 50] = 1; zz[5, 63] = 2    # double ZRL + tail
    zz[6, 1] = 9; zz[6, 2:] = 0; zz[6, 63] = 1     # 60-zero run (3 ZRLs)
    dcd = rng.integers(-2047, 2048, nb).astype(np.int32)
    return zz, dcd


@pytest.mark.parametrize("table", [0, 1])
def test_split_matches_serial(monkeypatch, tricky_blocks, table):
    zz, dcd = tricky_blocks
    outs = {}
    for flag in (False, True):
        monkeypatch.setattr(pp, "_PACK_SPLIT", flag)
        pp.encode_blocks_pallas.clear_cache()
        w, b, ov = pp.encode_blocks_pallas(
            jnp.asarray(zz), jnp.asarray(dcd), cap=8, table=table,
            interpret=True,
        )
        outs[flag] = (np.asarray(w), np.asarray(b), bool(ov))
    np.testing.assert_array_equal(outs[True][0], outs[False][0])
    np.testing.assert_array_equal(outs[True][1], outs[False][1])
    assert outs[True][2] == outs[False][2]


def test_split_matches_serial_runtime_tables(monkeypatch, tricky_blocks):
    from jpegtpu.entropy.device import _host_luts

    zz, dcd = tricky_blocks
    dc_c, dc_l, ac_c, ac_l = _host_luts()
    tabs = jnp.asarray(
        pp.pack_runtime_tables(dc_c[0], dc_l[0], ac_c[0], ac_l[0])
    )
    outs = {}
    for flag in (False, True):
        monkeypatch.setattr(pp, "_PACK_SPLIT", flag)
        pp.encode_blocks_pallas.clear_cache()
        w, b, _ = pp.encode_blocks_pallas(
            jnp.asarray(zz), jnp.asarray(dcd), cap=8, table=0,
            custom_tables=tabs, interpret=True,
        )
        outs[flag] = (np.asarray(w), np.asarray(b))
    np.testing.assert_array_equal(outs[True][0], outs[False][0])
    np.testing.assert_array_equal(outs[True][1], outs[False][1])

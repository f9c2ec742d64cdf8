"""Huffman table lookup strategies inside the fused pack kernel.

The (run, size) -> packed-code map has no VPU gather, so it is computed
with vectorized selects; two interchangeable shapes exist
(entropy/pallas_pack.py): the serial select cascade (default — measured
fastest on silicon) and the balanced mux tree (kept behind
JPEGTPU_HUFF_LOOKUP for re-measurement). Both must agree exactly with a
host table walk, and the kernel output must be identical under either
(tests the reference's rle.c:84-123 + huffman.c table-walk semantics,
vectorized).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from jpegtpu.entropy import pallas_pack as pp


@pytest.mark.parametrize("n", [2, 3, 11, 12, 16, 137, 176])
def test_tree_matches_cascade_and_host(n):
    rng = np.random.default_rng(n)
    consts = [int(v) for v in rng.integers(0, 1 << 22, n)]
    idx = rng.integers(0, n, (8, 128)).astype(np.int32)
    want = np.asarray(consts, np.int32)[idx]
    got_tree = np.asarray(pp._select_tree(jnp.asarray(idx), consts))
    got_casc = np.asarray(pp._select_cascade(jnp.asarray(idx), consts))
    np.testing.assert_array_equal(got_tree, want)
    np.testing.assert_array_equal(got_casc, want)


def test_tree_scalar_entries():
    # traced-scalar entries (the runtime-table kernel's SMEM loads)
    consts = [jnp.int32(7), jnp.int32(9), jnp.int32(11)]
    idx = jnp.asarray(np.array([[0, 1, 2, 1]] * 8, np.int32))
    out = np.asarray(pp._select_tree(idx, consts))
    np.testing.assert_array_equal(out, np.array([[7, 9, 11, 9]] * 8))


def test_split_tables_roundtrip():
    """The bit-packed sub-table decomposition (canonical base[len] +
    rank) must reproduce every entry of both static AC tables."""
    import jax.numpy as jnp

    for table in (0, 1):
        ac = pp._kernel_tables(table)[1]
        flat = tuple(int(ac[r, s]) for r in range(16) for s in range(11))
        len4, rank8, base16 = pp._split_tables(flat)
        idx = jnp.asarray(
            np.arange(176, dtype=np.int32).reshape(11, 16)
        )
        got = np.asarray(
            pp._lookup_split(idx, len4, rank8, base16)
        ).reshape(-1)
        np.testing.assert_array_equal(got, np.array(flat))


def test_kernel_identical_under_both_lookups(monkeypatch):
    rng = np.random.default_rng(0)
    nb = 2048
    zz = (
        rng.integers(-40, 40, (nb, 64))
        * (rng.random((nb, 64)) < 0.15)
    ).astype(np.int32)
    zz[0, 1] = 1023  # max AC size category
    zz[1, 63] = -1023  # full-length block
    dcd = rng.integers(-2047, 2048, nb).astype(np.int32)
    outs = {}
    for mode in ("cascade", "tree", "split"):
        monkeypatch.setattr(pp, "_HUFF_LOOKUP", mode)
        # the jit trace closes over _HUFF_LOOKUP at trace time
        pp.encode_blocks_pallas.clear_cache()
        w, b, ov = pp.encode_blocks_pallas(
            jnp.asarray(zz), jnp.asarray(dcd), cap=8, table=0,
            interpret=True,
        )
        outs[mode] = (np.asarray(w), np.asarray(b), bool(ov))
    # drop the non-default traces: the jit cache keys on signature, not
    # on _HUFF_LOOKUP, and the loop ends on "split"
    pp.encode_blocks_pallas.clear_cache()
    for mode in ("tree", "split"):
        np.testing.assert_array_equal(outs[mode][0], outs["cascade"][0])
        np.testing.assert_array_equal(outs[mode][1], outs["cascade"][1])
        assert outs[mode][2] == outs["cascade"][2]

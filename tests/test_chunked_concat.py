"""Chunked single-stream concat (8K+ frames past the VMEM budget).

pallas_concat.concat_raw_chunked must be bit-identical to the
VMEM-resident concat_raw_pallas for any geometry: the chunk split is an
implementation detail (worst-case-sized VMEM chunk blocks + device
OR-combine at base words), never a stream-visible one. Replaces the XLA
merge-tree fallback for large frames (measured 3.1x at 33 MPix, see
BENCH_LOG.jsonl). Covers multi-chunk splits, the nrg-padding path, and
partial last block rows.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from jpegtpu.entropy import pallas_concat as pc

CAP = 4
M32 = np.uint64(0xFFFFFFFF)


def _random_streams(rng, g):
    """MSB-aligned per-block packed streams with words masked to bits."""
    bits = rng.integers(0, CAP * 32 + 1, (g, 8, 128)).astype(np.int32)
    w = rng.integers(0, 2 ** 32, (g, CAP, 8, 128), dtype=np.uint64)
    w = w.astype(np.uint32)
    wm = np.zeros_like(w)
    for j in range(CAP):
        valid = bits > j * 32
        full = bits >= (j + 1) * 32
        part = np.clip(bits - j * 32, 0, 32).astype(np.uint64)
        mask = np.where(full, M32, (M32 << (np.uint64(32) - part)) & M32)
        wm[:, j] = np.where(valid, w[:, j] & mask.astype(np.uint32), 0)
    return wm, bits


@pytest.mark.parametrize(
    "nbh,nbw,ncg,rpc",
    [
        (16, 256, 2, 1),   # every grid step its own chunk
        (16, 256, 2, 2),   # even split
        (24, 384, 3, 3),   # exact single chunk
        (8, 128, 1, 2),    # nrg < rpc: padding path
        (17, 200, 2, 2),   # partial last block row + pad lanes
    ],
)
def test_chunked_matches_resident(nbh, nbw, ncg, rpc):
    rng = np.random.default_rng(nbh * 1000 + nbw + rpc)
    nrg = -(-nbh // 8)
    wm, bits = _random_streams(rng, nrg * ncg)
    wj, bj = jnp.asarray(wm), jnp.asarray(bits)
    ref_w, ref_t = pc.concat_raw_pallas(wj, bj, nbh, nbw, ncg,
                                        interpret=True)
    got_w, got_t = pc.concat_raw_chunked(wj, bj, nbh, nbw, ncg, rpc,
                                         interpret=True)
    assert int(ref_t) == int(got_t)
    nw = (int(ref_t) + 31) // 32
    np.testing.assert_array_equal(
        np.asarray(ref_w)[:nw], np.asarray(got_w)[:nw]
    )


def test_chunk_plan_budget():
    # the default gray config (cap 8, ncg 8) must plan a usable chunk
    assert pc.chunk_plan(8, 8) >= 1
    # the 4:2:0 merged-MCU config too
    assert pc.chunk_plan(48, 4) >= 1
    # an absurd capacity must return 0 (treepack fallback stays)
    assert pc.chunk_plan(8192, 8) == 0

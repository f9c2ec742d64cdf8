"""pallas_concat vs the XLA merge tree: identical streams, any geometry."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jpegtpu.entropy import pallas_concat, pallas_pack, treepack
from jpegtpu.ops import pallas_transform as pt


def _random_levels(rng, nb):
    """Realistic-ish sparse coefficient blocks."""
    zz = np.zeros((nb, 64), np.int32)
    for i in range(nb):
        k = rng.integers(0, 10)
        pos = rng.choice(40, size=k, replace=False) if k else []
        zz[i, pos] = rng.integers(-31, 32, size=k)
    zz[:, 0] = rng.integers(-40, 40, size=nb)
    return zz


def _to_raw(arr_scan, nbh, nbw, ncg):
    return np.asarray(pt.scan_to_raw(jnp.asarray(arr_scan), nbh, nbw, ncg))


@pytest.mark.parametrize(
    "nbh,nbw,ncg,cap",
    [
        (8, 128, 1, 8),
        (11, 200, 2, 8),
        (16, 256, 2, 6),
        (3, 40, 1, 8),
    ],
)
def test_concat_raw_matches_tree(nbh, nbw, ncg, cap):
    rng = np.random.default_rng(nbh * 1000 + nbw)
    nb = nbh * nbw
    zz = _random_levels(rng, nb)
    dcd = np.concatenate([[zz[0, 0]], np.diff(zz[:, 0])]).astype(np.int32)

    w_t, bits, ov = pallas_pack.encode_blocks_pallas(
        jnp.asarray(zz), jnp.asarray(dcd), cap=cap, table=0, interpret=True
    )
    assert not bool(ov)
    exp_words, exp_total = treepack.concat_blocks_tree(w_t, bits)
    exp_words, exp_total = np.asarray(exp_words), int(exp_total)

    # grid-natural inputs: re-tile the scan-order levels, encode raw
    zz_raw = np.stack(
        [_to_raw(zz[:, c], nbh, nbw, ncg) for c in range(64)], axis=1
    )
    dcd_raw = _to_raw(dcd, nbh, nbw, ncg)
    w_raw, b_raw, _ = pallas_pack.encode_blocks_pallas(
        jnp.asarray(zz_raw), jnp.asarray(dcd_raw), cap=cap, table=0,
        interpret=True, raw=True,
    )
    got_words, got_total = pallas_concat.concat_raw_pallas(
        w_raw, b_raw, nbh, nbw, ncg, interpret=True
    )
    got_words = np.asarray(got_words)
    assert got_total == exp_total
    nw = (exp_total + 31) // 32
    np.testing.assert_array_equal(got_words[:nw], exp_words[:nw])


def _merge_ref(w, b):
    """Python-int reference for merge_sublanes: concat each (g, s) row's
    128 MSB-aligned lane streams."""
    g, cap = w.shape[:2]
    sr = cap + 1
    out = np.zeros((g, 8, sr, 128), np.uint32)
    for gi in range(g):
        for s in range(8):
            acc, total = 0, 0
            for l in range(128):
                nb = int(b[gi, s, l])
                val = 0
                for j in range(cap):
                    val = (val << 32) | int(w[gi, j, s, l])
                val >>= cap * 32 - nb  # MSB-aligned -> low nb bits
                acc = (acc << nb) | val
                total += nb
            pad = sr * 128 * 32 - total
            acc <<= pad
            for k in range(sr * 128):
                out[gi, s, k // 128, k % 128] = (
                    acc >> (32 * (sr * 128 - 1 - k))
                ) & 0xFFFFFFFF
    return out


@pytest.mark.parametrize("cap", [48, 8])
def test_merge_sublanes_matches_reference(cap):
    """Both deposit kernels (skew for large caps, one-hot for small)
    against the python-int concat."""
    rng = np.random.default_rng(7 + cap)
    g = 2
    b = rng.integers(0, cap * 32 + 1, (g, 8, 128)).astype(np.int32)
    b[0, 0, :] = 0  # empty row
    b[0, 1, :3] = [cap * 32, 0, 17]
    w = rng.integers(0, 1 << 32, (g, cap, 8, 128), dtype=np.uint64).astype(
        np.uint32
    )
    # MSB-aligned masking: zero bits past each stream's count
    for j in range(cap):
        lo = np.maximum(0, np.minimum(32, b - 32 * j)).astype(np.uint32)
        mask = np.where(
            lo == 0, 0, (0xFFFFFFFF << (32 - lo)) & 0xFFFFFFFF
        ).astype(np.uint32)
        w[:, j] &= mask
    segs = np.asarray(
        pallas_concat.merge_sublanes_pallas(
            jnp.asarray(w), jnp.asarray(b), interpret=True
        )
    )
    np.testing.assert_array_equal(segs, _merge_ref(w, b))


@pytest.mark.parametrize("ws", [128, 32])
def test_merge_sublanes_skew_small_cap(monkeypatch, ws):
    """Compiled backends use the SKEW deposit at every cap (the
    interpret-mode suite keeps the wide kernel below cap 24 only for
    trace speed) — force the skew here at cap 8 so the kernel
    production actually runs at small caps has interpret coverage too,
    for both the single-segment and chunked-row (batch ws<128)
    layouts."""
    monkeypatch.setattr(pallas_concat, "_SKEW_MIN_CAP", 0)
    pallas_concat.merge_sublanes_pallas.clear_cache()
    cap = 8
    rng = np.random.default_rng(99)
    g = 2
    b = rng.integers(0, cap * 32 + 1, (g, 8, 128)).astype(np.int32)
    b[0, 0, :] = 0
    b[0, 1, :3] = [cap * 32, 0, 17]
    w = rng.integers(0, 1 << 32, (g, cap, 8, 128), dtype=np.uint64).astype(
        np.uint32
    )
    for j in range(cap):
        lo = np.maximum(0, np.minimum(32, b - 32 * j)).astype(np.uint32)
        mask = np.where(
            lo == 0, 0, (0xFFFFFFFF << (32 - lo)) & 0xFFFFFFFF
        ).astype(np.uint32)
        w[:, j] &= mask
    skew = np.asarray(
        pallas_concat.merge_sublanes_pallas(
            jnp.asarray(w), jnp.asarray(b), ws=ws, interpret=True
        )
    )
    monkeypatch.setattr(pallas_concat, "_SKEW_MIN_CAP", 24)
    pallas_concat.merge_sublanes_pallas.clear_cache()
    wide = np.asarray(
        pallas_concat.merge_sublanes_pallas(
            jnp.asarray(w), jnp.asarray(b), ws=ws, interpret=True
        )
    )
    pallas_concat.merge_sublanes_pallas.clear_cache()
    np.testing.assert_array_equal(skew, wide)


def test_fits_vmem_gate():
    # 12 MPix gray (378x504 blocks) fits; a 100 MPix image must not.
    assert pallas_concat.fits_vmem(384, 512, 8, 4)
    assert not pallas_concat.fits_vmem(1280, 1280, 8, 10)
    # 12 MPix 4:2:0 color: merged MCU streams, cap 48
    assert pallas_concat.fits_vmem(189, 252, 48, 2)


def test_merge_sublanes_one_group():
    """Single group, bits known by hand: two lanes only."""
    cap = 4
    w = np.zeros((1, cap, 8, 128), np.uint32)
    b = np.zeros((1, 8, 128), np.int32)
    # sublane 3: lane 0 has 40 bits, lane 1 has 13 bits
    w[0, 0, 3, 0] = 0xDEADBEEF
    w[0, 1, 3, 0] = 0xAB000000  # 8 more bits
    b[0, 3, 0] = 40
    w[0, 0, 3, 1] = 0xFFE00000  # 11 bits
    b[0, 3, 1] = 11
    segs = np.asarray(
        pallas_concat.merge_sublanes_pallas(
            jnp.asarray(w), jnp.asarray(b), interpret=True
        )
    )
    # lane 1's 11 bits start at bit 40 of the segment
    exp0 = 0xDEADBEEF
    exp1 = (0xAB000000 | (0xFFE00000 >> 8)) & 0xFFFFFFFF
    exp2 = (0xFFE00000 << 24) & 0xFFFFFFFF
    assert segs[0, 3, 0, 0] == exp0
    assert segs[0, 3, 0, 1] == exp1
    assert segs[0, 3, 0, 2] == exp2
    assert segs[0, 3].sum() == exp0 + exp1 + exp2
    assert segs[0, 2].sum() == 0

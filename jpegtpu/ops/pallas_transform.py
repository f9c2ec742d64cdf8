"""Fused Pallas transform: pixels -> quantized zigzag levels in the
entropy kernel's native tiling, zero XLA relayouts.

The XLA fused transform (`ops/fused_transform.py`) computes the DCT
matmuls at memory speed, but the surrounding data movement — blockify
transpose, zigzag gather, and the coefficient-major re-tiling the fused
entropy kernel consumes — costs ~2.5 ms for a 12 MPix image (measured,
tools/levels_micro.py), ~20x the matmuls themselves. This kernel folds
that entire permutation into the transform:

- Tile = [64, 1024] pixels = 8 block rows x 128 block columns, exactly
  one [64, 8, 128] output step of `entropy.pallas_pack.encode_blocks_pallas`.
- Column DCT uses a ROW-PERMUTED block-diagonal basis (output row
  8u + br), row DCT runs per 128-lane chunk with a COLUMN-PERMUTED
  basis (output lane 16v + bc), so coefficient (u, v) of every block in
  the tile lands in one contiguous [8, 16] window — the zigzag
  placement is 64 aligned vector stores, not a gather.
- Quantization (true division by the Annex-K/IJG table + roundf's
  round-half-away, natural_c quantization.c:36) applies to whole
  [64, 128] chunks against a statically re-tiled quant pattern.

Block (br, bc) of a plane maps to grid-natural coordinates
(g = (br >> 3) * ncg + (bc >> 7), sublane = br & 7, lane = bc & 127).
Scan-order consumers recover raster order with major-axis slices of the
small per-block outputs (words/bits), never of the 64-wide levels.

This is the TPU edition of the DSP port's macro-block loop
(dsp jpeg_compression.c:125-186): transform-to-symbol-ready data staged
through fast memory in one pass, with Pallas BlockSpecs playing the
Streaming Engines' role (streaming_engine.cpp:8-34).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import tables

TILE_H = 64      # 8 block rows
TILE_W = 1024    # 128 block cols
LANES = 128
SUBLANES = 8

_INT_FRAC = 11               # int-mode fixed point (ops/int_transform.py)
_INT_HALF = 1 << (_INT_FRAC - 1)


@functools.lru_cache(maxsize=4)
def _permuted_bases(bitexact: bool):
    """(col basis [64, 64], row chunk basis [128, 128]) f32.

    Col: out[8u + br] = sum_y T[u, y] * in[8br + y]
    Row: out[16v + bc] = sum_x T[v, x] * in[8bc + x]
    """
    t8 = (
        tables.dct_basis_reference(np.float32)
        if bitexact
        else tables.dct_basis(np.float32)
    )
    col = np.zeros((TILE_H, TILE_H), np.float32)
    for u in range(8):
        for br in range(8):
            for y in range(8):
                col[8 * u + br, 8 * br + y] = t8[u, y]
    row = np.zeros((LANES, LANES), np.float32)
    for v in range(8):
        for bc in range(16):
            for x in range(8):
                row[8 * bc + x, 16 * v + bc] = t8[v, x]
    return col, row


def _quant_pattern(qtable, dtype=jnp.float32):
    """[64, 128]: q[u, v] at [8u + br, 16v + bc] (traceable)."""
    qt = jnp.asarray(qtable, dtype).reshape(8, 8)
    return jnp.repeat(jnp.repeat(qt, SUBLANES, axis=0), 16, axis=1)


@functools.lru_cache(maxsize=4)
def _permuted_bases_int(bitexact: bool):
    """The int-mode (ops/int_transform.py) 11-bit fixed-point bases in the
    same output permutation as `_permuted_bases`, held as integer-VALUED
    f32: every entry is an exact small integer, so the MXU dots below are
    error-free and the whole kernel is bit-deterministic across backends."""
    t8 = (
        tables.dct_basis_reference(np.float64)
        if bitexact
        else tables.dct_basis(np.float64)
    )
    t_i = np.round(t8 * (1 << _INT_FRAC))
    col = np.zeros((TILE_H, TILE_H), np.float32)
    for u in range(8):
        for br in range(8):
            for y in range(8):
                col[8 * u + br, 8 * br + y] = t_i[u, y]
    row = np.zeros((LANES, LANES), np.float32)
    for v in range(8):
        for bc in range(16):
            for x in range(8):
                row[8 * bc + x, 16 * v + bc] = t_i[v, x]
    return col, row


_ZZ_OF_UV = np.empty((8, 8), np.int64)
for _k, (_u, _v) in enumerate(
    (divmod(int(i), 8) for i in np.asarray(tables.ZIGZAG_ORDER))
):
    _ZZ_OF_UV[_u, _v] = _k


def _store_zigzag(out_ref, chunks, single_store: bool, prefix=()):
    """Place coefficient (u, v) windows at their zigzag index.

    single_store=False (Mosaic/TPU): 64 individual aligned vector stores
    — the kernel's whole point (zigzag placement as the store pattern).
    single_store=True (interpret mode): one stacked store. Interpret
    lowering turns per-index stores into 64 chained dynamic-update-slices
    whose rewrite pattern cycles XLA:CPU's algebraic simplifier ("stuck
    in a circular simplification loop ... 50 runs" at every compile, and
    ~1.7x the compile time — measured; >32 chained DUS triggers it).

    prefix: extra leading out_ref indices (multi-component kernels write
    [ncomp, 64, 8, 128] blocks)."""
    wins = [None] * 64
    for u in range(8):
        for v in range(8):
            wins[int(_ZZ_OF_UV[u, v])] = jnp.concatenate(
                [
                    ch[8 * u : 8 * u + 8, 16 * v : 16 * v + 16]
                    for ch in chunks
                ],
                axis=1,
            )
    if single_store:
        if prefix:
            out_ref[prefix] = jnp.stack(wins, axis=0)
        else:
            out_ref[...] = jnp.stack(wins, axis=0)
    else:
        for c in range(64):
            out_ref[prefix + (c,)] = wins[c]


def _dct_store_f32(x, colb_ref, rowb_ref, q_ref, out_ref, single_store,
                   prefix=()):
    """Centered pixels [64, 1024] f32 -> quantized zigzag level stores.

    The float path: MXU column/row DCT matmuls against the permuted
    bases, true division by the quant pattern, roundf's round-half-away
    (natural_c quantization.c:36)."""
    y = jax.lax.dot(
        colb_ref[...], x, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    rowb = rowb_ref[...]
    q = q_ref[...]
    chunks = []
    for c in range(TILE_W // LANES):
        z = jax.lax.dot(
            y[:, c * LANES : (c + 1) * LANES], rowb,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        s = z / q
        # round-half-away == truncate-toward-zero after +/-0.5 bias
        # (floor(s+.5) for s>=0, ceil(s-.5) for s<0 — identical
        # values, two fewer vector passes than the
        # floor/ceil/select chain).
        lv = (s + jnp.where(s >= 0, 0.5, -0.5)).astype(jnp.int32)
        chunks.append(lv)
    _store_zigzag(out_ref, chunks, single_store, prefix)


def _make_transform_kernel(single_store: bool):
    def _transform_kernel(x_ref, colb_ref, rowb_ref, q_ref, out_ref):
        """[64, 1024] u8 pixels -> [64, 8, 128] i32 zigzag levels."""
        # Mosaic has no direct u8->f32 cast; widen to i32 first.
        x = x_ref[...].astype(jnp.int32).astype(jnp.float32) - 128.0
        _dct_store_f32(x, colb_ref, rowb_ref, q_ref, out_ref, single_store)

    return _transform_kernel


def _make_transform_kernel_int(single_store: bool):
    def _transform_kernel_int(x_ref, colb_ref, rowb_ref, q_ref, out_ref):
        _transform_kernel_int_body(
            x_ref, colb_ref, rowb_ref, q_ref, out_ref, single_store
        )

    return _transform_kernel_int


def _transform_kernel_int_body(x_ref, colb_ref, rowb_ref, q_ref, out_ref,
                               single_store):
    x = x_ref[...].astype(jnp.int32).astype(jnp.float32) - 128.0
    _dct_store_int(x, colb_ref, rowb_ref, q_ref, out_ref, single_store)


def _dct_store_int(x, colb_ref, rowb_ref, q_ref, out_ref, single_store,
                   prefix=()):
    """Integer-mode twin of `_dct_store_f32`: bit-identical to
    ops/int_transform.transform_tiled_int on every backend.

    The bases are 11-bit fixed-point integers carried as f32; pixels are
    8-bit integers. Every product is below 2^19 and every accumulation
    below 2^23, so the f32 MXU dots (HIGHEST precision: exact bf16
    operand splits, f32 accumulate) are error-free — the dot RESULTS are
    the exact integers, independent of backend or pass decomposition.
    Descales and quantization then run in real int32 vector ops:
      y1 = (colb @ x   + 2^10) >> 11
      f  = (y1 @ rowb  + 2^10) >> 11
      |level| = (2|f| + q) // 2q   (round-half-away, natural_c
                quantization.c:36), sign restored from f.
    The floor division is an f32-reciprocal estimate corrected by +/-1
    with exact int32 compares, immune to Mosaic's division rounding."""
    y = jax.lax.dot(
        colb_ref[...], x, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    y1 = ((y.astype(jnp.int32) + _INT_HALF) >> _INT_FRAC).astype(
        jnp.float32
    )
    rowb = rowb_ref[...]
    q = q_ref[...]
    d = 2 * q
    df = d.astype(jnp.float32)
    chunks = []
    for c in range(TILE_W // LANES):
        z = jax.lax.dot(
            y1[:, c * LANES : (c + 1) * LANES], rowb,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        f = (z.astype(jnp.int32) + _INT_HALF) >> _INT_FRAC
        t = 2 * jnp.abs(f) + q
        k = (t.astype(jnp.float32) / df).astype(jnp.int32)
        k = k - (k * d > t).astype(jnp.int32)
        k = k + ((k + 1) * d <= t).astype(jnp.int32)
        chunks.append(jnp.where(f < 0, -k, k))
    _store_zigzag(out_ref, chunks, single_store, prefix)


def padded_dims_kernel(h: int, w: int) -> tuple[int, int]:
    return (-(-h // TILE_H) * TILE_H, -(-w // TILE_W) * TILE_W)


@functools.partial(
    jax.jit, static_argnames=("bitexact", "interpret", "int_mode")
)
def transform_plane_raw(img, qtable, bitexact: bool = True,
                        interpret: bool = False, int_mode: bool = False):
    """Pixel plane [PH, PW] (PH % 64 == 0, PW % 1024 == 0, uint8/int) ->
    zigzag levels [G, 64, 8, 128] i32 in the entropy kernel's tiling,
    G = (PH//64) * (PW//1024) grid-natural tiles (row groups major).

    Block (br, bc) -> (g, s, l) = ((br>>3)*ncg + (bc>>7), br&7, bc&127).
    Pad lanes (from rounding PH/PW up) hold the transform of whatever
    padding pixels were supplied; callers slice or mask downstream.

    int_mode=True runs the bit-deterministic integer transform
    (dct_dtype="int32", ops/int_transform.py semantics) at the same
    all-Pallas speed — identical levels on every backend and chip count.
    """
    ph, pw = img.shape
    nrg, ncg = ph // TILE_H, pw // TILE_W
    if int_mode:
        colb, rowb = _permuted_bases_int(bitexact)
        qpat = _quant_pattern(qtable, jnp.int32)
    else:
        colb, rowb = _permuted_bases(bitexact)
        qpat = _quant_pattern(qtable)
    out = pl.pallas_call(
        _make_transform_kernel_int(interpret)
        if int_mode
        else _make_transform_kernel(interpret),
        grid=(nrg, ncg),
        in_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, LANES), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, LANES), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, None, 64, SUBLANES, LANES),
            lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nrg, ncg, 64, SUBLANES, LANES), jnp.int32
        ),
        interpret=interpret,
    )(img, jnp.asarray(colb), jnp.asarray(rowb), jnp.asarray(qpat))
    return out.reshape(nrg * ncg, 64, SUBLANES, LANES)


def raw_to_scan(raw, nbh: int, nbw: int, ncg: int):
    """[G, C, 8, 128] grid-natural -> [C, nbh*nbw] raster scan order.

    Major-axis transpose + slice of a small per-block array (words, bits,
    DC values — NEVER the 64-wide levels)."""
    g, c = raw.shape[:2]
    nrg = g // ncg
    x = raw.reshape(nrg, ncg, c, SUBLANES, LANES)
    x = x.transpose(2, 0, 3, 1, 4).reshape(c, nrg * SUBLANES, ncg * LANES)
    return x[:, :nbh, :nbw].reshape(c, nbh * nbw)


def scan_to_raw(arr, nbh: int, nbw: int, ncg: int):
    """[nbh*nbw] raster scan -> [G, 8, 128] grid-natural (zero-padded)."""
    nrg = -(-nbh // SUBLANES)
    x = arr.reshape(nbh, nbw)
    x = jnp.pad(x, ((0, nrg * SUBLANES - nbh), (0, ncg * LANES - nbw)))
    x = x.reshape(nrg, SUBLANES, ncg, LANES).transpose(0, 2, 1, 3)
    return x.reshape(nrg * ncg, SUBLANES, LANES)


# --- fused RGB color convert + transform --------------------------------
#
# The separate XLA color-convert + subsample + plane relayouts cost more
# than both DCT matmul passes combined (measured: conv+sub ~6.5 ms of a
# ~21 ms 256x512^2 color batch body — int32 multiply chains over every
# pixel as standalone memory-bound XLA programs). These kernels fold the
# fixed-point YCbCr conversion (ops/color.py rgb_planar_to_ycbcr) and
# the box-filter chroma subsampling (subsample_420/422) into the
# transform kernel's VMEM-resident load path: planar uint8 RGB goes in,
# quantized zigzag levels come out, and the intermediate Y/Cb/Cr planes
# never touch HBM.
#
# Exactness: every step is integer-exact in f32 —
#   * the convert products (|w| <= 38470, px <= 255) and their sums
#     (|sum + half| < 2^24) are exact f32 integers; floor(x * 2^-16)
#     equals the int32 arithmetic >> 16 for negatives too;
#   * the 2x2 / 1x2 box sums ride the MXU as 0/1-matrix dots at HIGHEST
#     precision (exact bf16 splits), values <= 1020 < 2^24;
#   * floor((s + 2) * 0.25) == (s + 2) >> 2 (power-of-two scaling is
#     exact), matching subsample_420's rounding bit for bit.

_YCC_W = {
    # kind: (wr, wg, wb, bias_add, shift_scale) — fixed-point weights of
    # ops/color.rgb_planar_to_ycbcr (16-bit) / rgb_to_y_reference (8-bit)
    "y": (19595.0, 38470.0, 7471.0, 32768.0, 1.0 / 65536.0),
    "cb": (-11059.0, -21709.0, 32768.0, 32768.0, 1.0 / 65536.0),
    "cr": (32768.0, -27439.0, -5329.0, 32768.0, 1.0 / 65536.0),
    "y_ref": (77.0, 150.0, 29.0, 0.0, 1.0 / 256.0),
}


def _ycc_channel(rf, gf, bf, kind: str):
    """Exact fixed-point YCbCr channel on f32-integer pixel planes."""
    wr, wg, wb, half, scale = _YCC_W[kind]
    s = jnp.floor((wr * rf + wg * gf + wb * bf + half) * scale)
    if kind in ("y", "y_ref"):
        return s  # 0..255 by construction (weights sum to the scale)
    return jnp.clip(s + 128.0, 0.0, 255.0)


@functools.lru_cache(maxsize=4)
def _vsum_mat(fy: int):
    """[64, fy*64] 0/1 vertical pair-sum matrix (f32, exact on MXU)."""
    v = np.zeros((TILE_H, fy * TILE_H), np.float32)
    for i in range(TILE_H):
        for d in range(fy):
            v[i, fy * i + d] = 1.0
    return v


@functools.lru_cache(maxsize=4)
def _hsum_mat(fx: int):
    """[fx*128, 128] 0/1 horizontal pair-sum chunk matrix."""
    h = np.zeros((fx * LANES, LANES), np.float32)
    for j in range(LANES):
        for d in range(fx):
            h[fx * j + d, j] = 1.0
    return h


def _rgb_planes_f32(rgb_ref):
    # Mosaic has no direct u8->f32 cast; widen to i32 first.
    rf = rgb_ref[0].astype(jnp.int32).astype(jnp.float32)
    gf = rgb_ref[1].astype(jnp.int32).astype(jnp.float32)
    bf = rgb_ref[2].astype(jnp.int32).astype(jnp.float32)
    return rf, gf, bf


def _make_rgb_y_kernel(single_store: bool, int_mode: bool, kind: str):
    body = _dct_store_int if int_mode else _dct_store_f32

    def kernel(rgb_ref, colb_ref, rowb_ref, q_ref, out_ref):
        """[3, 64, 1024] u8 RGB -> [64, 8, 128] i32 luma zigzag levels."""
        rf, gf, bf = _rgb_planes_f32(rgb_ref)
        x = _ycc_channel(rf, gf, bf, kind) - 128.0
        body(x, colb_ref, rowb_ref, q_ref, out_ref, single_store)

    return kernel


def _make_rgb_chroma_kernel(fy: int, fx: int, single_store: bool,
                            int_mode: bool):
    body = _dct_store_int if int_mode else _dct_store_f32

    def kernel(rgb_ref, *refs):
        """[3, fy*64, fx*1024] u8 RGB -> [2, 64, 8, 128] i32 subsampled
        Cb/Cr zigzag levels (box filter folded in as exact MXU dots)."""
        i = 0
        vs_ref = hs_ref = None
        if fy > 1:
            vs_ref = refs[i]
            i += 1
        if fx > 1:
            hs_ref = refs[i]
            i += 1
        colb_ref, rowb_ref, q_ref, out_ref = refs[i : i + 4]
        rf, gf, bf = _rgb_planes_f32(rgb_ref)
        n = fy * fx
        for idx, kind in enumerate(("cb", "cr")):
            s = _ycc_channel(rf, gf, bf, kind)
            if fy > 1:
                s = jax.lax.dot(
                    vs_ref[...], s, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
            if fx > 1:
                cw = fx * LANES
                s = jnp.concatenate(
                    [
                        jax.lax.dot(
                            s[:, c * cw : (c + 1) * cw], hs_ref[...],
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32,
                        )
                        for c in range(TILE_W // LANES)
                    ],
                    axis=1,
                )
            if n > 1:  # round-to-nearest box filter: (s + n/2) >> log2(n)
                s = jnp.floor((s + (n // 2)) * (1.0 / n))
            body(s - 128.0, colb_ref, rowb_ref, q_ref, out_ref,
                 single_store, prefix=(idx,))

    return kernel


def _bases_and_q(qtable, bitexact: bool, int_mode: bool):
    if int_mode:
        colb, rowb = _permuted_bases_int(bitexact)
        qpat = _quant_pattern(qtable, jnp.int32)
    else:
        colb, rowb = _permuted_bases(bitexact)
        qpat = _quant_pattern(qtable)
    return jnp.asarray(colb), jnp.asarray(rowb), qpat


@functools.partial(
    jax.jit, static_argnames=("bitexact", "interpret", "int_mode", "kind")
)
def transform_rgb_y_raw(rgb, qtable, bitexact: bool = True,
                        interpret: bool = False, int_mode: bool = False,
                        kind: str = "y"):
    """Planar RGB [3, PH, PW] u8 (PH % 64 == 0, PW % 1024 == 0) ->
    luma zigzag levels [G, 64, 8, 128] i32, fused convert + transform.

    kind="y": JFIF/BT.601 fixed-point luma (rgb_planar_to_ycbcr);
    kind="y_ref": the reference's (77R+150G+29B)>>8 (converter.c:51).
    Bit-identical to converting first and calling transform_plane_raw."""
    _, ph, pw = rgb.shape
    nrg, ncg = ph // TILE_H, pw // TILE_W
    colb, rowb, qpat = _bases_and_q(qtable, bitexact, int_mode)
    out = pl.pallas_call(
        _make_rgb_y_kernel(interpret, int_mode, kind),
        grid=(nrg, ncg),
        in_specs=[
            pl.BlockSpec((3, TILE_H, TILE_W), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, LANES), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, LANES), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, None, 64, SUBLANES, LANES),
            lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nrg, ncg, 64, SUBLANES, LANES), jnp.int32
        ),
        interpret=interpret,
    )(rgb, colb, rowb, qpat)
    return out.reshape(nrg * ncg, 64, SUBLANES, LANES)


@functools.partial(
    jax.jit,
    static_argnames=("subsampling", "bitexact", "interpret", "int_mode"),
)
def transform_rgb_chroma_raw(rgb, qtable, subsampling: str,
                             bitexact: bool = True,
                             interpret: bool = False,
                             int_mode: bool = False):
    """Planar RGB [3, fy*KH, fx*KW] u8 (Y-resolution; KH % 64 == 0,
    KW % 1024 == 0 are the CHROMA padded dims) -> subsampled chroma
    zigzag levels [2*G, 64, 8, 128] i32 (all Cb tiles, then all Cr),
    the exact layout of transform_plane_raw(concat([cb, cr])).

    Fuses rgb_planar_to_ycbcr + subsample_420/422 + the transform into
    one VMEM pass; bit-identical to the unfused chain."""
    fy = 2 if subsampling == "420" else 1
    fx = 1 if subsampling == "444" else 2
    _, yh, yw = rgb.shape
    kh, kw = yh // fy, yw // fx
    nrg, ncg = kh // TILE_H, kw // TILE_W
    colb, rowb, qpat = _bases_and_q(qtable, bitexact, int_mode)
    operands = [rgb]
    in_specs = [
        pl.BlockSpec((3, fy * TILE_H, fx * TILE_W),
                     lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
    ]
    if fy > 1:
        operands.append(jnp.asarray(_vsum_mat(fy)))
        in_specs.append(
            pl.BlockSpec((TILE_H, fy * TILE_H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
        )
    if fx > 1:
        operands.append(jnp.asarray(_hsum_mat(fx)))
        in_specs.append(
            pl.BlockSpec((fx * LANES, LANES), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
        )
    operands += [colb, rowb, qpat]
    in_specs += [
        pl.BlockSpec((TILE_H, TILE_H), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((LANES, LANES), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_H, LANES), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        _make_rgb_chroma_kernel(fy, fx, interpret, int_mode),
        grid=(nrg, ncg),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (2, None, None, 64, SUBLANES, LANES),
            lambda i, j: (0, i, j, 0, 0, 0), memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (2, nrg, ncg, 64, SUBLANES, LANES), jnp.int32
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(2 * nrg * ncg, 64, SUBLANES, LANES)

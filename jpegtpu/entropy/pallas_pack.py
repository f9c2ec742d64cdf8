"""Pallas kernel: per-block bitstream packing as a vectorized BitWriter.

The XLA tree reduction (treepack._block_reduce) packs each block's 64
elements in log2(64) dense passes; its cost is dominated by per-level
relayouts and barrel-shift op chains. This kernel does the reduction the
way the DSP does (a serial accumulator, dsp huffman.c:113-156) but
vectorized over 1024 BLOCKS AT ONCE — lanes are blocks, the element loop
is sequential, and the whole state (128-bit accumulator window, bit
count, output frame) lives in vector registers:

  per element e of 64:
    shift the (<= 96-bit) element right by the accumulator residue,
    OR it in, then conditionally retire up to three full 32-bit words
    into the per-lane output frame (one-hot over the CAP frame words).

Emission is amortized: a block retires at most CAP words total, so the
whole loop is ~60 vector ops per element on [8, 128] tiles.

Only the within-block phase lives here; across-block concatenation stays
the XLA log-tree (treepack.concat_blocks_tree), which is efficient there
because element counts shrink geometrically.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
BLOCKS_PER_STEP = SUBLANES * LANES  # 1024


def _pack_kernel(w_ref, l_ref, out_ref, bits_ref, *, cap: int, n_elem: int):
    """w_ref [n_elem, 3, 8, 128] u32, l_ref [n_elem, 8, 128] i32,
    out_ref [cap, 8, 128] u32, bits_ref [1, 8, 128] i32."""
    shp = (SUBLANES, LANES)
    zero_u = jnp.zeros(shp, jnp.uint32)

    def body(e, carry):
        acc, cnt, widx, frame = carry  # acc: tuple of 4, frame: tuple of cap
        w0 = w_ref[e, 0]
        w1 = w_ref[e, 1]
        w2 = w_ref[e, 2]
        ln = l_ref[e]
        s = cnt.astype(jnp.uint32)  # residue < 32
        t = jnp.clip(32 - cnt, 0, 31).astype(jnp.uint32)
        nz = cnt > 0
        e0 = w0 >> s
        e1 = (w1 >> s) | jnp.where(nz, w0 << t, 0)
        e2 = (w2 >> s) | jnp.where(nz, w1 << t, 0)
        e3 = jnp.where(nz, w2 << t, 0)
        acc = (acc[0] | e0, acc[1] | e1, acc[2] | e2, acc[3] | e3)
        cnt = cnt + ln
        # retire up to 3 full words
        for _ in range(3):
            m = cnt >= 32
            word = jnp.where(m, acc[0], 0)
            frame = tuple(
                frame[j] | jnp.where(widx == j, word, 0) for j in range(cap)
            )
            acc = (
                jnp.where(m, acc[1], acc[0]),
                jnp.where(m, acc[2], acc[1]),
                jnp.where(m, acc[3], acc[2]),
                jnp.where(m, zero_u, acc[3]),
            )
            widx = widx + m.astype(jnp.int32)
            cnt = cnt - 32 * m.astype(jnp.int32)
        return acc, cnt, widx, frame

    init = (
        (zero_u, zero_u, zero_u, zero_u),
        jnp.zeros(shp, jnp.int32),
        jnp.zeros(shp, jnp.int32),
        tuple(zero_u for _ in range(cap)),
    )
    acc, cnt, widx, frame = jax.lax.fori_loop(0, n_elem, body, init)
    # flush the partial word (MSB-aligned residue, zeros below)
    partial = jnp.where(cnt > 0, acc[0], 0)
    frame = tuple(
        frame[j] | jnp.where(widx == j, partial, 0) for j in range(cap)
    )
    for j in range(cap):
        out_ref[j] = frame[j]
    bits_ref[0] = widx * 32 + cnt


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def pack_blocks_pallas(words_t, bits_t, cap: int = 8, interpret: bool = False):
    """Fused per-lane elements -> per-block packed streams.

    words_t: [3, E, nb] u32 (from treepack._fuse_subslots with c0=3),
    bits_t: [E, nb] i32. nb padded to 1024 internally.
    Returns (words [cap, nb] u32 MSB-aligned transposed, bits [nb] i32,
    overflow bool).
    """
    c0, e, nb = words_t.shape
    assert c0 == 3, "kernel expects 3-word fused elements"
    g = -(-nb // BLOCKS_PER_STEP)
    npad = g * BLOCKS_PER_STEP
    if npad != nb:
        words_t = jnp.pad(words_t, ((0, 0), (0, 0), (0, npad - nb)))
        bits_t = jnp.pad(bits_t, ((0, 0), (0, npad - nb)))
    # [3, E, npad] -> [G, E, 3, 8, 128]
    w = words_t.reshape(3, e, g, SUBLANES, LANES).transpose(2, 1, 0, 3, 4)
    l = bits_t.reshape(e, g, SUBLANES, LANES).transpose(1, 0, 2, 3)

    out, bits = pl.pallas_call(
        functools.partial(_pack_kernel, cap=cap, n_elem=e),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((None, e, 3, SUBLANES, LANES), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, e, SUBLANES, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, cap, SUBLANES, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, SUBLANES, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, cap, SUBLANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((g, 1, SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(w, l)

    # [G, cap, 8, 128] -> [cap, nb]
    words_out = out.transpose(1, 0, 2, 3).reshape(cap, npad)[:, :nb]
    bits_out = bits.reshape(g, BLOCKS_PER_STEP).reshape(-1)[:nb]
    overflow = jnp.any(bits_out > cap * 32)
    return words_out, bits_out, overflow

"""Pallas across-block bitstream concatenation: MXU one-hot deposit +
sequential streaming merge, replacing the XLA shift-or tree.

The XLA merge tree (treepack.concat_blocks_tree) is the framework's last
big inefficiency: every level re-materializes the full word array and the
barrel word-shift runs log2(capacity) pad/select passes per level —
measured ~6.5 ms for a 12 MPix image (tools/concat_micro.py), 400x the
stream's memory footprint. This module reformulates the whole concat as
TWO passes over the data:

1. `merge_sublanes_pallas` (Kernel A) — merge the 128 per-block streams
   of every (group, sublane) row into ONE segment, in one kernel step.
   Placement of each lane's word window at its (prefix-summed) word
   offset is a ONE-HOT MATMUL: out[p] = sum_l w'[j, l] * A[l, p] with
   A[l, p] = (base_l == p). The sum is exact because every bit of the
   output is written by exactly one code (disjoint-bit OR == add), and
   each 32-bit word is split into four 8-bit planes so bf16 MXU
   accumulation stays integer-exact (chunks < 2^8 <= bf16's 2^8 exact
   range). This is the TPU answer to the DSP's serial BitWriter
   (dsp huffman.c:113-156): the systolic array does the depositing.

2. `stream_concat_pallas` (Kernel B) — concatenate the scan-ordered
   segments by walking them with a SEQUENTIAL grid: each step funnels
   its segments by the bit residue, word-rolls them to the absolute lane
   offset (log-select over static rolls), and ORs them into a
   VMEM-RESIDENT output block (constant index_map = one writeback at the
   end). Per-segment bit offsets arrive via scalar prefetch.

Both kernels consume the grid-natural tiling that
`ops.pallas_transform.transform_plane_raw` / `pallas_pack` emit: block
(br, bc) at (g = (br>>3)*ncg + (bc>>7), sublane br&7, lane bc&127), so a
(group, sublane) row is 128 CONSECUTIVE scan blocks and segments order as
(block row, column group) — pure index arithmetic, no data relayout.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8


def _merge_kernel(w_ref, b_ref, out_ref, *, cap: int, ws: int = LANES):
    """w_ref [cap, 8, 128] u32 (pre-masked, words past bits are zero),
    b_ref [8, 128] i32 (pre-masked), out_ref [8, R, 128] u32. Lane l of
    sublane s is scan block 128*? + l; its bits deposit at the
    intra-segment offset = sum of preceding lanes IN ITS CHUNK.

    ws (a divisor of 128) splits each 128-lane row into nc = 128/ws
    INDEPENDENT chunk segments — the mechanism that keeps per-image
    streams separate when narrow images pack side by side into one
    plane. Chunk c's segment lands row-aligned at word c*cr*128
    (cr = chunk rows), so R = nc * cr; ws=128 degenerates to one
    segment per row with R = cap + 1 (the original behavior)."""
    sr = cap + 1
    nc = LANES // ws
    cr = -(-(ws * cap + cap + 2) // LANES)
    p_width = nc * cr * LANES
    out_rows = p_width // LANES
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    lane_c = lane_i % ws if nc > 1 else lane_i
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    ).astype(jnp.float32)
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (LANES, p_width), 1)
    for s in range(SUBLANES):
        b = b_ref[s : s + 1, :].astype(jnp.int32)  # [1, 128]
        inc = b
        for t in range(7):
            sh = 1 << t
            if sh >= ws:
                break
            inc = inc + jnp.where(
                lane_c >= sh, pltpu.roll(inc, sh, axis=1), 0
            )
        excl = jnp.where(lane_c >= 1, pltpu.roll(inc, 1, axis=1), 0)
        base = (excl >> 5) + (lane_i // ws) * (cr * LANES)
        r = jnp.bitwise_and(excl, 31).astype(jnp.uint32)
        t32 = jnp.clip(32 - (excl & 31), 0, 31).astype(jnp.uint32)
        rz = r == 0
        rows = [w_ref[j, s : s + 1, :] for j in range(cap)]
        zero_row = jnp.zeros((1, LANES), jnp.uint32)
        wpad = jnp.concatenate(rows + [zero_row], axis=0)  # [SR, 128]
        prev = jnp.concatenate([zero_row] + rows, axis=0)
        wp = jnp.where(rz, wpad, (wpad >> r) | (prev << t32))
        # base onto sublanes via an exact f32 identity matvec (no native
        # [1,128]->[128,1] transpose needed)
        base_t = jax.lax.dot_general(
            eye, base.astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # [128, 1]
        a_bf = (iota_p == base_t).astype(jnp.bfloat16)  # [128, P]
        eu = jnp.zeros((sr, p_width), jnp.uint32)
        for bidx in range(4):
            wb = (
                ((wp >> jnp.uint32(8 * bidx)) & jnp.uint32(0xFF))
                .astype(jnp.int32)
                .astype(jnp.float32)
                .astype(jnp.bfloat16)
            )  # [SR, 128]
            e_b = jax.lax.dot_general(
                wb, a_bf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [SR, P]
            # Mosaic has no direct f32->u32 cast; round-trip via i32.
            eu = eu | (
                e_b.astype(jnp.int32).astype(jnp.uint32)
                << jnp.uint32(8 * bidx)
            )
        c = jnp.zeros((1, p_width), jnp.uint32)
        for j in range(sr):
            c = c | pltpu.roll(eu[j : j + 1, :], j, axis=1)
        out_ref[s] = jnp.concatenate(
            [c[:, ro * LANES : (ro + 1) * LANES] for ro in range(out_rows)],
            axis=0,
        )


def _merge_kernel_skew(w_ref, b_ref, out_ref, *, cap: int,
                       ws: int = LANES):
    """Same contract as _merge_kernel, for LARGE caps (merged color MCU
    streams, cap ~= 48). The wide one-hot deposit of _merge_kernel costs
    O(128 * SR * 128) VREG ops just MATERIALIZING the [128, SR*128]
    selection mask; here the deposit is reformulated 2D. Lane l's window
    lands at flat word base_l = 128*q_l + r_l, so:

      1. SKEW: rotate each lane's word window vertically by r_l
         (7 log-rolls of a [128, 128] tile) -> W'[c, l] holds the word
         of lane l that lands at word-column c,
      2. ROW PLACEMENT: out[q, c] = sum_l Aq[l, q] * W'[c, l] as two
         16-bit-half f32 MXU contractions (Aq = one-hot of q_l, plus a
         carry variant for lanes whose window wraps past column 128).

    Word-sharing between adjacent streams is bit-disjoint, so the f32
    sums stay exact (<= 2^16 per half). Cost: ~2k VREG ops + 8 small
    matmuls per sublane, independent of SR.

    ws < 128 splits the row into nc = 128/ws independent chunk segments
    (per-image streams of a packed batch, same contract as
    _merge_kernel): only the prefix sum (chunk-local) and the flat base
    (+ chunk_id * cr * 128 words) change — the skew/deposit math is
    per-lane and needs no other adjustment."""
    nc = LANES // ws
    cr = -(-(ws * cap + cap + 2) // LANES)
    sr = nc * cr if nc > 1 else cap + 1
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    lane_c = lane_i % ws if nc > 1 else lane_i
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    ).astype(jnp.float32)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, sr), 1)
    for s in range(SUBLANES):
        b = b_ref[s : s + 1, :].astype(jnp.int32)  # [1, 128]
        inc = b
        for t in range(7):
            sh = 1 << t
            if sh >= ws:
                break
            inc = inc + jnp.where(
                lane_c >= sh, pltpu.roll(inc, sh, axis=1), 0
            )
        excl = jnp.where(lane_c >= 1, pltpu.roll(inc, 1, axis=1), 0)
        base = (excl >> 5) + (lane_i // ws) * (cr * LANES)
        r = jnp.bitwise_and(excl, 31).astype(jnp.uint32)
        t32 = jnp.clip(32 - (excl & 31), 0, 31).astype(jnp.uint32)
        rz = r == 0
        rows = [w_ref[j, s : s + 1, :] for j in range(cap)]
        zero_row = jnp.zeros((1, LANES), jnp.uint32)
        wpad = jnp.concatenate(rows + [zero_row], axis=0)  # [SR, 128]
        prev = jnp.concatenate([zero_row] + rows, axis=0)
        wp = jnp.where(rz, wpad, (wpad >> r) | (prev << t32))
        # skew: rotate lane l's column down by r_l = base_l % 128
        rl = base & 127
        wsk = jnp.concatenate(
            [wp, jnp.zeros((LANES - (cap + 1), LANES), jnp.uint32)], axis=0
        )
        for t in range(7):
            sh = 1 << t
            wsk = jnp.where(
                ((rl >> t) & 1) == 1, pltpu.roll(wsk, sh, axis=0), wsk
            )
        # row one-hots from q_l = base_l // 128 (plus wrap carry).
        # Matvec must be exact: HIGHEST forces true-f32 MXU passes
        # (default precision is bf16 and silently rounds base > 256).
        q_t = jax.lax.dot_general(
            eye, (base >> 7).astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # [128(l), 1]
        aq0 = (q_iota == q_t).astype(jnp.bfloat16)  # [l, SR]
        aq1 = (q_iota == q_t + 1).astype(jnp.bfloat16)
        m0 = (c_iota >= rl).astype(jnp.int32)  # [c, l]
        # 8-bit byte planes: values <= 255 and word-sharing is
        # bit-disjoint, so bf16 MXU accumulation stays integer-exact.
        acc = jnp.zeros((sr, LANES), jnp.uint32)
        for bidx in range(4):
            bv = (
                (wsk >> jnp.uint32(8 * bidx)) & jnp.uint32(0xFF)
            ).astype(jnp.int32)
            w0 = (bv * m0).astype(jnp.float32).astype(jnp.bfloat16)
            w1 = (bv * (1 - m0)).astype(jnp.float32).astype(jnp.bfloat16)
            o = jax.lax.dot_general(
                aq0, w0, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                aq1, w1, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [SR(q), 128(c)]
            acc = acc | (
                o.astype(jnp.int32).astype(jnp.uint32)
                << jnp.uint32(8 * bidx)
            )
        out_ref[s] = acc


# COMPILED backends use the skew-deposit merge for EVERY cap: measured
# faster at cap 8 too on silicon — 16-chain minima 32.47 -> 31.66 ms
# (ws=128, the single-image merge, ~0.05 ms/encode) and 27.7 -> 25.9 ms
# (ws=32, the batch slot merge), byte parity exact in both. The wide
# one-hot deposit's [128, SR*128] mask materialization loses to the 2D
# skew even at SR=9. INTERPRET mode (the CPU suite) keeps the wide
# kernel below this cap: the skew traces ~2 s slower per geometry,
# which doubled test_batch's wall time; the skew-at-small-cap path
# stays silicon-verified by tests/test_tpu_parity.py instead.
_SKEW_MIN_CAP = 24


@functools.partial(jax.jit, static_argnames=("ws", "interpret"))
def merge_sublanes_pallas(w_raw, b_raw, ws: int = LANES,
                          interpret: bool = False):
    """([G, cap, 8, 128] u32 pre-masked words, [G, 8, 128] i32 bits) ->
    segments [G, 8, R, 128] u32 (MSB-aligned). With ws=128 (default)
    each (group, sublane) row merges into ONE segment and R = cap + 1;
    with ws < 128 each row yields nc = 128/ws independent chunk
    segments, chunk c row-aligned at segment row c*cr (R = nc*cr).
    Segment bit counts are per-chunk sums of b_raw — computed by the
    caller in XLA."""
    g, cap = w_raw.shape[:2]
    nc = LANES // ws
    cr = -(-(ws * cap + cap + 2) // LANES)
    sr = nc * cr if nc > 1 else cap + 1
    skew = (not interpret) or cap >= _SKEW_MIN_CAP
    if nc > 1:
        kern = functools.partial(
            _merge_kernel_skew if skew else _merge_kernel,
            cap=cap, ws=ws,
        )
    else:
        kern = functools.partial(
            _merge_kernel_skew if skew else _merge_kernel,
            cap=cap,
        )
    return pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((None, cap, SUBLANES, LANES),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, SUBLANES, LANES),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, SUBLANES, sr, LANES), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (g, SUBLANES, sr, LANES), jnp.uint32
        ),
        interpret=interpret,
    )(w_raw.astype(jnp.uint32), b_raw.astype(jnp.int32))


def _flat_roll(x, m: int):
    """Shift flat word index (row-major [..., R, 128]) DOWN by m < 128
    words; zeros roll in from the (zero) tail rows via the circular
    wrap."""
    a1 = pltpu.roll(x, m, axis=2)
    a2 = pltpu.roll(a1, 1, axis=1)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), 2)
    return jnp.where(lane_i >= m, a1, a2)


def _stream_kernel(offs_ref, seg_ref, offv_ref, out_ref, *, sr: int,
                   ncg: int, out_rows: int):
    """Sequential grid over block-row groups (rg). seg_ref
    [ncg, 8, SR, 128] u32, offv_ref [8, ncg, 1, 1] i32 (per-segment
    absolute bit offsets), offs_ref: same offsets flat [S] i32 (scalar
    prefetch, for the dynamic-row RMW starts). out_ref [out_rows, 128]
    u32, VMEM-resident across the whole grid (constant index_map)."""
    rg = pl.program_id(0)

    @pl.when(rg == 0)
    def _init():
        out_ref[...] = jnp.zeros((out_rows, LANES), jnp.uint32)

    w = sr + 2
    zeros2 = jnp.zeros((ncg, 2, LANES), jnp.uint32)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), 2)
    for s in range(SUBLANES):
        x = seg_ref[:, s]  # [ncg, SR, 128]
        off_v = offv_ref[s]  # [ncg, 1, 1] i32
        frame = jnp.concatenate([x, zeros2], axis=1)  # [ncg, W, 128]
        r = jnp.bitwise_and(off_v, 31).astype(jnp.uint32)
        t32 = jnp.clip(32 - (off_v & 31), 0, 31).astype(jnp.uint32)
        a1 = pltpu.roll(frame, 1, axis=2)
        a2 = pltpu.roll(a1, 1, axis=1)
        prevw = jnp.where(lane_i == 0, a2, a1)
        frame = jnp.where(
            off_v & 31 == 0, frame, (frame >> r) | (prevw << t32)
        )
        k = (off_v >> 5) & 127
        for t in range(7):
            frame = jnp.where(
                (k >> t) & 1 == 1, _flat_roll(frame, 1 << t), frame
            )
        for c in range(ncg):
            o = offs_ref[(rg * SUBLANES + s) * ncg + c]
            row = o >> 12
            cur = out_ref[pl.ds(row, w), :]
            out_ref[pl.ds(row, w), :] = cur | frame[c]


@functools.partial(
    jax.jit, static_argnames=("ncg", "out_rows", "interpret")
)
def stream_concat_pallas(segs, offs, ncg: int, out_rows: int,
                         interpret: bool = False):
    """segs [G, 8, SR, 128] u32 (G = nrg * ncg grid-natural), offs [S]
    i32 absolute bit offsets in scan order (rg, s, cg) — masked-valid
    bits only. Returns the concatenated stream [out_rows * 128] u32."""
    g, _, sr = segs.shape[:3]
    nrg = g // ncg
    segs5 = segs.reshape(nrg, ncg, SUBLANES, sr, LANES)
    offv = offs.reshape(nrg, SUBLANES, ncg, 1, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrg,),
        in_specs=[
            pl.BlockSpec((None, ncg, SUBLANES, sr, LANES),
                         lambda i, offs_ref: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, SUBLANES, ncg, 1, 1),
                         lambda i, offs_ref: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (out_rows, LANES), lambda i, offs_ref: (0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(_stream_kernel, sr=sr, ncg=ncg,
                          out_rows=out_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, LANES), jnp.uint32),
        interpret=interpret,
    )(offs.astype(jnp.int32), segs5, offv.astype(jnp.int32))
    return out.reshape(-1)


def _stream_rows_kernel(offs_ref, seg_ref, out_ref, *, sr: int,
                        rows_per_seg: int, out_rows: int):
    """One grid step = ONE output segment (an image of a batch, or a
    restart segment): funnel+roll each of its `rows_per_seg` merged
    row-segments to its intra-segment bit offset and OR into this
    step's own [out_rows, 128] output block. Unlike _stream_kernel the
    output block is per-step (index_map = segment id), so segment count
    is unbounded by VMEM — only one segment's buffer is resident."""
    i = pl.program_id(0)
    out_ref[...] = jnp.zeros((out_rows, LANES), jnp.uint32)
    w = sr + 2
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    zeros2 = jnp.zeros((2, LANES), jnp.uint32)
    for r in range(rows_per_seg):
        o = offs_ref[i * rows_per_seg + r]
        x = seg_ref[r]  # [SR, 128]
        frame = jnp.concatenate([x, zeros2], axis=0)  # [W, 128]
        rb = (o & 31).astype(jnp.uint32)
        t32 = jnp.clip(32 - (o & 31), 0, 31).astype(jnp.uint32)
        a1 = pltpu.roll(frame, 1, axis=1)
        a2 = pltpu.roll(a1, 1, axis=0)
        prevw = jnp.where(lane_i == 0, a2, a1)
        frame = jnp.where(o & 31 == 0, frame, (frame >> rb) | (prevw << t32))
        k = (o >> 5) & 127
        for t in range(7):
            sh = 1 << t
            rolled = pltpu.roll(frame, sh, axis=1)
            rolled = jnp.where(
                lane_i >= sh, rolled, pltpu.roll(rolled, 1, axis=0)
            )
            frame = jnp.where((k >> t) & 1 == 1, rolled, frame)
        row = o >> 12
        cur = out_ref[pl.ds(row, w), :]
        out_ref[pl.ds(row, w), :] = cur | frame


@functools.partial(
    jax.jit,
    static_argnames=("rows_per_seg", "out_rows", "interpret"),
)
def _stream_concat_rows(segs, offs, rows_per_seg: int, out_rows: int,
                        interpret: bool = False):
    """segs [S*rows_per_seg, SR, 128] u32, offs [S*rows_per_seg] i32
    intra-segment bit offsets -> [S, out_rows, 128] u32 streams."""
    rt, sr = segs.shape[:2]
    s = rt // rows_per_seg
    segs4 = segs.reshape(s, rows_per_seg, sr, LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((None, rows_per_seg, sr, LANES),
                         lambda i, offs_ref: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, out_rows, LANES), lambda i, offs_ref: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_stream_rows_kernel, sr=sr,
                          rows_per_seg=rows_per_seg, out_rows=out_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, out_rows, LANES), jnp.uint32),
        interpret=interpret,
    )(offs.astype(jnp.int32), segs4)


def segments_pallas_ok(seg_slots: int, cap: int,
                       budget: int = 14 << 20) -> bool:
    """Whether the Pallas per-segment concat applies: row-aligned
    segments, a bounded kernel unroll, and one segment's output buffer
    (plus the double-buffered row-merge input) within VMEM."""
    if seg_slots % (LANES) != 0:
        return False
    rows = seg_slots // LANES
    if rows > 256:
        return False
    sr = cap + 1
    out_rows = -(-(seg_slots * cap) // LANES) + sr + 3
    out_bytes = out_rows * LANES * 4
    step_bytes = rows * sr * LANES * 4
    return out_bytes + 2 * step_bytes <= budget


def concat_segments_pallas(w_t, bits, seg_slots: int,
                           out_words_per_seg: int,
                           interpret: bool = False):
    """Drop-in fast path for treepack.concat_segments_tree: scan-order
    per-block words [C, S*seg_slots] u32 + bits [S*seg_slots] i32 (pad
    blocks pre-masked to zero) -> (streams [S, out_words_per_seg] u32,
    totals [S] i32, before tail padding).

    Two Pallas passes (128-lane row merge + per-segment streaming OR)
    replace the whole XLA shift-or segment tree — measured 183 ms ->
    ~3 ms for a 256-image batch of 512x512 (tools/batch_micro.py)."""
    from ..ops.scan import cumsum_1d

    c, n = w_t.shape
    rows_per_seg = seg_slots // LANES
    s = n // seg_slots
    sr = c + 1
    g = -(-n // (SUBLANES * LANES))
    npad = g * SUBLANES * LANES
    if npad != n:
        w_t = jnp.pad(w_t, ((0, 0), (0, npad - n)))
        bits = jnp.pad(bits, (0, npad - n))
    # scan order -> grid-natural [G, C, 8, 128] (ncg=1 equivalence)
    w_raw = w_t.reshape(c, g, SUBLANES, LANES).transpose(1, 0, 2, 3)
    b_raw = bits.reshape(g, SUBLANES, LANES)
    segs = merge_sublanes_pallas(w_raw, b_raw, interpret=interpret)
    segs = segs.reshape(g * SUBLANES, sr, LANES)[: s * rows_per_seg]
    rowbits = (
        jnp.sum(b_raw, axis=-1)
        .reshape(-1)[: s * rows_per_seg]
        .reshape(s, rows_per_seg)
    )
    inc = jax.vmap(cumsum_1d)(rowbits)
    offs = (inc - rowbits).reshape(-1)
    totals = inc[:, -1].astype(jnp.int32)
    out_rows = -(-(seg_slots * c) // LANES) + sr + 3
    streams = _stream_concat_rows(
        segs, offs, rows_per_seg=rows_per_seg, out_rows=out_rows,
        interpret=interpret,
    )
    streams = streams.reshape(s, out_rows * LANES)[:, :out_words_per_seg]
    return streams, totals


def _stitch_kernel(offs_ref, seg_ref, offv_ref, out_ref, *, sr: int,
                   rg_per_chunk: int, out_rows: int):
    """Sequential grid over merged-row groups; the out block is the
    current CHUNK's stream, VMEM-resident across its rg_per_chunk steps
    (index_map rg // rg_per_chunk — Pallas writes a chunk back to HBM
    when the block index advances). Each of the 8 merged row-segments
    ORs in at its chunk-relative ABSOLUTE bit offset (which already
    includes the byte-aligned restart-segment bases): bit-residue funnel
    shift, 7 log lane rolls with row wrap, one dynamic-row RMW — the
    same per-row work as _stream_kernel, but the offsets place whole
    RESTART SEGMENTS contiguously, so multi-segment encodes finish as
    ONE device buffer (the single-buffer prefix fetch the unsharded
    path enjoys) instead of S padded per-segment buffers."""
    rg = pl.program_id(0)

    @pl.when(rg % rg_per_chunk == 0)
    def _init():
        out_ref[...] = jnp.zeros((out_rows, LANES), jnp.uint32)

    w = sr + 2
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    zeros2 = jnp.zeros((2, LANES), jnp.uint32)
    for s in range(SUBLANES):
        o_v = offv_ref[s]  # [1, 1] i32
        x = seg_ref[s]  # [SR, 128]
        frame = jnp.concatenate([x, zeros2], axis=0)  # [W, 128]
        rb = jnp.bitwise_and(o_v, 31).astype(jnp.uint32)
        t32 = jnp.clip(32 - (o_v & 31), 0, 31).astype(jnp.uint32)
        a1 = pltpu.roll(frame, 1, axis=1)
        a2 = pltpu.roll(a1, 1, axis=0)
        prevw = jnp.where(lane_i == 0, a2, a1)
        frame = jnp.where(
            o_v & 31 == 0, frame, (frame >> rb) | (prevw << t32)
        )
        k = (o_v >> 5) & 127
        for t in range(7):
            sh = 1 << t
            rolled = pltpu.roll(frame, sh, axis=1)
            rolled = jnp.where(
                lane_i >= sh, rolled, pltpu.roll(rolled, 1, axis=0)
            )
            frame = jnp.where((k >> t) & 1 == 1, rolled, frame)
        row = offs_ref[rg * SUBLANES + s] >> 12
        cur = out_ref[pl.ds(row, w), :]
        out_ref[pl.ds(row, w), :] = cur | frame


@functools.partial(
    jax.jit,
    static_argnames=("rg_per_chunk", "n_chunks", "out_rows", "interpret"),
)
def _stitch_rows(segs, offs, rg_per_chunk: int, n_chunks: int,
                 out_rows: int, interpret: bool = False):
    """segs [R, SR, 128] u32 merged row-segments (R = n_chunks *
    rg_per_chunk * 8), offs [R] i32 chunk-relative absolute bit offsets
    -> [n_chunks, out_rows, 128] u32 chunk streams."""
    r, sr = segs.shape[:2]
    nrg = r // SUBLANES
    segs4 = segs.reshape(nrg, SUBLANES, sr, LANES)
    offv = offs.reshape(nrg, SUBLANES, 1, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrg,),
        in_specs=[
            pl.BlockSpec((None, SUBLANES, sr, LANES),
                         lambda i, offs_ref: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, SUBLANES, 1, 1),
                         lambda i, offs_ref: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, out_rows, LANES),
            lambda i, offs_ref: (i // rg_per_chunk, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_stitch_kernel, sr=sr,
                          rg_per_chunk=rg_per_chunk, out_rows=out_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_chunks, out_rows, LANES), jnp.uint32
        ),
        interpret=interpret,
    )(offs.astype(jnp.int32), segs4, offv.astype(jnp.int32))


def stitch_plan(s: int, seg128: int, cap: int,
                budget: int = 14 << 20) -> int:
    """Segments-per-chunk for the chunked stitch, or 0 if infeasible.

    A chunk is one VMEM-resident output block of the stitch kernel; all
    chunks hold the same number of segments (the last may carry empty
    pad segments). One chunk serves all but >~25 MPix gray scans; the
    multi-chunk split exists so 8K+ scans keep the single-pass stitch
    (chunk boundaries are segment boundaries, hence byte-aligned, so the
    host concatenates chunk bytes with plain memcpy)."""
    sr = cap + 1
    step_bytes = SUBLANES * sr * LANES * 4
    avail = budget - 2 * step_bytes

    def chunk_bytes(spc: int) -> int:
        out_rows = -(-(spc * seg128 * cap) // LANES) + sr + 4
        return out_rows * LANES * 4

    if chunk_bytes(1) > avail:
        return 0
    n_chunks = 1
    while -(-s // n_chunks) > 1 and chunk_bytes(-(-s // n_chunks)) > avail:
        n_chunks += 1
    spc = -(-s // n_chunks)
    return spc if chunk_bytes(spc) <= avail else 0


def stitch_segments_pallas(w_t, bits, seg_slots: int, segs_per_chunk: int,
                           pad_ones: bool = True,
                           interpret: bool = False):
    """Scan-order per-block packed streams -> contiguous device stream(s)
    with every restart segment byte-aligned and its final-byte padding
    applied — the device-side replacement for S padded per-segment
    buffers + host restitching (VERDICT r4 #1/#2). The reference analog:
    the DSP returns one finished entropy stream to its host
    (dsp_port/jpeg_client/jpeg_handler.c:168-209).

    w_t [C, S*seg_slots] u32 (seg_slots % 128 == 0; pad blocks must
    carry zero bits), bits [S*seg_slots] i32. segs_per_chunk from
    stitch_plan. Returns (chunks [n_chunks, chunk_words] u32,
    seg_totals [S] i32 bits incl. per-segment byte padding,
    chunk_totals [n_chunks] i32). Segment s of chunk k starts at byte
    sum(seg_totals[k*spc : s]) // 8 of chunk k; RST markers and 0xFF
    stuffing are the host finisher's (native.scan_from_words)."""
    from ..ops.scan import cumsum_1d

    c, n = w_t.shape
    s = n // seg_slots
    assert seg_slots % LANES == 0
    rows_per_seg = seg_slots // LANES
    sr = c + 1
    spc = segs_per_chunk
    n_chunks = -(-s // spc)
    s_pad = n_chunks * spc
    if s_pad != s:
        w_t = jnp.pad(w_t, ((0, 0), (0, (s_pad - s) * seg_slots)))
        bits = jnp.pad(bits, (0, (s_pad - s) * seg_slots))
    n2 = s_pad * seg_slots
    g = -(-n2 // (SUBLANES * LANES))
    npad = g * SUBLANES * LANES
    if npad != n2:
        w_t = jnp.pad(w_t, ((0, 0), (0, npad - n2)))
        bits = jnp.pad(bits, (0, npad - n2))
    w_raw = w_t.reshape(c, g, SUBLANES, LANES).transpose(1, 0, 2, 3)
    b_raw = bits.reshape(g, SUBLANES, LANES)
    segs = merge_sublanes_pallas(w_raw, b_raw, interpret=interpret)
    r_real = s_pad * rows_per_seg
    segs = segs.reshape(g * SUBLANES, sr, LANES)[:r_real]
    rowbits = (
        jnp.sum(b_raw, axis=-1).reshape(-1)[:r_real]
        .reshape(s_pad, rows_per_seg)
    )
    seg_bits = jnp.sum(rowbits, axis=-1)
    padlen = (-seg_bits) % 8
    seg_tot = seg_bits + padlen
    # chunk-relative byte-aligned segment base offsets
    ends = jax.vmap(cumsum_1d)(seg_tot.reshape(n_chunks, spc))
    base = (ends - seg_tot.reshape(n_chunks, spc)).reshape(s_pad)
    chunk_totals = ends[:, -1].astype(jnp.int32)
    inrow = jax.vmap(cumsum_1d)(rowbits)
    offs = (inrow - rowbits + base[:, None]).reshape(-1)
    # pad each chunk's rows to a whole number of 8-row grid groups
    cpr = spc * rows_per_seg
    cpr8 = -(-cpr // SUBLANES) * SUBLANES
    if cpr8 != cpr:
        segs = jnp.pad(
            segs.reshape(n_chunks, cpr, sr, LANES),
            ((0, 0), (0, cpr8 - cpr), (0, 0), (0, 0)),
        ).reshape(n_chunks * cpr8, sr, LANES)
        offs = jnp.pad(
            offs.reshape(n_chunks, cpr), ((0, 0), (0, cpr8 - cpr))
        ).reshape(-1)
    out_rows = -(-(spc * seg_slots * c) // LANES) + sr + 4
    chunks = _stitch_rows(
        segs, offs, rg_per_chunk=cpr8 // SUBLANES, n_chunks=n_chunks,
        out_rows=out_rows, interpret=interpret,
    ).reshape(n_chunks, out_rows * LANES)
    if pad_ones:
        # Per-segment 1s padding to the byte boundary: each pad sits in
        # the single word holding bit (base + seg_bits) of its chunk —
        # bits the stitch left zero, so scatter-add == OR (and pads of
        # different segments can never share a word: a segment is >= 128
        # blocks >= 96 bytes).
        t = base + seg_bits
        widx = t >> 5
        off32 = (t & 31).astype(jnp.uint32)
        mask = jnp.where(
            padlen > 0,
            ((jnp.uint32(1) << padlen.astype(jnp.uint32)) - 1)
            << jnp.clip(
                32 - off32 - padlen.astype(jnp.uint32), 0, 31
            ).astype(jnp.uint32),
            jnp.uint32(0),
        )
        cidx = jnp.arange(s_pad) // spc
        flat = chunks.reshape(-1)
        flat = flat.at[cidx * (out_rows * LANES) + widx].add(mask)
        chunks = flat.reshape(n_chunks, out_rows * LANES)
    return chunks, seg_tot[:s].astype(jnp.int32), chunk_totals


def _stream_chunked_kernel(offs_ref, seg_ref, offv_ref, out_ref, *,
                           sr: int, ncg: int, rg_per_chunk: int,
                           out_rows: int):
    """Chunked twin of _stream_kernel for single streams past the VMEM
    budget: the output block is one CHUNK (index_map rg // rg_per_chunk
    — Pallas writes a chunk back to HBM when the block index advances),
    and every row-segment ORs in at its offset row RELATIVE to the
    chunk's base row (the row floor of the chunk's first segment's
    absolute offset, read from the same prefetched scalar array). The
    bit residue and word-in-row position are invariant under the
    row re-basing, so the funnel/roll math is identical. Chunks overlap
    only in their boundary word; caller OR-combines them (bit-disjoint
    by construction)."""
    rg = pl.program_id(0)

    @pl.when(rg % rg_per_chunk == 0)
    def _init():
        out_ref[...] = jnp.zeros((out_rows, LANES), jnp.uint32)

    base_row = offs_ref[(rg - rg % rg_per_chunk) * SUBLANES * ncg] >> 12
    w = sr + 2
    zeros2 = jnp.zeros((ncg, 2, LANES), jnp.uint32)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), 2)
    for s in range(SUBLANES):
        x = seg_ref[:, s]  # [ncg, SR, 128]
        off_v = offv_ref[s]  # [ncg, 1, 1] i32
        frame = jnp.concatenate([x, zeros2], axis=1)  # [ncg, W, 128]
        r = jnp.bitwise_and(off_v, 31).astype(jnp.uint32)
        t32 = jnp.clip(32 - (off_v & 31), 0, 31).astype(jnp.uint32)
        a1 = pltpu.roll(frame, 1, axis=2)
        a2 = pltpu.roll(a1, 1, axis=1)
        prevw = jnp.where(lane_i == 0, a2, a1)
        frame = jnp.where(
            off_v & 31 == 0, frame, (frame >> r) | (prevw << t32)
        )
        k = (off_v >> 5) & 127
        for t in range(7):
            frame = jnp.where(
                (k >> t) & 1 == 1, _flat_roll(frame, 1 << t), frame
            )
        for c in range(ncg):
            o = offs_ref[(rg * SUBLANES + s) * ncg + c]
            row = (o >> 12) - base_row
            cur = out_ref[pl.ds(row, w), :]
            out_ref[pl.ds(row, w), :] = cur | frame[c]


@functools.partial(
    jax.jit,
    static_argnames=("ncg", "rg_per_chunk", "out_rows", "interpret"),
)
def stream_concat_chunked(segs, offs, ncg: int, rg_per_chunk: int,
                          out_rows: int, interpret: bool = False):
    """segs [G, 8, SR, 128] u32 with G = nrg * ncg and nrg a multiple of
    rg_per_chunk (caller pads), offs [S] i32 absolute scan-order bit
    offsets (pad rows carry the stream total). Returns chunk streams
    [n_chunks, out_rows * 128] u32, chunk k based at word
    (offs[k * rg_per_chunk * 8 * ncg] >> 12) * 128."""
    g, _, sr = segs.shape[:3]
    nrg = g // ncg
    n_chunks = nrg // rg_per_chunk
    segs5 = segs.reshape(nrg, ncg, SUBLANES, sr, LANES)
    offv = offs.reshape(nrg, SUBLANES, ncg, 1, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrg,),
        in_specs=[
            pl.BlockSpec((None, ncg, SUBLANES, sr, LANES),
                         lambda i, offs_ref: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, SUBLANES, ncg, 1, 1),
                         lambda i, offs_ref: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, out_rows, LANES),
            lambda i, offs_ref: (i // rg_per_chunk, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(_stream_chunked_kernel, sr=sr, ncg=ncg,
                          rg_per_chunk=rg_per_chunk, out_rows=out_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_chunks, out_rows, LANES), jnp.uint32
        ),
        interpret=interpret,
    )(offs.astype(jnp.int32), segs5, offv.astype(jnp.int32))
    return out.reshape(n_chunks, out_rows * LANES)


def chunk_plan(cap: int, ncg: int, budget: int = 14 << 20) -> int:
    """rg_per_chunk for the chunked single-stream concat — the largest
    number of grid steps whose WORST-CASE output (every block at full
    cap words) still fits one VMEM-resident chunk block — or 0 when even
    one step does not fit. Worst-case sizing is required because the
    grid-position -> chunk map must be static; actual streams are far
    smaller, so chunk buffers are sparse in HBM (zeros cost only
    writeback bandwidth, ~0.1 ms for the 8K split)."""
    sr = cap + 1
    step_bytes = ncg * SUBLANES * sr * LANES * 4
    avail = budget - 2 * step_bytes
    rows_per_rg = SUBLANES * ncg * cap
    rpc = (avail // (LANES * 4) - (sr + 4)) // rows_per_rg
    return max(int(rpc), 0)


def concat_raw_chunked(w_raw, b_raw, nbh: int, nbw: int, ncg: int,
                       rg_per_chunk: int, interpret: bool = False):
    """Single contiguous stream for scans past the fits_vmem budget: the
    same two Pallas passes as concat_raw_pallas, but the streaming OR
    writes VMEM-resident CHUNK blocks (stream_concat_chunked) that an
    XLA epilogue OR-combines at their base words into one buffer — the
    concat stays all-Pallas instead of falling off to the XLA merge tree
    (measured ~3x the per-MPix cost at 33 MPix). Same contract as
    concat_raw_pallas: (words [N] u32, total_bits i32)."""
    from ..ops.scan import cumsum_1d

    g, cap = w_raw.shape[:2]
    sr = cap + 1
    m = valid_mask(nbh, nbw, ncg, g)
    b_m = jnp.where(m, b_raw, 0)
    w_m = jnp.where(m[:, None], w_raw, 0)
    segs = merge_sublanes_pallas(w_m, b_m, interpret=interpret)
    segbits = jnp.sum(b_m, axis=-1)  # [G, 8]
    nrg = g // ncg
    sb = segbits.reshape(nrg, ncg, SUBLANES).transpose(0, 2, 1).reshape(-1)
    inc = cumsum_1d(sb)
    offs = inc - sb  # exclusive, scan order (rg, s, cg)
    total = inc[-1]
    nrg2 = -(-nrg // rg_per_chunk) * rg_per_chunk
    if nrg2 != nrg:
        segs = jnp.pad(
            segs, ((0, (nrg2 - nrg) * ncg), (0, 0), (0, 0), (0, 0))
        )
        offs = jnp.concatenate([
            offs,
            jnp.broadcast_to(total, ((nrg2 - nrg) * SUBLANES * ncg,)),
        ])
    n_chunks = nrg2 // rg_per_chunk
    out_rows_chunk = rg_per_chunk * SUBLANES * ncg * cap + sr + 4
    chunks = stream_concat_chunked(
        segs, offs, ncg=ncg, rg_per_chunk=rg_per_chunk,
        out_rows=out_rows_chunk, interpret=interpret,
    )
    starts = offs[
        jnp.arange(n_chunks, dtype=jnp.int32)
        * (rg_per_chunk * SUBLANES * ncg)
    ]
    base_words = (starts >> 12) * LANES
    out_rows_full = -(-(nbh * nbw * cap) // LANES) + sr + 3
    cw = out_rows_chunk * LANES
    buf = jnp.zeros((out_rows_full * LANES + cw,), jnp.uint32)
    for k in range(n_chunks):
        cur = jax.lax.dynamic_slice(buf, (base_words[k],), (cw,))
        buf = jax.lax.dynamic_update_slice(
            buf, cur | chunks[k], (base_words[k],)
        )
    return buf[: out_rows_full * LANES], total.astype(jnp.int32)


def concat_mode(nbh: int, nbw: int, cap: int, ncg: int) -> str:
    """Which across-block concat serves this geometry — the ONE place
    the decision lives (the raw bodies branch on it, and bench.py
    reports it so a budget regression is driver-visible):
    "pallas-resident" (stream_concat_pallas, one VMEM output block),
    "pallas-chunked" (concat_raw_chunked, VMEM chunk blocks + device
    OR-combine), or "treepack-fallback" (XLA merge tree)."""
    if fits_vmem(nbh, nbw, cap, ncg):
        return "pallas-resident"
    if chunk_plan(cap, ncg) >= 1:
        return "pallas-chunked"
    return "treepack-fallback"


def fits_vmem(nbh: int, nbw: int, cap: int, ncg: int,
              budget: int = 14 << 20) -> bool:
    """Whether the VMEM-resident output buffer of stream_concat_pallas
    (worst-case cap words per block) plus the double-buffered per-step
    segment input fits the ~16 MB/core VMEM. Callers fall back to the
    XLA merge tree above this size (or shard via the segments path)."""
    sr = cap + 1
    out_rows = -(-(nbh * nbw * cap) // LANES) + sr + 3
    out_bytes = out_rows * LANES * 4
    step_bytes = ncg * SUBLANES * sr * LANES * 4
    return out_bytes + 2 * step_bytes <= budget


def valid_mask(nbh: int, nbw: int, ncg: int, g: int):
    """[G, 8, 128] bool: lane (g, s, l) is a real (non-pad) block."""
    nrg = g // ncg
    rg = jnp.arange(nrg)
    s = jnp.arange(SUBLANES)
    cg = jnp.arange(ncg)
    l = jnp.arange(LANES)
    row_ok = (rg[:, None] * SUBLANES + s[None, :]) < nbh  # [nrg, 8]
    col_ok = (cg[:, None] * LANES + l[None, :]) < nbw  # [ncg, 128]
    m = row_ok[:, None, :, None] & col_ok[None, :, None, :]
    return m.reshape(g, SUBLANES, LANES)


def concat_raw_pallas(w_raw, b_raw, nbh: int, nbw: int, ncg: int,
                      interpret: bool = False):
    """Concatenate per-block packed streams in grid-natural tiling into
    one scan-order stream. w_raw [G, cap, 8, 128] u32, b_raw [G, 8, 128]
    i32 (both may contain pad-lane garbage — masked here). Returns
    (words [N] u32, total_bits i32); apply tail padding downstream."""
    from ..ops.scan import cumsum_1d

    g, cap = w_raw.shape[:2]
    sr = cap + 1
    m = valid_mask(nbh, nbw, ncg, g)
    b_m = jnp.where(m, b_raw, 0)
    w_m = jnp.where(m[:, None], w_raw, 0)
    segs = merge_sublanes_pallas(w_m, b_m, interpret=interpret)
    segbits = jnp.sum(b_m, axis=-1)  # [G, 8]
    nrg = g // ncg
    sb = segbits.reshape(nrg, ncg, SUBLANES).transpose(0, 2, 1).reshape(-1)
    inc = cumsum_1d(sb)
    offs = inc - sb  # exclusive, scan order (rg, s, cg)
    total = inc[-1]
    out_rows = -(-(nbh * nbw * cap) // LANES) + sr + 3
    words = stream_concat_pallas(
        segs, offs, ncg=ncg, out_rows=out_rows, interpret=interpret
    )
    return words, total.astype(jnp.int32)

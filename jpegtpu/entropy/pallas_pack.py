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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
BLOCKS_PER_STEP = SUBLANES * LANES  # 1024

# Huffman table lookup strategy inside the fused pack kernel:
# "cascade" (default) = per-run-row serial select chains; "tree" =
# balanced log-depth mux over run*11+size; "split" = bit-packed
# sub-tables + per-lane variable shifts (canonical code = base[len] +
# rank, so only 4-bit lens / 8-bit ranks need per-entry storage — ~90
# ops vs the cascade's ~192). Four shapes measured on silicon (12.19
# MPix Q50, isolated pack-kernel runs): dynamic gather LOST (commit
# 6825f7c), tree LOST (~+25%), split = parity with cascade WITHIN
# NOISE despite half the op count — followed by a direct 16-chain
# wall-clock A/B (42.35 vs 42.31 ms) showing the kernel is NOT
# lookup-ALU-bound at all (the serial accumulator dependency chain
# and per-step fixed costs dominate). The cascade stays default as
# the simplest of the tied shapes; switches kept for re-measurement
# on future toolchains.
_HUFF_LOOKUP = os.environ.get("JPEGTPU_HUFF_LOOKUP", "cascade")

# Experimental two-half ILP pack loop (JPEGTPU_PACK_SPLIT=1): the AC walk
# splits into INDEPENDENT dependency chains over [1,16) and [16,kmax) —
# half B seeded by a trailing-zero prologue computed straight from zz —
# each packing its own frame, joined by one in-register funnel merge.
# Targets the serial accumulator chain the attempt-#4 diagnosis (see
# _HUFF_LOOKUP) identified as the kernel's bound. Byte-parity-tested;
# default OFF pending a measured win (BENCH_NOTES round 5).
_PACK_SPLIT = os.environ.get("JPEGTPU_PACK_SPLIT", "0") == "1"


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


def _select_cascade(idx, consts):
    """Vectorized lookup of a small table: out[lane] = consts[idx[lane]]
    via a chain of compare-selects (no gather exists on the VPU).
    Entries may be python ints (compile-time tables) or loop-invariant
    scalars read from SMEM (runtime tables) — same vector op count."""
    out = jnp.zeros_like(idx, dtype=jnp.int32) + consts[0]
    for k in range(1, len(consts)):
        out = jnp.where(idx == k, consts[k], out)
    return out


@functools.lru_cache(maxsize=8)
def _split_tables(packed_flat):
    """Decompose a flat canonical-Huffman packed table (entries
    (code << 6) | len, code = base[len] + rank-within-length) into three
    bit-packed word lists for the variable-shift lookup (_lookup_split):
    len4 (4-bit entries, 8/word), rank8 (8-bit entries, 4/word),
    base16 (16-bit base code per length 1..16, 2/word). Python ints in,
    python ints out — evaluated at trace time."""
    n = len(packed_flat)
    lens = [int(p) & 63 for p in packed_flat]
    codes = [int(p) >> 6 for p in packed_flat]
    base = [0] * 17
    for ln in range(1, 17):
        cs = [c for c, l in zip(codes, lens) if l == ln]
        base[ln] = min(cs) if cs else 0
    ranks = [
        (c - base[l]) if l > 0 else 0 for c, l in zip(codes, lens)
    ]
    assert all(0 <= r < 256 for r in ranks)
    # 4-bit nibble holds len - 1 (1..15 for the len range 2..16 of
    # baseline static tables), 0 = unused entry. Lengths of 1 cannot be
    # encoded — callers gate on that (code_for uses this path only for
    # the compile-time Annex-K tables, whose min AC code length is 2).
    assert all(l == 0 or 2 <= l <= 16 for l in lens)
    len4 = [0] * (-(-n // 8))
    for i, l in enumerate(lens):
        len4[i >> 3] |= (l - 1 if l else 0) << ((i & 7) * 4)
    rank8 = [0] * (-(-n // 4))
    for i, r in enumerate(ranks):
        rank8[i >> 2] |= r << ((i & 3) * 8)
    base16 = [0] * 8
    for ln in range(1, 17):
        base16[(ln - 1) >> 1] |= base[ln] << (((ln - 1) & 1) * 16)

    def i32(w):  # two's-complement wrap: packed words may set bit 31
        w &= 0xFFFFFFFF
        return w - (1 << 32) if w >= (1 << 31) else w

    return (
        tuple(i32(w) for w in len4),
        tuple(i32(w) for w in rank8),
        tuple(i32(w) for w in base16),
    )


def _lookup_split(idx, len4, rank8, base16):
    """packed[idx] via bit-packed sub-tables + per-lane variable shifts:
    three short word cascades (22 + 44 + 8 selects for the 176-entry AC
    table) replace the 176-select direct cascade — the lookup exploits
    that canonical codes decompose as base[len] + rank, so only 4-bit
    lens and 8-bit ranks need per-entry storage."""
    lw = _select_cascade(idx >> 3, list(len4))
    lm1 = (lw >> ((idx & 7) * 4)) & 15  # len - 1; 0 = unused entry
    ln = jnp.where(lm1 > 0, lm1 + 1, 0)
    rw = _select_cascade(idx >> 2, list(rank8))
    rank = (rw >> ((idx & 3) * 8)) & 255
    bw = _select_cascade(jnp.maximum(ln - 1, 0) >> 1, list(base16))
    base = (bw >> (((ln - 1) & 1) * 16)) & 0xFFFF
    return jnp.where(ln > 0, ((base + rank) << 6) | ln, 0)


def _select_tree(idx, consts):
    """out[lane] = consts[idx[lane]] as a balanced binary mux over the
    bits of idx: pair adjacent entries under bit 0, the survivors under
    bit 1, and so on. Same ~n select count as _select_cascade, but the
    dependency DEPTH is log2(n) instead of n — the cascade is a serial
    select chain the VPU cannot pipeline, the tree is n/2 independent
    selects per level. Requires 0 <= idx < len(consts); entries may be
    python ints or loop-invariant SMEM scalars. An odd tail at any level
    is always an even-index (bit-aligned) chunk, so carrying it up one
    level preserves the radix indexing."""
    vals = list(consts)
    b = 0
    while len(vals) > 1:
        bit = ((idx >> b) & 1) == 1
        vals = [
            jnp.where(bit, vals[i + 1], vals[i])
            for i in range(0, len(vals) - 1, 2)
        ] + ([vals[-1]] if len(vals) % 2 else [])
        b += 1
    out = vals[0]
    if not (hasattr(out, "shape") and out.shape == idx.shape):
        out = jnp.zeros_like(idx, dtype=jnp.int32) + out
    return out.astype(jnp.int32)


def pack_runtime_tables(dc_codes, dc_lens, ac_codes, ac_lens) -> "np.ndarray":
    """Flatten one table class's LUTs into the [192] i32 layout the
    runtime-table kernel reads: ac packed (run, size) [176], dc packed
    [12], zrl code/len, eob code/len — each entry (code << 6) | len.
    Lets 2-pass OPTIMAL tables drive the fused kernel without a
    recompile (tables are data, not compile-time constants)."""
    import numpy as np

    out = np.zeros(192, np.int32)
    for r in range(16):
        for sz in range(11):
            sym = (r << 4) | sz
            out[r * 11 + sz] = (int(ac_codes[sym]) << 6) | int(ac_lens[sym])
    for sz in range(12):
        out[176 + sz] = (int(dc_codes[sz]) << 6) | int(dc_lens[sz])
    out[188] = int(ac_codes[0xF0])
    out[189] = int(ac_lens[0xF0])
    out[190] = int(ac_codes[0x00])
    out[191] = int(ac_lens[0x00])
    return out


def _encode_kernel_rt(tab_ref, zz_ref, dcd_ref, out_ref, bits_ref, *,
                      cap: int):
    """Runtime-table edition of _encode_kernel: the 192 packed table
    entries load ONCE per grid step from SMEM into loop-invariant
    scalars, so the select cascades cost exactly what the
    compile-time-constant version does."""
    ac = [[tab_ref[r * 11 + sz] for sz in range(11)] for r in range(16)]
    dc_pack = [tab_ref[176 + sz] for sz in range(12)]
    tables_pack = (
        dc_pack,
        ac,
        tab_ref[188],
        tab_ref[189],
        tab_ref[190],
        tab_ref[191],
    )
    _encode_kernel(
        zz_ref, dcd_ref, out_ref, bits_ref, cap=cap,
        tables_pack=tables_pack,
    )


def _encode_kernel(zz_ref, dcd_ref, out_ref, bits_ref, *, cap: int,
                   tables_pack):
    """Fused symbolize + pack: zigzag levels -> per-block packed streams.

    zz_ref [64, 8, 128] i32 (coefficient-major, blocks on lanes),
    dcd_ref [1, 8, 128] i32 (precomputed DC differences — the global chain
    crosses grid steps), out_ref [cap, 8, 128] u32, bits_ref [1, 8, 128].

    The reference's per-coefficient walk (rle.c:84-123) vectorizes over
    1024 blocks: the zero-run length is a loop carry, magnitude category
    is a compare ladder (clz is unavailable in-kernel), and the AC
    Huffman table is a static select cascade over (run, size). Emission
    order per block: DC, then per nonzero AC lane its ZRLs + symbol, then
    EOB — identical bits to symbolize_elements64 + pack_blocks_pallas.
    """
    dc_pack, ac_pack, zrl_code, zrl_len, eob_code, eob_len = tables_pack
    shp = (SUBLANES, LANES)
    zero_u = jnp.zeros(shp, jnp.uint32)

    def size_of(mag):
        """Magnitude category via the f32 exponent field: for
        0 < mag < 2^24 (ours are <= 2047), float(mag) is exact and its
        biased exponent is 126 + size — 4 vector ops instead of the
        11-compare ladder."""
        f = mag.astype(jnp.float32)
        e = jax.lax.bitcast_convert_type(f, jnp.int32) >> 23
        return jnp.where(mag > 0, e - 126, 0)

    def append(state, val, ln):
        """Append (val, ln<=32 bits) to the accumulator; retire one word.
        Callers appending >32-bit logical units call this repeatedly; a
        single append adds <= 32 bits to a residue < 32, so ONE retire
        check suffices."""
        acc, cnt, widx, frame = state
        s = cnt.astype(jnp.uint32)
        t = jnp.clip(32 - cnt, 0, 31).astype(jnp.uint32)
        nzc = cnt > 0
        msb = jnp.where(ln > 0, val << jnp.clip(32 - ln, 0, 31).astype(jnp.uint32), 0)
        e0 = msb >> s
        e1 = jnp.where(nzc, msb << t, 0)
        # 2-word accumulator window: one append adds <= 32 bits to a
        # residue < 32, so the live window never exceeds 64 bits (the
        # 4-word window of _pack_kernel is for its 96-bit elements).
        acc = (acc[0] | e0, acc[1] | e1)
        cnt = cnt + ln
        m = cnt >= 32
        word = jnp.where(m, acc[0], 0)
        frame = tuple(frame[j] | jnp.where(widx == j, word, 0) for j in range(cap))
        acc = (
            jnp.where(m, acc[1], acc[0]),
            jnp.where(m, zero_u, acc[1]),
        )
        widx = widx + m.astype(jnp.int32)
        cnt = cnt - 32 * m.astype(jnp.int32)
        return acc, cnt, widx, frame

    def code_for(run, size, packed):
        """(run, size) -> packed (code << 6 | len) — see _HUFF_LOOKUP
        for the measured strategy comparison."""
        if _HUFF_LOOKUP != "cascade":
            flat = [packed[r][s] for r in range(len(packed))
                    for s in range(11)]
            if _HUFF_LOOKUP == "split" and all(
                isinstance(p, (int, np.integer)) for p in flat
            ):
                return _lookup_split(
                    run * 11 + size,
                    *_split_tables(tuple(int(p) for p in flat)),
                )
            if _HUFF_LOOKUP == "tree":
                return _select_tree(run * 11 + size, flat)
        out = jnp.zeros(shp, jnp.int32)
        for r in range(len(packed)):
            row = _select_cascade(size, list(packed[r]))
            out = jnp.where(run == r, row, out)
        return out

    # --- DC (element 0 of the emission order) ---
    dcd = dcd_ref[0]
    dmag = jnp.abs(dcd)
    dsize = size_of(dmag)
    damp = jnp.where(dcd > 0, dcd, dcd - 1).astype(jnp.uint32) & (
        (jnp.uint32(1) << dsize.astype(jnp.uint32)) - 1
    )
    dpk = (_select_tree if _HUFF_LOOKUP == "tree" else _select_cascade)(
        dsize, list(dc_pack)
    )
    dcode = (dpk >> 6).astype(jnp.uint32)
    dlen = dpk & 63
    state = (
        (zero_u, zero_u),
        jnp.zeros(shp, jnp.int32),
        jnp.zeros(shp, jnp.int32),
        tuple(zero_u for _ in range(cap)),
    )
    # code||amplitude fused into one append (worst case 16-bit runtime
    # optimal DC code + 11 amplitude bits = 27 <= 32): one
    # accumulator/retire pass instead of two.
    state = append(
        state, (dcode << dsize.astype(jnp.uint32)) | damp, dlen + dsize
    )

    zrl_val = jnp.full(shp, 0, jnp.uint32) + jnp.uint32(zrl_code)
    zl = jnp.full(shp, 0, jnp.int32) + zrl_len
    zrl2_val = (
        jnp.full(shp, 0, jnp.uint32)
        + (jnp.uint32(zrl_code) << jnp.uint32(zrl_len)) | jnp.uint32(zrl_code)
    )
    zl2 = jnp.full(shp, 0, jnp.int32) + 2 * zrl_len

    def body(k, carry, max_zrl):
        """max_zrl bounds the possible ZRL emissions at element k
        (run >= 16 requires >= 16 preceding zeros, so elements 1-16
        cannot emit any, 17-32 at most one, etc.) — the ZRL appends and
        their retire passes vanish from the early loop ranges."""
        state, run = carry
        v = zz_ref[k]
        nz = v != 0
        mag = jnp.abs(v)
        size = size_of(mag)
        acc_run = run
        if max_zrl >= 2:
            # two ZRLs fused into one append — worst case 2 x 16-bit
            # runtime optimal ZRL codes = exactly 32 bits, the 2-word
            # accumulator window's ceiling (append() invariant)
            two = nz & (acc_run >= 32)
            one = nz & (acc_run >= 16) & ~two
            state = append(
                state,
                jnp.where(two, zrl2_val, jnp.where(one, zrl_val, 0)),
                jnp.where(two, zl2, jnp.where(one, zl, 0)),
            )
            acc_run = jnp.where(two, acc_run - 32,
                                jnp.where(one, acc_run - 16, acc_run))
        if max_zrl in (1, 3):
            emit = nz & (acc_run >= 16)
            state = append(
                state,
                jnp.where(emit, zrl_val, 0),
                jnp.where(emit, zl, 0),
            )
            acc_run = jnp.where(emit, acc_run - 16, acc_run)
        pk = code_for(jnp.where(nz, acc_run, 0), jnp.where(nz, size, 0), ac_pack)
        code = (pk >> 6).astype(jnp.uint32)
        clen = jnp.where(nz, pk & 63, 0)
        amp = jnp.where(v > 0, v, v - 1).astype(jnp.uint32) & (
            (jnp.uint32(1) << size.astype(jnp.uint32)) - 1
        )
        usize = jnp.where(nz, size, 0)
        state = append(
            state,
            (code << usize.astype(jnp.uint32)) | jnp.where(nz, amp, 0),
            clen + usize,
        )
        run = jnp.where(nz, 0, run + 1)
        return state, run

    # Tile-wide last-nonzero coefficient: elements past kmax are zero in
    # EVERY one of the 1024 blocks, so the AC loop stops there (the
    # trailing zeros only grow each lane's run, folded into EOB below).
    # Q50 photographic luma typically quantizes the zigzag tail to zero
    # across whole tiles (chroma almost always), so this removes most of
    # the ~420-op loop bodies. Prologue cost: 63 VMEM reads + 2 vector
    # ops each + one max-reduce.
    kmax_vec = jnp.zeros(shp, jnp.int32)
    for k in range(1, 64):
        kmax_vec = jnp.where(zz_ref[k] != 0, k, kmax_vec)
    kk = jnp.max(kmax_vec) + 1  # loop bound: elements [1, kk)

    def flush(state):
        acc, cnt, widx, frame = state
        partial = jnp.where(cnt > 0, acc[0], 0)
        frame = tuple(
            frame[j] | jnp.where(widx == j, partial, 0) for j in range(cap)
        )
        return frame, widx * 32 + cnt

    if not _PACK_SPLIT:
        carry = (state, jnp.zeros(shp, jnp.int32))
        for lo, hi, mz in ((1, 17, 0), (17, 33, 1), (33, 49, 2),
                           (49, 64, 3)):
            carry = jax.lax.fori_loop(
                jnp.minimum(lo, kk), jnp.minimum(hi, kk),
                lambda k, c, mz=mz: body(k, c, mz), carry,
            )
        state, run = carry

        # EOB iff the block's tail is zero: run counts zeros since the
        # last nonzero WITHIN the truncated range; elements [kk, 64) are
        # zero in every lane, so any lane ends in zeros whenever kk < 64
        # as well.
        eobm = (run > 0) | (kk < 64)
        state = append(
            state,
            jnp.where(eobm, jnp.uint32(0) + jnp.uint32(eob_code), 0),
            jnp.where(eobm, jnp.int32(0) + eob_len, 0),
        )
        frame, bits = flush(state)
        for j in range(cap):
            out_ref[j] = frame[j]
        bits_ref[0] = bits
        return

    # ---- two-half ILP variant (_PACK_SPLIT) ----
    split = 16
    # Half B's seed run = trailing-zero count of elements [1, split),
    # computed straight from zz so the halves stay independent (reading
    # half A's loop carry would re-serialize them).
    tzc = jnp.zeros(shp, jnp.int32)
    alive = jnp.full(shp, True)
    for k in range(split - 1, 0, -1):
        z = zz_ref[k] == 0
        tzc = jnp.where(alive & z, tzc + 1, tzc)
        alive = alive & z

    carry_a = (state, jnp.zeros(shp, jnp.int32))
    carry_a = jax.lax.fori_loop(
        jnp.minimum(1, kk), jnp.minimum(split, kk),
        lambda k, c: body(k, c, 0), carry_a,
    )
    state_b = (
        (zero_u, zero_u),
        jnp.zeros(shp, jnp.int32),
        jnp.zeros(shp, jnp.int32),
        tuple(zero_u for _ in range(cap)),
    )
    carry_b = (state_b, tzc)
    # max_zrl per piece: B's run <= 15 (seed) + in-piece zeros
    for lo, hi, mz in ((split, 33, 1), (33, 49, 2), (49, 64, 3)):
        carry_b = jax.lax.fori_loop(
            jnp.minimum(lo, kk), jnp.minimum(hi, kk),
            lambda k, c, mz=mz: body(k, c, mz), carry_b,
        )
    state_a, _run_a = carry_a
    state_b, run_b = carry_b
    # EOB (the stream's last symbol -> half B). When kk <= split the B
    # loops are empty and run_b == tzc; kk < 64 then forces the marker,
    # matching the serial path's (run > 0) | (kk < 64).
    eobm = (run_b > 0) | (kk < 64)
    state_b = append(
        state_b,
        jnp.where(eobm, jnp.uint32(0) + jnp.uint32(eob_code), 0),
        jnp.where(eobm, jnp.int32(0) + eob_len, 0),
    )
    frame_a, bits_a = flush(state_a)
    frame_b, bits_b = flush(state_b)
    # funnel-deposit half B's frame at bit offset bits_a of half A's:
    # bit-disjoint by construction (A's partial word is zero below its
    # residue), so OR == concatenation.
    r = jnp.bitwise_and(bits_a, 31).astype(jnp.uint32)
    t32 = jnp.clip(32 - (bits_a & 31), 0, 31).astype(jnp.uint32)
    rz = (bits_a & 31) == 0
    base = bits_a >> 5
    out = list(frame_a)
    # no j == cap spill iteration: its deposit targets word base + cap
    # >= cap, past the frame — unlike _merge_kernel, whose accumulating
    # offsets keep that extra funnel window live
    for j in range(cap):
        cur = frame_b[j]
        prv = frame_b[j - 1] if j >= 1 else zero_u
        v = jnp.where(rz, cur, (cur >> r) | (prv << t32))
        for p in range(j, cap):
            out[p] = out[p] | jnp.where(base == p - j, v, 0)
    for j in range(cap):
        out_ref[j] = out[j]
    bits_ref[0] = bits_a + bits_b


@functools.lru_cache(maxsize=2)
def _kernel_tables(table: int):
    """Static python tables for the select cascades: DC packed
    (code << 6 | len) per size category, AC packed per (run, size)."""
    import numpy as np

    from .device import _host_luts

    dc_codes, dc_lens, ac_codes, ac_lens = _host_luts()
    dc_pack = tuple(
        int((int(dc_codes[table, s]) << 6) | int(dc_lens[table, s]))
        for s in range(12)
    )
    ac = np.zeros((16, 11), np.int64)
    for r in range(16):
        for s in range(11):
            sym = (r << 4) | s
            ac[r, s] = (int(ac_codes[table, sym]) << 6) | int(ac_lens[table, sym])
    zrl = 0xF0
    eob = 0x00
    return (
        dc_pack,
        ac,
        int(ac_codes[table, zrl]),
        int(ac_lens[table, zrl]),
        int(ac_codes[table, eob]),
        int(ac_lens[table, eob]),
    )


@functools.partial(
    jax.jit, static_argnames=("cap", "table", "interpret", "raw")
)
def encode_blocks_pallas(zz, dc_diff, cap: int = 8, table: int = 0,
                         custom_tables=None,
                         interpret: bool = False, raw: bool = False):
    """Fused symbolize+pack: [nb, 64] zigzag levels (+ [nb] DC diffs) ->
    (words [cap, nb] u32 transposed, bits [nb] i32, overflow) for a
    single static Huffman `table` class.

    raw=True skips the final minor-axis relayout and returns the kernel's
    native tiling (words [G, cap, 8, 128], bits [G, 8, 128], overflow) —
    the layout merge_streams_pallas consumes, so multi-launch callers
    (the color MCU merge) pay zero relayouts between the two kernels.

    PRE-TILED input: zz may be [G, 64, 8, 128] (the layout
    ops.pallas_transform.transform_plane_raw emits) with dc_diff
    [G, 8, 128]; the XLA re-tiling prep is skipped entirely. Block->lane
    mapping is then the caller's (grid-natural); combine with raw=True
    and ops.pallas_transform.raw_to_scan for scan order."""
    if zz.ndim == 4:
        g = zz.shape[0]
        npad = nb = g * BLOCKS_PER_STEP
        zzt = zz.astype(jnp.int32)
        dct_ = dc_diff.astype(jnp.int32)[:, None]
    else:
        nb = zz.shape[0]
        g = -(-nb // BLOCKS_PER_STEP)
        npad = g * BLOCKS_PER_STEP
        zz = jnp.pad(zz.astype(jnp.int32), ((0, npad - nb), (0, 0)))
        dc_diff = jnp.pad(dc_diff.astype(jnp.int32), (0, npad - nb))
        # [npad, 64] -> [G, 64, 8, 128] coefficient-major
        zzt = zz.T.reshape(64, g, SUBLANES, LANES).transpose(1, 0, 2, 3)
        dct_ = dc_diff.reshape(g, SUBLANES, LANES)[:, None]

    if custom_tables is None:
        tabs = _kernel_tables(table)
        kern = functools.partial(_encode_kernel, cap=cap, tables_pack=tabs)
        extra_in, extra_specs = (), ()
    else:
        kern = functools.partial(_encode_kernel_rt, cap=cap)
        extra_in = (custom_tables.astype(jnp.int32),)
        extra_specs = (
            pl.BlockSpec((192,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
        )

    out, bits = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[
            *extra_specs,
            pl.BlockSpec((None, 64, SUBLANES, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, SUBLANES, LANES), lambda i: (i, 0, 0, 0),
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
    )(*extra_in, zzt, dct_)

    if raw:
        bits_raw = bits[:, 0]
        overflow = jnp.any(bits_raw > cap * 32)
        return out, bits_raw, overflow
    words_out = out.transpose(1, 0, 2, 3).reshape(cap, npad)[:, :nb]
    bits_out = bits.reshape(-1)[:nb]
    overflow = jnp.any(bits_out > cap * 32)
    return words_out, bits_out, overflow


def _merge_kernel(w_ref, b_ref, out_ref, bits_ref, *, e: int, cap_in: int,
                  single_store: bool = False):
    """Merge `e` packed streams per lane into one stream.

    w_ref [e, cap_in, 8, 128] u32 (MSB-aligned streams; words past each
    stream's bit count are zero), b_ref [e, 8, 128] i32,
    out_ref [e * cap_in, 8, 128] u32, bits_ref [1, 8, 128] i32.

    The bitstream concat is done entirely in registers: stream s shifts
    right by the running bit offset (one funnel shift across its cap_in+1
    word window) and each shifted word one-hot deposits into the output
    frame. The offset after s streams is <= 32 * cap_in * s, so the
    deposit cascade for (s, j) only spans frame words [j, cap_in*s + j] —
    the unroll is O(e^2 * cap_in^2 / 2), ~1.1k selects for the 4:2:0 MCU
    merge (e=6, cap_in=8). Output cannot overflow: total bits ==
    sum of inputs <= 32 * e * cap_in by construction."""
    cap_out = e * cap_in
    shp = (SUBLANES, LANES)
    zero_u = jnp.zeros(shp, jnp.uint32)
    frame = [zero_u] * cap_out
    off = jnp.zeros(shp, jnp.int32)
    for s in range(e):
        r = (off & 31).astype(jnp.uint32)
        base = off >> 5
        t = jnp.clip(32 - (off & 31), 0, 31).astype(jnp.uint32)
        rz = r == 0
        words_s = [w_ref[s, j] for j in range(cap_in)]
        for j in range(cap_in + 1):
            cur = words_s[j] if j < cap_in else zero_u
            prv = words_s[j - 1] if j >= 1 else zero_u
            v = jnp.where(rz, cur, (cur >> r) | (prv << t))
            hi_pos = min(cap_in * s + j, cap_out - 1)
            for p in range(j, hi_pos + 1):
                frame[p] = frame[p] | jnp.where(base == p - j, v, 0)
        off = off + b_ref[s]
    if single_store:
        # see _merge_mcu_kernel: >32 chained per-index stores cycle the
        # XLA:CPU algebraic simplifier in interpret mode
        out_ref[...] = jnp.stack(frame, axis=0)
    else:
        for j in range(cap_out):
            out_ref[j] = frame[j]
    bits_ref[0] = off


@functools.partial(jax.jit, static_argnames=("interpret",))
def merge_streams_pallas(w_raw, b_raw, interpret: bool = False):
    """Concatenate E per-block streams per lane: ([G, E, cap, 8, 128] u32,
    [G, E, 8, 128] i32) -> (merged [G, E*cap, 8, 128], bits [G, 8, 128]).

    This replaces log-depth XLA merge levels (strided lane slicing +
    barrel shifts over [C, N] arrays — measured ~8 ms for the 12 MPix
    4:2:0 MCU fold) with one register-resident pass, the same move the
    reference's DSP makes by keeping its BitWriter accumulator in scalar
    registers (dsp huffman.c:113-156)."""
    g, e, cap_in = w_raw.shape[:3]
    out, bits = pl.pallas_call(
        functools.partial(_merge_kernel, e=e, cap_in=cap_in,
                          single_store=interpret),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((None, e, cap_in, SUBLANES, LANES),
                         lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, e, SUBLANES, LANES),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, e * cap_in, SUBLANES, LANES),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, SUBLANES, LANES),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, e * cap_in, SUBLANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((g, 1, SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(w_raw.astype(jnp.uint32), b_raw.astype(jnp.int32))
    return out, bits[:, 0]


import numpy as np


@functools.lru_cache(maxsize=1)
def _realign_mats():
    """[4, 128, 128] f32 selection matrices, entry (2*cg + sx):
    dst MCU lane (64*cg + jj) <- src Y lane (2*jj + sx) of col-group cg.
    Each column has exactly one 1, so f32 matmuls against them are exact
    lane permutations (no accumulation)."""
    m = np.zeros((4, LANES, LANES), np.float32)
    for cg in range(2):
        for sx in range(2):
            for jj in range(64):
                m[2 * cg + sx, 2 * jj + sx, 64 * cg + jj] = 1.0
    return m


def _merge_mcu_kernel(mats_ref, y_ref, by_ref, cb_ref, bcb_ref, cr_ref,
                      bcr_ref, out_ref, bits_ref, *, cap: int, fy: int,
                      fx: int, single_store: bool = False):
    """One MCU-grid group step: interleave-merge E = fy*fx + 2 per-block
    streams straight from NATURAL grid layouts.

    y_ref [fy, fx, cap, 8, 128] u32 — the fy x fx Y groups covering this
    chroma group's MCUs; by_ref [fy, fx, 8, 128] i32; cb/cr_ref
    [cap, 8, 128] u32 with bits [8, 128] i32; out_ref [E*cap, 8, 128],
    bits_ref [8, 128]. Y lanes are realigned to MCU lanes by the static
    selection matmuls (u16 halves, f32 MXU — exact), then the register
    walk of _merge_kernel concatenates the E streams per lane."""
    shp = (SUBLANES, LANES)
    e = fy * fx + 2
    cap_out = e * cap
    zero_u = jnp.zeros(shp, jnp.uint32)

    if fx == 2:
        r_w = [[None] * 2 for _ in range(fy)]
        r_b = [[None] * 2 for _ in range(fy)]
        for rg in range(fy):
            for sx in range(2):
                # 8-bit byte planes in bf16: the selection is a pure
                # permutation (one 1 per column) so bf16 MXU passes are
                # exact for values <= 255; the bits matvec uses HIGHEST
                # (true f32) since bit counts can exceed 256. Default
                # MXU precision is bf16 and silently rounds wider data.
                planes = [None] * 4
                b_acc = None
                for cg in range(2):
                    a = mats_ref[2 * cg + sx].astype(jnp.bfloat16)
                    w = y_ref[rg, cg].reshape(cap * SUBLANES, LANES)
                    for bidx in range(4):
                        bv = (
                            (w >> jnp.uint32(8 * bidx)) & jnp.uint32(0xFF)
                        ).astype(jnp.int32).astype(jnp.float32)
                        m = jax.lax.dot(
                            bv.astype(jnp.bfloat16), a,
                            preferred_element_type=jnp.float32,
                        )
                        planes[bidx] = (
                            m if planes[bidx] is None else planes[bidx] + m
                        )
                    mb = jax.lax.dot(
                        by_ref[rg, cg].astype(jnp.float32),
                        mats_ref[2 * cg + sx],
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )
                    b_acc = mb if b_acc is None else b_acc + mb
                acc = jnp.zeros((cap * SUBLANES, LANES), jnp.uint32)
                for bidx in range(4):
                    acc = acc | (
                        planes[bidx].astype(jnp.int32).astype(jnp.uint32)
                        << jnp.uint32(8 * bidx)
                    )
                r_w[rg][sx] = acc
                r_b[rg][sx] = b_acc.astype(jnp.int32)

    def y_word(sy, sx, j):
        if fx == 1:
            return y_ref[0, 0, j]
        if fy == 1:
            return r_w[0][sx][j * SUBLANES : (j + 1) * SUBLANES]
        # 420: output sublane s <- (rg = s//4, src sublane 2*(s%4)+sy).
        # Single-row slices (strided slicing lowers to an unsupported
        # gather in Mosaic).
        return jnp.concatenate(
            [
                r_w[rg][sx][j * SUBLANES + 2 * m + sy
                            : j * SUBLANES + 2 * m + sy + 1]
                for rg in range(2)
                for m in range(4)
            ],
            axis=0,
        )

    def y_bits(sy, sx):
        if fx == 1:
            return by_ref[0, 0]
        if fy == 1:
            return r_b[0][sx]
        return jnp.concatenate(
            [
                r_b[rg][sx][2 * m + sy : 2 * m + sy + 1]
                for rg in range(2)
                for m in range(4)
            ],
            axis=0,
        )

    streams = []
    for sy in range(fy):
        for sx in range(fx):
            streams.append(
                (functools.partial(y_word, sy, sx), y_bits(sy, sx))
            )
    streams.append((lambda j: cb_ref[j], bcb_ref[...]))
    streams.append((lambda j: cr_ref[j], bcr_ref[...]))

    frame = [zero_u] * cap_out
    off = jnp.zeros(shp, jnp.int32)
    for s_idx, (wfn, bts) in enumerate(streams):
        r = (off & 31).astype(jnp.uint32)
        base = off >> 5
        t = jnp.clip(32 - (off & 31), 0, 31).astype(jnp.uint32)
        rz = r == 0
        words_s = [wfn(j) for j in range(cap)]
        for j in range(cap + 1):
            cur = words_s[j] if j < cap else zero_u
            prv = words_s[j - 1] if j >= 1 else zero_u
            v = jnp.where(rz, cur, (cur >> r) | (prv << t))
            hi_pos = min(cap * s_idx + j, cap_out - 1)
            for p in range(j, hi_pos + 1):
                frame[p] = frame[p] | jnp.where(base == p - j, v, 0)
        off = off + bts
    if single_store:
        # Interpret mode: one stacked store. cap_out (48 for 4:2:0)
        # chained per-index stores lower to dynamic-update-slices whose
        # rewrite pattern cycles XLA:CPU's algebraic simplifier (see
        # ops/pallas_transform._store_zigzag).
        out_ref[...] = jnp.stack(frame, axis=0)
    else:
        for j in range(cap_out):
            out_ref[j] = frame[j]
    bits_ref[...] = off


@functools.partial(
    jax.jit,
    static_argnames=("nrg_c", "ncg_c", "subsampling", "interpret"),
)
def merge_mcu_natural_pallas(w_y, b_y, w_c, b_c, nrg_c: int, ncg_c: int,
                             subsampling: str = "420",
                             interpret: bool = False):
    """MCU scan interleave straight from NATURAL grid-layout packed
    blocks — no slot planes, no XLA stack/transpose staging.

    w_y [Gy, cap, 8, 128] u32 over the full-res Y plane padded to
    (fy*kh_c, fx*kw_c) (so Gy = fy*fx*Gc); b_y [Gy, 8, 128] i32;
    w_c [2, Gc, cap, 8, 128] u32 (Cb, Cr) over the chroma grid with
    b_c [2, Gc, 8, 128]. Returns (merged [Gc, E*cap, 8, 128] u32,
    bits [Gc, 8, 128] i32) in the CHROMA (== MCU) grid-natural layout.

    This replaces the reference's per-MCU component loop
    (dsp jpeg_compression.c:150-178) with one kernel pass whose only
    data movement is the static Y lane realignment on the MXU."""
    fy = 2 if subsampling == "420" else 1
    fx = 1 if subsampling == "444" else 2
    cap = w_y.shape[1]
    e = fy * fx + 2
    nry, ncy = fy * nrg_c, fx * ncg_c
    y5 = w_y.reshape(nry, ncy, cap, SUBLANES, LANES)
    by4 = b_y.reshape(nry, ncy, SUBLANES, LANES)
    c6 = w_c.reshape(2, nrg_c, ncg_c, cap, SUBLANES, LANES)
    bc5 = b_c.reshape(2, nrg_c, ncg_c, SUBLANES, LANES)
    mats = jnp.asarray(_realign_mats())
    out, bits = pl.pallas_call(
        functools.partial(_merge_mcu_kernel, cap=cap, fy=fy, fx=fx,
                          single_store=interpret),
        grid=(nrg_c, ncg_c),
        in_specs=[
            pl.BlockSpec((4, LANES, LANES), lambda a, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fy, fx, cap, SUBLANES, LANES),
                         lambda a, b: (a, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fy, fx, SUBLANES, LANES),
                         lambda a, b: (a, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, cap, SUBLANES, LANES),
                         lambda a, b: (a, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, SUBLANES, LANES),
                         lambda a, b: (a, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, cap, SUBLANES, LANES),
                         lambda a, b: (a, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, SUBLANES, LANES),
                         lambda a, b: (a, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, None, e * cap, SUBLANES, LANES),
                         lambda a, b: (a, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, SUBLANES, LANES),
                         lambda a, b: (a, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (nrg_c, ncg_c, e * cap, SUBLANES, LANES), jnp.uint32
            ),
            jax.ShapeDtypeStruct(
                (nrg_c, ncg_c, SUBLANES, LANES), jnp.int32
            ),
        ],
        interpret=interpret,
    )(
        mats, y5.astype(jnp.uint32), by4.astype(jnp.int32),
        c6[0].astype(jnp.uint32), bc5[0].astype(jnp.int32),
        c6[1].astype(jnp.uint32), bc5[1].astype(jnp.int32),
    )
    g = nrg_c * ncg_c
    return (
        out.reshape(g, e * cap, SUBLANES, LANES),
        bits.reshape(g, SUBLANES, LANES),
    )


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

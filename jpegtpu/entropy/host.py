"""Host entropy coder: RLE symbolization + Huffman bit packing (numpy).

Implements the reference's exact semantics (natural_c rle.c:51-131,
huffman.c:121-192) as fully vectorized numpy — no per-block Python loop.
Serves three roles:
  * ground truth for the on-device (JAX) entropy pipeline's tests,
  * the host fallback packer,
  * the assembler for multi-segment restart-marker streams.

Semantics locked to the reference (SURVEY.md §7.3):
  * magnitude category = bit length of |v| (rle.c:9-22),
  * negative amplitudes encoded as v-1 masked to `size` bits (rle.c:24-35),
  * ZRL 0xF0 per 16 zeros, symbol byte (run<<4)|size, EOB 0x00 when the
    block's tail is zero (rle.c:84-123),
  * DC is a running difference along the scan, resettable per restart
    segment and chained per component (rle.c:59-70),
  * canonical Huffman codes, MSB-first bit packing, 0xFF -> 0xFF 00 byte
    stuffing everywhere including the flush tail (huffman.c:26-81),
  * final partial byte padded with 1s (T.81 spec, dsp huffman.c:179-187)
    or 0s (natural_c behavior) — selectable.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .. import tables

_ZRL = 0xF0
_EOB = 0x00


def magnitude_category(v: np.ndarray) -> np.ndarray:
    """Bit length of |v| (0 for 0). v: any signed int array, |v| < 2^15."""
    mag = np.abs(v.astype(np.int32)).astype(np.uint32)
    sz = np.zeros(v.shape, dtype=np.uint8)
    for k in range(16):
        sz += (mag >= (1 << k)).astype(np.uint8)
    return sz


def amplitude_code(v: np.ndarray, size: np.ndarray) -> np.ndarray:
    """JPEG amplitude bits: v if v > 0 else v - 1, masked to `size` bits."""
    v = v.astype(np.int64)
    raw = np.where(v > 0, v, v - 1).astype(np.int64)
    mask = (np.int64(1) << size.astype(np.int64)) - 1
    return (raw & mask).astype(np.uint32)


def dc_differences(
    dc: np.ndarray,
    comp_id: Optional[np.ndarray] = None,
    segment_ids: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Per-block DC difference along scan order.

    comp_id: [nb] component of each block — each component has its own
      predictor chain (T.81 F.1.1.5.1). None = single component.
    segment_ids: [nb] restart-segment index — predictors reset to 0 at the
      start of each segment (T.81 F.1.2.3). None = one segment.
    """
    nb = dc.shape[0]
    diff = np.empty(nb, dtype=np.int32)
    comp = np.zeros(nb, dtype=np.int64) if comp_id is None else comp_id.astype(np.int64)
    seg = np.zeros(nb, dtype=np.int64) if segment_ids is None else segment_ids.astype(np.int64)
    chain = seg * 8 + comp  # distinct predictor chain per (segment, component)
    dc = dc.astype(np.int32)
    for c in np.unique(chain):
        m = chain == c
        vals = dc[m]
        diff[m] = np.concatenate([vals[:1], np.diff(vals)])
    return diff


def symbolize(
    zz: np.ndarray,
    comp_id: Optional[np.ndarray] = None,
    segment_ids: Optional[np.ndarray] = None,
):
    """Turn [nb, 64] zigzag coefficients into a flat symbol stream.

    Returns (symbols u8, amplitudes u32, amp_bits u8, is_dc bool,
    block_of_symbol i64) — symbols in the exact emission order of the
    reference: per block DC, then ascending AC with ZRLs before each
    escaped value, then EOB if the tail is zero.
    """
    zz = np.asarray(zz)
    nb = zz.shape[0]
    lanes = np.arange(64)

    # --- DC ---
    dc_diff = dc_differences(zz[:, 0], comp_id, segment_ids)
    dc_size = magnitude_category(dc_diff)
    dc_amp = amplitude_code(dc_diff, dc_size)

    # --- AC lane analysis ---
    ac = zz[:, 1:]  # [nb, 63]
    nz = ac != 0
    # last nonzero lane index (1-based over full 64-lane frame); 0 if none
    last_nz = np.max(np.where(nz, lanes[1:], 0), axis=1)  # [nb]
    # previous nonzero lane before lane k (DC lane 0 counts as nonzero)
    pos = np.where(nz, lanes[1:], 0)  # [nb, 63] zero where zero
    prev = np.maximum.accumulate(np.concatenate([np.zeros((nb, 1), np.int64), pos], axis=1), axis=1)[:, :-1]
    run = lanes[1:][None, :] - prev - 1  # zeros between prev nonzero and k
    emit = nz & (lanes[1:][None, :] <= last_nz[:, None])
    zrl_cnt = np.where(emit, run >> 4, 0).astype(np.int64)
    rem = (run & 15).astype(np.uint8)
    ac_size = magnitude_category(ac)
    ac_sym = ((rem << 4) | ac_size).astype(np.uint8)
    ac_amp = amplitude_code(ac, ac_size)
    eob = last_nz < 63  # [nb]

    # --- serialize per-lane slots: lane 0 = DC; lanes 1..63 = (ZRLs, sym);
    # lane 64 = EOB. Two slots per lane: A (repeated ZRL) then B (symbol). ---
    cnt = np.zeros((nb, 65, 2), dtype=np.int64)
    cnt[:, 0, 1] = 1
    cnt[:, 1:64, 0] = zrl_cnt
    cnt[:, 1:64, 1] = emit
    cnt[:, 64, 1] = eob

    sym = np.zeros((nb, 65, 2), dtype=np.uint8)
    amp = np.zeros((nb, 65, 2), dtype=np.uint32)
    bits = np.zeros((nb, 65, 2), dtype=np.uint8)
    sym[:, :, 0] = _ZRL
    sym[:, 0, 1] = dc_size  # DC symbol byte == size category (rle.c:73)
    amp[:, 0, 1] = dc_amp
    bits[:, 0, 1] = dc_size
    sym[:, 1:64, 1] = ac_sym
    amp[:, 1:64, 1] = ac_amp
    bits[:, 1:64, 1] = ac_size
    sym[:, 64, 1] = _EOB

    flat_cnt = cnt.reshape(-1)
    symbols = np.repeat(sym.reshape(-1), flat_cnt)
    amplitudes = np.repeat(amp.reshape(-1), flat_cnt)
    amp_bits = np.repeat(bits.reshape(-1), flat_cnt)
    is_dc = np.repeat(
        np.broadcast_to((np.arange(65) == 0)[None, :, None], (nb, 65, 2)).reshape(-1),
        flat_cnt,
    )
    block_of_symbol = np.repeat(
        np.broadcast_to(np.arange(nb)[:, None, None], (nb, 65, 2)).reshape(-1),
        flat_cnt,
    )
    return symbols, amplitudes, amp_bits, is_dc, block_of_symbol


def symbol_frequencies(
    zz: np.ndarray,
    table_sel: Optional[np.ndarray] = None,
    comp_id: Optional[np.ndarray] = None,
    segment_ids: Optional[np.ndarray] = None,
) -> dict:
    """Per-class 256-bin histograms of the scan's Huffman symbols — the
    first pass of 2-pass optimal-table coding. Returns the same keys as
    tables.huffman_luts(): 'dc_lum', 'ac_lum', 'dc_chrom', 'ac_chrom'."""
    zz = np.asarray(zz)
    nb = zz.shape[0]
    symbols, _amp, _bits, is_dc, block_of = symbolize(zz, comp_id, segment_ids)
    sel = (
        np.zeros(nb, dtype=np.int64)
        if table_sel is None
        else np.asarray(table_sel).astype(np.int64)
    )
    ssel = sel[block_of]
    out = {}
    for dc_flag, cls in ((True, "dc"), (False, "ac")):
        for tsel, kind in ((0, "lum"), (1, "chrom")):
            m = (is_dc == dc_flag) & (ssel == tsel)
            out[f"{cls}_{kind}"] = np.bincount(
                symbols[m].astype(np.int64), minlength=256
            )
    return out


def pack_bits(values: np.ndarray, lengths: np.ndarray, pad_ones: bool = True) -> bytes:
    """MSB-first concatenation of variable-length codes, with byte stuffing.

    values: uint32/uint64 code values; lengths: bits per code (0 allowed).
    Uses the native C++ packer when available (identical output, pinned by
    tests); falls back to vectorized numpy.
    """
    from .. import native

    if native.available() and int(lengths.max(initial=0)) <= 32:
        return native.pack_codes(
            values.astype(np.uint32), lengths.astype(np.uint8), pad_ones
        )
    return _pack_bits_numpy(values, lengths, pad_ones)


def _pack_bits_numpy(
    values: np.ndarray, lengths: np.ndarray, pad_ones: bool = True
) -> bytes:
    values = values.astype(np.uint64)
    lengths = lengths.astype(np.int64)
    total = int(lengths.sum())
    if total == 0:
        return b""
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    within = np.arange(total, dtype=np.int64) - np.repeat(offsets, lengths)
    shift = np.repeat(lengths, lengths) - 1 - within
    bitvals = ((np.repeat(values, lengths) >> shift.astype(np.uint64)) & 1).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bitvals = np.concatenate(
            [bitvals, np.full(pad, 1 if pad_ones else 0, dtype=np.uint8)]
        )
    raw = np.packbits(bitvals)
    return stuff_bytes(raw)


def stuff_bytes(raw: np.ndarray) -> bytes:
    """JPEG byte stuffing: every 0xFF is followed by 0x00 (huffman.c:26-32)."""
    is_ff = raw == 0xFF
    n_ff = int(is_ff.sum())
    if n_ff == 0:
        return raw.tobytes()
    out = np.zeros(raw.size + n_ff, dtype=np.uint8)
    idx = np.arange(raw.size) + np.concatenate([[0], np.cumsum(is_ff)[:-1]])
    out[idx] = raw
    return out.tobytes()


def encode_scan(
    zz: np.ndarray,
    table_sel: Optional[np.ndarray] = None,
    comp_id: Optional[np.ndarray] = None,
    segment_ids: Optional[np.ndarray] = None,
    pad_ones: bool = True,
    luts: Optional[dict] = None,
) -> list[bytes]:
    """Full entropy encode of a scan: [nb, 64] zigzag coeffs -> entropy
    segment byte strings (one per restart segment, each independently
    byte-aligned and padded; join with RSTn markers via io.jfif.assemble).

    table_sel: [nb] 0 = luminance tables, 1 = chrominance. None = all 0.
    comp_id / segment_ids: see dc_differences.
    luts: optional custom (codes, lengths) LUT dict (the keys of
      tables.huffman_luts()) — the second pass of 2-pass optimal-table
      coding (tables.optimal_specs_from_frequencies).
    """
    zz = np.asarray(zz)
    nb = zz.shape[0]
    symbols, amplitudes, amp_bits, is_dc, block_of = symbolize(
        zz, comp_id, segment_ids
    )
    if luts is None:
        luts = tables.huffman_luts()
    sel = np.zeros(nb, dtype=np.int64) if table_sel is None else table_sel.astype(np.int64)
    sym_sel = sel[block_of]

    # Gather Huffman codes: 4-way select over (is_dc, table_sel).
    codes = np.empty(symbols.shape, dtype=np.uint32)
    lens = np.empty(symbols.shape, dtype=np.uint8)
    for dc_flag, cls in ((True, "dc"), (False, "ac")):
        for tsel, kind in ((0, "lum"), (1, "chrom")):
            m = (is_dc == dc_flag) & (sym_sel == tsel)
            if not m.any():
                continue  # grayscale custom luts carry no chrom keys
            c, l = luts[f"{cls}_{kind}"]
            codes[m] = c[symbols[m]]
            lens[m] = l[symbols[m]]

    # Combined (huffman code || amplitude) per symbol, <= 27 bits.
    total_vals = (codes.astype(np.uint64) << amp_bits.astype(np.uint64)) | amplitudes
    total_lens = lens.astype(np.int64) + amp_bits

    if segment_ids is None:
        return [pack_bits(total_vals, total_lens, pad_ones)]
    seg_of_symbol = segment_ids.astype(np.int64)[block_of]
    out = []
    for s in range(int(segment_ids.max()) + 1):
        m = seg_of_symbol == s
        out.append(pack_bits(total_vals[m], total_lens[m], pad_ones))
    return out

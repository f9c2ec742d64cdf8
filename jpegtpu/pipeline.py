"""End-to-end encode orchestration.

Boundary layout mirrors the reference's host/device split (SURVEY.md §3.5):
host does container I/O and JFIF assembly (the A72's role in the DSP port,
dsp_port/jpeg_client/main.c); the TPU does everything from color conversion
through zigzag (and, via entropy.device, symbolization + bit packing).

The device transform is jitted once per (padded shape, quality, mode) and
cached.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import tables
from .config import EncodeConfig
from .io import bmp, jfif
from .entropy import device as entropy_device
from .entropy import host as entropy_host
from .ops import blocks, color, dct, quant, zigzag


def _gray_levels(img, cfg: EncodeConfig, basis, qtable, is_rgb: bool):
    """Traceable core: padded image -> [nb, 64] zigzag levels.

    Uses the tiled block-diagonal MXU transform (ops/fused_transform) —
    ~20x the throughput of the batched-8x8 einsum. The image (already
    8-aligned) is edge-padded up to tile multiples in-graph and the extra
    blocks trimmed after."""
    from .ops import fused_transform

    y = color.rgb_to_y_reference(img) if is_rgb else img
    h, w = y.shape
    th, tw = fused_transform.padded_dims_tile(h, w)
    if (th, tw) != (h, w):
        y = jnp.pad(y, ((0, th - h), (0, tw - w)), mode="edge")
    if cfg.dct_dtype == "int32":
        from .ops import int_transform

        return int_transform.transform_tiled_int(
            y, qtable, bitexact=cfg.bitexact, out_blocks=(h // 8, w // 8)
        )
    return fused_transform.transform_tiled(
        y, qtable, bitexact=cfg.bitexact, out_blocks=(h // 8, w // 8)
    )


def _gray_levels_blockwise(img, cfg: EncodeConfig, basis, qtable, is_rgb: bool):
    """The straightforward batched-8x8 formulation (kept as the reference
    implementation for equivalence tests)."""
    y = color.rgb_to_y_reference(img) if is_rgb else img
    centered = color.level_shift(y)
    b = blocks.blockify(centered)
    coeffs = dct.dct_blocks(b, basis)
    levels = quant.quantize(coeffs, qtable)
    return zigzag.zigzag_scan(levels)


@functools.lru_cache(maxsize=64)
def _transform_gray(ph: int, pw: int, cfg: EncodeConfig, is_rgb: bool):
    """Jitted device transform: padded image -> [nb, 64] zigzag levels."""
    basis_np = cfg.dct_basis()
    qtable_np = cfg.luma_quant.astype(np.float32)

    @jax.jit
    def fn(img):
        return _gray_levels(
            img, cfg, jnp.asarray(basis_np), jnp.asarray(qtable_np), is_rgb
        )

    return fn


@functools.lru_cache(maxsize=64)
def _encode_gray_device(
    ph: int,
    pw: int,
    cfg: EncodeConfig,
    is_rgb: bool,
    cap_words_per_block: int,
    stuff: bool = True,
):
    """Jitted full device encode. Transform and entropy coding compile into
    ONE XLA program so intermediates never leave the device.

    stuff=True: padded image -> (stuffed entropy bytes, nbytes, overflow).
    stuff=False: -> (packed words, total_bits, overflow); the host finishes
    with the native stuffer (native.words_to_stuffed)."""
    @jax.jit
    def fn(img):
        return gray_encode_body(img, cfg, is_rgb, cap_words_per_block, stuff)

    return fn


def gray_encode_body(img, cfg: EncodeConfig, is_rgb: bool,
                     cap_words_per_block: int, stuff: bool,
                     custom_tables=None):
    """Traceable full grayscale encode body (compose under jit freely —
    e.g. the bench chains K of these in one program to measure pure
    device compute without the per-dispatch transport floor).
    custom_tables: optional [192] i32 runtime Huffman tables
    (pallas_pack.pack_runtime_tables) — 2-pass optimal coding at device
    speed, no recompile per table set."""
    ph, pw = img.shape[:2]
    nb = (ph // 8) * (pw // 8)
    if cap_words_per_block <= 16:
        return _gray_encode_body_raw(
            img, cfg, is_rgb, cap_words_per_block, stuff,
            custom_tables=custom_tables,
        )
    assert custom_tables is None, "runtime tables need the raw path"
    basis_np = cfg.dct_basis()
    qtable_np = cfg.luma_quant.astype(np.float32)
    zz = _gray_levels(
        img, cfg, jnp.asarray(basis_np), jnp.asarray(qtable_np), is_rgb
    )
    return entropy_device.encode_scan_device(
        zz,
        capacity_words=nb * cap_words_per_block,
        pad_ones=cfg.pad_ones,
        stuff=stuff,
    )


def _gray_raw_front(img, cfg: EncodeConfig, is_rgb: bool, cap: int,
                    seg_blocks: int, custom_tables=None):
    """Shared front half of the all-Pallas gray chain: fused transform ->
    scan-order DC differences (predictor chain reset every seg_blocks
    blocks; 0 = one unbroken chain) -> fused symbolize/pack, all in the
    grid-natural tiling. Both the flagship single-stream body and the
    stitched restart body build on this; keep them from diverging here.
    Returns (w_raw, b_raw, nbh, nbw, ncg, interp)."""
    from .entropy import pallas_pack
    from .ops import color as color_ops, pallas_transform as pt

    y = color_ops.rgb_to_y_reference(img) if is_rgb else img
    h, w = y.shape
    nbh, nbw = h // 8, w // 8
    kh, kw = pt.padded_dims_kernel(h, w)
    if (kh, kw) != (h, w):
        y = jnp.pad(y, ((0, kh - h), (0, kw - w)))
    ncg = kw // pt.TILE_W
    interp = jax.default_backend() == "cpu"
    int_mode = cfg.dct_dtype == "int32"
    qtable_np = cfg.luma_quant.astype(
        np.int32 if int_mode else np.float32
    )
    raw = pt.transform_plane_raw(
        y, jnp.asarray(qtable_np), cfg.bitexact, interpret=interp,
        int_mode=int_mode,
    )
    dc_scan = pt.raw_to_scan(raw[:, :1], nbh, nbw, ncg)[0]
    dcd = entropy_device.dc_differences(dc_scan, seg_blocks)
    dcd_raw = pt.scan_to_raw(dcd, nbh, nbw, ncg)
    w_raw, b_raw, _ = pallas_pack.encode_blocks_pallas(
        raw, dcd_raw, cap=cap, table=0, custom_tables=custom_tables,
        interpret=interp, raw=True,
    )
    return w_raw, b_raw, nbh, nbw, ncg, interp


def _gray_encode_body_raw(img, cfg: EncodeConfig, is_rgb: bool,
                          cap: int, stuff: bool, custom_tables=None):
    """All-Pallas grayscale body: the fused transform kernel emits
    quantized zigzag levels directly in the entropy kernel's tiling
    (ops.pallas_transform), the fused symbolize+pack kernel consumes them
    pre-tiled, and the only relayouts in the whole chain are major-axis
    moves of the small per-block outputs (words/bits/DC) — the ~2.5 ms
    blockify+zigzag+re-tiling relayout chain of the XLA path (measured,
    tools/levels_micro.py) disappears."""
    from .entropy import pallas_concat, treepack
    from .ops import pallas_transform as pt

    w_raw, b_raw, nbh, nbw, ncg, interp = _gray_raw_front(
        img, cfg, is_rgb, cap, 0, custom_tables
    )
    mode = pallas_concat.concat_mode(nbh, nbw, cap, ncg)
    if mode == "pallas-resident":
        m = pallas_concat.valid_mask(nbh, nbw, ncg, w_raw.shape[0])
        overflow = jnp.any(jnp.where(m, b_raw, 0) > cap * 32)
        words, total_bits = pallas_concat.concat_raw_pallas(
            w_raw, b_raw, nbh, nbw, ncg, interpret=interp
        )
    elif mode == "pallas-chunked":
        # past the VMEM-resident budget (8K+ frames): chunked streaming
        # concat + device OR-combine, same contract, still all-Pallas
        m = pallas_concat.valid_mask(nbh, nbw, ncg, w_raw.shape[0])
        overflow = jnp.any(jnp.where(m, b_raw, 0) > cap * 32)
        words, total_bits = pallas_concat.concat_raw_chunked(
            w_raw, b_raw, nbh, nbw, ncg,
            pallas_concat.chunk_plan(cap, ncg), interpret=interp,
        )
    else:
        w_t = pt.raw_to_scan(w_raw, nbh, nbw, ncg)
        bits = pt.raw_to_scan(b_raw[:, None], nbh, nbw, ncg)[0]
        overflow = jnp.any(bits > cap * 32)
        words, total_bits = treepack.concat_blocks_tree(w_t, bits)
    words, total_bits = treepack._apply_tail_padding(
        words, total_bits, cfg.pad_ones
    )
    if not stuff:
        return words, total_bits, overflow
    out, nbytes = entropy_device.stuff_bytes_device(words, total_bits)
    return out, nbytes, overflow


def grayscale_coefficients(
    image: np.ndarray, config: EncodeConfig
) -> np.ndarray:
    """Run the device transform for a grayscale encode.

    image: uint8 [H, W] luma or [H, W, 3] RGB.
    Returns zigzag levels [nb, 64] int32 (blocks in raster order).
    """
    is_rgb = image.ndim == 3
    h, w = image.shape[:2]
    ph, pw = blocks.padded_dims(h, w)
    # Pad on host (cheap, avoids a second jit cache axis on exact dims).
    if (ph, pw) != (h, w):
        pad = [(0, ph - h), (0, pw - w)] + [(0, 0)] * (image.ndim - 2)
        image = np.pad(image, pad, mode="edge")
    fn = _transform_gray(ph, pw, config, is_rgb)
    return np.asarray(fn(jnp.asarray(image)))


def encode_grayscale(image: np.ndarray, config: EncodeConfig | None = None) -> bytes:
    """Encode an image (uint8 [H, W] or [H, W, 3] RGB) as a baseline
    grayscale JFIF byte string — the reference's capability
    (natural_c saveJPEGGrayscale, jpeg_handler.c:119-282).

    The default path runs the entire pipeline — transform AND entropy
    coding — as one jitted XLA program; only the compressed bytes come
    back to the host. Restart-marker streams currently use the host coder
    (the multi-segment device path lives in jpegtpu.parallel)."""
    config = config or EncodeConfig()
    h, w = image.shape[:2]
    if config.optimize_huffman:
        if config.entropy == "device":
            if not config.restart_interval:
                return _encode_grayscale_optimized_device(image, config)
            return _encode_grayscale_optimized_restart_device(image, config)
        # host 2-pass (entropy="host"). Frequencies are FLOORED — every
        # optimize_huffman path floors (tables.floor_frequencies), so
        # host and device 2-pass outputs stay byte-comparable.
        zz = grayscale_coefficients(image, config)
        seg_ids = (
            np.arange(zz.shape[0]) // config.restart_interval
            if config.restart_interval
            else None
        )
        freqs = tables.floor_frequencies(
            entropy_host.symbol_frequencies(zz, segment_ids=seg_ids)
        )
        specs = tables.optimal_specs_from_frequencies(freqs)
        segments = entropy_host.encode_scan(
            zz, segment_ids=seg_ids, pad_ones=config.pad_ones,
            luts=tables.huffman_luts_from_specs(specs),
        )
        return jfif.assemble(w, h, config, segments, huffman_specs=specs)
    if config.entropy == "device":
        if not config.restart_interval:
            seg = _encode_segment_device(image, config)
            return jfif.assemble(w, h, config, [seg])
        segments = _encode_restart_segments_device(image, config)
        return jfif.assemble(w, h, config, segments)
    zz = grayscale_coefficients(image, config)
    if config.restart_interval:
        seg_ids = np.arange(zz.shape[0]) // config.restart_interval
        segments = entropy_host.encode_scan(
            zz, segment_ids=seg_ids, pad_ones=config.pad_ones
        )
    else:
        segments = entropy_host.encode_scan(zz, pad_ones=config.pad_ones)
    return jfif.assemble(w, h, config, segments)


def gray_concat_mode(ph: int, pw: int, cap: int) -> str:
    """The concat mode _gray_encode_body_raw will compile for this
    geometry (pallas_concat.concat_mode with this body's derived ncg) —
    bench.py reports it instead of re-deriving the decision."""
    from .entropy import pallas_concat
    from .ops import pallas_transform as pt

    kh, kw = pt.padded_dims_kernel(ph, pw)
    return pallas_concat.concat_mode(
        ph // 8, pw // 8, cap, kw // pt.TILE_W
    )


def stitch_geometry(nb: int, seg_blocks: int, cap: int):
    """Static stitch plan for a segmented scan: (n_seg, segs_per_chunk);
    segs_per_chunk == 0 means the stitch is infeasible (fall back to
    per-segment buffers)."""
    from .entropy import pallas_concat

    n_seg = -(-nb // seg_blocks)
    seg128 = -(-seg_blocks // pallas_concat.LANES) * pallas_concat.LANES
    return n_seg, pallas_concat.stitch_plan(n_seg, seg128, cap)


def _gray_restart_body_raw(img, cfg: EncodeConfig, is_rgb: bool, cap: int,
                           seg_blocks: int, spc: int, custom_tables=None):
    """All-Pallas restart-interval grayscale body: the SAME raw chain as
    the flagship single-segment path (_gray_encode_body_raw) — fused
    Pallas transform, fused symbolize+pack — but with the DC predictor
    reset every seg_blocks blocks (T.81 F.1.2.3) and the per-block
    streams stitched into ONE contiguous device buffer of byte-aligned
    restart segments (pallas_concat.stitch_segments_pallas). Returns
    (chunks [n_chunks, W] u32, seg_totals [S] i32, chunk_totals
    [n_chunks] i32, overflow). The host finishes with one speculative
    prefix fetch + native.scan_from_words — no per-segment buffers, no
    full-capacity download (VERDICT r4 #1/#2)."""
    from .entropy import pallas_concat
    from .ops import pallas_transform as pt

    w_raw, b_raw, nbh, nbw, ncg, interp = _gray_raw_front(
        img, cfg, is_rgb, cap, seg_blocks, custom_tables
    )
    nb = nbh * nbw
    n_seg = -(-nb // seg_blocks)
    n_total = n_seg * seg_blocks
    # Relayout to scan order: [cap, nb] words + [nb] bits — small per-
    # block outputs, never the 64-wide levels (the raw-chain rule).
    w_t = pt.raw_to_scan(w_raw, nbh, nbw, ncg)
    bits = pt.raw_to_scan(b_raw[:, None], nbh, nbw, ncg)[0]
    overflow = jnp.any(bits > cap * 32)
    if n_total != nb:
        w_t = jnp.pad(w_t, ((0, 0), (0, n_total - nb)))
        bits = jnp.pad(bits, (0, n_total - nb))
    seg128 = -(-seg_blocks // pallas_concat.LANES) * pallas_concat.LANES
    if seg128 != seg_blocks:
        w_t = jnp.pad(
            w_t.reshape(cap, n_seg, seg_blocks),
            ((0, 0), (0, 0), (0, seg128 - seg_blocks)),
        ).reshape(cap, n_seg * seg128)
        bits = jnp.pad(
            bits.reshape(n_seg, seg_blocks),
            ((0, 0), (0, seg128 - seg_blocks)),
        ).reshape(-1)
    chunks, seg_tot, chunk_tot = pallas_concat.stitch_segments_pallas(
        w_t, bits, seg128, spc, pad_ones=cfg.pad_ones, interpret=interp
    )
    return chunks, seg_tot, chunk_tot, overflow


@functools.lru_cache(maxsize=64)
def _encode_gray_restart_stitched(
    ph: int, pw: int, cfg: EncodeConfig, is_rgb: bool,
    cap_words_per_block: int, seg_blocks: int, spc: int,
):
    """Jitted stitched restart encode (raw Pallas chain end to end)."""

    @jax.jit
    def fn(img):
        return _gray_restart_body_raw(
            img, cfg, is_rgb, cap_words_per_block, seg_blocks, spc
        )

    return fn


def fetch_chunk_prefixes(bufs, overflow_dev, totals_devs, spec_key=None):
    """Speculative one-roundtrip fetch of a flat list of device stream
    buffers: (overflow, the totals arrays, every buffer's speculated
    word prefix) in ONE device_get, with the per-buffer valid word
    counts learned across calls via _spec_history. The FIRST totals
    array must flatten to one bit total per buffer, in bufs order.
    Returns (list of valid-prefix word arrays, tuple of totals np) or
    (None, None) on capacity overflow. Shared engine of fetch_stitched
    and parallel.sharding.fetch_stitched_shards."""
    n = len(bufs)
    hist = _spec_history.get(spec_key) if spec_key is not None else None
    if isinstance(hist, list) and len(hist) == n:
        spec_words = [_spec_bucket(hh + hh // 4) for hh in hist]
    else:
        spec_words = [_SPEC_BYTES // 4] * n
    spec_words = [
        min(sw, int(b.shape[0])) for sw, b in zip(spec_words, bufs)
    ]
    fetched = jax.device_get(
        (overflow_dev, *totals_devs,
         *[bufs[i][: spec_words[i]] for i in range(n)])
    )
    overflow = fetched[0]
    totals_np = tuple(fetched[1 : 1 + len(totals_devs)])
    heads = fetched[1 + len(totals_devs):]
    if bool(overflow):
        return None, None
    nws = [
        (int(t) + 31) // 32 for t in np.asarray(totals_np[0]).reshape(-1)
    ]
    if spec_key is not None:
        _spec_history.pop(spec_key, None)
        _spec_history[spec_key] = nws
        while len(_spec_history) > _SPEC_HISTORY_MAX:
            _spec_history.pop(next(iter(_spec_history)))
    words = []
    for i in range(n):
        if nws[i] <= spec_words[i]:
            words.append(heads[i][: nws[i]])
        else:
            rest = fetch_prefix_words(
                bufs[i][spec_words[i] :], nws[i] - spec_words[i]
            )
            words.append(np.concatenate([heads[i], rest]))
    return words, totals_np


def fetch_stitched(chunks, seg_tot_dev, chunk_tot_dev, overflow_dev,
                   spec_key=None):
    """One-roundtrip speculative fetch for stitched multi-segment output:
    (overflow, per-segment totals, chunk totals, every chunk's word
    prefix) in ONE device_get — the multi-segment twin of
    fetch_stream_words. Returns (list of per-chunk word arrays,
    seg_totals np) or (None, None) on capacity overflow."""
    n_chunks = chunks.shape[0]
    words, totals = fetch_chunk_prefixes(
        [chunks[i] for i in range(n_chunks)], overflow_dev,
        (chunk_tot_dev, seg_tot_dev), spec_key,
    )
    if words is None:
        return None, None
    return words, np.asarray(totals[1])


def scan_from_stitched(words_list, seg_totals: np.ndarray, spc: int,
                       rst_phase: int = 0, trailing: bool = False) -> bytes:
    """Per-chunk word arrays + per-segment bit totals -> the complete
    RST-delimited stuffed scan (marker after global segment j is
    RST((rst_phase + j) % 8)). Native one-pass finish when available,
    numpy fallback otherwise."""
    from . import native
    from .io import jfif

    n_seg = len(seg_totals)
    use_native = native.available()
    parts = []
    for ci, wl in enumerate(words_list):
        lo = ci * spc
        hi = min(lo + spc, n_seg)
        seg_bytes = (seg_totals[lo:hi] // 8).astype(np.int64)
        tr = trailing or hi < n_seg
        if use_native:
            parts.append(native.scan_from_words(
                wl, seg_bytes, rst_phase=(rst_phase + lo) & 7,
                trailing=tr,
            ))
            continue
        be = np.ascontiguousarray(wl).astype(">u4").tobytes()
        off = 0
        for j, nb in enumerate(seg_bytes):
            seg = np.frombuffer(be, np.uint8, count=int(nb), offset=off)
            off += int(nb)
            parts.append(entropy_host.stuff_bytes(seg))
            gi = lo + j
            if gi < n_seg - 1 or trailing:
                parts.append(jfif.rst((rst_phase + gi) & 7))
    return b"".join(parts)


@functools.lru_cache(maxsize=64)
def _encode_gray_restart_device(
    ph: int, pw: int, cfg: EncodeConfig, is_rgb: bool,
    cap_words_per_block: int,
):
    """Jitted restart-interval grayscale encode: N restart segments packed
    as N independent byte-aligned streams in ONE program (T.81 DRI; the
    same per-segment mechanics each mesh shard runs in parallel.sharding,
    here on the segment axis of a single chip). Retained as the fallback
    for capacity rungs past the raw path (cap > 16) and geometries the
    stitch cannot serve; the flagship restart path is
    _encode_gray_restart_stitched."""
    basis_np = cfg.dct_basis()
    qtable_np = cfg.luma_quant.astype(np.float32)
    nb = (ph // 8) * (pw // 8)
    seg_blocks = cfg.restart_interval  # grayscale: 1 MCU == 1 block
    n_seg = -(-nb // seg_blocks)
    n_total = n_seg * seg_blocks

    @jax.jit
    def fn(img):
        zz = _gray_levels(
            img, cfg, jnp.asarray(basis_np), jnp.asarray(qtable_np), is_rgb
        ).astype(jnp.int32)
        if n_total != nb:
            zz = jnp.pad(zz, ((0, n_total - nb), (0, 0)))
        dcd = entropy_device.dc_differences(zz[:, 0], seg_blocks)
        return entropy_device.encode_segments_device(
            zz, seg_blocks, nb, 0, dcd, cap_words_per_block,
            pad_ones=cfg.pad_ones,
        )

    return fn


def segments_from_streams(streams: np.ndarray, totals: np.ndarray) -> list[bytes]:
    """Host finish for segment-parallel device output: slice each
    segment's valid words and byte-stuff (native when available)."""
    out = []
    stuffer = None
    from . import native

    if native.available():
        stuffer = native.words_to_stuffed
    for i in range(streams.shape[0]):
        total_bits = int(totals[i])
        words = streams[i, : (total_bits + 31) // 32]
        if stuffer is not None:
            out.append(stuffer(words, total_bits))
        else:
            raw = np.frombuffer(
                words.astype(">u4").tobytes(), np.uint8
            )[: (total_bits + 7) // 8]
            out.append(entropy_host.stuff_bytes(np.asarray(raw)))
    return out


def _encode_restart_segments_device(
    image: np.ndarray, config: EncodeConfig
) -> list[bytes]:
    """Device encode honoring restart_interval on one chip: returns the
    per-segment entropy byte strings (or ONE pre-joined RST-delimited
    scan — the stitched fast path) for jfif.assemble."""
    is_rgb = image.ndim == 3
    h, w = image.shape[:2]
    ph, pw = blocks.padded_dims(h, w)
    if (ph, pw) != (h, w):
        pad = [(0, ph - h), (0, pw - w)] + [(0, 0)] * (image.ndim - 2)
        image = np.pad(image, pad, mode="edge")
    img_dev = jnp.asarray(image)
    key = (ph, pw, config, is_rgb, "restart")
    nb = (ph // 8) * (pw // 8)
    seg_blocks = config.restart_interval
    for cap in capacity_ladder(config, key):
        spc = stitch_geometry(nb, seg_blocks, cap)[1] if cap <= 16 else 0
        if spc:
            # Flagship path: raw Pallas chain + device stitch -> one
            # buffer, one speculative fetch, one native scan pass.
            fn = _encode_gray_restart_stitched(
                ph, pw, config, is_rgb, cap, seg_blocks, spc
            )
            chunks, seg_tot, chunk_tot, overflow = fn(img_dev)
            words, seg_np = fetch_stitched(
                chunks, seg_tot, chunk_tot, overflow,
                spec_key=(ph, pw, config, is_rgb, "restart"),
            )
            if words is not None:
                record_cap(key, cap)
                return [scan_from_stitched(words, seg_np, spc)]
            continue
        fn = _encode_gray_restart_device(ph, pw, config, is_rgb, cap)
        streams, totals, overflow = fn(img_dev)
        if not bool(overflow):
            record_cap(key, cap)
            streams, totals = jax.device_get((streams, totals))
            return segments_from_streams(streams, totals)
    raise AssertionError("worst-case entropy capacity overflowed (bug)")


_CAP_HISTORY_MAX = 4096
_CAP_DECAY_PERIOD = 32  # encodes between one-rung-lower probes
_cap_history: dict = {}  # encode-site key -> [last rung that fit, uses]


def capacity_ladder(
    config: EncodeConfig, key=None
) -> tuple[int, ...]:
    """Overflow-retry capacity schedule (words per block): the configured
    heuristic, then a middle bucket, then the absolute worst case. The
    middle bucket (16 words = 8 bpp, still fused-kernel eligible) caps the
    worst-case capacity jump for pathological content at ~2x instead of
    the 6.6x straight to MAX_WORDS_PER_BLOCK.

    key: optional encode-site key (shape + config). When content at this
    site previously overflowed the heuristic rung, the ladder starts at
    the rung that fit (`record_cap`) — recurring pathological content
    (a serving stream of Q=1 noise) pays the retry dispatch ONCE, not
    per image. Normal content never bumps, so the history is inert for
    it. The remembered rung DECAYS: every _CAP_DECAY_PERIOD encodes the
    ladder probes one rung lower, so a single pathological image cannot
    pin the site at a worst-case rung (or demote optimized/raw paths,
    which cap at 16) for the process lifetime."""
    start = config.capacity_words_per_block
    if key is not None:
        ent = _cap_history.get(key)
        if ent is not None:
            rung, uses = ent
            ent[1] = uses + 1
            if rung > start and uses % _CAP_DECAY_PERIOD == _CAP_DECAY_PERIOD - 1:
                rung = _rung_below(rung, start)
            start = max(start, rung)
    ladder = [start]
    if ladder[-1] < 16:
        ladder.append(16)
    if ladder[-1] < entropy_device.MAX_WORDS_PER_BLOCK:
        ladder.append(entropy_device.MAX_WORDS_PER_BLOCK)
    return tuple(ladder)


def _rung_below(rung: int, start: int) -> int:
    """The ladder rung one below `rung` for a config whose heuristic rung
    is `start` (the ladder is start < 16 < MAX_WORDS_PER_BLOCK)."""
    if rung > 16:
        return max(16, start)
    return start


def record_cap(key, cap: int) -> None:
    """Remember the capacity rung that fit at this encode site (LRU
    bounded; a serving process must not leak). A success at a LOWER rung
    than remembered (the periodic decay probe) overwrites it — the
    history tracks current content, not the worst image ever seen."""
    if key is None:
        return
    ent = _cap_history.pop(key, None)
    uses = ent[1] if ent is not None else 0
    _cap_history[key] = [cap, uses]
    while len(_cap_history) > _CAP_HISTORY_MAX:
        _cap_history.pop(next(iter(_cap_history)))


_SPEC_BYTES = 1 << 21  # default speculation when no history exists
_SPEC_HISTORY_MAX = 4096  # LRU bound: a serving process must not leak
_spec_history: dict = {}  # fetch-site key -> last stream words (adaptive)


def _spec_bucket(words: int) -> int:
    """Round a word count up to a ~1.5x-geometric bucket so only O(20)
    distinct slice executables ever compile."""
    b = 1 << 14  # 64 KB
    while b < words:
        b = b * 3 // 2
    return b


def fetch_stream_words(buf, total_bits_dev, overflow_dev, spec_key=None):
    """One-roundtrip fetch of (overflow, total_bits, stream words).

    Through a remote device transport every host<->device interaction
    costs a fixed round trip (~30 ms here) and bandwidth is scarce, so
    reading overflow + length first and the valid prefix second triples
    the latency, while downloading a fixed worst-case prefix wastes
    bandwidth. Fetch everything in ONE device_get with a speculative
    prefix sized from the previous stream at this fetch site (same
    image shape/config -> almost identical size); only streams larger
    than the speculation pay a second fetch.
    Returns (words or None-if-overflowed, total_bits)."""
    hist = _spec_history.get(spec_key) if spec_key is not None else None
    if hist is None:
        spec_words = _SPEC_BYTES // 4
    else:
        spec_words = _spec_bucket(hist + hist // 4)
    spec_words = min(spec_words, buf.shape[0])
    overflow, total_bits, head = jax.device_get(
        (overflow_dev, total_bits_dev, buf[:spec_words])
    )
    if bool(overflow):
        return None, 0
    total_bits = int(total_bits)
    nwords = (total_bits + 31) // 32
    if spec_key is not None:
        _spec_history.pop(spec_key, None)  # re-insert = move to MRU end
        _spec_history[spec_key] = nwords
        while len(_spec_history) > _SPEC_HISTORY_MAX:
            _spec_history.pop(next(iter(_spec_history)))
    if nwords <= spec_words:
        return head[:nwords], total_bits
    rest = fetch_prefix_words(buf[spec_words:], nwords - spec_words)
    return np.concatenate([head, rest]), total_bits


def fetch_prefix(buf, nbytes: int) -> np.ndarray:
    """Download only the valid prefix of a device byte buffer.

    Slices to a power-of-two bucket first so at most ~log2(cap) distinct
    slice executables ever compile, then trims on host. Downloading the
    full capacity buffer costs more than the encode itself for large
    images (the capacity is ~12x the typical stream size)."""
    k = int(nbytes)
    if k <= 0:
        return np.empty((0,), np.uint8)
    bucket = 1 << max(12, (k - 1).bit_length())
    if bucket >= buf.shape[0]:
        return np.asarray(buf)[:k]
    return np.asarray(buf[:bucket])[:k]


def _encode_segment_device(image: np.ndarray, config: EncodeConfig) -> bytes:
    """Single-segment fully-on-device encode with capacity-overflow retry."""
    is_rgb = image.ndim == 3
    h, w = image.shape[:2]
    ph, pw = blocks.padded_dims(h, w)
    if (ph, pw) != (h, w):
        pad = [(0, ph - h), (0, pw - w)] + [(0, 0)] * (image.ndim - 2)
        image = np.pad(image, pad, mode="edge")
    img_dev = jnp.asarray(image)
    host_stuff = config.stuff == "host" and _native_available()
    key = (ph, pw, config, is_rgb)
    for cap in capacity_ladder(config, key):
        fn = _encode_gray_device(
            ph, pw, config, is_rgb, cap, stuff=not host_stuff,
        )
        out, count, overflowed = fn(img_dev)
        if host_stuff:
            from . import native

            words, total_bits = fetch_stream_words(
                out, count, overflowed, spec_key=(ph, pw, config, is_rgb)
            )
            if words is not None:
                record_cap(key, cap)
                return native.words_to_stuffed(words, total_bits)
        elif not bool(overflowed):
            record_cap(key, cap)
            return fetch_prefix(out, count).tobytes()
    raise AssertionError("worst-case entropy capacity overflowed (bug)")


def _gray_levels_raw_scan(img, cfg: EncodeConfig, is_rgb: bool):
    """Scan-order levels [nb, 64] computed by the SAME Pallas transform
    kernel the raw encode path uses (_gray_encode_body_raw). Pass 1 of
    2-pass optimal coding must histogram exactly the levels pass 2
    encodes: the XLA and Pallas float pipelines can split rounding ties,
    and a symbol with pass-1 frequency 0 would get no code — a silently
    corrupt stream. The [64]-minor relayout this costs runs once, in the
    cheap stats dispatch."""
    from .ops import color as color_ops, pallas_transform as pt

    y = color_ops.rgb_to_y_reference(img) if is_rgb else img
    h, w = y.shape
    nbh, nbw = h // 8, w // 8
    kh, kw = pt.padded_dims_kernel(h, w)
    if (kh, kw) != (h, w):
        y = jnp.pad(y, ((0, kh - h), (0, kw - w)))
    ncg = kw // pt.TILE_W
    interp = jax.default_backend() == "cpu"
    int_mode = cfg.dct_dtype == "int32"
    qtable_np = cfg.luma_quant.astype(
        np.int32 if int_mode else np.float32
    )
    raw = pt.transform_plane_raw(
        y, jnp.asarray(qtable_np), cfg.bitexact, interpret=interp,
        int_mode=int_mode,
    )
    return pt.raw_to_scan(raw, nbh, nbw, ncg).T


@functools.lru_cache(maxsize=32)
def _gray_stats_fn(ph: int, pw: int, cfg: EncodeConfig, is_rgb: bool):
    """Jitted pass 1 of device 2-pass optimal coding: image -> symbol
    count tensors (entropy_device.symbol_histograms) — levels from the
    raw Pallas transform, byte-identical to what pass 2 encodes."""

    @jax.jit
    def fn(img):
        zz = _gray_levels_raw_scan(img, cfg, is_rgb).astype(jnp.int32)
        return entropy_device.symbol_histograms(zz)

    return fn


@functools.lru_cache(maxsize=32)
def _encode_gray_device_rt(
    ph: int, pw: int, cfg: EncodeConfig, is_rgb: bool,
    cap_words_per_block: int, stuff: bool,
):
    """Jitted full device encode with RUNTIME Huffman tables (one
    compiled program serves every table set)."""

    @jax.jit
    def fn(img, tabs):
        return gray_encode_body(
            img, cfg, is_rgb, cap_words_per_block, stuff,
            custom_tables=tabs,
        )

    return fn


def _encode_grayscale_optimized_device(
    image: np.ndarray, config: EncodeConfig
) -> bytes:
    """Device-speed 2-pass optimal-table encode: pass 1 jit gathers
    per-class symbol histograms (~2 KB download), the host builds
    package-merge tables, pass 2 jit re-encodes with the tables as
    RUNTIME data — two dispatches total, no coefficient download."""
    from .entropy import pallas_pack

    is_rgb = image.ndim == 3
    h, w = image.shape[:2]
    ph, pw = blocks.padded_dims(h, w)
    if (ph, pw) != (h, w):
        pad = [(0, ph - h), (0, pw - w)] + [(0, 0)] * (image.ndim - 2)
        image = np.pad(image, pad, mode="edge")
    img_dev = jnp.asarray(image)
    stats = jax.device_get(_gray_stats_fn(ph, pw, config, is_rgb)(img_dev))
    # FLOORED frequencies (tables.floor_frequencies): pass 1 and pass 2
    # are separately compiled programs, and every optimize_huffman path
    # floors uniformly so host/device 2-pass outputs stay byte-equal.
    freqs = tables.floor_frequencies(
        entropy_device.assemble_histograms(stats)
    )
    specs = {
        k: tables.optimal_spec(freqs[k]) for k in ("dc_lum", "ac_lum")
    }
    luts = tables.huffman_luts_from_specs(specs)
    tabs = jnp.asarray(
        pallas_pack.pack_runtime_tables(
            luts["dc_lum"][0], luts["dc_lum"][1],
            luts["ac_lum"][0], luts["ac_lum"][1],
        )
    )
    host_stuff = config.stuff == "host" and _native_available()
    key = (ph, pw, config, is_rgb, "opt")
    for cap in capacity_ladder(config, key):
        if cap > 16:
            break  # runtime tables ride the raw path only
        fn = _encode_gray_device_rt(
            ph, pw, config, is_rgb, cap, not host_stuff
        )
        out, count, overflowed = fn(img_dev, tabs)
        if host_stuff:
            from . import native

            words, total_bits = fetch_stream_words(
                out, count, overflowed, spec_key=(ph, pw, config, is_rgb, "opt")
            )
            if words is not None:
                record_cap(key, cap)
                seg = native.words_to_stuffed(words, total_bits)
                return jfif.assemble(w, h, config, [seg],
                                     huffman_specs=specs)
        elif not bool(overflowed):
            record_cap(key, cap)
            seg = fetch_prefix(out, count).tobytes()
            return jfif.assemble(w, h, config, [seg], huffman_specs=specs)
    # Pathological content past the raw-path capacity: host 2-pass. The
    # host coder encodes XLA-path levels, so its tables must come from
    # THOSE levels (the device histograms above describe the Pallas
    # levels — a tie-split would leave a symbol with no code).
    zz = grayscale_coefficients(image, config)
    freqs = tables.floor_frequencies(entropy_host.symbol_frequencies(zz))
    specs = {k: tables.optimal_spec(freqs[k]) for k in ("dc_lum", "ac_lum")}
    segments = entropy_host.encode_scan(
        zz, pad_ones=config.pad_ones,
        luts=tables.huffman_luts_from_specs(specs),
    )
    return jfif.assemble(w, h, config, segments, huffman_specs=specs)


@functools.lru_cache(maxsize=32)
def _gray_restart_stats_fn(ph: int, pw: int, cfg: EncodeConfig,
                           is_rgb: bool, raw: bool = False):
    """Pass 1 of device 2-pass optimal coding WITH restart intervals:
    symbol histograms with the DC predictor reset at each segment start;
    pad blocks beyond the last real MCU are excluded via the valid mask.
    raw=True histograms the RAW Pallas-transform levels — mandatory when
    pass 2 rides the stitched raw chain, since XLA/Pallas float
    pipelines can split rounding ties and a symbol with pass-1 frequency
    0 would get no code (see _gray_levels_raw_scan)."""
    basis_np = cfg.dct_basis()
    qtable_np = cfg.luma_quant.astype(np.float32)
    nb = (ph // 8) * (pw // 8)
    seg_blocks = cfg.restart_interval
    n_total = -(-nb // seg_blocks) * seg_blocks

    @jax.jit
    def fn(img):
        if raw:
            zz = _gray_levels_raw_scan(img, cfg, is_rgb).astype(jnp.int32)
        else:
            zz = _gray_levels(
                img, cfg, jnp.asarray(basis_np), jnp.asarray(qtable_np),
                is_rgb,
            ).astype(jnp.int32)
        if n_total != nb:
            zz = jnp.pad(zz, ((0, n_total - nb), (0, 0)))
        dcd = entropy_device.dc_differences(zz[:, 0], seg_blocks)
        valid = jnp.arange(n_total) < nb
        return entropy_device.symbol_histograms(zz, dc_diff=dcd, valid=valid)

    return fn


@functools.lru_cache(maxsize=32)
def _encode_gray_restart_stitched_rt(
    ph: int, pw: int, cfg: EncodeConfig, is_rgb: bool,
    cap_words_per_block: int, seg_blocks: int, spc: int,
):
    """_encode_gray_restart_stitched with RUNTIME Huffman tables — pass 2
    of restart-interval 2-pass optimal coding on the stitched raw chain."""

    @jax.jit
    def fn(img, tabs):
        return _gray_restart_body_raw(
            img, cfg, is_rgb, cap_words_per_block, seg_blocks, spc,
            custom_tables=tabs,
        )

    return fn


@functools.lru_cache(maxsize=32)
def _encode_gray_restart_device_rt(
    ph: int, pw: int, cfg: EncodeConfig, is_rgb: bool,
    cap_words_per_block: int,
):
    """_encode_gray_restart_device with RUNTIME Huffman tables — pass 2
    of restart-interval 2-pass optimal coding (the single-chip analog of
    parallel.sharding._sharded_encode_fn_rt)."""
    basis_np = cfg.dct_basis()
    qtable_np = cfg.luma_quant.astype(np.float32)
    nb = (ph // 8) * (pw // 8)
    seg_blocks = cfg.restart_interval
    n_seg = -(-nb // seg_blocks)
    n_total = n_seg * seg_blocks

    @jax.jit
    def fn(img, tabs):
        zz = _gray_levels(
            img, cfg, jnp.asarray(basis_np), jnp.asarray(qtable_np), is_rgb
        ).astype(jnp.int32)
        if n_total != nb:
            zz = jnp.pad(zz, ((0, n_total - nb), (0, 0)))
        dcd = entropy_device.dc_differences(zz[:, 0], seg_blocks)
        return entropy_device.encode_segments_device(
            zz, seg_blocks, nb, 0, dcd, cap_words_per_block,
            pad_ones=cfg.pad_ones, custom_tables=(tabs,),
        )

    return fn


def _encode_grayscale_optimized_restart_device(
    image: np.ndarray, config: EncodeConfig
) -> bytes:
    """Device-speed 2-pass optimal encode honoring restart_interval:
    pass 1 histograms with per-segment DC chains, pass 2 packs the
    restart segments with the tables as runtime data — same machinery
    the sharded path proves (sharding._sharded_encode_fn_rt), on one
    chip. Falls back to the host 2-pass past the fused-path capacity."""
    from .entropy import pallas_pack

    is_rgb = image.ndim == 3
    h, w = image.shape[:2]
    ph, pw = blocks.padded_dims(h, w)
    if (ph, pw) != (h, w):
        pad = [(0, ph - h), (0, pw - w)] + [(0, 0)] * (image.ndim - 2)
        image = np.pad(image, pad, mode="edge")
    img_dev = jnp.asarray(image)
    nb = (ph // 8) * (pw // 8)
    seg_blocks = config.restart_interval
    # The stitched raw chain serves pass 2 when its plan is feasible at
    # every fused-path rung; pass 1 then histograms the SAME raw levels
    # (tie-splits between transform pipelines must never reach a symbol
    # whose pass-1 frequency was floored to zero).
    use_raw = all(
        stitch_geometry(nb, seg_blocks, c)[1] > 0 for c in (8, 16)
    )
    stats = jax.device_get(
        _gray_restart_stats_fn(ph, pw, config, is_rgb, raw=use_raw)(img_dev)
    )
    # FLOORED: two separately compiled programs (see floor_frequencies)
    freqs = tables.floor_frequencies(
        entropy_device.assemble_histograms(stats)
    )
    specs = {k: tables.optimal_spec(freqs[k]) for k in ("dc_lum", "ac_lum")}
    luts = tables.huffman_luts_from_specs(specs)
    tabs = jnp.asarray(
        pallas_pack.pack_runtime_tables(
            luts["dc_lum"][0], luts["dc_lum"][1],
            luts["ac_lum"][0], luts["ac_lum"][1],
        )
    )
    key = (ph, pw, config, is_rgb, "restart-opt")
    for cap in capacity_ladder(config, key):
        if cap > 16:
            break  # runtime tables ride the fused path only
        if use_raw:
            spc = stitch_geometry(nb, seg_blocks, cap)[1]
            fn = _encode_gray_restart_stitched_rt(
                ph, pw, config, is_rgb, cap, seg_blocks, spc
            )
            chunks, seg_tot, chunk_tot, overflow = fn(img_dev, tabs)
            words, seg_np = fetch_stitched(
                chunks, seg_tot, chunk_tot, overflow,
                spec_key=(ph, pw, config, is_rgb, "restart-opt"),
            )
            if words is not None:
                record_cap(key, cap)
                scan = scan_from_stitched(words, seg_np, spc)
                return jfif.assemble(w, h, config, [scan],
                                     huffman_specs=specs)
            continue
        fn = _encode_gray_restart_device_rt(ph, pw, config, is_rgb, cap)
        streams, totals, overflow = fn(img_dev, tabs)
        if not bool(overflow):
            record_cap(key, cap)
            streams, totals = jax.device_get((streams, totals))
            segments = segments_from_streams(streams, totals)
            return jfif.assemble(w, h, config, segments,
                                 huffman_specs=specs)
    # Pathological content past the fused-path capacity: host 2-pass
    # (tables rebuilt from the host coder's own XLA-path levels).
    zz = grayscale_coefficients(image, config)
    seg_ids = np.arange(zz.shape[0]) // config.restart_interval
    freqs = tables.floor_frequencies(
        entropy_host.symbol_frequencies(zz, segment_ids=seg_ids)
    )
    specs = {k: tables.optimal_spec(freqs[k]) for k in ("dc_lum", "ac_lum")}
    segments = entropy_host.encode_scan(
        zz, segment_ids=seg_ids, pad_ones=config.pad_ones,
        luts=tables.huffman_luts_from_specs(specs),
    )
    return jfif.assemble(w, h, config, segments, huffman_specs=specs)


def _native_available() -> bool:
    from . import native

    return native.available()


def fetch_prefix_words(buf, nwords: int) -> np.ndarray:
    """Prefix download for uint32 word buffers (pow-2 bucketed slices)."""
    k = int(nwords)
    if k <= 0:
        return np.empty((0,), np.uint32)
    bucket = 1 << max(10, (k - 1).bit_length())
    if bucket >= buf.shape[0]:
        return np.asarray(buf)[:k]
    return np.asarray(buf[:bucket])[:k]


def encode_file(input_path: str, output_path: str, config: EncodeConfig | None = None) -> int:
    """BMP in, JPEG out (the reference CLI's contract, natural_c main.c:4-35).
    Returns the number of bytes written."""
    rgb = bmp.read(input_path)
    config = config or EncodeConfig()
    if config.subsampling == "gray":
        data = encode_grayscale(rgb, config)
    else:
        from . import color_pipeline  # deferred: heavier path

        data = color_pipeline.encode_color(rgb, config)
    with open(output_path, "wb") as f:
        f.write(data)
    return len(data)

"""Per-stage profiling harness — the reference's cycle report, TPU-style.

The reference reads the C7x __TSC counter around every pipeline stage and
prints a per-stage cycle table (dsp jpeg_compression.c:125-186, host
pretty-printer main.c:137-172). XLA fuses our stages into one program, so
per-stage numbers require running staged sub-programs: this harness jits
successive PREFIXES of the production encode body and reports deltas.

Device rows are measured dispatch-floor-free with the chain-delta trick
(time a program that runs the prefix k times on perturbed inputs, minus
a 1x run, divided by k-1) — on a tunneled device the fixed ~30 ms
dispatch otherwise swamps every stage. The host row (stream download +
native byte stuffing) is wall-clock, since that's what production pays.

For real kernel-level traces use `jax.profiler.trace(logdir)` around
`encode_*` and open the Perfetto/TensorBoard view; this module is the
lightweight always-available equivalent of the reference's printf report.
"""
from __future__ import annotations

import dataclasses
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from .config import EncodeConfig
from .entropy import device as entropy_device
from .ops import blocks
from . import pipeline


@dataclasses.dataclass
class StageTiming:
    name: str
    total_ms: float  # cumulative prefix time
    stage_ms: float  # delta attributed to this stage
    mpix_per_s: float


def _chain_ms(body, img_dev, reps: int, k: int = 3) -> float:
    """Dispatch-floor-free time of one `body(img)` evaluation."""

    def chain(n):
        @jax.jit
        def fn(img):
            tot = jnp.float32(0)
            for i in range(n):
                r = body(img ^ jnp.uint8(i))
                tot = tot + sum(
                    jnp.sum(x, dtype=jnp.float32) for x in jax.tree.leaves(r)
                )
            return tot

        return fn

    f1, fk = chain(1), chain(k)
    jax.device_get((f1(img_dev), fk(img_dev)))  # compile + warm

    def t(f):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(f(img_dev))
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    return max((t(fk) - t(f1)) / (k - 1), 1e-9) * 1000


def _rows_from_prefixes(prefixes, img_dev, mpix: float, reps: int):
    results, prev = [], 0.0
    for name, body in prefixes:
        # clamp to monotone: chain-delta noise at sub-ms stages can
        # produce a cumulative reading below the previous prefix
        total = max(_chain_ms(body, img_dev, reps), prev)
        results.append(
            StageTiming(
                name=name,
                total_ms=round(total, 2),
                stage_ms=round(total - prev, 2),
                mpix_per_s=(
                    round(mpix / (total / 1000), 1) if total > 1e-6 else 0.0
                ),
            )
        )
        prev = total
    return results


def profile_encode(
    image: np.ndarray, config: EncodeConfig | None = None, reps: int = 5
) -> list[StageTiming]:
    """Stage-attributed timings of the PRODUCTION grayscale device encode
    (the exact default path of pipeline.encode_grayscale: fused Pallas
    transform-to-levels kernel -> DC-diff relayouts -> fused Pallas
    symbolize+pack -> Pallas deposit/stream concat (or the XLA tree above
    the VMEM gate) -> host-native byte stuffing)."""
    from .ops import color as color_ops, pallas_transform as pt

    config = config or EncodeConfig()
    is_rgb = image.ndim == 3
    h, w = image.shape[:2]
    ph, pw = blocks.padded_dims(h, w)
    if (ph, pw) != (h, w):
        pad = [(0, ph - h), (0, pw - w)] + [(0, 0)] * (image.ndim - 2)
        image = np.pad(image, pad, mode="edge")
    cap = config.capacity_words_per_block
    mpix = h * w / 1e6
    raw_gate = config.dct_dtype != "int32" and cap <= 16
    img_dev = jnp.asarray(image)

    interp = jax.default_backend() == "cpu"
    if raw_gate:
        nbh, nbw = ph // 8, pw // 8
        kh, kw = pt.padded_dims_kernel(ph, pw)
        ncg = kw // pt.TILE_W
        qt = jnp.asarray(config.luma_quant.astype(np.float32))

        def tx(img):
            y = color_ops.rgb_to_y_reference(img) if is_rgb else img
            if (kh, kw) != (ph, pw):
                y = jnp.pad(y, ((0, kh - ph), (0, kw - pw)))
            return pt.transform_plane_raw(
                y, qt, config.bitexact, interpret=interp
            )

        def dc(img):
            raw = tx(img)
            dc_scan = pt.raw_to_scan(raw[:, :1], nbh, nbw, ncg)[0]
            dcd = entropy_device.dc_differences(dc_scan, 0)
            return raw, pt.scan_to_raw(dcd, nbh, nbw, ncg)

        def pack(img):
            from .entropy import pallas_pack

            raw, dcd_raw = dc(img)
            w_, b_, _ = pallas_pack.encode_blocks_pallas(
                raw, dcd_raw, cap=cap, table=0, interpret=interp, raw=True
            )
            return w_, b_

        def full(img):
            words, count, _ = pipeline.gray_encode_body(
                img, config, is_rgb, cap, False
            )
            return words, count

        prefixes = [
            ("transform", tx),
            ("dc diff", dc),
            ("block pack", pack),
            ("concat", full),
        ]
    else:
        basis = jnp.asarray(config.dct_basis())
        qt = jnp.asarray(config.luma_quant.astype(np.float32))

        def levels(img):
            return pipeline._gray_levels(img, config, basis, qt, is_rgb)

        def block_pack(img):
            zz = levels(img).astype(jnp.int32)
            dcd = entropy_device.dc_differences(zz[:, 0], 0)
            return entropy_device._per_block_words(zz, 0, dcd, cap)

        def full(img):
            words, count, _ = pipeline.gray_encode_body(
                img, config, is_rgb, cap, False
            )
            return words, count

        prefixes = [
            ("transform", levels),
            ("block pack", block_pack),
            ("concat", full),
        ]

    results = _rows_from_prefixes(prefixes, img_dev, mpix, reps)

    # Host finish: stream download + native stuffing (production tail);
    # wall-clock because production pays the transport here.
    fbody = jax.jit(
        lambda img: pipeline.gray_encode_body(img, config, is_rgb, cap,
                                              False)
    )
    out, count, ovf = fbody(img_dev)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        words, total_bits = pipeline.fetch_stream_words(
            out, count, ovf, spec_key=(ph, pw, "profile")
        )
        if words is not None:
            from . import native

            if native.available():
                native.words_to_stuffed(words, total_bits)
        ts.append(time.perf_counter() - t0)
    host_ms = min(ts) * 1000
    total = results[-1].total_ms + host_ms
    results.append(
        StageTiming(
            name="fetch+stuff(host)",
            total_ms=round(total, 2),
            stage_ms=round(host_ms, 2),
            mpix_per_s=round(mpix / (total / 1000), 1),
        )
    )
    return results


def profile_encode_color(
    image: np.ndarray, config: EncodeConfig | None = None, reps: int = 5
) -> list[StageTiming]:
    """Stage-attributed timings of the production color encode (the
    default all-Pallas natural-layout body of color_pipeline.encode_color:
    convert+subsample -> transforms -> packs -> MCU interleave merge ->
    concat)."""
    from . import color_pipeline as cp
    from .ops import color, pallas_transform as pt

    config = config or EncodeConfig(subsampling="420")
    h, w = image.shape[:2]
    ph, pw = cp.padded_dims_color(h, w, config.subsampling)
    if image.ndim == 2:
        image = np.repeat(image[..., None], 3, axis=-1)
    if (ph, pw) != (h, w):
        image = np.pad(image, [(0, ph - h), (0, pw - w), (0, 0)],
                       mode="edge")
    image = np.ascontiguousarray(np.moveaxis(image, -1, 0))  # planar
    cap = config.capacity_words_per_block
    mpix = h * w / 1e6
    img_dev = jnp.asarray(image)
    raw_gate = config.dct_dtype != "int32" and cap <= 16
    interp = jax.default_backend() == "cpu"

    if raw_gate:
        fy = 2 if config.subsampling == "420" else 1
        fx = 1 if config.subsampling == "444" else 2
        qtl = jnp.asarray(config.luma_quant.astype(np.float32))
        qtc = jnp.asarray(config.chroma_quant.astype(np.float32))

        def planes(img):
            y, cb, cr = color.rgb_planar_to_ycbcr(img)
            if config.subsampling == "420":
                cb, cr = color.subsample_420(cb), color.subsample_420(cr)
            elif config.subsampling == "422":
                cb, cr = color.subsample_422(cb), color.subsample_422(cr)
            mh, mw = cb.shape
            kh, kw = pt.padded_dims_kernel(mh, mw)
            yh, yw = y.shape
            if (kh, kw) != (mh, mw):
                cb = jnp.pad(cb, ((0, kh - mh), (0, kw - mw)))
                cr = jnp.pad(cr, ((0, kh - mh), (0, kw - mw)))
            if (fy * kh, fx * kw) != (yh, yw):
                y = jnp.pad(y, ((0, fy * kh - yh), (0, fx * kw - yw)))
            return y, cb, cr

        def tx(img):
            y, cb, cr = planes(img)
            raw_y = pt.transform_plane_raw(
                y, qtl, config.bitexact, interpret=interp
            )
            raw_c = pt.transform_plane_raw(
                jnp.concatenate([cb, cr]), qtc, config.bitexact,
                interpret=interp,
            )
            return raw_y, raw_c

        def full(img):
            words, count, _ = cp.color_encode_body(img, config, cap, False)
            return words, count

        prefixes = [
            ("convert+subsmp", planes),
            ("transforms", tx),
            ("pack+merge+cat", full),
        ]
    else:
        gather_idx, table_sel, comp_id = cp._scan_layout(
            ph, pw, config.subsampling
        )
        basis = jnp.asarray(config.dct_basis())
        qtl = jnp.asarray(config.luma_quant.astype(np.float32))
        qtc = jnp.asarray(config.chroma_quant.astype(np.float32))

        def levels(img):
            return cp._color_levels(img, config, basis, qtl, qtc)

        def full(img):
            words, count, _ = cp.color_encode_body(img, config, cap, False)
            return words, count

        prefixes = [("convert+dct", levels), ("pack+concat", full)]

    return _rows_from_prefixes(prefixes, img_dev, mpix, reps)


def format_report(stages: list[StageTiming], h: int, w: int) -> str:
    """Pretty table, the analog of the reference's print_profiling_stats
    (dsp main.c:137-172)."""
    lines = [f"encode profile {w}x{h} ({h * w / 1e6:.2f} MPix)"]
    lines.append(
        f"{'stage':<16}{'stage ms':>10}{'cum ms':>10}{'cum MPix/s':>12}"
    )
    for s in stages:
        lines.append(
            f"{s.name:<16}{s.stage_ms:>10.2f}{s.total_ms:>10.2f}"
            f"{s.mpix_per_s:>12.1f}"
        )
    return "\n".join(lines)

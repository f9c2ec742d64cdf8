"""Per-stage profiling harness — the reference's cycle report, TPU-style.

The reference reads the C7x __TSC counter around every pipeline stage and
prints a per-stage cycle table (dsp jpeg_compression.c:125-186, host
pretty-printer main.c:137-172). XLA fuses our stages into one program, so
per-stage numbers require running staged sub-programs: this harness jits
successive pipeline PREFIXES and reports deltas — the standard way to
attribute time inside a fused XLA pipeline without a hardware trace.

For real kernel-level traces use `jax.profiler.trace(logdir)` around
`encode_*` and open the Perfetto/ TensorBoard view; this module is the
lightweight always-available equivalent of the reference's printf report.
"""
from __future__ import annotations

import dataclasses
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


def profile_encode(
    image: np.ndarray, config: EncodeConfig | None = None, reps: int = 5
) -> list[StageTiming]:
    """Stage-attributed timings of the PRODUCTION grayscale device encode
    (the exact default path of pipeline.encode_grayscale: fused transform
    -> fused Pallas symbolize+pack kernel -> across-block concat tree ->
    host-native byte stuffing).

    Device rows are timed as jitted pipeline prefixes (deltas attribute
    each stage); the final row times the HOST finish (prefix download +
    native C++ stuffing), which runs off-device in production.
    """
    config = config or EncodeConfig()
    is_rgb = image.ndim == 3
    h, w = image.shape[:2]
    ph, pw = blocks.padded_dims(h, w)
    if (ph, pw) != (h, w):
        pad = [(0, ph - h), (0, pw - w)] + [(0, 0)] * (image.ndim - 2)
        image = np.pad(image, pad, mode="edge")
    cap = config.capacity_words_per_block
    basis_np = config.dct_basis()
    qt_np = config.luma_quant.astype(np.float32)

    def levels(img):
        return pipeline._gray_levels(
            img, config, jnp.asarray(basis_np), jnp.asarray(qt_np), is_rgb
        )

    def block_pack(img):
        zz = levels(img).astype(jnp.int32)
        dcd = entropy_device.dc_differences(zz[:, 0], 0)
        return entropy_device._per_block_words(zz, 0, dcd, cap)

    def concat(img):
        zz = levels(img)
        nb = zz.shape[0]
        return entropy_device.encode_scan_device(
            zz, capacity_words=nb * cap, pad_ones=config.pad_ones,
            stuff=False,
        )

    img_dev = jnp.asarray(image)
    results = []
    prev = 0.0
    for name, fraw in (
        ("transform", levels),
        ("block_pack", block_pack),
        ("concat", concat),
    ):
        f = jax.jit(fraw)
        jax.block_until_ready(jax.device_get(f(img_dev)))  # compile+warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(jax.tree.map(lambda x: x.sum() if x.ndim else x, f(img_dev)))
            ts.append(time.perf_counter() - t0)
        total = min(ts) * 1000
        results.append(
            StageTiming(
                name=name,
                total_ms=round(total, 2),
                stage_ms=round(total - prev, 2),
                mpix_per_s=round(h * w / (total / 1000) / 1e6, 1),
            )
        )
        prev = total

    # Host finish: stream download + native stuffing (production tail).
    f = jax.jit(concat)
    out, count, ovf = f(img_dev)
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
    total = prev + host_ms
    results.append(
        StageTiming(
            name="fetch+stuff(host)",
            total_ms=round(total, 2),
            stage_ms=round(host_ms, 2),
            mpix_per_s=round(h * w / (total / 1000) / 1e6, 1),
        )
    )
    return results


def profile_encode_color(
    image: np.ndarray, config: EncodeConfig | None = None, reps: int = 5
) -> list[StageTiming]:
    """Stage-attributed timings of the production 4:2:0/4:4:4 color
    encode: convert+transform (all three components), fused multi-table
    block pack, across-block concat, host finish."""
    from . import color_pipeline as cp

    config = config or EncodeConfig(subsampling="420")
    h, w = image.shape[:2]
    ph, pw = cp.padded_dims_color(h, w, config.subsampling)
    if image.ndim == 2:
        image = np.repeat(image[..., None], 3, axis=-1)
    if (ph, pw) != (h, w):
        image = np.pad(image, [(0, ph - h), (0, pw - w), (0, 0)], mode="edge")
    image = np.ascontiguousarray(np.moveaxis(image, -1, 0))  # planar
    cap = config.capacity_words_per_block
    basis_np = config.dct_basis()
    qtl_np = config.luma_quant.astype(np.float32)
    qtc_np = config.chroma_quant.astype(np.float32)
    gather_idx, table_sel, comp_id = cp._scan_layout(ph, pw, config.subsampling)

    def levels(img):
        return cp._color_levels(
            img, config, jnp.asarray(basis_np), jnp.asarray(qtl_np),
            jnp.asarray(qtc_np),
        )

    def block_pack(img):
        zz = levels(img).astype(jnp.int32)
        dcd = cp._per_component_dc_diff(zz[:, 0], comp_id)
        return entropy_device._per_block_words(zz, table_sel, dcd, cap)

    def concat(img):
        zz = levels(img)
        dcd = cp._per_component_dc_diff(zz[:, 0].astype(jnp.int32), comp_id)
        return entropy_device.encode_scan_device(
            zz, table_sel=table_sel, dc_diff=dcd,
            capacity_words=zz.shape[0] * cap, pad_ones=config.pad_ones,
            stuff=False,
        )

    img_dev = jnp.asarray(image)
    results = []
    prev = 0.0
    for name, fraw in (
        ("convert+dct", levels),
        ("block_pack", block_pack),
        ("concat", concat),
    ):
        f = jax.jit(fraw)
        jax.block_until_ready(jax.device_get(f(img_dev)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(jax.tree.map(lambda x: x.sum() if x.ndim else x, f(img_dev)))
            ts.append(time.perf_counter() - t0)
        total = min(ts) * 1000
        results.append(
            StageTiming(
                name=name,
                total_ms=round(total, 2),
                stage_ms=round(total - prev, 2),
                mpix_per_s=round(h * w / (total / 1000) / 1e6, 1),
            )
        )
        prev = total
    return results


def format_report(stages: list[StageTiming], h: int, w: int) -> str:
    """Pretty table, the analog of the reference's print_profiling_stats
    (dsp main.c:137-172)."""
    lines = [f"encode profile {w}x{h} ({h * w / 1e6:.2f} MPix)"]
    lines.append(f"{'stage':<12}{'stage ms':>10}{'cum ms':>10}{'cum MPix/s':>12}")
    for s in stages:
        lines.append(
            f"{s.name:<12}{s.stage_ms:>10.2f}{s.total_ms:>10.2f}{s.mpix_per_s:>12.1f}"
        )
    return "\n".join(lines)

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
from .entropy import treepack
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
    """Stage-attributed timings of the grayscale device encode.

    Stages mirror the reference's report rows: transform (Y/center/DCT/
    quant/zigzag fused — the MXU part), symbolize (RLE+Huffman code
    assignment), pack (bitstream reduction), stuff (byte stuffing).
    """
    config = config or EncodeConfig()
    is_rgb = image.ndim == 3
    h, w = image.shape[:2]
    ph, pw = blocks.padded_dims(h, w)
    if (ph, pw) != (h, w):
        pad = [(0, ph - h), (0, pw - w)] + [(0, 0)] * (image.ndim - 2)
        image = np.pad(image, pad, mode="edge")
    nb = (ph // 8) * (pw // 8)
    cap = config.capacity_words_per_block
    basis_np = config.dct_basis()
    qt_np = config.luma_quant.astype(np.float32)

    def levels(img):
        return pipeline._gray_levels(
            img, config, jnp.asarray(basis_np), jnp.asarray(qt_np), is_rgb
        )

    def sym(img):
        return entropy_device.symbolize_slots(levels(img))

    def pack(img):
        v, l = sym(img)
        return treepack.pack_bits_tree(
            v.reshape(nb, -1), l.reshape(nb, -1), cap, config.pad_ones
        )

    def full(img):
        words, total_bits, ovf = pack(img)
        out, nbytes = entropy_device.stuff_bytes_device(words, total_bits)
        return out, nbytes, ovf

    img_dev = jnp.asarray(image)
    results = []
    prev = 0.0
    for name, fraw in (
        ("transform", levels),
        ("symbolize", sym),
        ("pack", pack),
        ("stuff", full),
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

"""Debug observability: per-stage first-block dumps.

The reference's debugging workflow is printing the first 8x8 block of
each intermediate and eyeballing the two implementations side by side
(natural_c jpeg_handler.c:168-175 prints the first quantized block; the
DSP client prints first-block Y/DCT/quant/zigzag via print_debug_block,
main.c:519-525, filled by the device for block 0 only,
jpeg_compression.c:149-169). Here the equivalent is a dict of stage
tensors for any block index — the functional pipeline makes every
intermediate addressable instead of a single hardwired debug buffer.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .config import EncodeConfig
from .ops import blocks, color, dct, quant, zigzag


def first_block_report(
    image: np.ndarray, config: EncodeConfig | None = None, block: int = 0
) -> dict[str, np.ndarray]:
    """Stage intermediates for one 8x8 block (default block 0, matching
    the reference's debug buffers). Returns {stage: array}."""
    config = config or EncodeConfig()
    is_rgb = image.ndim == 3
    h, w = image.shape[:2]
    ph, pw = blocks.padded_dims(h, w)
    if (ph, pw) != (h, w):
        pad = [(0, ph - h), (0, pw - w)] + [(0, 0)] * (image.ndim - 2)
        image = np.pad(image, pad, mode="edge")
    img = jnp.asarray(image)
    y = color.rgb_to_y_reference(img) if is_rgb else img
    centered = color.level_shift(y)
    b = blocks.blockify(centered)
    coeffs = dct.dct_blocks(b, jnp.asarray(config.dct_basis()))
    levels = quant.quantize(coeffs, jnp.asarray(config.luma_quant.astype(np.float32)))
    zz = zigzag.zigzag_scan(levels)
    yb = blocks.blockify(y)
    return {
        "y": np.asarray(yb[block]),
        "centered": np.asarray(b[block]),
        "dct": np.asarray(coeffs[block]),
        "quant": np.asarray(levels[block]),
        "zigzag": np.asarray(zz[block]),
    }


def format_block_report(report: dict[str, np.ndarray]) -> str:
    """Text rendering, the analog of print_debug_block (dsp main.c:177-203)."""
    out = []
    for name, arr in report.items():
        out.append(f"--- {name} ---")
        if arr.ndim == 2:
            for row in arr:
                out.append(
                    " ".join(
                        f"{v:8.2f}" if arr.dtype.kind == "f" else f"{int(v):6d}"
                        for v in row
                    )
                )
        else:
            out.append(" ".join(str(int(v)) for v in arr))
    return "\n".join(out)

"""Block layout ops (device, JAX).

Pad-to-multiple-of-8 with edge replication (reference converter.c:15-36
clamps source coordinates, which is exactly edge-replicate padding) and
[H, W] <-> [num_blocks, 8, 8] reshapes. All shapes static under jit.
"""
from __future__ import annotations

import jax.numpy as jnp


def padded_dims(height: int, width: int, multiple: int = 8) -> tuple[int, int]:
    return (
        (height + multiple - 1) // multiple * multiple,
        (width + multiple - 1) // multiple * multiple,
    )


def pad_edge(img: jnp.ndarray, multiple: int = 8) -> jnp.ndarray:
    """Edge-replicate pad a [H, W] (or [H, W, C]) image so H, W are multiples."""
    h, w = img.shape[0], img.shape[1]
    ph, pw = padded_dims(h, w, multiple)
    pad = [(0, ph - h), (0, pw - w)] + [(0, 0)] * (img.ndim - 2)
    if ph == h and pw == w:
        return img
    return jnp.pad(img, pad, mode="edge")


def blockify(img: jnp.ndarray) -> jnp.ndarray:
    """[H, W] -> [nb, 8, 8] with blocks in raster order (rows of blocks
    left-to-right, top-to-bottom — the reference's block order,
    zigzag.c:43-55)."""
    h, w = img.shape
    nbh, nbw = h // 8, w // 8
    return (
        img.reshape(nbh, 8, nbw, 8).transpose(0, 2, 1, 3).reshape(nbh * nbw, 8, 8)
    )


def deblockify(blocks: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Inverse of blockify: [nb, 8, 8] -> [H, W]."""
    nbh, nbw = h // 8, w // 8
    return blocks.reshape(nbh, nbw, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)

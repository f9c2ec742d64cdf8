"""Quantization (device, JAX).

Divides each coefficient by its table entry and rounds half away from zero,
matching the reference's roundf semantics (natural_c quantization.c:36) —
NOT the DSP build's truncation (dsp quantization.c:56-73, which costs ~2 dB
PSNR; SURVEY.md §6.3) and NOT jnp.round's banker's rounding.
"""
from __future__ import annotations

import jax.numpy as jnp


def round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """C roundf: round to nearest, ties away from zero."""
    return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))


def quantize(coeffs: jnp.ndarray, qtable: jnp.ndarray) -> jnp.ndarray:
    """[..., 8, 8] f32 DCT coefficients -> [..., 8, 8] int32 levels.

    Uses true division (not reciprocal multiply) to preserve the reference's
    exact F/Q value at the rounding boundary.
    """
    scaled = coeffs / qtable.astype(coeffs.dtype)
    return round_half_away(scaled).astype(jnp.int32)

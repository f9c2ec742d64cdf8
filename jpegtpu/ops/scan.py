"""Compile-friendly long-axis prefix sums.

XLA's native cumsum lowering has compile time (and on CPU, code size)
proportional to the scanned axis length — a 37M-element cumsum (the bit
offsets of a 12 MPix image's symbol stream) takes minutes to compile.
This decomposes a long 1-D cumsum into [A, chunk] tiles: an inner cumsum
along the short chunk axis, a recursive cumsum over the A tile totals, and
a broadcast add — O(chunk) compile-time footprint per level, log_chunk(n)
levels, dense VPU-friendly work.
"""
from __future__ import annotations

import jax.numpy as jnp


def cumsum_1d(x: jnp.ndarray, chunk: int = 512) -> jnp.ndarray:
    """Inclusive prefix sum of a 1-D array, any length."""
    n = x.shape[0]
    if n <= chunk:
        return jnp.cumsum(x)
    a = -(-n // chunk)
    pad = a * chunk - n
    xp = jnp.pad(x, (0, pad)).reshape(a, chunk)
    inner = jnp.cumsum(xp, axis=1)
    totals = inner[:, -1]
    carry = cumsum_1d(totals, chunk) - totals
    return (inner + carry[:, None]).reshape(-1)[:n]

"""Binary morphology on device (dilation, erosion, closing, hole fill).

Replaces the reference's ``scipy.ndimage`` calls (binary_dilation /
binary_closing / binary_fill_holes in mask_init and fill_sat_holes,
/root/reference/blackbox.py:4556-4596).  3x3 structuring elements map to
max/min pooling via ``lax.reduce_window`` — VPU-friendly, fuseable, and
vmappable over channel or batch axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _pool(x_bool, op_is_max: bool, size: int = 3):
    init = -jnp.inf if op_is_max else jnp.inf
    fn = lax.max if op_is_max else lax.min
    x = x_bool.astype(jnp.float32)
    pad_val = 0.0 if op_is_max else 1.0
    p = size // 2
    x = jnp.pad(x, p, constant_values=pad_val)
    out = lax.reduce_window(x, init, fn, (size, size), (1, 1), "VALID")
    return out > 0.5


def binary_dilation(m, iterations: int = 1, size: int = 3):
    """Dilation with a full ``size x size`` structure (scipy border: 0)."""
    for _ in range(iterations):
        m = _pool(m, True, size)
    return m


def binary_erosion(m, iterations: int = 1, size: int = 3):
    """Erosion with a full structure (outside treated as 0, like scipy)."""
    for _ in range(iterations):
        m = ~_pool(~m, True, size)
    return m


def binary_closing(m, size: int = 3):
    """Dilation followed by erosion (scipy default border semantics)."""
    return binary_erosion(binary_dilation(m, size=size), size=size)


def fill_holes(m, iterations: int = 64, size: int = 3):
    """Fill background regions not connected to the border.

    Flood-fills the complement from the image border by iterated dilation;
    ``iterations`` bounds the reachable hole radius (the reference's use
    case is small holes inside saturated-star blobs, well under the default
    budget).  Fixed iteration count keeps the program shape static.
    """
    outside = ~m
    # seed: border pixels of the complement
    seed = jnp.zeros_like(m)
    seed = seed.at[0, :].set(outside[0, :])
    seed = seed.at[-1, :].set(outside[-1, :])
    seed = seed.at[:, 0].set(outside[:, 0])
    seed = seed.at[:, -1].set(outside[:, -1])

    def body(_, s):
        return _pool(s, True, size) & outside

    reach = jax.lax.fori_loop(0, iterations, body, seed)
    return m | (outside & ~reach)

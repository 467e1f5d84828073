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


def _shift_fill(x, d: int, axis: int, fill: bool):
    """Shift ``x`` by +d along ``axis`` (d may be negative), pad ``fill``."""
    H = x.shape[axis]
    pad = [(0, 0), (0, 0)]
    if d >= 0:
        pad[axis] = (d, 0)
        sl = [slice(None), slice(None)]
        sl[axis] = slice(0, H)
    else:
        pad[axis] = (0, -d)
        sl = [slice(None), slice(None)]
        sl[axis] = slice(-d, H - d)
    return jnp.pad(x, pad, constant_values=fill)[tuple(sl)]


def _sweep_reach(reach, open_, axis: int, reverse: bool):
    """Propagate reachability along an axis through open pixels.

    out[i] = reach[i] | (out[i-1] & open[i]) solved by log-doubling:
    R ← R | (shift(R, d) & O_run),  O_run ← O_run & shift(O_run, d),
    d doubling — ~14 elementwise steps at 10.5k², so the flood fill does
    NOT scale with image size (a dilation-based flood needs O(image)
    steps and silently declares everything beyond its budget a "hole";
    lax.associative_scan at this size OOM-kills the TPU compiler).
    """
    sgn = -1 if reverse else 1
    R = reach & open_
    Orun = open_
    d = 1
    n = reach.shape[axis]
    while d < n:
        R = R | (_shift_fill(R, sgn * d, axis, False) & Orun)
        Orun = Orun & _shift_fill(Orun, sgn * d, axis, False)
        d *= 2
    return R


def fill_holes(m, iterations: int = 3, size: int = 3):
    """Fill background regions not connected to the border.

    The complement is flooded from the border with alternating
    row/column associative sweeps; ``iterations`` counts sweep rounds
    (one round resolves any monotone path; blob-shaped masks converge
    in 1-2, pathological spirals need more).
    """
    outside = ~m
    seed = jnp.zeros_like(m)
    seed = seed.at[0, :].set(outside[0, :])
    seed = seed.at[-1, :].set(outside[-1, :])
    seed = seed.at[:, 0].set(outside[:, 0])
    seed = seed.at[:, -1].set(outside[:, -1])

    def round_(_, reach):
        reach = _sweep_reach(reach, outside, 0, False)
        reach = _sweep_reach(reach, outside, 0, True)
        reach = _sweep_reach(reach, outside, 1, False)
        reach = _sweep_reach(reach, outside, 1, True)
        return reach

    reach = jax.lax.fori_loop(0, max(iterations, 1), round_, seed)
    return m | (outside & ~reach)

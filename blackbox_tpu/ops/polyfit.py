"""Batched weighted polynomial least squares on device.

The reference does many small ``np.polyfit`` calls per channel (vertical
overscan deg-3, horizontal overscan deg-7 with iterative rejection —
/root/reference/blackbox.py:6514-6516, 6745-6752).  Here those become one
batched normal-equation solve over all channels at once.  Fits use a
[-1, 1]-normalised abscissa so a deg-7 Vandermonde stays well-conditioned in
float32 (np.polyfit works in float64 on a raw axis; on TPU we normalise
instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# polynomial normal equations live at 16-bit-breaking dynamic range (bias
# levels ~2e4 e- with few-e- structure): force full-precision contractions,
# never the TPU default bf16 matmul path
_HI = jax.lax.Precision.HIGHEST


def vander_norm(x, deg: int, x0: float, x1: float):
    """Vandermonde matrix of ``x`` rescaled from [x0, x1] to [-1, 1]."""
    t = (2.0 * (x - x0) / (x1 - x0) - 1.0).astype(jnp.float32)
    return t[..., None] ** jnp.arange(deg + 1, dtype=jnp.float32)


def polyfit_w(x, y, w, deg: int, x0=None, x1=None, rcond: float = 1e-6):
    """Weighted polynomial fit; batched over leading dims of y/w.

    x : (..., N) or (N,) abscissa
    y : (..., N) values; w : (..., N) weights (0 = excluded)
    Returns coefficients (..., deg+1) in the normalised domain.
    """
    if x0 is None:
        x0 = jnp.min(x)
    if x1 is None:
        x1 = jnp.max(x)
    V = vander_norm(x, deg, x0, x1)                     # (..., N, D)
    Wy = w * y
    A = jnp.einsum("...ni,...n,...nj->...ij", V, w, V, precision=_HI)  # (..., D, D)
    b = jnp.einsum("...ni,...n->...i", V, Wy, precision=_HI)           # (..., D)
    # Tikhonov ridge for rank-deficient (all-masked) batches
    D = deg + 1
    A = A + rcond * jnp.eye(D, dtype=A.dtype) * (
        jnp.trace(A, axis1=-2, axis2=-1)[..., None, None] / D + 1e-20)
    return jnp.linalg.solve(A, b[..., None])[..., 0]


def polyval_norm(coef, x, x0, x1):
    """Evaluate coefficients from :func:`polyfit_w` at ``x``."""
    V = vander_norm(x, coef.shape[-1] - 1, x0, x1)
    return jnp.einsum("...ni,...i->...n", V, coef, precision=_HI)


def polyfit_reject(x, y, w, deg: int, err, nreject_sigma: float = 3.0,
                   reject_iters: int = 3, x0=None, x1=None):
    """Iterative fit-and-reject (reference blackbox.py:6745-6752).

    After each fit, points with ``|fit - y| > nreject_sigma * err`` lose
    their weight.  Returns (coefficients, final weights, fitted values).
    """
    if x0 is None:
        x0 = jnp.min(x)
    if x1 is None:
        x1 = jnp.max(x)
    fit = jnp.zeros_like(y)
    coef = None
    for _ in range(reject_iters):
        coef = polyfit_w(x, y, w, deg, x0, x1)
        fit = polyval_norm(coef, x, x0, x1)
        w = w * (jnp.abs(fit - y) <= nreject_sigma * err)
    return coef, w, fit

"""WCS resampling on device: Lanczos3 and nearest-neighbour remap.

SWarp replacement (reference: zogy ``run_remap`` shells out to SWarp with
LANCZOS3 for images and NEAREST for masks — /root/reference/buildref.py:
1730-1827, 2102-2234; SURVEY.md §2.4).  The source-coordinate grids are
built host-side in float64 from the TAN WCS pair (one cheap O(H·W) pass),
while the interpolation itself is a device kernel: a separable 6-tap
Lanczos gather, expressed as 36 full-image ``take``s so XLA pipelines the
HBM traffic instead of scalar-looping.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def remap_grid(wcs_src, wcs_dst, shape_dst, step: int = 32):
    """Source pixel coordinates (ys, xs) for every destination pixel.

    Exact TAN->sky->TAN mapping is evaluated on a coarse (step x step)
    host grid in float64 and interpolated bilinearly to full resolution
    (the mapping between two TAN projections of nearby tangent points is
    smooth at the sub-milli-pixel level over 32 px).  Returns float32
    arrays (H, W) of 0-based source coords.
    """
    H, W = shape_dst
    gy = np.arange(0, H + step, step, np.float64)
    gx = np.arange(0, W + step, step, np.float64)
    gyy, gxx = np.meshgrid(gy, gx, indexing="ij")
    ra, dec = wcs_dst.pix2sky(gxx, gyy)
    sx, sy = wcs_src.sky2pix(ra, dec)

    # separable bilinear refinement to the full grid
    def up(coarse):
        fy = np.arange(H, dtype=np.float64) / step
        fx = np.arange(W, dtype=np.float64) / step
        i0 = np.minimum(fy.astype(np.int64), len(gy) - 2)
        j0 = np.minimum(fx.astype(np.int64), len(gx) - 2)
        ty = (fy - i0)[:, None]
        tx = (fx - j0)[None, :]
        c = coarse
        a = c[i0][:, j0] * (1 - ty) * (1 - tx)
        a += c[i0][:, j0 + 1] * (1 - ty) * tx
        a += c[i0 + 1][:, j0] * ty * (1 - tx)
        a += c[i0 + 1][:, j0 + 1] * ty * tx
        return a.astype(np.float32)

    return up(sy), up(sx)


def _lanczos_weights(frac, a: int):
    """(…, 2a) Lanczos-a weights for taps offset -a+1 … a around floor."""
    offs = jnp.arange(-a + 1, a + 1, dtype=jnp.float32)     # (2a,)
    x = frac[..., None] - offs                              # (..., 2a)
    pix = jnp.pi * x
    # sinc(x)*sinc(x/a), safe at x=0
    eps = 1e-7
    w = jnp.where(jnp.abs(x) < eps, 1.0,
                  a * jnp.sin(pix) * jnp.sin(pix / a)
                  / jnp.maximum(pix * pix, eps))
    w = jnp.where(jnp.abs(x) < a, w, 0.0)
    return w / jnp.sum(w, axis=-1, keepdims=True)


def lanczos_resample(src, ys, xs, a: int = 3, fill: float = 0.0):
    """Sample ``src`` at fractional coords with separable Lanczos-a.

    src    : (H, W) float32
    ys, xs : (H', W') 0-based source coordinates
    Out-of-bounds samples return ``fill``.
    """
    H, W = src.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = _lanczos_weights(ys - y0, a)                       # (H', W', 2a)
    wx = _lanczos_weights(xs - x0, a)
    iy0 = y0.astype(jnp.int32)
    ix0 = x0.astype(jnp.int32)

    flat = src.ravel()
    acc = jnp.zeros(ys.shape, src.dtype)
    for ky in range(2 * a):
        iy = jnp.clip(iy0 + (ky - a + 1), 0, H - 1)
        row = iy * W
        wrow = wy[..., ky]
        for kx in range(2 * a):
            ix = jnp.clip(ix0 + (kx - a + 1), 0, W - 1)
            acc = acc + wrow * wx[..., kx] * jnp.take(flat, row + ix)

    inb = (ys >= 0) & (ys <= H - 1) & (xs >= 0) & (xs <= W - 1)
    return jnp.where(inb, acc, fill)


def nearest_resample(src, ys, xs, fill=0):
    """Nearest-neighbour remap (masks; SWarp RESAMPLING_TYPE NEAREST)."""
    H, W = src.shape
    iy = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, H - 1)
    ix = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, W - 1)
    out = jnp.take(src.ravel(), iy * W + ix)
    inb = (ys >= -0.5) & (ys <= H - 0.5) & (xs >= -0.5) & (xs <= W - 0.5)
    return jnp.where(inb, out, jnp.asarray(fill, src.dtype))


def remap(src, wcs_src, wcs_dst, shape_dst, order: str = "lanczos3",
          fill: float = 0.0):
    """SWarp-equivalent one-call remap of an image onto another WCS grid."""
    ys, xs = remap_grid(wcs_src, wcs_dst, shape_dst)
    ys = jnp.asarray(ys)
    xs = jnp.asarray(xs)
    if order == "nearest":
        return nearest_resample(src, ys, xs, fill)
    if order == "lanczos3":
        return lanczos_resample(src, ys, xs, a=3, fill=fill)
    raise ValueError(f"unknown resampling order {order!r}")

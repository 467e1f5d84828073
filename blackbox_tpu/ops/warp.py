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


def remap_grid(wcs_src, wcs_dst, shape_dst, step: int = 32,
               y0: int = 0):
    """Source pixel coordinates (ys, xs) for every destination pixel.

    Exact TAN->sky->TAN mapping is evaluated on a coarse (step x step)
    host grid in float64 and interpolated bilinearly to full resolution
    (the mapping between two TAN projections of nearby tangent points is
    smooth at the sub-milli-pixel level over 32 px).  Returns float32
    arrays (H, W) of 0-based source coords.  ``y0`` offsets the
    destination rows (row-blocked co-addition).
    """
    H, W = shape_dst
    gy = np.arange(y0, y0 + H + step, step, np.float64)
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


def remap_grid_coarse(wcs_src, wcs_dst, shape_dst, step: int = 32,
                      y0: int = 0):
    """Coarse-node source coordinates + bilinear upsample matrices.

    The full (H, W) grids of :func:`remap_grid` are ~1 s of host numpy
    per input per block; the same mapping is exactly representable as
    coarse float64 nodes (host, trivial) upsampled ON DEVICE by two
    small matmuls: ``ys = Wy @ sy @ Wx.T``.  Returns
    (sy, sx, Wy, Wx): (ny, nx) float32 coarse grids and (H, ny), (W, nx)
    float32 weights.  ``y0`` offsets destination rows; Wy/Wx depend
    only on (shape, step) when y0 is a step multiple.
    """
    H, W = shape_dst
    gy = np.arange(y0, y0 + H + step, step, np.float64)
    gx = np.arange(0, W + step, step, np.float64)
    gyy, gxx = np.meshgrid(gy, gx, indexing="ij")
    ra, dec = wcs_dst.pix2sky(gxx, gyy)
    sx, sy = wcs_src.sky2pix(ra, dec)

    def weights(n_out, n_nodes):
        Wm = np.zeros((n_out, n_nodes), np.float32)
        f = np.arange(n_out, dtype=np.float64) / step
        i0 = np.minimum(f.astype(np.int64), n_nodes - 2)
        t = (f - i0).astype(np.float32)
        Wm[np.arange(n_out), i0] = 1.0 - t
        Wm[np.arange(n_out), i0 + 1] = t
        return Wm

    # coarse grids stay float64 (tiny): callers localise coordinates
    # (subtract the slab offset) BEFORE casting to f32, else the cast
    # at ~1e4 px magnitude costs 1e-3 px up front
    return sy, sx, weights(H, len(gy)), weights(W, len(gx))


def upsample_grid(coarse, Wy, Wx):
    """Device bilinear upsample of a coarse coordinate grid."""
    up = jnp.matmul(Wy, coarse, precision="highest")
    return jnp.matmul(up, Wx.T, precision="highest")


def _lanczos_tap(frac, k: int, a: int):
    """Un-normalised Lanczos-a weight of tap ``k`` (offset k-a+1)."""
    x = frac - jnp.float32(k - a + 1)
    pix = jnp.pi * x
    eps = 1e-7
    w = jnp.where(jnp.abs(x) < eps, 1.0,
                  a * jnp.sin(pix) * jnp.sin(pix / a)
                  / jnp.maximum(pix * pix, eps))
    return jnp.where(jnp.abs(x) < a, w, 0.0)


def lanczos_resample(src, ys, xs, a: int = 3, fill: float = 0.0):
    """Sample ``src`` at fractional coords with separable Lanczos-a.

    src    : (H, W) float32
    ys, xs : (H', W') 0-based source coordinates
    Out-of-bounds samples return ``fill``.

    Tap weights are recomputed per tap instead of stored: a
    materialised (H', W', 2a) weight tensor costs 6x the frame in HBM
    and OOMs the blocked co-add with several inputs resident.
    """
    H, W = src.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = ys - y0
    fx = xs - x0
    sy = sum(_lanczos_tap(fy, k, a) for k in range(2 * a))
    sx = sum(_lanczos_tap(fx, k, a) for k in range(2 * a))
    iy0 = y0.astype(jnp.int32)
    ix0 = x0.astype(jnp.int32)

    flat = src.ravel()
    acc = jnp.zeros(ys.shape, src.dtype)
    for ky in range(2 * a):
        iy = jnp.clip(iy0 + (ky - a + 1), 0, H - 1)
        row = iy * W
        wrow = _lanczos_tap(fy, ky, a) / sy
        for kx in range(2 * a):
            ix = jnp.clip(ix0 + (kx - a + 1), 0, W - 1)
            acc = acc + (wrow * (_lanczos_tap(fx, kx, a) / sx)
                         * jnp.take(flat, row + ix))

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

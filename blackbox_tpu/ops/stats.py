"""Masked and sigma-clipped statistics as fixed-iteration device ops.

The reference leans on ``astropy.stats.sigma_clip`` / ``sigma_clipped_stats``
throughout the calibration chain (e.g. /root/reference/blackbox.py:6480-6486,
6657-6663).  Astropy clips iteratively until convergence or ``maxiters``;
here clipping runs a *fixed* number of iterations (iterations past the fixed
point are no-ops, so results are identical whenever astropy converged within
the budget) — data-dependent loop trips would break XLA tracing.

All functions are shape-polymorphic, jit/vmap friendly, and take an optional
boolean ``mask`` (True = excluded), returning masked statistics with empty
selections mapped to NaN like numpy masked arrays would.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def masked_mean_std(x, mask=None, axis=None, ddof: int = 0):
    """Mean and std of unmasked elements (mask True = excluded)."""
    if mask is None:
        n = jnp.asarray(jnp.size(x) if axis is None else x.shape[axis],
                        jnp.float32)
        m = jnp.mean(x, axis=axis)
        v = jnp.mean((x - (m if axis is None else jnp.expand_dims(m, axis))) ** 2,
                     axis=axis)
        denom = jnp.maximum(n - ddof, 1.0)
        return m, jnp.sqrt(v * n / denom)
    keep = ~mask
    n = jnp.sum(keep, axis=axis).astype(x.dtype)
    s = jnp.sum(jnp.where(keep, x, 0), axis=axis)
    mean = s / jnp.maximum(n, 1)
    mean_b = mean if axis is None else jnp.expand_dims(mean, axis)
    var = jnp.sum(jnp.where(keep, (x - mean_b) ** 2, 0), axis=axis)
    std = jnp.sqrt(var / jnp.maximum(n - ddof, 1))
    bad = n <= ddof
    nan = jnp.float32(jnp.nan)
    return jnp.where(n < 1, nan, mean), jnp.where(bad, nan, std)


def masked_median(x, mask=None, axis=-1):
    """Median of unmasked elements along ``axis`` (True = excluded)."""
    if mask is None:
        return jnp.median(x, axis=axis)
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    xs = jnp.sort(jnp.where(mask, big, x), axis=axis)
    n = jnp.sum(~mask, axis=axis)
    # indices of the two middle valid elements
    hi = jnp.maximum(n - 1, 0)
    i_lo = hi // 2
    i_hi = n // 2
    lo_v = jnp.take_along_axis(xs, jnp.expand_dims(i_lo, axis), axis=axis)
    hi_v = jnp.take_along_axis(xs, jnp.expand_dims(i_hi, axis), axis=axis)
    med = 0.5 * (lo_v + hi_v)
    med = jnp.squeeze(med, axis=axis)
    return jnp.where(n < 1, jnp.float32(jnp.nan), med)


def sigma_clip(x, mask=None, axis=None, sigma: float = 3.0,
               sigma_lower=None, sigma_upper=None, iters: int = 5,
               cenfunc: str = "mean"):
    """Fixed-iteration sigma clipping.  Returns the final exclusion mask.

    Matches astropy semantics: center per iteration is the mean or median of
    currently-kept values, scale is their std (ddof=0); values outside
    ``center - sigma_lower*std .. center + sigma_upper*std`` are excluded.
    """
    sigma_lower = sigma if sigma_lower is None else sigma_lower
    sigma_upper = sigma if sigma_upper is None else sigma_upper
    if mask is None:
        mask = jnp.zeros(x.shape, bool)
    mask = mask | ~jnp.isfinite(x)

    def body(_, m):
        if cenfunc == "median":
            if axis is None:
                center = masked_median(x.ravel(), m.ravel(), axis=0)
            else:
                center = masked_median(x, m, axis=axis)
        else:
            center, _ = masked_mean_std(x, m, axis=axis)
        _, std = masked_mean_std(x, m, axis=axis)
        if axis is not None:
            center = jnp.expand_dims(center, axis)
            std = jnp.expand_dims(std, axis)
        lo = center - sigma_lower * std
        hi = center + sigma_upper * std
        new_m = m | (x < lo) | (x > hi)
        # keep everything masked if stats were NaN (all-masked slice)
        return jnp.where(jnp.isnan(std) | (std == 0), m, new_m)

    return jax.lax.fori_loop(0, iters, body, mask)


def sorted_clipped_stats(x, mask=None, sigma: float = 3.0,
                         iters: int = 3):
    """(median, mean, std, n) after sigma clipping — ONE sort total.

    Clipping keeps values inside [center − σ·std, center + σ·std]; on
    data sorted along the last axis that kept set is always a
    contiguous index interval, so the iteration reduces to interval
    bookkeeping: medians are gathers, means/stds come from prefix
    sums, and the new bounds are rank queries (counting passes — no
    gathers).  ``sigma_clip`` + ``masked_median`` re-sorts every
    iteration (~4 sorts for the background mesh's 3-iteration clip);
    this computes identical statistics (same monotone-shrinking kept
    set, center = median, ddof=0 std) for a single sort — the
    background mesh's dominant cost.

    x    : (..., n) samples; statistics along the LAST axis
    mask : bool like x (True = excluded) or None
    """
    inf = jnp.float32(jnp.inf)
    bad = ~jnp.isfinite(x) if mask is None else (mask | ~jnp.isfinite(x))
    xs = jnp.sort(jnp.where(bad, inf, x), axis=-1)
    n0 = jnp.sum(~bad, axis=-1)                       # (...,) valid count

    # per-slice pivot (mid element) removes the large common offset so
    # the f32 sum-of-squares does not cancel catastrophically
    def _take(idx):
        v = jnp.take_along_axis(xs, idx[..., None], axis=-1)[..., 0]
        return jnp.where(jnp.isfinite(v), v, 0.0)

    pivot = _take(jnp.maximum(n0 - 1, 0) // 2)
    finite = jnp.isfinite(xs)
    xz = jnp.where(finite, xs - pivot[..., None], 0.0)   # for cumsums
    xc = jnp.where(finite, xs - pivot[..., None], inf)   # for rank queries
    zero = jnp.zeros(xz.shape[:-1] + (1,), xz.dtype)
    S1 = jnp.concatenate([zero, jnp.cumsum(xz, axis=-1)], axis=-1)
    S2 = jnp.concatenate([zero, jnp.cumsum(xz * xz, axis=-1)], axis=-1)

    def _interval_stats(lo, hi):
        k = jnp.maximum(hi - lo, 1).astype(jnp.float32)
        med = 0.5 * (_take(lo + (hi - lo - 1) // 2)
                     + _take(lo + (hi - lo) // 2))
        s1 = jnp.take_along_axis(S1, hi[..., None], -1)[..., 0] \
            - jnp.take_along_axis(S1, lo[..., None], -1)[..., 0]
        s2 = jnp.take_along_axis(S2, hi[..., None], -1)[..., 0] \
            - jnp.take_along_axis(S2, lo[..., None], -1)[..., 0]
        mean = s1 / k
        var = jnp.maximum(s2 / k - mean * mean, 0.0)
        return med, mean + pivot, jnp.sqrt(var)

    def body(_, state):
        lo, hi = state
        med, _, std = _interval_stats(lo, hi)
        vlo = (med - pivot) - sigma * std             # pivot frame
        vhi = (med - pivot) + sigma * std
        lo2 = jnp.sum(xc < vlo[..., None], axis=-1).astype(lo.dtype)
        hi2 = jnp.sum(xc <= vhi[..., None], axis=-1).astype(hi.dtype)
        keep = (std == 0) | (hi - lo < 1)
        return (jnp.where(keep, lo, jnp.maximum(lo2, lo)),
                jnp.where(keep, hi, jnp.minimum(hi2, hi)))

    lo0 = jnp.zeros(n0.shape, jnp.int32)
    lo, hi = jax.lax.fori_loop(0, iters, body, (lo0, n0.astype(jnp.int32)))
    med, mean, std = _interval_stats(lo, hi)
    n = hi - lo
    nan = jnp.float32(jnp.nan)
    empty = n < 1
    return (jnp.where(empty, nan, med), jnp.where(empty, nan, mean),
            jnp.where(empty, nan, std), n)


def sigma_clipped_mean_std(x, mask=None, axis=None, sigma: float = 3.0,
                           iters: int = 5, cenfunc: str = "mean",
                           std_ddof: int = 0):
    """astropy ``sigma_clipped_stats``-style (mean, std) after clipping."""
    m = sigma_clip(x, mask=mask, axis=axis, sigma=sigma, iters=iters,
                   cenfunc=cenfunc)
    return masked_mean_std(x, m, axis=axis, ddof=std_ddof)


def sigma_clipped_median(x, mask=None, axis=-1, sigma: float = 3.0,
                         iters: int = 5, cenfunc: str = "median"):
    m = sigma_clip(x, mask=mask, axis=axis, sigma=sigma, iters=iters,
                   cenfunc=cenfunc)
    return masked_median(x, m, axis=axis)

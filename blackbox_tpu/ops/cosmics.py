"""L.A.Cosmic cosmic-ray rejection on device.

Rebuild of the algorithm behind the reference's astroscrappy call
(/root/reference/blackbox.py:4259-4370; van Dokkum 2001, PASP 113, 1420):
Laplacian edge detection on the 2x-subsampled image, normalised by a
Poisson+readnoise model, compared against the fine structure of the image
to separate sharp cosmic rays from stars, grown to neighbours, and cleaned
with a masked 5x5 median.  Parameters mirror the reference call: gain 1
(already in e-), saturation handling disabled (the input mask carries the
saturated pixels), full (non-separable) median filters, ``medmask``
cleaning, fixed ``niter``.

The subsampled Laplacian is evaluated in closed form (no 4x intermediate);
median filters come from :mod:`blackbox_tpu.ops.filters` (strip-tiled jnp),
with the fused Pallas path selectable for the hot production pipeline.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from blackbox_tpu.ops.filters import (
    median_filter, masked_median_filter, laplacian_subsampled, dilate)


@dataclasses.dataclass(frozen=True)
class LACosmicParams:
    sigclip: float = 15.0
    sigfrac: float = 0.01
    objlim: float = 3.0
    niter: int = 3
    strip_rows: int = 264
    # capacity of the sparse cleaning pass (cosmic pixels per frame);
    # pixels beyond it stay uncleaned that iteration.  0 = dense clean.
    # Default dense: measured at full frame, the sparse pass LOSES
    # (1.7-5.2 s vs 1.1 s total) — the per-iteration compaction cumsum
    # and the 5x5 windows/scatter cost more than the dense masked
    # median the strip pipeline already fuses well.
    clean_cap: int = 0
    # opt-in fused Pallas kernel (blackbox_tpu.pallas.lacosmic);
    # experimental on current Mosaic — see that module's docstring
    use_pallas: bool = False


def lacosmic(data, inmask, rdnoise, params: LACosmicParams = LACosmicParams()):
    """Detect and clean cosmic rays.

    data    : (H, W) float32, e- (sky-included, calibrated)
    inmask  : (H, W) bool — pixels excluded from detection (bad/saturated/..)
    rdnoise : scalar or (H, W) read-noise [e-]

    Returns (cleaned data, crmask bool, per-iteration detection counts).
    """
    p = params
    if p.use_pallas:
        from blackbox_tpu.pallas.lacosmic import lacosmic_pallas
        return lacosmic_pallas(data, inmask, rdnoise, sigclip=p.sigclip,
                               sigfrac=p.sigfrac, objlim=p.objlim,
                               niter=p.niter)
    crmask = jnp.zeros(data.shape, bool)
    clean = data
    if inmask is None:
        inmask = jnp.zeros(data.shape, bool)
    counts = []

    sigcliplow = p.sigclip * p.sigfrac
    for _ in range(p.niter):
        # noise model from the 5x5 median (gain = 1: data already in e-)
        m5 = jnp.maximum(median_filter(clean, 5, p.strip_rows), 1e-5)
        noise = jnp.sqrt(m5 + rdnoise ** 2)

        # Laplacian SNR, large-scale structure removed
        lplus = laplacian_subsampled(clean)
        s = lplus / (2.0 * noise)
        sp = s - median_filter(s, 5, p.strip_rows)

        # fine structure: med3 - med7(med3), floor 0.01
        m3 = median_filter(clean, 3, p.strip_rows)
        m37 = median_filter(m3, 7, p.strip_rows)
        f = jnp.maximum((m3 - m37) / noise, 0.01)

        good = ~inmask
        cosm = (sp > p.sigclip) & (sp / f > p.objlim) & good
        # grow to neighbours that are also significant
        cosm = dilate(cosm, 3) & (sp > p.sigclip) & good
        # wider growth at the reduced threshold
        cosm = dilate(cosm, 5) & (sp > sigcliplow) & good

        new = cosm & ~crmask
        counts.append(jnp.sum(new))
        crmask = crmask | cosm

        # medmask cleaning: masked 5x5 median of good pixels
        bad = crmask | inmask
        if p.clean_cap > 0:
            # sparse: medians evaluated only AT cosmic pixels (a dense
            # masked median costs ~0.3 s/frame for <0.1% dirty pixels)
            clean = _sparse_masked_clean(clean, crmask, bad, m5,
                                         p.clean_cap)
        else:
            m5bg = median_filter(clean, 5, p.strip_rows)
            repl = masked_median_filter(clean, bad, 5, p.strip_rows,
                                        fallback=m5bg)
            clean = jnp.where(crmask, repl, clean)

    return clean, crmask, jnp.stack(counts)


def _sparse_masked_clean(clean, crmask, bad, m5, cap: int):
    """Replace cosmic pixels by the masked 5x5 median of their good
    neighbours, evaluated only at (compacted) cosmic-pixel positions.

    Matches the dense path's semantics: border pixels (within 2 px of
    the frame edge) keep their value; all-bad neighbourhoods fall back
    to the unmasked 5x5 median ``m5``.  Cosmic pixels beyond ``cap``
    stay uncleaned (cap is far above any physical per-frame count).
    """
    import jax
    from jax import lax

    H, W = clean.shape
    cnt = jnp.cumsum(crmask.ravel().astype(jnp.int32))
    ks = jnp.arange(1, cap + 1, dtype=jnp.int32)
    pos = jnp.clip(jnp.searchsorted(cnt, ks, side="left"), 0, H * W - 1)
    valid = ks <= cnt[-1]
    py = pos // W
    px = pos % W
    interior = ((py >= 2) & (py < H - 2) & (px >= 2) & (px < W - 2)
                & valid)
    # invalid/border slots write pixel (0, 0)'s own (border, hence
    # never-cleaned) value — deterministic even with duplicates
    py = jnp.where(interior, py, 0)
    px = jnp.where(interior, px, 0)

    badf = bad.astype(jnp.float32)

    def one(y, x):
        v = lax.dynamic_slice(clean, (y - 2, x - 2), (5, 5)).ravel()
        b = lax.dynamic_slice(badf, (y - 2, x - 2), (5, 5)).ravel()
        big = jnp.float32(3.0e38)
        vals = jnp.where(b > 0.5, big, v)
        s = jnp.sort(vals)
        n = jnp.sum(b < 0.5).astype(jnp.int32)
        i_lo = jnp.maximum(n - 1, 0) // 2
        i_hi = n // 2
        med = 0.5 * (s[i_lo] + s[i_hi])
        return med, n

    # lax.dynamic_slice clamps out-of-range starts, so the redirected
    # (0, 0) slots slice harmlessly; their result is discarded below
    med, ngood = jax.vmap(one)(py, px)
    fallback = m5[py, px]
    own = clean[py, px]
    out_val = jnp.where(interior,
                        jnp.where(ngood > 0, med, fallback), own)
    return clean.at[py, px].set(out_val)

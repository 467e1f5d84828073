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
        m5bg = median_filter(clean, 5, p.strip_rows)
        repl = masked_median_filter(clean, bad, 5, p.strip_rows,
                                    fallback=m5bg)
        clean = jnp.where(crmask, repl, clean)

    return clean, crmask, jnp.stack(counts)

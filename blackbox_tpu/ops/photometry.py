"""Aperture photometry, vectorised over a fixed-capacity catalog.

Replaces the SExtractor aperture measurements the reference gets through
zogy (`apphot_radii` in units of FWHM — set_zogy contract, SURVEY.md §2.5).
Each source's window is gathered by the Pallas DMA kernel (ops.windows.
gather_slot_windows); fluxes are fractional-coverage-weighted circle
sums, with errors from the background-STD map plus source Poisson noise
(data in e-, gain 1).
"""

from __future__ import annotations

import jax.numpy as jnp


def aperture_photometry(image_bksub, bkg_std, xs, ys, radii,
                        window: int = 32, n_active=None):
    """Sum fluxes in circular apertures.

    image_bksub : (H, W) background-subtracted image [e-]
    bkg_std     : (H, W) background STD map
    xs, ys      : (N,) centroids (0-based pixel coords)
    radii       : sequence of aperture radii [pix] (static length R)
    window      : static cutout size (>= 2*max(radii)+2)
    n_active    : traced count of live catalog slots; slots past it are
        skipped in chunks (zero flux) — see ops.windows

    Returns (flux (N, R), fluxerr (N, R)).
    """
    from blackbox_tpu.ops.windows import (chunked_slot_map,
                                          gather_slot_windows)
    H, W = image_bksub.shape
    half = window // 2
    radii = jnp.asarray(radii, jnp.float32)               # (R,)

    x0 = jnp.clip(jnp.round(xs).astype(jnp.int32) - half, 0, W - window)
    y0 = jnp.clip(jnp.round(ys).astype(jnp.int32) - half, 0, H - window)

    dyx = jnp.arange(window, dtype=jnp.float32)

    cut_all, sd_all = gather_slot_windows((image_bksub, bkg_std),
                                          y0, x0, window,
                                          n_active=n_active)

    def one(cut, sd, x0i, y0i, xi, yi):
        var = sd ** 2
        dy = dyx + y0i.astype(jnp.float32) - yi
        dx = dyx + x0i.astype(jnp.float32) - xi
        r = jnp.sqrt(dy[:, None] ** 2 + dx[None, :] ** 2)   # (w, w)
        # fractional coverage: linear ramp across the aperture edge
        covg = jnp.clip(radii[:, None, None] + 0.5 - r[None], 0.0, 1.0)
        flux = jnp.sum(covg * cut[None], axis=(1, 2))
        err2 = jnp.sum(covg * var[None], axis=(1, 2)) + jnp.maximum(flux, 0.0)
        return flux, jnp.sqrt(err2)

    return chunked_slot_map(one, (cut_all, sd_all, x0, y0, xs, ys),
                            n_active=n_active)


def snr_optimal(flux, fluxerr):
    return flux / jnp.maximum(fluxerr, 1e-9)

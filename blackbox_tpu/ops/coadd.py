"""Co-addition kernels: weighted + clipped stacking, mask voting.

SWarp-combine replacement (reference: two-pass CLIPPED-then-WEIGHTED
SWarp runs with a clip-log -> per-image mask round-trip,
/root/reference/buildref.py:1425-2437, 3479-3870; SURVEY.md §2.2).  With
the whole remapped stack resident on device the Gruen et al. 2014
clipping becomes a single pass: residuals against a first-guess median
co-add are compared to A·σ_i(x) + nsigma-scaled noise, outliers get zero
weight, and the final image is the weighted mean of survivors.  Star
cores are protected from clipping by a bright-core mask (the reference
protects ≤5×FWHM around saturated stars via pass_filters).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from blackbox_tpu.core import maskbits


@dataclasses.dataclass(frozen=True)
class ClipParams:
    A: float = 0.3            # PSF-inaccuracy amplitude (A_swarp)
    nsigma: float = 2.5       # clip threshold in effective sigma
    nmin_clip: int = 3        # below this many images: no clipping
    # clipping disabled within this many FWHM of every saturated star
    # (reference pass_filters protects <= 5 x FWHM, buildref.py:3784-3870)
    protect_radius_fwhm: float = 5.0


def weighted_coadd(stack, weights):
    """Plain inverse-variance weighted mean.

    stack   : (N, H, W) background-subtracted, flux-scaled images
    weights : (N, H, W) inverse-variance weights (0 = excluded)
    Returns (coadd (H, W), wsum (H, W)).
    """
    wsum = jnp.sum(weights, axis=0)
    co = jnp.sum(stack * weights, axis=0) / jnp.maximum(wsum, 1e-12)
    return co, wsum


def saturation_protect(mask_stack, radius_pix: int):
    """Pixels within ``radius_pix`` of ANY input's saturated footprint.

    The reference back-projects clipped pixels and discards those within
    5 x FWHM of a saturated star (pass_filters, buildref.py:3702-3870);
    with the stack resident the same protection is a separable box
    dilation of the union saturation mask — every bright star core is
    protected, not just the frame's brightest.
    """
    from jax import lax
    sat = jnp.any((mask_stack & (maskbits.SATURATED
                                 | maskbits.SAT_CONNECTED)) != 0, axis=0)
    r = int(radius_pix)
    if r <= 0:
        return sat
    x = sat.astype(jnp.float32)
    x = lax.reduce_window(jnp.pad(x, ((r, r), (0, 0))), -jnp.inf,
                          lax.max, (2 * r + 1, 1), (1, 1), "VALID")
    x = lax.reduce_window(jnp.pad(x, ((0, 0), (r, r))), -jnp.inf,
                          lax.max, (1, 2 * r + 1), (1, 1), "VALID")
    return x > 0.5


def clipped_coadd(stack, weights, sigmas, params: ClipParams = ClipParams(),
                  protect=None):
    """Gruen et al. 2014 outlier-clipped weighted co-add, one pass.

    stack   : (N, H, W) remapped, flux-scaled, background-subtracted
    weights : (N, H, W) inverse-variance weights (0 = off-frame/masked)
    sigmas  : (N,) per-image background STD in the common flux scale
    protect : optional (H, W) bool — clipping disabled there (star
              cores; see :func:`saturation_protect`)
    Returns (coadd, wsum, nclipped (H, W) int32).
    """
    p = params
    N = stack.shape[0]
    present = weights > 0
    npres = jnp.sum(present, axis=0)

    # first-guess model: masked median over the stack
    big = jnp.where(present, stack, jnp.nan)
    model = jnp.nanmedian(big, axis=0)
    model = jnp.nan_to_num(model)

    # clip where |x_i - model| > nsigma·σ_i + A·|model|
    # (the A·|model| term absorbs PSF-induced mismatch on star profiles
    # — Gruen eq. 1 with T = A·model)
    sig = sigmas[:, None, None]
    resid = jnp.abs(stack - model[None])
    thresh = p.nsigma * sig + p.A * jnp.abs(model)[None]
    clipped = present & (resid > thresh)

    # protect saturated-star surroundings: clipping there eats PSF
    # wings/cores when seeing varies between inputs
    if protect is not None:
        clipped = clipped & ~protect[None]

    # no clipping when fewer than nmin_clip images contribute
    clipped = clipped & (npres >= p.nmin_clip)[None]

    w = jnp.where(clipped, 0.0, weights)
    # never clip ALL images of a pixel
    all_gone = jnp.sum(w, axis=0) <= 0
    w = jnp.where(all_gone[None], weights, w)

    co, wsum = weighted_coadd(stack, w)
    return co, wsum, jnp.sum(clipped, axis=0).astype(jnp.int32)


def coadd_mask(mask_stack, or_bits: int | None = None,
               vote_frac: float = 0.5):
    """Combine NEAREST-remapped uint8 masks (reference buildref.py:2102-2327).

    * EDGE is set only where NO image contributes (off-frame everywhere).
    * Other bits are set where at least ``vote_frac`` of the contributing
      images carry the bit (the reference's zero-vote/OR hybrid), except
      ``or_bits`` which are OR'd unconditionally.
    """
    if or_bits is None:
        or_bits = maskbits.SATURATED | maskbits.SAT_CONNECTED
    contributes = (mask_stack & maskbits.EDGE) == 0
    ncon = jnp.sum(contributes, axis=0)

    out = jnp.where(ncon == 0, maskbits.EDGE, 0).astype(jnp.uint8)
    for name, bit in maskbits.BITS.items():
        if bit == maskbits.EDGE:
            continue
        has = ((mask_stack & bit) != 0) & contributes
        nbit = jnp.sum(has, axis=0)
        if bit & or_bits:
            setb = nbit > 0
        else:
            setb = nbit >= jnp.maximum(vote_frac * ncon, 1)
        out = jnp.where(setb & (ncon > 0), out | bit, out)
    return out


def coadd_bkg_std(wsum):
    """Per-pixel background STD of the co-add from the weight sum."""
    return 1.0 / jnp.sqrt(jnp.maximum(wsum, 1e-12))


def effective_headers(gains, rdnoises, saturates, fscales, weights_used):
    """Effective GAIN/RDNOISE/SATURATE of a weighted co-add.

    Mirrors the reference's ``calc_headers`` (buildref.py:3223-3243):
    gain_eff = Σw·g, rdnoise_eff = √(Σ(w·r)²·n)/Σw-ish simplifications;
    here: flux-scale-aware combination with normalised weights (N,).
    """
    w = weights_used / jnp.maximum(jnp.sum(weights_used), 1e-12)
    gain_eff = jnp.sum(w * gains * fscales)
    rdnoise_eff = jnp.sqrt(jnp.sum((w * rdnoises * fscales) ** 2))
    saturate_eff = jnp.min(saturates * fscales)
    return gain_eff, rdnoise_eff, saturate_eff


def a_swarp_search(psf_stamps, valid,
                   A_range=(0.3, 5.1, 0.1), nsigma_range=(2.5, 3.6, 0.5),
                   nlimit_frac: float = 0.01, keep_frac: float = 2 / 3):
    """Gruen PSFHomTest port: pick the smallest (A, nsigma) whose expected
    clipped-pixel count over the PSF stamps is acceptable.

    The reference extracts each input image's PSFEx PSF at the image
    centre, forms the median PSF and counts pixels where
    |psf_i - med| > nsigma·σ_bkg-equivalent + A·med over an (A, nsigma)
    grid (buildref.py:3248-3474).  Here σ is the empirical pixel scatter
    over stamps.

    psf_stamps : (N, S, S) unit-sum PSF stamps of the input images
    valid      : (N,) which stamps participate
    Returns (A, nsigma, n_outliers, n_images_kept).
    """
    import numpy as np

    psf = np.asarray(psf_stamps, np.float64)
    ok = np.asarray(valid, bool)
    psf = psf[ok]
    N = len(psf)
    if N < 3:
        a0 = float(np.arange(*A_range)[-1])
        return a0, float(nsigma_range[0]), 0, N
    med = np.median(psf, axis=0)
    sig = 1.4826 * np.median(np.abs(psf - med), axis=0) + 1e-12
    npix = med.size
    nlimit = max(int(nlimit_frac * npix), 1)

    for A in np.arange(*A_range):
        for ns in np.arange(*nsigma_range):
            out = np.abs(psf - med) > ns * sig + A * np.abs(med)
            per_img = out.reshape(N, -1).sum(axis=1)
            kept = per_img <= nlimit
            if kept.sum() >= keep_frac * N:
                return float(A), float(ns), int(per_img[kept].sum()), \
                    int(kept.sum())
    return float(np.arange(*A_range)[-1]), float(nsigma_range[0]), 0, N

"""Transient extraction + vetting on the ZOGY Scorr statistic.

The reference's transient path lives inside zogy's ``optimal_subtraction``
(called /root/reference/blackbox.py:2460; Scorr thresholding, PSF-fit
vetting, MeerCRAB ML scoring) and ships a ``_trans.fits`` catalog whose
header keys (T-NTRANS, T-FTRANS, ...) are QC-checked
(/root/reference/Settings/set_qc.py 'trans' section).  Device program:
threshold |Scorr|, label, reduce per-segment moments and PSF fluxes, and
apply the deterministic vetting cuts; the catalog keeps fixed capacity.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from blackbox_tpu.core import maskbits
from blackbox_tpu.ops.detection import label_segments


@dataclasses.dataclass(frozen=True)
class TransientParams:
    nsigma: float = 6.0           # set_zogy transient_nsigma equivalent
    max_transients: int = 2000
    label_iters: int = 48
    npix_min: int = 2
    elong_max: float = 3.0        # vetting: trail-like shapes rejected
    npix_max: int = 500           # vetting: giant segments rejected
    mask_reject: int = (maskbits.BAD | maskbits.SATURATED
                        | maskbits.SAT_CONNECTED | maskbits.EDGE
                        | maskbits.SATELLITE)
    dipole_frac: float = 0.5      # |neg|/|pos| overlap above this -> dipole


def extract_transients(zogy_out, mask_new=None, mask_ref=None,
                       params: TransientParams = TransientParams()):
    """Fixed-capacity transient catalog from the Scorr map.

    zogy_out : dict from :func:`blackbox_tpu.ops.zogy.zogy_subtract`
    mask_new/mask_ref : optional uint8 mask mosaics on the same grid
    Returns (cat dict of (max_transients,) arrays, n_transients).
    """
    p = params
    Scorr = zogy_out["Scorr"]
    Fpsf = zogy_out["Fpsf"]
    Fpsferr = zogy_out["Fpsferr"]
    D = zogy_out["D"]
    H, W = Scorr.shape

    bad = jnp.zeros((H, W), bool)
    if mask_new is not None:
        bad |= (mask_new & p.mask_reject) != 0
    if mask_ref is not None:
        bad |= (mask_ref & p.mask_reject) != 0

    det = (jnp.abs(Scorr) > p.nsigma) & ~bad
    seg, n = label_segments(det, p.label_iters)

    cap = p.max_transients + 1
    sid = jnp.where(seg <= p.max_transients, seg, 0).ravel()
    a = jnp.abs(Scorr).ravel()
    s = Scorr.ravel()
    yy, xx = jnp.mgrid[0:H, 0:W]
    yy = yy.ravel().astype(jnp.float32)
    xx = xx.ravel().astype(jnp.float32)

    seg_sum = lambda v: jax.ops.segment_sum(v, sid, num_segments=cap)  # noqa
    seg_max = lambda v: jax.ops.segment_max(v, sid, num_segments=cap)  # noqa

    npix = seg_sum(jnp.ones_like(a))
    wsum = seg_sum(a)
    wx = seg_sum(a * xx)
    wy = seg_sum(a * yy)
    wxx = seg_sum(a * xx * xx)
    wyy = seg_sum(a * yy * yy)
    wxy = seg_sum(a * xx * yy)
    peak_abs = seg_max(a)
    pos_sum = seg_sum(jnp.maximum(s, 0.0))
    neg_sum = seg_sum(jnp.maximum(-s, 0.0))

    # position = the segment's |Scorr| PEAK pixel (X_PEAK semantics):
    # star-subtraction residuals sprawl, and an |Scorr|-weighted
    # centroid of a big blob can sit several px from the transient
    peak_of = jax.ops.segment_max(a, sid, num_segments=cap)
    is_peak = (a >= peak_of[sid] - 1e-6) & (sid > 0)
    idx_flat = jnp.arange(H * W, dtype=jnp.int32)
    peak_idx = jax.ops.segment_min(
        jnp.where(is_peak, idx_flat, jnp.int32(H * W)), sid,
        num_segments=cap)
    peak_idx = jnp.clip(peak_idx, 0, H * W - 1)
    xp = (peak_idx % W).astype(jnp.float32)
    yp = (peak_idx // W).astype(jnp.float32)

    wsafe = jnp.maximum(wsum, 1e-9)
    xc = jnp.where(peak_idx < H * W, xp, wx / wsafe)
    yc = jnp.where(peak_idx < H * W, yp, wy / wsafe)
    # central second moments need the CENTROID, not the peak
    xm = wx / wsafe
    ym = wy / wsafe
    x2 = jnp.maximum(wxx / wsafe - xm ** 2, 1e-6)
    y2 = jnp.maximum(wyy / wsafe - ym ** 2, 1e-6)
    xy = wxy / wsafe - xm * ym
    t1 = 0.5 * (x2 + y2)
    t2 = jnp.sqrt(jnp.maximum(0.25 * (x2 - y2) ** 2 + xy ** 2, 0.0))
    elong = jnp.sqrt(jnp.maximum(t1 + t2, 1e-6) /
                     jnp.maximum(t1 - t2, 1e-6))

    # PSF flux at the (rounded) centroid pixel
    xi = jnp.clip(jnp.round(xc).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(yc).astype(jnp.int32), 0, H - 1)
    flux_psf = Fpsf[yi, xi]
    flux_psf_err = Fpsferr[yi, xi]
    d_peak = D[yi, xi]
    scorr_peak = Scorr[yi, xi]
    sign = jnp.where(pos_sum >= neg_sum, 1, -1)

    ids = jnp.arange(cap)
    in_range = (ids >= 1) & (ids <= n)
    vet_npix = (npix >= p.npix_min) & (npix <= p.npix_max)
    vet_shape = elong < p.elong_max
    # dipole: both signs significant within one segment (astrometric
    # residual artefact) — vetted out
    both = jnp.minimum(pos_sum, neg_sum) / jnp.maximum(
        jnp.maximum(pos_sum, neg_sum), 1e-9)
    vet_dipole = both < p.dipole_frac
    valid = in_range & vet_npix & vet_shape & vet_dipole

    cat = {
        "x": xc[1:], "y": yc[1:],
        "npix": npix[1:], "elong": elong[1:],
        "scorr_peak": scorr_peak[1:], "scorr_peak_abs": peak_abs[1:],
        "flux_psf": flux_psf[1:], "fluxerr_psf": flux_psf_err[1:],
        "d_peak": d_peak[1:], "sign": sign[1:],
        "valid": valid[1:],
        "vetted_out": (in_range & ~valid)[1:],
    }
    return cat, jnp.sum(valid)


def transient_stats(cat, n_transients):
    """Header-level transient summary (T-NTRANS / T-FTRANS analogues)."""
    v = cat["valid"]
    npos = jnp.sum(v & (cat["sign"] > 0))
    nneg = jnp.sum(v & (cat["sign"] < 0))
    return {
        "t_ntrans": n_transients,
        "t_npos": npos,
        "t_nneg": nneg,
        "t_nvetted": jnp.sum(cat["vetted_out"]),
    }

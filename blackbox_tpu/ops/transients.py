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
    moment_window: int = 48       # per-segment moment window [pix]


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

    import os
    # OPT-IN like detection.detect_segments (BBTPU_PALLAS_DETECT=1):
    # this instantiation (no taps, no std map) stayed bit-exact on chip,
    # but the kernel family silently miscompiles near the Mosaic
    # scoped-VMEM stack limit and the measured gain is ~10 ms — see
    # detection.py
    if (jax.default_backend() == "tpu" and p.label_iters <= 64
            and H >= 512 and W >= 512
            and os.environ.get("BBTPU_PALLAS_DETECT", "0") == "1"):
        # fused |Scorr| threshold + labeling in one Pallas pass
        from blackbox_tpu.pallas.detect import fused_detect_pallas
        seg, n = fused_detect_pallas(Scorr, None, bad, None, p.nsigma,
                                     iters=p.label_iters, absval=True)
    else:
        det = (jnp.abs(Scorr) > p.nsigma) & ~bad
        seg, n = label_segments(det, p.label_iters)

    # windowed per-segment moments (see detection.segment_catalog: the
    # global scatter reductions cost ~9 s/frame on TPU, windows ~0.1 s)
    from blackbox_tpu.ops.detection import segment_roots
    win = min(p.moment_window, H, W)
    root = segment_roots(seg, p.max_transients)
    rootval = jnp.ravel(seg)[root]
    y0 = jnp.clip(root // W - win // 3, 0, H - win)
    x0 = jnp.clip(root % W - win // 2, 0, W - win)
    g = jnp.arange(win, dtype=jnp.float32)

    from blackbox_tpu.ops.windows import (chunked_slot_map,
                                          gather_slot_windows)
    sw_all, sv_all = gather_slot_windows((seg, Scorr), y0, x0, win,
                                         n_active=n, chunk=256)

    def one(k, sw, sv, y0i, x0i):
        m = (sw == k) & (k > 0)
        mf = m.astype(jnp.float32)
        av = jnp.abs(sv)
        a = av * mf
        # WINDOW-LOCAL coordinates for the moment sums (see
        # detection.segment_catalog: absolute-coordinate squares lose
        # the few-px^2 central moments to f32 cancellation); the
        # absolute offset is added back to the first moments downstream
        yy = g[:, None]
        xx = g[None, :]
        npix = jnp.sum(mf)
        wsum = jnp.sum(a)
        off_x = x0i.astype(jnp.float32)
        off_y = y0i.astype(jnp.float32)
        wsafe1 = jnp.maximum(wsum, 1e-9)
        xl = jnp.sum(a * xx) / wsafe1
        yl = jnp.sum(a * yy) / wsafe1
        wx = (xl + off_x) * wsum
        wy = (yl + off_y) * wsum
        x2c = jnp.sum(a * (xx - xl) ** 2) / wsafe1
        y2c = jnp.sum(a * (yy - yl) ** 2) / wsafe1
        xyc = jnp.sum(a * (xx - xl) * (yy - yl)) / wsafe1
        peak_abs = jnp.max(jnp.where(m, av, 0.0))
        pos_sum = jnp.sum(jnp.maximum(sv, 0.0) * mf)
        neg_sum = jnp.sum(jnp.maximum(-sv, 0.0) * mf)
        # position = the segment's |Scorr| PEAK pixel (X_PEAK
        # semantics): star-subtraction residuals sprawl, and a weighted
        # centroid of a big blob can sit several px from the transient.
        # Flat indices in int32 — f32 cannot represent indices beyond
        # 2^24 and would shift peaks by up to +-4 px on a full frame.
        att = m & (av >= peak_abs - 1e-6)
        gi = jnp.arange(win, dtype=jnp.int32)
        flat = ((gi[:, None] + y0i) * W + (gi[None, :] + x0i))
        peak_idx = jnp.min(jnp.where(att & (npix > 0), flat,
                                     jnp.int32(H * W)))
        # segment pixels on the window border mean the segment spills
        # past the window: its true npix is under-counted, so the giant-
        # segment vet below must treat it as over-sized
        border = jnp.zeros((win, win), bool)
        border = border.at[0, :].set(True).at[-1, :].set(True)
        border = border.at[:, 0].set(True).at[:, -1].set(True)
        truncated = jnp.any(m & border)
        return (npix, wsum, wx, wy, x2c, y2c, xyc, peak_abs, pos_sum,
                neg_sum, peak_idx, truncated)

    # chunked with early exit: a typical Scorr map yields tens-to-
    # hundreds of candidates against the 2000-slot capacity (see
    # ops.windows); skipped slots zero-fill and fail the in_range vet
    (npix, wsum, wx, wy, x2c, y2c, xyc, peak_abs, pos_sum, neg_sum,
     peak_idx, truncated) = chunked_slot_map(
        one, (rootval, sw_all, sv_all, y0, x0), n_active=n, chunk=256)
    # prepend the background bucket so slot arithmetic below matches
    # the old 1-indexed layout
    pad0f = lambda v: jnp.concatenate([jnp.zeros((1,), v.dtype), v])  # noqa
    npix, wsum, wx, wy, x2c, y2c, xyc = map(
        pad0f, (npix, wsum, wx, wy, x2c, y2c, xyc))
    peak_abs, pos_sum, neg_sum = map(pad0f, (peak_abs, pos_sum, neg_sum))
    peak_idx = jnp.concatenate(
        [jnp.full((1,), H * W, peak_idx.dtype), peak_idx])
    truncated = jnp.concatenate(
        [jnp.zeros((1,), bool), truncated])

    cap = p.max_transients + 1
    has_peak = peak_idx < H * W
    peak_idx = jnp.clip(peak_idx, 0, H * W - 1)
    xp = (peak_idx % W).astype(jnp.float32)
    yp = (peak_idx // W).astype(jnp.float32)

    wsafe = jnp.maximum(wsum, 1e-9)
    xc = jnp.where(has_peak, xp, wx / wsafe)
    yc = jnp.where(has_peak, yp, wy / wsafe)
    # central second moments already computed in window-local coords
    x2 = jnp.maximum(x2c, 1e-6)
    y2 = jnp.maximum(y2c, 1e-6)
    xy = xyc
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
    vet_npix = (npix >= p.npix_min) & (npix <= p.npix_max) & ~truncated
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

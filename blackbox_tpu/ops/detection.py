"""Source detection on device: matched filter, labeling, catalog compaction.

The SExtractor-equivalent path (reference consumes `run_sextractor` via
zogy — SURVEY.md §2.4): background-subtracted image is convolved with a
Gaussian matched filter, thresholded at ``nsigma`` times the local
background STD, 8-connected components are labeled on device, and
per-component moments are reduced into a *fixed-capacity* catalog with
``segment_sum`` — static shapes end to end, no host round-trip.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from blackbox_tpu.ops.labeling import label_components


@dataclasses.dataclass(frozen=True)
class DetectParams:
    nsigma: float = 1.5
    npix_min: int = 3
    max_sources: int = 20000
    fwhm_filter: float = 3.0     # matched-filter FWHM [pix]
    label_iters: int = 48


def gaussian_kernel1d(fwhm: float, radius: int | None = None):
    sigma = fwhm / (2.0 * math.sqrt(2.0 * math.log(2.0)))
    if radius is None:
        radius = max(int(3 * sigma + 0.5), 1)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _conv1d(image, k, axis: int):
    """1-D convolution as shifted adds (zero padding).

    On TPU, ``conv_general_dilated`` with a (t, 1) kernel materialises a
    degenerate-minor-dim operand whose tile padding needs ~57 GB at
    10560² — the shifted-add formulation fuses into one elementwise
    pass instead.
    """
    t = k.shape[0]
    r = (t - 1) // 2
    H, W = image.shape
    pad = [(r, r), (0, 0)] if axis == 0 else [(0, 0), (r, r)]
    p = jnp.pad(image, pad)
    out = jnp.zeros_like(image)
    for i in range(t):
        sl = p[i:i + H, :] if axis == 0 else p[:, i:i + W]
        out = out + k[i] * sl
    return out


def matched_filter(image, fwhm: float):
    """Separable Gaussian filter (two 1-D shifted-add convolutions).

    Returns (filtered image, noise shrink factor): filtered background
    noise has STD ``shrink * std_unfiltered``.
    """
    k = gaussian_kernel1d(fwhm)
    out = _conv1d(_conv1d(image, k, 0), k, 1)
    return out, jnp.sum(k ** 2)


def label_segments(det, label_iters: int = 48):
    """Label a boolean detection map into compact segment ids.

    Returns (seg (H, W) with 0 background / 1..n sources ordered by the
    raster position of each component's first pixel, n).
    """
    lab = label_components(det, iters=label_iters)        # flat idx + 1
    H, W = det.shape
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) + 1
    is_root = det & (lab == idx)
    order = jnp.cumsum(is_root.ravel().astype(jnp.int32))
    comp_at = jnp.where(is_root.ravel(), order, 0)        # (H*W,)
    seg = jnp.where(det, comp_at[jnp.maximum(lab - 1, 0)].reshape(H, W), 0)
    return seg, order[-1]


def detect_segments(image_bksub, bkg_std, excl_mask,
                    params: DetectParams = DetectParams()):
    """Threshold + label.  Returns (seg compact ids (H, W), n_sources).

    seg is 0 for background, 1..n for sources ordered by their minimum
    flattened pixel index (raster order of first pixel).
    """
    p = params
    filt, shrink = matched_filter(image_bksub, p.fwhm_filter)
    # SExtractor-style threshold: the filtered map is compared against
    # nsigma times the UNFILTERED background RMS (the filter shrinks the
    # noise by ~5x, so this is an effective ~7-sigma cut on the smoothed
    # map — correlated noise never percolates into mega-segments)
    det = filt > p.nsigma * jnp.maximum(bkg_std, 1e-6)
    if excl_mask is not None:
        det = det & ~excl_mask
    return label_segments(det, p.label_iters)


def segment_catalog(image_bksub, bkg_std, seg, n_sources,
                    params: DetectParams = DetectParams()):
    """First/second moments + peak per segment, fixed capacity.

    Returns a dict of (max_sources,) arrays: x, y (centroids, 0-based),
    flux_iso, npix, peak, x2, y2, xy (central second moments), valid.
    """
    p = params
    H, W = seg.shape
    cap = p.max_sources + 1
    # segments beyond capacity fall into the background bucket, not a
    # garbage mega-segment
    sid = jnp.where(seg <= p.max_sources, seg, 0).ravel()
    img = image_bksub.ravel()
    w = jnp.maximum(img, 0.0)                      # positive weights
    yy, xx = jnp.mgrid[0:H, 0:W]
    yy = yy.ravel().astype(jnp.float32)
    xx = xx.ravel().astype(jnp.float32)

    # separate scatter passes: packing the eight quantities on a
    # trailing axis would create an f32[111M, 8] temp whose T(8,128)
    # tile padding needs 57 GB on TPU
    seg_sum = lambda v: jax.ops.segment_sum(v, sid, num_segments=cap)  # noqa
    npix = seg_sum(jnp.ones_like(img))
    flux = seg_sum(img)
    wsum = seg_sum(w)
    wx = seg_sum(w * xx)
    wy = seg_sum(w * yy)
    wxx = seg_sum(w * xx * xx)
    wyy = seg_sum(w * yy * yy)
    wxy = seg_sum(w * xx * yy)
    peak = jax.ops.segment_max(img, sid, num_segments=cap)

    wsafe = jnp.maximum(wsum, 1e-9)
    xc = wx / wsafe
    yc = wy / wsafe
    x2 = wxx / wsafe - xc ** 2
    y2 = wyy / wsafe - yc ** 2
    xy = wxy / wsafe - xc * yc

    ids = jnp.arange(cap)
    valid = (ids >= 1) & (ids <= n_sources) & (npix >= p.npix_min)
    out = {
        "x": xc[1:], "y": yc[1:], "flux_iso": flux[1:],
        "npix": npix[1:], "peak": peak[1:],
        "x2": x2[1:], "y2": y2[1:], "xy": xy[1:],
        "valid": valid[1:],
    }
    return out


def moments_shape(cat):
    """A/B axes, elongation, FWHM estimate from second moments."""
    x2, y2, xy = cat["x2"], cat["y2"], cat["xy"]
    t1 = 0.5 * (x2 + y2)
    t2 = jnp.sqrt(jnp.maximum(0.25 * (x2 - y2) ** 2 + xy ** 2, 0.0))
    a2 = jnp.maximum(t1 + t2, 1e-6)
    b2 = jnp.maximum(t1 - t2, 1e-6)
    a = jnp.sqrt(a2)
    b = jnp.sqrt(b2)
    fwhm = 2.0 * jnp.sqrt(jnp.log(2.0) * (a2 + b2))
    theta = 0.5 * jnp.arctan2(2 * xy, x2 - y2)
    return {"a": a, "b": b, "elong": a / b, "fwhm": fwhm, "theta": theta}

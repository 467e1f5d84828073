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
    # labeling iterations bound the geodesic diameter that merges into
    # one segment; 32 covers stars and typical saturated halos at
    # 6.1 ms/iteration on a 10.5k^2 frame — larger blobs (extreme
    # bloom) split into a few segments, like SExtractor deblending
    label_iters: int = 32
    # two-tier moment windows: every segment gets a cheap small-window
    # pass; segments that touch the window border (bright stars whose
    # wings spill +-16 px — truncated moments measurably degrade PSF
    # models and Scorr normalisation) are REDONE in a big window.
    # Cost: max_sources*32^2 + nbig_max*96^2 ~ 35% below a flat 48^2,
    # with better moments for the bright tail than 48 ever gave.
    moment_window: int = 32
    moment_window_big: int = 96
    nbig_max: int = 1024


def gaussian_taps(fwhm: float, radius: int | None = None) -> tuple:
    """Static Gaussian filter taps (python floats holding exact f32
    values) — shared by the jnp and Pallas detection paths so both
    convolve with bit-identical constants."""
    import numpy as np
    sigma = fwhm / (2.0 * math.sqrt(2.0 * math.log(2.0)))
    if radius is None:
        radius = max(int(3 * sigma + 0.5), 1)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k = (k / k.sum()).astype(np.float32)
    return tuple(float(v) for v in k)


def gaussian_kernel1d(fwhm: float, radius: int | None = None):
    return jnp.asarray(gaussian_taps(fwhm, radius), jnp.float32)


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
    """Label a boolean detection map.

    Returns (seg, n) where ``seg`` holds 0 for background and the
    component's ROOT label (flat index of its first raster pixel, +1)
    elsewhere.  Per-pixel compact 1..n ids are deliberately not built:
    the relabeling gather over all pixels costs ~1 s/frame on TPU, and
    consumers (:func:`segment_catalog`) only ever compare window slices
    of ``seg`` against the k-th root's label from
    :func:`segment_roots`.
    """
    lab = label_components(det, iters=label_iters)        # flat idx + 1
    H, W = det.shape
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) + 1
    is_root = det & (lab == idx)
    n = jnp.sum(is_root.astype(jnp.int32))
    return jnp.where(det, lab, 0), n


def detect_segments(image_bksub, bkg_std, excl_mask,
                    params: DetectParams = DetectParams(),
                    use_pallas: bool | None = None):
    """Threshold + label.  Returns (seg (H, W) int32, n_sources).

    seg is 0 for background; a source's label is its ROOT pixel's flat
    raster index + 1 (NOT a compact 1..n id — consumers compare window
    slices against the k-th root's label from :func:`segment_roots`,
    which is how the capacity-indexed catalog addresses segments).

    On TPU the whole chain — matched filter, threshold, label seeding,
    all propagation iterations and the root count — runs as ONE fused
    Pallas pass (:mod:`blackbox_tpu.pallas.detect`); the jnp path
    below materialises each intermediate frame in HBM.
    """
    p = params
    H, W = image_bksub.shape
    if use_pallas is None:
        import os
        # OPT-IN (BBTPU_PALLAS_DETECT=1): the fused kernel is only ~7 ms
        # faster than this jnp path at 10.5k² (69.6 vs 76.7 ms — XLA
        # fuses matched+threshold, and labeling already runs the Pallas
        # labelprop kernel), and with taps+std+excl together its live
        # set exceeds Mosaic's 16 MB scoped-VMEM stack: the v5e compile
        # either fails "Ran out of memory in memory space vmem" or,
        # near the limit, SILENTLY MISCOMPILES (measured 336k roots vs
        # 3992 at full scale; every feature is bit-exact in isolation)
        use_pallas = (jax.default_backend() == "tpu"
                      and p.label_iters <= 56 and H >= 512 and W >= 512
                      and os.environ.get("BBTPU_PALLAS_DETECT",
                                         "0") == "1")
    if use_pallas:
        from blackbox_tpu.pallas.detect import fused_detect_pallas
        return fused_detect_pallas(image_bksub, bkg_std, excl_mask,
                                   gaussian_taps(p.fwhm_filter),
                                   p.nsigma, iters=p.label_iters)
    filt, shrink = matched_filter(image_bksub, p.fwhm_filter)
    # SExtractor-style threshold: the filtered map is compared against
    # nsigma times the UNFILTERED background RMS (the filter shrinks the
    # noise by ~5x, so this is an effective ~7-sigma cut on the smoothed
    # map — correlated noise never percolates into mega-segments)
    det = filt > p.nsigma * jnp.maximum(bkg_std, 1e-6)
    if excl_mask is not None:
        det = det & ~excl_mask
    seg, n = label_segments(det, p.label_iters)
    return seg, n


def segment_roots(seg, max_sources: int):
    """Flat raster index of the k-th segment's first (root) pixel.

    Scatter-free: segment labels are root flat indices, so a pixel is a
    root iff ``seg == its own flat index + 1``, and roots appear in
    raster order.  The compaction is hierarchical to avoid any
    full-frame 1-D scan (a flat ``cummax``+``cumsum`` over the 111 Mpx
    costs 115 ms on a v5e, and even the row-wise i16 cumsum 41 ms —
    the scans, not the windows, dominated the whole catalog stage):
    in-row ranks come from a blocked MXU cumsum (one upper-triangular
    (128, 128) matmul per block plus a tiny per-row block-offset
    scan), a (H,) cumsum locates the k-th root's row, and a 14-step
    vectorised binary search over that row's rank finds its column.

    For k past the last segment every level clamps to its end, so the
    returned index degrades to ``H*W - 1`` exactly like the old
    ``searchsorted`` clip; callers gate on ``k <= n_sources``.
    """
    H, W = seg.shape
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) + 1
    root = seg == idx                              # root-pixel mask
    # in-row ranks WITHOUT a minor-axis scan: even the i16 cumsum's
    # ~14 log-passes over the 111 Mpx frame cost 41 ms on chip.  The
    # blocked form puts the FLOPs on the MXU instead: an intra-block
    # inclusive cumsum is one (B, B) upper-triangular matmul (bf16
    # inputs are exact 0/1, f32 accumulation is exact for any count
    # < 2^24), and the per-row block offsets are a tiny (H, W/B) scan.
    # rowcum[r, c] reconstructs as intra[r, c//B, c%B] + offs[r, c//B]
    # at gather time — it is never materialised as one array.
    B = 128
    nbpad = -(-W // B)
    rootp = root if nbpad * B == W else jnp.pad(
        root, ((0, 0), (0, nbpad * B - W)))
    xb = rootp.reshape(H, nbpad, B).astype(jnp.bfloat16)
    tri = jnp.asarray(
        jnp.triu(jnp.ones((B, B), jnp.float32)), jnp.bfloat16)
    intra = jnp.matmul(xb, tri,
                       preferred_element_type=jnp.float32)  # (H, nb, B)
    bsum = intra[:, :, -1]                          # (H, nb)
    offs = jnp.cumsum(bsum, axis=1) - bsum          # exclusive, (H, nb)
    counts = (offs[:, -1] + bsum[:, -1]).astype(jnp.int32)  # roots/row
    before = jnp.cumsum(counts)                    # (H,) tiny scan
    ks = jnp.arange(1, max_sources + 1, dtype=jnp.int32)
    row = jnp.searchsorted(before, ks, side="left")
    rowc = jnp.clip(row, 0, H - 1).astype(jnp.int32)
    prev = jnp.where(rowc > 0, before[jnp.maximum(rowc - 1, 0)], 0)
    j = ks - prev                                  # 1-indexed in-row rank
    jf = j.astype(jnp.float32)

    # smallest c with rowcum[rowc, c] >= j (binary search, all slots at
    # once; each step is two (max_sources,) gathers)
    nbits = max(1, (W - 1).bit_length())
    lo = jnp.zeros_like(ks)
    hi = jnp.full_like(ks, W - 1)

    def step(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        q = mid // B
        v = intra[rowc, q, mid - q * B] + offs[rowc, q]   # exact int in f32
        ge = v >= jf
        return (jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi))

    lo, _ = jax.lax.fori_loop(0, nbits, step, (lo, hi))
    # k past the last root walks lo to W in the last row; clamp to the
    # old searchsorted-clip behaviour (H*W - 1)
    return jnp.clip(rowc * W + lo, 0, H * W - 1)


def segment_catalog(image_bksub, bkg_std, seg, n_sources,
                    params: DetectParams = DetectParams(), roots=None):
    """First/second moments + peak per segment, fixed capacity.

    Returns a dict of (max_sources,) arrays: x, y (centroids, 0-based),
    flux_iso, npix, peak, x2, y2, xy (central second moments), valid.

    Moments are computed over a ``moment_window`` cutout around each
    segment's root pixel (vmapped dynamic slices).  Global scatter
    reductions over all pixels cost ~9 s/frame on TPU; windows cost
    ~0.1 s and are exact for every segment smaller than the window —
    sprawling segments (bleeding saturated stars) get window-truncated
    moments, which downstream consumers treat as the low-quality
    sources they are.
    """
    p = params
    H, W = seg.shape
    root = roots if roots is not None else segment_roots(seg,
                                                        p.max_sources)
    rootval = jnp.ravel(seg)[root]          # the k-th segment's label
    ry = (root // W).astype(jnp.int32)
    rx = (root % W).astype(jnp.int32)
    ks = jnp.arange(1, p.max_sources + 1, dtype=jnp.int32)

    win = min(p.moment_window, H, W)
    out = _window_moments(image_bksub, seg, rootval, ry, rx, win,
                          n_active=n_sources)
    (xc, yc, flux, npix, peak, x2, y2, xy, trunc) = out

    # tier 2: segments that hit the small window's border get redone in
    # a big window (the bright tail; typically far fewer than the cap)
    win_big = min(p.moment_window_big, H, W)
    if win_big > win and p.nbig_max > 0:
        cnt = jnp.cumsum(trunc.astype(jnp.int32))
        kb = jnp.arange(1, p.nbig_max + 1, dtype=jnp.int32)
        slots = jnp.clip(jnp.searchsorted(cnt, kb, side="left"),
                         0, p.max_sources - 1)
        ok = kb <= cnt[-1]
        # chunk 128: the big windows are 9x the pixels of the small
        # ones, and typical frames have only O(100) truncated segments
        # against the 1024 cap — without the small chunk the default
        # (2048) degenerates to a dense vmap over all 1024 big windows
        outb = _window_moments(image_bksub, seg, rootval[slots],
                               ry[slots], rx[slots], win_big,
                               n_active=cnt[-1], chunk=128)

        # invalid kb entries share a clipped slot with the LAST valid
        # one (searchsorted clamp); writing `a[slots]` back for them
        # creates duplicate-index scatters whose order XLA leaves
        # unspecified — route not-ok writes out of bounds and drop them
        slots_ok = jnp.where(ok, slots, p.max_sources)

        def put(a, b):
            return a.at[slots_ok].set(b, mode="drop")

        xc = put(xc, outb[0])
        yc = put(yc, outb[1])
        flux = put(flux, outb[2])
        npix = put(npix, outb[3])
        peak = put(peak, outb[4])
        x2 = put(x2, outb[5])
        y2 = put(y2, outb[6])
        xy = put(xy, outb[7])

    valid = (ks <= n_sources) & (npix >= p.npix_min)
    return {
        "x": xc, "y": yc, "flux_iso": flux, "npix": npix, "peak": peak,
        "x2": x2, "y2": y2, "xy": xy, "valid": valid,
    }


def _window_moments(image_bksub, seg, rootval, ry, rx, win: int,
                    n_active=None, chunk: int = 2048):
    """Windowed per-segment moments; the last return is the
    window-truncation flag (segment touches the border).

    Windows are gathered up-front (Pallas DMA gather on TPU — the
    vmapped-dynamic-slice gather was the dominant catalog-stage cost at
    ~9 us/window, PERF_NOTES.md); the moment math then runs chunked with
    early exit past ``n_active`` slots over the resident stacks."""
    from blackbox_tpu.ops.windows import (chunked_slot_map,
                                          gather_slot_windows)
    H, W = seg.shape
    # the root is a segment's topmost-then-leftmost pixel: bias the
    # window down so the blob (which extends downward) stays inside
    y0 = jnp.clip(ry - win // 3, 0, H - win)
    x0 = jnp.clip(rx - win // 2, 0, W - win)
    g = jnp.arange(win, dtype=jnp.float32)

    sw_all, vw_all = gather_slot_windows((seg, image_bksub), y0, x0, win,
                                         n_active=n_active, chunk=chunk)

    def one(k, sw, vw, y0i, x0i):
        m = (sw == k) & (k > 0)
        mf = m.astype(jnp.float32)
        npix = jnp.sum(mf)
        flux = jnp.sum(vw * mf)
        peak = jnp.max(jnp.where(m, vw, -jnp.inf))
        w = jnp.maximum(vw, 0.0) * mf               # positive weights
        # moments in WINDOW-LOCAL coordinates: absolute x^2 ~ 1e8
        # swamps few-px^2 central moments in f32 (catastrophic
        # cancellation); central moments are translation-invariant
        yy = g[:, None]
        xx = g[None, :]
        wsum = jnp.maximum(jnp.sum(w), 1e-9)
        xl = jnp.sum(w * xx) / wsum
        yl = jnp.sum(w * yy) / wsum
        x2 = jnp.sum(w * (xx - xl) ** 2) / wsum
        y2 = jnp.sum(w * (yy - yl) ** 2) / wsum
        xy = jnp.sum(w * (xx - xl) * (yy - yl)) / wsum
        xc = xl + x0i.astype(jnp.float32)
        yc = yl + y0i.astype(jnp.float32)
        # border contact = moments truncated
        border = (jnp.any(m[0, :]) | jnp.any(m[-1, :])
                  | jnp.any(m[:, 0]) | jnp.any(m[:, -1]))
        return (xc, yc, flux, npix, jnp.where(npix > 0, peak, 0.0),
                x2, y2, xy, border & (npix > 0))

    return chunked_slot_map(one, (rootval, sw_all, vw_all, y0, x0),
                            n_active=n_active, chunk=chunk)


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

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

Clean-once semantics (deliberate deviation from astroscrappy): each
cosmic pixel is replaced exactly once, in the iteration that detects it.
astroscrappy re-cleans EVERY flagged pixel every iteration, which only
changes pixels with zero good neighbours in their 5x5 (their replacement
is the unmasked-median fallback, which drifts as neighbours get cleaned)
— pixels that are masked in the output either way.  Under clean-once an
iteration that detects nothing new is a provable no-op, so iterations
after a zero-new round are skipped (``lax.cond``), the sharded
fixed-trip path stays bit-identical to the guarded one, and window
scatters for unchanged windows are elided.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import lax

from blackbox_tpu.ops.filters import (
    median_filter, masked_median_filter, laplacian_subsampled, dilate)


@dataclasses.dataclass(frozen=True)
class LACosmicParams:
    sigclip: float = 15.0
    sigfrac: float = 0.01
    objlim: float = 3.0
    niter: int = 3
    # strip height for the dense median networks; swept on v5e at
    # 10560²: 176 -> 196.8 ms, 264 -> 204.5, 352 -> 218.6, 528 -> 226.8
    strip_rows: int = 176
    # capacity of the sparse cleaning pass (cosmic pixels per frame);
    # pixels beyond it stay uncleaned that iteration.  0 = dense clean.
    # Default dense: measured at full frame, the sparse pass LOSES
    # (1.7-5.2 s vs 1.1 s total) — the per-iteration compaction cumsum
    # and the 5x5 windows/scatter cost more than the dense masked
    # median the strip pipeline already fuses well.
    clean_cap: int = 0
    # separable median filters for detection (astroscrappy sepmed:
    # faster, quality-risky, disabled by the reference); incompatible
    # with the windowed iterations (dense only)
    sepmed: bool = False
    # opt-in fused Pallas kernel (blackbox_tpu.pallas.lacosmic);
    # experimental on current Mosaic — see that module's docstring
    use_pallas: bool = False
    # route the DENSE round's full-frame 5x5 medians through the
    # VMEM-tile Pallas kernel (blackbox_tpu.pallas.medians) — bit-
    # identical comparator networks (0 mismatches over the full 10560²
    # frame, compiled on v5e), one HBM read+write per median.  OPT-IN:
    # isolated it beats the jnp strips 84.9 vs 274 ms, but in the full
    # production program the bench is unchanged (361 vs 358-374 ms
    # lottery band) — the stage is VPU-ALU-bound, so same comparator
    # count = same in-context cost, and the kernel adds Mosaic risk
    # surface for no measured gain (PERF_NOTES.md round 4).  None =
    # auto = currently False everywhere.
    pallas_medians: bool | None = None
    # iteration-1 pre-screen: place the exact windowed detection from a
    # cheap separable-extrema SUPERSET of the seed pixels
    # (_prescreen_seeds) instead of running the dense median networks
    # over the whole frame.  Mathematically lossless (the bound is
    # pointwise >= the true statistic, bit-parity verified on chip) but
    # OFF by default: bright stars legitimately satisfy the
    # ``sp > sigclip`` seed test (only the fine-structure ratio rejects
    # them, and min/max extrema cannot bound a median tightly enough to
    # evaluate it cheaply), so star-rich survey frames activate
    # thousands of cells and the windowed round costs as much as the
    # dense one (bench: 460 vs 455 ms/frame end to end; a 41k-seed
    # adversarial frame: 323 vs 344 ms).  Worth enabling for sparse
    # fields or pre-cleaned co-add inputs.
    prescreen: bool = False
    # EXACT windowed iterations: cosmic detections in iteration i+1 can
    # only appear within the stencil influence radius (<= 7 px) of
    # pixels cleaned in iteration i, so iterations 2..niter (and every
    # cleaning pass) run only on windows around active cells instead of
    # the full 111-Mpx frame — bit-identical to the dense path, ~5x
    # cheaper end to end.  Falls back to dense when more than
    # ``max_cells`` cells are active.
    windowed: bool = True
    cell: int = 64                # active-cell granularity [px]
    max_cells: int = 4096         # dense fallback above this
    window_chunk: int = 256       # windows processed per lax.map step


def lacosmic(data, inmask, rdnoise, params: LACosmicParams = LACosmicParams(),
             coords=None):
    """Detect and clean cosmic rays.

    data    : (H, W) float32, e- (sky-included, calibrated)
    inmask  : (H, W) bool — pixels excluded from detection (bad/saturated/..)
    rdnoise : scalar or (H, W) read-noise [e-]
    coords  : optional (col0, W_total) when ``data`` is a column block of
              a larger frame (spatially-sharded path): the border-restore
              masks then use GLOBAL frame coordinates so shard seams stay
              bit-identical to the single-device result.

    Returns (cleaned data, crmask bool, per-iteration detection counts).
    """
    p = params
    if p.prescreen and (not p.windowed or p.sepmed):
        raise ValueError("LACosmicParams.prescreen requires the windowed "
                         "iteration machinery (windowed=True, "
                         "sepmed=False) — it places exact windowed "
                         "detection from the seed superset")
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

    if coords is not None:
        return _lacosmic_dense_coords(data, inmask, rdnoise, p, coords)

    if p.sepmed:
        from blackbox_tpu.ops.filters import median_filter_sep
        medf = lambda a, k: median_filter_sep(a, k, p.strip_rows)  # noqa

        def sep_iter(ops):
            clean, crmask = ops
            cosm, m5un = _detect_math(clean, ~inmask, rdnoise, p, medf,
                                      laplacian_subsampled)
            new = cosm & ~crmask
            crmask = crmask | cosm
            repl = masked_median_filter(clean, crmask | inmask, 5,
                                        p.strip_rows, fallback=m5un)
            return jnp.where(new, repl, clean), crmask

        last = None
        for _ in range(p.niter):
            prev = jnp.sum(crmask)
            if last is None:
                clean, crmask = sep_iter((clean, crmask))
            else:
                # an iteration after a zero-new round is a no-op (see
                # the clean-once note in the module docstring): skip it
                clean, crmask = lax.cond(last > 0, sep_iter,
                                         lambda o: o, (clean, crmask))
            last = jnp.sum(crmask) - prev
            counts.append(last)
        return clean, crmask, jnp.stack(counts)

    # the windowed machinery gathers data windows but not rdnoise
    # windows, so a per-pixel (H, W) read-noise map must take the dense
    # path (still exact, just unwindowed)
    windowed = p.windowed and jnp.ndim(rdnoise) == 0
    if p.prescreen and not windowed:
        raise ValueError("LACosmicParams.prescreen needs the windowed "
                         "path, which requires a SCALAR rdnoise — a "
                         "per-pixel read-noise map forces the dense "
                         "path and would silently skip the requested "
                         "pre-screen")
    if windowed:
        last = None
        for it in range(p.niter):
            if it == 0 and p.prescreen:
                # cheap exact-superset seed screen (separable extrema
                # bounds, ~30 ops/px), then EXACT windowed detection +
                # cleaning only around candidate cells — the dense
                # detection round's four full-frame median networks
                # (~800 ops/px) run only where a seed could exist
                seeds = _prescreen_seeds(clean, ~inmask, rdnoise, p)
                clean, crmask = _windowed_pass(
                    clean, crmask, inmask, rdnoise, p, detect=True,
                    place_mask=seeds)
                counts.append(jnp.sum(crmask))
                last = counts[-1]
            elif it == 0:
                # dense detection (no prior to localise),
                # then windowed cleaning at the detected cells only
                cosm, _ = _detect_math(
                    clean, ~inmask, rdnoise, p,
                    lambda a, k: median_filter(a, k, p.strip_rows),
                    laplacian_subsampled)
                counts.append(jnp.sum(cosm & ~crmask))
                crmask = crmask | cosm
                clean, crmask = _windowed_pass(
                    clean, crmask, inmask, rdnoise, p, detect=False)
                last = counts[-1]
            else:
                prev = jnp.sum(crmask)

                def wpass(ops):
                    return _windowed_pass(ops[0], ops[1], inmask,
                                          rdnoise, p, detect=True)

                # an iteration following a zero-new round is a no-op
                # under clean-once semantics — skip its window pass
                clean, crmask = lax.cond(last > 0, wpass,
                                         lambda o: o, (clean, crmask))
                last = jnp.sum(crmask) - prev
                counts.append(last)
        return clean, crmask, jnp.stack(counts)

    # None = auto: resolved to False for now — bit-parity holds on
    # chip but the in-context cost is identical (ALU-bound stage) and
    # the jnp strips carry no Mosaic risk (see LACosmicParams)
    use_pm = bool(p.pallas_medians)

    def medf_dense(a, k):
        # full-frame 5x5 medians ride the VMEM-tile Pallas kernel
        # (bit-identical networks); 3x3/7x7 stay on the jnp strips,
        # which win at those sizes (measured on v5e, PERF_NOTES r4)
        if use_pm and k == 5:
            from blackbox_tpu.pallas.medians import median_filter_pallas
            return median_filter_pallas(a, 5)
        return median_filter(a, k, p.strip_rows)

    def dense_iter(ops):
        clean, crmask = ops
        cosm, m5un = _detect_math(
            clean, ~inmask, rdnoise, p, medf_dense,
            laplacian_subsampled)
        new = cosm & ~crmask
        crmask = crmask | cosm
        # medmask cleaning: masked 5x5 median of good pixels, applied
        # to this round's NEW detections (clean-once semantics)
        bad = crmask | inmask
        if p.clean_cap > 0:
            # sparse: medians evaluated only AT cosmic pixels (a dense
            # masked median costs ~0.3 s/frame for <0.1% dirty pixels)
            m5 = jnp.maximum(m5un, 1e-5)
            clean = _sparse_masked_clean(clean, new, bad, m5,
                                         p.clean_cap)
        else:
            repl = masked_median_filter(clean, bad, 5, p.strip_rows,
                                        fallback=m5un)
            clean = jnp.where(new, repl, clean)
        return clean, crmask

    last = None
    for _ in range(p.niter):
        prev = jnp.sum(crmask)
        if last is None:
            clean, crmask = dense_iter((clean, crmask))
        else:
            clean, crmask = lax.cond(last > 0, dense_iter,
                                     lambda o: o, (clean, crmask))
        last = jnp.sum(crmask) - prev
        counts.append(last)

    return clean, crmask, jnp.stack(counts)


def _lacosmic_dense_coords(data, inmask, rdnoise, p, coords):
    """Dense iterations on a column block with GLOBAL border masks.

    Bit-identical to the unsharded dense path on the corresponding
    frame columns: the median/Laplacian border restores and the masked
    cleaning use frame coordinates, so only true frame borders keep
    input values — shard seams get real stencil results (their data
    comes from the halo exchange).
    """
    from blackbox_tpu.ops.filters import (
        _strip_apply_raw, _sc_column_views, _sc_window_views,
        sc_select_ops, apply_ops)

    col0, W_total = coords
    H, W = data.shape
    ri = jnp.arange(H, dtype=jnp.int32)[:, None]
    ci = (jnp.asarray(col0, jnp.int32)
          + jnp.arange(W, dtype=jnp.int32))[None, :]

    def bk(pk):
        return ((ri < pk) | (ri >= H - pk)
                | (ci < pk) | (ci >= W_total - pk))

    ring = (ri == 0) | (ri == H - 1) | (ci == 0) | (ci == W_total - 1)

    def medf(a, k):
        def fn(s):
            views = _sc_window_views(_sc_column_views(s, k), k)
            ops, wires = sc_select_ops(k, (k * k // 2,))
            return apply_ops(views, ops)[wires[0]]
        out = _strip_apply_raw(a, k, p.strip_rows, fn)
        return jnp.where(bk(k // 2), a, out)

    def lapf(v):
        # same formula as the windowed path — sharing it keeps the
        # sharded/dense bit-parity guarantee in one place
        return _win_laplacian(v, ring)

    clean = data
    crmask = jnp.zeros(data.shape, bool)
    counts = []
    # fixed-trip iterations, NO early-exit guard: the guard would need
    # the GLOBAL new-detection count (a psum under shard_map).  Under
    # clean-once semantics an iteration after a global zero-new round
    # is a provable no-op, so running it anyway stays bit-identical to
    # the guarded unsharded path.
    for _ in range(p.niter):
        cosm, m5un = _detect_math(clean, ~inmask, rdnoise, p, medf, lapf)
        new = cosm & ~crmask
        counts.append(jnp.sum(new))
        crmask = crmask | cosm
        bad = crmask | inmask
        repl = _win_masked_median(clean, bad.astype(jnp.float32), m5un,
                                  bk(2))
        clean = jnp.where(new, repl, clean)
    return clean, crmask, jnp.stack(counts)


def _detect_math(clean, good, rdnoise, p, medf, lapf):
    """One L.A.Cosmic detection round (shared by the dense strip path
    and the windowed path — identical op order keeps them bit-equal).

    medf(a, k): border-restoring k x k median; lapf(a): the subsampled
    Laplacian with zeroed frame-border ring.
    Returns (cosm bool, unclamped 5x5 median of ``clean``).
    """
    m5un = medf(clean, 5)
    # noise model from the 5x5 median (gain = 1: data already in e-)
    m5 = jnp.maximum(m5un, 1e-5)
    noise = jnp.sqrt(m5 + rdnoise ** 2)

    # Laplacian SNR, large-scale structure removed
    s = lapf(clean) / (2.0 * noise)
    sp = s - medf(s, 5)

    # fine structure: med3 - med7(med3), floor 0.01
    m3 = medf(clean, 3)
    m37 = medf(m3, 7)
    f = jnp.maximum((m3 - m37) / noise, 0.01)

    cosm = (sp > p.sigclip) & (sp / f > p.objlim) & good
    # grow to neighbours that are also significant
    cosm = dilate(cosm, 3) & (sp > p.sigclip) & good
    # wider growth at the reduced threshold
    cosm = dilate(cosm, 5) & (sp > p.sigclip * p.sigfrac) & good
    return cosm, m5un


_WIN_MARGIN = 24      # data halo per window side (>= 21 = worst-case
                      # stencil composition: 12 scatter + 2 clean + 7
                      # detect); 24 leaves slack
_SCAT_MARGIN = 12     # scatter halo: covers detect radius 7 + clean 2


def _extrema5_sep(a, maximum: bool):
    """Edge-padded separable 5x5 running max/min (8 VPU ops/px vs the
    exact 5x5 median's 160 — the pre-screen's whole point)."""
    from jax import lax
    r = 2
    p = jnp.pad(a, r, mode="edge")
    init = -jnp.inf if maximum else jnp.inf
    op = lax.max if maximum else lax.min
    out = lax.reduce_window(p, init, op, (5, 1), (1, 1), "VALID")
    return lax.reduce_window(out, init, op, (1, 5), (1, 1), "VALID")


def _prescreen_seeds(clean, good, rdnoise, p):
    """Cheap EXACT SUPERSET of the iteration-1 seed pixels.

    The seed test is ``sp > sigclip`` with ``sp = s - med5(s)``,
    ``s = lap / (2*sqrt(max(med5(clean),1e-5) + rd²))``.  Bound it from
    above with separable extrema instead of medians:

      noise_lo/hi from min5/max5(clean)   (min5 <= med5 <= max5)
      s_hi  = max(lap, 0) / (2*noise_lo)            >= s  pointwise
      s_lo  = lap / (2*noise_hi  if lap>=0 else noise_lo)  <= s
      sp_hi = s_hi - min5(s_lo)  >=  s - med5(s) = sp

    so ``sp_hi > sigclip`` can only ADD pixels, never lose one — the
    exact windowed detection then runs only around these cells.  The
    bound is loose at bright-star edges (noise_lo underestimates the
    local sky), which merely activates the star's cell.
    """
    lap = laplacian_subsampled(clean)
    m5_lo = jnp.maximum(_extrema5_sep(clean, False), 1e-5)
    m5_hi = jnp.maximum(_extrema5_sep(clean, True), 1e-5)
    noise_lo = jnp.sqrt(m5_lo + rdnoise ** 2)
    noise_hi = jnp.sqrt(m5_hi + rdnoise ** 2)
    s_hi = jnp.maximum(lap, 0.0) / (2.0 * noise_lo)
    s_lo = jnp.where(lap >= 0.0, lap / (2.0 * noise_hi),
                     lap / (2.0 * noise_lo))
    sp_hi = s_hi - _extrema5_sep(s_lo, False)
    return (sp_hi > p.sigclip) & good


def _win_median(a, k: int, border_keep):
    """k x k median of one window via the shared sorted-column network
    (same comparator sequence as ops.filters.median_filter, so results
    are bit-identical); ``border_keep`` marks global frame-border pixels
    that keep the input value."""
    from blackbox_tpu.ops.filters import (
        _sc_column_views, _sc_window_views, sc_select_ops, apply_ops)
    ap = jnp.pad(a, k // 2, mode="edge")
    views = _sc_window_views(_sc_column_views(ap, k), k)
    ops, wires = sc_select_ops(k, (k * k // 2,))
    med = apply_ops(views, ops)[wires[0]]
    return jnp.where(border_keep, a, med)


def _win_masked_median(a, badf, fallback, border_keep):
    """Masked 5x5 median of one window — ops.filters.masked_median_filter
    semantics (bad -> +big before the shared column sorts; dynamic rank
    selection; all-bad -> fallback; frame border -> input)."""
    from blackbox_tpu.ops.filters import (
        _sc_window_views, sorted_column_network, transposition_pairs,
        apply_ops)
    k = 5
    big = jnp.asarray(jnp.finfo(a.dtype).max, a.dtype)
    ap = jnp.pad(a, 2, mode="edge")
    bp = jnp.pad(badf, 2, mode="edge")
    h = ap.shape[0] - (k - 1)
    W = ap.shape[1] - (k - 1)
    bviews_col = [bp[dy:dy + h, :] > 0.5 for dy in range(k)]
    vals_col = [jnp.where(b, big, ap[dy:dy + h, :])
                for dy, b in enumerate(bviews_col)]
    colv = apply_ops(vals_col,
                     [("ce", x, y) for x, y in transposition_pairs(k)])
    views = _sc_window_views(colv, k)
    pairs, order = sorted_column_network(k)
    sw = apply_ops(views, [("ce", x, y) for x, y in pairs])
    vs = [sw[w] for w in order]
    n = sum(jnp.int32(1) - b[:, dx:dx + W].astype(jnp.int32)
            for b in bviews_col for dx in range(k))
    i_lo = jnp.maximum(n - 1, 0) // 2
    i_hi = n // 2
    lo = jnp.zeros_like(vs[0])
    hi = jnp.zeros_like(vs[0])
    for r, vr in enumerate(vs):
        lo = jnp.where(i_lo == r, vr, lo)
        hi = jnp.where(i_hi == r, vr, hi)
    med = 0.5 * (lo + hi)
    med = jnp.where(n > 0, med, fallback)
    return jnp.where(border_keep, a, med)


def _win_laplacian(v, ring):
    """Subsampled-Laplacian formula of ops.filters.laplacian_subsampled
    on one window; ``ring`` marks the global frame-border ring (zeroed,
    like the dense path)."""
    up = jnp.roll(v, 1, 0)
    dn = jnp.roll(v, -1, 0)
    lf = jnp.roll(v, 1, 1)
    rt = jnp.roll(v, -1, 1)
    pos = lambda a: jnp.maximum(a, 0.0)  # noqa: E731
    lplus = 0.25 * (pos(2 * v - up - lf) + pos(2 * v - up - rt)
                    + pos(2 * v - dn - lf) + pos(2 * v - dn - rt))
    return jnp.where(ring, 0.0, lplus)


def _windowed_pass(clean, crmask, inmask, rdnoise, p, detect: bool,
                   place_mask=None):
    """One exact L.A.Cosmic round evaluated only on windows around
    active cells (cells containing cosmic pixels).

    detect=True  : full iteration (detection + cleaning) — valid for
                   iterations >= 2, where new detections are confined to
                   the stencil neighbourhood of previously cleaned px,
                   OR for iteration 1 with ``place_mask`` set to an
                   exact seed superset (:func:`_prescreen_seeds` — every
                   final detection lies within the 3-px growth radius of
                   a seed, inside the seed cell's scatter halo).
    detect=False : cleaning only (after a dense detection round).
    place_mask   : bool map that places the windows (default: crmask).

    Bit-identical to the dense path by construction: identical
    comparator networks, identical arithmetic order, and global-
    coordinate border handling inside each window.  Falls back to the
    dense formulation when > max_cells cells are active.
    """
    import jax
    from jax import lax

    H, W = clean.shape
    CS, M, SM = p.cell, _WIN_MARGIN, _SCAT_MARGIN
    WS = CS + 2 * M
    Hc, Wc = -(-H // CS), -(-W // CS)
    cap = min(p.max_cells, Hc * Wc)
    chunk = min(p.window_chunk, cap)
    nchunks = -(-cap // chunk)

    # ---- active cells -------------------------------------------------
    pm = crmask if place_mask is None else place_mask
    crp = jnp.zeros((Hc * CS, Wc * CS), bool).at[:H, :W].set(pm)
    # two 1-D reductions, NOT one (CS, CS) window: the 2-D window's
    # scoped-VMEM stripe at full frame width exceeds the v5e 16 MB limit
    rows = lax.reduce_window(crp.astype(jnp.float32), 0.0, lax.add,
                             (CS, 1), (CS, 1), "VALID")
    cell_any = lax.reduce_window(rows, 0.0, lax.add,
                                 (1, CS), (1, CS), "VALID") > 0.0
    cnt = jnp.cumsum(cell_any.ravel().astype(jnp.int32))
    nact = cnt[-1]
    ks = jnp.arange(1, cap + 1, dtype=jnp.int32)
    pos_ = jnp.clip(jnp.searchsorted(cnt, ks, side="left"),
                    0, Hc * Wc - 1)
    cy = (pos_ // Wc).astype(jnp.int32)
    cx = (pos_ % Wc).astype(jnp.int32)

    # ---- padded planes (edge-pad like the dense strip pipeline) -------
    pad2 = ((M, Hc * CS - H + M), (M, Wc * CS - W + M))
    Pc = jnp.pad(clean, pad2, mode="edge")
    Pi = jnp.pad(inmask.astype(jnp.float32), pad2, mode="edge")
    Pm = jnp.pad(crmask.astype(jnp.float32), pad2, mode="edge")

    def _frames(oy, ox):
        """Window frame-coordinate helpers: in-frame mask, border masks
        at stencil radius pk, and the exact frame-border ring."""
        ys = oy + jnp.arange(WS, dtype=jnp.int32)
        xs = ox + jnp.arange(WS, dtype=jnp.int32)
        in_f = (((ys >= 0) & (ys < H))[:, None]
                & ((xs >= 0) & (xs < W))[None, :])

        def bk(pk):
            return (((ys < pk) | (ys >= H - pk))[:, None]
                    | ((xs < pk) | (xs >= W - pk))[None, :])

        ring = (((ys == 0) | (ys == H - 1))[:, None]
                | ((xs == 0) | (xs == W - 1))[None, :])
        return in_f, bk, ring

    def body_detect(cw, iw, mw, oy, ox):
        """Detection phase of one window (no cleaning math)."""
        in_f, bk, ring = _frames(oy, ox)
        medf = lambda a, k: _win_median(a, k, bk(k // 2))  # noqa: E731
        good = (iw <= 0.5) & in_f
        crm0 = mw > 0.5
        if detect:
            cosm, m5un = _detect_math(
                cw, good, rdnoise, p, medf,
                lambda v: _win_laplacian(v, ring))
            cosm = cosm & in_f
            new = cosm & ~crm0
            crm = crm0 | cosm
        else:
            # clean pass after a dense detection round: every placed
            # pixel is a new detection (clean-once semantics)
            m5un = medf(cw, 5)
            new = crm0
            crm = crm0
        # changed=False means cleaning would be the identity and crm ==
        # crm0 everywhere: the caller skips the clean and the scatter
        return new, crm, m5un, jnp.any(new)

    def body_clean(cw, iw, new, crm, m5un, oy, ox):
        """Cleaning phase: masked 5x5 median at this round's new px."""
        _, bk, _ = _frames(oy, ox)
        badf = jnp.maximum(crm.astype(jnp.float32), iw)
        repl = _win_masked_median(cw, badf, m5un, bk(2))
        return jnp.where(new, repl, cw)

    def run_chunk(ci, carry):
        OC, OM = carry
        c0 = ci * chunk

        def do(car):
            OC, OM = car
            oy_p = lax.dynamic_slice_in_dim(cy, c0, chunk) * CS
            ox_p = lax.dynamic_slice_in_dim(cx, c0, chunk) * CS
            g = lambda P: jax.vmap(                     # noqa: E731
                lambda y, x: lax.dynamic_slice(P, (y, x), (WS, WS))
            )(oy_p, ox_p)
            CWin, IWin = g(Pc), g(Pi)
            NEW, CRM, M5, CH = jax.vmap(body_detect)(
                CWin, IWin, g(Pm), oy_p - M, ox_p - M)
            nin = jnp.clip(nact - c0, 0, chunk)
            # padded slots beyond nact gather real (clamped) windows —
            # mask their change flags so they neither trigger the clean
            # phase nor scatter
            CH = CH & (jnp.arange(chunk) < nin)

            def clean_scatter(car2):
                CW = jax.vmap(body_clean)(CWin, IWin, NEW, CRM, M5,
                                          oy_p - M, ox_p - M)
                CMf = CRM.astype(jnp.float32)

                def sc(j, car3):
                    def wr(car4):
                        OC2, OM2 = car4
                        y = oy_p[j] + (M - SM)
                        x = ox_p[j] + (M - SM)
                        sl = (slice(M - SM, M + CS + SM),) * 2
                        OC2 = lax.dynamic_update_slice(OC2, CW[j][sl],
                                                       (y, x))
                        OM2 = lax.dynamic_update_slice(OM2, CMf[j][sl],
                                                       (y, x))
                        return OC2, OM2

                    # a window with no new pixels would scatter back
                    # the exact values already in the canvases — skip
                    # its two sequential update ops
                    return lax.cond(CH[j], wr, lambda c: c, car3)

                return lax.fori_loop(0, nin, sc, car2)

            # detection-only iterations that confirm "nothing new" in
            # this chunk skip the masked-median math and the whole
            # scatter chain
            return lax.cond(jnp.any(CH), clean_scatter,
                            lambda c: c, (OC, OM))

        return lax.cond(c0 < nact, do, lambda car: car, (OC, OM))

    def windowed(_):
        OC, OM = lax.fori_loop(0, nchunks, run_chunk, (Pc, Pm))
        return OC[M:M + H, M:M + W], OM[M:M + H, M:M + W] > 0.5

    def dense(_):
        if detect:
            cosm, m5un = _detect_math(
                clean, ~inmask, rdnoise, p,
                lambda a, k: median_filter(a, k, p.strip_rows),
                laplacian_subsampled)
            new = cosm & ~crmask
            crm = crmask | cosm
        else:
            m5un = median_filter(clean, 5, p.strip_rows)
            new = crmask
            crm = crmask
        repl = masked_median_filter(clean, crm | inmask, 5,
                                    p.strip_rows, fallback=m5un)
        return jnp.where(new, repl, clean), crm

    return lax.cond(nact <= cap, windowed, dense, 0)


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

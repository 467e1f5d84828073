"""Satellite-trail detection via an FFT projection-slice Radon transform.

The reference detects trails either with the ASTA keras U-Net or with
acstools' Hough-transform fallback (/root/reference/blackbox.py:4090-4254).
The device-native equivalent: the Radon transform of the (binned,
background-subtracted, winsorised) significance map, computed through the
projection-slice theorem — one 2-D FFT, a tiny bilinear sampling of the
spectrum along each angle's central slice, and batched 1-D inverse FFTs.
A shear-gather formulation costs ~34 s at 10.5k² on one v5e chip (TPU
gathers); the FFT route is ~100 ms.  Trails show up as peaks of the
length-normalised line integral over (angle, offset); peaks are
rasterised back into a widened trail mask.

A flax U-Net port (ASTA-equivalent) is provided in
:mod:`blackbox_tpu.models.trailnet`; this Radon path is the
dependency-free default and the legacy-parity fallback.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SatDetParams:
    bin_factor: int = 16         # binning before the transform (see
                                 # config.defaults sat_bin; measured
                                 # v5e at 10560²: 16x is ~9 ms cheaper
                                 # in context than 8x AND more
                                 # sensitive — a 1.2-sigma/px full
                                 # trail is found at 16x, missed at
                                 # 8x; no false positive on the
                                 # structured bench frame; the
                                 # rasterised mask widens ~2x with the
                                 # coarser localisation)
    n_slopes: int = 101          # slopes in [-1, 1] per orientation
    nsigma: float = 8.0          # peak threshold over profile noise
    min_fill: float = 0.2        # min fraction of line inside the frame
    winsor_clip: float = 2.5     # significance winsorisation: keeps the
                                 # statistic length-driven, so compact
                                 # bright stars cannot fake a trail
    lit_frac: float = 0.5        # min fraction of line pixels lit (>2σ)
    lit_sigma: float = 2.0
    trail_halfwidth: int = 5     # half-width of the rasterised trail mask
    max_trails: int = 8          # static cap on detected trails
    band_widths: tuple = (1, 5, 15)
    # offset-band integration widths: the angle grid resolves ~N·Δθ
    # pixels of drift, so a LONG trail midway between grid angles
    # smears its energy over ~L·Δθ/2 offset bins (14 bins for a
    # full-diagonal MeerLICHT trail at bin 8) — the single-line lit
    # fraction then collapses and the trail is lost.  Summing the
    # profiles over a band of w offsets recovers it at only a sqrt(w)
    # SNR price; each (angle, offset) keeps the best band.


def _bin2d(img, f: int):
    """f x f average binning as strided window reduction.

    reduce_window, NOT reshape(Hc, f, Wc, f).mean((1, 3)): under vmap
    the reshape materialises a 5-D temp whose (…, f, …, f) trailing
    dims are tile-padded to (8, 128) — 28 GB at full frame size.
    """
    H, W = img.shape
    Hc, Wc = H // f, W // f
    s = jax.lax.reduce_window(img[:Hc * f, :Wc * f], 0.0, jax.lax.add,
                              (f, f), (f, f), "VALID")
    return s / jnp.float32(f * f)


def _radon_fft(stack, n_angles: int, pack: bool = False):
    """Radon transform by the projection-slice theorem.

    stack : (B, Hb, Wb) real maps (zero background assumed)
    Returns (projections (B, n_angles, N), angles (n_angles,)), where
    projection[b, j, t] integrates stack[b] along the line
    ``(x-cx)·cosθ_j + (y-cy)·sinθ_j = t - N/2`` (x = column, y = row).

    With ``pack=True`` PAIRS of real maps ride one complex ``fft2``
    each (``a + i·b``), separated at the slice taps by hermitian
    symmetry — bilinear interpolation with mod-N taps commutes exactly
    with the conjugate mirror, so unpacking after sampling equals
    sampling the unpacked spectra (parity-tested).  Packing is OFF by
    default: at the production grid (N=2048, A=202) the doubled tap
    gathers cost more than the one saved fft2 (68.4 vs 45.4 ms on
    v5e) — the slice sampling, not the transform, is the binding cost
    at this size.
    """
    Bn, Hb, Wb = stack.shape
    # 1.5x padding: the projection support spans the image diagonal
    # (~1.42x), and mod-N wraparound must not alias distinct lines.
    # Production-scale grids round up to an FFT-friendly size (odd-radix
    # transforms are several times slower on TPU; ops.zogy
    # .fast_fft_size); tiny test grids keep the minimal even size, where
    # the transform is cheap either way.
    N = int(np.ceil(1.5 * max(Hb, Wb)))
    if N > 512:
        from blackbox_tpu.ops.zogy import fast_fft_size
        N = fast_fft_size(N)
    if N % 2:
        N += N % 2

    npk = (Bn // 2) if pack else 0          # packed channel pairs
    rem = Bn - 2 * npk
    work = stack[0:2 * npk:2] + 1j * stack[1:2 * npk:2]
    if rem:
        work = jnp.concatenate(
            [work, stack[2 * npk:].astype(work.dtype)], axis=0)
    Bw = work.shape[0]
    Zp = jnp.zeros((Bw, N, N), work.dtype)
    Zp = Zp.at[:, :Hb, :Wb].set(work)       # corner origin

    F = jnp.fft.fftshift(jnp.fft.fft2(Zp), axes=(-2, -1))  # centred freq

    thetas = jnp.linspace(0.0, jnp.pi, n_angles, endpoint=False)
    u = (jnp.arange(N) - N // 2).astype(jnp.float32)       # (N,)
    # slice sample positions in the centred spectrum: kx along +x
    # (columns), ky along +y (rows)
    kx = u[None, :] * jnp.cos(thetas)[:, None] + N // 2    # (A, N)
    ky = u[None, :] * jnp.sin(thetas)[:, None] + N // 2
    flat = F.reshape(Bw, -1)

    def sample(kx, ky, chans: slice):
        """Bilinear interpolation of the complex spectrum (A*N*4 taps).

        Taps wrap mod N — the DFT spectrum is periodic, and modular
        indexing (unlike edge clamping) commutes with the conjugate
        mirror, which the packed-channel unpacking relies on."""
        x0f = jnp.floor(kx)
        y0f = jnp.floor(ky)
        fx = kx - x0f
        fy = ky - y0f
        x0 = jnp.mod(x0f.astype(jnp.int32), N)
        y0 = jnp.mod(y0f.astype(jnp.int32), N)
        x1 = jnp.mod(x0 + 1, N)
        y1 = jnp.mod(y0 + 1, N)
        fl = flat[chans]

        def tap(iy, ix):
            return fl[:, (iy * N + ix).reshape(-1)].reshape(
                fl.shape[0], *ix.shape)

        return ((1 - fy) * (1 - fx) * tap(y0, x0)
                + (1 - fy) * fx * tap(y0, x1)
                + fy * (1 - fx) * tap(y1, x0)
                + fy * fx * tap(y1, x1))                    # (B, A, N)

    S_dir = sample(kx, ky, slice(None))
    parts = []
    if npk:
        # conjugate-mirror samples of the packed spectra unpack a and b
        S_mir = sample(jnp.float32(N) - kx, jnp.float32(N) - ky,
                       slice(0, npk))
        Sa = 0.5 * (S_dir[:npk] + jnp.conj(S_mir))
        Sb = -0.5j * (S_dir[:npk] - jnp.conj(S_mir))
        for a, b in zip(Sa, Sb):
            parts.extend([a[None], b[None]])
    if rem:
        parts.append(S_dir[npk:])
    S = jnp.concatenate(parts, axis=0)                      # (Bn, A, N)

    # p[m] integrates along x·cosθ + y·sinθ ≡ m (mod N), corner coords
    proj = jnp.fft.ifft(jnp.fft.ifftshift(S, axes=-1), axis=-1).real
    return jnp.maximum(proj, 0.0), thetas, N


def detect_trails(image, mask_excl=None,
                  params: SatDetParams = SatDetParams(),
                  seam_rows: tuple = (), seam_cols: tuple = (),
                  want_lines: bool = False):
    """Detect straight bright trails.

    image : (H, W) background-subtracted (or raw; the median is removed)
    mask_excl : optional bool — pixels ignored (saturated columns etc.)
    seam_rows/seam_cols : static full-resolution coordinates of the
        detector's channel boundaries.  An axis-aligned detection whose
        mask would cover a seam is an INSTRUMENT artifact (bias/flat
        mismatch between readout channels — strong when a frame is
        reduced without masters), not a satellite: those peaks are
        vetoed.  A genuine satellite exactly along a seam is vanishingly
        rare, and seams are a tiny fraction of the frame at production
        channel sizes.

    Returns (trail_mask bool (H, W), n_trails, peak_snr), plus — with
    ``want_lines=True`` — a dict of per-slot line parameters
    ``{"theta" (rad), "t" (signed offset, BINNED px, corner origin),
    "snr" (0 = inactive slot)}`` used by the tiled segment mode's
    cross-tile dedup (a line is ``(x/f)·cosθ + (y/f)·sinθ = t``).
    """
    p = params
    H, W = image.shape
    B = _bin2d(image, p.bin_factor)
    excl = None
    if mask_excl is not None:
        excl = _bin2d(mask_excl.astype(jnp.float32), p.bin_factor) > 0.5
        B = jnp.where(excl, jnp.median(B), B)
    # local background removal: a global median is NOT enough — the
    # flat-field vignette leaves large-scale sky gradients that light up
    # whole line integrals and fake trails.  Clipped mesh + bicubic
    # upsample on the (cheap) binned map.
    from blackbox_tpu.ops.background import background_mesh, mini2back
    Hb, Wb = B.shape
    # a FIXED small mesh box (in binned px), not size-proportional: the
    # background stage must absorb instrument structure sharper than
    # the old min(H,W)//4 box could follow (vignette edges, channel-
    # seam steps — genuine straight features the band statistic would
    # otherwise flag as trails), while a 1-2-bin-wide trail cannot
    # shift a 16-bin box median and survives untouched
    box = max(min(min(Hb, Wb) // 4, 16), 4)
    mesh, stdm = background_mesh(B[:Hb // box * box, :Wb // box * box],
                                 None, box)
    bkg = mini2back(mesh, (Hb, Wb), box)
    med = jnp.median(B - bkg)
    mad = jnp.median(jnp.abs(B - bkg - med)) * 1.4826 + 1e-6
    sig = (B - bkg - med) / mad
    Z = jnp.clip(sig, 0.0, p.winsor_clip)     # winsorised signif. map
    lit = (sig > p.lit_sigma).astype(jnp.float32)
    if excl is not None:
        Z = jnp.where(excl, 0.0, Z)
        lit = jnp.where(excl, 0.0, lit)
    # analytic baseline of clip(max(z,0), c) for unit-normal noise: the
    # line statistic must be a true z-score, not a raw mean (positive
    # clipping leaves a ~0.29/px floor that scales with sqrt(n))
    import math
    c = p.winsor_clip
    phi0 = 1.0 / math.sqrt(2 * math.pi)
    phic = phi0 * math.exp(-0.5 * c * c)
    tail = 0.5 * math.erfc(c / math.sqrt(2))
    z_mean = (phi0 - phic) + c * tail
    # second moment: E[min(max(z,0),c)²] = ∫₀ᶜ z²φ(z)dz + c²·P(z>c),
    # with ∫₀ᶜ z²φ(z)dz = ½·erf(c/√2) − c·φ(c)
    int_z2 = 0.5 * math.erf(c / math.sqrt(2)) - c * phic
    z_var = (int_z2 + c * c * tail) - z_mean ** 2

    from jax import lax
    n_angles = 2 * p.n_slopes
    ones = jnp.ones_like(Z)
    if excl is not None:
        ones = jnp.where(excl, 0.0, ones)
    proj, thetas, N = _radon_fft(jnp.stack([Z, lit, ones]), n_angles)
    prof, litprof, nhit_raw = proj[0], proj[1], proj[2]

    def boxsum(a, w):
        """Box sum of w offsets, wrap-padded (the Radon offset axis is
        periodic mod N)."""
        if w == 1:
            return a
        pa = jnp.pad(a, ((0, 0), (w // 2, w - 1 - w // 2)), mode="wrap")
        return lax.reduce_window(pa, 0.0, lax.add, (1, w), (1, 1),
                                 "VALID")

    min_len = p.min_fill * min(Z.shape)
    # usable band widths scale with the PHYSICAL angle-grid drift: a
    # line misaligned by up to half a grid step wanders at most
    # diag/2 · pi/n_angles offsets over its length — bands wider than
    # that only collect scattered star light / residual structure (a
    # 15-bin band is a quarter of a tiny test map and false-positived
    # on it, while at the production grid the full drift is ~15 bins)
    import math as _m
    drift = 1.42 * max(Z.shape) * _m.pi / (2 * n_angles)
    # width 1 (the plain single-line statistic) is always present so
    # the filter can never leave the set empty
    widths = (1,) + tuple(w for w in p.band_widths
                          if w != 1 and (w - 1) // 2 <= _m.ceil(drift))
    nhit1 = jnp.maximum(nhit_raw, 1.0)
    # single-line z against the global clipped-noise baseline: used to
    # refine each band detection's centre and measure its true offset
    # extent before rasterising (a band only localises to +-w/2)
    s_line = (prof / nhit1 - z_mean) * jnp.sqrt(nhit1 / z_var)
    snr = jnp.zeros_like(prof)
    band_w = jnp.ones_like(prof)
    for w in widths:
        pw = boxsum(prof, w)
        lw = boxsum(litprof, w)
        nw = jnp.maximum(boxsum(nhit_raw, w), 1.0)
        # normalised mean significance over the band; require decent fill
        line_len = nw / w
        fill_ok = line_len >= min_len
        # a trail is LONG: its lit pixels add up to a line-length's
        # worth (compact star disks light only a small stretch); the
        # band denominator is ONE line's length, not the band area
        lit_ok = (lw / jnp.maximum(line_len, 1.0)) >= p.lit_frac
        # a trail is LOCALISED in offset: score the band against its
        # own FLANKS (w offsets each side), not just the global clipped-
        # noise baseline.  Detector-row/column structure (channel-seam
        # bias steps, flat gradients) elevates a half-plane of offsets —
        # its flank is as bright as the band and the contrast vanishes —
        # while a real trail's wander is bounded by the band, leaving
        # clean flanks.  The score is normalised PER LINE (/sqrt(w)):
        # a wide band sums w lines of scattered star light, and the
        # raw band z would scale past threshold on star-rich fields.
        p3 = boxsum(prof, 3 * w)
        n3 = jnp.maximum(boxsum(nhit_raw, 3 * w), 1.0)
        flank_n = jnp.maximum(n3 - nw, 1.0)
        flank_mean = jnp.maximum((p3 - pw) / flank_n, z_mean)
        snr_w = (pw / nw - flank_mean) * jnp.sqrt(nw / z_var / w)
        snr_w = jnp.where(fill_ok & lit_ok, snr_w, 0.0)
        upd = snr_w > snr
        snr = jnp.where(upd, snr_w, snr)
        band_w = jnp.where(upd, jnp.float32(w), band_w)   # (A, N)

    # peak picking with non-max suppression; band sums plateau, so break
    # ties with a tiny deterministic ramp (else every plateau point
    # passes `>= local_max` and one trail eats several top-k slots)
    wmax = max(widths)
    tw = max(11, 2 * wmax + 1)
    # angle window: a bright trail of frame-scale length L elevates
    # lines tilted by up to ~wmax/L rad (they stay inside a wmax band
    # while crossing it), i.e. ghost peaks up to that many grid steps
    # away — suppress them (capped: two genuinely distinct trails
    # within the window would merge)
    aw = int(np.clip(
        2 * round(wmax / (min(Z.shape) * np.pi / n_angles)) + 1, 5, 33))
    ramp = (jnp.arange(snr.size, dtype=jnp.float32)
            .reshape(snr.shape)) * jnp.float32(1e-9)
    snr = jnp.where(snr > 0, snr + ramp, snr)
    padded = jnp.pad(snr, ((aw // 2, aw // 2), (tw // 2, tw // 2)),
                     constant_values=0)
    local_max = lax.reduce_window(padded, -jnp.inf, lax.max,
                                  (aw, tw), (1, 1), "VALID")
    is_peak = (snr >= local_max) & (snr > p.nsigma)
    vals = jnp.where(is_peak, snr, 0.0).ravel()
    top_v, i = jax.lax.top_k(vals, p.max_trails)
    n_trails = jnp.sum(top_v > 0)
    th = thetas[i // N]
    m0 = (i % N).astype(jnp.float32)
    w_at = band_w.ravel()[i]                 # winning band per peak

    # refine each band peak with the single-line profile: recentre on
    # its argmax within the winning band and mask only the measured
    # elevated extent (blanket hw + w/2 widening wiped half a small
    # frame when a wide band won).  The window is sized by BOTH the
    # widest band and the thick-structure threshold, so the run
    # measurement below can always see a veto-worthy structure.
    thick_lines = max(3, int(np.ceil(96.0 / p.bin_factor)))
    WIN = max(wmax, thick_lines + 1)
    s_pad = jnp.pad(s_line, ((0, 0), (WIN, WIN)), mode="wrap")
    lf_pad = jnp.pad(litprof / nhit1, ((0, 0), (WIN, WIN)),
                     mode="wrap")
    pos = jnp.arange(2 * WIN + 1, dtype=jnp.float32) - WIN

    def refine(k):
        a = i[k] // N
        t0 = i[k] % N
        win = lax.dynamic_slice(s_pad, (a, t0), (1, 2 * WIN + 1))[0]
        lfw = lax.dynamic_slice(lf_pad, (a, t0), (1, 2 * WIN + 1))[0]
        inband = jnp.abs(pos) <= 0.5 * (w_at[k] - 1.0) + 1e-3
        winb = jnp.where(inband, win, -jnp.inf)
        off = pos[jnp.argmax(winb)]
        lit_line = inband & (win > 2.0)
        ext = jnp.sum(lit_line.astype(jnp.float32))
        # THICK-STRUCTURE veto: a smeared satellite lights each single
        # line only fractionally (its wander crosses line t for a
        # stretch ~L/smear), while a bright band narrower than the
        # background-mesh box survives the mesh and lights many
        # adjacent lines END TO END.  The threshold is a PHYSICAL
        # width (> ~96 full px of fully-lit lines => not a trail; a
        # fixed line COUNT rejected real 16-48 px trails at bin 8),
        # measured as the contiguous fully-lit RUN through the peak —
        # peaks of a band sit at its edges, where a symmetric count
        # sees only half the structure.
        idxw = jnp.arange(2 * WIN + 1)
        fullf = lfw >= 0.8
        above = jnp.min(jnp.where(~fullf & (idxw >= WIN), idxw,
                                  2 * WIN + 1))
        below = jnp.max(jnp.where(~fullf & (idxw <= WIN), idxw, -1))
        run = above - below - 1
        return (m0[k] + off, jnp.maximum(ext - 1.0, 0.0),
                run >= thick_lines)

    m0_ref, ext, thick = jax.vmap(refine)(jnp.arange(p.max_trails))
    top_v = jnp.where(thick, 0.0, top_v)
    n_trails = jnp.sum(top_v > 0)

    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    f = float(p.bin_factor)
    hw = p.trail_halfwidth

    if seam_rows or seam_cols:
        # veto axis-aligned peaks whose mask covers a channel seam
        # seams are EXACTLY axis-aligned, so the angle gate is a few
        # grid steps (a 10-degrees-off trail near a seam is a real
        # satellite, not an artifact); within the gate, the seam's
        # Radon offset still varies across the frame by up to
        # span = extent·|off-axis component| — fold that into the
        # distance tolerance instead of sampling mid-frame only
        ang_gate = 3.0 * float(np.pi) / n_angles

        def seam_hit(k):
            wander = 1.42 * max(Z.shape) * np.pi / (2.0 * n_angles)
            hw_k = hw + 0.5 * jnp.maximum(ext[k],
                                          jnp.float32(wander)) * f
            cth, sth = jnp.cos(th[k]), jnp.sin(th[k])
            hit = jnp.bool_(False)
            for r in seam_rows:
                t_seam = (0.5 * W / f) * cth + (float(r) / f) * sth
                d = jnp.abs(jnp.mod(t_seam - m0_ref[k] + N / 2.0,
                                    float(N)) - N / 2.0)
                span = 0.5 * (W / f) * jnp.abs(cth)
                hit |= ((jnp.abs(cth) < ang_gate)
                        & ((d - span) * f <= hw_k + f))
            for c in seam_cols:
                t_seam = (float(c) / f) * cth + (0.5 * H / f) * sth
                d = jnp.abs(jnp.mod(t_seam - m0_ref[k] + N / 2.0,
                                    float(N)) - N / 2.0)
                span = 0.5 * (H / f) * jnp.abs(sth)
                hit |= ((jnp.abs(sth) < ang_gate)
                        & ((d - span) * f <= hw_k + f))
            return hit

        vetoed = jax.vmap(seam_hit)(jnp.arange(p.max_trails))
        top_v = jnp.where(vetoed, 0.0, top_v)
        n_trails = jnp.sum(top_v > 0)

    def line_mask(k):
        # binned corner-origin line coordinate, wrap-aware mod-N
        # distance; outer-sum form (two 1-D vectors broadcast-added)
        # keeps the per-pixel work to add+mod+abs+cmp
        ax = (xx[0] / f) * jnp.cos(th[k])                  # (W,)
        ay = (yy[:, 0] / f) * jnp.sin(th[k])               # (H,)
        t = ay[:, None] + ax[None, :]
        d = jnp.abs(jnp.mod(t - m0_ref[k] + N / 2.0, float(N))
                    - N / 2.0)
        # the measured lit extent quantises DOWN at coarse offset
        # bins: a trail misaligned by up to half an angle-grid step
        # wanders +-diag*pi/(4*n_angles) offsets over its length, which
        # rounds to ~1 bin at bin 16 — the physical wander bound floors
        # the widening or the mask strands the trail's ends (measured
        # at bin 16: 42% coverage of a misaligned 4096-px trail without
        # the floor, >80% with it; bin 8 resolved the extent and never
        # needed it)
        wander = 1.42 * max(Z.shape) * np.pi / (2.0 * n_angles)
        hw_k = hw + 0.5 * jnp.maximum(ext[k], jnp.float32(wander)) * f
        return d * f <= hw_k

    # rasterise only ACTIVE slots: frames carry 0-2 trails against the
    # static max_trails capacity, and a vmap over all slots pays
    # max_trails full-frame distance fields plus an (S, H, W) bool
    # round trip through HBM for the any-reduce.  The cond chain is
    # bit-identical (an inactive slot contributes all-False) and skips
    # the full-frame work for empty slots entirely.
    trail_mask = jnp.zeros((H, W), bool)
    for k in range(p.max_trails):
        trail_mask = lax.cond(top_v[k] > 0,
                              lambda acc, k=k: acc | line_mask(k),
                              lambda acc: acc, trail_mask)
    if want_lines:
        # canonical signed offset in [-N/2, N/2): mod-N wrap removed so
        # offsets from different tile/frame mod bases are comparable
        t_phys = jnp.mod(m0_ref + N / 2.0, float(N)) - N / 2.0
        lines = {"theta": th, "t": t_phys, "snr": top_v}
        return trail_mask, n_trails, top_v, lines
    return trail_mask, n_trails, top_v


def detect_trail_segments(image, mask_excl=None,
                          params: SatDetParams = SatDetParams(),
                          seam_rows: tuple = (), seam_cols: tuple = (),
                          tiles: int = 2, exclude_lines=None):
    """Partial-trail detection: the band-Radon detector on an
    overlapping ``(2·tiles-1) x (2·tiles-1)`` grid of half-stride
    subframes, with cross-tile NMS so every physical trail counts ONCE.

    The full-frame statistic integrates each candidate line END TO END,
    so a streak lighting only ~1/4 of its line (a tumbling satellite, a
    glint, a trail entering mid-exposure) fails the lit-fraction gate
    even at 5 sigma/px (measured at 10560^2, PERF_NOTES round 4) —
    the same blindness as the reference's acstools path, which its ASTA
    CNN covers.  Within a subframe the segment spans most of the local
    line, and a segment-tuned lit-fraction gate (0.3 instead of 0.5 —
    a trail's off-grid-angle wander splits its lit pixels over
    adjacent Radon offsets, so even a 60%-of-line segment measures
    ~0.35) admits it; the winsorised statistic, flank scoring, NMS and
    thick-structure/seam vetoes run unchanged.

    Cost: the overlapping half-stride grid runs ``(2·tiles-1)²``
    subframes of ``1/tiles²`` the frame area each — 9 quarter-size
    Radon transforms ≈ 2.25 full-frame-Radon equivalents at the
    default ``tiles=2`` (~83 ms per pass at 10560² on v5e).

    Cross-tile dedup: each tile's detections carry global line
    parameters (θ, offset); a greedy snr-ordered NMS merges detections
    whose lines coincide within the angle-grid resolution and the
    physical offset wander, so a segment seen by several overlapping
    tiles is counted once.  ``exclude_lines`` (the ``lines`` dict of a
    full-frame :func:`detect_trails` ``want_lines=True`` call, in the
    SAME binning) seeds the NMS with already-counted full trails:
    tile detections of those are suppressed and NOT counted, making
    ``n_trails_full + n_segments`` a physical trail count for the
    NSATS header.  Two genuinely distinct parallel trails closer than
    the offset tolerance (~2·band widths at production scale) would
    merge — the MASK is exact either way.

    Measured at 10560² on v5e: finds 1/4-frame streaks down to
    3 sigma/px that the full-frame detector misses at ANY amplitude;
    zero detections on pure noise and on a 150-star field; a
    structured synthetic science frame (4000 stars, seams, vignette,
    one real trail) yields a handful of genuine >14-sigma
    linear-structure detections, masking ~0.65% of the frame.  The
    peak threshold is floored at 12 sigma in this mode (a 10-sigma
    threshold doubled the structured-frame detections without any
    recall gain).  Production wiring: opt-in via
    ``ReductionSettings.detect_sat_segments`` — use where recall on
    short streaks beats specificity (the reference's ASTA CNN regime,
    blackbox.py:4112-4117).
    """
    from jax import lax
    params = dataclasses.replace(
        params, lit_frac=min(params.lit_frac, 0.3),
        nsigma=max(params.nsigma, 12.0))
    H, W = image.shape
    th_, tw_ = H // tiles, W // tiles
    # OVERLAPPING tile grid (stride = half a tile): a segment of
    # length >= 1/(2*tiles) of the frame then lies at least half
    # inside SOME tile — a non-overlapping grid splits a
    # boundary-straddling segment below the gate (measured at full
    # scale: a 1/4-frame streak across the 2x2 seam was lost)
    # the last start is pinned to the frame edge: H // tiles * tiles
    # can fall short of H, and the remainder strip must be covered too
    y0s = sorted({min(i * th_ // 2, H - th_)
                  for i in range(2 * tiles - 1)} | {H - th_})
    x0s = sorted({min(i * tw_ // 2, W - tw_)
                  for i in range(2 * tiles - 1)} | {W - tw_})
    mask = jnp.zeros((H, W), jnp.bool_)
    f = float(params.bin_factor)
    thetas_all, ts_all, snrs_all, seeds_all = [], [], [], []
    if exclude_lines is not None:
        thetas_all.append(exclude_lines["theta"])
        ts_all.append(exclude_lines["t"])
        snrs_all.append(exclude_lines["snr"])
        seeds_all.append(jnp.ones_like(exclude_lines["snr"], jnp.bool_))
    for y0 in y0s:
        for x0 in x0s:
            sub = image[y0:y0 + th_, x0:x0 + tw_]
            sexcl = (None if mask_excl is None
                     else mask_excl[y0:y0 + th_, x0:x0 + tw_])
            # INCLUSIVE lower bound: overlapping tile origins land
            # exactly on mid-frame channel seams (stride = th_/2), and
            # a seam at relative row/col 0 must still be vetoed
            srows = tuple(r - y0 for r in seam_rows
                          if y0 <= r < y0 + th_)
            scols = tuple(c - x0 for c in seam_cols
                          if x0 <= c < x0 + tw_)
            m, n, s, ln = detect_trails(sub, sexcl, params,
                                        seam_rows=srows,
                                        seam_cols=scols,
                                        want_lines=True)
            mask = mask.at[y0:y0 + th_, x0:x0 + tw_].set(
                mask[y0:y0 + th_, x0:x0 + tw_] | m)
            # tile-local line -> global frame coordinates: the line
            # (x/f)cosθ + (y/f)sinθ = t with tile-local (x, y) is
            # t_global = t + (x0·cosθ + y0·sinθ)/f at global (xg, yg)
            t_g = ln["t"] + (x0 * jnp.cos(ln["theta"])
                             + y0 * jnp.sin(ln["theta"])) / f
            thetas_all.append(ln["theta"])
            ts_all.append(t_g)
            snrs_all.append(ln["snr"])
            seeds_all.append(jnp.zeros_like(ln["snr"], jnp.bool_))

    theta = jnp.concatenate(thetas_all)
    t_off = jnp.concatenate(ts_all)
    snr = jnp.concatenate(snrs_all)
    seed = jnp.concatenate(seeds_all)
    K = int(theta.shape[0])

    # ---- cross-tile greedy NMS in (θ, global offset) space ----
    n_angles = 2 * params.n_slopes
    dth_grid = np.pi / n_angles
    wmax = max((1,) + tuple(params.band_widths))
    min_tile_b = min(th_, tw_) / f
    # angle tolerance: same ghost-fan logic as the in-tile NMS — a
    # segment of tile length L stays inside a wmax band while tilted
    # by up to ~wmax/L rad, i.e. that many grid steps of slack
    ang_steps = int(np.clip(2 * round(wmax / (min_tile_b * dth_grid))
                            + 1, 5, 33))
    ang_tol = 0.5 * ang_steps * dth_grid + 1e-6
    # offset tolerance: the misalignment wander over the FULL frame
    # baseline plus the winning band's localisation slack
    wander_full = 1.42 * (max(H, W) / f) * np.pi / (2.0 * n_angles)
    t_tol = wander_full + 0.5 * wmax + 2.0

    dth = theta[:, None] - theta[None, :]
    dt = t_off[:, None] - t_off[None, :]
    st = t_off[:, None] + t_off[None, :]
    direct = (jnp.abs(dth) <= ang_tol) & (jnp.abs(dt) <= t_tol)
    # θ lives on [0, π): a line near angle 0 registers at θ≈0 in one
    # tile and θ≈π-δ (with negated offset) in another
    flipped = ((jnp.abs(jnp.abs(dth) - np.pi) <= ang_tol)
               & (jnp.abs(st) <= t_tol))
    same = direct | flipped

    active = seed | (snr > 0)
    # seeds first, then by snr: a kept entry suppresses every matching
    # later entry, so tile echoes of a seed (or of a stronger tile
    # detection) never count
    order = jnp.argsort(-(jnp.where(seed, jnp.float32(1e9), 0.0) + snr))
    same_o = same[order][:, order]
    active_o = active[order]
    seed_o = seed[order]
    snr_o = snr[order]
    idx = jnp.arange(K)

    def body(k, keep):
        sup = same_o[k] & (idx > k) & keep[k] & active_o[k]
        return keep & ~sup

    keep = lax.fori_loop(0, K, body, active_o)
    new = keep & ~seed_o
    n_tot = jnp.sum(new).astype(jnp.int32)
    # top-k NEW peak significances (same shape contract as
    # detect_trails' third return)
    snr_out, _ = lax.top_k(jnp.where(new, snr_o, 0.0),
                           params.max_trails)
    return mask, n_tot, snr_out

"""Satellite-trail detection via a shear-sum Radon transform.

The reference detects trails either with the ASTA keras U-Net or with
acstools' Hough-transform fallback (/root/reference/blackbox.py:4090-4254).
The device-native equivalent here is a Radon transform computed by shearing:
for every slope ``a`` the image is sheared so lines of that slope become
rows, and a row sum gives the line integrals — all slopes batched as one
gather + reduction, steep lines handled on the transpose.  Trails show up
as peaks of the length-normalised line integral; detected (slope,
intercept) peaks are rasterised back into a widened trail mask.

A flax U-Net port (ASTA-equivalent) is provided in
:mod:`blackbox_tpu.models.trailnet`; this Radon path is the dependency-free
default and the legacy-parity fallback.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SatDetParams:
    bin_factor: int = 4          # binning before the transform
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


def _bin2d(img, f: int):
    H, W = img.shape
    Hc, Wc = H // f, W // f
    return img[:Hc * f, :Wc * f].reshape(Hc, f, Wc, f).mean(axis=(1, 3))


def _shear_profiles(B, n_slopes: int):
    """Line sums for slopes in [-1, 1]: out[a, b] = sum_x B[x, b + a*x].

    B is indexed (x, y) = (row, col); lines run along rows with |dy/dx|<=1.
    Returns (profiles (A, Wb), hit counts (A, Wb)).
    """
    Hx, Wy = B.shape
    slopes = jnp.linspace(-1.0, 1.0, n_slopes)
    x = jnp.arange(Hx)
    b = jnp.arange(Wy)

    def one_slope(a):
        # y index per (x, b); out-of-range contributes nothing
        yidx = jnp.round(b[None, :] + a * x[:, None]).astype(jnp.int32)
        valid = (yidx >= 0) & (yidx < Wy)
        yc = jnp.clip(yidx, 0, Wy - 1)
        vals = jnp.where(valid, jnp.take_along_axis(
            jnp.broadcast_to(B, (Hx, Wy)), yc, axis=1), 0.0)
        return vals.sum(axis=0), valid.sum(axis=0)

    # chunked over slopes to bound the gather transient: vmap inside,
    # sequential lax.map outside
    chunk = 8
    npad = -(-n_slopes // chunk) * chunk
    sl_pad = jnp.pad(slopes, (0, npad - n_slopes))
    prof, nhit = jax.lax.map(jax.vmap(one_slope),
                             sl_pad.reshape(-1, chunk))
    prof = prof.reshape(npad, Wy)[:n_slopes]
    nhit = nhit.reshape(npad, Wy)[:n_slopes]
    return prof, nhit


def detect_trails(image, mask_excl=None,
                  params: SatDetParams = SatDetParams()):
    """Detect straight bright trails.

    image : (H, W) background-subtracted (or raw; the median is removed)
    mask_excl : optional bool — pixels ignored (saturated columns etc.)

    Returns (trail_mask bool (H, W), n_trails, peak_snr).
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
    box = max(min(Hb, Wb) // 4, 8)
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
    slopes_grid = jnp.linspace(-1.0, 1.0, p.n_slopes)
    cand_v, cand_a, cand_b, cand_t = [], [], [], []
    for transpose in (False, True):
        Bt = Z.T if transpose else Z
        Lt = lit.T if transpose else lit
        prof, nhit = _shear_profiles(Bt, p.n_slopes)
        litprof, _ = _shear_profiles(Lt, p.n_slopes)
        nhit = jnp.maximum(nhit, 1)
        # normalised mean significance along the line; require decent fill
        line_mean = prof / nhit
        fill_ok = nhit >= (p.min_fill * Bt.shape[0])
        # a trail is LONG: most pixels along the line are individually lit
        # (compact star disks light only a small stretch)
        lit_ok = (litprof / nhit) >= p.lit_frac
        # z-score of the line mean against the clipped-noise baseline
        snr = (line_mean - z_mean) * jnp.sqrt(
            nhit.astype(jnp.float32) / z_var)
        snr = jnp.where(fill_ok & lit_ok, snr, 0.0)

        # peak picking with non-max suppression in a (5, 11) window
        padded = jnp.pad(snr, ((2, 2), (5, 5)), constant_values=0)
        local_max = lax.reduce_window(padded, -jnp.inf, lax.max,
                                      (5, 11), (1, 1), "VALID")
        is_peak = (snr >= local_max) & (snr > p.nsigma)
        vals = jnp.where(is_peak, snr, 0.0).ravel()
        v, i = jax.lax.top_k(vals, p.max_trails)
        Wb = snr.shape[1]
        cand_v.append(v)
        cand_a.append(slopes_grid[i // Wb])
        cand_b.append((i % Wb).astype(jnp.float32))
        cand_t.append(jnp.full(p.max_trails, int(transpose), jnp.int32))

    # merge the two orientations, keep the global top max_trails
    all_v = jnp.concatenate(cand_v)
    all_a = jnp.concatenate(cand_a)
    all_b = jnp.concatenate(cand_b)
    all_t = jnp.concatenate(cand_t)
    top_v, sel = jax.lax.top_k(all_v, p.max_trails)
    n_trails = jnp.sum(top_v > 0)
    slopes = all_a[sel]
    b0 = all_b[sel]
    t_idx = all_t[sel]

    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    f = float(p.bin_factor)
    hw = p.trail_halfwidth

    def line_mask(k):
        active = top_v[k] > 0
        s, b, tr = slopes[k], b0[k], t_idx[k]
        # orientation 0: line is col = s*row + b (in binned coords)
        # orientation 1 (transpose): row = s*col + b
        d0 = jnp.abs(xx / f - (s * yy / f + b))
        d1 = jnp.abs(yy / f - (s * xx / f + b))
        d = jnp.where(tr == 0, d0, d1)
        return active & (d * f <= hw)

    masks = jax.vmap(line_mask)(jnp.arange(p.max_trails))
    trail_mask = jnp.any(masks, axis=0)
    return trail_mask, n_trails, top_v

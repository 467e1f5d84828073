"""Spatially-varying PSF modelling + optimal PSF photometry on device.

PSFEx replacement (reference consumes PSFEx via zogy: `_psf.fits` models
read in /root/reference/buildref.py:3328-3366, sampled through
`zogy.get_psf_ima` with poldeg / polzero / polscal semantics — SURVEY.md
§2.4/§2.5).  The TPU formulation is one dense weighted least-squares over
all star vignettes at once:

    V[i, p]  ≈  Σ_k  B[i, k] · C[k, p]

with ``V`` the (nstars, npix) flux-normalised vignettes and ``B`` the
polynomial spatial basis evaluated at the star positions.  The normal
equations are two matmuls and one (nbasis, nbasis) solve — MXU work, no
per-star Python.  Outlier stars are removed by a fixed number of
reweighting iterations (chi² clip), keeping the trace static.

The resulting :class:`PSFModel` mirrors the PSFEx header contract
(``poldeg``, ``polzero_*``, ``polscal_*``) so downstream consumers (ZOGY
subtraction, A_swarp-style co-add clipping) sample it exactly like the
reference samples `_psf.fits`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from blackbox_tpu.ops.stats import masked_median


@dataclasses.dataclass(frozen=True)
class PSFParams:
    size: int = 25            # vignette / PSF stamp size (odd)
    poldeg: int = 2           # spatial polynomial degree (PSFEx PSFVAR_DEGREES)
    snr_min: float = 20.0     # star selection
    elong_max: float = 1.5
    niter: int = 3            # reweighting iterations (fixed, traced)
    chi2_clip: float = 10.0   # reject stars with chi2/dof above this
    sat_frac: float = 0.8     # peak above sat_frac*satlevel rejected by caller


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PSFModel:
    """PSFEx-compatible spatially-varying PSF.

    basis : (nbasis, size, size) polynomial coefficient images C[k]
    polzero_x/y, polscal_x/y : position normalisation, PSFEx convention
        t = (x - polzero_x) / polscal_x
    poldeg : spatial degree; nbasis = (poldeg+1)(poldeg+2)/2
    nstars : stars used in the fit;  chi2 : final reduced chi2
    """

    basis: jnp.ndarray
    polzero_x: jnp.ndarray
    polzero_y: jnp.ndarray
    polscal_x: jnp.ndarray
    polscal_y: jnp.ndarray
    poldeg: int
    nstars: jnp.ndarray
    chi2: jnp.ndarray

    def tree_flatten(self):
        leaves = (self.basis, self.polzero_x, self.polzero_y,
                  self.polscal_x, self.polscal_y, self.nstars, self.chi2)
        return leaves, self.poldeg

    @classmethod
    def tree_unflatten(cls, poldeg, leaves):
        b, zx, zy, sx, sy, n, c = leaves
        return cls(b, zx, zy, sx, sy, poldeg, n, c)


def poly_basis(tx, ty, poldeg: int):
    """PSFEx ordering of the 2-D monomials: x^i y^j with i+j <= poldeg.

    Order: 1, x, x², …, y, xy, …  (j outer, i inner — PSFEx GROUP order).
    Returns (..., nbasis).
    """
    terms = []
    for j in range(poldeg + 1):
        for i in range(poldeg + 1 - j):
            terms.append((tx ** i) * (ty ** j))
    return jnp.stack(terms, axis=-1)


def n_basis(poldeg: int) -> int:
    return (poldeg + 1) * (poldeg + 2) // 2


def _vignette_grid(image_shape, xs, ys, size: int):
    """FLOOR stamp origins + scalar lerp fractions for centred cutouts.

    The gather window is ``size + 1`` square at origin
    ``floor(centre - size//2)`` clipped into the frame; the recentred
    ``size``-stamp is a bilinear sample at PER-WINDOW SCALAR offsets
    (:func:`_recenter_window`) — no per-element gathers.  Where the
    origin clip binds (centres within half a window of the frame
    border) the returned offsets carry an integer part that the
    recentring absorbs with edge replication.
    """
    H, W = image_shape
    half = size // 2
    fy = ys - half
    fx = xs - half
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - size - 1)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W - size - 1)
    # window-local float shift: fractional in the interior, but up to
    # ±(half+1) where the origin clip binds (centres within half a
    # window of the frame border) — _recenter_window absorbs the
    # integer part with border replication, like the old clamped
    # per-element sampling did
    dy = fy - y0.astype(jnp.float32)
    dx = fx - x0.astype(jnp.float32)
    return y0, x0, dx, dy


def _recenter_window(w, dxi, dyi):
    """Recentred (S, S) stamp from ONE (S+1, S+1) floor-origin window.

    Samples the window at ``g + dyi`` / ``g + dxi`` with border
    replication, expressed as two tiny selection-lerp matmuls
    (``My @ w @ Mx.T``) built from the per-window SCALAR shifts — no
    per-element gathers (a vmapped fancy-index recentre lowers to 16
    small gathers per window on TPU; the batched (S, S+1) matmuls are
    MXU work).  In the interior ``dyi, dxi ∈ [0, 1)`` and the matrices
    reduce to the plain 2-tap bilinear blend; where the vignette
    origin was clipped at the frame border the integer part shifts the
    sampling with edge replication, keeping the stamp centred on the
    star exactly like the old clamped per-element path."""
    S1 = w.shape[-1]
    S = S1 - 1
    g = jnp.arange(S, dtype=jnp.float32)[:, None]
    k = jnp.arange(S1, dtype=jnp.float32)[None, :]

    def sel(d):
        s = jnp.floor(d)
        t = d - s
        c0 = jnp.clip(g + s, 0, S)
        c1 = jnp.clip(g + s + 1, 0, S)
        return (1.0 - t) * (k == c0) + t * (k == c1)     # (S, S+1)

    out = jnp.matmul(sel(dyi), w, precision="highest")
    return jnp.matmul(out, sel(dxi).T, precision="highest")


def extract_vignettes(image, xs, ys, size: int, n_active=None):
    """Centred cutouts, recentred so the star centroid lands on the
    central pixel (bilinear).

    Returns (vignettes (N, size, size), dx, dy) with dx/dy the lerp
    fractions actually applied.  Slots past ``n_active`` are skipped in
    chunks (ops.windows).
    """
    from blackbox_tpu.ops.windows import (chunked_slot_map,
                                          gather_slot_windows)
    y0, x0, dx, dy = _vignette_grid(image.shape, xs, ys, size)
    w = gather_slot_windows(image, y0, x0, size + 1, n_active=n_active)
    vig = chunked_slot_map(
        lambda wi, dxi, dyi: _recenter_window(wi, dxi, dyi),
        (w, dx, dy), n_active=n_active)
    return vig, dx, dy


def build_psf(image_bksub, bkg_std, cat, image_shape,
              params: PSFParams = PSFParams(), n_active=None):
    """Fit the spatially-varying PSF from a fixed-capacity catalog.

    cat must hold x, y, flux (e.g. large-aperture), snr, elong, valid —
    all (N,).  Slots past ``n_active`` skip their window gathers
    entirely (ops.windows).  Returns a :class:`PSFModel`.
    """
    from blackbox_tpu.ops.windows import (chunked_slot_map,
                                          gather_slot_windows)
    p = params
    H, W = image_shape
    xs, ys = cat["x"], cat["y"]
    star = (cat["valid"]
            & (cat["snr"] > p.snr_min)
            & (cat["elong"] < p.elong_max)
            & (xs > p.size) & (xs < W - p.size)
            & (ys > p.size) & (ys < H - p.size))

    S = p.size
    y0, x0, dx, dy = _vignette_grid(image_shape, xs, ys, S)
    v_all, sd_all = gather_slot_windows((image_bksub, bkg_std), y0, x0,
                                        S + 1, n_active=n_active)

    def one(v, sd, dxi, dyi):
        vr = _recenter_window(v, dxi, dyi)
        varo = sd[:-1, :-1] ** 2 + jnp.maximum(v[:-1, :-1], 0.0)
        return vr, varo                             # bkg + Poisson [e-]

    vig, var = chunked_slot_map(one, (v_all, sd_all, dx, dy),
                                n_active=n_active)

    flux = jnp.sum(vig, axis=(1, 2))
    star = star & (flux > 0)
    fsafe = jnp.where(flux > 0, flux, 1.0)
    Vn = vig / fsafe[:, None, None]                  # flux-normalised
    # per-pixel variance of the normalised vignette
    Wn = fsafe[:, None, None] ** 2 / jnp.maximum(var, 1e-9)  # 1/var_norm

    # spatial basis at star positions, PSFEx normalisation
    zx, zy = 0.5 * (W - 1), 0.5 * (H - 1)
    sx, sy = 0.5 * W, 0.5 * H
    B = poly_basis((xs - zx) / sx, (ys - zy) / sy, p.poldeg)  # (N, K)

    npix = p.size * p.size
    V = Vn.reshape(-1, npix)
    K = B.shape[-1]
    # monomial total order of each basis term (for the degradation ridge)
    order = jnp.asarray([i + j for j in range(p.poldeg + 1)
                         for i in range(p.poldeg + 1 - j)], jnp.float32)

    def solve(w_star):
        """Weighted LSQ with per-star scalar weights (median pixel weight
        × selection mask); returns (C (K, npix), chi2 per star)."""
        w = w_star[:, None]
        A = jnp.matmul(B.T * w.T, B, precision="highest")      # (K, K)
        # graceful degradation when the star count cannot constrain the
        # spatial terms: PSFEx lowers PSFVAR_DEGREES; the degree here is
        # static under jit, so the under-determined orders are ridged
        # toward zero instead (few stars -> near-constant PSF).  With a
        # sparse fit (5-6 stars, K=6) an unregularised polynomial
        # surface extrapolates wildly between stars and the PSF fluxes
        # of non-PSF stars scatter by factors of several (measured).
        nst = jnp.sum(w_star > 0.0)
        under = jnp.maximum(3.0 * K - nst, 0.0) / (3.0 * K)
        lam = 1e-6 + 10.0 * under * (order > 0)
        A = A + jnp.diag(lam) * (jnp.trace(A) / K + 1e-20)
        rhs = jnp.matmul(B.T * w.T, V, precision="highest")    # (K, npix)
        C = jnp.linalg.solve(A, rhs)
        resid = V - jnp.matmul(B, C, precision="highest")
        chi2 = jnp.sum(resid.reshape(-1, npix) ** 2
                       * Wn.reshape(-1, npix), axis=1) / npix
        return C, chi2

    # uniform per-star weights: vignettes are flux-normalised, so every
    # selected star constrains the unit-flux PSF equally
    w0 = jnp.where(star, 1.0, 0.0)

    def body(_, w):
        C, chi2 = solve(w)
        med = masked_median(chi2, w <= 0, axis=0)
        keep = chi2 < p.chi2_clip * jnp.maximum(med, 1e-6)
        return jnp.where(star & keep, w0, 0.0)

    w = jax.lax.fori_loop(0, p.niter - 1, body, w0)
    C, chi2 = solve(w)

    basis = C.reshape(K, p.size, p.size)
    used = w > 0
    return PSFModel(
        basis=basis,
        polzero_x=jnp.float32(zx), polzero_y=jnp.float32(zy),
        polscal_x=jnp.float32(sx), polscal_y=jnp.float32(sy),
        poldeg=p.poldeg,
        nstars=jnp.sum(used),
        chi2=masked_median(chi2, ~used, axis=0))


def psf_at(model: PSFModel, x, y, clip: bool = True):
    """Sample the PSF image at position(s); normalised to unit sum.

    x, y scalar -> (S, S); (N,) -> (N, S, S).
    """
    tx = (jnp.asarray(x, jnp.float32) - model.polzero_x) / model.polscal_x
    ty = (jnp.asarray(y, jnp.float32) - model.polzero_y) / model.polscal_y
    B = poly_basis(tx, ty, model.poldeg)             # (..., K)
    psf = jnp.tensordot(B, model.basis, axes=[[-1], [0]])
    if clip:
        psf = jnp.maximum(psf, 0.0)
    s = jnp.sum(psf, axis=(-2, -1), keepdims=True)
    return psf / jnp.maximum(s, 1e-9)


def psf_fwhm(psf_img):
    """FWHM from the second moments of a PSF stamp (Gaussian equiv)."""
    S = psf_img.shape[-1]
    g = jnp.arange(S, dtype=jnp.float32)
    w = jnp.maximum(psf_img, 0.0)
    tot = jnp.sum(w, axis=(-2, -1))
    xc = jnp.sum(w * g[None, :], axis=(-2, -1)) / tot
    yc = jnp.sum(w * g[:, None], axis=(-2, -1)) / tot
    x2 = jnp.sum(w * (g[None, :] - xc[..., None, None]) ** 2,
                 axis=(-2, -1)) / tot
    y2 = jnp.sum(w * (g[:, None] - yc[..., None, None]) ** 2,
                 axis=(-2, -1)) / tot
    return 2.0 * jnp.sqrt(jnp.log(2.0) * jnp.maximum(x2 + y2, 1e-9))


def psf_photometry(image_bksub, bkg_std, model: PSFModel, xs, ys,
                   window: int | None = None, n_active=None):
    """Optimal (matched-filter) PSF flux at given positions.

    F = Σ P·D/σ² / Σ P²/σ²,  σ_F = (Σ P²/σ²)^(-1/2)
    (Naylor 1998; the zogy ``flux_opt`` the reference's catalogs carry).
    Slots past ``n_active`` skip their window gathers (ops.windows).
    Returns (flux, fluxerr) of shape (N,).
    """
    from blackbox_tpu.ops.windows import (chunked_slot_map,
                                          gather_slot_windows)
    S = model.basis.shape[-1] if window is None else window
    y0, x0, dx, dy = _vignette_grid(image_bksub.shape, xs, ys, S)
    v_all, sd_all = gather_slot_windows((image_bksub, bkg_std), y0, x0,
                                        S + 1, n_active=n_active)

    def one(v, sd, dxi, dyi, xi, yi):
        # recenter the DATA with the same bilinear shift used on the
        # vignettes that built the model: both then carry identical
        # interpolation smoothing, so the matched-filter scale is
        # unbiased (recentring the PSF instead would smooth it twice ->
        # %-level flux-scale errors)
        v = _recenter_window(v, dxi, dyi)
        sd = _recenter_window(sd, dxi, dyi)
        P = psf_at(model, xi, yi)                    # (S, S)
        # background-only variance in the weights: including the
        # source's own Poisson noise correlates weights with data and
        # biases bright stars low by ~1-3% (flux-dependent — poisons
        # the zeropoint)
        var = sd ** 2
        ivar = 1.0 / jnp.maximum(var, 1e-9)
        den = jnp.sum(P * P * ivar)
        num = jnp.sum(P * v * ivar)
        flux = num / jnp.maximum(den, 1e-12)
        # the reported error still includes the source Poisson term
        err2 = jnp.sum(P * P * ivar * ivar
                       * (var + jnp.maximum(v, 0.0))) \
            / jnp.maximum(den, 1e-12) ** 2
        return flux, jnp.sqrt(jnp.maximum(err2, 1e-12))

    return chunked_slot_map(one, (v_all, sd_all, dx, dy, xs, ys),
                            n_active=n_active)

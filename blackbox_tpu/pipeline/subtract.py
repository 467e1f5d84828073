"""New-minus-reference subtraction step: remap, scale, ZOGY, transients.

Rebuild of the reference's transient path (/root/reference/blackbox.py:
2429-2568): the reference copies the ref products into tmp and calls
zogy's ``optimal_subtraction(new+ref)``, which SWarp-remaps the ref onto
the new frame, measures the flux ratio / astrometric scatter from PSF
stars, runs the ZOGY FFT statistics, and extracts + vets transients.
Here the remap, ZOGY chain and transient extraction are one jitted device
program; only the WCS grid construction and the catalog cross-match run
on host (float64, tiny).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from blackbox_tpu.astro.photcal import match_catalogs
from blackbox_tpu.core import maskbits
from blackbox_tpu.ops.psf import PSFModel, psf_at
from blackbox_tpu.ops.transients import (
    TransientParams, extract_transients, transient_stats)
from blackbox_tpu.ops.warp import remap_grid, lanczos_resample, \
    nearest_resample
from blackbox_tpu.ops.zogy import ZogyParams, zogy_subtract


@dataclasses.dataclass
class SubtractionInput:
    """One side (new or ref) of a subtraction: device arrays + host meta."""

    image: jnp.ndarray                  # (H, W) calibrated, NOT bkg-subbed
    bkg: jnp.ndarray                    # (H, W) background model
    bkg_std: jnp.ndarray                # (H, W)
    mask: jnp.ndarray                   # (H, W) uint8
    psf: PSFModel
    wcs: object                         # TanWCS
    cat_x: np.ndarray                   # host catalogs for fratio/dx/dy
    cat_y: np.ndarray
    cat_flux: np.ndarray                # PSF fluxes [e-]
    cat_fluxerr: np.ndarray
    cat_valid: np.ndarray


def _measure_scaling(new: SubtractionInput, ref: SubtractionInput,
                     snr_min: float = 10.0):
    """Flux ratio fr (= F_ref/F_new per unit source) + astrometric rms.

    The reference does this inside zogy via ``get_fratio`` on PSFEx
    stars (consumed in buildref.py:2782-3014); here the already-measured
    PSF-flux catalogs are matched through the WCS pair.
    """
    # ref catalog positions -> new frame
    ra, dec = ref.wcs.pix2sky(ref.cat_x, ref.cat_y)
    rx, ry = new.wcs.sky2pix(ra, dec)

    ok_n = new.cat_valid & (new.cat_flux > 0) \
        & (new.cat_flux > snr_min * np.maximum(new.cat_fluxerr, 1e-9))
    ok_r = ref.cat_valid & (ref.cat_flux > 0) \
        & (ref.cat_flux > snr_min * np.maximum(ref.cat_fluxerr, 1e-9))
    i_n = np.flatnonzero(ok_n)
    i_r = np.flatnonzero(ok_r)
    if len(i_n) == 0 or len(i_r) == 0:
        return 1.0, 0.0, 0.5, 0.5, 0

    mi, mj = match_catalogs(new.cat_x[i_n], new.cat_y[i_n],
                            rx[i_r], ry[i_r], radius_pix=3.0)
    if len(mi) < 3:
        return 1.0, 0.0, 0.5, 0.5, len(mi)
    fn = new.cat_flux[i_n][mi]
    fr = ref.cat_flux[i_r][mj]
    r = fr / np.maximum(fn, 1e-9)
    med = np.median(r)
    mad = 1.4826 * np.median(np.abs(r - med)) + 1e-9
    keep = np.abs(r - med) < 3 * mad
    fratio = float(np.median(r[keep])) if keep.any() else float(med)
    fstd = float(np.std(r[keep])) if keep.any() else 0.0

    dx = new.cat_x[i_n][mi] - rx[i_r][mj]
    dy = new.cat_y[i_n][mi] - ry[i_r][mj]
    dx_rms = float(np.sqrt(np.mean((dx - np.median(dx)) ** 2)) + 1e-3)
    dy_rms = float(np.sqrt(np.mean((dy - np.median(dy)) ** 2)) + 1e-3)
    return fratio, fstd, dx_rms, dy_rms, int(keep.sum())


@dataclasses.dataclass
class SubtractionResult:
    D: jnp.ndarray
    Scorr: jnp.ndarray
    Fpsf: jnp.ndarray
    Fpsferr: jnp.ndarray
    trans_cat: dict
    stats: dict
    ref_remapped: jnp.ndarray = None    # bkg-subtracted ref on new grid


def run_subtraction(new: SubtractionInput, ref: SubtractionInput,
                    zogy_params: ZogyParams = ZogyParams(),
                    trans_params: TransientParams = TransientParams(),
                    psf_size: Optional[int] = None) -> SubtractionResult:
    """Full new-vs-ref subtraction on the new frame's grid."""
    shape = new.image.shape
    ys, xs = remap_grid(ref.wcs, new.wcs, shape)
    ys = jnp.asarray(ys)
    xs = jnp.asarray(xs)

    fratio, fstd, dx_rms, dy_rms, nmatch = _measure_scaling(new, ref)
    zp = dataclasses.replace(zogy_params, dx=dx_rms, dy=dy_rms)

    # PSF stamps at the frame centre (full-frame statistics; the
    # spatial variation enters through the per-position PSF fluxes that
    # were already measured with the varying model)
    cy, cx = 0.5 * shape[0], 0.5 * shape[1]
    psf_n = psf_at(new.psf, cx, cy)
    # ref PSF sampled at the ref-frame pixel that lands at the new centre
    ra, dec = new.wcs.pix2sky(cx, cy)
    rcx, rcy = ref.wcs.sky2pix(ra, dec)
    psf_r = psf_at(ref.psf, float(rcx), float(rcy))

    @jax.jit
    def device_step(new_img, new_bkg, new_std, new_mask,
                    ref_img, ref_bkg, ref_std, ref_mask,
                    ys, xs, psf_n, psf_r, sn, sr, fratio):
        # off-frame fill: neutral STD (a huge sentinel would overflow the
        # float32 FFT of the variance map and corrupt V_S everywhere);
        # the EDGE mask bit rejects those regions downstream
        ref_sub = lanczos_resample(ref_img - ref_bkg, ys, xs)
        ref_std_r = nearest_resample(ref_std, ys, xs, fill=sr)
        ref_mask_r = nearest_resample(ref_mask, ys, xs,
                                      fill=jnp.uint8(maskbits.EDGE))
        new_sub = new_img - new_bkg

        # smooth background-variance maps + spectral Poisson source
        # term (reuses N_hat/R_hat inside zogy_subtract — two forward
        # variance FFTs cheaper than explicit var_new/var_ref maps)
        out = zogy_subtract(new_sub, ref_sub, psf_n, psf_r, sn, sr,
                            fn=1.0, fr=fratio,
                            var_bkg_new=new_std ** 2,
                            var_bkg_ref=ref_std_r ** 2, params=zp,
                            want_psf_d=False)
        cat, ntrans = extract_transients(out, new_mask, ref_mask_r,
                                         trans_params)
        return out, cat, ntrans, ref_mask_r, ref_sub

    sn = jnp.median(new.bkg_std)
    sr = jnp.median(ref.bkg_std)
    out, cat, ntrans, ref_mask_r, ref_sub = device_step(
        new.image, new.bkg, new.bkg_std, new.mask,
        ref.image, ref.bkg, ref.bkg_std, ref.mask,
        ys, xs, psf_n, psf_r, sn, sr, jnp.float32(fratio))

    stats = {
        "z_fratio": fratio, "z_fratio_std": fstd,
        "z_dxrms": dx_rms, "z_dyrms": dy_rms, "z_nmatch": nmatch,
        "z_fd": float(np.asarray(out["F_D"])),
        "z_scorr_std": float(np.asarray(jnp.std(out["Scorr"]))),
    }
    stats.update({k: int(np.asarray(v))
                  for k, v in transient_stats(cat, ntrans).items()})
    return SubtractionResult(D=out["D"], Scorr=out["Scorr"],
                             Fpsf=out["Fpsf"], Fpsferr=out["Fpsferr"],
                             trans_cat=cat, stats=stats,
                             ref_remapped=ref_sub)

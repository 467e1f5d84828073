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


def measure_scaling_device(new_x, new_y, new_flux, new_fluxerr, new_valid,
                           ref_x, ref_y, ref_flux, ref_fluxerr, ref_valid,
                           radius: float = 3.0, snr_min: float = 10.0,
                           k: int = 512):
    """Flux ratio + astrometric rms ON DEVICE from two padded catalogs.

    The device analogue of :func:`_measure_scaling` (the reference
    measures fratio/dx/dy inside ``optimal_subtraction`` from PSF stars;
    zogy's get_fratio, consumed at /root/reference/buildref.py:2782-3014):
    the brightest ``k`` valid stars of each catalog are matched by
    nearest-neighbour distance on the NEW pixel grid (``ref_x/ref_y``
    must already be mapped through the WCS pair), and the clipped median
    of the PSF-flux ratios plus the rms of the matched position offsets
    come out as traced scalars — so the whole science step can run as
    ONE device program with no host round-trip between extraction and
    subtraction.

    Returns (fratio, fratio_std, dx_rms, dy_rms, nmatch) — same contract
    as the host path: (1.0, 0.0, 0.5, 0.5, nmatch) when <3 matches.
    """
    def select(x, y, f, fe, v):
        snr = f / jnp.maximum(fe, 1e-9)
        ok = v & (f > 0) & (snr > snr_min)
        score = jnp.where(ok, f, -jnp.inf)
        kk = min(k, int(f.shape[0]))
        sv, idx = jax.lax.top_k(score, kk)
        return x[idx], y[idx], f[idx], jnp.isfinite(sv)

    nx, ny, nf, nok = select(new_x, new_y, new_flux, new_fluxerr,
                             new_valid)
    rx, ry, rf, rok = select(ref_x, ref_y, ref_flux, ref_fluxerr,
                             ref_valid)

    d2 = ((nx[:, None] - rx[None, :]) ** 2
          + (ny[:, None] - ry[None, :]) ** 2)
    d2 = jnp.where(nok[:, None] & rok[None, :], d2, jnp.inf)
    j = jnp.argmin(d2, axis=1)
    mind2 = jnp.min(d2, axis=1)
    matched = mind2 < radius ** 2

    r = jnp.where(matched, rf[j] / jnp.maximum(nf, 1e-9), jnp.nan)
    med = jnp.nanmedian(r)
    mad = 1.4826 * jnp.nanmedian(jnp.abs(r - med)) + 1e-9
    keep = matched & (jnp.abs(r - med) < 3 * mad)
    rk = jnp.where(keep, r, jnp.nan)
    fratio = jnp.nan_to_num(jnp.nanmedian(rk), nan=1.0)
    fstd = jnp.nan_to_num(jnp.nanstd(rk), nan=0.0)

    dx = jnp.where(keep, nx - rx[j], jnp.nan)
    dy = jnp.where(keep, ny - ry[j], jnp.nan)

    def rms(d):
        c = d - jnp.nanmedian(d)
        return jnp.sqrt(jnp.nan_to_num(jnp.nanmean(c ** 2))) + 1e-3

    nmatch = jnp.sum(keep)
    enough = nmatch >= 3
    fratio = jnp.where(enough, fratio, 1.0)
    fstd = jnp.where(enough, fstd, 0.0)
    dx_rms = jnp.where(enough, rms(dx), 0.5)
    dy_rms = jnp.where(enough, rms(dy), 0.5)
    return fratio, fstd, dx_rms, dy_rms, nmatch


def fused_science_step(ctx, chan_data, os_vert, os_hori, mbias, mflat,
                       bpm, xtalk_coeffs,
                       ref_sub, ref_std, ref_mask, grid, psf_ref, sr,
                       ref_cat: dict,
                       zogy_params: ZogyParams = ZogyParams(),
                       trans_params: TransientParams = TransientParams(),
                       remap_margin: int = 64, remap_ranges=None,
                       remap_step: int | None = None):
    """ONE traced program: raw channel stacks -> transient catalog.

    The reference's full per-science-frame flow — calibration chain,
    extraction, ref remap, ZOGY statistics, transient extraction +
    vetting (/root/reference/blackbox.py:1474-1991 then 2429-2568) — as
    a single jittable function, so XLA fuses across the stage boundaries
    and the frame never syncs to host mid-flight.

    chan_data/os_vert/os_hori : raw channel stacks (split_raw layout)
    mbias/mflat/bpm/xtalk_coeffs : calibration inputs (may be None)
    ref_sub  : (H, W) background-SUBTRACTED reference on the REF grid
    ref_std  : (H, W) ref background STD map
    ref_mask : (H, W) uint8 ref mask
    grid     : remap grids (new pixel -> ref pixel coords; host WCS
               math).  Either (ys, xs) full (H, W) arrays, or the
               4-tuple (sy, sx, Wy, Wx) from
               :func:`blackbox_tpu.ops.warp.remap_grid_coarse` —
               PREFERRED: the coarse nodes upsample on device with two
               small matmuls, so the two full-frame coordinate planes
               are program intermediates instead of ~0.9 GB of pinned
               input buffers (the fused program is HBM-liveness bound
               at full scale)
    psf_ref  : (S, S) ref PSF stamp sampled at the frame centre
    sr       : scalar ref background STD (median of ref_std)
    ref_cat  : dict with x/y (on the NEW grid), flux, fluxerr, valid —
               padded device arrays for the on-device fratio/dx/dy match

    Requires ``ctx.fit_psf`` (the new-frame PSF stamp and PSF fluxes
    feed the match and the ZOGY kernels).
    """
    front = _science_front(ctx, chan_data, os_vert, os_hori, mbias,
                           mflat, bpm, xtalk_coeffs)
    back = _science_back(front["sub"], front["bkg_std"], front["mask"],
                         front["psf_centre"], front["cat"],
                         front["stats"]["bkg_std"],
                         ref_sub, ref_std, ref_mask, grid, psf_ref, sr,
                         ref_cat, zogy_params, trans_params,
                         remap_margin, remap_ranges, remap_step)
    out = {k: v for k, v in front.items()
           if k not in ("sub", "psf_centre")}
    out.update(back)
    return out


def _science_front(ctx, chan_data, os_vert, os_hori, mbias, mflat,
                   bpm, xtalk_coeffs):
    """Calibrate + extract + PSF-stamp: the pre-FFT half of the science
    step (one traced function)."""
    from blackbox_tpu.pipeline.reduce import (calibrate_detector,
                                              extract_catalog)

    if not ctx.fit_psf:
        raise ValueError("the fused science step needs ctx.fit_psf: the "
                         "new-frame PSF stamp and PSF fluxes feed the "
                         "flux-ratio match and the ZOGY kernels")
    sci, mask_m, stats = calibrate_detector(
        ctx, chan_data, os_vert, os_hori, mbias, mflat, bpm, xtalk_coeffs)
    ext = extract_catalog(ctx, sci, mask_m)
    H, W = sci.shape
    return {"image": sci, "mask": mask_m,
            "stats": {**stats, **ext["stats"]},
            "cat": ext["cat"], "bkg": ext["bkg"],
            "bkg_std": ext["bkg_std"], "psf": ext["psf"],
            "seg_nsources": ext["seg_nsources"],
            "sub": sci - ext["bkg"],
            "psf_centre": psf_at(ext["psf"], 0.5 * W, 0.5 * H)}


def _science_back(sub, bstd, mask_m, psf_n, cat, sn,
                  ref_sub, ref_std, ref_mask, grid, psf_ref, sr,
                  ref_cat, zogy_params, trans_params,
                  remap_margin: int = 64, remap_ranges=None,
                  remap_step: int | None = None):
    """Scaling match + remap + ZOGY + transient extraction: the FFT
    half of the science step (one traced function)."""
    fratio, fstd, dx_rms, dy_rms, nmatch = measure_scaling_device(
        cat["x"], cat["y"], cat["flux_psf"], cat["fluxerr_psf"],
        cat["valid"], ref_cat["x"], ref_cat["y"], ref_cat["flux"],
        ref_cat["fluxerr"], ref_cat["valid"])

    # remap the three ref planes in one pass.  PRODUCTION path
    # (remap_ranges from ops.warp.grid_shift_ranges): the two-pass
    # variable-shift Lanczos — per-pixel gathers run at ~1 px/cycle on
    # a v5e (measured 32 s/frame-triple), streaming shifted adds at
    # ~1 ms/pass.  Fallback (remap_ranges=None): the exact row-blocked
    # slab gather (the dense tap loop keeps ~20 full-frame s32 index
    # planes live and OOMs a 16 GB chip; blocking bounds the working
    # set, but the gathers stay slow — use only off the hot path).
    srcs3 = (ref_sub, ref_std, ref_mask)
    modes3 = ("lanczos", "nearest", "nearest")
    fills3 = (0.0, sr, jnp.uint8(maskbits.EDGE))
    if remap_ranges is not None:
        from blackbox_tpu.ops.warp import warp_shift2pass
        if remap_step is not None and len(grid) == 2:
            # coarse (sy, sx) nodes + STATIC spacing: coordinate planes
            # reconstruct by lerp (no matmuls; the step must stay a
            # python int, so it rides this static kwarg, not the grid)
            grid = (grid[0], grid[1], int(remap_step))
        ref_sub_r, ref_std_r, ref_mask_r = warp_shift2pass(
            srcs3, modes3, fills3, grid, remap_ranges)
    else:
        if len(grid) == 3:
            raise ValueError("the (sy, sx, step) grid form needs "
                             "remap_ranges (the shift2pass path)")
        from blackbox_tpu.ops.warp import resample_blocked
        H = ref_sub.shape[0]
        block = next(b for b in (1320, 660, 264, 132, 60, 22, 11, 8,
                                 4, 2, 1) if H % b == 0)
        ref_sub_r, ref_std_r, ref_mask_r = resample_blocked(
            srcs3, modes3, fills3, grid, block_rows=block,
            margin=remap_margin)

    # traced dx/dy ride the params dataclass straight into the
    # astrometric-variance term (the dataclass is never hashed here)
    zp = dataclasses.replace(zogy_params, dx=dx_rms, dy=dy_rms)
    out = zogy_subtract(sub, ref_sub_r, psf_n, psf_ref,
                        sn, sr, fn=1.0, fr=fratio,
                        var_bkg_new=bstd ** 2,
                        var_bkg_ref=ref_std_r ** 2, params=zp,
                        want_psf_d=False)
    tcat, ntrans = extract_transients(out, mask_m, ref_mask_r,
                                      trans_params)

    tstats = transient_stats(tcat, ntrans)
    tstats.update({"z_fratio": fratio, "z_fratio_std": fstd,
                   "z_dxrms": dx_rms, "z_dyrms": dy_rms,
                   "z_nmatch": nmatch, "z_fd": out["F_D"]})
    return {"D": out["D"], "Scorr": out["Scorr"], "Fpsf": out["Fpsf"],
            "Fpsferr": out["Fpsferr"],
            "trans_cat": tcat, "trans_stats": tstats}


def make_science_programs(ctx, xtalk_coeffs=None,
                          zogy_params: ZogyParams = ZogyParams(),
                          trans_params: TransientParams =
                          TransientParams(), donate: bool = True,
                          remap_margin: int = 64, remap_ranges=None,
                          remap_step: int | None = None,
                          salt: int = 0):
    """The production full-scale raw->transient path as TWO jitted
    device programs dispatched back-to-back with NO host sync between
    them.

    A single traced program (:func:`fused_science_step`) needs ~19-24 GB
    of peak HBM at full MeerLICHT scale — the XLA scheduler keeps the
    extraction intermediates alive across the 10.7k² FFT chain — and
    does not fit a 16 GB v5e.  Splitting at the natural FFT boundary
    lets every extraction buffer die with program 1, and ``donate=True``
    hands program 1's outputs (sub, bkg_std) to program 2 as reusable
    scratch.  The host enqueues both programs asynchronously; the frame
    never leaves the device, so end-to-end latency is the sum the
    benches measure.

    Returns (front, back):
      front(chan, osv, osh, mbias, mflat, bpm) -> dict incl. sub/cat/...
      back(sub, bkg_std, mask, psf_centre, cat, sn, ref_sub, ref_std,
           ref_mask, grid, psf_ref, sr, ref_cat) -> dict (D, Scorr,
           Fpsf, Fpsferr, trans_cat, trans_stats)
    """
    import jax

    def front(chan, osv, osh, mbias, mflat, bpm):
        return _science_front(ctx, chan, osv, osh, mbias, mflat, bpm,
                              xtalk_coeffs)

    def back(sub, bstd, mask_m, psf_n, cat, sn, ref_sub, ref_std,
             ref_mask, grid, psf_ref, sr, ref_cat):
        return _science_back(sub, bstd, mask_m, psf_n, cat, sn,
                             ref_sub, ref_std, ref_mask, grid, psf_ref,
                             sr, ref_cat, zogy_params, trans_params,
                             remap_margin, remap_ranges, remap_step)

    if salt:
        # the TPU compiler's autotuning is seeded by the module hash,
        # which includes the jitted function's NAME: renaming re-rolls
        # the compile lottery (same-program executables land up to
        # ~50% apart on v5e; PERF_NOTES.md).  Callers probe a few
        # salts and pin the winner in the persistent compile cache.
        import types
        front = types.FunctionType(front.__code__, front.__globals__,
                                   name=f"front_s{salt}",
                                   closure=front.__closure__)
        back = types.FunctionType(back.__code__, back.__globals__,
                                  name=f"back_s{salt}",
                                  closure=back.__closure__)
    return (jax.jit(front),
            jax.jit(back, donate_argnums=(0, 1) if donate else ()))


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
    """Full new-vs-ref subtraction on the new frame's grid.

    The ref remap picks its kernel from the mapping itself (host-side,
    from the coarse WCS grid): survey registrations (few-px shifts,
    arcmin rotations) take the streaming two-pass variable-shift
    Lanczos (warp_shift2pass — per-pixel gathers fault/crawl on a v5e
    at full scale, PERF_NOTES.md); wilder mappings fall back to the
    exact slab-blocked gather form.
    """
    from blackbox_tpu.ops.warp import (grid_row_margin,
                                       grid_shift_ranges,
                                       remap_grid_coarse)
    shape = new.image.shape
    step = 32
    sy, sx, _, _ = remap_grid_coarse(ref.wcs, new.wcs, shape, step=step)
    ranges = grid_shift_ranges(sy, sx, step=step, blocks=8)
    span = max(max(r1 - r0 for r0, r1 in ranges[0]),
               max(r1 - r0 for r0, r1 in ranges[1]))
    # second-order displacement bound of the two-pass form:
    # |d(ys)/dx| * |dxs| (and symmetric) must stay well under a pixel
    dy_dx = float(np.max(np.abs(np.diff(sy, axis=1)))) / step
    dx_dy = float(np.max(np.abs(np.diff(sx, axis=0)))) / step
    rmax = max(abs(v) for pair in ranges[0] + ranges[1] for v in pair)
    fast = span <= 40 and max(dy_dx, dx_dy) * rmax < 0.05
    if fast:
        grid_c = (jnp.asarray(sy, jnp.float32),
                  jnp.asarray(sx, jnp.float32))
    else:
        # rare/wild mappings: exact slab-blocked gathers over the full
        # coordinate planes (host f64 build, slow but correct)
        ys_f, xs_f = remap_grid(ref.wcs, new.wcs, shape, step=step)
        grid_c = (jnp.asarray(ys_f), jnp.asarray(xs_f))

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
                    grid, psf_n, psf_r, sn, sr, fratio):
        # off-frame fill: neutral STD (a huge sentinel would overflow the
        # float32 FFT of the variance map and corrupt V_S everywhere);
        # the EDGE mask bit rejects those regions downstream
        srcs3 = (ref_img - ref_bkg, ref_std, ref_mask)
        modes3 = ("lanczos", "nearest", "nearest")
        fills3 = (0.0, sr, jnp.uint8(maskbits.EDGE))
        if fast:
            from blackbox_tpu.ops.warp import warp_shift2pass
            ref_sub, ref_std_r, ref_mask_r = warp_shift2pass(
                srcs3, modes3, fills3, (grid[0], grid[1], step), ranges)
        else:
            from blackbox_tpu.ops.warp import resample_blocked
            Hs = ref_img.shape[0]
            block = next(b for b in (1320, 660, 264, 132, 60, 22, 11,
                                     8, 4, 2, 1) if shape[0] % b == 0)
            margin = grid_row_margin(sy, step=step)
            ref_sub, ref_std_r, ref_mask_r = resample_blocked(
                srcs3, modes3, fills3, grid, block_rows=block,
                margin=max(margin, block // 4))
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
        grid_c, psf_n, psf_r, sn, sr, jnp.float32(fratio))

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

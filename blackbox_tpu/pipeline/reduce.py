"""The per-frame reduction pipeline as one jitted device program.

Where the reference's ``blackbox_reduce`` is a 1600-line host loop calling
numpy steps and C binaries per image (/root/reference/blackbox.py:1027-2669),
here the whole chain — gain, overscan, non-linearity, master bias/flat,
masking, L.A.Cosmic, crosstalk, satellite trails, background, detection,
aperture photometry — is a single traced function over channel stacks.
Step order follows the reference (gain 1479 → overscan 1534 → nonlin 1614 →
mbias 1679 → mask_init 1753 → flat 1825 → cosmics 1869 → xtalk 1902 →
satdet 1928 → edge fill 1968).

The pipeline is built from a static :class:`ReduceContext`; the returned
callables are jit-compiled once per geometry and reused for every frame,
and vmap cleanly over a leading batch axis for multi-frame throughput.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from blackbox_tpu.core import maskbits
from blackbox_tpu.core.geometry import CCDGeometry
from blackbox_tpu.config.base import get_par
from blackbox_tpu.config.defaults import ReductionSettings
from blackbox_tpu.ops.gain import gain_correct
from blackbox_tpu.ops.overscan import overscan_correct, OverscanParams
from blackbox_tpu.ops.nonlin import nonlin_correct
from blackbox_tpu.ops.masking import build_mask
from blackbox_tpu.ops.xtalk import xtalk_correct, xtalk_correct_mosaic
from blackbox_tpu.ops.cosmics import lacosmic, LACosmicParams
from blackbox_tpu.ops.satdet import (
    detect_trails, detect_trail_segments, SatDetParams)
from blackbox_tpu.ops.labeling import euler_count
from blackbox_tpu.ops.background import background_mesh, mini2back
from blackbox_tpu.ops.detection import (
    DetectParams, detect_segments, segment_catalog, moments_shape)
from blackbox_tpu.ops.photometry import aperture_photometry
from blackbox_tpu.ops.psf import (
    PSFParams, build_psf, psf_at, psf_fwhm, psf_photometry)
from blackbox_tpu.ops.stats import masked_median


@dataclasses.dataclass(frozen=True)
class ReduceContext:
    """Static per-telescope configuration resolved to arrays."""

    geom: CCDGeometry
    gains: tuple                    # (C,) e-/ADU
    satlevel_adu: tuple             # (C,) raw ADU
    telescope: str = "ML1"
    os_params: OverscanParams = OverscanParams()
    lac_params: LACosmicParams = LACosmicParams()
    sat_params: SatDetParams = SatDetParams()
    det_params: DetectParams = DetectParams()
    psf_params: PSFParams = PSFParams()
    fit_psf: bool = True
    bkg_boxsize: int = 256
    bkg_filtersize: int = 3
    bkg_nsigma: float = 3.0
    apphot_radii: tuple = (2.0, 4.5, 15.0)   # pixels
    correct_nonlin: bool = False
    subtract_mbias: bool = False
    detect_sats: bool = True
    detect_sat_segments: bool = False
    fwhm_guess: float = 3.0

    @classmethod
    def from_settings(cls, s: ReductionSettings, telescope: str = "ML1",
                      **overrides):
        geom = s.geometry
        C = geom.n_chan
        gains = np.resize(np.asarray(get_par(s.gain, telescope),
                                     np.float32), C)
        satlev = np.resize(np.asarray(get_par(s.satlevel, telescope),
                                      np.float32), C)
        mode = "ML" if telescope.startswith("ML") else "BG"
        kw = dict(
            geom=geom, gains=tuple(gains.tolist()),
            satlevel_adu=tuple(satlev.tolist()), telescope=telescope,
            os_params=OverscanParams(voscan_poldeg=s.voscan_poldeg,
                                     mode=mode),
            lac_params=LACosmicParams(
                sigclip=float(get_par(s.sigclip, telescope)),
                sigfrac=s.sigfrac, objlim=s.objlim, niter=s.niter,
                sepmed=s.sepmed, windowed=not s.sepmed),
            det_params=DetectParams(nsigma=s.det_nsigma,
                                    npix_min=s.det_npix_min,
                                    max_sources=s.max_sources),
            sat_params=SatDetParams(bin_factor=s.sat_bin),
            # vignette size caps at the design stamp: beyond ~25 px a
            # MeerLICHT PSF carries no signal, and the eigen-PSF LSQ
            # cost grows with the stamp area (set_zogy size_vignet is
            # the PSFEx extraction vignette)
            psf_params=PSFParams(
                size=min(s.size_vignet, 25) | 1),
            bkg_boxsize=min(s.bkg_boxsize, geom.red_shape[0] // 4),
            bkg_filtersize=s.bkg_filtersize,
            bkg_nsigma=s.bkg_nsigma,
            # settings radii are in units of FWHM (reference set_zogy
            # apphot_radii contract); resolved to pixels at the nominal
            # seeing so the jitted program stays static
            apphot_radii=tuple(float(r) * 3.0 for r in s.apphot_radii),
            correct_nonlin=s.correct_nonlin,
            subtract_mbias=bool(get_par(s.subtract_mbias, telescope)),
            detect_sats=s.detect_sats,
            detect_sat_segments=s.detect_sat_segments,
        )
        kw.update(overrides)
        return cls(**kw)


def calibrate_detector(ctx: ReduceContext, chan_data, os_vert, os_hori,
                       mbias, mflat, bpm, xtalk_coeffs, nonlin_coeffs=None):
    """Detector calibration: raw channel stacks -> (sci mosaic, mask, stats).

    mbias : (C, ych, xch) master bias [e-] or None
    mflat : (C, ych, xch) normalised master flat or None
    bpm   : (C, ych, xch) uint8 static mask or None
    """
    geom = ctx.geom
    gains = jnp.asarray(ctx.gains, jnp.float32)
    stats = {}

    chan, osv, osh = gain_correct(chan_data, os_vert, os_hori, gains)
    satlevel_e = jnp.asarray(ctx.satlevel_adu, jnp.float32) * gains
    chan, os_stats = overscan_correct(chan, osv, osh,
                                      satlevel_e=satlevel_e,
                                      params=ctx.os_params)
    stats.update(os_stats)

    if ctx.correct_nonlin and nonlin_coeffs is not None:
        chan = nonlin_correct(chan, gains, nonlin_coeffs)

    if ctx.subtract_mbias and mbias is not None:
        chan = chan - mbias

    chan, mask, mstats = build_mask(
        chan, bpm, jnp.asarray(ctx.satlevel_adu, jnp.float32), gains,
        os_stats["biasm"], nx=geom.nx)
    stats.update({k: v for k, v in mstats.items() if k != "mask_sat"})
    stats["nobj_sat"] = euler_count(geom.assemble(mstats["mask_sat"]))

    if mflat is not None:
        chan = chan / jnp.maximum(mflat, 1e-3)

    sci = geom.assemble(chan)
    mask_m = geom.assemble(mask)

    # stage boundary: XLA's cross-stage fusion of the (dis)assembly with
    # the stencil stages can materialise degenerate-dim intermediates
    # whose TPU tile padding explodes (57 GB at full MeerLICHT size);
    # the barrier bounds fusion at the mosaic hand-off
    sci, mask_m = jax.lax.optimization_barrier((sci, mask_m))

    # cosmic rays (excluded: every already-masked pixel, reference
    # blackbox.py:4267-4273)
    clean, crmask, crcounts = lacosmic(
        sci, mask_m != 0, stats["rdnoise"], ctx.lac_params)
    mask_m = jnp.where(crmask, mask_m | maskbits.COSMIC, mask_m)
    # fill holes before Euler counting: the Euler number equals the
    # component count only for hole-free masks (otherwise NCOSMICS can
    # even go negative)
    from blackbox_tpu.ops.morphology import fill_holes
    # one sweep round: cosmic hits are a few px across, any hole in
    # them resolves in a single monotone flood (each extra round costs
    # ~55 ms at 10.5k^2)
    stats["ncosmics"] = euler_count(fill_holes(crmask, iterations=1))

    clean, mask_m = jax.lax.optimization_barrier((clean, mask_m))

    # crosstalk on the cleaned mosaic.  The two-row mirrored-readout
    # layout gets the mosaic-native block contraction (no 16-way
    # disassemble/assemble: 18.8 vs 27.0 ms on v5e, bit-parity-tested);
    # other geometries take the channel-stack einsum
    if xtalk_coeffs is not None:
        if geom.ny == 2:
            clean = xtalk_correct_mosaic(clean, mask_m, xtalk_coeffs,
                                         geom.ny, geom.nx)
        else:
            ch = geom.disassemble(clean)
            mk = geom.disassemble(mask_m)
            ch = xtalk_correct(ch, mk, xtalk_coeffs, geom.nx)
            clean = geom.assemble(ch)

    # satellite trails.  EDGE pixels are excluded too: they are overscan
    # artefacts forming genuine straight lines along the channel seams
    # (the band-integrated Radon statistic rightly finds them; the
    # reference's edge pixels are similarly dead rows, filled with the
    # channel median right after this step)
    if ctx.detect_sats:
        excl = (mask_m & (maskbits.SATURATED | maskbits.SAT_CONNECTED
                          | maskbits.BAD | maskbits.EDGE)) != 0
        Hr, Wr = geom.red_shape
        seam_rows = tuple(geom.ysize_chan * i
                          for i in range(1, Hr // geom.ysize_chan))
        seam_cols = tuple(geom.xsize_chan * j
                          for j in range(1, Wr // geom.xsize_chan))
        if ctx.detect_sat_segments:
            # full-frame pass first (more sensitive to faint FULL
            # trails: the statistic integrates the whole line), then
            # the tiled segment pass for short streaks, seeded with
            # the full-frame lines so NSATS counts each physical
            # trail once (ops/satdet.py::detect_trail_segments)
            trail_mask, ntrails, _, lines = detect_trails(
                clean, excl, ctx.sat_params, seam_rows=seam_rows,
                seam_cols=seam_cols, want_lines=True)
            seg_mask, n_seg, _ = detect_trail_segments(
                clean, excl, ctx.sat_params, seam_rows=seam_rows,
                seam_cols=seam_cols, exclude_lines=lines)
            trail_mask = trail_mask | seg_mask
            ntrails = ntrails + n_seg
        else:
            trail_mask, ntrails, _ = detect_trails(
                clean, excl, ctx.sat_params, seam_rows=seam_rows,
                seam_cols=seam_cols)
        mask_m = jnp.where(trail_mask & ((mask_m & maskbits.EDGE) == 0),
                           mask_m | maskbits.SATELLITE, mask_m)
        stats["nsats"] = ntrails
    else:
        stats["nsats"] = jnp.int32(0)

    clean, mask_m = jax.lax.optimization_barrier((clean, mask_m))

    # edge pixels -> channel median (reference blackbox.py:1968-1974);
    # the median comes from an 8x8-subsampled grid — sorting all 7M
    # pixels per channel costs seconds on TPU for no statistical gain.
    # The column subsample is a 0/1 SELECTION MATMUL, not a strided
    # slice: a minor-axis ::8 stride lowers as a gather (~12 ns/elem,
    # ~20 ms here), row-only striding fattens the sorts instead
    # (54 -> 83 ms measured) — the MXU selection costs ~1 ms
    ch = geom.disassemble(clean)
    mk = geom.disassemble(mask_m)
    xch = ch.shape[2]
    nxc = xch // 8
    sel = jnp.zeros((nxc, xch), jnp.float32).at[
        jnp.arange(nxc), jnp.arange(nxc) * 8].set(1.0)
    ch_r = ch[:, ::8, :]
    mk_r = (mk[:, ::8, :] & maskbits.EDGE) != 0
    ch_s = jnp.einsum("cyx,sx->cys", ch_r, sel,
                      precision=jax.lax.Precision.HIGHEST)
    mk_s = jnp.einsum("cyx,sx->cys", mk_r.astype(jnp.float32), sel,
                      precision=jax.lax.Precision.HIGHEST) > 0.5
    C = ch.shape[0]
    chan_med = masked_median(ch_s.reshape(C, -1),
                             mk_s.reshape(C, -1), axis=1)
    chan_med = jnp.nan_to_num(chan_med)
    edge = (mk & maskbits.EDGE) != 0
    ch = jnp.where(edge, chan_med[:, None, None], ch)
    clean = geom.assemble(ch)

    # per-bit mask counts for the mask header
    for name, bit in maskbits.BITS.items():
        stats[f"n_{name}"] = jnp.sum((mask_m & bit) == bit)

    return clean, mask_m, stats


def extract_catalog(ctx: ReduceContext, sci, mask_m):
    """Background + detection + aperture photometry on a calibrated frame."""
    bad = mask_m != 0
    mesh, stdm = background_mesh(sci, bad, ctx.bkg_boxsize,
                                 nsigma=ctx.bkg_nsigma,
                                 filtersize=ctx.bkg_filtersize)
    bkg = mini2back(mesh, sci.shape, ctx.bkg_boxsize)
    bstd = mini2back(stdm, sci.shape, ctx.bkg_boxsize)
    sub = sci - bkg

    # stage boundaries bound XLA fusion (see calibrate_detector)
    sub, bstd = jax.lax.optimization_barrier((sub, bstd))

    excl = (mask_m & (maskbits.EDGE | maskbits.BAD
                      | maskbits.SATELLITE)) != 0
    seg, n = detect_segments(sub, bstd, excl, ctx.det_params)
    return catalog_tail(ctx, sci, sub, bkg, bstd, seg, n, mesh, stdm)


def catalog_tail(ctx: ReduceContext, sci, sub, bkg, bstd, seg, n,
                 mesh, stdm):
    """Per-source stages after segmentation: moments, photometry, PSF.

    Shared verbatim by :func:`extract_catalog` and the tile-sharded
    pixel stages (:mod:`blackbox_tpu.parallel.extract`), so the two
    paths stay bit-identical by construction downstream of ``seg``.
    """
    seg, n = jax.lax.optimization_barrier((seg, n))
    cat = segment_catalog(sub, bstd, seg, n, ctx.det_params)
    cat.update(moments_shape(cat))
    flux, fluxerr = aperture_photometry(
        sub, bstd, cat["x"], cat["y"], ctx.apphot_radii, n_active=n)
    cat["flux_ap"] = flux
    cat["fluxerr_ap"] = fluxerr
    cat["snr"] = flux[:, -1] / jnp.maximum(fluxerr[:, -1], 1e-9)

    # image-level stats: seeing estimate = flux-weighted median FWHM of
    # clean bright sources, background level/STD medians
    good = cat["valid"] & (cat["snr"] > 20) & (cat["elong"] < 1.5)
    fwhm_med = masked_median(cat["fwhm"], ~good, axis=0)
    ngood = jnp.maximum(jnp.sum(good), 1)
    fmean = jnp.sum(jnp.where(good, cat["fwhm"], 0.0)) / ngood
    fwhm_std = jnp.sqrt(jnp.sum(jnp.where(
        good, (cat["fwhm"] - fmean) ** 2, 0.0)) / ngood)
    # elongation stats over clean detections (S-ELONG/S-ELOSTD)
    egood = cat["valid"] & (cat["snr"] > 20)
    elong_med = masked_median(cat["elong"], ~egood, axis=0)
    neg = jnp.maximum(jnp.sum(egood), 1)
    emean = jnp.sum(jnp.where(egood, cat["elong"], 0.0)) / neg
    elong_std = jnp.sqrt(jnp.sum(jnp.where(
        egood, (cat["elong"] - emean) ** 2, 0.0)) / neg)
    stats = {
        "nobjects": jnp.sum(cat["valid"]),
        "s_seeing_pix": jnp.nan_to_num(fwhm_med, nan=ctx.fwhm_guess),
        "s_seestd_pix": jnp.nan_to_num(fwhm_std),
        "s_elong": jnp.nan_to_num(elong_med, nan=1.0),
        "s_elostd": jnp.nan_to_num(elong_std),
        "bkg_median": jnp.median(mesh),
        "bkg_std": jnp.median(stdm),
    }
    out = {"bkg": bkg, "bkg_std": bstd, "cat": cat, "stats": stats,
           "seg_nsources": n}

    # spatially-varying PSF model + optimal PSF fluxes (PSFEx / zogy
    # flux_opt equivalents — SURVEY.md §2.4/§2.5)
    if ctx.fit_psf:
        cat = jax.lax.optimization_barrier(cat)
        model = build_psf(sub, bstd, cat, sci.shape, ctx.psf_params,
                          n_active=n)
        fpsf, fpsf_err = psf_photometry(sub, bstd, model,
                                        cat["x"], cat["y"], n_active=n)
        cat["flux_psf"] = fpsf
        cat["fluxerr_psf"] = fpsf_err
        # the optimization_barrier above REBOUND cat to fresh leaves;
        # without this re-point the published catalog would silently
        # lack the PSF fluxes (bug found by the fused science step)
        out["cat"] = cat
        cen = psf_at(model, 0.5 * sci.shape[1], 0.5 * sci.shape[0])
        stats["psf_nstars"] = model.nstars
        stats["psf_chi2"] = model.chi2
        stats["psf_fwhm_pix"] = psf_fwhm(cen[None])[0]
        out["psf"] = model
    return out


def make_reduce_fn(ctx: ReduceContext, with_catalog: bool = True):
    """Build the jitted end-to-end reduce function."""

    def fn(chan_data, os_vert, os_hori, mbias, mflat, bpm, xtalk_coeffs):
        sci, mask_m, stats = calibrate_detector(
            ctx, chan_data, os_vert, os_hori, mbias, mflat, bpm,
            xtalk_coeffs)
        out = {"image": sci, "mask": mask_m, "stats": stats}
        if with_catalog:
            ext = extract_catalog(ctx, sci, mask_m)
            out["stats"] = {**stats, **ext.pop("stats")}
            out.update(ext)
        return out

    return jax.jit(fn)

import numpy as np
import pytest
import jax.numpy as jnp

from blackbox_tpu.astro.wcs import TanWCS
from blackbox_tpu.ops.background import background_mesh, mini2back
from blackbox_tpu.ops.detection import (
    DetectParams, detect_segments, segment_catalog, moments_shape)
from blackbox_tpu.ops.photometry import aperture_photometry
from blackbox_tpu.ops.psf import PSFParams, build_psf, psf_photometry
from blackbox_tpu.pipeline.subtract import SubtractionInput, run_subtraction
from blackbox_tpu.synth.generator import star_image


def _product(img, wcs, rng_unused=None, boxsize=64):
    """Detect + PSF-fit one synthetic frame into a SubtractionInput."""
    mesh, stdm = background_mesh(jnp.asarray(img), None, boxsize)
    bkg = mini2back(mesh, img.shape, boxsize)
    bstd = mini2back(stdm, img.shape, boxsize)
    sub = jnp.asarray(img) - bkg
    params = DetectParams(nsigma=2.0, max_sources=256, label_iters=32)
    seg, n = detect_segments(sub, bstd, None, params)
    cat = segment_catalog(sub, bstd, seg, n, params)
    cat.update(moments_shape(cat))
    flux, ferr = aperture_photometry(sub, bstd, cat["x"], cat["y"],
                                     (2.0, 5.0, 12.0))
    cat["snr"] = flux[:, -1] / jnp.maximum(ferr[:, -1], 1e-9)
    model = build_psf(sub, bstd, cat, img.shape,
                      PSFParams(size=25, poldeg=1, snr_min=10.0))
    fpsf, fpsferr = psf_photometry(sub, bstd, model, cat["x"], cat["y"])
    return SubtractionInput(
        image=jnp.asarray(img), bkg=bkg, bkg_std=bstd,
        mask=jnp.zeros(img.shape, jnp.uint8), psf=model, wcs=wcs,
        cat_x=np.asarray(cat["x"]), cat_y=np.asarray(cat["y"]),
        cat_flux=np.asarray(fpsf), cat_fluxerr=np.asarray(fpsferr),
        cat_valid=np.asarray(cat["valid"]))


def test_subtraction_end_to_end(rng):
    H = W = 256
    w_new = TanWCS.simple(150.0, -30.0, 0.5642, (H, W))
    w_ref = TanWCS.simple(150.0015, -29.9985, 0.5642, (H, W), rot_deg=3.0)

    nstars = 25
    xn = rng.uniform(30, W - 30, nstars)
    yn = rng.uniform(30, H - 30, nstars)
    fl = np.exp(rng.uniform(np.log(8e3), np.log(8e4), nstars))
    ra, dec = w_new.pix2sky(xn, yn)
    xr, yr = w_ref.sky2pix(ra, dec)
    fratio_true = 1.8

    stars_n = np.stack([xn, yn, fl, np.full(nstars, 3.2)], 1)
    stars_r = np.stack([xr, yr, fl * fratio_true,
                        np.full(nstars, 2.6)], 1)
    sky_n, sky_r = 60.0, 110.0
    tx, ty, tf = 101.4, 166.8, 4.0e4
    base_n = star_image((H, W), stars_n, moffat_beta=20.0) + sky_n
    base_n += star_image((H, W), [[tx, ty, tf, 3.2]], moffat_beta=20.0)
    base_r = star_image((H, W), stars_r, moffat_beta=20.0) + sky_r
    img_n = rng.poisson(base_n).astype(np.float32)
    img_r = rng.poisson(base_r).astype(np.float32)

    new = _product(img_n, w_new)
    ref = _product(img_r, w_ref)
    res = run_subtraction(new, ref)

    # flux ratio and registration recovered
    assert abs(res.stats["z_fratio"] - fratio_true) < 0.1 * fratio_true
    assert res.stats["z_nmatch"] >= 15
    assert res.stats["z_dxrms"] < 0.5 and res.stats["z_dyrms"] < 0.5

    # Scorr behaves like a unit-variance statistic away from sources
    assert 0.5 < res.stats["z_scorr_std"] < 2.0

    # the injected transient is found at its new-frame position
    cat = res.trans_cat
    x = np.asarray(cat["x"]); y = np.asarray(cat["y"])
    v = np.asarray(cat["valid"])
    d = np.where(v, np.hypot(x - tx, y - ty), np.inf)
    i = int(np.argmin(d))
    assert d[i] < 1.5, d.min()
    fp = float(np.asarray(cat["flux_psf"])[i])
    fe = float(np.asarray(cat["fluxerr_psf"])[i])
    assert abs(fp - tf) < 6 * max(fe, 1.0), (fp, tf, fe)
    assert abs(fp / tf - 1.0) < 0.12

    # and few spurious detections elsewhere
    others = v & (np.hypot(x - tx, y - ty) > 3.0)
    assert others.sum() <= 3, others.sum()


def test_measure_scaling_device_recovers_truth(rng):
    """Device fratio/dx/dy match vs known catalog transformation."""
    import jax
    from blackbox_tpu.pipeline.subtract import measure_scaling_device

    n, cap = 80, 256
    x = rng.uniform(20, 1000, n)
    y = rng.uniform(20, 1000, n)
    f = np.exp(rng.uniform(np.log(1e3), np.log(1e5), n))
    fr_true = 2.3
    # ref positions offset by a known jitter; fluxes scaled
    dx = rng.normal(0.4, 0.2, n)
    dy = rng.normal(-0.3, 0.15, n)

    def pad(a, fill=0.0):
        out = np.full(cap, fill, np.float32)
        out[:n] = a
        return jnp.asarray(out)

    valid = jnp.arange(cap) < n
    fn = jax.jit(measure_scaling_device)
    fratio, fstd, dxr, dyr, nm = fn(
        pad(x), pad(y), pad(f), pad(np.full(n, 1.0)), valid,
        pad(x - dx), pad(y - dy), pad(f * fr_true),
        pad(np.full(n, 1.0)), valid)
    assert int(nm) >= 60
    assert abs(float(fratio) - fr_true) < 0.02
    assert float(fstd) < 0.05
    # rms about the median offset = the injected jitter scatter
    assert abs(float(dxr) - 0.2) < 0.12
    assert abs(float(dyr) - 0.15) < 0.12


def test_measure_scaling_device_too_few_matches():
    from blackbox_tpu.pipeline.subtract import measure_scaling_device
    cap = 64
    z = jnp.zeros(cap)
    v = jnp.zeros(cap, bool)
    fratio, fstd, dxr, dyr, nm = measure_scaling_device(
        z, z, z, z, v, z, z, z, z, v)
    assert int(nm) == 0
    assert float(fratio) == 1.0 and float(fstd) == 0.0
    assert float(dxr) == 0.5 and float(dyr) == 0.5


@pytest.mark.slow
def test_fused_science_step_end_to_end():
    """ONE jitted program raw -> transient catalog (TINY geometry):
    recovers the injected transient, the flux ratio, and agrees with the
    sequential calibrate+extract parts."""
    import jax
    from blackbox_tpu.core.geometry import TINY
    from blackbox_tpu.config.defaults import ReductionSettings
    from blackbox_tpu.pipeline.reduce import (
        ReduceContext, calibrate_detector, extract_catalog)
    from blackbox_tpu.pipeline.subtract import fused_science_step
    from blackbox_tpu.ops.cosmics import LACosmicParams
    from blackbox_tpu.ops.detection import DetectParams
    from blackbox_tpu.ops.satdet import SatDetParams
    from blackbox_tpu.ops.psf import psf_at
    from blackbox_tpu.ops.transients import TransientParams
    from blackbox_tpu.synth import make_raw_science

    geom = TINY
    rng = np.random.default_rng(11)
    s = ReductionSettings(geometry=geom)
    ctx = ReduceContext.from_settings(
        s, "ML1",
        lac_params=LACosmicParams(sigclip=10.0, strip_rows=66),
        det_params=DetectParams(nsigma=1.5, max_sources=512,
                                label_iters=24),
        sat_params=SatDetParams(bin_factor=2, nsigma=8.0,
                                trail_halfwidth=4),
        bkg_boxsize=33, apphot_radii=(2.0, 4.5, 9.0), detect_sats=False)

    raw, truth = make_raw_science(geom, rng, nstars=40, ncosmics=4,
                                  trail=False, nsat=0, sky_e=300.0)
    chan, osv, osh = geom.split_raw(jnp.asarray(raw))
    mflat = jnp.asarray(geom.disassemble(truth.flat))

    # the ref side: the SAME frame reduced by the sequential parts and
    # scaled by a known flux ratio (a deeper/longer-exposed reference)
    sci, mask_m, _ = calibrate_detector(ctx, chan, osv, osh, None,
                                        mflat, None, None)
    ext = extract_catalog(ctx, sci, mask_m)
    fr_true = 1.6
    H, W = sci.shape
    ref_sub = (sci - ext["bkg"]) * fr_true
    ref_std = ext["bkg_std"] * fr_true
    sr = jnp.median(ext["bkg_std"]) * fr_true
    cat_r = ext["cat"]
    ref_cat = {"x": cat_r["x"], "y": cat_r["y"],
               "flux": cat_r["flux_psf"] * fr_true,
               "fluxerr": cat_r["fluxerr_psf"] * fr_true,
               "valid": cat_r["valid"]}
    psf_r = psf_at(ext["psf"], 0.5 * W, 0.5 * H)

    # inject a transient into the NEW raw frame (flat imprint applied,
    # e- -> ADU per channel, straight into the data sections)
    # transient PSF must match the frame's stars (make_raw_science uses
    # star_image's default Moffat beta) or the matched-filter flux biases
    tx, ty, tf = 0.53 * W, 0.47 * H, 3.0e4
    trans_e = star_image((H, W), [[tx, ty, tf, 3.0]])
    chan_new = chan + jnp.asarray(
        geom.disassemble(trans_e * truth.flat)
        / truth.gain[:, None, None])

    # identity remap grids (ref shares the new WCS here; the Lanczos
    # taps collapse to identity at integer coordinates)
    ys = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[:, None],
                          (H, W))
    xs = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :],
                          (H, W))

    fused = jax.jit(lambda *a: fused_science_step(
        ctx, *a, trans_params=TransientParams(label_iters=16)))
    out = fused(chan_new, osv, osh, None, mflat, None, None,
                ref_sub, ref_std, mask_m, (ys, xs), psf_r, sr, ref_cat)

    # the flux ratio and registration are recovered on device
    ts = {k: float(np.asarray(v)) for k, v in out["trans_stats"].items()}
    assert abs(ts["z_fratio"] - fr_true) < 0.1 * fr_true, ts
    assert ts["z_nmatch"] >= 10
    assert ts["z_dxrms"] < 0.5 and ts["z_dyrms"] < 0.5

    # the injected transient is found at its position, positive sign
    tc = out["trans_cat"]
    v = np.asarray(tc["valid"])
    d = np.where(v, np.hypot(np.asarray(tc["x"]) - tx,
                             np.asarray(tc["y"]) - ty), np.inf)
    i = int(np.argmin(d))
    assert d[i] < 2.0, (d.min(), int(v.sum()))
    assert int(np.asarray(tc["sign"])[i]) > 0
    # PSF flux of the transient ~ injected flux (D is in new-frame units)
    fp = float(np.asarray(tc["flux_psf"])[i])
    assert abs(fp / tf - 1.0) < 0.25, fp

    # few spurious transients (same scene on both sides otherwise)
    others = v & (np.hypot(np.asarray(tc["x"]) - tx,
                           np.asarray(tc["y"]) - ty) > 3.0)
    assert others.sum() <= 3, others.sum()

    # fused parity with the sequential parts on the calibrate+extract
    # half (same functions, same trace -> same math)
    sci_new, _, _ = calibrate_detector(ctx, chan_new, osv, osh, None,
                                       mflat, None, None)
    # jit-vs-eager float drift only (different HLO fusion): ~6e-5 rel
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(sci_new), rtol=2e-4, atol=0.05)


@pytest.mark.slow
def test_transient_peak_exact_at_large_flat_index():
    """Regression: peak flat indices beyond 2^24 must stay exact (f32
    index math shifted peaks by up to 4 px on full frames)."""
    import jax.numpy as jnp
    from blackbox_tpu.ops.transients import (TransientParams,
                                             extract_transients)
    H = W = 5000                      # flat index ~2.4e7 > 2^24
    ty, tx = 4801, 4703
    scorr = np.zeros((H, W), np.float32)
    scorr[ty - 1:ty + 2, tx - 1:tx + 2] = 8.0
    scorr[ty, tx] = 20.0
    z = {"Scorr": jnp.asarray(scorr),
         "Fpsf": jnp.asarray(scorr * 10.0),
         "Fpsferr": jnp.ones((H, W), jnp.float32),
         "D": jnp.asarray(scorr)}
    cat, n = extract_transients(z, None, None,
                                TransientParams(label_iters=8))
    assert int(n) == 1
    k = int(np.argmax(np.asarray(cat["valid"])))
    assert float(cat["x"][k]) == tx
    assert float(cat["y"][k]) == ty

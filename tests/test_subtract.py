import numpy as np
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

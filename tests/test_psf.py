import numpy as np
import jax.numpy as jnp

from blackbox_tpu.ops.background import background_mesh, mini2back
from blackbox_tpu.ops.detection import (
    DetectParams, detect_segments, segment_catalog, moments_shape)
from blackbox_tpu.ops.photometry import aperture_photometry
from blackbox_tpu.ops.psf import (
    PSFParams, build_psf, psf_at, psf_fwhm, psf_photometry, n_basis)
from blackbox_tpu.synth.generator import star_image


def _psf_field(rng, H=512, W=512, nstars=60, sky=300.0,
               fwhm0=2.6, dfwhm=1.2, flux_range=(2e4, 3e5)):
    """Star field whose FWHM varies linearly with x: fwhm0 -> fwhm0+dfwhm."""
    xs = rng.uniform(20, W - 20, nstars)
    ys = rng.uniform(20, H - 20, nstars)
    fluxes = np.exp(rng.uniform(np.log(flux_range[0]),
                                np.log(flux_range[1]), nstars))
    fwhm = fwhm0 + dfwhm * xs / W
    stars = np.stack([xs, ys, fluxes, fwhm], axis=1)
    img = star_image((H, W), stars) + sky
    img = rng.poisson(img).astype(np.float32)
    img += rng.normal(0, 3.0, img.shape).astype(np.float32)
    return img, stars


def _detect(img, boxsize=64, max_sources=256):
    mesh, stdm = background_mesh(jnp.asarray(img), None, boxsize)
    bkg = mini2back(mesh, img.shape, boxsize)
    bstd = mini2back(stdm, img.shape, boxsize)
    sub = jnp.asarray(img) - bkg
    params = DetectParams(nsigma=2.0, max_sources=max_sources,
                          label_iters=32)
    seg, n = detect_segments(sub, bstd, None, params)
    cat = segment_catalog(sub, bstd, seg, n, params)
    cat.update(moments_shape(cat))
    flux, ferr = aperture_photometry(sub, bstd, cat["x"], cat["y"],
                                     (2.0, 5.0, 12.0))
    cat["flux"] = flux[:, -1]
    cat["snr"] = flux[:, -1] / jnp.maximum(ferr[:, -1], 1e-9)
    return sub, bstd, cat


def test_build_psf_recovers_spatial_fwhm(rng):
    img, stars = _psf_field(rng)
    sub, bstd, cat = _detect(img)
    model = build_psf(sub, bstd, cat, img.shape,
                      PSFParams(size=25, poldeg=1))
    assert int(model.nstars) >= 30
    assert model.basis.shape == (n_basis(1), 25, 25)

    # the recovered stamps match analytic unit-flux Moffats of the
    # injected (position-dependent) FWHM, and the gradient is recovered
    def moffat_stamp(fwhm, size=25):
        m = star_image((size, size), [[size // 2, size // 2, 1.0, fwhm]])
        return m / m.sum()

    H, W = img.shape
    for fx in (0.1, 0.9):
        want_fwhm = 2.6 + 1.2 * fx
        p = np.asarray(psf_at(model, fx * W, 0.5 * H))
        ref = moffat_stamp(want_fwhm)
        wrong = moffat_stamp(2.6 + 1.2 * (1.0 - fx))
        assert np.abs(p - ref).sum() < 0.10          # ~10% total mismatch
        assert np.abs(p - ref).sum() < np.abs(p - wrong).sum()

    # Gaussian-equivalent FWHM still increases left -> right
    f_l = float(psf_fwhm(psf_at(model, 0.1 * W, 0.5 * H)[None])[0])
    f_r = float(psf_fwhm(psf_at(model, 0.9 * W, 0.5 * H)[None])[0])
    assert f_r - f_l > 0.5

    # PSF stamps are unit-normalised and non-negative
    p = psf_at(model, 0.1 * W, 0.5 * H)
    assert np.isclose(float(jnp.sum(p)), 1.0, atol=1e-5)
    assert float(jnp.min(p)) >= 0.0


def test_psf_photometry_matches_truth(rng):
    img, stars = _psf_field(rng, nstars=40)
    sub, bstd, cat = _detect(img)
    model = build_psf(sub, bstd, cat, img.shape,
                      PSFParams(size=25, poldeg=1))

    xs = np.asarray(cat["x"])
    ys = np.asarray(cat["y"])
    valid = np.asarray(cat["valid"])
    flux, ferr = psf_photometry(sub, bstd, model,
                                jnp.asarray(xs), jnp.asarray(ys))
    flux = np.asarray(flux)

    # match detections to injected stars, compare optimal flux to truth
    nmatch = 0
    ratios = []
    for x, y, f, w in stars:
        d = np.hypot(xs - x, ys - y)
        i = int(np.argmin(np.where(valid, d, np.inf)))
        if d[i] < 1.0:
            nmatch += 1
            ratios.append(flux[i] / f)
    ratios = np.array(ratios)
    assert nmatch >= 30
    # mmag-class accuracy in the median; a few % scatter from noise
    assert abs(np.median(ratios) - 1.0) < 0.02, np.median(ratios)
    assert np.std(ratios) < 0.1


def test_psf_photometry_error_scale(rng):
    # pure-noise positions: flux consistent with zero at ~1 sigma_F
    img, stars = _psf_field(rng, nstars=10)
    sub, bstd, cat = _detect(img)
    model = build_psf(sub, bstd, cat, img.shape,
                      PSFParams(size=25, poldeg=1, snr_min=10.0))
    xs = jnp.asarray(rng.uniform(40, 470, 50).astype(np.float32))
    ys = jnp.asarray(rng.uniform(40, 470, 50).astype(np.float32))
    flux, ferr = psf_photometry(sub, bstd, model, xs, ys)
    z = np.asarray(flux / ferr)
    assert abs(np.mean(z)) < 1.0
    assert 0.4 < np.std(z) < 3.0


def test_psf_fits_roundtrip(tmp_path):
    """PSFEx-spirit _psf.fits write/read preserves the model."""
    import jax.numpy as jnp

    from blackbox_tpu.io.psffits import read_psf, write_psf
    from blackbox_tpu.ops.psf import PSFModel, psf_at

    rng = np.random.default_rng(2)
    basis = rng.normal(0, 1, (6, 15, 15)).astype(np.float32)
    m = PSFModel(basis=jnp.asarray(basis),
                 polzero_x=jnp.float32(100.0),
                 polzero_y=jnp.float32(120.0),
                 polscal_x=jnp.float32(50.0),
                 polscal_y=jnp.float32(60.0), poldeg=2,
                 nstars=jnp.int32(42), chi2=jnp.float32(1.25))
    p = str(tmp_path / "x_psf.fits")
    write_psf(p, m)
    back = read_psf(p)
    np.testing.assert_allclose(np.asarray(back.basis), basis, atol=1e-6)
    assert back.poldeg == 2
    assert int(back.nstars) == 42
    # the reconstructed spatially-varying PSF evaluates identically
    np.testing.assert_allclose(
        np.asarray(psf_at(back, 140.0, 90.0)),
        np.asarray(psf_at(m, 140.0, 90.0)), atol=1e-6)

import pytest
import numpy as np
import jax.numpy as jnp

from blackbox_tpu.ops.zogy import zogy_subtract, flux_ratio, ZogyParams
from blackbox_tpu.ops.transients import (
    TransientParams, extract_transients, transient_stats)
from blackbox_tpu.synth.generator import star_image


def _gauss_psf(size, fwhm):
    m = star_image((size, size), [[size // 2, size // 2, 1.0, fwhm]],
                   moffat_beta=20.0)      # beta->inf ~ Gaussian core
    return (m / m.sum()).astype(np.float32)


def _scene(rng, H=256, W=256, sky_n=50.0, sky_r=50.0,
           fwhm_n=3.2, fwhm_r=2.6, nstars=15):
    """Common star field rendered with two different PSFs + noise."""
    xs = rng.uniform(24, W - 24, nstars)
    ys = rng.uniform(24, H - 24, nstars)
    fl = np.exp(rng.uniform(np.log(5e3), np.log(6e4), nstars))
    stars_n = np.stack([xs, ys, fl, np.full(nstars, fwhm_n)], 1)
    stars_r = np.stack([xs, ys, fl, np.full(nstars, fwhm_r)], 1)
    base_n = star_image((H, W), stars_n, moffat_beta=20.0)
    base_r = star_image((H, W), stars_r, moffat_beta=20.0)
    new = rng.poisson(base_n + sky_n).astype(np.float32) - sky_n
    ref = rng.poisson(base_r + sky_r).astype(np.float32) - sky_r
    return new, ref, np.sqrt(sky_n), np.sqrt(sky_r)


def test_zogy_cancels_common_stars(rng):
    new, ref, sn, sr = _scene(rng)
    out = zogy_subtract(jnp.asarray(new), jnp.asarray(ref),
                        jnp.asarray(_gauss_psf(25, 3.2)),
                        jnp.asarray(_gauss_psf(25, 2.6)),
                        sn, sr)
    scorr = np.asarray(out["Scorr"])
    assert np.isfinite(scorr).all()
    # Scorr is a unit-variance statistic in the background
    assert 0.7 < np.std(scorr) < 1.6, np.std(scorr)
    # common stars cancel: no |Scorr| >= 6 peaks (a couple of pixels of
    # Poisson leakage on the brightest stars is acceptable)
    assert np.sum(np.abs(scorr) > 6.0) <= 5, np.sum(np.abs(scorr) > 6.0)


def test_zogy_detects_transient_and_flux(rng):
    new, ref, sn, sr = _scene(rng)
    tf, tx, ty = 3.0e4, 71.3, 140.6
    new = new + star_image(new.shape, [[tx, ty, tf, 3.2]],
                           moffat_beta=20.0).astype(np.float32)
    out = zogy_subtract(jnp.asarray(new), jnp.asarray(ref),
                        jnp.asarray(_gauss_psf(25, 3.2)),
                        jnp.asarray(_gauss_psf(25, 2.6)),
                        sn, sr)
    cat, n = extract_transients(out, params=TransientParams())
    assert int(n) >= 1
    x = np.asarray(cat["x"]); y = np.asarray(cat["y"])
    v = np.asarray(cat["valid"])
    d = np.where(v, np.hypot(x - tx, y - ty), np.inf)
    i = int(np.argmin(d))
    assert d[i] < 1.0, d.min()
    assert int(np.asarray(cat["sign"])[i]) == 1
    # PSF flux within 5 sigma of truth (Poisson + bkg noise)
    fp = float(np.asarray(cat["flux_psf"])[i])
    fe = float(np.asarray(cat["fluxerr_psf"])[i])
    assert abs(fp - tf) < 5 * max(fe, 1.0), (fp, tf, fe)
    # flux accurate to a few percent
    assert abs(fp / tf - 1.0) < 0.05

    st = transient_stats(cat, n)
    assert int(st["t_npos"]) >= 1


def test_zogy_negative_transient(rng):
    new, ref, sn, sr = _scene(rng)
    ref = ref + star_image(ref.shape, [[200.0, 60.0, 2.5e4, 2.6]],
                           moffat_beta=20.0).astype(np.float32)
    out = zogy_subtract(jnp.asarray(new), jnp.asarray(ref),
                        jnp.asarray(_gauss_psf(25, 3.2)),
                        jnp.asarray(_gauss_psf(25, 2.6)),
                        sn, sr)
    cat, n = extract_transients(out)
    x = np.asarray(cat["x"]); y = np.asarray(cat["y"])
    v = np.asarray(cat["valid"])
    d = np.where(v, np.hypot(x - 200.0, y - 60.0), np.inf)
    i = int(np.argmin(d))
    assert d[i] < 1.5
    assert int(np.asarray(cat["sign"])[i]) == -1
    assert float(np.asarray(cat["flux_psf"])[i]) < 0


def test_zogy_mask_rejection(rng):
    from blackbox_tpu.core import maskbits
    new, ref, sn, sr = _scene(rng)
    new = new + star_image(new.shape, [[100.0, 100.0, 5e4, 3.2]],
                           moffat_beta=20.0).astype(np.float32)
    mask = np.zeros(new.shape, np.uint8)
    mask[90:110, 90:110] = maskbits.SATURATED
    out = zogy_subtract(jnp.asarray(new), jnp.asarray(ref),
                        jnp.asarray(_gauss_psf(25, 3.2)),
                        jnp.asarray(_gauss_psf(25, 2.6)),
                        sn, sr)
    cat, n = extract_transients(out, mask_new=jnp.asarray(mask))
    x = np.asarray(cat["x"]); y = np.asarray(cat["y"])
    v = np.asarray(cat["valid"])
    d = np.where(v, np.hypot(x - 100.0, y - 100.0), np.inf)
    assert d.min() > 5.0      # masked transient does not appear


def test_flux_ratio_clipped_median():
    n = 64
    fn = np.full(n, 2000.0); fr = np.full(n, 1000.0)
    fn[:5] = 1e6                      # outliers
    snr = np.full(n, 50.0)
    valid = np.ones(n, bool)
    r, std, nused = flux_ratio(jnp.asarray(fn), jnp.asarray(fr),
                               jnp.asarray(snr), jnp.asarray(snr),
                               jnp.asarray(valid))
    assert abs(float(r) - 2.0) < 1e-3
    assert int(nused) >= n - 5


def test_zogy_kernel_stamp_matches_exact(rng):
    """Small-stamp k² spectra reproduce the exact full-frame round-trip.

    The variance-map path with kernel_stamp=K builds kn²/kr² on a K×K
    aliased grid; with K comfortably above the kernels' decay length the
    Scorr statistic must match the exact (kernel_stamp=0) computation.
    """
    new, ref, sn, sr = _scene(rng)
    new = new + star_image(new.shape, [[71.3, 140.6, 3.0e4, 3.2]],
                           moffat_beta=20.0).astype(np.float32)
    vn = jnp.asarray(sn ** 2 + np.maximum(new, 0.0))
    vr = jnp.asarray(sr ** 2 + np.maximum(ref, 0.0))
    args = (jnp.asarray(new), jnp.asarray(ref),
            jnp.asarray(_gauss_psf(25, 3.2)),
            jnp.asarray(_gauss_psf(25, 2.6)), sn, sr)
    kw = dict(var_new=vn, var_ref=vr, want_psf_d=False)
    exact = zogy_subtract(*args, params=ZogyParams(kernel_stamp=0), **kw)
    small = zogy_subtract(*args, params=ZogyParams(kernel_stamp=128), **kw)
    s_e = np.asarray(exact["Scorr"])
    s_s = np.asarray(small["Scorr"])
    assert np.isfinite(s_s).all()
    # interior comparison (the aliased fold only matters at the border)
    d = np.abs(s_s - s_e)[16:-16, 16:-16]
    assert d.max() < 0.02, d.max()
    np.testing.assert_allclose(np.asarray(small["D"]),
                               np.asarray(exact["D"]), atol=1e-4)


def test_zogy_spectral_poisson_matches_varmap(rng):
    """var_bkg + spectral source term ~ explicit variance maps.

    The fast path models V = V_bkg + max(source, 0) with the Poisson
    term from the images' own spectra (rectified after the k²
    convolution instead of per-pixel before it).  Scorr must agree
    with the explicit-map path to a few percent in the background and
    keep the transient's significance.
    """
    new, ref, sn, sr = _scene(rng)
    tf, tx, ty = 3.0e4, 71.3, 140.6
    new = new + star_image(new.shape, [[tx, ty, tf, 3.2]],
                           moffat_beta=20.0).astype(np.float32)
    args = (jnp.asarray(new), jnp.asarray(ref),
            jnp.asarray(_gauss_psf(25, 3.2)),
            jnp.asarray(_gauss_psf(25, 2.6)), sn, sr)
    vm = zogy_subtract(*args, want_psf_d=False,
                       var_new=jnp.asarray(sn ** 2 + np.maximum(new, 0)),
                       var_ref=jnp.asarray(sr ** 2 + np.maximum(ref, 0)))
    sp = zogy_subtract(*args, want_psf_d=False,
                       var_bkg_new=jnp.float32(sn ** 2),
                       var_bkg_ref=jnp.float32(sr ** 2))
    s_vm = np.asarray(vm["Scorr"])
    s_sp = np.asarray(sp["Scorr"])
    assert np.isfinite(s_sp).all()
    # same unit-variance background statistic
    assert abs(np.std(s_sp) / np.std(s_vm) - 1.0) < 0.05
    # transient peak significance preserved
    iy, ix = int(round(ty)), int(round(tx))
    pk_vm = s_vm[iy - 2:iy + 3, ix - 2:ix + 3].max()
    pk_sp = s_sp[iy - 2:iy + 3, ix - 2:ix + 3].max()
    assert abs(pk_sp / pk_vm - 1.0) < 0.05, (pk_vm, pk_sp)
    # pointwise agreement away from the noise floor
    m = np.abs(s_vm) > 4.0
    if m.any():
        rel = np.abs(s_sp[m] - s_vm[m]) / np.abs(s_vm[m])
        assert np.median(rel) < 0.05


def test_psf_to_otf_matches_padded_fft(rng):
    """The separable-DFT OTF equals the zero-pad + roll + rfft2 OTF."""
    from blackbox_tpu.ops.zogy import psf_to_otf
    S, H, W = 9, 64, 80
    p = rng.random((S, S)).astype(np.float32)
    p /= p.sum()
    got = np.asarray(psf_to_otf(jnp.asarray(p), (H, W)))

    pad = np.zeros((H, W), np.float32)
    pad[:S, :S] = p
    pad = np.roll(pad, (-(S // 2), -(S // 2)), axis=(0, 1))
    ref = np.fft.rfft2(pad)
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_fast_fft_size():
    from blackbox_tpu.ops.zogy import fast_fft_size
    assert fast_fft_size(10560) == 10752          # 2^9 * 21
    assert fast_fft_size(10752) == 10752          # already fast
    assert fast_fft_size(1980) == 2048
    assert fast_fft_size(1) == 1
    for n in (7, 100, 999, 5280, 10561):
        m = fast_fft_size(n)
        assert m >= n
        odd = m
        while odd % 2 == 0:
            odd //= 2
        assert odd in (1, 3, 5, 7, 11, 21), (n, m, odd)


def test_otf_to_psf_stamp_matches_inverse_fft(rng):
    """The stamp-DFT extraction equals irfft2 + roll + crop, for both
    the rfft half plane and the packed full-column spectrum."""
    from blackbox_tpu.ops.zogy import (hermitian_full, otf_to_psf_stamp,
                                       psf_to_otf)
    H, W, S = 96, 130, 25
    psf = jnp.asarray(_gauss_psf(S, 3.1))
    half = psf_to_otf(psf, (H, W))
    # oracle: full-frame inverse, centre rolled to (S//2, S//2)
    full_img = np.fft.irfft2(np.asarray(half), (H, W))
    want = np.roll(full_img, (S // 2, S // 2), axis=(0, 1))[:S, :S]
    got_half = np.asarray(otf_to_psf_stamp(half, (H, W), S))
    np.testing.assert_allclose(got_half, want, atol=2e-6)
    got_full = np.asarray(
        otf_to_psf_stamp(hermitian_full(half, W), (H, W), S))
    np.testing.assert_allclose(got_full, want, atol=2e-6)
    # round trip recovers the PSF itself (stamp support < frame)
    np.testing.assert_allclose(got_half, np.asarray(psf), atol=2e-6)


@pytest.mark.parametrize("sizes", [
    ((96, 131),),                              # odd W: no Nyquist column
    pytest.param(((97, 130), (101, 103)), marks=pytest.mark.slow),
])
def test_zogy_pack_fft_odd_rect_sizes(rng, sizes):
    """The packed half-plane unpack/mirror slicing is exact for odd and
    rectangular frame sizes too (Nyquist-column bookkeeping differs)."""
    for H, W in sizes:
        new = rng.normal(0, 5, (H, W)).astype(np.float32)
        ref = rng.normal(0, 4, (H, W)).astype(np.float32)
        pn = jnp.asarray(_gauss_psf(25, 3.0))
        pr = jnp.asarray(_gauss_psf(25, 2.5))
        kw = dict(var_bkg_new=jnp.full((H, W), 25.0, jnp.float32),
                  var_bkg_ref=jnp.full((H, W), 16.0, jnp.float32))
        # pad_fast=False keeps the odd sizes in the transforms
        a = zogy_subtract(jnp.asarray(new), jnp.asarray(ref), pn, pr,
                          5.0, 4.0, params=ZogyParams(pack_fft=False,
                                                      pad_fast=False),
                          **kw)
        b = zogy_subtract(jnp.asarray(new), jnp.asarray(ref), pn, pr,
                          5.0, 4.0, params=ZogyParams(pack_fft=True,
                                                      pad_fast=False),
                          **kw)
        for key in ("D", "S", "Scorr"):
            x, y = np.asarray(a[key]), np.asarray(b[key])
            scale = max(np.abs(x).max(), 1e-6)
            np.testing.assert_allclose(
                y, x, atol=3e-4 * scale, rtol=3e-4,
                err_msg=f"{key} at {(H, W)}")


def test_zogy_pack_fft_matches_unpacked(rng):
    """pack_fft=True (pairs of real transforms on one complex FFT) is
    the same statistic: exact algebra up to f32 packing round-off."""
    new, ref, sn, sr = _scene(rng)
    pn = jnp.asarray(_gauss_psf(25, 3.2))
    pr = jnp.asarray(_gauss_psf(25, 2.6))
    H, W = new.shape
    vb_n = np.full((H, W), sn ** 2, np.float32) * \
        (1.0 + 0.1 * rng.uniform(size=(H, W)).astype(np.float32))
    vb_r = np.full((H, W), sr ** 2, np.float32)
    vn = vb_n + np.maximum(new, 0.0)
    vr = vb_r + np.maximum(ref, 0.0)

    cases = [
        dict(),                                              # scalar
        dict(var_bkg_new=jnp.asarray(vb_n),                  # bkg+Poisson
             var_bkg_ref=jnp.asarray(vb_r)),
        dict(var_new=jnp.asarray(vn), var_ref=jnp.asarray(vr)),  # varmap
    ]
    for kw in cases:
        a = zogy_subtract(jnp.asarray(new), jnp.asarray(ref), pn, pr,
                          sn, sr, params=ZogyParams(pack_fft=False),
                          **kw)
        b = zogy_subtract(jnp.asarray(new), jnp.asarray(ref), pn, pr,
                          sn, sr, params=ZogyParams(pack_fft=True),
                          **kw)
        for key in ("D", "S", "Scorr", "Fpsf", "psf_D"):
            x, y = np.asarray(a[key]), np.asarray(b[key])
            scale = max(np.abs(x).max(), 1e-6)
            np.testing.assert_allclose(y, x, atol=2e-4 * scale,
                                       rtol=2e-4,
                                       err_msg=f"{key} {kw.keys()}")
        np.testing.assert_allclose(float(b["F_S"]), float(a["F_S"]),
                                   rtol=1e-4)


def test_fft_auto_resolves_to_xla_off_tpu(rng):
    """ZogyParams.fft='auto' must use the complex64 xla path on the CPU
    mesh (the split kernel would run interpreted); parity with an
    explicit fft='xla' call is exact."""
    import jax
    from blackbox_tpu.ops.zogy import ZogyParams, zogy_subtract

    H = W = 96
    new = rng.normal(100.0, 5.0, (H, W)).astype(np.float32)
    ref = rng.normal(100.0, 4.0, (H, W)).astype(np.float32)
    yy = np.arange(25, dtype=np.float32) - 12.0
    psf = np.exp(-(yy[:, None] ** 2 + yy[None, :] ** 2) / 8.0)
    psf = (psf / psf.sum()).astype(np.float32)
    args = (jnp.asarray(new), jnp.asarray(ref), jnp.asarray(psf),
            jnp.asarray(psf), 5.0, 4.0)
    a = zogy_subtract(*args, params=ZogyParams(fft="auto"))
    b = zogy_subtract(*args, params=ZogyParams(fft="xla"))
    np.testing.assert_array_equal(np.asarray(a["Scorr"]),
                                  np.asarray(b["Scorr"]))

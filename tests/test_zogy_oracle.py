"""Independent float64 oracle for the full ZOGY statistic chain.

Implements Zackay, Ofek & Gal-Yam 2016 (ApJ 830:27) eqs. 13-17, 26-29,
41-42 and the source-noise/astrometric V[S] corrections directly in
numpy float64 — full-frame complex FFTs, no packing, no fast-size
padding, no kernel stamps — and requires the production
:func:`blackbox_tpu.ops.zogy.zogy_subtract` (pack_fft + pad_fast
defaults) to reproduce it to float32 rounding.  This is the
end-to-end numerical-fidelity guard for the subtraction half of the
pipeline (the calibration half's float64 oracle lives in
test_golden_parity).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from blackbox_tpu.ops.zogy import ZogyParams, zogy_subtract
from blackbox_tpu.synth.generator import star_image


def _gauss_psf(size, fwhm):
    m = star_image((size, size), [[size // 2, size // 2, 1.0, fwhm]],
                   moffat_beta=20.0)
    return (m / m.sum()).astype(np.float32)


def _otf64(psf, shape):
    H, W = shape
    S = psf.shape[-1]
    pad = np.zeros(shape, np.float64)
    pad[:S, :S] = psf
    return np.fft.fft2(np.roll(pad, (-(S // 2), -(S // 2)), (0, 1)))


def zogy_oracle64(new, ref, psf_n, psf_r, sn, sr, fn=1.0, fr=1.0,
                  vbn=None, vbr=None, dx=0.25, dy=0.25, eps=1e-12):
    """Float64 full-frame ZOGY: returns D, S, Scorr, Fpsf, F_D, F_S."""
    H, W = new.shape
    N = np.fft.fft2(new.astype(np.float64))
    R = np.fft.fft2(ref.astype(np.float64))
    Pn = _otf64(psf_n.astype(np.float64), (H, W))
    Pr = _otf64(psf_r.astype(np.float64), (H, W))
    fn = np.float64(fn)
    fr = np.float64(fr)
    sn = np.float64(sn)
    sr = np.float64(sr)
    Pn2 = np.abs(Pn) ** 2
    Pr2 = np.abs(Pr) ** 2
    den = sn ** 2 * fr ** 2 * Pr2 + sr ** 2 * fn ** 2 * Pn2 + eps
    D = np.fft.ifft2((fr * Pr * N - fn * Pn * R) / np.sqrt(den)).real
    F_D = fn * fr / np.sqrt(sn ** 2 * fr ** 2 + sr ** 2 * fn ** 2)
    kn_hat = fn * fr ** 2 * np.conj(Pn) * Pr2 / den
    kr_hat = fr * fn ** 2 * np.conj(Pr) * Pn2 / den
    Sn = np.fft.ifft2(kn_hat * N).real
    Sr = np.fft.ifft2(kr_hat * R).real
    S = Sn - Sr

    kn = np.fft.ifft2(kn_hat).real
    kr = np.fft.ifft2(kr_hat).real
    if vbn is None:
        V_src = sn ** 2 * np.sum(kn ** 2) + sr ** 2 * np.sum(kr ** 2)
    else:
        V_src = vbn * np.sum(kn ** 2) + vbr * np.sum(kr ** 2)
        src = (np.fft.ifft2(np.fft.fft2(kn ** 2) * N).real
               + np.fft.ifft2(np.fft.fft2(kr ** 2) * R).real)
        V_src = V_src + np.maximum(src, 0.0)

    def grad(img):
        gy = 0.5 * (np.roll(img, -1, 0) - np.roll(img, 1, 0))
        gx = 0.5 * (np.roll(img, -1, 1) - np.roll(img, 1, 1))
        return gy, gx

    dSn_dy, dSn_dx = grad(Sn)
    dSr_dy, dSr_dx = grad(Sr)
    V_ast = (dx ** 2 * (dSn_dx ** 2 + dSr_dx ** 2)
             + dy ** 2 * (dSn_dy ** 2 + dSr_dy ** 2))
    V_S = V_src + V_ast
    Scorr = S / np.sqrt(np.maximum(V_S, eps))
    F_S = np.mean(fn ** 2 * fr ** 2 * Pn2 * Pr2 / den)
    return {"D": D, "S": S, "Scorr": Scorr, "Fpsf": S / F_S,
            "F_D": F_D, "F_S": F_S}


def _scene(rng, H, W):
    xs = rng.uniform(20, W - 20, 12)
    ys = rng.uniform(20, H - 20, 12)
    fl = np.exp(rng.uniform(np.log(5e3), np.log(5e4), 12))
    base_n = star_image((H, W), np.stack(
        [xs, ys, fl, np.full(12, 3.1)], 1), moffat_beta=20.0)
    base_r = star_image((H, W), np.stack(
        [xs, ys, fl, np.full(12, 2.6)], 1), moffat_beta=20.0)
    new = rng.poisson(base_n + 50.0).astype(np.float32) - 50.0
    ref = rng.poisson(base_r + 36.0).astype(np.float32) - 36.0
    # one transient so the peak fidelity is exercised too
    new = new + star_image((H, W), [[0.44 * W, 0.61 * H, 2.5e4, 3.1]],
                           moffat_beta=20.0).astype(np.float32)
    return new, ref


@pytest.mark.parametrize("impl", ["xla", "split"])
@pytest.mark.parametrize("vbkg", [False, True])
def test_production_zogy_matches_f64_oracle(rng, vbkg, impl):
    # 120x120: pad_fast pads to 128, so the fast-size path is exercised
    # and only the border band (inside the EDGE mask in production) is
    # allowed to differ from the unpadded oracle.  impl="split" runs
    # the Pallas split-real FFT path (interpreter on the CPU mesh)
    # against the SAME float64 oracle — the representation changes, the
    # statistic must not.
    H = W = 120
    new, ref = _scene(rng, H, W)
    pn = _gauss_psf(25, 3.1)
    pr = _gauss_psf(25, 2.6)
    sn, sr = np.sqrt(50.0), np.sqrt(36.0)
    kw = {}
    okw = {}
    if vbkg:
        kw = dict(var_bkg_new=jnp.full((H, W), sn ** 2, jnp.float32),
                  var_bkg_ref=jnp.full((H, W), sr ** 2, jnp.float32))
        okw = dict(vbn=sn ** 2, vbr=sr ** 2)

    got = zogy_subtract(jnp.asarray(new), jnp.asarray(ref),
                        jnp.asarray(pn), jnp.asarray(pr), sn, sr,
                        fn=1.0, fr=1.15, params=ZogyParams(fft=impl),
                        **kw)
    want = zogy_oracle64(new, ref, pn, pr, sn, sr, fn=1.0, fr=1.15,
                         **okw)

    assert abs(float(got["F_D"]) / want["F_D"] - 1.0) < 1e-5
    assert abs(float(got["F_S"]) / want["F_S"] - 1.0) < 1e-4

    # interior band: clear of the wraparound/pad border by the PSF
    # stamp width (production ships the border under the EDGE bit)
    b = 26
    sl = (slice(b, H - b), slice(b, W - b))
    for key, tol in (("D", 2e-4), ("S", 2e-4), ("Scorr", 5e-4),
                     ("Fpsf", 2e-4)):
        g = np.asarray(got[key])[sl].astype(np.float64)
        w = want[key][sl]
        scale = max(np.abs(w).max(), 1e-9)
        dmax = np.abs(g - w).max() / scale
        assert dmax < tol, (key, dmax)

    # the transient peak's significance agrees to f32 rounding
    iy, ix = int(0.61 * H), int(0.44 * W)
    pk_g = np.asarray(got["Scorr"])[iy - 3:iy + 4, ix - 3:ix + 4].max()
    pk_w = want["Scorr"][iy - 3:iy + 4, ix - 3:ix + 4].max()
    assert abs(pk_g / pk_w - 1.0) < 1e-3, (pk_g, pk_w)

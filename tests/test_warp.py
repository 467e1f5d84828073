import numpy as np
import jax.numpy as jnp

from blackbox_tpu.astro.wcs import TanWCS
from blackbox_tpu.ops.warp import (
    remap, remap_grid, lanczos_resample, nearest_resample)
from blackbox_tpu.synth.generator import star_image


def _field(rng, H=256, W=256, nstars=8, sky=0.0):
    xs = rng.uniform(40, W - 40, nstars)
    ys = rng.uniform(40, H - 40, nstars)
    fl = np.full(nstars, 1e4)
    stars = np.stack([xs, ys, fl, np.full(nstars, 3.0)], 1)
    return (star_image((H, W), stars) + sky).astype(np.float32), stars


def test_identity_remap(rng):
    img, _ = _field(rng)
    w = TanWCS.simple(150.0, -30.0, 0.5642, img.shape)
    out = np.asarray(remap(jnp.asarray(img), w, w, img.shape))
    s = slice(8, -8)
    np.testing.assert_allclose(out[s, s], img[s, s], atol=2e-3 * img.max())


def test_fractional_shift_preserves_flux_and_position(rng):
    img, stars = _field(rng)
    H, W = img.shape
    w1 = TanWCS.simple(150.0, -30.0, 0.5642, img.shape)
    w2 = TanWCS(w1.crval1, w1.crval2, w1.crpix1 + 10.3, w1.crpix2 - 5.7,
                w1.cd)
    out = np.asarray(remap(jnp.asarray(img), w1, w2, img.shape))
    # star at (x, y) in src appears at (x + 10.3, y - 5.7) in dst:
    # compare against a directly-rendered shifted field (box sums share
    # the same Moffat wing truncation)
    shifted = stars.copy()
    shifted[:, 0] += 10.3
    shifted[:, 1] -= 5.7
    want = star_image((H, W), shifted).astype(np.float32)
    for x, y, f, _ in shifted:
        if not (20 < x < W - 20 and 20 < y < H - 20):
            continue
        x0, y0 = int(round(x)), int(round(y))
        cut = out[y0 - 8:y0 + 9, x0 - 8:x0 + 9]
        ref = want[y0 - 8:y0 + 9, x0 - 8:x0 + 9]
        assert abs(cut.sum() / ref.sum() - 1.0) < 0.01
        yy, xx = np.mgrid[0:17, 0:17]
        xc = (cut * xx).sum() / cut.sum()
        xr = (ref * xx).sum() / ref.sum()
        yc = (cut * yy).sum() / cut.sum()
        yr = (ref * yy).sum() / ref.sum()
        assert abs(xc - xr) < 0.05 and abs(yc - yr) < 0.05


def test_rotation_remap_places_star(rng):
    H = W = 256
    img = star_image((H, W), [[160.0, 128.0, 1e4, 3.0]]).astype(np.float32)
    w1 = TanWCS.simple(150.0, -30.0, 0.5642, (H, W))
    w2 = TanWCS.simple(150.0, -30.0, 0.5642, (H, W), rot_deg=30.0)
    out = np.asarray(remap(jnp.asarray(img), w1, w2, (H, W)))
    # the star keeps its sky position: predict dst pixel via the WCS pair
    ra, dec = w1.pix2sky(160.0, 128.0)
    xd, yd = w2.sky2pix(ra, dec)
    pk = np.unravel_index(np.argmax(out), out.shape)
    assert abs(pk[1] - xd) < 1.0 and abs(pk[0] - yd) < 1.0
    assert out.max() > 0.5 * img.max()


def test_remap_grid_matches_exact_mapping():
    w1 = TanWCS.simple(150.0, -30.0, 0.5642, (256, 256))
    w2 = TanWCS.simple(150.01, -30.007, 0.5642, (256, 256), rot_deg=1.0)
    ys, xs = remap_grid(w1, w2, (256, 256), step=32)
    # spot-check the interpolated grid against the exact transform
    for (yy, xx) in [(17, 203), (100, 100), (255, 1), (3, 250)]:
        ra, dec = w2.pix2sky(float(xx), float(yy))
        ex, ey = w1.sky2pix(ra, dec)
        assert abs(xs[yy, xx] - ex) < 2e-3
        assert abs(ys[yy, xx] - ey) < 2e-3


def test_nearest_mask_remap():
    H = W = 64
    mask = np.zeros((H, W), np.uint8)
    mask[10:20, 30:40] = 5
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    out = np.asarray(nearest_resample(jnp.asarray(mask),
                                      jnp.asarray(ys - 3.0),
                                      jnp.asarray(xs + 2.0)))
    assert (np.unique(out) == np.array([0, 5])).all()
    assert out[13 + 3, 33 - 2] == 5
    # out-of-bounds fill
    out2 = np.asarray(nearest_resample(jnp.asarray(mask),
                                       jnp.asarray(ys - 100.0),
                                       jnp.asarray(xs), fill=7))
    assert (out2 == 7).all()


def test_lanczos_constant_field_flat():
    src = jnp.full((64, 64), 3.25, jnp.float32)
    ys = jnp.asarray(np.random.default_rng(0).uniform(10, 50, (16, 16)),
                     jnp.float32)
    xs = jnp.asarray(np.random.default_rng(1).uniform(10, 50, (16, 16)),
                     jnp.float32)
    out = np.asarray(lanczos_resample(src, ys, xs))
    np.testing.assert_allclose(out, 3.25, atol=1e-4)

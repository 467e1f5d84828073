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


def test_resample_blocked_parity_dense():
    """Row-blocked multi-resample == dense per-source resamples, both
    from coarse nodes and from full coordinate planes."""
    from blackbox_tpu.ops.warp import resample_blocked, upsample_grid

    rng = np.random.default_rng(7)
    H, W = 128, 96
    img = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    std = jnp.asarray(rng.uniform(1, 2, (H, W)).astype(np.float32))
    msk = jnp.asarray((rng.uniform(size=(H, W)) < 0.1).astype(np.uint8))

    # affine-ish coarse mapping (step 32) + bilinear upsample weights
    step = 32
    gy = np.arange(0, H + step, step, np.float64)
    gx = np.arange(0, W + step, step, np.float64)
    gyy, gxx = np.meshgrid(gy, gx, indexing="ij")
    sy = (gyy * 0.997 + 1.3 + 0.002 * gxx).astype(np.float32)
    sx = (gxx * 1.002 - 2.1 - 0.001 * gyy).astype(np.float32)

    def weights(n_out, n_nodes):
        Wm = np.zeros((n_out, n_nodes), np.float32)
        f = np.arange(n_out, dtype=np.float64) / step
        i0 = np.minimum(f.astype(np.int64), n_nodes - 2)
        t = (f - i0).astype(np.float32)
        Wm[np.arange(n_out), i0] = 1.0 - t
        Wm[np.arange(n_out), i0 + 1] = t
        return Wm

    grid4 = (jnp.asarray(sy), jnp.asarray(sx),
             jnp.asarray(weights(H, len(gy))),
             jnp.asarray(weights(W, len(gx))))
    ys = upsample_grid(grid4[0], grid4[2], grid4[3])
    xs = upsample_grid(grid4[1], grid4[2], grid4[3])

    ref_i = lanczos_resample(img, ys, xs)
    ref_s = nearest_resample(std, ys, xs, fill=1.5)
    ref_m = nearest_resample(msk, ys, xs, fill=np.uint8(32))

    for grid in (grid4, (ys, xs)):
        out_i, out_s, out_m = resample_blocked(
            (img, std, msk), ("lanczos", "nearest", "nearest"),
            (0.0, 1.5, np.uint8(32)), grid, block_rows=32)
        np.testing.assert_allclose(np.asarray(out_i), np.asarray(ref_i),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out_s),
                                      np.asarray(ref_s))
        np.testing.assert_array_equal(np.asarray(out_m),
                                      np.asarray(ref_m))


def test_warp_shift2pass_accuracy():
    """Two-pass variable-shift Lanczos vs the dense 36-tap remap: for a
    production-scale mapping (small rotation + offset) the smooth-image
    values agree to well under a percent of the dynamic range, nearest
    planes agree except at rounding boundaries, and out-of-frame fill
    matches exactly."""
    from blackbox_tpu.ops.warp import (grid_shift_ranges, upsample_grid,
                                       warp_shift2pass)

    rng = np.random.default_rng(5)
    H, W = 256, 256
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    # smooth image + a few gaussian stars
    img = 100.0 + 5 * np.sin(yy / 17.0) + 4 * np.cos(xx / 23.0)
    for (yc, xc) in [(60, 70), (128, 128), (200, 40)]:
        img += 900.0 * np.exp(-((yy - yc) ** 2 + (xx - xc) ** 2) / 8.0)
    img = img.astype(np.float32)
    std = rng.uniform(1, 2, (H, W)).astype(np.float32)
    msk = (rng.uniform(size=(H, W)) < 0.05).astype(np.uint8)

    # rotation 0.05 deg + offsets: the production registration scale
    step = 32
    th = np.deg2rad(0.05)
    ct, st = np.cos(th), np.sin(th)
    cy, cx = H / 2, W / 2
    gy = np.arange(0, H + step, step, np.float64)
    gx = np.arange(0, W + step, step, np.float64)
    gyy, gxx = np.meshgrid(gy - cy, gx - cx, indexing="ij")
    sx = (cx + ct * gxx + st * gyy + 3.2).astype(np.float32)
    sy = (cy - st * gxx + ct * gyy - 2.7).astype(np.float32)

    def weights(n_out, n_nodes):
        Wm = np.zeros((n_out, n_nodes), np.float32)
        f = np.arange(n_out, dtype=np.float64) / step
        i0 = np.minimum(f.astype(np.int64), n_nodes - 2)
        t = (f - i0).astype(np.float32)
        Wm[np.arange(n_out), i0] = 1.0 - t
        Wm[np.arange(n_out), i0 + 1] = t
        return Wm

    grid = (jnp.asarray(sy), jnp.asarray(sx),
            jnp.asarray(weights(H, len(gy))),
            jnp.asarray(weights(W, len(gx))))
    ranges = grid_shift_ranges(sy, sx, step=step)

    ys = upsample_grid(grid[0], grid[2], grid[3])
    xs = upsample_grid(grid[1], grid[2], grid[3])
    want_i = np.asarray(lanczos_resample(jnp.asarray(img), ys, xs))
    want_s = np.asarray(nearest_resample(jnp.asarray(std), ys, xs,
                                         fill=1.5))
    want_m = np.asarray(nearest_resample(jnp.asarray(msk), ys, xs,
                                         fill=np.uint8(32)))

    got_i, got_s, got_m = [np.asarray(o) for o in warp_shift2pass(
        (jnp.asarray(img), jnp.asarray(std), jnp.asarray(msk)),
        ("lanczos", "nearest", "nearest"), (0.0, 1.5, np.uint8(32)),
        grid, ranges)]

    # identical fill decisions
    np.testing.assert_array_equal(got_i == 0.0, want_i == 0.0)
    # in-frame values: second-order sampling displacement only
    inb = want_i != 0.0
    err = np.abs(got_i - want_i)[inb]
    assert np.max(err) < 3.0, np.max(err)         # ~0.3% of star peak
    assert np.median(err) < 0.02
    # nearest planes: equal except at rounding boundaries
    frac_s = np.mean(got_s != want_s)
    frac_m = np.mean(got_m != want_m)
    assert frac_s < 0.02, frac_s
    assert frac_m < 0.02, frac_m


def test_upsample_lerp_matches_matmul():
    from blackbox_tpu.ops.warp import upsample_grid, upsample_lerp

    rng = np.random.default_rng(9)
    step, H, W = 16, 96, 80
    ny = H // step + 2
    nx = W // step + 2
    c = rng.normal(100.0, 10.0, (ny, nx)).astype(np.float32)

    def weights(n_out, n_nodes):
        Wm = np.zeros((n_out, n_nodes), np.float32)
        f = np.arange(n_out, dtype=np.float64) / step
        i0 = np.minimum(f.astype(np.int64), n_nodes - 2)
        t = (f - i0).astype(np.float32)
        Wm[np.arange(n_out), i0] = 1.0 - t
        Wm[np.arange(n_out), i0 + 1] = t
        return Wm

    want = np.asarray(upsample_grid(jnp.asarray(c),
                                    jnp.asarray(weights(H, ny)),
                                    jnp.asarray(weights(W, nx))))
    got = np.asarray(upsample_lerp(jnp.asarray(c), step, H, W))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_warp_shift2pass_coarse_step_grid():
    """(sy, sx, step) grid form == the (sy, sx, Wy, Wx) matmul form."""
    from blackbox_tpu.ops.warp import grid_shift_ranges, warp_shift2pass

    rng = np.random.default_rng(3)
    H = W = 128
    step = 32
    img = rng.normal(50.0, 4.0, (H, W)).astype(np.float32)
    gy = np.arange(0, H + step, step, np.float64)
    gx = np.arange(0, W + step, step, np.float64)
    gyy, gxx = np.meshgrid(gy, gx, indexing="ij")
    sy = (gyy * 1.0 - 1.7 + 0.001 * gxx).astype(np.float32)
    sx = (gxx * 1.0 + 2.3 - 0.001 * gyy).astype(np.float32)

    def weights(n_out, n_nodes):
        Wm = np.zeros((n_out, n_nodes), np.float32)
        f = np.arange(n_out, dtype=np.float64) / step
        i0 = np.minimum(f.astype(np.int64), n_nodes - 2)
        t = (f - i0).astype(np.float32)
        Wm[np.arange(n_out), i0] = 1.0 - t
        Wm[np.arange(n_out), i0 + 1] = t
        return Wm

    ranges = grid_shift_ranges(sy, sx, step=step)
    g4 = (jnp.asarray(sy), jnp.asarray(sx),
          jnp.asarray(weights(H, len(gy))),
          jnp.asarray(weights(W, len(gx))))
    g3 = (jnp.asarray(sy), jnp.asarray(sx), step)
    out4 = warp_shift2pass((jnp.asarray(img),), ("lanczos",), (0.0,),
                           g4, ranges)[0]
    out3 = warp_shift2pass((jnp.asarray(img),), ("lanczos",), (0.0,),
                           g3, ranges)[0]
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out4),
                               atol=2e-3)


def test_shift2pass_slab_source(rng):
    """A slab-fed warp (source taller than the output grid — the
    blocked co-add's calling convention) must agree with the full-
    frame warp on the same mapping: out row r reads slab row r+s, and
    the fill bounds come from the SOURCE shape (round-5 regression:
    grid-shaped bounds zeroed every coordinate past the block
    height)."""
    from blackbox_tpu.ops.warp import warp_shift2pass

    H, W = 128, 64
    src = rng.normal(0, 1, (H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    th = np.deg2rad(1.0)
    ct, st = np.cos(th), np.sin(th)
    cy, cx = H / 2, W / 2
    ys = (cy + ct * (yy - cy) + st * (xx - cx) + 1.3).astype(np.float32)
    xs = (cx - st * (yy - cy) + ct * (xx - cx) - 0.7).astype(np.float32)
    ry = (int(np.floor((ys - yy).min())) - 2,
          int(np.floor((ys - yy).max())) + 3)
    rx = (int(np.floor((xs - xx).min())) - 2,
          int(np.floor((xs - xx).max())) + 3)
    full, mfull = warp_shift2pass(
        (jnp.asarray(src), jnp.asarray((src > 0.5).astype(np.uint8))),
        ("lanczos", "nearest"), (0.0, jnp.uint8(255)),
        (jnp.asarray(ys), jnp.asarray(xs)), (ry, rx))

    # slab: source rows 60..128 feed output rows 64..96
    out0, n_out, y0s = 64, 32, 60
    slab = src[y0s:y0s + 68]
    ys_b = ys[out0:out0 + n_out] - y0s
    xs_b = xs[out0:out0 + n_out]
    dyb = ys_b - np.arange(n_out)[:, None]
    ryb = (int(np.floor(dyb.min())) - 2, int(np.floor(dyb.max())) + 3)
    blk, mblk = warp_shift2pass(
        (jnp.asarray(slab),
         jnp.asarray((slab > 0.5).astype(np.uint8))),
        ("lanczos", "nearest"), (0.0, jnp.uint8(255)),
        (jnp.asarray(ys_b), jnp.asarray(xs_b)), (ryb, rx))

    d = np.abs(np.asarray(blk) - np.asarray(full)[out0:out0 + n_out])
    # interior parity: identical taps, different static range centres
    # (f32 rounding order only)
    assert d[:, 4:-4].max() < 1e-4, d[:, 4:-4].max()
    np.testing.assert_array_equal(
        np.asarray(mblk)[:, 4:-4],
        np.asarray(mfull)[out0:out0 + n_out, 4:-4])

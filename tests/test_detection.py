import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blackbox_tpu.ops.background import background_mesh, mini2back
from blackbox_tpu.ops.detection import (
    DetectParams, detect_segments, segment_catalog, moments_shape)
from blackbox_tpu.ops.photometry import aperture_photometry
from blackbox_tpu.ops.satdet import detect_trails, SatDetParams
from blackbox_tpu.synth.generator import star_image


def _field(rng, H=256, W=256, nstars=12, sky=200.0, fwhm=3.0,
           flux_range=(3e3, 3e4)):
    xs = rng.uniform(16, W - 16, nstars)
    ys = rng.uniform(16, H - 16, nstars)
    fluxes = np.exp(rng.uniform(np.log(flux_range[0]),
                                np.log(flux_range[1]), nstars))
    stars = np.stack([xs, ys, fluxes, np.full(nstars, fwhm)], axis=1)
    img = star_image((H, W), stars) + sky
    img = rng.poisson(img).astype(np.float32)
    img += rng.normal(0, 5.0, img.shape).astype(np.float32)
    return img.astype(np.float32), stars


def test_background_mesh_flat_sky(rng):
    img, stars = _field(rng, nstars=6)
    mesh, std = background_mesh(jnp.asarray(img), None, 32)
    mesh = np.asarray(mesh)
    assert abs(np.median(mesh) - 200.0) < 3.0
    # stars should not drag boxes up by much (clipped median)
    assert mesh.max() - mesh.min() < 15.0
    full = np.asarray(mini2back(jnp.asarray(mesh), img.shape, 32))
    assert full.shape == img.shape
    assert abs(np.median(full) - 200.0) < 3.0


def test_mini2back_smooth_gradient():
    # exact reproduction of a linear gradient (bicubic reproduces linears)
    ny = nx = 8
    bs = 16
    yy, xx = np.mgrid[0:ny, 0:nx].astype(np.float32)
    mesh = 10.0 + 2.0 * yy + 3.0 * xx
    full = np.asarray(mini2back(jnp.asarray(mesh), (ny * bs, nx * bs), bs))
    # check interior against the analytic plane
    ys = (np.arange(ny * bs) - (0.5 * bs - 0.5)) / bs
    xs = (np.arange(nx * bs) - (0.5 * bs - 0.5)) / bs
    want = 10.0 + 2.0 * ys[:, None] + 3.0 * xs[None, :]
    s = slice(2 * bs, -2 * bs)   # clamped edge nodes distort the 1st boxes
    np.testing.assert_allclose(full[s, s], want[s, s], rtol=1e-4)


def test_detection_finds_stars(rng):
    img, stars = _field(rng, nstars=10)
    mesh, stdm = background_mesh(jnp.asarray(img), None, 32)
    bkg = mini2back(mesh, img.shape, 32)
    bstd = mini2back(stdm, img.shape, 32)
    sub = jnp.asarray(img) - bkg

    params = DetectParams(nsigma=2.0, max_sources=128, label_iters=24)
    seg, n = detect_segments(sub, bstd, None, params)
    cat = segment_catalog(sub, bstd, seg, n, params)
    shape = moments_shape(cat)
    xs = np.asarray(cat["x"])[np.asarray(cat["valid"])]
    ys = np.asarray(cat["y"])[np.asarray(cat["valid"])]

    assert int(n) >= 10
    # every injected star matched within 1 px
    for x, y, f, _ in stars:
        d = np.hypot(xs - x, ys - y).min()
        assert d < 1.0, f"star at {(x, y)} not found (min dist {d})"
    # FWHM estimate in the right ballpark for the brightest sources
    fw = np.asarray(shape["fwhm"])[np.asarray(cat["valid"])]
    assert 1.5 < np.median(fw) < 5.5


def test_aperture_photometry_recovers_flux(rng):
    H = W = 128
    sky = 100.0
    stars = np.array([[40.3, 50.7, 2e4, 3.0], [90.2, 30.5, 5e4, 3.0]])
    img = star_image((H, W), stars) + sky
    img = rng.poisson(img).astype(np.float32)
    bstd = jnp.full((H, W), np.sqrt(sky), jnp.float32)
    sub = jnp.asarray(img) - sky

    radii = [1.5 * 3.0, 3.0 * 3.0]  # 1.5 and 3 FWHM
    flux, err = aperture_photometry(sub, bstd,
                                    jnp.asarray(stars[:, 0]),
                                    jnp.asarray(stars[:, 1]), radii)
    flux = np.asarray(flux)
    # large aperture captures most of the Moffat flux (beta=2.5 ~ 90%+)
    for i, (x, y, f, _) in enumerate(stars):
        assert flux[i, 1] > 0.85 * f
        assert flux[i, 1] < 1.1 * f
        assert flux[i, 0] < flux[i, 1]


def test_satdet_finds_trail(rng):
    H = W = 256
    img = rng.normal(0.0, 5.0, (H, W)).astype(np.float32)
    # diagonal-ish trail: col = 0.4*row + 30
    for r in range(H):
        c = int(0.4 * r + 30)
        if 0 <= c < W:
            img[r, c - 1:c + 2] += 120.0
    params = SatDetParams(bin_factor=2, nsigma=8.0, trail_halfwidth=4)
    m, n, snr = detect_trails(jnp.asarray(img), None, params)
    m = np.asarray(m)
    assert int(n) >= 1
    # trail pixels covered
    hits = 0
    for r in range(0, H, 16):
        c = int(0.4 * r + 30)
        if 0 <= c < W:
            hits += int(m[r, c])
    assert hits >= 12
    # mask should not cover most of the image
    assert m.mean() < 0.2


def test_satdet_no_false_positive(rng):
    img = rng.normal(0.0, 5.0, (256, 256)).astype(np.float32)
    m, n, snr = detect_trails(jnp.asarray(img), None,
                              SatDetParams(bin_factor=2))
    assert int(n) == 0


@pytest.mark.slow
def test_moments_exact_at_large_coordinates():
    """Regression: central moments must not lose precision at large
    absolute pixel coordinates (f32 x^2 ~ 1e8 cancellation corrupted
    fwhm/elong over most of a full frame)."""
    import jax.numpy as jnp
    from blackbox_tpu.ops.detection import (DetectParams, detect_segments,
                                            segment_catalog, moments_shape)
    H = W = 5000
    cy, cx = 4801, 4703
    img = np.zeros((H, W), np.float32)
    g = np.arange(-6, 7, dtype=np.float32)
    blob = np.exp(-0.5 * (g[:, None] ** 2 + g[None, :] ** 2)
                  / (3.0 / 2.355) ** 2) * 5000.0
    img[cy - 6:cy + 7, cx - 6:cx + 7] = blob
    bstd = np.full((H, W), 5.0, np.float32)
    p = DetectParams(nsigma=3.0, max_sources=16, label_iters=8)
    seg, n = detect_segments(jnp.asarray(img), jnp.asarray(bstd), None, p)
    cat = segment_catalog(jnp.asarray(img), jnp.asarray(bstd), seg, n, p)
    cat.update(moments_shape(cat))
    assert int(n) == 1
    k = int(np.argmax(np.asarray(cat["valid"])))
    assert abs(float(cat["x"][k]) - cx) < 0.05
    assert abs(float(cat["y"][k]) - cy) < 0.05
    # symmetric gaussian: elongation ~1, fwhm ~3 px
    assert float(cat["elong"][k]) < 1.05, float(cat["elong"][k])
    assert abs(float(cat["fwhm"][k]) - 3.0) < 0.6, float(cat["fwhm"][k])


def test_segment_roots_matches_raster_oracle(rng):
    """segment_roots == flat indices of root pixels in raster order,
    clamped to H*W-1 past the last segment (reference semantics: the
    k-th SExtractor object's first scanned pixel — blackbox consumes
    label counts via scipy.ndimage, /root/reference/blackbox.py:4343)."""
    from blackbox_tpu.ops.detection import segment_roots
    from blackbox_tpu.ops.labeling import label_components

    H, W = 160, 224
    det = rng.random((H, W)) < 0.02
    # a few blobs so multi-pixel segments exist
    for (y, x) in [(10, 10), (80, 120), (150, 200)]:
        det[y:y + 4, x:x + 5] = True
    seg_lab = label_components(jnp.asarray(det), iters=16)
    seg = np.asarray(jnp.where(jnp.asarray(det), seg_lab, 0))

    idx = np.arange(H * W).reshape(H, W) + 1
    oracle = np.flatnonzero((seg == idx) & (seg > 0))
    cap = len(oracle) + 7                    # force the k > n tail
    got = np.asarray(segment_roots(jnp.asarray(seg), cap))
    np.testing.assert_array_equal(got[:len(oracle)], oracle)
    assert (got[len(oracle):] == H * W - 1).all()


def test_radon_packing_parity(rng):
    """Packed-pair Radon == per-channel Radon (hermitian unpack at the
    slice taps is exact for bilinear interpolation)."""
    from blackbox_tpu.ops.satdet import _radon_fft

    maps = jnp.asarray(rng.random((3, 96, 80)).astype(np.float32))
    proj3, th3, N3 = _radon_fft(maps, 36, pack=True)
    singles = [_radon_fft(maps[k:k + 1], 36, pack=False)[0][0]
               for k in range(3)]
    for k in range(3):
        np.testing.assert_allclose(np.asarray(proj3[k]),
                                   np.asarray(singles[k]),
                                   rtol=0, atol=5e-3)


@pytest.mark.slow
def test_satdet_finds_misaligned_long_trail(rng):
    """A long faint trail midway between the angle-grid angles smears
    over many offset bins; the single-line lit fraction collapses and
    only the band-integrated statistic recovers it (band_widths)."""
    H = W = 4096
    img = rng.normal(0, 3.0, (H, W)).astype(np.float32)
    yy = np.arange(H)
    xx = (0.35 * yy + 300).astype(np.int64)
    keep = xx < W - 1
    img[yy[keep], xx[keep]] += 9.0
    img[yy[keep], xx[keep] + 1] += 9.0
    mask, n, snr = detect_trails(jnp.asarray(img), None, SatDetParams())
    assert int(n) >= 1
    # the rasterised mask covers the injected line
    cover = np.asarray(mask)[yy[keep], xx[keep]]
    assert cover.mean() > 0.8


@pytest.mark.slow
def test_satdet_seam_veto(rng):
    """A bright row exactly on a channel seam is an instrument
    artifact: vetoed when the seam coordinate is declared, detected
    otherwise."""
    H = W = 1024
    img = rng.normal(0, 3.0, (H, W)).astype(np.float32)
    img[512:514, :] += 9.0                     # bright line on the seam
    p = SatDetParams(bin_factor=4)
    m1, n1, _ = detect_trails(jnp.asarray(img), None, p)
    assert int(n1) >= 1
    m2, n2, _ = detect_trails(jnp.asarray(img), None, p,
                              seam_rows=(512,))
    assert int(n2) == 0


def test_satdet_thick_band_rejected(rng):
    """A bright band wide beyond any defocused trail (>= 96 px of
    fully-lit adjacent lines surviving the background mesh) trips the
    thick-structure veto, while a narrow trail of the same surface
    brightness is kept.  (Bands wider than the mesh box have their
    interior absorbed by the background stage instead — the residual
    edge ridge is contaminated sky and masking it is correct.)"""
    H = W = 1024
    p = SatDetParams(bin_factor=8)
    band = rng.normal(0, 3.0, (H, W)).astype(np.float32)
    band[296:416, :] += 9.0                    # 120-px thick band
    m, n, _ = detect_trails(jnp.asarray(band), None, p)
    assert int(n) == 0
    narrow = rng.normal(0, 3.0, (H, W)).astype(np.float32)
    narrow[300:303, :] += 9.0                  # 3-px trail
    m, n, _ = detect_trails(jnp.asarray(narrow), None, p)
    assert int(n) >= 1


@pytest.mark.slow
def test_satdet_wide_trail_detected(rng):
    """Defocused/wide satellite trails (tens of px) must still be
    detected: a fixed fully-lit-line COUNT in the thick-structure veto
    rejected 16-48 px trails at bin 8 (review regression); the
    threshold is a physical width now."""
    H = W = 2048
    for width, f in ((16, 8), (32, 8), (24, 4)):
        img = rng.normal(0, 3.0, (H, W)).astype(np.float32)
        img[700:700 + width, :] += 9.0
        m, n, snr = detect_trails(jnp.asarray(img), None,
                                  SatDetParams(bin_factor=f))
        assert int(n) >= 1, (width, f)
        assert np.asarray(m)[700 + width // 2, :].mean() > 0.8


@pytest.mark.slow
def test_satdet_custom_band_widths_no_crash(rng):
    """band_widths without width 1 must not crash on small frames
    where the drift filter rejects every entry (review finding)."""
    img = rng.normal(0, 3.0, (256, 256)).astype(np.float32)
    m, n, snr = detect_trails(
        jnp.asarray(img), None,
        SatDetParams(bin_factor=4, band_widths=(5, 15)))
    assert int(n) == 0


def test_trail_segments_partial_streak(rng):
    """The opt-in tiled segment mode finds a partial streak the
    full-frame statistic rejects (lit-fraction gate), and stays quiet
    on noise and star fields."""
    import jax
    from blackbox_tpu.ops.satdet import (SatDetParams, detect_trails,
                                         detect_trail_segments)

    # 1024² so the ~30% streak carries enough winsorised length for
    # the segment mode's 12-sigma floor (the statistic is
    # length-driven; amplitude saturates at the winsor clip)
    H = W = 1024
    p = SatDetParams(bin_factor=2)
    img = rng.normal(0, 1, (H, W)).astype(np.float32)
    for x in range(80, 80 + 310):        # ~30% of the full line
        img[int(120 + 0.3 * (x - 80)), x] += 8.0
    jf = jax.jit(lambda a: detect_trails(a, None, p)[1])
    js = jax.jit(lambda a: detect_trail_segments(a, None, p)[:2])
    assert int(jf(jnp.asarray(img))) == 0          # full-frame blind
    m, n = js(jnp.asarray(img))
    # exactly once: the cross-tile NMS merges the echoes of the same
    # physical streak seen by several overlapping tiles
    assert int(n) == 1
    assert int(jnp.sum(m)) > 0

    # a FULL bright trail, already counted by the full-frame pass,
    # seeds the NMS via exclude_lines: zero NEW segment counts
    img2 = rng.normal(0, 1, (H, W)).astype(np.float32)
    for x in range(W):
        y = int(100 + 0.7 * x)
        if 0 <= y < H:
            img2[y, x] += 10.0

    @jax.jit
    def fullpass(a):
        _, nf, _, lines = detect_trails(a, None, p, want_lines=True)
        _, ns, _ = detect_trail_segments(a, None, p,
                                         exclude_lines=lines)
        return nf, ns

    nf, ns2 = fullpass(jnp.asarray(img2))
    assert int(nf) == 1 and int(ns2) == 0

    noise = rng.normal(0, 1, (H, W)).astype(np.float32)
    _, n0 = js(jnp.asarray(noise))
    assert int(n0) == 0

    stars = rng.normal(0, 1, (H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    for _ in range(120):
        x0, y0 = rng.uniform(10, W - 10), rng.uniform(10, H - 10)
        a = np.exp(rng.uniform(np.log(5), np.log(60)))
        stars += a * np.exp(-((yy - y0) ** 2 + (xx - x0) ** 2) / 8.0)
    _, ns = js(jnp.asarray(stars.astype(np.float32)))
    assert int(ns) == 0

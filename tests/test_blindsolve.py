"""Blind quad-hash astrometric solve (astro/blindsolve + csrc/quadmatch).

Synthetic end-to-end: build a quad index from a fake Gaia catalog,
project a 'true' WCS (offset well beyond the seeded solver's coarse
histogram range, rotated, mirrored) to make detections, and recover the
WCS with no pointing seed at all.
"""

import numpy as np
import pytest

from blackbox_tpu.astro import blindsolve
from blackbox_tpu.astro.blindsolve import QuadIndex, blind_solve
from blackbox_tpu.astro.wcs import TanWCS, haversine

RA0, DEC0 = 183.0, -25.0
PIXSCALE = 0.5642           # arcsec/pix (MeerLICHT plate scale)
SHAPE = (2000, 2000)


def _have_lib():
    return blindsolve._get_lib() is not None


pytestmark = pytest.mark.skipif(not _have_lib(),
                                reason="quadmatch C++ lib unavailable")


@pytest.fixture(scope="module")
def sky():
    # ~3000 stars over 1.4x1.4 deg around the nominal pointing: about
    # 150 land on the 18.8-arcmin field wherever it points within the
    # tested +-0.45 deg offsets
    rng = np.random.default_rng(42)
    n = 3000
    ra = RA0 + rng.uniform(-0.7, 0.7, n) / np.cos(np.radians(DEC0))
    dec = DEC0 + rng.uniform(-0.7, 0.7, n)
    mag = rng.uniform(10.0, 18.0, n)
    return ra, dec, mag


@pytest.fixture(scope="module")
def index(sky):
    ra, dec, mag = sky
    # quad diameters matching 20-45 % of the 2000-px field
    return QuadIndex.build(ra, dec, mag, scale_min_deg=0.05,
                           scale_max_deg=0.16, nmax_stars=3000)


def _make_detections(sky, true_wcs, rng, noise=0.25, drop_frac=0.3,
                     n_spurious=20):
    ra, dec, mag = sky
    x, y = true_wcs.sky2pix(ra, dec)
    ny, nx = SHAPE
    keep = (x > 5) & (x < nx - 5) & (y > 5) & (y < ny - 5)
    keep &= rng.uniform(size=len(x)) > drop_frac
    x, y, m = x[keep], y[keep], mag[keep]
    x = x + rng.normal(0, noise, len(x))
    y = y + rng.normal(0, noise, len(y))
    flux = 10 ** (-0.4 * (m - 25.0)) * rng.lognormal(0, 0.05, len(m))
    sx = rng.uniform(0, nx, n_spurious)
    sy = rng.uniform(0, ny, n_spurious)
    sf = 10 ** (-0.4 * (rng.uniform(13, 18, n_spurious) - 25.0))
    return (np.concatenate([x, sx]), np.concatenate([y, sy]),
            np.concatenate([flux, sf]))


def _check_recovered(wcs, true_wcs, tol_arcsec=0.5):
    gx = np.array([100.0, 1900.0, 100.0, 1900.0, 1000.0])
    gy = np.array([100.0, 100.0, 1900.0, 1900.0, 1000.0])
    ra_t, dec_t = true_wcs.pix2sky(gx, gy)
    ra_s, dec_s = wcs.pix2sky(gx, gy)
    sep = haversine(ra_t, dec_t, ra_s, dec_s) * 3600.0
    assert np.max(sep) < tol_arcsec, f"max sep {np.max(sep):.3f} arcsec"


def test_index_build(index):
    assert len(index.quads) > 200
    # codes sorted by first component, all inside the AB circle
    assert np.all(np.diff(index.codes[:, 0]) >= 0)
    for k in (0, 2):
        r2 = ((index.codes[:, k] - 0.5) ** 2
              + (index.codes[:, k + 1] - 0.5) ** 2)
        assert np.all(r2 <= 0.52)


def test_blind_solve_offset_rotated(sky, index):
    """Pointing 0.57 deg off nominal, rotated 15 deg: no seed recovers it."""
    rng = np.random.default_rng(7)
    true_wcs = TanWCS.simple(RA0 + 0.45, DEC0 + 0.35, PIXSCALE, SHAPE,
                             rot_deg=15.0)
    x, y, flux = _make_detections(sky, true_wcs, rng)
    sol = blind_solve(x, y, flux, index, SHAPE, pixscale_hint=PIXSCALE)
    assert sol.ok and sol.nmatch >= 30
    _check_recovered(sol.wcs, true_wcs)


def test_blind_solve_mirrored_parity(sky, index):
    """flip_x=False mirrors the pixel grid; both parities must solve."""
    rng = np.random.default_rng(8)
    true_wcs = TanWCS.simple(RA0 - 0.4, DEC0 + 0.3, PIXSCALE, SHAPE,
                             rot_deg=-40.0, flip_x=False)
    x, y, flux = _make_detections(sky, true_wcs, rng)
    sol = blind_solve(x, y, flux, index, SHAPE, pixscale_hint=PIXSCALE)
    assert sol.ok and sol.nmatch >= 30
    _check_recovered(sol.wcs, true_wcs)


def test_blind_solve_no_scale_hint(sky, index):
    rng = np.random.default_rng(9)
    true_wcs = TanWCS.simple(RA0 + 0.2, DEC0 - 0.45, PIXSCALE, SHAPE,
                             rot_deg=120.0)
    x, y, flux = _make_detections(sky, true_wcs, rng)
    sol = blind_solve(x, y, flux, index, SHAPE, pixscale_hint=None)
    assert sol.ok and sol.nmatch >= 30
    _check_recovered(sol.wcs, true_wcs)


def test_blind_solve_rejects_garbage(index):
    rng = np.random.default_rng(10)
    x = rng.uniform(0, 2000, 120)
    y = rng.uniform(0, 2000, 120)
    flux = rng.lognormal(3, 1, 120)
    sol = blind_solve(x, y, flux, index, SHAPE, pixscale_hint=PIXSCALE)
    assert not sol.ok


def test_index_roundtrip(tmp_path, index):
    p = str(tmp_path / "idx.npz")
    index.save(p)
    idx2 = QuadIndex.load(p)
    assert np.array_equal(idx2.quads, index.quads)
    assert np.allclose(idx2.codes, index.codes)
    assert idx2.scale_min == index.scale_min

import numpy as np

from blackbox_tpu.astro.wcs import TanWCS, haversine
from blackbox_tpu.astro.time import (
    iso2mjd, mjd2iso, gmst_deg, airmass, jnow2icrs, icrs2jnow)
from blackbox_tpu.astro.ephem import (
    sun_radec, moon_radec, sun_altitude, sun_crossing, moon_illumination)
from blackbox_tpu.astro.astrometry import solve_tan
from blackbox_tpu.astro.photcal import (
    fit_zeropoint, limiting_magnitude, match_catalogs)


def test_wcs_roundtrip(rng):
    wcs = TanWCS.simple(150.1234, -27.5, 0.5642, (10560, 10560),
                        rot_deg=0.7)
    x = rng.uniform(0, 10560, 100)
    y = rng.uniform(0, 10560, 100)
    ra, dec = wcs.pix2sky(x, y)
    x2, y2 = wcs.sky2pix(ra, dec)
    np.testing.assert_allclose(x2, x, atol=1e-6)
    np.testing.assert_allclose(y2, y, atol=1e-6)
    assert abs(wcs.pixscale - 0.5642) < 1e-4
    assert abs(wcs.rotation - 0.7) < 1e-6


def test_wcs_header_roundtrip():
    from blackbox_tpu.io.fits import Header
    wcs = TanWCS.simple(10.0, -30.0, 0.5642, (100, 100))
    h = wcs.to_header(Header())
    w2 = TanWCS.from_header(h)
    np.testing.assert_allclose(w2.cd, wcs.cd)
    assert w2.crval1 == wcs.crval1


def test_time_roundtrip():
    mjd = iso2mjd("2026-08-16T03:25:00.500")
    assert abs(mjd - 61268.14236690) < 1e-6
    assert mjd2iso(mjd).startswith("2026-08-16T03:25:00.5")
    # GMST at J2000.0 epoch ~ 280.46 deg
    assert abs(gmst_deg(51544.5) - 280.46061837) < 1e-6


def test_airmass_zenith():
    # object at zenith: airmass ~ 1
    lat, lon = -32.38, 20.81
    mjd = 60000.0
    from blackbox_tpu.astro.time import lst_deg
    ra = lst_deg(mjd, lon)
    am = airmass(ra, lat, mjd, lat, lon)
    assert abs(am - 1.0) < 0.01


def test_precession_roundtrip():
    ra, dec = 123.456, -45.678
    mjd = 60500.0
    ra2, dec2 = jnow2icrs(*icrs2jnow(ra, dec, mjd), mjd)
    assert abs(ra2 - ra) < 1e-9
    assert abs(dec2 - dec) < 1e-9
    # precession over ~26 years is ~20 arcmin scale, nonzero
    raj, decj = icrs2jnow(ra, dec, mjd)
    assert haversine(ra, dec, raj, decj) * 60 > 5


def test_sun_moon_sanity():
    # 2026-03-20 ~ equinox: sun dec ~ 0
    mjd = iso2mjd("2026-03-20T12:00:00")
    ra, dec = sun_radec(mjd)
    assert abs(dec) < 1.0
    # moon stays within +-29 deg declination
    mra, mdec = moon_radec(mjd)
    assert -30 < mdec < 30
    assert 0.0 <= moon_illumination(mjd) <= 1.0


def test_sun_crossing():
    lat, lon = -32.38, 20.81   # Sutherland
    mjd0 = iso2mjd("2026-08-16T00:00:00")   # local night
    rise = sun_crossing(mjd0, lat, lon, alt_deg=-10.0, rising=True)
    assert rise > mjd0
    assert sun_altitude(rise, lat, lon) == np.clip(
        sun_altitude(rise, lat, lon), -10.2, -9.8)


def test_seeded_solve(rng):
    true = TanWCS.simple(55.3, -12.2, 0.5642, (2000, 2000), rot_deg=0.4)
    nref = 300
    ra = true.crval1 + rng.uniform(-0.14, 0.14, nref)
    dec = true.crval2 + rng.uniform(-0.14, 0.14, nref)
    mag = rng.uniform(12, 18, nref)
    x, y = true.sky2pix(ra, dec)
    inside = (x > 0) & (x < 2000) & (y > 0) & (y < 2000)
    # detections: true positions + centroid noise, flux ~ brightness
    xd = x[inside] + rng.normal(0, 0.05, inside.sum())
    yd = y[inside] + rng.normal(0, 0.05, inside.sum())
    fd = 10 ** (-0.4 * (mag[inside] - 25.0))

    # guess: offset by 4 arcmin, no rotation
    guess = TanWCS.simple(55.3 + 0.05, -12.2 + 0.04, 0.5642, (2000, 2000))
    res = solve_tan(xd, yd, fd, ra, dec, mag, guess)
    assert res.ok
    assert res.nmatch > 50
    assert res.rms_arcsec < 0.1
    # solved positions agree with truth to < 0.1"
    ra_c, dec_c = res.wcs.pix2sky(1000.0, 1000.0)
    ra_t, dec_t = true.pix2sky(1000.0, 1000.0)
    assert haversine(ra_c, dec_c, ra_t, dec_t) * 3600 < 0.15


def test_zeropoint_and_limmag(rng):
    zp_true = 23.4
    n = 80
    mag = rng.uniform(14, 19, n)
    exptime = 60.0
    flux = exptime * 10 ** (-0.4 * (mag - zp_true))
    flux *= 1 + rng.normal(0, 0.01, n)
    res = fit_zeropoint(flux, None, mag, exptime)
    assert res.ok
    assert abs(res.zp - zp_true) < 0.02
    assert res.zp_std < 0.05
    lm = limiting_magnitude(res.zp, bkg_std_med=15.0, fwhm_pix=3.0,
                            exptime=exptime)
    assert 19 < lm < 24


def test_match_catalogs(rng):
    x = rng.uniform(0, 100, 30)
    y = rng.uniform(0, 100, 30)
    i, j = match_catalogs(x, y, x + 0.3, y - 0.2, radius_pix=1.0)
    assert len(i) == 30
    np.testing.assert_array_equal(i, j)


def test_horizon_dip():
    """adjust_horizon parity (blackbox.py:488-503): refraction + dip."""
    from blackbox_tpu.astro.ephem import horizon_dip_deg
    assert abs(horizon_dip_deg(0.0) + 34.0 / 60.0) < 1e-9
    d2000 = horizon_dip_deg(2000.0)       # La Silla-like elevation
    assert -2.2 < d2000 < -1.8, d2000
    assert horizon_dip_deg(4000.0) < d2000

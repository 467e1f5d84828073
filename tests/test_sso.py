"""match2SSO fidelity: Earth ephemeris anchors, MPCORB ingestion,
topocentric parallax and light-time (reference: the external match2SSO
chain, /root/reference/blackbox.py:3258-3275)."""

import datetime

import numpy as np
import pytest

from blackbox_tpu.astro.vsop87 import (
    earth_heliocentric_j2000, sun_apparent_longitude_date)
from blackbox_tpu.sso.match import (
    Elements, ephemeris, heliocentric_ecliptic, observer_offset_ecliptic,
    OBLIQUITY, C_AU_DAY, TT_MINUS_UT_DAY)
from blackbox_tpu.sso.mpcorb import (
    parse_line, parse_mpcorb, unpack_designation, unpack_epoch)


def _mjd(y, mo, d, h=0, mi=0):
    dt = datetime.datetime(y, mo, d, h, mi, tzinfo=datetime.timezone.utc)
    ep = datetime.datetime(1858, 11, 17, tzinfo=datetime.timezone.utc)
    return (dt - ep).total_seconds() / 86400.0


# Published equinox/solstice instants (UTC, minute precision; the Sun
# moves 2.46"/min, so each anchors the apparent solar longitude — and
# with it the Earth ephemeris — at the few-arcsec level).
ANCHORS = [
    (_mjd(2020, 3, 20, 3, 50), 0.0),       # March equinox 2020
    (_mjd(2020, 6, 20, 21, 44), 90.0),     # June solstice 2020
    (_mjd(2020, 12, 21, 10, 2), 270.0),    # December solstice 2020
    (_mjd(2023, 3, 20, 21, 24), 0.0),      # March equinox 2023
    (_mjd(2024, 3, 20, 3, 6), 0.0),        # March equinox 2024
    (_mjd(2024, 9, 22, 12, 44), 180.0),    # September equinox 2024
]


def test_sun_longitude_equinox_anchors():
    """Earth series vs six published solar ephemeris points: <3" each.

    This bounds the Earth-position contribution to an asteroid
    prediction at <3"/Delta[au] — the term that dominated the old
    low-precision chain (20-40")."""
    for mjd, lam0 in ANCHORS:
        lam = sun_apparent_longitude_date(mjd)
        err = ((lam - lam0 + 180.0) % 360.0 - 180.0) * 3600.0
        assert abs(err) < 3.0, (mjd, lam0, err)


def test_earth_radius_annual_cycle():
    # perihelion (early Jan) ~0.9833 au, aphelion (early Jul) ~1.0167
    rp = np.linalg.norm(earth_heliocentric_j2000(_mjd(2023, 1, 4)))
    ra = np.linalg.norm(earth_heliocentric_j2000(_mjd(2023, 7, 6)))
    assert abs(rp - 0.98330) < 3e-4
    assert abs(ra - 1.01670) < 3e-4


def _mpcorb_line(desig="00001", H=" 3.34", G=" 0.12", epoch="K239D",
                 M="  60.17273", argper="  73.47046", node="  80.26014",
                 incl=" 10.58688", e="0.0789126", n="0.21411523",
                 a="  2.7672544"):
    """Assemble a line in the documented MPCORB fixed-column layout."""
    line = [" "] * 202
    for s, (c0, c1) in [(desig, (0, 7)), (H, (8, 13)), (G, (14, 19)),
                        (epoch, (20, 25)), (M, (26, 35)),
                        (argper, (37, 46)), (node, (47, 56)),
                        (incl, (58, 67)), (e, (70, 79)),
                        (n, (80, 91)), (a, (92, 103))]:
        s = s.rjust(c1 - c0)
        line[c0:c1] = list(s)
    return "".join(line)


def test_mpcorb_parse_line():
    el = parse_line(_mpcorb_line())
    assert el is not None
    assert el.designation == "1"
    assert el.H == pytest.approx(3.34)
    assert el.G == pytest.approx(0.12)
    assert el.a == pytest.approx(2.7672544)
    assert el.e == pytest.approx(0.0789126)
    assert el.incl == pytest.approx(10.58688)
    assert el.node == pytest.approx(80.26014)
    assert el.argper == pytest.approx(73.47046)
    assert el.M0 == pytest.approx(60.17273)
    # packed epoch K239D = 2023-09-13 00:00 TT
    assert el.epoch_mjd == pytest.approx(_mjd(2023, 9, 13))


def test_unpack_epoch_and_designation():
    assert unpack_epoch("K239D") == pytest.approx(_mjd(2023, 9, 13))
    assert unpack_epoch("J9611") == pytest.approx(_mjd(1996, 1, 1))
    assert unpack_epoch("K23AV") == pytest.approx(_mjd(2023, 10, 31))
    assert unpack_designation("00001") == "1"
    assert unpack_designation("99999") == "99999"
    assert unpack_designation("A0001") == "100001"   # base-62 extension
    assert unpack_designation("K23A00B") == "2023 AB"
    assert unpack_designation("J98SA8Q") == "1998 SQ108"  # MPC example


def test_parse_mpcorb_skips_header_and_filters():
    lines = [
        "MINOR PLANET CENTER ORBIT DATABASE (MPCORB)",
        "some free-text header",
        "-" * 160,
        _mpcorb_line(),
        _mpcorb_line(desig="00002", H=" 4.13", a="  2.7716927"),
        "",
        _mpcorb_line(desig="K23A00B", H="22.10"),
    ]
    els = parse_mpcorb(lines)
    assert [e.designation for e in els] == ["1", "2", "2023 AB"]
    els = parse_mpcorb(lines, h_max=10.0)
    assert [e.designation for e in els] == ["1", "2"]
    els = parse_mpcorb(lines, max_objects=1)
    assert len(els) == 1


def test_ephemeris_matches_analytic_two_body():
    """Full chain vs an independent analytic computation (circular
    in-ecliptic orbit): Kepler + frames + light-time wiring exact."""
    el = Elements("X", a=3.0, e=0.0, incl=0.0, node=0.0, argper=0.0,
                  M0=40.0, epoch_mjd=60000.0, H=10.0)
    mjd = 60123.456
    mjd_tt = mjd + TT_MINUS_UT_DAY
    n = 0.01720209895 / 3.0 ** 1.5                   # rad/day

    def helio(t):
        lam = np.deg2rad(40.0) + n * (t - 60000.0)
        return 3.0 * np.array([np.cos(lam), np.sin(lam), 0.0])

    earth = earth_heliocentric_j2000(mjd_tt)
    tau = 0.0
    for _ in range(5):
        g = helio(mjd_tt - tau) - earth
        tau = np.linalg.norm(g) / C_AU_DAY
    ce, se = np.cos(OBLIQUITY), np.sin(OBLIQUITY)
    gq = np.array([g[0], ce * g[1] - se * g[2], se * g[1] + ce * g[2]])
    ra0 = np.degrees(np.arctan2(gq[1], gq[0])) % 360.0
    dec0 = np.degrees(np.arcsin(gq[2] / np.linalg.norm(gq)))

    ra, dec, r, delta, mag = ephemeris(el, mjd)
    assert abs(r - 3.0) < 1e-9
    sep = np.hypot((ra - ra0) * np.cos(np.deg2rad(dec0)), dec - dec0)
    assert sep * 3600.0 < 0.3, sep * 3600.0


def test_light_time_shifts_against_motion():
    """Astrometric position trails the geometric one by ~rate*tau."""
    el = Elements("X", a=2.2, e=0.05, incl=3.0, node=50.0, argper=120.0,
                  M0=10.0, epoch_mjd=60200.0, H=15.0)
    mjd = 60260.0
    mjd_tt = mjd + TT_MINUS_UT_DAY
    ra1, dec1, _, delta, _ = ephemeris(el, mjd)
    tau = delta / C_AU_DAY
    # expected shift = TARGET transverse displacement over tau / Delta
    # (the observer is common to both positions, so Earth's reflex
    # motion does not enter)
    dt = 0.2
    p1, _ = heliocentric_ecliptic(el, mjd_tt)
    p2, _ = heliocentric_ecliptic(el, mjd_tt + dt)
    v = (p2 - p1) / dt
    g = p1 - earth_heliocentric_j2000(mjd_tt)
    ghat = g / np.linalg.norm(g)
    v_perp = v - np.dot(v, ghat) * ghat
    expected_shift = np.degrees(np.linalg.norm(v_perp) * tau
                                / delta) * 3600.0
    # geometric position = propagate elements tau forward, zero out the
    # light time by asking for the object where it WILL be
    el_fwd = Elements("X", a=el.a, e=el.e, incl=el.incl, node=el.node,
                      argper=el.argper, M0=el.M0, epoch_mjd=el.epoch_mjd
                      - tau, H=el.H)
    ra_g, dec_g, *_ = ephemeris(el_fwd, mjd)
    shift = np.hypot((ra_g - ra1) * np.cos(np.deg2rad(dec1)),
                     dec_g - dec1) * 3600.0
    assert expected_shift > 3.0                      # meaningful effect
    assert abs(shift - expected_shift) < 0.1 * expected_shift


def test_topocentric_parallax_magnitude():
    el = Elements("X", a=1.8, e=0.1, incl=2.0, node=10.0, argper=40.0,
                  M0=200.0, epoch_mjd=60200.0, H=16.0)
    mjd = 60233.3
    site = (-32.38, 20.81, 1802.0)                   # Sutherland (ML1)
    ra_g, dec_g, _, delta, _ = ephemeris(el, mjd)
    ra_t, dec_t, *_ = ephemeris(el, mjd, site=site)
    sep = np.hypot((ra_t - ra_g) * np.cos(np.deg2rad(dec_g)),
                   dec_t - dec_g) * 3600.0
    # horizontal parallax is 8.794"/Delta at the horizon; the observer
    # offset projects by an orientation factor in (0, 1]
    assert 0.3 < sep <= 8.8 / delta + 0.1, (sep, delta)


def test_observer_offset_geometry():
    site_eq = (0.0, 0.0, 0.0)
    v = observer_offset_ecliptic(60000.0, site_eq)
    r_km = np.linalg.norm(v) * 149597870.7
    assert abs(r_km - 6378.137) < 1.0               # equatorial radius
    site_pole = (90.0, 0.0, 0.0)
    vp = observer_offset_ecliptic(60000.0, site_pole)
    r_km = np.linalg.norm(vp) * 149597870.7
    assert abs(r_km - 6356.75) < 1.5                # polar radius
    # pole vector along equatorial +z -> ecliptic (0, sin eps, cos eps)
    ce, se = np.cos(OBLIQUITY), np.sin(OBLIQUITY)
    np.testing.assert_allclose(vp / np.linalg.norm(vp),
                               [0.0, se, ce], atol=1e-3)

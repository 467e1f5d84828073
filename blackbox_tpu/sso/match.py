"""Known-asteroid cross-match on the transient catalog.

The reference shells out to the external match2SSO package
(/root/reference/blackbox.py:31-32, 3258-3275: run_match2SSO on the
light transient catalog, night mode, producing an _sso catalog).  This
module owns the same capability: propagate known-object orbital
elements to the frame epoch (two-body Kepler + low-precision Earth
position) and cone-match the transient positions.

Accuracy note: two-body propagation from recent elements is good to
well under the match radius (~10″ over months); the reference's chain
(propagated MPCORB) has the same character.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from blackbox_tpu.astro.ephem import sun_radec, sun_distance_au
from blackbox_tpu.astro.wcs import haversine

D2R = np.pi / 180.0
OBLIQUITY = 23.43928 * D2R          # J2000 mean obliquity
K_GAUSS = 0.01720209895             # Gaussian gravitational constant


@dataclasses.dataclass
class Elements:
    """Heliocentric ecliptic Keplerian elements at epoch (MJD, TT~UTC)."""

    designation: str
    a: float          # semi-major axis [au]
    e: float
    incl: float       # [deg]
    node: float       # longitude of ascending node [deg]
    argper: float     # argument of perihelion [deg]
    M0: float         # mean anomaly at epoch [deg]
    epoch_mjd: float
    H: float = 20.0   # absolute magnitude


def kepler_solve(M, e, iters: int = 12):
    """Eccentric anomaly from mean anomaly (Newton, vectorised)."""
    M = np.mod(M + np.pi, 2 * np.pi) - np.pi
    E = np.where(e < 0.8, M, np.pi * np.sign(M) + (M == 0))
    for _ in range(iters):
        E = E - (E - e * np.sin(E) - M) / (1.0 - e * np.cos(E))
    return E


def heliocentric_ecliptic(el: Elements, mjd: float):
    """Position [au] in heliocentric ecliptic J2000 coordinates."""
    n = K_GAUSS / el.a ** 1.5                       # mean motion [rad/day]
    M = el.M0 * D2R + n * (mjd - el.epoch_mjd)
    E = kepler_solve(np.atleast_1d(M), el.e)[0]
    xv = el.a * (np.cos(E) - el.e)
    yv = el.a * np.sqrt(1 - el.e ** 2) * np.sin(E)
    r = np.hypot(xv, yv)
    v = np.arctan2(yv, xv)                          # true anomaly

    w = el.argper * D2R
    O = el.node * D2R
    i = el.incl * D2R
    u = v + w
    x = r * (np.cos(O) * np.cos(u) - np.sin(O) * np.sin(u) * np.cos(i))
    y = r * (np.sin(O) * np.cos(u) + np.cos(O) * np.sin(u) * np.cos(i))
    z = r * np.sin(u) * np.sin(i)
    return np.array([x, y, z]), r


def _earth_heliocentric(mjd: float):
    """Low-precision Earth position [au], heliocentric ecliptic J2000:
    minus the geocentric Sun vector."""
    ra_s, dec_s = sun_radec(mjd)
    dist_au = float(sun_distance_au(mjd))
    ra_s *= D2R
    dec_s *= D2R
    # geocentric equatorial sun -> ecliptic
    xs = np.cos(dec_s) * np.cos(ra_s)
    ys = np.cos(dec_s) * np.sin(ra_s)
    zs = np.sin(dec_s)
    ce, se = np.cos(OBLIQUITY), np.sin(OBLIQUITY)
    xe = xs
    ye = ce * ys + se * zs
    ze = -se * ys + ce * zs
    return -dist_au * np.array([xe, ye, ze])


def ephemeris(el: Elements, mjd: float):
    """Geocentric RA/DEC [deg] + heliocentric/geocentric distances [au]
    and a rough V magnitude."""
    p_ast, r = heliocentric_ecliptic(el, mjd)
    p_earth = _earth_heliocentric(mjd)
    g = p_ast - p_earth                              # geocentric ecliptic
    delta = float(np.linalg.norm(g))
    # ecliptic -> equatorial
    ce, se = np.cos(OBLIQUITY), np.sin(OBLIQUITY)
    xq = g[0]
    yq = ce * g[1] - se * g[2]
    zq = se * g[1] + ce * g[2]
    ra = float(np.degrees(np.arctan2(yq, xq)) % 360.0)
    dec = float(np.degrees(np.arcsin(zq / max(delta, 1e-12))))
    mag = el.H + 5.0 * np.log10(max(r * delta, 1e-12))
    return ra, dec, float(r), delta, float(mag)


def match_sso(trans_ra, trans_dec, mjd: float, elements: list,
              radius_arcsec: float = 10.0):
    """Cross-match transient positions against known-object ephemerides.

    Returns (idx_trans, designations, sep_arcsec, pred_mag) arrays.
    """
    if len(elements) == 0 or len(trans_ra) == 0:
        return (np.zeros(0, int), np.zeros(0, "U24"),
                np.zeros(0), np.zeros(0))
    eph = [ephemeris(el, mjd) for el in elements]
    era = np.array([e[0] for e in eph])
    edec = np.array([e[1] for e in eph])
    emag = np.array([e[4] for e in eph])

    tra = np.asarray(trans_ra, np.float64)
    tdec = np.asarray(trans_dec, np.float64)
    sep = haversine(tra[:, None], tdec[:, None],
                    era[None, :], edec[None, :]) * 3600.0
    j = np.argmin(sep, axis=1)
    s = sep[np.arange(len(tra)), j]
    hit = s < radius_arcsec
    return (np.flatnonzero(hit),
            np.array([elements[k].designation for k in j[hit]], "U24"),
            s[hit], emag[j[hit]])


def annotate_transients(tcols: dict, mjd: float, elements: list,
                        radius_arcsec: float = 10.0) -> dict:
    """Add SSO columns to a transient-catalog column dict
    (the reference ships a separate _sso catalog; here the designation
    and separation annotate the transient rows directly)."""
    n = len(tcols.get("RA_PSF_D", []))
    desig = np.full(n, "", "U24")
    sep = np.full(n, np.nan, np.float64)
    pmag = np.full(n, np.nan, np.float64)
    idx, names, seps, mags = match_sso(
        tcols.get("RA_PSF_D", []), tcols.get("DEC_PSF_D", []),
        mjd, elements, radius_arcsec)
    desig[idx] = names
    sep[idx] = seps
    pmag[idx] = mags
    out = dict(tcols)
    out["SSO_DESIG"] = desig
    out["SSO_SEP"] = sep.astype(np.float32)
    out["SSO_MAG"] = pmag.astype(np.float32)
    return out

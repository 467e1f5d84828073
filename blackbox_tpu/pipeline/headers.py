"""Header engine: raw-keyword normalisation + product keyword contract.

Rebuild of the reference's header layer (set_header blackbox.py:5663-6291,
check_header1/2 5445-5658, verify_header 2893-3256): raw telescope
keywords are normalised (mid-exposure DATE-OBS, MJD, LST, airmass,
alt/az, sun/moon ephemerides), every calibration step stamps its
quantitative keys from the device stats dict, and a declarative dtype
contract validates product headers before shipping.
"""

from __future__ import annotations

import numpy as np

from blackbox_tpu.io.fits import Header
from blackbox_tpu.astro import time as at
from blackbox_tpu.astro import ephem as eph
from blackbox_tpu.astro.wcs import haversine


def check_header_basic(h, n_fields_max: int = 19999) -> list:
    """Pre-reduction sanity checks (reference check_header1, 5445-5528).

    Returns a list of failure strings (empty = pass).
    """
    problems = []
    for key in ("DATE-OBS", "EXPTIME", "FILTER", "IMAGETYP"):
        if key not in h:
            problems.append(f"missing required keyword {key}")
    imgtype = str(h.get("IMAGETYP", "")).lower()
    if imgtype == "object":
        obj = h.get("OBJECT")
        try:
            fid = int(obj)
            if not (1 <= fid <= n_fields_max):
                problems.append(f"field ID {fid} outside 1..{n_fields_max}")
        except (TypeError, ValueError):
            problems.append(f"OBJECT {obj!r} is not a field ID")
    if "EXPTIME" in h:
        try:
            # bias/dark frames carry EXPTIME 0 legitimately
            if float(h["EXPTIME"]) <= 0 and imgtype == "object":
                problems.append("non-positive EXPTIME")
        except (TypeError, ValueError):
            problems.append("EXPTIME not numeric")
    return problems


def set_header(h: Header, site, field_grid=None) -> Header:
    """Normalise the raw header: times, coordinates, observability.

    site : (lat_deg, lon_deg_east, height_m)
    field_grid : optional dict field_id -> (ra, dec) for pointing checks
    """
    lat, lon, height = site

    # mid-exposure time: GPS shutter times when present (reference
    # blackbox.py:5772-5814), else DATE-OBS + EXPTIME/2
    exptime = float(h.get("EXPTIME", 0.0))
    if "GPSSTART" in h and "GPSEND" in h:
        m0 = at.iso2mjd(str(h["GPSSTART"]))
        m1 = at.iso2mjd(str(h["GPSEND"]))
        mjd_mid = 0.5 * (m0 + m1)
        h["GPS-SHUT"] = (round((m1 - m0) * 86400.0 - exptime, 4),
                         "[s] GPS shutter overhead")
    else:
        mjd_mid = at.iso2mjd(str(h["DATE-OBS"])) + exptime / 172800.0
    h["DATE-OBS"] = (at.mjd2iso(mjd_mid - exptime / 172800.0),
                     "UTC start of exposure")
    h["MJD-OBS"] = (round(mjd_mid, 8), "[d] MJD mid-exposure")
    h["LST"] = (round(at.lst_deg(mjd_mid, lon) / 15.0, 6),
                "[h] local sidereal time mid-exposure")

    # pointing: JNOW mount coordinates -> ICRS
    if "RA" in h and "DEC" in h:
        ra_tel = _parse_angle(h["RA"], hours=True)
        dec_tel = _parse_angle(h["DEC"], hours=False)
        ra_icrs, dec_icrs = at.jnow2icrs(ra_tel, dec_tel, mjd_mid)
        h["RA"] = (round(float(ra_icrs), 6), "[deg] telescope RA (ICRS)")
        h["DEC"] = (round(float(dec_icrs), 6), "[deg] telescope DEC (ICRS)")
        h["AIRMASS"] = (round(float(at.airmass(ra_icrs, dec_icrs, mjd_mid,
                                               lat, lon)), 4),
                        "airmass mid-exposure")
        h["ALTITUDE"] = (round(float(at.altitude_deg(
            ra_icrs, dec_icrs, mjd_mid, lat, lon)), 3), "[deg] altitude")
        h["AZIMUTH"] = (round(float(at.azimuth_deg(
            ra_icrs, dec_icrs, mjd_mid, lat, lon)), 3), "[deg] azimuth")

        if field_grid is not None and "OBJECT" in h:
            try:
                fra, fdec = field_grid[int(h["OBJECT"])]
                off = haversine(ra_icrs, dec_icrs, fra, fdec) * 60.0
                h["RADECOFF"] = (round(float(off), 3),
                                 "[arcmin] pointing offset vs field grid")
            except (KeyError, TypeError, ValueError):
                pass

    # tracking state: the TCS writes a string 'True'/'False'; normalise
    # to bool (reference blackbox.py:5745-5750) — buildref's selection
    # keeps only tracked frames
    if "ISTRACKI" in h:
        v = h["ISTRACKI"]
        h["ISTRACKI"] = (v if isinstance(v, bool)
                         else str(v).strip().lower() in
                         ("true", "t", "1", "yes"),
                         "Telescope is tracking")

    # ephemerides
    h["SUNALT"] = (round(float(eph.sun_altitude(mjd_mid, lat, lon)), 2),
                   "[deg] sun altitude")
    h["MOONALT"] = (round(float(eph.moon_altitude(mjd_mid, lat, lon)), 2),
                    "[deg] moon altitude")
    h["MOONILLU"] = (round(float(eph.moon_illumination(mjd_mid)), 3),
                     "moon illuminated fraction")
    if "RA" in h and "DEC" in h:
        mra, mdec = eph.moon_radec(mjd_mid)
        h["MOONDIST"] = (round(float(haversine(h["RA"], h["DEC"],
                                               mra, mdec)), 2),
                         "[deg] moon separation")
    return h


def _parse_angle(v, hours: bool) -> float:
    """'HH:MM:SS.s' / 'DD:MM:SS' / decimal degrees -> degrees."""
    if isinstance(v, (int, float)):
        return float(v)
    s = str(v).strip()
    parts = s.replace("h", ":").replace("m", ":").replace("s", "").split(":")
    if len(parts) == 1:
        return float(s)
    sign = -1.0 if parts[0].strip().startswith("-") else 1.0
    vals = [abs(float(p)) for p in parts]
    deg = vals[0] + vals[1] / 60.0 + (vals[2] if len(vals) > 2 else 0) / 3600.0
    deg *= sign
    return deg * 15.0 if hours else deg


def stamp_calibration(h: Header, stats: dict, gains, pixscale: float,
                      exptime: float) -> Header:
    """Write the per-channel + frame-level calibration keywords."""
    g = np.asarray(gains)
    C = len(g)
    for c in range(C):
        h[f"GAIN{c + 1}"] = (round(float(g[c]), 3),
                             f"[e-/ADU] channel {c + 1} gain")
    h["GAIN"] = (round(float(np.mean(g)), 3), "[e-/ADU] average gain")

    biasm = np.asarray(stats["biasm"])
    rdn = np.asarray(stats["rdn"])
    for c in range(C):
        h[f"BIASM{c + 1}"] = (round(float(biasm[c]), 2),
                              f"[e-] channel {c + 1} mean vertical overscan")
    for c in range(C):
        h[f"RDN{c + 1}"] = (round(float(rdn[c]), 3),
                            f"[e-] channel {c + 1} sigma vertical overscan")
    h["BIASMEAN"] = (round(float(stats["biasmean"]), 2),
                     "[e-] average channel bias level")
    h["RDNOISE"] = (round(float(stats["rdnoise"]), 3),
                    "[e-] average channel read noise")
    vfit_ok = np.asarray(stats.get("vfit_ok", np.ones(C, bool)))
    for c in range(C):
        h[f"VFITOK{c + 1}"] = (bool(vfit_ok[c]),
                               f"channel {c + 1} vert. overscan fit ok?")

    if "satlev" in stats:
        satlev = np.asarray(stats["satlev"])
        for c in range(C):
            h[f"SATLEV{c + 1}"] = (round(float(satlev[c]), 1),
                                   f"[e-] channel {c + 1} saturation")
        h["SATURATE"] = (round(float(stats["saturate"]), 1),
                         "[e-] mean saturation threshold")
    if "nobj_sat" in stats:
        h["NOBJ-SAT"] = (int(stats["nobj_sat"]),
                         "number of saturated objects")
    if "ncosmics" in stats:
        rate = float(stats["ncosmics"]) / max(exptime, 1e-9)
        h["NCOSMICS"] = (round(rate, 3),
                         "[/s] number of cosmic rays identified")
    if "nsats" in stats:
        h["NSATS"] = (int(stats["nsats"]), "number of satellite trails")

    # mask bit counts (reference mask_header blackbox.py:4601-4620)
    from blackbox_tpu.core import maskbits
    text = {"bad": "BP", "edge": "EP", "saturated": "SP",
            "saturated-connected": "SCP", "satellite": "STP",
            "cosmic": "CRP", "crosstalk": "XTP"}
    for name, tag in text.items():
        key = f"n_{name}"
        if key in stats:
            h[f"M-{tag}"] = (True, f"{name} pixels included in mask?")
            h[f"M-{tag}VAL"] = (maskbits.BITS[name],
                                f"mask value of {name} pixels")
            h[f"M-{tag}NUM"] = (int(stats[key]),
                                f"number of {name} pixels")
    return h


def stamp_flatstats(h: Header, fs: dict) -> Header:
    """Write the flat-field statistics keyword set.

    Keyword contract of the reference's ``get_flatstats``
    (/root/reference/blackbox.py:3661-3820): NORMSEC medians, full-image
    stats, per-channel FLATM/S/RS, and the subimage-grid vignetting
    metrics RDIF-MAX / RSTD-MAX.
    """
    def num(v, nd=4):
        x = float(np.asarray(v))
        return round(x, nd) if np.isfinite(x) else "None"

    h["MEDSEC"] = (num(fs["medsec"], 2), "[e-] median flat over STATSEC")
    h["STDSEC"] = (num(fs["stdsec"], 2), "[e-] sigma (STD) flat over STATSEC")
    h["RSTDSEC"] = (num(fs["rstdsec"], 5), "relative sigma (STD) flat "
                    "over STATSEC")
    h["FLATMED"] = (num(fs["flatmed"], 2), "[e-] median flat")
    h["FLATSTD"] = (num(fs["flatstd"], 2), "[e-] sigma (STD) flat")
    h["FLATRSTD"] = (num(fs["flatrstd"], 5), "relative sigma (STD) flat")
    flatm = np.asarray(fs["flatm"])
    flats = np.asarray(fs["flats"])
    flatrs = np.asarray(fs["flatrs"])
    for c in range(len(flatm)):
        h[f"FLATM{c + 1}"] = (num(flatm[c], 2),
                              f"[e-] channel {c + 1} median flat")
    for c in range(len(flats)):
        h[f"FLATS{c + 1}"] = (num(flats[c], 2),
                              f"[e-] channel {c + 1} sigma (STD) flat")
    for c in range(len(flatrs)):
        h[f"FLATRS{c + 1}"] = (num(flatrs[c], 5),
                               f"channel {c + 1} relative sigma (STD) flat")
    h["NSUBSTOT"] = (int(fs["nsubstot"]),
                     "total number of subimages in grid")
    h["NSUBS"] = (int(fs["nsubs"]),
                  "number of interior subimages used")
    h["RDIF-MAX"] = (num(fs["rdif_max"], 5),
                     "max. relative median difference between subimages")
    h["RSTD-MAX"] = (num(fs["rstd_max"], 5),
                     "max. relative sigma (STD) of subimages")
    return h


def stamp_master(h: Header, imgtype: str, stats: dict) -> Header:
    """Write the master-frame keyword set.

    Contract of the reference's ``master_prep`` header section
    (/root/reference/blackbox.py:5076-5231): NBIAS/NDARK/NFLAT frame
    counts, master mean/STD overall and per channel (MBIASM/MBRDN,
    MDARKM/MDRDN), and the flat channel gain-correction factors
    GAINCF1..16.
    """
    def num(v, nd=4):
        x = float(np.asarray(v))
        return round(x, nd) if np.isfinite(x) else "None"

    if imgtype == "bias":
        h["NBIAS"] = (int(stats["nmbias"]),
                      "number of bias frames combined")
        mean = np.asarray(stats["mbias_chan_mean"])
        std = np.asarray(stats["mbias_chan_std"])
        h["MBMEAN"] = (num(stats["mbias_mean"], 3),
                       "[e-] mean master bias")
        h["MBRDN"] = (num(stats["mbias_std"], 3),
                      "[e-] sigma (STD) master bias")
        for c in range(len(mean)):
            h[f"MBIASM{c + 1}"] = (num(mean[c], 3),
                                   f"[e-] channel {c + 1} mean master bias")
        for c in range(len(std)):
            h[f"MBRDN{c + 1}"] = (num(std[c], 3),
                                  f"[e-] channel {c + 1} sigma (STD) "
                                  "master bias")
    elif imgtype == "dark":
        h["NDARK"] = (int(stats["nmdark"]),
                      "number of dark frames combined")
        mean = np.asarray(stats["mdark_chan_mean"])
        std = np.asarray(stats["mdark_chan_std"])
        h["MDMEAN"] = (num(float(np.mean(mean)), 4),
                       "[e-/s] mean master dark")
        h["MDRDN"] = (num(float(np.mean(std)), 4),
                      "[e-/s] sigma (STD) master dark")
        for c in range(len(mean)):
            h[f"MDARKM{c + 1}"] = (num(mean[c], 4),
                                   f"[e-/s] channel {c + 1} mean master dark")
        for c in range(len(std)):
            h[f"MDRDN{c + 1}"] = (num(std[c], 4),
                                  f"[e-/s] channel {c + 1} sigma (STD) "
                                  "master dark")
    elif imgtype == "flat":
        h["NFLAT"] = (int(stats["nmflat"]),
                      "number of flat frames combined")
        gaincf = np.asarray(stats["gaincf"])
        for c in range(len(gaincf)):
            h[f"GAINCF{c + 1}"] = (num(gaincf[c], 5),
                                   f"channel {c + 1} gain correction factor")
    return h


def stamp_extraction(h: Header, stats: dict, pixscale: float) -> Header:
    h["NOBJECTS"] = (int(stats["nobjects"]), "number of detected sources")
    h["S-SEEING"] = (round(float(stats["s_seeing_pix"]) * pixscale, 3),
                     "[arcsec] seeing (median FWHM)")
    h["S-SEEPIX"] = (round(float(stats["s_seeing_pix"]), 3),
                     "[pix] seeing (median FWHM)")
    h["S-BKG"] = (round(float(stats["bkg_median"]), 2),
                  "[e-] median background")
    h["S-BKGSTD"] = (round(float(stats["bkg_std"]), 2),
                     "[e-] background STD")
    return h


# ---- product header contract (verify_header equivalent) -----------------

# keyword -> (python types accepted, none_allowed)
HEADER_CONTRACT = {
    "full": {
        "MJD-OBS": ((float,), False),
        "EXPTIME": ((float, int), False),
        "FILTER": ((str,), False),
        "RDNOISE": ((float,), False),
        "BIASMEAN": ((float,), False),
        "SATURATE": ((float, int), False),
        "NCOSMICS": ((float, int), False),
        "NSATS": ((int,), False),
        "NOBJECTS": ((int,), False),
        "S-SEEING": ((float,), True),
        "S-BKG": ((float,), True),
        "S-BKGSTD": ((float,), True),
        "QC-FLAG": ((str,), False),
    },
    "trans": {
        "T-NTRANS": ((int,), False),
        "TQC-FLAG": ((str,), False),
    },
}


def verify_header(h, htype: str = "full") -> list:
    """Validate a product header against the dtype contract.

    Returns a list of problem strings (reference verify_header,
    blackbox.py:2893-3256).
    """
    problems = []
    for key, (types, none_ok) in HEADER_CONTRACT.get(htype, {}).items():
        if key not in h:
            problems.append(f"{htype}: missing {key}")
            continue
        v = h[key]
        if v is None or (isinstance(v, str) and v == "None"):
            if not none_ok:
                problems.append(f"{htype}: {key} is None")
            continue
        if bool not in types and isinstance(v, bool):
            problems.append(f"{htype}: {key} bool not allowed")
        elif not isinstance(v, types) and not (
                float in types and isinstance(v, int)):
            problems.append(f"{htype}: {key} has type {type(v).__name__}")
    return problems

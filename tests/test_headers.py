import numpy as np

from blackbox_tpu.io.fits import Header
from blackbox_tpu.pipeline.headers import (
    set_header, check_header_basic, stamp_calibration, stamp_extraction,
    verify_header, _parse_angle)

SITE = (-32.38, 20.81, 1802.0)


def _raw_header():
    h = Header()
    h["DATE-OBS"] = "2026-08-16T01:30:00.000"
    h["EXPTIME"] = 60.0
    h["FILTER"] = "q"
    h["IMAGETYP"] = "object"
    h["OBJECT"] = "4025"
    h["RA"] = "05:40:30.0"      # JNOW hours
    h["DEC"] = "-12:30:00"
    return h


def test_check_header_basic():
    assert check_header_basic(_raw_header()) == []
    h = _raw_header()
    del h["EXPTIME"]
    assert any("EXPTIME" in p for p in check_header_basic(h))
    h = _raw_header()
    h["OBJECT"] = "99999"
    assert any("field ID" in p for p in check_header_basic(h))


def test_parse_angle():
    assert abs(_parse_angle("06:00:00", hours=True) - 90.0) < 1e-9
    assert abs(_parse_angle("-12:30:00", hours=False) + 12.5) < 1e-9
    assert _parse_angle(123.4, hours=False) == 123.4


def test_set_header():
    h = set_header(_raw_header(), SITE,
                   field_grid={4025: (85.10, -12.45)})
    assert "MJD-OBS" in h
    assert 0 <= h["LST"] < 24
    assert isinstance(h["RA"], float)
    assert h["AIRMASS"] >= 1.0
    assert -90 <= h["SUNALT"] <= 90
    assert 0 <= h["MOONILLU"] <= 1
    assert h["MOONDIST"] > 0
    # mid-exposure MJD is start + 30 s
    from blackbox_tpu.astro.time import iso2mjd
    assert abs(h["MJD-OBS"] - (iso2mjd("2026-08-16T01:30:00") +
                               30.0 / 86400)) < 1e-6
    assert "RADECOFF" in h


def test_stamp_and_verify():
    h = set_header(_raw_header(), SITE)
    C = 16
    stats = {
        "biasm": np.full(C, 15000.0), "rdn": np.full(C, 9.0),
        "biasmean": 15000.0, "rdnoise": 9.0,
        "vfit_ok": np.ones(C, bool),
        "satlev": np.full(C, 110000.0), "saturate": 110000.0,
        "nobj_sat": 12, "ncosmics": 300, "nsats": 1,
        "n_bad": 100, "n_cosmic": 900, "n_saturated": 50,
        "n_saturated-connected": 80, "n_satellite": 2000, "n_edge": 0,
        "n_crosstalk": 40,
    }
    h = stamp_calibration(h, stats, np.full(C, 2.1), 0.5642, 60.0)
    h = stamp_extraction(h, {"nobjects": 5000, "s_seeing_pix": 4.0,
                             "bkg_median": 800.0, "bkg_std": 30.0},
                         0.5642)
    h["QC-FLAG"] = "green"
    assert h["GAIN7"] == 2.1
    assert h["RDN16"] == 9.0
    assert h["NCOSMICS"] == 5.0     # 300 / 60 s
    assert h["M-CRPNUM"] == 900
    assert abs(h["S-SEEING"] - 4 * 0.5642) < 1e-3   # rounded to 3 decimals
    assert verify_header(h, "full") == []

    del h["RDNOISE"]
    assert any("RDNOISE" in p for p in verify_header(h, "full"))

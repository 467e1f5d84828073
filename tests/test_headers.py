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
    # step flags + bookkeeping required of every shipped product
    for key in ("OS-P", "GAIN-P", "MASK-P", "COSMIC-P", "XTALK-P",
                "NONLIN-P", "MBIAS-P", "MFLAT-P", "SAT-P", "S-P",
                "A-P", "PSF-P", "PC-P"):
        h[key] = True
    h["DUMCAT"] = False
    h["N-INFNAN"] = 0
    assert h["GAIN7"] == 2.1
    assert h["RDN16"] == 9.0
    assert h["NCOSMICS"] == 5.0     # 300 / 60 s
    assert h["M-CRPNUM"] == 900
    assert abs(h["S-SEEING"] - 4 * 0.5642) < 1e-3   # rounded to 3 decimals
    assert verify_header(h, "full") == []

    del h["RDNOISE"]
    assert any("RDNOISE" in p for p in verify_header(h, "full"))
    h["RDNOISE"] = 9.0
    # required flag missing or None -> hard error
    del h["COSMIC-P"]
    assert any("COSMIC-P" in p for p in verify_header(h, "full"))
    h["COSMIC-P"] = True
    h["QC-FLAG"] = "None"
    assert any("QC-FLAG" in p for p in verify_header(h, "full"))


def test_stamp_flatstats_and_master():
    from blackbox_tpu.pipeline.headers import stamp_flatstats, stamp_master
    from blackbox_tpu.qc.engine import run_qc_check

    C = 16
    h = Header()
    h["FILTER"] = "q"
    fs = {"medsec": 30000.0, "stdsec": 200.0, "rstdsec": 200 / 30000,
          "flatmed": 29500.0, "flatstd": 250.0, "flatrstd": 250 / 29500,
          "flatm": np.full(C, 29500.0), "flats": np.full(C, 250.0),
          "flatrs": np.full(C, 250 / 29500.0),
          "nsubstot": 64, "nsubs": 36, "rdif_max": 0.02,
          "rstd_max": 0.015}
    stamp_flatstats(h, fs)
    assert h["MEDSEC"] == 30000.0
    assert h["FLATM3"] == 29500.0
    assert h["FLATRS16"] == round(250 / 29500, 5)
    assert h["NSUBS"] == 36
    assert run_qc_check(h, "ML1", check_key_type="flat") == "green"
    # vignetting out of range -> graded down, culprit recorded
    h["RDIF-MAX"] = 0.10
    assert run_qc_check(h, "ML1", check_key_type="flat") == "yellow"

    hb = Header()
    stamp_master(hb, "bias", {
        "nmbias": 12, "mbias_chan_mean": np.full(C, 0.3),
        "mbias_chan_std": np.full(C, 5.5),
        "mbias_mean": 0.3, "mbias_std": 5.5})
    assert hb["NBIAS"] == 12 and hb["MBRDN"] == 5.5
    assert hb["MBIASM9"] == 0.3 and hb["MBRDN16"] == 5.5
    assert run_qc_check(hb, "ML1", check_key_type="mbias") == "green"
    hb["MBRDN4"] = 35.0
    assert run_qc_check(hb, "ML1", check_key_type="mbias") == "orange"

    hf = Header()
    stamp_master(hf, "flat", {"nmflat": 7, "gaincf": np.full(C, 1.02)})
    assert hf["NFLAT"] == 7 and hf["GAINCF11"] == 1.02
    assert run_qc_check(hf, "ML1", check_key_type="mflat") == "green"
    hf["GAINCF2"] = 1.4
    assert run_qc_check(hf, "ML1", check_key_type="mflat") == "orange"
    assert hf["QCORA1"] == "GAINCF2"

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


def test_legacy_ml1_patches():
    """Archival ML1 repairs match the reference's inline formulas
    (blackbox.py:6128-6162 filter mapping, 5890-5907 RA/DEC bug)."""
    from blackbox_tpu.astro.time import iso2mjd
    from blackbox_tpu.pipeline.headers import (
        patch_legacy_header, legacy_radec_override, LEGACY_FILTER_MAP_ML1)

    # 2017 'VR' alias for 'q'
    h = Header(); h["FILTER"] = "VR"
    patch_legacy_header(h, "ML1", iso2mjd("2017-06-01T00:00:00"))
    assert h["FILTER"] == "q"

    # all-Abot window: every frame remapped, reference's exact table
    mjd_all = iso2mjd("2018-06-01T00:00:00")
    for old, new in LEGACY_FILTER_MAP_ML1.items():
        h = Header(); h["FILTER"] = old
        patch_legacy_header(h, "ML1", mjd_all)
        assert h["FILTER"] == new, (old, new)

    # transition window: only OBSERVER='abot' frames remapped
    mjd_tr = iso2mjd("2018-01-15T00:00:00")
    h = Header(); h["FILTER"] = "u"; h["OBSERVER"] = "Abot"
    patch_legacy_header(h, "ML1", mjd_tr)
    assert h["FILTER"] == "q"
    h = Header(); h["FILTER"] = "u"; h["OBSERVER"] = "PaulG"
    patch_legacy_header(h, "ML1", mjd_tr)
    assert h["FILTER"] == "u"
    h = Header(); h["FILTER"] = "u"       # no OBSERVER at all
    patch_legacy_header(h, "ML1", mjd_tr)
    assert h["FILTER"] == "u"

    # boundaries: after 2019-01-13T15:00 and before 2017-11-19, no-op
    for mjd in (iso2mjd("2019-01-13T16:00:00"),
                iso2mjd("2017-11-18T23:00:00")):
        h = Header(); h["FILTER"] = "u"
        patch_legacy_header(h, "ML1", mjd)
        assert h["FILTER"] == "u"
    # other telescopes: never
    h = Header(); h["FILTER"] = "u"
    patch_legacy_header(h, "BG2", mjd_all)
    assert h["FILTER"] == "u"

    # RA/DEC off-by-one: RA-REF (hours) / DEC-REF (deg) replace the
    # mount pointing before 2019-02-09, only when present
    h = Header(); h["RA-REF"] = "05:30:00.0"; h["DEC-REF"] = "-30:00:00"
    fix = legacy_radec_override(h, "ML1", iso2mjd("2019-02-08T00:00:00"))
    assert fix is not None
    assert abs(fix[0] - 82.5) < 1e-9 and abs(fix[1] + 30.0) < 1e-9
    assert legacy_radec_override(h, "ML1",
                                 iso2mjd("2019-02-10T00:00:00")) is None
    assert legacy_radec_override(h, "BG3",
                                 iso2mjd("2019-02-08T00:00:00")) is None
    h2 = Header()   # manual pointing: no RA-REF -> untouched
    assert legacy_radec_override(h2, "ML1",
                                 iso2mjd("2018-01-01T00:00:00")) is None

    # end-to-end through set_header: the repaired RA lands in the header
    h = Header()
    h["DATE-OBS"] = "2018-06-01T01:00:00.000"
    h["EXPTIME"] = 60.0
    h["FILTER"] = "r"
    h["IMAGETYP"] = "object"
    h["OBJECT"] = "4025"
    h["RA"] = "05:40:30.0"
    h["DEC"] = "-12:30:00"
    h["RA-REF"] = "05:40:00.0"
    h["DEC-REF"] = "-12:00:00"
    h = set_header(h, SITE, tel="ML1")
    assert h["FILTER"] == "g"                      # Abot window remap
    assert abs(h["RA"] - 85.0) < 1e-6              # RA-REF in hours
    assert abs(h["DEC"] + 12.0) < 1e-6


def test_legacy_radec_decimal_hours():
    """A bare decimal RA-REF is HOURS (the reference parses it with
    Angle(..., unit=u.hour)), not degrees."""
    from blackbox_tpu.astro.time import iso2mjd
    from blackbox_tpu.pipeline.headers import legacy_radec_override

    mjd = iso2mjd("2018-06-01T00:00:00")
    for raw in ("5.5", 5.5):
        h = Header(); h["RA-REF"] = raw; h["DEC-REF"] = "-30:00:00"
        fix = legacy_radec_override(h, "ML1", mjd)
        assert fix is not None
        assert abs(fix[0] - 82.5) < 1e-9, (raw, fix)
        assert abs(fix[1] + 30.0) < 1e-9

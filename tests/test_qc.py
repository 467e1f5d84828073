import numpy as np

from blackbox_tpu.io.fits import Header, read_fits
from blackbox_tpu.qc import qc_check, run_qc_check
from blackbox_tpu.qc.ranges import QC_RANGES
from blackbox_tpu.pipeline.catalogs import (
    empty_catalog, write_dummy_catalog, device_cat_to_columns,
    write_catalog)


def _good_header():
    h = Header()
    h["FILTER"] = "q"
    h["RDNOISE"] = 8.5
    h["BIASMEAN"] = 15000.0
    h["NCOSMICS"] = 6.0
    h["NSATS"] = 1
    h["SATURATE"] = 110000.0
    h["NOBJECTS"] = 5000
    h["LIMMAG"] = 20.3
    return h


def test_green(rng):
    res = qc_check(_good_header(), QC_RANGES, "ML1")
    assert res.color == "green"
    assert res.keys == []


def test_grades():
    h = _good_header()
    h["RDNOISE"] = 17.0            # yellow window (3, 20)
    res = qc_check(h, QC_RANGES, "ML1")
    assert res.color == "yellow"
    assert "RDNOISE" in res.keys

    h["RDNOISE"] = 25.0            # orange window (2, 30)
    assert qc_check(h, QC_RANGES, "ML1").color == "orange"

    h["RDNOISE"] = 123.0           # red
    assert qc_check(h, QC_RANGES, "ML1").color == "red"


def test_filter_keyed_range():
    h = _good_header()
    h["FILTER"] = "z"
    h["LIMMAG"] = 20.3             # green for z (17.5, 22.5)
    assert qc_check(h, QC_RANGES, "ML1").color == "green"
    h["LIMMAG"] = 16.5             # yellow for z
    assert qc_check(h, QC_RANGES, "ML1").color == "yellow"


def test_unknown_filter_is_red():
    # filter-keyed ranges must not silently grade against an arbitrary
    # filter's window (reference set_qc indexes by filter directly)
    h = _good_header()
    h["FILTER"] = "XX"
    res = qc_check(h, QC_RANGES, "ML1")
    assert res.color == "red"
    assert "LIMMAG" in res.keys


def test_none_is_red():
    h = _good_header()
    h["LIMMAG"] = "None"
    assert qc_check(h, QC_RANGES, "ML1").color == "red"


def test_run_qc_check_stamps_header():
    h = _good_header()
    h["RDNOISE"] = 25.0
    h["NCOSMICS"] = 5000.0
    color = run_qc_check(h, "ML1")
    assert color == "red"
    assert h["QC-FLAG"] == "red"
    assert h["QCRED1"] == "NCOSMICS"
    assert h["QCORA1"] == "RDNOISE"


def test_dummy_catalog(tmp_path):
    h = _good_header()
    h["QC-FLAG"] = "red"
    path = str(tmp_path / "dummy_cat.fits")
    write_dummy_catalog(path, h, "new", "ML1")
    tab, thdr = read_fits(path)[1]
    assert thdr["NAXIS2"] == 0
    assert thdr["DUMCAT"] is True
    assert "E_FLUX_APER" in tab
    # QC defaults filled for missing keys with declared defaults
    assert "NOBJECTS" in thdr


def test_device_cat_to_columns_roundtrip(tmp_path, rng):
    n = 50
    cat = {
        "valid": np.arange(n) < 20,
        "x": rng.uniform(0, 100, n), "y": rng.uniform(0, 100, n),
        "x2": rng.random(n), "y2": rng.random(n),
        "elong": np.ones(n), "fwhm": np.full(n, 3.0),
        "flux_iso": rng.uniform(1e3, 1e4, n),
        "flux_ap": rng.uniform(1e3, 1e4, (n, 3)),
        "fluxerr_ap": rng.uniform(10, 100, (n, 3)),
        "snr": rng.uniform(5, 100, n),
    }
    cols = device_cat_to_columns(cat, zeropoint=23.0)
    assert len(cols["NUMBER"]) == 20
    assert cols["MAG_OPT"].shape == (20,)
    assert np.all(cols["MAG_OPT"] < 25)
    path = str(tmp_path / "cat.fits")
    write_catalog(path, cols, Header(), "new")
    tab, thdr = read_fits(path)[1]
    assert thdr["NAXIS2"] == 20
    np.testing.assert_allclose(tab["E_FLUX_APER"], cols["E_FLUX_APER"],
                               rtol=1e-6)

import numpy as np

from blackbox_tpu.io.fits import Header, write_image, read_fits


def test_image_roundtrip(tmp_path, rng):
    img = rng.normal(100, 10, (64, 48)).astype(np.float32)
    h = Header()
    h["EXPTIME"] = (30.0, "[s] exposure time")
    h["FILTER"] = ("q", "filter id")
    h["NCOSMICS"] = (12.5, "[/s] cosmic rays")
    h["QC-FLAG"] = ("green", "QC flag")
    h["SATURATE"] = (123456.789, "[e-] level")
    h["VALID"] = (True, "bool card")
    path = tmp_path / "img.fits"
    write_image(str(path), img, h)
    hdus = read_fits(str(path))
    data, hdr = hdus[0]
    np.testing.assert_array_equal(data, img)
    assert hdr["EXPTIME"] == 30.0
    assert hdr["FILTER"] == "q"
    assert hdr["VALID"] is True
    assert abs(hdr["SATURATE"] - 123456.789) < 1e-6
    assert hdr.comment("EXPTIME") == "[s] exposure time"


def test_mask_uint8_roundtrip(tmp_path, rng):
    m = (rng.random((32, 32)) * 64).astype(np.uint8)
    path = tmp_path / "mask.fits"
    write_image(str(path), m, Header())
    data, hdr = read_fits(str(path))[0]
    assert data.dtype == np.uint8
    np.testing.assert_array_equal(data, m)


def test_gzip_roundtrip(tmp_path, rng):
    img = rng.normal(size=(16, 16)).astype(np.float32)
    path = tmp_path / "img.fits.gz"
    write_image(str(path), img, Header())
    data, hdr = read_fits(str(path))[0]
    np.testing.assert_array_equal(data, img)


def test_table_extension_roundtrip(tmp_path, rng):
    cols = {
        "NUMBER": np.arange(10, dtype=np.int32),
        "X_POS": rng.normal(size=10).astype(np.float32),
        "FLUX_AP": rng.normal(size=(10, 3)).astype(np.float32),
        "FLAG": (rng.random(10) > 0.5),
        "NAME": np.array([f"src{i}" for i in range(10)]),
    }
    th = Header()
    th["ORIGIN"] = ("blackbox_tpu", "")
    path = tmp_path / "cat.fits"
    write_image(str(path), None, Header(), extensions=[("table", cols, th)])
    hdus = read_fits(str(path))
    assert len(hdus) == 2
    tab, thdr = hdus[1]
    np.testing.assert_array_equal(tab["NUMBER"], cols["NUMBER"])
    np.testing.assert_allclose(tab["X_POS"], cols["X_POS"])
    np.testing.assert_allclose(tab["FLUX_AP"], cols["FLUX_AP"])
    np.testing.assert_array_equal(tab["FLAG"], cols["FLAG"])
    assert list(tab["NAME"]) == [f"src{i}".ljust(4) for i in range(10)] or \
        [s.strip() for s in tab["NAME"]] == [f"src{i}" for i in range(10)]


def test_zero_row_table(tmp_path):
    cols = {"X": np.zeros(0, np.float32), "N": np.zeros(0, np.int32)}
    path = tmp_path / "dummy.fits"
    write_image(str(path), None, Header(), extensions=[("table", cols,
                                                        Header())])
    tab, hdr = read_fits(str(path))[1]
    assert hdr["NAXIS2"] == 0
    assert tab["X"].shape == (0,)

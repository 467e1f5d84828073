import numpy as np
import pytest

from blackbox_tpu.io import rice
from blackbox_tpu.io.fits import Header


def _have_cpp():
    return rice._get_lib() is not None


def test_cpp_lib_builds():
    # the native codec must be available in this environment (g++ baked in)
    assert _have_cpp(), "C++ rice codec failed to build"


@pytest.mark.parametrize("dtype", [np.int32, np.int16, np.uint8])
def test_roundtrip_random(dtype, rng):
    info = np.iinfo(dtype)
    a = rng.integers(info.min, info.max, 5000).astype(dtype)
    buf = rice.rice_encode(a)
    out = rice.rice_decode(buf, len(a), dtype)
    np.testing.assert_array_equal(out, a)


def test_roundtrip_skylike(rng):
    # quantised sky noise: the codec's design case — strong compression
    a = np.round(rng.normal(12000, 8, 100_000)).astype(np.int32)
    buf = rice.rice_encode(a)
    out = rice.rice_decode(buf, len(a), np.int32)
    np.testing.assert_array_equal(out, a)
    assert len(buf) < 0.25 * a.nbytes, len(buf) / a.nbytes


def test_roundtrip_constant_and_edges():
    for a in [np.zeros(100, np.int32),
              np.full(65, -7, np.int32),
              np.array([5], np.int32),
              np.arange(-50, 50, dtype=np.int32) * 100000,
              np.array([np.iinfo(np.int32).max,
                        np.iinfo(np.int32).min, 0, -1, 1], np.int32)]:
        out = rice.rice_decode(rice.rice_encode(a), len(a), np.int32)
        np.testing.assert_array_equal(out, a)


@pytest.mark.skipif(not _have_cpp(), reason="no C++ codec")
def test_cpp_matches_numpy_bitstream(rng):
    # two independent implementations of the CFITSIO algorithm must
    # produce identical bitstreams and decode each other
    a = np.round(rng.normal(500, 20, 3000)).astype(np.int32)
    a[100:200] = 0
    a[250] = 2 ** 30            # forces a raw block
    cpp = rice.rice_encode(a)
    py = rice._np_encode(a)
    assert cpp == py
    np.testing.assert_array_equal(rice._np_decode(cpp, len(a), np.int32), a)
    np.testing.assert_array_equal(rice.rice_decode(py, len(a), np.int32), a)


def test_write_read_rice_float(tmp_path, rng):
    img = (rng.normal(300, 10, (256, 200))).astype(np.float32)
    img[40:40 + 5, 60:60 + 5] += 5000.0
    h = Header()
    h["OBJECT"] = ("testfield", "")
    p = str(tmp_path / "img.fits.fz")
    rice.write_rice(p, img, h, qlevel=16.0)
    out, h2 = rice.read_rice(p)
    assert out.shape == img.shape
    assert h2["OBJECT"].strip() == "testfield"
    # quantisation error bounded by ~zscale/2 = sigma/(2q)
    err = np.abs(out - img)
    assert np.median(err) < 10.0 / 16.0
    assert err.max() < 10.0
    # and it actually compresses
    import os
    assert os.path.getsize(p) < 0.5 * img.nbytes


def test_write_read_rice_int_lossless(tmp_path, rng):
    img = rng.integers(0, 64, (100, 80)).astype(np.int16)
    p = str(tmp_path / "mask.fits.fz")
    rice.write_rice(p, img)
    out, _ = rice.read_rice(p)
    np.testing.assert_array_equal(out.astype(np.int16), img)


def test_qlevel_tradeoff(tmp_path, rng):
    img = (rng.normal(300, 10, (256, 256))).astype(np.float32)
    sizes = {}
    errs = {}
    for q in (2.0, 16.0):
        p = str(tmp_path / f"q{q}.fits.fz")
        rice.write_rice(p, img, qlevel=q)
        out, _ = rice.read_rice(p)
        import os
        sizes[q] = os.path.getsize(p)
        errs[q] = float(np.median(np.abs(out - img)))
    assert sizes[16.0] > sizes[2.0]          # more precision -> bigger
    assert errs[16.0] < errs[2.0]            # ... and more accurate

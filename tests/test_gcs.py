"""gs:// path flow over the in-memory fake GCS filesystem.

The reference's Google-mode publication (gsutil copies with x3 retries,
blackbox.py:7836-7852, 7939-7957) never runs locally; these tests drive
the SAME framework code paths (storage wrappers, FITS/Rice product IO,
header tables) against a bucket-shaped store so the gs:// flow is
exercised, not just import-gated.
"""

import numpy as np
import pytest

from blackbox_tpu.io.fakegcs import FakeGCSFileSystem
from blackbox_tpu.io.storage import (GCSBackend, already_exists,
                                     copy_files, get_backend, list_files,
                                     set_gcs_filesystem)


@pytest.fixture()
def gcs():
    fs = FakeGCSFileSystem()
    set_gcs_filesystem(fs, backoff=0.0)
    yield fs
    set_gcs_filesystem(None)


def test_backend_roundtrip_and_listing(gcs):
    be = get_backend("gs://bucket/a.txt")
    assert isinstance(be, GCSBackend)
    be.write_bytes("gs://bucket/red/2024/a.txt", b"hello")
    be.write_bytes("gs://bucket/red/2024/b.txt", b"world!")
    assert be.exists("gs://bucket/red/2024/a.txt")
    assert be.isfile("gs://bucket/red/2024/b.txt")
    assert be.isdir("gs://bucket/red")
    assert not be.isfile("gs://bucket/red")
    assert be.read_bytes("gs://bucket/red/2024/a.txt") == b"hello"
    assert be.size("gs://bucket/red/2024/b.txt") == 6
    assert be.mtime("gs://bucket/red/2024/a.txt") > 0

    assert list_files("gs://bucket/red/2024/") == [
        "gs://bucket/red/2024/a.txt", "gs://bucket/red/2024/b.txt"]
    assert list_files("gs://bucket/red/2024/", end_str="b.txt") == [
        "gs://bucket/red/2024/b.txt"]
    assert be.list_folders("gs://bucket/*") == ["gs://bucket/red"]

    be.copy("gs://bucket/red/2024/a.txt", "gs://bucket/arch/a.txt")
    assert be.read_bytes("gs://bucket/arch/a.txt") == b"hello"
    be.remove("gs://bucket/red/2024/a.txt")
    assert not be.exists("gs://bucket/red/2024/a.txt")
    # recursive remove of a pseudo-folder
    be.remove("gs://bucket/red")
    assert not be.isdir("gs://bucket/red")


def test_already_exists_fz_variants(gcs):
    be = get_backend("gs://b/x")
    be.write_bytes("gs://b/red/img.fits.fz", b"x")
    assert already_exists("gs://b/red/img.fits")
    ok, found = already_exists("gs://b/red/img.fits", get_filename=True)
    assert ok and found == "gs://b/red/img.fits.fz"
    assert not already_exists("gs://b/red/other.fits")


def test_copy_files_posix_to_gcs(gcs, tmp_path):
    src = tmp_path / "f1.cat"
    src.write_bytes(b"catalog")
    out = copy_files([str(src)], "gs://b/night/")
    assert out == ["gs://b/night/f1.cat"]
    assert get_backend(out[0]).read_bytes(out[0]) == b"catalog"


class _Flaky:
    """Wraps a fs; first ``nfail`` calls of wrapped ops raise."""

    def __init__(self, fs, nfail):
        self._fs = fs
        self.left = nfail
        self.calls = 0

    def __getattr__(self, name):
        attr = getattr(self._fs, name)
        if not callable(attr):
            return attr

        def wrapper(*a, **k):
            self.calls += 1
            if self.left > 0:
                self.left -= 1
                raise OSError("transient GCS hiccup")
            return attr(*a, **k)
        return wrapper


def test_retry_recovers_from_transients():
    fs = FakeGCSFileSystem()
    fs.pipe_file("b/k.txt", b"data")
    flaky = _Flaky(fs, nfail=2)
    be = GCSBackend(flaky, retries=3, backoff=0.0)
    assert be.read_bytes("gs://b/k.txt") == b"data"    # 2 fails + 1 ok
    assert flaky.calls == 3


def test_retry_exhausts_and_raises():
    be = GCSBackend(_Flaky(FakeGCSFileSystem(), nfail=99),
                    retries=3, backoff=0.0)
    with pytest.raises(OSError):
        be.read_bytes("gs://b/k.txt")


def test_retry_not_applied_to_missing_object():
    fs = FakeGCSFileSystem()
    flaky = _Flaky(fs, nfail=0)
    be = GCSBackend(flaky, retries=3, backoff=0.0)
    with pytest.raises(FileNotFoundError):
        be.read_bytes("gs://b/missing.txt")
    assert flaky.calls == 1                            # no retry


def test_fits_products_over_gcs(gcs):
    from blackbox_tpu.io.fits import Header, read_fits, write_image

    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    h = Header()
    h["OBJECT"] = ("FIELD1", "target")
    cols = {"X": np.array([1.5, 2.5]), "NAME": np.array(["a", "b"])}
    for path in ("gs://b/red/f.fits", "gs://b/red/f_cat.fits.gz"):
        write_image(path, img, h, extensions=[("table", cols, Header())])
        hdus = read_fits(path)
        np.testing.assert_array_equal(hdus[0][0], img)
        assert hdus[0][1]["OBJECT"].strip() == "FIELD1"
        np.testing.assert_allclose(hdus[1][0]["X"], [1.5, 2.5])


def test_rice_products_over_gcs(gcs):
    from blackbox_tpu.io.fits import Header
    from blackbox_tpu.io.rice import read_rice, write_rice

    rng = np.random.default_rng(3)
    img = rng.normal(100.0, 5.0, (64, 48)).astype(np.float32)
    write_rice("gs://b/red/img.fits.fz", img, Header(), qlevel=16)
    back, _ = read_rice("gs://b/red/img.fits.fz")
    assert back.shape == img.shape
    assert np.std(back - img) < 5.0 / 16 * 1.1


def test_headertable_over_gcs(gcs):
    from blackbox_tpu.io.fits import Header
    from blackbox_tpu.orchestration.headertable import (add_headkeys,
                                                        read_table)
    from blackbox_tpu.orchestration.paths import DataTree

    tree = DataTree("gs://b/data", "ML1")
    h = Header()
    h["DATE-OBS"] = ("2024-01-01T00:00:00", "")
    h["OBJECT"] = ("F123", "")
    h["FILTER"] = ("q", "")
    p = add_headkeys(tree, "ML1", "cat", [h], ["x_red.fits"])
    assert p.startswith("gs://")
    t = read_table(tree, "ML1", "cat")
    assert t["FILENAME"] == ["x_red.fits"]
    assert t["OBJECT"] == ["F123"]
    # keep-last update
    h2 = Header()
    h2["DATE-OBS"] = ("2024-01-02T00:00:00", "")
    h2["OBJECT"] = ("F999", "")
    h2["FILTER"] = ("u", "")
    add_headkeys(tree, "ML1", "cat", [h2], ["x_red.fits"])
    t = read_table(tree, "ML1", "cat")
    assert t["FILENAME"] == ["x_red.fits"]
    assert t["OBJECT"] == ["F999"]

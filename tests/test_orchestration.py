import os
import queue
import time

import numpy as np
import pytest

from blackbox_tpu.io.fits import Header, write_image, read_fits
from blackbox_tpu.io.storage import already_exists, list_files
from blackbox_tpu.orchestration.headertable import (
    add_headkeys, query, read_table, table_path)
from blackbox_tpu.orchestration.ingest import DirectoryWatcher
from blackbox_tpu.orchestration.paths import (
    DataTree, base_name, night_date, parse_raw_name)
from blackbox_tpu.orchestration.scheduler import sort_files
from blackbox_tpu.report.obslog import format_obslog
from blackbox_tpu.report.quicklook import zscale, save_jpeg, cutout
from blackbox_tpu.sso.match import (
    Elements, ephemeris, kepler_solve, match_sso)


def test_paths_conventions(tmp_path):
    tree = DataTree(str(tmp_path), "ML1")
    assert tree.raw_dir("20260301").endswith("ML1/raw/2026/03/01")
    assert tree.red_dir("20260301", "bias").endswith(
        "red/2026/03/01/bias")
    assert tree.ref_dir(42).endswith("ref/00042")
    assert parse_raw_name("ML1_20260301_231005.fits") == \
        ("ML1", "20260301", "231005")
    assert base_name("/a/b/ML1_x.fits.fz") == "ML1_x"
    # a 23:00 UTC frame at an eastern site belongs to that evening
    assert night_date("2026-03-01T23:00:00.000", 20.8) == "20260301"
    # and an 02:00 UTC frame belongs to the previous evening's night
    assert night_date("2026-03-02T02:00:00.000", 20.8) == "20260301"


def test_already_exists_variants(tmp_path):
    p = str(tmp_path / "f.fits")
    open(p + ".fz", "wb").write(b"x")
    assert already_exists(p)
    ok, found = already_exists(p, get_filename=True)
    assert found.endswith(".fz")
    assert not already_exists(str(tmp_path / "nope.fits"))


def test_sort_files(tmp_path):
    names = {}
    for t in ("object", "bias", "flat"):
        p = str(tmp_path / f"{t}.fits")
        h = Header()
        h["IMAGETYP"] = (t, "")
        write_image(p, np.zeros((4, 4), np.uint16), h)
        names[t] = p
    bad = str(tmp_path / "bad.fits")
    open(bad, "wb").write(b"garbage")
    out = sort_files([names["object"], bad, names["flat"],
                      names["bias"]])
    assert out[0] == names["bias"]
    assert out[1] == names["flat"]
    assert out[2] == names["object"]
    assert out[3] == bad


def test_directory_watcher(tmp_path):
    q: "queue.Queue[str]" = queue.Queue()
    pre = str(tmp_path / "pre.fits")
    open(pre, "wb").write(b"old")
    w = DirectoryWatcher(str(tmp_path / "*.fits"), q, poll_s=0.05,
                         stable_s=0.1)
    w.start()
    try:
        time.sleep(0.2)
        assert q.empty()                    # preexisting file not queued
        newf = str(tmp_path / "new.fits")
        open(newf, "wb").write(b"data")
        got = q.get(timeout=5.0)
        assert got == newf
    finally:
        w.stop()


def test_headertable_roundtrip(tmp_path):
    tree = DataTree(str(tmp_path), "ML1")
    h1 = Header()
    h1["MJD-OBS"] = (60001.5, "")
    h1["OBJECT"] = ("42", "")
    h1["FILTER"] = ("q", "")
    h1["LIMMAG"] = (20.5, "")
    h1["QC-FLAG"] = ("green", "")
    h1["S-SEEING"] = (2.2, "")
    add_headkeys(tree, "ML1", "cat", [h1], ["a_red.fits"])
    # update same filename (keep-last) + a second frame
    h2 = h1.copy()
    h2["LIMMAG"] = (21.0, "")
    h3 = h1.copy()
    h3["QC-FLAG"] = ("red", "")
    add_headkeys(tree, "ML1", "cat", [h2, h3],
                 ["a_red.fits", "b_red.fits"])
    t = read_table(tree, "ML1", "cat")
    assert len(t["FILENAME"]) == 2
    assert float(t["LIMMAG"][list(t["FILENAME"]).index("a_red.fits")]) \
        == 21.0
    rows = query(tree, "ML1", "cat", **{"QC-FLAG": "green"})
    assert len(rows) == 1 and rows[0]["FILENAME"] == "a_red.fits"
    rows = query(tree, "ML1", "cat", LIMMAG=(20.9, 22.0))
    assert len(rows) == 1


def test_obslog_format():
    rows = [{"FILENAME": "f1", "IMAGETYP": "object", "QC-FLAG": "green",
             "LIMMAG": 20.123456},
            {"FILENAME": "f2", "IMAGETYP": "bias", "QC-FLAG": "red"}]
    txt = format_obslog(rows, "20260301", "ML1")
    assert "green=1" in txt and "red=1" in txt
    assert "20.12" in txt
    assert txt.count("\n") >= 5


def test_zscale_and_jpeg(tmp_path, rng):
    img = rng.normal(100, 5, (64, 64)).astype(np.float32)
    img[30, 30] = 5000.0
    z1, z2 = zscale(img)
    assert 80 < z1 < 100 and 100 < z2 < 140      # star ignored
    p = save_jpeg(str(tmp_path / "x.jpg"), img, title="test")
    assert os.path.getsize(p) > 500
    c = cutout(img, 30, 30, 9)
    assert c.shape == (9, 9) and c.max() == 5000.0


def test_kepler_and_ephemeris():
    # circular orbit: E == M
    E = kepler_solve(np.array([0.3, 2.0, -1.2]), 0.0)
    np.testing.assert_allclose(E, [0.3, 2.0, -1.2], atol=1e-12)
    # high-e convergence: Kepler's equation satisfied
    M = np.linspace(-3, 3, 25)
    E = kepler_solve(M, 0.95)
    np.testing.assert_allclose(E - 0.95 * np.sin(E), M, atol=1e-10)

    # a Ceres-like orbit stays near the ecliptic and at sane distance
    el = Elements("Ceres", a=2.767, e=0.0785, incl=10.6, node=80.3,
                  argper=73.6, M0=77.4, epoch_mjd=60000.0, H=3.34)
    ra, dec, r, delta, mag = ephemeris(el, 60100.0)
    assert 0 <= ra < 360 and -35 < dec < 35
    assert 2.5 < r < 3.0
    assert 1.5 < delta < 4.0
    assert 6 < mag < 11


def test_match_sso_finds_planted():
    el = Elements("2026 AB", a=2.2, e=0.1, incl=5.0, node=100.0,
                  argper=30.0, M0=10.0, epoch_mjd=60200.0, H=18.0)
    mjd = 60250.0
    ra, dec, *_ = ephemeris(el, mjd)
    tra = np.array([ra + 0.0005, 150.0])       # ~1.8" off + a field star
    tdec = np.array([dec, -30.0])
    idx, names, sep, mags = match_sso(tra, tdec, mjd, [el],
                                      radius_arcsec=10.0)
    assert list(idx) == [0]
    assert names[0] == "2026 AB"
    assert sep[0] < 3.0


def test_run_day_and_obslog(tmp_path):
    """Scheduler + driver + obslog end-to-end on a tiny night."""
    import jax
    from blackbox_tpu.core.geometry import TINY
    from blackbox_tpu.config.defaults import ReductionSettings
    from blackbox_tpu.pipeline.driver import Pipeline
    from blackbox_tpu.orchestration.scheduler import run_day, create_masters
    from blackbox_tpu.report.obslog import create_obslog
    from blackbox_tpu.synth.observation import night_of_observations
    from tests.test_driver import _ctx, PIXSCALE

    rng = np.random.default_rng(3)
    files, truths, tree = night_of_observations(
        str(tmp_path), TINY, rng, date="20260302", nbias=3, nflat=3,
        nsci=1, nstars=25, ncosmics=5, trail=False, nsat=0, sky_e=300.0)
    s = ReductionSettings(geometry=TINY, pixscale=PIXSCALE)
    pipe = Pipeline(tree, "ML1", s, _ctx(s))

    rep = run_day(pipe, "20260302")
    assert rep.nprocessed == 7
    assert rep.nreduced == 7, [(p, r.status, r.error)
                               for p, r in rep.results]
    # second run: everything skipped except the never-produced trans
    rep2 = run_day(pipe, "20260302")
    assert rep2.nreduced <= 1 and rep2.nerror == 0

    masters = create_masters(pipe, "20260302")
    assert masters[("bias", None)] is not None
    assert masters[("flat", "q")] is not None

    obslog = create_obslog(tree, "20260302", "ML1")
    txt = open(obslog).read()
    assert "Observation log" in txt
    assert txt.count("\n") >= 10       # 7 frames + headers
    from blackbox_tpu.orchestration.headertable import read_table
    t = read_table(tree, "ML1", "cat")
    assert len(t["FILENAME"]) == 1     # the science frame
    assert len(read_table(tree, "ML1", "bias")["FILENAME"]) == 3


def test_pubsub_event_parsing():
    from blackbox_tpu.orchestration.pubsub import parse_bucket_event
    # attribute form (what the reference consumes)
    p = parse_bucket_event(b"", {"bucketId": "blackgem-raw",
                                 "objectId": "2026/03/01/BG2_x.fits.fz",
                                 "eventType": "OBJECT_FINALIZE"})
    assert p == "gs://blackgem-raw/2026/03/01/BG2_x.fits.fz"
    # JSON payload form
    p = parse_bucket_event(
        b'{"bucket": "b", "name": "f.fits.fz"}')
    assert p == "gs://b/f.fits.fz"
    # filtered: wrong suffix, wrong event, garbage
    assert parse_bucket_event(b'{"bucket":"b","name":"f.jpg"}') is None
    assert parse_bucket_event(b"", {"bucketId": "b", "objectId": "f.fits.fz",
                                    "eventType": "OBJECT_DELETE"}) is None
    assert parse_bucket_event(b"not json") is None


@pytest.mark.slow
def test_run_day_device_batch_matches_single(tmp_path, rng):
    """device_batch > 1: science device work runs as a sharded batch;
    published headers must match the per-frame path."""
    from blackbox_tpu.config.defaults import ReductionSettings
    from blackbox_tpu.core.geometry import TINY
    from blackbox_tpu.orchestration.scheduler import run_day
    from blackbox_tpu.pipeline.driver import Pipeline
    from blackbox_tpu.synth.observation import night_of_observations
    from tests.test_driver import _ctx

    roots = [str(tmp_path / "a"), str(tmp_path / "b")]
    pipes, reports = [], []
    for root, db in zip(roots, (1, 2)):
        rng_i = np.random.default_rng(77)
        files, truths, tree = night_of_observations(
            root, TINY, rng_i, date="20260401", nbias=3, nflat=3,
            nsci=2, nstars=25, ncosmics=3, trail=False, nsat=0)
        s = ReductionSettings(geometry=TINY, pixscale=20.0,
                              device_batch=db)
        pipe = Pipeline(tree, "ML1", s, _ctx(s), subtract_refs=False)
        reports.append(run_day(pipe, "20260401"))
    r1, r2 = reports
    assert r1.nreduced == r2.nreduced > 0
    sci1 = [res for _, res in r1.results
            if res.header and str(res.header.get("IMAGETYP")) == "object"]
    sci2 = [res for _, res in r2.results
            if res.header and str(res.header.get("IMAGETYP")) == "object"]
    assert len(sci1) == len(sci2) == 2
    for a, b in zip(sci1, sci2):
        assert a.status == b.status == "reduced"
        assert int(a.header["NOBJECTS"]) == int(b.header["NOBJECTS"])
        assert a.header["QC-FLAG"] == b.header["QC-FLAG"]


@pytest.mark.slow
def test_run_day_device_batch_partial_chunk(tmp_path, rng):
    """A chunk smaller than the device count (3 frames on the 8-device
    CPU mesh) shards on the largest divisor instead of crashing
    device_put with an uneven batch axis (review finding)."""
    from blackbox_tpu.config.defaults import ReductionSettings
    from blackbox_tpu.core.geometry import TINY
    from blackbox_tpu.orchestration.scheduler import run_day
    from blackbox_tpu.pipeline.driver import Pipeline
    from blackbox_tpu.synth.observation import night_of_observations
    from tests.test_driver import _ctx

    rng_i = np.random.default_rng(5)
    files, truths, tree = night_of_observations(
        str(tmp_path), TINY, rng_i, date="20260402", nbias=3, nflat=3,
        nsci=3, nstars=25, ncosmics=3, trail=False, nsat=0)
    s = ReductionSettings(geometry=TINY, pixscale=20.0, device_batch=8)
    pipe = Pipeline(tree, "ML1", s, _ctx(s), subtract_refs=False)
    rep = run_day(pipe, "20260402")
    sci = [res for _, res in rep.results
           if res.header and str(res.header.get("IMAGETYP")) == "object"]
    assert len(sci) == 3
    assert all(r.status == "reduced" for r in sci)


def test_night_summary_counts(tmp_path):
    from blackbox_tpu.orchestration.paths import DataTree
    from blackbox_tpu.report.obslog import night_summary

    tree = DataTree(str(tmp_path), "ML1")
    raw = tree.raw_dir("20260301")
    os.makedirs(raw)
    for n in ("bias1.fits.fz", "flat_q.fits.fz", "field1.fits.fz",
              "field2.fits.fz"):
        with open(os.path.join(raw, n), "wb") as fh:
            fh.write(b"x")
    rows = [
        {"IMAGETYP": "object", "NOBJECTS": 1200, "QC-FLAG": "green",
         "T-NTRANS": 4, "TQC-FLAG": "red", "N-SSO": 1},
        {"IMAGETYP": "object", "NOBJECTS": 900, "QC-FLAG": "red",
         "T-NTRANS": 0, "TQC-FLAG": "green", "N-SSO": 0},
        {"IMAGETYP": "bias", "QC-FLAG": "green"},
    ]
    body = night_summary(tree, "20260301", "ML1", rows=rows)
    assert "# raw images:       4 (1 biases, 0 darks, 1 flats, "\
        "2 objects)" in body
    assert "# reduced images:   3 (1 biases, 0 darks, 0 flats, "\
        "2 objects)" in body
    assert "# full-source cats: 2 (1 red-flagged)" in body
    assert "# transient cats:   2 (1 red-flagged)" in body
    assert "# SSO cats:         2 (1 empty)" in body


def test_weather_overview_png(tmp_path):
    """The night-report weather overview renders a PNG from header
    telemetry (the reference's weather_screenshot equivalent)."""
    from blackbox_tpu.report.obslog import weather_overview

    rows = []
    for i in range(8):
        rows.append({
            "DATE-OBS": f"2026-03-01T2{i % 4}:{10 + i:02d}:00.000",
            "WINDAVE": 12.0 + i, "RH-MAST": 40.0 + 2 * i,
            "CL-BASE": 2500.0 - 40 * i, "S-SEEING": 1.1 + 0.05 * i,
        })
    png = weather_overview(rows, "20260301", "ML1")
    assert png is not None and png[:8] == b"\x89PNG\r\n\x1a\n"
    out = tmp_path / "w.png"
    out.write_bytes(png)
    assert out.stat().st_size > 10000

    # degrades to None without usable telemetry
    assert weather_overview([], "20260301", "ML1") is None
    assert weather_overview([{"DATE-OBS": "x"}] * 3,
                            "20260301", "ML1") is None


def test_run_night_streaming(tmp_path):
    """run_night end to end (scheduler.py:238; reference
    blackbox.py:392-466): a feeder thread drops raw frames into the
    watched dir MID-RUN — including one slow partial write the settle
    guard must wait out — and the loop reduces every frame, drains the
    queue past ``until()``, and the night yields an obslog."""
    import glob
    import threading

    from blackbox_tpu.core.geometry import TINY
    from blackbox_tpu.config.defaults import ReductionSettings
    from blackbox_tpu.pipeline.driver import Pipeline
    from blackbox_tpu.orchestration.scheduler import run_night
    from blackbox_tpu.report.obslog import create_obslog
    from blackbox_tpu.synth.observation import night_of_observations
    from tests.test_driver import _ctx, PIXSCALE

    date = "20260305"
    # generate the night OFF to the side; the feeder streams it in
    src_root = str(tmp_path / "src")
    rng = np.random.default_rng(9)
    files, truths, src_tree = night_of_observations(
        src_root, TINY, rng, date=date, nbias=3, nflat=3, nsci=1,
        nstars=25, ncosmics=5, trail=False, nsat=0, sky_e=300.0)

    run_root = str(tmp_path / "run")
    tree = DataTree(run_root, "ML1")
    raw_dir = tree.raw_dir(date)
    os.makedirs(raw_dir, exist_ok=True)
    s = ReductionSettings(geometry=TINY, pixscale=PIXSCALE)
    pipe = Pipeline(tree, "ML1", s, _ctx(s))

    fed_all = threading.Event()

    def feeder():
        # cals first (arrival order of a real night), science last
        for i, f in enumerate(files):
            data = open(f, "rb").read()
            dst = os.path.join(raw_dir, os.path.basename(f))
            if i == len(files) - 1:
                # slow partial write: the watcher must NOT enqueue the
                # growing file (size keeps changing faster than
                # stable_s) until the write completes
                with open(dst, "wb") as fh:
                    n = len(data)
                    for k in range(5):
                        fh.write(data[k * n // 5:(k + 1) * n // 5])
                        fh.flush()
                        os.fsync(fh.fileno())
                        time.sleep(0.4)
            else:
                open(dst, "wb").write(data)
            time.sleep(0.05)
        fed_all.set()

    def until():
        # the sun is "up" once the feeder finished; drain_until still
        # empties the queue before returning (reference keeps reducing
        # frames that arrived before sunrise, blackbox.py:444-453)
        if not fed_all.is_set():
            return False
        reds = glob.glob(os.path.join(
            tree.red_dir(date), "**", "*_red.fits*"), recursive=True)
        return len(reds) >= len(files)

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    try:
        rep = run_night(pipe, date, until=until, poll_s=0.1,
                        max_runtime_s=300.0)
    finally:
        t.join(timeout=10.0)
    assert rep.nprocessed == len(files)
    assert rep.nreduced == len(files), \
        [(p, r.status, r.error) for p, r in rep.results]

    obslog = create_obslog(tree, date, "ML1")
    txt = open(obslog).read()
    assert "Observation log" in txt

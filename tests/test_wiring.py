"""Settings-knob wiring: every config field must have an observable
effect (VERDICT round 1: parity-looking dead knobs are worse than
absent ones)."""

import os

import numpy as np
import pytest

from blackbox_tpu.core.geometry import TINY
from blackbox_tpu.config.defaults import ReductionSettings
from blackbox_tpu.core import maskbits
from blackbox_tpu.io.fits import Header, write_image
from blackbox_tpu.orchestration.paths import DataTree
from blackbox_tpu.pipeline.driver import Pipeline
from blackbox_tpu.pipeline.reduce import ReduceContext
from blackbox_tpu.synth.observation import write_observation

PIXSCALE = 20.0


def _ctx(s, **kw):
    from blackbox_tpu.ops.cosmics import LACosmicParams
    from blackbox_tpu.ops.detection import DetectParams
    from blackbox_tpu.ops.psf import PSFParams
    return ReduceContext.from_settings(
        s, "ML1",
        lac_params=LACosmicParams(strip_rows=32),
        det_params=DetectParams(max_sources=512, label_iters=16),
        psf_params=PSFParams(poldeg=1), **kw)


def _one_science(tmp_path, rng, settings=None, pipe_kw=None, date="20260401"):
    tree = DataTree(str(tmp_path), "ML1")
    s = settings or ReductionSettings(geometry=TINY, pixscale=PIXSCALE)
    d = tree.raw_dir(date)
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, "ML1_20260401_000000.fits")
    write_observation(p, TINY, rng, "object", "ML1",
                      mjd_start=60771.95, nstars=30, ncosmics=2,
                      trail=False, nsat=0)
    pipe = Pipeline(tree, "ML1", s, _ctx(s), **(pipe_kw or {}))
    return pipe, p, tree


@pytest.mark.slow
def test_bad_pixel_mask_wiring(tmp_path, rng):
    # a static BPM FITS flags a known pixel; the product mask must
    # carry the BAD bit there (reference blackbox.py:4375-4416)
    H, W = TINY.red_shape
    bpm = np.zeros((H, W), np.uint8)
    bpm[40, 50] = maskbits.BAD
    bpm_path = str(tmp_path / "bpm_q.fits")
    write_image(bpm_path, bpm, Header())

    s = ReductionSettings(geometry=TINY, pixscale=PIXSCALE,
                          bad_pixel_mask={"q": bpm_path})
    pipe, p, tree = _one_science(tmp_path, rng, settings=s)
    r = pipe.process_file(p, trans_extract=False)
    assert r.status == "reduced", r.error
    assert r.header["BPM-F"] == "bpm_q.fits"
    from blackbox_tpu.io.rice import read_rice
    # match the basename — pytest's tmp dir name contains "_mask"
    mask_file = [x for x in r.products
                 if os.path.basename(x).endswith("_mask.fits.fz")][0]
    mask, _ = read_rice(mask_file)
    assert np.asarray(mask).astype(np.uint8)[40, 50] & maskbits.BAD


@pytest.mark.slow
def test_nonlin_wiring(tmp_path, rng):
    # identical frames reduced with/without a non-linearity correction
    # must differ where the correction is non-zero
    C = TINY.n_chan
    coeffs = np.zeros((C, 3), np.float32)
    coeffs[:, 0] = 0.02          # constant +2% fractional correction
    nl_path = str(tmp_path / "nonlin.npy")
    np.save(nl_path, coeffs)

    s0 = ReductionSettings(geometry=TINY, pixscale=PIXSCALE)
    s1 = ReductionSettings(geometry=TINY, pixscale=PIXSCALE,
                           correct_nonlin=True, nonlin_corr_file=nl_path)
    pipe0, p, tree = _one_science(tmp_path, rng, settings=s0)
    r0 = pipe0.process_file(p, trans_extract=False)
    pipe1 = Pipeline(DataTree(str(tmp_path), "ML1"), "ML1", s1,
                     _ctx(s1, correct_nonlin=True))
    r1 = pipe1.process_file(p, force=True, trans_extract=False)
    assert r0.status == r1.status == "reduced"
    assert not r0.header.get("NONLIN-P")
    assert r1.header["NONLIN-P"]
    # 2% fractional correction shifts the background level by ~2%
    b0 = float(r0.header["S-BKG"])
    b1 = float(r1.header["S-BKG"])
    assert 0.005 < abs(b1 - b0) / max(abs(b0), 1e-9) < 0.05, (b0, b1)


@pytest.mark.slow
def test_master_dark_wiring(tmp_path, rng):
    # create_mdark: reducing darks produces an e-/s-normalised master
    from blackbox_tpu.astro.time import iso2mjd
    from blackbox_tpu.orchestration.paths import night_date
    tree = DataTree(str(tmp_path), "ML1")
    s = ReductionSettings(geometry=TINY, pixscale=PIXSCALE,
                          create_mdark=True)
    mjd0 = iso2mjd("2026-04-01T22:48:00.000")
    date = night_date(mjd0, 20.8112)
    d = tree.raw_dir(date)
    os.makedirs(d, exist_ok=True)
    files = []
    for i in range(3):
        p = os.path.join(d, f"ML1_{date}_00000{i}.fits")
        write_observation(p, TINY, rng, "dark", "ML1",
                          mjd_start=mjd0 + i * 1e-3)
        files.append(p)
    pipe = Pipeline(tree, "ML1", s, _ctx(s))
    for p in files:
        r = pipe.process_file(p)
        assert r.status == "reduced", r.error
    mpath = pipe.masters.find("dark", date)
    assert mpath is not None
    from blackbox_tpu.io.rice import read_rice
    mdark, mh = read_rice(mpath)
    assert int(mh["NDARK"]) == 3
    assert "MDMEAN" in mh


def test_radecoff_wiring(tmp_path, rng):
    grid = {42: (150.0, -30.0)}
    pipe, p, tree = _one_science(tmp_path, rng,
                                 pipe_kw={"field_grid": grid})
    r = pipe.process_file(p, trans_extract=False)
    assert r.status == "reduced", r.error
    assert "RADECOFF" in r.header
    assert float(r.header["RADECOFF"]) < 5.0     # arcmin


def test_zp_default_fallback(tmp_path, rng):
    # no ref catalog -> no photometric calibration; LIMMAG still comes
    # from the per-filter default zeropoint
    pipe, p, tree = _one_science(tmp_path, rng)
    r = pipe.process_file(p, trans_extract=False)
    assert r.status == "reduced", r.error
    assert r.header.get("PC-ZPDEF") is True
    assert "LIMMAG" in r.header


def test_apphot_radii_plumbed():
    s = ReductionSettings(geometry=TINY, apphot_radii=[1.0, 2.0])
    ctx = ReduceContext.from_settings(s, "ML1")
    assert ctx.apphot_radii == (3.0, 6.0)


def test_bkg_nsigma_plumbed():
    s = ReductionSettings(geometry=TINY, bkg_nsigma=2.5)
    ctx = ReduceContext.from_settings(s, "ML1")
    assert ctx.bkg_nsigma == 2.5


def test_sat_bin_plumbed():
    s = ReductionSettings(geometry=TINY, sat_bin=8)
    ctx = ReduceContext.from_settings(s, "ML1")
    assert ctx.sat_params.bin_factor == 8


def test_masterstore_vetting(tmp_path, rng):
    # a red-flagged flat and an evening flat are excluded from the
    # master; dither keywords stamped (reference blackbox.py:4733-4789,
    # 5027-5055)
    from blackbox_tpu.orchestration.masterstore import (
        MasterPolicy, MasterStore)
    tree = DataTree(str(tmp_path), "ML1")
    date = "20260401"
    rdir = tree.red_dir(date, "flat")
    os.makedirs(rdir, exist_ok=True)
    from blackbox_tpu.io.rice import write_rice
    H, W = TINY.red_shape
    base_mjd = 60771.95          # UT frac 0.95 -> evening... choose
    # morning flats: UT frac ~0.2
    for i in range(4):
        h = Header()
        h["IMAGETYP"] = "flat"
        h["FILTER"] = "q"
        h["EXPTIME"] = 3.0
        h["MJD-OBS"] = 60771.20 + i * 1e-3
        h["RA"] = 150.0 + i * 20.0 / 3600.0     # ~20" dithers
        h["DEC"] = -30.0
        h["QC-FLAG"] = "green"
        img = rng.normal(20000.0, 50.0, (H, W)).astype(np.float32)
        write_rice(os.path.join(rdir, f"ML1_f{i}_red.fits.fz"), img, h)
    # one red-flagged flat
    h = Header()
    h["IMAGETYP"] = "flat"; h["FILTER"] = "q"; h["EXPTIME"] = 3.0
    h["MJD-OBS"] = 60771.21; h["RA"] = 150.0; h["DEC"] = -30.0
    h["QC-FLAG"] = "red"
    write_rice(os.path.join(rdir, "ML1_fred_red.fits.fz"),
               rng.normal(99999.0, 50.0, (H, W)).astype(np.float32), h)
    # one evening flat (UT frac 0.7)
    h = Header()
    h["IMAGETYP"] = "flat"; h["FILTER"] = "q"; h["EXPTIME"] = 3.0
    h["MJD-OBS"] = 60771.70; h["RA"] = 150.0; h["DEC"] = -30.0
    h["QC-FLAG"] = "green"
    write_rice(os.path.join(rdir, "ML1_feve_red.fits.fz"),
               rng.normal(99999.0, 50.0, (H, W)).astype(np.float32), h)

    store = MasterStore(tree, "ML1",
                        MasterPolicy(flat_reject_eve=True, ncal_min=3))
    cals = store.individual_cals("flat", date, filt="q")
    names = [os.path.basename(p) for p, _ in cals]
    assert "ML1_fred_red.fits.fz" not in names
    assert "ML1_feve_red.fits.fz" not in names
    assert len(names) == 4

    data, mh = store.ensure_master("flat", date, TINY, filt="q")
    assert data is not None
    assert mh["FLATDITH"] is True
    assert int(mh["N-OFFSET"]) >= 3


def test_verify_header_blocks_shipping(tmp_path, rng, monkeypatch):
    # a product violating the required-keyword contract must NOT ship
    # (reference blackbox.py:2573-2574 raises before copy_files2keep)
    import blackbox_tpu.pipeline.driver as drv
    pipe, p, tree = _one_science(tmp_path, rng)
    real_qc = drv.run_qc_check

    def sabotage(h, *a, **kw):
        out = real_qc(h, *a, **kw)
        if kw.get("check_key_type") == "full":
            del h["NOBJECTS"]          # required by the contract
        return out

    monkeypatch.setattr(drv, "run_qc_check", sabotage)
    r = pipe.process_file(p, trans_extract=False)
    assert r.status == "error"
    assert "contract" in (r.error or "")
    # no catalog product shipped
    import glob
    assert not glob.glob(str(tmp_path) + "/**/*_red_cat.fits",
                         recursive=True)


@pytest.mark.slow
def test_granular_resume_reuses_published_red(tmp_path, rng):
    # frame missing only its catalog must NOT recalibrate from raw
    # (reference skip logic blackbox.py:2096-2190)
    pipe, p, tree = _one_science(tmp_path, rng)
    r1 = pipe.process_file(p, trans_extract=False)
    assert r1.status == "reduced", r1.error
    cat = [x for x in r1.products if x.endswith("_red_cat.fits")]
    assert cat
    os.remove(cat[0])
    r2 = pipe.process_file(p, trans_extract=False)
    assert r2.status == "reduced", r2.error
    assert r2.header.get("RED-REUSED") is True
    assert os.path.exists(cat[0])
    # this frame is red-flagged (no master flat in the bare tree), so
    # its dummy catalog keeps forcing re-extraction (reference
    # is_dumcat semantics) — but always through the reuse path
    r3 = pipe.process_file(p, trans_extract=False)
    assert r3.header.get("RED-REUSED") is True


def test_create_master_gate(tmp_path, rng):
    # create_master=False: the store is lookup-only and must NOT build
    from blackbox_tpu.io.rice import write_rice
    from blackbox_tpu.orchestration.masterstore import (MasterPolicy,
                                                        MasterStore)
    tree = DataTree(str(tmp_path), "ML1")
    rdir = tree.red_dir("20260401", "bias")
    os.makedirs(rdir, exist_ok=True)
    H, W = TINY.red_shape
    for i in range(4):
        h = Header(); h["IMAGETYP"] = "bias"; h["QC-FLAG"] = "green"
        h["MJD-OBS"] = 61131.2 + i * 1e-3
        write_rice(os.path.join(rdir, f"ML1_b{i}_red.fits.fz"),
                   rng.normal(0, 5, (H, W)).astype(np.float32), h)
    off = MasterStore(tree, "ML1", MasterPolicy(create=False))
    data, _ = off.ensure_master("bias", "20260401", TINY)
    assert data is None
    on = MasterStore(tree, "ML1", MasterPolicy(create=True))
    data, _ = on.ensure_master("bias", "20260401", TINY)
    assert data is not None


@pytest.mark.slow
def test_create_ref_adopts_frame(tmp_path, rng):
    # no reference for the field + create_ref=True: the first green
    # frame becomes the field reference (blackbox.py:2330-2345), and
    # the next frame runs transient extraction against it
    from blackbox_tpu.synth.observation import night_of_observations
    from tests.test_driver import (PIXSCALE as REAL_PIXSCALE, RA0, DEC0,
                                   _ref_catalog_from_truth)
    s = ReductionSettings(geometry=TINY, pixscale=REAL_PIXSCALE,
                          create_ref=True)
    files, truths, tree = night_of_observations(
        str(tmp_path), TINY, rng, date="20260401", nbias=3, nflat=3,
        nsci=2, nstars=45, ncosmics=2, trail=False, nsat=0,
        sky_e=300.0, ra_deg=RA0, dec_deg=DEC0)

    class T:
        stars = np.concatenate([t.stars for t in truths[-2:]])
    pipe = Pipeline(tree, "ML1", s, _ctx(s),
                    ref_catalog=_ref_catalog_from_truth(T))
    results = [pipe.process_file(f) for f in files]
    sci = [r for r in results
           if str(r.header.get("IMAGETYP")) == "object"]
    assert all(r.status == "reduced" for r in sci)
    assert sci[0].header.get("REF-NEW") is True
    import glob
    refs = glob.glob(str(tmp_path) + "/**/ref/**/*_red.fits.fz",
                     recursive=True)
    assert refs
    # second frame subtracts against the adopted reference
    assert "T-NTRANS" in sci[1].header or \
        sci[1].header.get("TQC-FLAG") is not None


def test_cal_dir_resolves_relative_paths(tmp_path, rng):
    H, W = TINY.red_shape
    bpm = np.zeros((H, W), np.uint8)
    bpm[7, 9] = maskbits.BAD
    caldir = tmp_path / "CalFiles"
    os.makedirs(caldir, exist_ok=True)
    write_image(str(caldir / "bpm_q.fits"), bpm, Header())
    s = ReductionSettings(geometry=TINY, pixscale=PIXSCALE,
                          cal_dir=str(caldir),
                          bad_pixel_mask={"q": "bpm_q.fits"})
    pipe, p, tree = _one_science(tmp_path, rng, settings=s)
    b = pipe._load_bpm("q")
    assert b is not None and b.sum() == maskbits.BAD


def test_size_vignet_plumbed():
    s = ReductionSettings(geometry=TINY, size_vignet=15)
    ctx = ReduceContext.from_settings(s, "ML1")
    assert ctx.psf_params.size == 15
    # capped at the design stamp (and kept odd)
    s2 = ReductionSettings(geometry=TINY, size_vignet=99)
    assert ReduceContext.from_settings(s2, "ML1").psf_params.size == 25


def test_nonlin_spline_converter_roundtrip(tmp_path):
    """Reference-format pickled splines -> poly coeffs: |dcorrection|
    < 1e-4 over 0-50k ADU, and the driver loads .pkl files directly."""
    import pickle

    from scipy.interpolate import UnivariateSpline

    from blackbox_tpu.ops.nonlin import (convert_reference_splines,
                                         convert_reference_splines_to_npy)

    # synthetic per-channel correction curves shaped like detector
    # nonlinearity: smooth, ~1% scale, zero-ish at low ADU
    C = TINY.n_chan
    adu_k = np.linspace(0.0, 50000.0, 200)
    rng2 = np.random.default_rng(11)
    splines = []
    for c in range(C):
        a = 0.004 + 0.006 * rng2.uniform()
        frac = (a * (adu_k / 5e4) ** 2 - 0.5 * a * (adu_k / 5e4) ** 3
                + 0.001 * np.sin(adu_k / 5e4 * 3.0 + c))
        splines.append(UnivariateSpline(adu_k, frac, k=3, s=0))
    pkl = tmp_path / "nonlin_splines_20200501.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(splines, f)

    coeffs, err = convert_reference_splines(str(pkl))
    assert coeffs.shape[0] == C
    assert err < 1e-4

    # evaluate the device poly against the pickled spline: the
    # CORRECTION (frac) must round-trip below the 1e-4 parity budget
    import jax.numpy as jnp
    from blackbox_tpu.ops.polyfit import polyval_norm
    adu = np.linspace(0.0, 50000.0, 3000)
    got = np.asarray(polyval_norm(jnp.asarray(coeffs),
                                  jnp.asarray(np.tile(adu, (C, 1)),
                                              jnp.float32),
                                  0.0, 50000.0))
    want = np.stack([s(adu) for s in splines])
    assert np.max(np.abs(got - want)) < 1e-4

    # file converter + driver .pkl ingestion path
    npy = tmp_path / "nonlin.npy"
    convert_reference_splines_to_npy(str(pkl), str(npy))
    assert np.load(npy).shape == coeffs.shape

    s1 = ReductionSettings(geometry=TINY, pixscale=PIXSCALE,
                           correct_nonlin=True,
                           nonlin_corr_file=str(pkl))
    pipe = Pipeline(DataTree(str(tmp_path), "ML1"), "ML1", s1,
                    _ctx(s1, correct_nonlin=True))
    assert pipe.nonlin_coeffs is not None
    assert pipe.nonlin_coeffs.shape[0] == C

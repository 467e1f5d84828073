import os

import numpy as np
import pytest

from blackbox_tpu.astro.wcs import TanWCS
from blackbox_tpu.config.defaults import ReductionSettings
from blackbox_tpu.core.geometry import TINY
from blackbox_tpu.io.fits import read_fits
from blackbox_tpu.io.rice import read_rice
from blackbox_tpu.ops.cosmics import LACosmicParams
from blackbox_tpu.ops.detection import DetectParams
from blackbox_tpu.ops.satdet import SatDetParams
from blackbox_tpu.orchestration.paths import DataTree, night_date
from blackbox_tpu.pipeline.driver import Pipeline
from blackbox_tpu.pipeline.reduce import ReduceContext
from blackbox_tpu.synth.observation import night_of_observations


PIXSCALE = 0.5642
RA0, DEC0 = 150.0, -30.0
ZP_TRUE = 25.0


def _ctx(s):
    return ReduceContext.from_settings(
        s, "ML1",
        lac_params=LACosmicParams(sigclip=10.0, strip_rows=66),
        det_params=DetectParams(nsigma=1.5, max_sources=512,
                                label_iters=24),
        sat_params=SatDetParams(bin_factor=2, nsigma=8.0,
                                trail_halfwidth=4),
        bkg_boxsize=33, apphot_radii=(2.0, 4.5, 9.0))


@pytest.fixture(scope="module")
def night(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    rng = np.random.default_rng(11)
    files, truths, tree = night_of_observations(
        root, TINY, rng, date="20260301", nbias=3, nflat=3, nsci=1,
        nstars=40, ncosmics=10, trail=False, nsat=0, sky_e=300.0,
        ra_deg=RA0, dec_deg=DEC0)
    return root, files, truths, tree


def _ref_catalog_from_truth(truth):
    """Truth stars -> sky catalog through the frame's nominal WCS."""
    wcs_true = TanWCS.simple(RA0, DEC0, PIXSCALE, TINY.red_shape)
    x, y, flux = truth.stars[:, 0], truth.stars[:, 1], truth.stars[:, 2]
    ra, dec = wcs_true.pix2sky(x, y)
    mag = ZP_TRUE - 2.5 * np.log10(flux / 60.0)

    def query(ra0, dec0, radius):
        return {"ra": ra, "dec": dec, "mag": mag}
    return query


@pytest.fixture(scope="module")
def pipe(night):
    root, files, truths, tree = night
    s = ReductionSettings(geometry=TINY, pixscale=PIXSCALE)
    sci_truth = truths[-1]
    return Pipeline(tree, "ML1", s, _ctx(s),
                    ref_catalog=_ref_catalog_from_truth(sci_truth))


@pytest.fixture(scope="module")
def reduced_night(night, pipe):
    root, files, truths, tree = night
    results = [pipe.process_file(f) for f in files]
    return results


def test_cal_frames_published(night, reduced_night):
    root, files, truths, tree = night
    res = reduced_night
    assert all(r.status == "reduced" for r in res[:6]), \
        [(r.status, r.error) for r in res[:6]]
    date = "20260301"
    bias_dir = tree.red_dir(date, "bias")
    flat_dir = tree.red_dir(date, "flat")
    assert len([f for f in os.listdir(bias_dir)
                if f.endswith("_red.fits.fz")]) == 3
    assert len([f for f in os.listdir(flat_dir)
                if f.endswith("_red.fits.fz")]) == 3


def test_master_flat_built(night, reduced_night, pipe):
    root, files, truths, tree = night
    mflat_path = pipe.masters.find("flat", "20260301", filt="q")
    assert mflat_path is not None
    mflat, mh = read_rice(mflat_path)
    # unit-normalised flat
    assert abs(np.median(mflat) - 1.0) < 0.05
    assert mh["NUSED"] == 3


def test_science_products(night, reduced_night):
    root, files, truths, tree = night
    r = reduced_night[-1]
    assert r.status == "reduced", r.error
    assert r.qc_flag in ("green", "yellow", "orange"), r.qc_flag
    names = [os.path.basename(p) for p in r.products]
    assert any(n.endswith("_red.fits.fz") for n in names)
    assert any(n.endswith("_mask.fits.fz") for n in names)
    assert any(n.endswith("_red_cat.fits") for n in names)
    assert any(n.endswith("_psf.fits") for n in names)

    h = r.header
    # astrometric solve against the synthetic reference catalog
    assert bool(h["A-P"]) is True
    assert float(h["A-RMS"]) < 1.0          # arcsec (moment centroids)
    # photometric calibration recovers the true zeropoint up to the
    # PSF-flux aperture convention (stamp-truncated Moffat wings are
    # absorbed into the zeropoint, as with PSFEx in the reference);
    # absolute mmag consistency is asserted in
    # test_photometric_accuracy_vs_truth
    assert abs(float(h["PC-ZP"]) - ZP_TRUE) < 0.25
    assert "LIMMAG" in h

    # catalog has rows with sane magnitudes
    cat_p = [p for p in r.products if p.endswith("_red_cat.fits")][0]
    cols = next(d for d, hh in read_fits(cat_p) if isinstance(d, dict))
    assert len(cols["RA"]) >= 25
    mags = cols["MAG_OPT"]
    assert (mags[mags < 90] > 10).all() and (mags[mags < 90] < 25).all()


def test_photometric_accuracy_vs_truth(night, reduced_night):
    """Calibrated magnitudes match injected star magnitudes (mmag-class
    median over bright stars — BASELINE.md's accuracy north star)."""
    root, files, truths, tree = night
    truth = truths[-1]
    r = reduced_night[-1]
    cat_p = [p for p in r.products if p.endswith("_red_cat.fits")][0]
    cols = next(d for d, hh in read_fits(cat_p) if isinstance(d, dict))

    wcs_true = TanWCS.simple(RA0, DEC0, PIXSCALE, TINY.red_shape)
    tx, ty, tflux = (truth.stars[:, 0], truth.stars[:, 1],
                     truth.stars[:, 2])
    tmag = ZP_TRUE - 2.5 * np.log10(tflux / 60.0)

    x = cols["X_POS"] - 1
    y = cols["Y_POS"] - 1
    # isolated bright stars only: the TINY test field is ~100x denser
    # than a real frame, and blended neighbours contaminate PSF stamps
    # (a scene property, not a pipeline error)
    dmags = []
    for k, (xi, yi, mi) in enumerate(zip(tx, ty, tmag)):
        dn = np.hypot(tx - xi, ty - yi)
        dn[k] = np.inf
        if dn.min() < 12.0:
            continue
        d = np.hypot(x - xi, y - yi)
        j = int(np.argmin(d))
        if d[j] < 1.0 and mi < 18.5:
            dmags.append(cols["MAG_OPT"][j] - mi)
    assert len(dmags) >= 5
    # the absolute offset is a flux-convention constant (PSF-stamp
    # normalisation + crowding), absorbed into the zeropoint exactly as
    # PSFEx/zogy absorb theirs; what must hold to mmag-class is the
    # star-to-star consistency of the calibrated magnitudes
    assert abs(np.median(dmags)) < 0.05, np.median(dmags)
    spread = np.percentile(np.abs(dmags - np.median(dmags)), 80)
    assert spread < 0.03, (np.median(dmags), spread)


def test_skip_on_reprocess(night, pipe, reduced_night):
    root, files, truths, tree = night
    r2 = pipe.process_file(files[0])            # a bias, already done
    assert r2.status == "skipped"
    r3 = pipe.process_file(files[-1], trans_extract=False)
    assert r3.status == "skipped"


def test_rejected_header(night, pipe, tmp_path):
    from blackbox_tpu.io.fits import Header, write_image
    bad = str(tmp_path / "bad.fits")
    write_image(bad, np.zeros((8, 8), np.uint16), Header())
    r = pipe.process_file(bad)
    assert r.status == "rejected"
    assert "missing required keyword" in r.error


def test_img_reduce_only_and_resume(tmp_path):
    """cat_extract=False publishes image products but NO catalog; a
    later cat_extract resume writes the catalog WITHOUT re-encoding the
    published pixel products (re-quantisation would compound)."""
    root = str(tmp_path)
    rng = np.random.default_rng(33)
    files, truths, tree = night_of_observations(
        root, TINY, rng, date="20260310", nbias=3, nflat=3, nsci=1,
        nstars=30, ncosmics=4, trail=False, nsat=0, sky_e=300.0,
        ra_deg=RA0, dec_deg=DEC0)
    s = ReductionSettings(geometry=TINY, pixscale=PIXSCALE)
    pipe = Pipeline(tree, "ML1", s, _ctx(s),
                    ref_catalog=_ref_catalog_from_truth(truths[-1]),
                    subtract_refs=False)
    for f in files[:-1]:
        pipe.process_file(f)

    r = pipe.process_file(files[-1], cat_extract=False,
                          trans_extract=False)
    assert r.status == "reduced", r.error
    assert not any(p.endswith("_red_cat.fits") for p in r.products)
    rdir = tree.red_dir("20260310", "object")
    base = os.path.basename(files[-1])[:-len(".fits")]
    red = os.path.join(rdir, base + "_red.fits.fz")
    cat = os.path.join(rdir, base + "_red_cat.fits")
    assert os.path.exists(red)
    assert not os.path.exists(cat)
    red_bytes = open(red, "rb").read()

    r2 = pipe.process_file(files[-1], trans_extract=False)
    assert r2.status == "reduced", r2.error
    assert os.path.exists(cat)
    assert bool(r2.header.get("RED-REUSED"))
    # published pixels untouched byte for byte
    assert open(red, "rb").read() == red_bytes


def test_partial_trail_segments_e2e(tmp_path):
    """detect_sat_segments=True drives the tiled segment detector
    through Pipeline.process_file: the partial streak is masked
    SATELLITE end to end, and the cross-tile NMS (seeded with the
    full-frame detections) keeps NSATS a physical count — the SAME
    trail seen by the full-frame pass and by several overlapping tiles
    still counts exactly once (ops/satdet.py::detect_trail_segments;
    reference ASTA regime blackbox.py:4112-4117)."""
    from blackbox_tpu.core import maskbits

    root = str(tmp_path)
    rng = np.random.default_rng(41)
    files, truths, tree = night_of_observations(
        root, TINY, rng, date="20260315", nbias=3, nflat=3, nsci=1,
        nstars=40, ncosmics=5, trail=True, trail_frac=0.3, nsat=0,
        sky_e=300.0, ra_deg=RA0, dec_deg=DEC0)
    s = ReductionSettings(geometry=TINY, pixscale=PIXSCALE,
                          detect_sat_segments=True)
    pipe = Pipeline(tree, "ML1", s, _ctx(s),
                    ref_catalog=_ref_catalog_from_truth(truths[-1]),
                    subtract_refs=False)
    for f in files[:-1]:
        pipe.process_file(f)
    r = pipe.process_file(files[-1], trans_extract=False)
    assert r.status == "reduced", r.error
    assert pipe.ctx.detect_sat_segments        # settings threaded through

    # exactly ONE physical trail: the full-frame detection seeds the
    # tiled pass's NMS, so tile echoes add nothing to the count
    assert int(r.header["NSATS"]) == 1

    # the streak is masked SATELLITE along its true path
    mask_p = [p for p in r.products if p.endswith("_mask.fits.fz")][0]
    m, _ = read_rice(mask_p)
    m = np.asarray(m).astype(np.int32)
    x0, y0, x1, y1, _ = truths[-1].trail
    ts = np.linspace(0.05, 0.95, 100)
    xs = np.clip((x0 + ts * (x1 - x0)).astype(int), 0, m.shape[1] - 1)
    ys = np.clip((y0 + ts * (y1 - y0)).astype(int), 0, m.shape[0] - 1)
    cov = ((m[ys, xs] & maskbits.SATELLITE) > 0).mean()
    assert cov > 0.9, cov


def test_red_master_not_applied(tmp_path):
    """A night whose own master grades red is never applied: readers
    fall back to the nearest non-red master (reference
    get_nearest_master semantics), and the red master is not rebuilt."""
    from blackbox_tpu.io.fits import Header
    from blackbox_tpu.io.rice import write_rice
    from blackbox_tpu.orchestration.masterstore import MasterStore
    from blackbox_tpu.orchestration.paths import DataTree

    tree = DataTree(str(tmp_path), "ML1")
    store = MasterStore(tree, "ML1")
    C = TINY.red_shape
    img_red = np.full(C, 5.0, np.float32)
    img_green = np.full(C, 7.0, np.float32)

    hr = Header(); hr["QC-FLAG"] = "red"
    pr = store.master_path("bias", "20260310")
    os.makedirs(os.path.dirname(pr), exist_ok=True)
    write_rice(pr, img_red, hr, qlevel=32.0)
    hg = Header(); hg["QC-FLAG"] = "green"
    pg = store.master_path("bias", "20260309")
    write_rice(pg, img_green, hg, qlevel=32.0)

    data, h = store.ensure_master("bias", "20260310", TINY)
    assert h is not None
    assert str(h.get("QC-FLAG")).strip() == "green"
    assert "20260309" in str(h.get("MASTERF"))
    assert abs(float(np.asarray(data).mean()) - 7.0) < 0.1

    # without any non-red fallback the master is simply NOT applied —
    # reference get_nearest_master (blackbox.py:5291-5398) returns None
    # rather than silently using a red-flagged calibration product
    os.remove(pg)
    store2 = MasterStore(tree, "ML1")
    data2, h2 = store2.ensure_master("bias", "20260310", TINY)
    assert data2 is None and h2 is None
    # ... and the red master itself was not rebuilt
    from blackbox_tpu.io.rice import read_rice
    assert str(read_rice(pr)[1].get("QC-FLAG")).strip() == "red"

"""Full transient chain through the driver: night -> reference co-add ->
new epoch with an injected transient -> ZOGY -> vetted, ML-scored,
SSO-matched catalog.  The closest thing to the reference's production
night, end to end."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from blackbox_tpu.config.defaults import ReductionSettings
from blackbox_tpu.core.geometry import TINY
from blackbox_tpu.io.fits import read_fits
from blackbox_tpu.pipeline.buildref import BuildRefSettings, build_reference
from blackbox_tpu.pipeline.driver import Pipeline
from blackbox_tpu.synth.observation import night_of_observations, \
    write_observation
from blackbox_tpu.astro.time import iso2mjd, mjd2iso
from tests.test_driver import _ctx, PIXSCALE, RA0, DEC0, \
    _ref_catalog_from_truth


@pytest.mark.slow
def test_transient_end_to_end(tmp_path):
    root = str(tmp_path)
    rng = np.random.default_rng(77)
    files, truths, tree = night_of_observations(
        root, TINY, rng, date="20260501", nbias=3, nflat=3, nsci=3,
        nstars=25, ncosmics=4, trail=False, nsat=0, sky_e=300.0,
        ra_deg=RA0, dec_deg=DEC0)
    shared_stars = truths[-1].stars
    shared_flat = truths[-1].flat

    class T:
        stars = shared_stars
    s = ReductionSettings(geometry=TINY, pixscale=PIXSCALE)
    ctx = _ctx(s)
    from blackbox_tpu.models.vetnet import train
    vet = train(steps=250, batch=24, seed=5, log_every=0)
    pipe = Pipeline(tree, "ML1", s, ctx,
                    ref_catalog=_ref_catalog_from_truth(T),
                    vetnet_params=vet)
    for f in files:
        r = pipe.process_file(f, trans_extract=False)
        assert r.status == "reduced", (f, r.error)

    st, info = build_reference(
        tree, "ML1", 42, "q",
        BuildRefSettings(nimages_min=2, limmag_target=30.0,
                         seeing_max=10.0), extract_ctx=ctx)
    assert st == "published", (st, info)

    # a new epoch of the same field with one extra source (the transient)
    tx, ty, tf = 221.3, 71.2, 4.0e4
    stars4 = np.concatenate(
        [shared_stars, [[tx, ty, tf, 3.0]]], axis=0)
    mjd4 = iso2mjd("2026-05-02T23:30:00.000")
    raw4 = os.path.join(tree.raw_dir("20260502"),
                        "ML1_20260502_233000.fits")
    truth4, _ = write_observation(
        raw4, TINY, rng, "object", mjd_start=mjd4, nstars=0,
        ncosmics=4, trail=False, nsat=0, sky_e=300.0, ra_deg=RA0,
        dec_deg=DEC0, stars=stars4, flat=shared_flat)

    r = pipe.process_file(raw4)
    assert r.status == "reduced", r.error
    h = r.header
    assert bool(h.get("TRANS-P")), dict(h.items()) and "TRANS-P"
    assert int(h.get("T-NTRANS", 0)) >= 1, h.get("T-NTRANS")

    tcat_p = [p for p in r.products if p.endswith("_red_trans.fits")]
    assert tcat_p, r.products
    cols = next(d for d, hh in read_fits(tcat_p[0])
                if isinstance(d, dict))
    x = np.asarray(cols["X_PEAK"]) - 1
    y = np.asarray(cols["Y_PEAK"]) - 1
    d = np.hypot(x - tx, y - ty)
    i = int(np.argmin(d))
    assert d[i] < 2.0, d.min()
    # flux at the right scale (precision is asserted in the controlled
    # test_zogy/test_subtract scenes; this crowded field leaves star
    # residuals that contaminate the matched-filter flux at the ~25%
    # level, as they do for the reference's ZOGY on dense fields)
    fp = float(np.asarray(cols["E_FLUX_ZOGY"])[i])
    assert 0.6 * tf < fp < 1.6 * tf, (fp, tf)
    assert "CLASS_REAL" in cols
    assert float(np.asarray(cols["CLASS_REAL"])[i]) > 0.5
    # D and Scorr products published
    names = [os.path.basename(p) for p in r.products]
    assert any(n.endswith("_D.fits.fz") for n in names)
    assert any(n.endswith("_Scorr.fits.fz") for n in names)


def test_transient_end_to_end_fast(tmp_path):
    """Default-suite variant of the full raw->transient-catalog story
    (VERDICT r3 item 4): a trimmed night (2 cal frames each, 2 science
    visits, 15 stars), no ML vetting net, same pipeline path.  The
    thorough version above stays behind --runslow."""
    root = str(tmp_path)
    rng = np.random.default_rng(177)
    files, truths, tree = night_of_observations(
        root, TINY, rng, date="20260501", nbias=3, nflat=3, nsci=2,
        nstars=15, ncosmics=2, trail=False, nsat=0, sky_e=300.0,
        ra_deg=RA0, dec_deg=DEC0)
    shared_stars = truths[-1].stars
    shared_flat = truths[-1].flat

    class T:
        stars = shared_stars
    s = ReductionSettings(geometry=TINY, pixscale=PIXSCALE)
    ctx = _ctx(s)
    pipe = Pipeline(tree, "ML1", s, ctx,
                    ref_catalog=_ref_catalog_from_truth(T))
    for f in files:
        r = pipe.process_file(f, trans_extract=False)
        assert r.status == "reduced", (f, r.error)

    st, info = build_reference(
        tree, "ML1", 42, "q",
        BuildRefSettings(nimages_min=2, limmag_target=30.0,
                         seeing_max=10.0), extract_ctx=ctx)
    assert st == "published", (st, info)

    tx, ty, tf = 221.3, 71.2, 4.0e4
    stars3 = np.concatenate(
        [shared_stars, [[tx, ty, tf, 3.0]]], axis=0)
    mjd3 = iso2mjd("2026-05-02T23:30:00.000")
    raw3 = os.path.join(tree.raw_dir("20260502"),
                        "ML1_20260502_233000.fits")
    write_observation(
        raw3, TINY, rng, "object", mjd_start=mjd3, nstars=0,
        ncosmics=2, trail=False, nsat=0, sky_e=300.0, ra_deg=RA0,
        dec_deg=DEC0, stars=stars3, flat=shared_flat)

    r = pipe.process_file(raw3)
    assert r.status == "reduced", r.error
    h = r.header
    assert bool(h.get("TRANS-P")), "TRANS-P"
    assert int(h.get("T-NTRANS", 0)) >= 1, h.get("T-NTRANS")

    tcat_p = [p for p in r.products if p.endswith("_red_trans.fits")]
    assert tcat_p, r.products
    cols = next(d for d, hh in read_fits(tcat_p[0])
                if isinstance(d, dict))
    x = np.asarray(cols["X_PEAK"]) - 1
    y = np.asarray(cols["Y_PEAK"]) - 1
    d = np.hypot(x - tx, y - ty)
    assert d.min() < 2.0, d.min()
    names = [os.path.basename(p) for p in r.products]
    assert any(n.endswith("_D.fits.fz") for n in names)
    assert any(n.endswith("_Scorr.fits.fz") for n in names)

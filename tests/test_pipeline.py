import numpy as np
import jax.numpy as jnp
import pytest

from blackbox_tpu.core.geometry import TINY
from blackbox_tpu.core import maskbits
from blackbox_tpu.config.defaults import ReductionSettings, FLAT_NORM_SEC
from blackbox_tpu.pipeline.reduce import (
    ReduceContext, make_reduce_fn, calibrate_detector, extract_catalog)
from blackbox_tpu.pipeline.masters import master_bias, master_flat
from blackbox_tpu.ops.overscan import OverscanParams
from blackbox_tpu.ops.cosmics import LACosmicParams
from blackbox_tpu.ops.detection import DetectParams
from blackbox_tpu.ops.satdet import SatDetParams
from blackbox_tpu.synth import make_raw_science, make_raw_bias, make_raw_flat


def _ctx():
    s = ReductionSettings(geometry=TINY)
    return ReduceContext.from_settings(
        s, "ML1",
        lac_params=LACosmicParams(sigclip=10.0, strip_rows=66),
        det_params=DetectParams(nsigma=1.5, max_sources=512, label_iters=24),
        sat_params=SatDetParams(bin_factor=2, nsigma=8.0, trail_halfwidth=4),
        bkg_boxsize=33,
        apphot_radii=(2.0, 4.5, 9.0),
        detect_sats=True,
    )


@pytest.fixture(scope="module")
def reduced():
    rng = np.random.default_rng(7)
    geom = TINY
    ctx = _ctx()
    raw, truth = make_raw_science(geom, rng, nstars=40, ncosmics=12,
                                  trail=True, nsat=2, sky_e=300.0)
    chan, osv, osh = geom.split_raw(jnp.asarray(raw))
    fn = make_reduce_fn(ctx)
    # flat-field like production: the reference ALWAYS divides the
    # master flat before satellite detection (blackbox.py:1825 -> 1928)
    # — an uncorrected vignette is a genuine bright band the trail
    # detector rightly rejects as non-satellite structure, but its
    # gradients also red-flag the frame
    mflat = geom.disassemble(jnp.asarray(truth.flat))
    out = fn(chan, osv, osh, None, mflat, None, None)
    return ctx, truth, {k: np.asarray(v) if not isinstance(v, dict) else v
                        for k, v in out.items()}


def test_reduce_stats_sane(reduced):
    ctx, truth, out = reduced
    stats = {k: np.asarray(v) for k, v in out["stats"].items()}
    expect_rdn = truth.rdnoise_adu * truth.gain
    np.testing.assert_allclose(stats["rdn"], expect_rdn, rtol=0.25)
    assert stats["ncosmics"] >= 8
    assert stats["nsats"] >= 1
    assert stats["nobjects"] >= 30
    assert 1.5 < stats["s_seeing_pix"] < 5.0
    # sky background recovered (flat-field divides out vignetting)
    assert abs(stats["bkg_median"] / 300.0 - 1.0) < 0.25


def test_reduce_masks(reduced):
    ctx, truth, out = reduced
    mask = out["mask"]
    # saturated pixels flagged
    sat_frac = (mask[truth.satpix.astype(bool)] & maskbits.SATURATED) > 0
    assert sat_frac.mean() > 0.9
    # most injected cosmics flagged within 1 px
    H, W = mask.shape
    hit = 0
    for x, y, a in truth.cosmics:
        iy, ix = int(y), int(x)
        sl = mask[max(iy - 1, 0):iy + 2, max(ix - 1, 0):ix + 2]
        hit += int(((sl & maskbits.COSMIC) > 0).any())
    assert hit >= len(truth.cosmics) * 0.7


def test_reduce_photometry_accuracy(reduced):
    ctx, truth, out = reduced
    cat = {k: np.asarray(v) for k, v in out["cat"].items()}
    v = cat["valid"]
    xs, ys = cat["x"][v], cat["y"][v]
    flux = cat["flux_ap"][v][:, -1]

    matched, ratios = 0, []
    for x, y, f, _ in truth.stars:
        if f > 5e3 and f < 1e6:   # well-detected, unsaturated
            d = np.hypot(xs - x, ys - y)
            i = d.argmin()
            if d[i] < 1.0:
                matched += 1
                ratios.append(flux[i] / f)
    assert matched >= 10
    ratios = np.array(ratios)
    # aperture 9 px on Moffat beta=2.5 fwhm 3: ~93% enclosed; blends in
    # this deliberately crowded tiny field produce outliers, so judge the
    # bulk: median near unity and most stars within ~12%
    assert 0.85 < np.median(ratios) < 1.05
    assert np.mean(np.abs(ratios - np.median(ratios)) < 0.12) >= 0.6


def test_masters_roundtrip(rng):
    geom = TINY
    from blackbox_tpu.ops.gain import gain_correct
    from blackbox_tpu.ops.overscan import overscan_correct

    def calib(raw, truth):
        chan, osv, osh = geom.split_raw(jnp.asarray(raw))
        chan, osv, osh = gain_correct(chan, osv, osh,
                                      jnp.asarray(truth.gain))
        chan, _ = overscan_correct(chan, osv, osh)
        return chan

    biases = []
    for i in range(5):
        raw, truth = make_raw_bias(geom, rng)
        biases.append(calib(raw, truth))
    mb, bstats = master_bias(jnp.stack(biases))
    assert abs(float(jnp.mean(mb))) < 2.0   # bias structure removed

    flats = []
    flat_truth = None
    for i in range(5):
        raw, ftruth = make_raw_flat(geom, rng)
        flat_truth = ftruth
        flats.append(calib(raw, ftruth))
    norm_sec = (slice(20, 100), slice(40, 200))
    mf, fstats = master_flat(jnp.stack(flats), geom, norm_sec)
    mf = np.asarray(mf)
    # master flat is near-unity and positive
    assert mf.min() > 0
    assert abs(np.median(mf) - 1.0) < 0.1
    g = np.asarray(fstats["gaincf"])
    assert g.shape == (geom.n_chan,)
    np.testing.assert_allclose(g.mean(), 1.0, rtol=1e-5)

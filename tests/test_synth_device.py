"""Device-side synthetic frame generator (synth/device.py)."""

import pytest
import jax
import numpy as np

from blackbox_tpu.core.geometry import TINY
from blackbox_tpu.synth.device import make_science_device


def test_shapes_and_stats():
    geom = TINY
    key = jax.random.PRNGKey(0)
    chan, osv, osh, truth = make_science_device(
        key, geom, nstars=30, ncosmics=5, trail=True, nsat=1,
        sky_e=300.0)
    C = geom.n_chan
    assert chan.shape == (C, geom.ysize_chan, geom.xsize_chan)
    assert osv.shape == (C, geom.dy, geom.os_vert_width)
    assert osh.shape == (C, geom.os_hori_height, geom.dx)
    chan = np.asarray(chan)
    osv = np.asarray(osv)
    assert np.isfinite(chan).all() and np.isfinite(osv).all()
    # data sections sit on bias + sky/gain; overscans on bias only
    assert chan.mean() > osv.mean() + 50.0
    assert 6800 < osv.mean() < 8200
    assert len(truth["x"]) == 31                 # stars + saturating star


@pytest.mark.slow
def test_matches_pipeline_contract():
    """The generated stacks run through the reduce pipeline."""
    from blackbox_tpu.config.defaults import ReductionSettings
    from blackbox_tpu.pipeline.reduce import ReduceContext, \
        calibrate_detector
    from blackbox_tpu.ops.cosmics import LACosmicParams
    from blackbox_tpu.ops.detection import DetectParams
    from blackbox_tpu.ops.satdet import SatDetParams

    geom = TINY
    s = ReductionSettings(geometry=geom)
    ctx = ReduceContext.from_settings(
        s, "ML1",
        lac_params=LACosmicParams(sigclip=10.0, strip_rows=66),
        det_params=DetectParams(nsigma=1.5, max_sources=256,
                                label_iters=16),
        sat_params=SatDetParams(bin_factor=2),
        bkg_boxsize=33)
    chan, osv, osh, _ = make_science_device(
        jax.random.PRNGKey(1), geom, nstars=20, ncosmics=3, trail=False,
        nsat=0)
    sci, mask, stats = calibrate_detector(ctx, chan, osv, osh,
                                          None, None, None, None)
    assert sci.shape == geom.red_shape
    assert np.isfinite(np.asarray(sci)).all()
    # overscan-corrected science frame: background near sky/1 (e-)
    med = float(np.median(np.asarray(sci)))
    assert 100 < med < 600

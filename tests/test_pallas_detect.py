"""Parity of the fused Pallas detection pass vs the jnp chain."""

import numpy as np
import jax.numpy as jnp

from blackbox_tpu.ops.detection import (DetectParams, detect_segments,
                                        gaussian_taps, label_segments)
from blackbox_tpu.pallas.detect import fused_detect_pallas


def _scene(rng, H, W, nstars=60):
    img = rng.normal(0, 1.0, (H, W)).astype(np.float32)
    ys = rng.integers(5, H - 5, nstars)
    xs = rng.integers(5, W - 5, nstars)
    for y, x in zip(ys, xs):
        amp = rng.uniform(5, 200)
        for dy in range(-3, 4):
            for dx in range(-3, 4):
                img[y + dy, x + dx] += amp * np.exp(
                    -0.5 * (dy * dy + dx * dx) / 1.5)
    return img


def test_fused_detect_matches_jnp(rng):
    H, W = 600, 560
    img = _scene(rng, H, W)
    std = np.full((H, W), 1.0, np.float32)
    excl = np.zeros((H, W), bool)
    excl[50:60, 100:120] = True          # exclusion zone over sources
    p = DetectParams(label_iters=32)

    seg_ref, n_ref = detect_segments(jnp.asarray(img), jnp.asarray(std),
                                     jnp.asarray(excl), p,
                                     use_pallas=False)
    seg, n = fused_detect_pallas(jnp.asarray(img), jnp.asarray(std),
                                 jnp.asarray(excl),
                                 gaussian_taps(p.fwhm_filter),
                                 p.nsigma, iters=p.label_iters,
                                 interpret=True)
    assert int(n) == int(n_ref)
    np.testing.assert_array_equal(np.asarray(seg), np.asarray(seg_ref))


def test_fused_detect_border_sources(rng):
    """Sources hugging the original frame border: the zero-pad spill
    must not create out-of-bounds detections or alter counts."""
    H, W = 520, 530
    img = rng.normal(0, 1.0, (H, W)).astype(np.float32)
    # bright pixels directly on every border
    img[0, 10] = img[H - 1, 50] = img[77, 0] = img[200, W - 1] = 300.0
    img[0, 0] = img[H - 1, W - 1] = 300.0
    std = np.full((H, W), 1.0, np.float32)
    p = DetectParams(label_iters=32)

    seg_ref, n_ref = detect_segments(jnp.asarray(img), jnp.asarray(std),
                                     None, p, use_pallas=False)
    seg, n = fused_detect_pallas(jnp.asarray(img), jnp.asarray(std),
                                 None, gaussian_taps(p.fwhm_filter),
                                 p.nsigma, iters=p.label_iters,
                                 interpret=True)
    assert int(n) == int(n_ref)
    np.testing.assert_array_equal(np.asarray(seg), np.asarray(seg_ref))


def test_fused_detect_absval_no_filter(rng):
    """The transient variant: |x| > scalar threshold, no matched filter."""
    H, W = 560, 540
    sc = rng.normal(0, 1.0, (H, W)).astype(np.float32)
    sc[100:104, 200:204] = 9.0
    sc[300:303, 400:402] = -8.0          # negative transient
    bad = np.zeros((H, W), bool)
    bad[300:310, 395:410] = True         # masks the negative one

    det = (np.abs(sc) > 6.0) & ~bad
    seg_ref, n_ref = label_segments(jnp.asarray(det), 48)
    seg, n = fused_detect_pallas(jnp.asarray(sc), None,
                                 jnp.asarray(bad), None, 6.0,
                                 iters=48, absval=True, interpret=True)
    assert int(n) == int(n_ref) == 1
    np.testing.assert_array_equal(np.asarray(seg), np.asarray(seg_ref))

import numpy as np
import jax
import jax.numpy as jnp

from blackbox_tpu.core.geometry import TINY
from blackbox_tpu.core import maskbits
from blackbox_tpu.ops.gain import gain_correct
from blackbox_tpu.ops.overscan import overscan_correct, OverscanParams
from blackbox_tpu.ops.xtalk import xtalk_correct, coeff_quadrants
from blackbox_tpu.ops.masking import build_mask
from blackbox_tpu.synth import make_raw_bias, make_raw_science


def _calibrate_bias(raw, truth, geom):
    chan, osv, osh = geom.split_raw(jnp.asarray(raw))
    g = jnp.asarray(truth.gain)
    chan, osv, osh = gain_correct(chan, osv, osh, g)
    params = OverscanParams(mode="ML")
    out, stats = overscan_correct(chan, osv, osh, params=params)
    return np.asarray(out), {k: np.asarray(v) for k, v in stats.items()}


def test_overscan_removes_bias_structure(rng):
    geom = TINY
    raw, truth = make_raw_bias(geom, rng)
    out, stats = _calibrate_bias(raw, truth, geom)

    # corrected bias frame should be ~zero everywhere; TINY's strips are
    # 10 columns / 8 rows, so strip statistics alone allow a few e- offset
    assert abs(out.mean()) < 2.0
    chan_means = out.mean(axis=(1, 2))
    assert np.all(np.abs(chan_means) < 4.0)

    # BIASM ~ bias level in e- (bias_level + mean drift) per channel
    expect = truth.bias_level * truth.gain
    assert np.all(np.abs(stats["biasm"] - expect) < 20.0)

    # read noise in e- close to truth
    expect_rdn = truth.rdnoise_adu * truth.gain
    np.testing.assert_allclose(stats["rdn"], expect_rdn, rtol=0.2)

    assert np.isfinite(stats["biasmean"])
    assert stats["vfit_ok"].all()


def test_overscan_row_drift_removed(rng):
    geom = TINY
    raw, truth = make_raw_bias(geom, rng)
    out, _ = _calibrate_bias(raw, truth, geom)
    # residual row structure: std of row means should be ~rdnoise/sqrt(ncols)
    row_means = out.mean(axis=2)          # (C, ych)
    resid = row_means - row_means.mean(axis=1, keepdims=True)
    lim = 4.0 * (truth.rdnoise_adu * truth.gain).max() / \
        np.sqrt(geom.xsize_chan)
    assert resid.std() < lim + 0.5


def test_xtalk_roundtrip(rng):
    geom = TINY
    C = geom.n_chan
    clean = rng.normal(1000.0, 10.0, geom.chan_shape).astype(np.float32)
    clean = np.abs(clean)
    coeffs = (rng.random((C, C)) * 1e-3).astype(np.float32)
    np.fill_diagonal(coeffs, 0.0)

    # forward-apply crosstalk the way the physics does
    same, cross = coeff_quadrants(coeffs, geom.nx)
    corrupted = clean + (
        np.einsum("syx,sv->vyx", clean, same)
        + np.einsum("syx,sv->vyx", clean[:, ::-1, :], cross))

    fixed = np.asarray(xtalk_correct(jnp.asarray(corrupted), None,
                                     jnp.asarray(coeffs), geom.nx))
    # first-order correction: residual ~ coeffs^2 * signal ~ 1e-3
    np.testing.assert_allclose(fixed, clean, atol=0.5)


def test_build_mask_saturation(rng):
    geom = TINY
    C = geom.n_chan
    data = np.full(geom.chan_shape, 100.0, np.float32)
    satlevel_adu = np.full(C, 1000.0, np.float32)
    gains = np.ones(C, np.float32)
    biasm = jnp.zeros(C)

    # one saturated blob in channel 3
    data[3, 10:13, 5:8] = 2000.0
    # channels 5 AND 6 saturate the SAME pixel: both must still be
    # flagged as each other's victims (the "any OTHER channel" union
    # needs the seen-twice carry, not just the overall OR)
    data[5, 20, 30] = 2000.0
    data[6, 20, 30] = 2000.0
    # non-finite pixel in channel 0
    data[0, 2, 2] = np.nan

    out, mask, stats = build_mask(jnp.asarray(data), None,
                                  jnp.asarray(satlevel_adu),
                                  jnp.asarray(gains), biasm, nx=geom.nx,
                                  fill_iters=8)
    out, mask = np.asarray(out), np.asarray(mask)

    assert out[0, 2, 2] == 0.0
    assert mask[0, 2, 2] & maskbits.BAD
    assert (mask[3, 10:13, 5:8] & maskbits.SATURATED).all()
    # ring around the blob flagged saturated-connected
    assert mask[3, 9, 5] & maskbits.SAT_CONNECTED
    # crosstalk victims: same footprint in other channels
    assert (mask[4, 10:13, 5:8] & maskbits.CROSSTALK).all()
    # cross-row victims are y-flipped
    ych = geom.ysize_chan
    assert (mask[11, ych - 13:ych - 10, 5:8] & maskbits.CROSSTALK).all()
    # source channel not self-flagged as victim
    assert not (mask[3, 10:13, 5:8] & maskbits.CROSSTALK).any()
    # two same-row sources saturating the same pixel victimise each other
    assert mask[5, 20, 30] & maskbits.CROSSTALK
    assert mask[6, 20, 30] & maskbits.CROSSTALK
    assert float(stats["saturate"]) == 1000.0


def test_full_science_calibration_smoke(rng):
    geom = TINY
    raw, truth = make_raw_science(geom, rng, nstars=30, ncosmics=5,
                                  trail=False, nsat=1)
    chan, osv, osh = geom.split_raw(jnp.asarray(raw))
    chan, osv, osh = gain_correct(chan, osv, osh, jnp.asarray(truth.gain))
    chan, stats = overscan_correct(chan, osv, osh)
    assert np.isfinite(np.asarray(chan)).all()
    # sky level should survive calibration: median ~ sky * median(flat)
    med = float(jnp.median(chan))
    assert abs(med - truth.sky) / truth.sky < 0.15


def test_xtalk_mosaic_matches_stack(rng):
    """The mosaic-native block contraction must reproduce the
    channel-stack einsum on the assembled frame (same physics, no
    16-way disassemble/assemble)."""
    import jax
    from blackbox_tpu.core.geometry import MEERLICHT
    from blackbox_tpu.core import maskbits
    from blackbox_tpu.ops.xtalk import xtalk_correct_mosaic

    geom = MEERLICHT
    C, ych, xch = geom.n_chan, 24, 20
    data = jnp.asarray(rng.normal(1000.0, 10.0, (C, ych, xch)),
                       jnp.float32)
    mask = jnp.where(jnp.asarray(rng.uniform(size=(C, ych, xch)) < 0.05),
                     jnp.uint8(maskbits.COSMIC), jnp.uint8(0))
    mask = mask.at[0, :2, :].set(maskbits.EDGE)
    coeffs = rng.uniform(-2e-4, 2e-4, (C, C)).astype(np.float32)

    class G:          # 24x20-channel toy geometry, same ny/nx layout
        ny, nx = geom.ny, geom.nx
    mos = jnp.concatenate([
        jnp.concatenate([data[iy * G.nx + ix] for ix in range(G.nx)],
                        axis=1) for iy in range(G.ny)], axis=0)
    mmk = jnp.concatenate([
        jnp.concatenate([mask[iy * G.nx + ix] for ix in range(G.nx)],
                        axis=1) for iy in range(G.ny)], axis=0)
    ref = xtalk_correct(data, mask, coeffs, G.nx)
    ref_mos = jnp.concatenate([
        jnp.concatenate([ref[iy * G.nx + ix] for ix in range(G.nx)],
                        axis=1) for iy in range(G.ny)], axis=0)
    out = jax.jit(lambda d, m: xtalk_correct_mosaic(
        d, m, coeffs, G.ny, G.nx))(mos, mmk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_mos),
                               rtol=0, atol=2e-3)
    # and the maskless variant
    out0 = xtalk_correct_mosaic(mos, None, coeffs, G.ny, G.nx)
    ref0 = xtalk_correct(data, None, coeffs, G.nx)
    ref0_mos = np.concatenate([
        np.concatenate([np.asarray(ref0)[iy * G.nx + ix]
                        for ix in range(G.nx)], axis=1)
        for iy in range(G.ny)], axis=0)
    np.testing.assert_allclose(np.asarray(out0), ref0_mos,
                               rtol=0, atol=2e-3)


def test_xtalk_under_jit_with_mask(rng):
    """Regression: coefficients must be traceable (the driver jit-closes
    over them; np.asarray on a traced array raised)."""
    import jax
    C, ych, xch = 16, 24, 20
    data = jnp.asarray(rng.normal(1000.0, 10.0, (C, ych, xch)),
                       jnp.float32)
    mask = jnp.zeros((C, ych, xch), jnp.uint8)
    coeffs = rng.uniform(-2e-4, 2e-4, (C, C)).astype(np.float32)
    out = jax.jit(lambda d, m: xtalk_correct(d, m, coeffs, 8))(data, mask)
    ref = xtalk_correct(data, None, coeffs, 8)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-3)

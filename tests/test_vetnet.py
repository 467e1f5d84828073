import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blackbox_tpu.models.vetnet import (
    STAMP, VetNet, init_params, make_stamps, score_transients,
    synth_batch, train, save_params, load_params, _gauss)


def test_shapes_and_stamps(rng):
    params = init_params(jax.random.PRNGKey(0))
    H = W = 128
    imgs = [jnp.asarray(rng.normal(0, 1, (H, W)).astype(np.float32))
            for _ in range(4)]
    xs = jnp.asarray([20.0, 64.0, 120.0])
    ys = jnp.asarray([30.0, 64.0, 5.0])
    st = make_stamps(*imgs, xs, ys)
    assert st.shape == (3, STAMP, STAMP, 4)
    p = score_transients(params, *imgs, xs, ys)
    assert p.shape == (3,)
    assert ((0 <= np.asarray(p)) & (np.asarray(p) <= 1)).all()


def test_synth_batch_balance(rng):
    x, y = synth_batch(rng, 200)
    assert x.shape == (200, STAMP, STAMP, 4)
    assert 0.1 < y.mean() < 0.35        # ~1/5 real


@pytest.mark.slow
def test_train_separates_real_from_bogus(tmp_path, rng):
    params = train(steps=300, batch=32, seed=2, log_every=0)

    # build a clean eval scene: a real PSF transient and a cosmic spike
    H = W = 128
    fwhm = 3.0
    noise = lambda: rng.normal(0, 1, (H, W)).astype(np.float32)  # noqa
    ref = noise()
    new = ref + noise() * 0.0 + rng.normal(0, 1, (H, W)).astype(np.float32)
    D = noise(); S = noise()
    # real at (40, 40)
    src = _gauss(W, 40, 40, fwhm, 25).astype(np.float32)
    new = new + src; D = D + src; S = S + src / 25 * 12
    # cosmic at (90, 90)
    for img in (new, D, S):
        img[90, 90] += 120.0

    p = np.asarray(score_transients(
        params, jnp.asarray(new), jnp.asarray(ref), jnp.asarray(D),
        jnp.asarray(S), jnp.asarray([40.0, 90.0]),
        jnp.asarray([40.0, 90.0])))
    assert p[0] > 0.7, p          # real scored real
    assert p[1] < 0.3, p          # cosmic scored bogus

    pth = str(tmp_path / "vetnet.msgpack")
    save_params(pth, params)
    p2 = load_params(pth)
    p_again = np.asarray(score_transients(
        p2, jnp.asarray(new), jnp.asarray(ref), jnp.asarray(D),
        jnp.asarray(S), jnp.asarray([40.0]), jnp.asarray([40.0])))
    np.testing.assert_allclose(p_again[0], p[0], rtol=1e-6)

import numpy as np
import jax.numpy as jnp

from blackbox_tpu.ops import stats


def np_sigma_clip(x, sigma=3.0, iters=5, cenfunc="mean", axis=None,
                  mask=None):
    """Golden numpy implementation of iterative sigma clipping."""
    x = np.asarray(x, np.float64)
    m = np.zeros(x.shape, bool) if mask is None else mask.copy()
    m |= ~np.isfinite(x)
    for _ in range(iters):
        xm = np.ma.masked_array(x, m)
        center = (np.ma.median(xm, axis=axis) if cenfunc == "median"
                  else np.ma.mean(xm, axis=axis))
        std = np.ma.std(xm, axis=axis)
        if axis is not None:
            center = np.expand_dims(np.ma.filled(center, np.nan), axis)
            std = np.expand_dims(np.ma.filled(std, np.nan), axis)
        new = m | (x < center - sigma * std) | (x > center + sigma * std)
        stdv = np.broadcast_to(np.ma.filled(np.ma.masked_array(std), np.nan),
                               x.shape)
        keep_old = np.isnan(stdv) | (stdv == 0)
        m = np.where(keep_old, m, new)
    return m


def test_masked_mean_std(rng):
    x = rng.normal(10, 2, (8, 100)).astype(np.float32)
    mask = rng.random((8, 100)) < 0.3
    mean, std = stats.masked_mean_std(jnp.asarray(x), jnp.asarray(mask),
                                      axis=1, ddof=1)
    for i in range(8):
        xi = x[i][~mask[i]]
        np.testing.assert_allclose(mean[i], xi.mean(), rtol=1e-5)
        np.testing.assert_allclose(std[i], xi.std(ddof=1), rtol=1e-4)


def test_masked_median(rng):
    x = rng.normal(size=(6, 51)).astype(np.float32)
    mask = rng.random((6, 51)) < 0.4
    med = stats.masked_median(jnp.asarray(x), jnp.asarray(mask), axis=1)
    for i in range(6):
        np.testing.assert_allclose(med[i], np.median(x[i][~mask[i]]),
                                   rtol=1e-5)


def test_sigma_clip_matches_numpy(rng):
    x = rng.normal(100.0, 5.0, (4, 200)).astype(np.float32)
    # inject outliers
    x[:, ::17] += 300.0
    x[:, 3] -= 500.0
    got = np.asarray(stats.sigma_clip(jnp.asarray(x), axis=1, sigma=3.0,
                                      iters=5, cenfunc="mean"))
    want = np_sigma_clip(x, sigma=3.0, iters=5, cenfunc="mean", axis=1)
    np.testing.assert_array_equal(got, want)


def test_sigma_clipped_mean_recovers_center(rng):
    x = rng.normal(50.0, 3.0, 5000).astype(np.float32)
    x[::50] = 5000.0
    mean, std = stats.sigma_clipped_mean_std(jnp.asarray(x), sigma=3.0)
    assert abs(float(mean) - 50.0) < 0.2
    assert abs(float(std) - 3.0) < 0.2


def test_sorted_clipped_stats_matches_iterative(rng):
    """Single-sort interval clipping == iterative sigma_clip statistics."""
    import jax.numpy as jnp
    import numpy as np
    from blackbox_tpu.ops.stats import (
        sigma_clip, masked_median, masked_mean_std, sorted_clipped_stats)
    x = rng.normal(2000.0, 6.0, (7, 257)).astype(np.float32)
    x[:, :6] += rng.uniform(100, 900, (7, 6)).astype(np.float32)
    mask = rng.random((7, 257)) < 0.1
    mask[3] = True                      # an all-masked slice
    xj, mj = jnp.asarray(x), jnp.asarray(mask)

    clip = sigma_clip(xj, mask=mj, axis=-1, sigma=3.0, iters=3,
                      cenfunc="median")
    med_o = np.asarray(masked_median(xj, clip, axis=-1))
    mean_o, std_o = (np.asarray(a)
                     for a in masked_mean_std(xj, clip, axis=-1))
    med, mean, std, n = sorted_clipped_stats(xj, mj, sigma=3.0, iters=3)
    med, mean, std, n = (np.asarray(a) for a in (med, mean, std, n))

    assert np.isnan(med[3]) and np.isnan(med_o[3])
    ok = np.arange(7) != 3
    np.testing.assert_allclose(med[ok], med_o[ok], rtol=0, atol=1e-3)
    np.testing.assert_allclose(mean[ok], mean_o[ok], rtol=0, atol=2e-2)
    np.testing.assert_allclose(std[ok], std_o[ok], rtol=2e-3, atol=2e-2)
    assert (n[ok] == np.sum(~np.asarray(clip), -1)[ok]).all()

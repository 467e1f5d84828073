"""Parity of the Pallas DMA window gather vs direct slicing."""

import numpy as np
import jax.numpy as jnp

from blackbox_tpu.pallas.gather import gather_windows
from blackbox_tpu.ops.windows import gather_slot_windows


def _ref_windows(img, y0, x0, size):
    H, W = img.shape
    out = np.zeros((len(y0), size, size), img.dtype)
    for k, (y, x) in enumerate(zip(y0, x0)):
        y = min(max(int(y), 0), H - size)
        x = min(max(int(x), 0), W - size)
        out[k] = img[y:y + size, x:x + size]
    return out


def test_gather_windows_parity(rng):
    H, W = 300, 420
    img = rng.normal(size=(H, W)).astype(np.float32)
    seg = rng.integers(0, 9999, size=(H, W)).astype(np.int32)
    N = 37                                   # not a multiple of blk
    y0 = rng.integers(-5, H + 5, N)          # includes out-of-range
    x0 = rng.integers(-5, W + 5, N)
    for size in (25, 32):
        got_f, got_i = gather_windows(
            (jnp.asarray(img), jnp.asarray(seg)),
            jnp.asarray(y0, jnp.int32), jnp.asarray(x0, jnp.int32),
            size, interpret=True)
        np.testing.assert_array_equal(np.asarray(got_f),
                                      _ref_windows(img, y0, x0, size))
        np.testing.assert_array_equal(np.asarray(got_i),
                                      _ref_windows(seg, y0, x0, size))


def test_gather_windows_n_active_skips(rng):
    H, W = 200, 200
    img = rng.normal(size=(H, W)).astype(np.float32)
    N, size, blk = 64, 16, 8
    y0 = rng.integers(0, H - size, N)
    x0 = rng.integers(0, W - size, N)
    n_active = 19
    (got,) = gather_windows((jnp.asarray(img),),
                            jnp.asarray(y0, jnp.int32),
                            jnp.asarray(x0, jnp.int32),
                            size, n_active=jnp.int32(n_active),
                            interpret=True, blk=blk)
    ref = _ref_windows(img, y0, x0, size)
    got = np.asarray(got)
    # blocks whose start is before n_active are fully gathered
    live = (-(-n_active // blk)) * blk
    np.testing.assert_array_equal(got[:live], ref[:live])
    # blocks wholly past n_active are zeros
    assert np.all(got[live:] == 0)


def test_gather_slot_windows_fallback_matches(rng):
    """The non-TPU fallback path (vmapped dynamic_slice) is exact."""
    H, W = 150, 180
    img = rng.normal(size=(H, W)).astype(np.float32)
    sd = rng.uniform(1, 2, size=(H, W)).astype(np.float32)
    N, size = 21, 24
    y0 = jnp.asarray(rng.integers(0, H - size, N), jnp.int32)
    x0 = jnp.asarray(rng.integers(0, W - size, N), jnp.int32)
    a, b = gather_slot_windows((jnp.asarray(img), jnp.asarray(sd)),
                               y0, x0, size, use_pallas=False)
    np.testing.assert_array_equal(
        np.asarray(a), _ref_windows(img, np.asarray(y0), np.asarray(x0),
                                    size))
    np.testing.assert_array_equal(
        np.asarray(b), _ref_windows(sd, np.asarray(y0), np.asarray(x0),
                                    size))
    one = gather_slot_windows(jnp.asarray(img), y0, x0, size,
                              use_pallas=False)
    np.testing.assert_array_equal(np.asarray(one), np.asarray(a))

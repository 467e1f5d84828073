"""Parity of the fused Pallas label propagation vs the jnp pool path."""

import numpy as np
import jax.numpy as jnp

from blackbox_tpu.ops.labeling import label_components


def _blobby_mask(rng, H, W, nblobs=120):
    m = np.zeros((H, W), bool)
    ys = rng.integers(0, H, nblobs)
    xs = rng.integers(0, W, nblobs)
    for y, x in zip(ys, xs):
        ry, rx = rng.integers(1, 9, 2)
        m[max(0, y - ry):y + ry, max(0, x - rx):x + rx] = True
    # a long diagonal structure crossing tile boundaries
    for i in range(0, min(H, W) - 2):
        m[i, i] = m[i, i + 1] = True
    return m


def test_labelprop_pallas_matches_pool(rng):
    H, W = 600, 620
    mask = _blobby_mask(rng, H, W)
    ref = label_components(jnp.asarray(mask), iters=32, use_pallas=False)

    from blackbox_tpu.pallas.labelprop import label_propagate_pallas
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) + 1
    big = jnp.int32(H * W + 2)
    lab0 = jnp.where(jnp.asarray(mask), idx, big)
    got = label_propagate_pallas(lab0, iters=32, interpret=True)
    got = jnp.where(jnp.asarray(mask), got, 0)

    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_labelprop_pallas_tile_boundaries(rng):
    """Components spanning the 512-tile seams merge exactly as dense."""
    H, W = 1040, 560
    mask = np.zeros((H, W), bool)
    # horizontal bar crossing the row-512 seam vertically
    mask[500:525, 40:45] = True
    # vertical bar crossing the col-512 seam horizontally
    mask[100:104, 490:530] = True
    # random salt
    mask |= _blobby_mask(rng, H, W, nblobs=40)

    ref = label_components(jnp.asarray(mask), iters=32, use_pallas=False)

    from blackbox_tpu.pallas.labelprop import label_propagate_pallas
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) + 1
    big = jnp.int32(H * W + 2)
    lab0 = jnp.where(jnp.asarray(mask), idx, big)
    got = label_propagate_pallas(lab0, iters=32, interpret=True)
    got = jnp.where(jnp.asarray(mask), got, 0)

    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

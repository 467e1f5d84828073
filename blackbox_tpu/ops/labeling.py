"""Connected components on device: counting and labeling.

The reference counts cosmic-ray and saturated-star blobs with
``scipy.ndimage.label`` (8-connectivity) on the host
(/root/reference/blackbox.py:4343-4349, 4550-4560).  On device, two tools:

* :func:`euler_count` — single-pass bit-quad (Gray) counting of the Euler
  number, which equals the 8-connected component count for hole-free masks
  (cosmic hits, hole-filled saturation blobs).  O(1) passes, VPU-only.
* :func:`label_components` — iterative min-label propagation for exact
  labels when downstream ops need per-component identities (e.g. source
  segmentation).  Cost is one 3x3 min-pool per iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def euler_count(mask) -> jnp.ndarray:
    """8-connectivity Euler number (= component count for hole-free masks).

    Gray's bit-quad formula: E8 = (Q1 - Q3 - 2*Qd) / 4 over all 2x2 windows
    (with one-pixel zero padding so border blobs count).
    """
    m = jnp.pad(mask.astype(jnp.int32), 1)
    a = m[:-1, :-1]
    b = m[:-1, 1:]
    c = m[1:, :-1]
    d = m[1:, 1:]
    s = a + b + c + d
    q1 = jnp.sum(s == 1)
    q3 = jnp.sum(s == 3)
    qd = jnp.sum((s == 2) & (a == d) & (a != b))
    return (q1 - q3 - 2 * qd) // 4


def label_components(mask, iters: int = 64, use_pallas: bool | None = None):
    """Iterative 8-connected labeling by min-label propagation.

    Returns int32 labels (0 = background, >0 = component id given by the
    flattened index of the component's minimum pixel + 1).  ``iters`` bounds
    the geodesic radius that can merge; pick it larger than the expected
    blob diameter.

    On TPU the propagation runs as one fused Pallas kernel
    (:mod:`blackbox_tpu.pallas.labelprop`): all ``iters`` iterations
    execute on a VMEM tile with an ``iters``-pixel halo, one HBM
    read + write instead of ``2*iters`` full-frame pool passes
    (measured 6.1 ms/iteration -> ~1 pass at 10.5k²).
    """
    H, W = mask.shape
    idx = (jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) + 1)
    big = jnp.int32(H * W + 2)
    imax = jnp.iinfo(jnp.int32).max
    lab = jnp.where(mask, idx, big)

    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and iters <= 64 and H >= 512 and W >= 512)
    if use_pallas:
        from blackbox_tpu.pallas.labelprop import label_propagate_pallas
        lab = label_propagate_pallas(lab, iters=iters)
        return jnp.where(mask, lab, 0)

    def body(_, lab):
        # separable 3x3 min pool (rows then columns).  Measured at
        # 10.5k^2: this reduce_window form runs 6.1 ms/iteration; a
        # "fused" 9-shifted-view minimum chain is 1.5x SLOWER (9.4 ms)
        # — Mosaic pipelines the two pooling passes better than the
        # long elementwise min chain.
        nb = lax.reduce_window(lab, imax, lax.min, (3, 1), (1, 1), "SAME")
        nb = lax.reduce_window(nb, imax, lax.min, (1, 3), (1, 1), "SAME")
        return jnp.where(mask, nb, big)

    lab = lax.fori_loop(0, iters, body, lab)
    return jnp.where(mask, lab, 0)


def count_components(mask, iters: int = 64):
    """Exact 8-connected component count via labeling (device)."""
    lab = label_components(mask, iters=iters)
    idx = jnp.arange(mask.size, dtype=jnp.int32).reshape(mask.shape) + 1
    return jnp.sum((lab == idx) & mask)


def count_components_host(mask) -> int:
    """Host-side exact count via scipy (outside jit)."""
    import numpy as np
    from scipy import ndimage
    _, n = ndimage.label(np.asarray(mask), structure=np.ones((3, 3), bool))
    return int(n)

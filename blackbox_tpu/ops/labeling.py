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

    Runs on bit-packed words (the quad corners are pixel-shifted word
    arrays, the quad-class counts are ``lax.population_count`` sums):
    the int32 formulation round-trips ~450 MB planes through HBM for
    each of the four corner views at full frame size, the packed form
    touches ~3.5 MB.
    """
    from blackbox_tpu.ops.morphology import _pack_bits, _shift_px
    H, W = mask.shape
    w = _pack_bits(mask)                      # (H, nw); slack bits 0
    # quad top-left (y, x), y in -1..H-1, x in -1..W-1, corners
    #   a=(y,x)  b=(y,x+1)  c=(y+1,x)  d=(y+1,x+1)
    # encoded at packed position p = x+1 (so the x=-1 column exists);
    # one spare zero word guarantees p = W is addressable when W % 32
    # == 0 (the (y, W-1) quad's a/c corners land there)
    nw = w.shape[1]
    if nw * 32 < W + 1:
        w = jnp.pad(w, ((0, 0), (0, 1)))
    z = jnp.zeros((1, w.shape[1]), w.dtype)
    ext = jnp.concatenate([z, w, z], axis=0)  # rows -1..H
    top = ext[:-1]                            # row y   (y = -1..H-1)
    bot = ext[1:]                             # row y+1
    a = _shift_px(top, 1)                     # pixel x = p-1
    b = top                                   # pixel x+1 = p
    c = _shift_px(bot, 1)
    d = bot

    odd = a ^ b ^ c ^ d                       # count is 1 or 3
    pair = (a & b) | (a & c) | (a & d) | (b & c) | (b & d) | (c & d)
    q1m = odd & ~pair
    q3m = odd & pair
    qdm = (a & d & ~b & ~c) | (b & c & ~a & ~d)

    def count(m_):
        return jnp.sum(jax.lax.population_count(m_).astype(jnp.int32))

    return (count(q1m) - count(q3m) - 2 * count(qdm)) // 4


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

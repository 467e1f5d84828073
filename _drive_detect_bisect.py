"""Bisect the fused-detect hardware mismatch: which feature breaks?"""
import time

import jax
import jax.numpy as jnp

from blackbox_tpu.utils.compilecache import (enable_persistent_cache,
                                             host_fingerprint)
enable_persistent_cache(f"/tmp/jax_cache_blackbox_tpu_drive_{host_fingerprint()}")

from blackbox_tpu.ops import detection as det
from blackbox_tpu.ops.detection import gaussian_taps
from blackbox_tpu.ops.labeling import label_components
from blackbox_tpu.pallas.detect import fused_detect_pallas

print("device:", jax.devices()[0])
H = W = 4096
key = jax.random.PRNGKey(0)
img = jax.random.normal(key, (H, W), jnp.float32)
ky, kx = jax.random.split(key)
yy = jax.random.randint(ky, (500,), 10, H - 10)
xx = jax.random.randint(kx, (500,), 10, W - 10)
img = img.at[yy, xx].add(50.0)
bstd = jnp.ones((H, W), jnp.float32)
excl = jnp.zeros((H, W), jnp.int8)
taps = gaussian_taps(3.0)


def jnp_ref(im, use_taps, use_std, use_excl, absval):
    x = im
    if use_taps:
        ka = jnp.asarray(taps, jnp.float32)
        x = det._conv1d(det._conv1d(x, ka, 0), ka, 1)
    if absval:
        x = jnp.abs(x)
    thr = 4.0 * jnp.maximum(bstd, 1e-6) if use_std else jnp.float32(4.0)
    d = x > thr
    if use_excl:
        d = d & (excl == 0)
    lab = label_components(d, iters=16)
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) + 1
    n = jnp.sum((d & (lab == idx)).astype(jnp.int32))
    return jnp.where(d, lab, 0), n


for (use_taps, use_std, use_excl) in [
        (False, False, False),
        (True, False, False),
        (False, True, False),
        (False, False, True),
        (True, True, True)]:
    t = taps if use_taps else None
    s = bstd if use_std else None
    e = excl if use_excl else None
    fp = jax.jit(lambda im, t=t, s=s, e=e: fused_detect_pallas(
        im, s, e, t, 4.0, iters=16))
    seg_p, n_p = fp(img)
    jr = jax.jit(lambda im, a=use_taps, b=use_std, c=use_excl: jnp_ref(
        im, a, b, c, False))
    seg_j, n_j = jr(img)
    mism = int(jnp.sum((seg_p != 0) != (seg_j != 0)))
    lmism = int(jnp.sum(seg_p != seg_j))
    print(f"taps={use_taps} std={use_std} excl={use_excl}: "
          f"n_p={int(n_p)} n_j={int(n_j)} fg-mism={mism} lab-mism={lmism}")
print("OK")

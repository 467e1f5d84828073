"""Real-TPU smoke + parity + timing for pallas/detect.py and pallas/gather.py.

Run from inside the repo (PYTHONPATH breaks axon discovery).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from blackbox_tpu.utils.compilecache import (enable_persistent_cache,
                                             host_fingerprint)
enable_persistent_cache(f"/tmp/jax_cache_blackbox_tpu_drive_{host_fingerprint()}")

print("device:", jax.devices()[0])

H = W = 10560
key = jax.random.PRNGKey(0)


def sync(x):
    return float(jnp.sum(x.ravel()[:8]))


def timeit(fn, *args, n=3, perturb=0):
    # warm
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: sync(x) if hasattr(x, "ravel") else x, out)
    ts = []
    for i in range(n):
        a = list(args)
        a[perturb] = a[perturb] + jnp.asarray(1e-7 * (i + 1), a[perturb].dtype)
        t0 = time.time()
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        sync(leaves[0])
        ts.append(time.time() - t0)
    return min(ts), out


# ---------- fused detect ----------
from blackbox_tpu.ops import detection as det
from blackbox_tpu.pallas.detect import fused_detect_pallas

img = 1.0 * jax.random.normal(key, (H, W), jnp.float32)
# sprinkle sources
ky, kx = jax.random.split(key)
yy = jax.random.randint(ky, (4000,), 10, H - 10)
xx = jax.random.randint(kx, (4000,), 10, W - 10)
img = img.at[yy, xx].add(50.0)
img = img.at[yy + 1, xx].add(30.0)
bstd = jnp.ones((H, W), jnp.float32)
excl = jnp.zeros((H, W), jnp.int8)
taps = (0.25, 0.5, 1.0, 0.5, 0.25)

fd = jax.jit(lambda im: fused_detect_pallas(im, bstd, excl, taps, 4.0,
                                            iters=32))
t0 = time.time()
seg_p, n_p = fd(img)
sync(seg_p)
print(f"fused_detect compile+run {time.time()-t0:.1f}s n={int(n_p)}")
t, (seg_p, n_p) = timeit(fd, img)
print(f"fused_detect steady {t*1e3:.1f} ms")

# jnp reference path (force use_pallas off)
jd = jax.jit(lambda im: det.detect_segments(
    im, bstd, excl,
    det.DetectParams(max_sources=20000, label_iters=32),
    use_pallas=False))
try:
    t0 = time.time()
    seg_j, n_j = jd(img)[:2]
    sync(seg_j)
    print(f"jnp detect compile+run {time.time()-t0:.1f}s n={int(n_j)}")
    t, out = timeit(jd, img)
    print(f"jnp detect steady {t*1e3:.1f} ms")
    seg_j, n_j = out[:2]
    mism = int(jnp.sum((seg_p != 0) != (seg_j != 0)))
    print(f"detect parity: n_p={int(n_p)} n_j={int(n_j)} fg-mismatch px={mism}")
except TypeError as e:
    print("DetectParams has no use_pallas_detect knob:", e)

# ---------- gather windows ----------
from blackbox_tpu.pallas.gather import gather_windows

imgs = (img, bstd)
N = 20000
y0 = jax.random.randint(ky, (N,), 0, H - 48)
x0 = jax.random.randint(kx, (N,), 0, W - 48)
n_active = jnp.int32(4000)

gw = jax.jit(lambda im, y, x, na: gather_windows((im, bstd), y, x, 48,
                                                 n_active=na))
t0 = time.time()
outs = gw(img, y0, x0, n_active)
sync(outs[0])
print(f"gather_windows compile+run {time.time()-t0:.1f}s")
t, outs = timeit(gw, img, y0, x0, n_active)
print(f"gather_windows(48, N=20k, act=4k) steady {t*1e3:.1f} ms")


def ds_gather(im, y, x):
    def one(yy, xx):
        return jax.lax.dynamic_slice(im, (yy, xx), (48, 48))
    return jax.vmap(one)(y, x)

dg = jax.jit(lambda im, y, x: (ds_gather(im, y, x), ds_gather(bstd, y, x)))
t0 = time.time()
outs_d = dg(img, y0, x0)
sync(outs_d[0])
print(f"dynslice gather compile+run {time.time()-t0:.1f}s")
t, outs_d = timeit(dg, img, y0, x0)
print(f"dynslice gather steady {t*1e3:.1f} ms")

na = int(n_active)
eq0 = bool(jnp.array_equal(outs[0][:na], outs_d[0][:na]))
eq1 = bool(jnp.array_equal(outs[1][:na], outs_d[1][:na]))
print(f"gather parity (first {na}): img={eq0} bstd={eq1}")
print("OK")

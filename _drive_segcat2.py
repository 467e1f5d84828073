"""Time the row-compaction segment_roots + full segment_catalog on chip."""
import time

import jax
import jax.numpy as jnp

from blackbox_tpu.utils.compilecache import (enable_persistent_cache,
                                             host_fingerprint)
enable_persistent_cache(f"/tmp/jax_cache_blackbox_tpu_drive_{host_fingerprint()}")

from blackbox_tpu.ops import detection as det

print("device:", jax.devices()[0])
H = W = 10560
key = jax.random.PRNGKey(0)
img = jax.random.normal(key, (H, W), jnp.float32)
ky, kx = jax.random.split(key)
yy = jax.random.randint(ky, (4000,), 10, H - 10)
xx = jax.random.randint(kx, (4000,), 10, W - 10)
img = img.at[yy, xx].add(50.0)
img = img.at[yy + 1, xx].add(30.0)
bstd = jnp.ones((H, W), jnp.float32)
p = det.DetectParams(max_sources=20000, label_iters=32)
seg, n = jax.jit(lambda im, b: det.detect_segments(im, b, None, p))(img,
                                                                    bstd)
seg = jax.block_until_ready(seg)
print("n =", int(n))


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8].astype(jnp.float32)))


def t(name, fn, *a, n_it=3):
    out = fn(*a)
    sync(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for i in range(n_it):
        aa = list(a)
        if jnp.issubdtype(aa[0].dtype, jnp.floating):
            aa[0] = aa[0] + jnp.float32(1e-7 * (i + 1))
        t0 = time.time()
        out = fn(*aa)
        sync(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.time() - t0)
    print(f"{name:28s} {min(ts)*1e3:8.1f} ms")
    return out


roots = t("segment_roots v2", jax.jit(
    lambda s: det.segment_roots(s, 20000)), seg)
# parity vs the scan formulation, on chip
s_ = seg.ravel()
cm = jax.lax.cummax(s_)
prev = jnp.concatenate([jnp.zeros((1,), cm.dtype), cm[:-1]])
order = jnp.cumsum((cm > prev).astype(jnp.int32))
ks = jnp.arange(1, 20001, dtype=jnp.int32)
old = jnp.clip(jnp.searchsorted(order, ks, side="left"), 0,
               s_.shape[0] - 1)
nn = int(n)
print("parity v2 vs scan (first n):",
      bool(jnp.array_equal(roots[:nn], old[:nn])))
t("segment_catalog", jax.jit(
    lambda im, b, s, k: det.segment_catalog(im, b, s, k, p)),
  img, bstd, seg, n)
print("OK")

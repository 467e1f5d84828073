"""Micro-profile segment_catalog internals on the chip."""
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
seg, n = jax.jit(lambda im: det.detect_segments(im, bstd, None, p))(img)
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
        else:
            aa[0] = aa[0] ^ jnp.asarray(i % 2, aa[0].dtype) \
                if aa[0].dtype == jnp.int32 else aa[0]
        t0 = time.time()
        out = fn(*aa)
        sync(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.time() - t0)
    print(f"{name:28s} {min(ts)*1e3:8.1f} ms")
    return out


t("segment_roots", jax.jit(lambda s: det.segment_roots(s, 20000)), seg)
t("cummax only", jax.jit(lambda s: jax.lax.cummax(s.ravel())), seg)
t("cumsum only", jax.jit(
    lambda s: jnp.cumsum((s.ravel() > 0).astype(jnp.int32))), seg)
t("root-mask (seg==idx)", jax.jit(lambda s: jnp.sum(
    (s == (jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) + 1))
    & (s > 0))), seg)

roots = jax.block_until_ready(
    jax.jit(lambda s: det.segment_roots(s, 20000))(seg))
t("segment_catalog full", jax.jit(
    lambda im: det.segment_catalog(im, bstd, seg, n, p)), img)
t("segment_catalog w/roots", jax.jit(
    lambda im: det.segment_catalog(im, bstd, seg, n, p, roots=roots)),
  img)
t("_window_moments 48", jax.jit(
    lambda im: det._window_moments(
        im, seg, jnp.ravel(seg)[roots],
        (roots // W).astype(jnp.int32), (roots % W).astype(jnp.int32),
        48, n_active=n)), img)
print("OK")

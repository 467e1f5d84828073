"""Real-TPU parity + timing for the aligned-DMA window gather."""
import time

import jax
import jax.numpy as jnp

from blackbox_tpu.utils.compilecache import (enable_persistent_cache,
                                             host_fingerprint)
enable_persistent_cache(f"/tmp/jax_cache_blackbox_tpu_drive_{host_fingerprint()}")

from blackbox_tpu.pallas.gather import gather_windows

print("device:", jax.devices()[0])
H = W = 10560
key = jax.random.PRNGKey(0)
img = jax.random.normal(key, (H, W), jnp.float32)
bstd = jnp.ones((H, W), jnp.float32) * 2.0
seg = jax.random.randint(jax.random.PRNGKey(7), (H, W), 0, 1000,
                         dtype=jnp.int32)


def sync(x):
    return float(jnp.sum(x.ravel()[:8].astype(jnp.float32)))


def timeit(fn, *args, n=3, perturb=1):
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for i in range(n):
        a = list(args)
        a[perturb] = (a[perturb] + i) % (H - 200)
        t0 = time.time()
        out = fn(*a)
        sync(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.time() - t0)
    return min(ts), out


ky, kx = jax.random.split(key)
N = 20000
for size, nact in [(48, 4000), (96, 1024)]:
    y0 = jax.random.randint(ky, (N,), 0, H - size)
    x0 = jax.random.randint(kx, (N,), 0, W - size)
    na = jnp.int32(nact)

    gw = jax.jit(lambda im, b, s, y, x, na=na, size=size: gather_windows(
        (im, b, s), y, x, size, n_active=na))
    t0 = time.time()
    outs = gw(img, bstd, seg, y0, x0)
    sync(outs[0])
    print(f"size={size}: gather compile+run {time.time()-t0:.1f}s")
    t, outs = timeit(gw, img, bstd, seg, y0, x0, perturb=3)
    print(f"size={size}: pallas gather (N=20k, act={nact}) "
          f"steady {t*1e3:.1f} ms")

    def ds(im, y, x, size=size):
        def one(yy, xx):
            return jax.lax.dynamic_slice(im, (yy, xx), (size, size))
        return jax.vmap(one)(jnp.clip(y, 0, H - size),
                             jnp.clip(x, 0, W - size))

    dg = jax.jit(lambda im, b, s, y, x, size=size: (
        ds(im, y, x), ds(b, y, x), ds(s, y, x)))
    t0 = time.time()
    outs_d = dg(img, bstd, seg, y0, x0)
    sync(outs_d[0])
    print(f"size={size}: dynslice compile+run {time.time()-t0:.1f}s")
    t, outs_d = timeit(dg, img, bstd, seg, y0, x0, perturb=3)
    print(f"size={size}: dynslice gather (N=20k dense) "
          f"steady {t*1e3:.1f} ms")

    eq = [bool(jnp.array_equal(a[:nact], b[:nact]))
          for a, b in zip(outs, outs_d)]
    print(f"size={size}: parity first {nact}: {eq}")
print("OK")

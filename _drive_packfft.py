"""Measure complex-vs-real FFT cost on chip and time zogy pack_fft.

Decides the pack_fft default: packing replaces 2 real transforms with
1 complex one; it wins iff cost(fft2 complex) < 2 x cost(rfft2).
"""
import time

import jax
import jax.numpy as jnp

from blackbox_tpu.utils.compilecache import (enable_persistent_cache,
                                             host_fingerprint)
enable_persistent_cache(f"/tmp/jax_cache_blackbox_tpu_drive_{host_fingerprint()}")

print("device:", jax.devices()[0])
N = 10752
key = jax.random.PRNGKey(0)
a = jax.random.normal(key, (N, N), jnp.float32)
b = jax.random.normal(jax.random.PRNGKey(1), (N, N), jnp.float32)


def sync(x):
    return float(jnp.sum(jnp.real(x).ravel()[:8]))


def timeit(fn, *args, n=3):
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for i in range(n):
        aa = args[0] + jnp.float32(1e-7 * (i + 1))
        t0 = time.time()
        out = fn(aa, *args[1:])
        sync(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.time() - t0)
    return min(ts)


r_roundtrip = jax.jit(lambda x: jnp.fft.irfft2(jnp.fft.rfft2(x) * 1.0001,
                                               (N, N)))
c_roundtrip = jax.jit(lambda x, y: jnp.real(
    jnp.fft.ifft2(jnp.fft.fft2(x + 1j * y) * 1.0001)))

t_r = timeit(r_roundtrip, a)
print(f"rfft2+irfft2 roundtrip ({N}^2): {t_r*1e3:.1f} ms")
t_c = timeit(c_roundtrip, a, b)
print(f"fft2+ifft2 complex roundtrip ({N}^2, carries 2 frames): "
      f"{t_c*1e3:.1f} ms  -> ratio {t_c/t_r:.2f} (win if < 2)")

# full zogy pair, packed vs unpacked, production variance mode
from blackbox_tpu.core.geometry import MEERLICHT
from blackbox_tpu.ops.zogy import ZogyParams, zogy_subtract
from blackbox_tpu.synth.device import make_science_device

geom = MEERLICHT
H = W = 10560


def mkframe(k):
    img = 100.0 + jax.random.normal(k, (H, W), jnp.float32)
    return img

new = mkframe(jax.random.PRNGKey(2))
ref = mkframe(jax.random.PRNGKey(3))
yy = jnp.arange(25, dtype=jnp.float32) - 12.0
psf = jnp.exp(-(yy[:, None] ** 2 + yy[None, :] ** 2) / (2 * 2.0 ** 2))
psf = psf / jnp.sum(psf)

import numpy as np
scorr_ds = {}
for packed in (False, True):
    p = ZogyParams(pack_fft=packed)
    fn = jax.jit(lambda n_, r_: zogy_subtract(
        n_, r_, psf, psf, jnp.float32(1.0), jnp.float32(1.0), params=p,
        want_psf_d=False))
    t0 = time.time()
    out = fn(new, ref)
    sync(out["Scorr"])
    print(f"pack_fft={packed}: compile+run {time.time()-t0:.1f}s")
    scorr_ds[packed] = np.asarray(out["Scorr"][64:-64:3, 64:-64:3])
    del out
    t = timeit(fn, new, ref)
    print(f"pack_fft={packed}: zogy pair steady {t*1e3:.1f} ms")

d = float(np.max(np.abs(scorr_ds[True] - scorr_ds[False])))
s = float(np.std(scorr_ds[False]))
print(f"packed-vs-unpacked interior max|dScorr|={d:.3e} (std {s:.3f})")
print("OK")

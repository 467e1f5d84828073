"""Time the Pallas mesh upsample on chip + full-scale parity."""
import time

import jax
import jax.numpy as jnp

from blackbox_tpu.utils.compilecache import (enable_persistent_cache,
                                             host_fingerprint)
enable_persistent_cache(f"/tmp/jax_cache_blackbox_tpu_drive_{host_fingerprint()}")

from blackbox_tpu.ops.background import mini2back, _catmull_rom_matrix
from blackbox_tpu.pallas.upsample import upsample_mesh_pallas

print("device:", jax.devices()[0])
H = W = 10560
box = 256
ny = nx = 41
key = jax.random.PRNGKey(0)
mesh = 200.0 + 5.0 * jax.random.normal(key, (ny, nx), jnp.float32)
stdm = 10.0 + 0.5 * jax.random.normal(key, (ny, nx), jnp.float32)


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


def t(name, fn, *a, n_it=3):
    out = fn(*a)
    sync(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for i in range(n_it):
        aa = list(a)
        aa[0] = aa[0] + jnp.float32(1e-6 * (i + 1))
        t0 = time.time()
        out = fn(*aa)
        sync(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.time() - t0)
    print(f"{name:30s} {min(ts)*1e3:8.1f} ms")
    return out


got = t("mini2back pallas", jax.jit(
    lambda m: mini2back(m, (H, W), box)), mesh)
ref = t("mini2back matmul", jax.jit(
    lambda m: mini2back(m, (H, W), box, use_pallas=False)), mesh)
d = float(jnp.max(jnp.abs(got - ref)))
print(f"max|d| = {d:.2e} (mesh ~200)")

Wy = _catmull_rom_matrix(H, ny, box)
Wx = _catmull_rom_matrix(W, nx, box)
t("upsample pair (bkg+std)", jax.jit(
    lambda m, s: upsample_mesh_pallas((m, s), Wy, Wx, (H, W))),
  mesh, stdm)
print("OK")

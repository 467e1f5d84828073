"""mini2back variants on chip: precision tiers + banded 4-tap gather.
Also: int16 rowcum variant of segment_roots."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from blackbox_tpu.utils.compilecache import (enable_persistent_cache,
                                             host_fingerprint)
enable_persistent_cache(f"/tmp/jax_cache_blackbox_tpu_drive_{host_fingerprint()}")

from blackbox_tpu.ops.background import mini2back, _catmull_rom_matrix

print("device:", jax.devices()[0])
H = W = 10560
box = 256
ny = nx = 41
key = jax.random.PRNGKey(0)
mesh = 200.0 + 5.0 * jax.random.normal(key, (ny, nx), jnp.float32)


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8].astype(jnp.float32)))


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


ref = t("mini2back HIGHEST (current)", jax.jit(
    lambda m: mini2back(m, (H, W), box)), mesh)


def m2b_prec(m, prec):
    Wy = jnp.asarray(_catmull_rom_matrix(H, ny, box))
    Wx = jnp.asarray(_catmull_rom_matrix(W, nx, box))
    up = jnp.matmul(Wy, m, precision=prec)
    return jnp.matmul(up, Wx.T, precision=prec)

for prec in ("high", "default"):
    out = t(f"mini2back {prec}", jax.jit(
        lambda m, p=prec: m2b_prec(m, p)), mesh)
    d = float(jnp.max(jnp.abs(out - ref)))
    print(f"   max|d| vs HIGHEST = {d:.2e}  (mesh ~200)")


def banded(m):
    """4-tap Catmull-Rom as gathers + fused multiply-adds (no MXU)."""
    Wy = np.asarray(_catmull_rom_matrix(H, ny, box))
    Wx = np.asarray(_catmull_rom_matrix(W, nx, box))
    # per output row: indices of its (<=4) nonzero taps and weights
    def band(Wm, n_mesh):
        iy = np.argsort(-np.abs(Wm), axis=1)[:, :4]
        iy.sort(axis=1)
        wy = np.take_along_axis(Wm, iy, axis=1)
        return jnp.asarray(iy), jnp.asarray(wy.astype(np.float32))
    Iy, Vy = band(Wy, ny)
    Ix, Vx = band(Wx, nx)
    up = jnp.zeros((H, nx), jnp.float32)
    for tap in range(4):
        up = up + Vy[:, tap:tap + 1] * m[Iy[:, tap], :]
    out = jnp.zeros((H, W), jnp.float32)
    for tap in range(4):
        out = out + Vx[None, :, tap] * up[:, Ix[:, tap]]
    return out

outb = t("mini2back banded gather", jax.jit(banded), mesh)
d = float(jnp.max(jnp.abs(outb - ref)))
print(f"   max|d| vs HIGHEST = {d:.2e}")

# ---- int16 rowcum segment_roots ----
from blackbox_tpu.ops import detection as det
seg = jnp.zeros((H, W), jnp.int32)
ky, kx = jax.random.split(key)
yy = jax.random.randint(ky, (4000,), 1, H - 1)
xx = jax.random.randint(kx, (4000,), 1, W - 1)
flat = yy * W + xx + 1
seg = seg.at[yy, xx].set(flat)
roots_ref = t("segment_roots v2 (i32)", jax.jit(
    lambda s: det.segment_roots(s, 20000)), seg.astype(jnp.float32)
    if False else seg, n_it=3) if False else None

def roots16(s):
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) + 1
    root = s == idx
    rowcum = jnp.cumsum(root.astype(jnp.int16), axis=1)
    counts = rowcum[:, -1].astype(jnp.int32)
    before = jnp.cumsum(counts)
    ks = jnp.arange(1, 20001, dtype=jnp.int32)
    row = jnp.searchsorted(before, ks, side="left")
    rowc = jnp.clip(row, 0, H - 1).astype(jnp.int32)
    prev = jnp.where(rowc > 0, before[jnp.maximum(rowc - 1, 0)], 0)
    j = ks - prev
    nbits = max(1, (W - 1).bit_length())
    lo = jnp.zeros_like(ks)
    hi = jnp.full_like(ks, W - 1)
    def step(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        v = rowcum[rowc, mid].astype(jnp.int32)
        ge = v >= j
        return (jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi))
    lo, _ = jax.lax.fori_loop(0, nbits, step, (lo, hi))
    return jnp.clip(rowc * W + lo, 0, H * W - 1)

def ti(name, fn, s, n_it=3):
    out = fn(s)
    sync(out)
    ts = []
    for i in range(n_it):
        s2 = s.at[5, 5 + i].set(0)
        t0 = time.time()
        out = fn(s2)
        sync(out)
        ts.append(time.time() - t0)
    print(f"{name:30s} {min(ts)*1e3:8.1f} ms")
    return out

r32 = ti("segment_roots v2 i32", jax.jit(
    lambda s: det.segment_roots(s, 20000)), seg)
r16 = ti("segment_roots v2 i16", jax.jit(roots16), seg)
print("i16 parity:", bool(jnp.array_equal(r32, r16)))
print("OK")

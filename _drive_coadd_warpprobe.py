"""Isolate the co-add shift2pass slowdown: the same slab-shaped warp
(a) standalone, (b) inside lax.map over N inputs, (c) python-unrolled
over N inputs — on the real chip.  Hypothesis: the lax.map body stops
XLA fusing the shifted-add chains, so every tap slice of the padded
slab materialises (~67 GB/block of HBM traffic instead of streaming
adds).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from blackbox_tpu.ops.warp import warp_shift2pass, upsample_lerp

SLAB_H, W = 1920, 5280
EROWS = 1384
N = 10
RY = tuple((-2 + b // 3, 12 - b // 3) for b in range(8))
RX = tuple((-8, 8) for _ in range(8))


def one_warp(im, st, mk, yl, xl):
    return warp_shift2pass(
        (im, st, mk), ("lanczos", "nearest", "nearest"),
        (0.0, jnp.float32(0.0), jnp.uint8(1)), (yl, xl), (RY, RX))


def make_args(key):
    ks = jax.random.split(key, 3)
    im = jax.random.normal(ks[0], (N, SLAB_H, W), jnp.float32)
    st = jnp.abs(jax.random.normal(ks[1], (N, SLAB_H, W))) + 5.0
    mk = jnp.zeros((N, SLAB_H, W), jnp.uint8)
    yy = jnp.arange(EROWS, dtype=jnp.float32)[:, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    yl = jnp.broadcast_to(yy + 5.0 + 0.002 * xx, (EROWS, W))
    xl = jnp.broadcast_to(xx - 2.0 + 0.001 * yy, (EROWS, W))
    return im, st, mk, yl, xl


def timeit(fn, args, label, iters=3):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        a2 = (args[0] + jnp.float32(i) * 1e-6,) + args[1:]
        outs.append(f(*a2))
    float(sum(jnp.sum(o[0][..., ::509, ::509]) if isinstance(o, tuple)
              else jnp.sum(o[..., ::509, ::509]) for o in outs))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label}: {dt:.0f} ms", flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    im, st, mk, yl, xl = make_args(jax.random.PRNGKey(0))

    def single(im, st, mk):
        o = one_warp(im[0], st[0], mk[0], yl, xl)
        return (o[0],)
    timeit(single, (im, st, mk), "one slab warp standalone")

    def mapped(im, st, mk):
        o = jax.lax.map(lambda t: one_warp(*t, yl, xl), (im, st, mk))
        return (o[0],)
    timeit(mapped, (im, st, mk), f"lax.map over {N}")

    def unrolled(im, st, mk):
        outs = [one_warp(im[i], st[i], mk[i], yl, xl)[0]
                for i in range(N)]
        return (jnp.stack(outs),)
    timeit(unrolled, (im, st, mk), f"python-unrolled over {N}")

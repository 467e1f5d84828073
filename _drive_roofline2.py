"""VPU min/max CEILING probe (part 2 of the roofline proof).

_drive_roofline.py showed the full dense _detect_math round runs at
~1.04e12 min/max-equiv ops/s (87.2 ms isolated, 810 ops/px, 10560²) —
but its "pure chain" XLA probe failed to stay fused (8-wire DAG
materialises between fusions), so it could not measure the CEILING
itself.  This kernel can: a VMEM-resident Pallas tile loop carrying
four accumulator tiles through a rotating compare-exchange pattern —
everything stays in registers/VMEM, 4 VPU min/max ops per element per
iteration, zero HBM traffic growth with the iteration count.  The
slope of t(NITER) is the hardware's sustained min/max rate.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = W = 5120
BH, BW = 128, 2560


def kernel(niter, nwires, x_ref, o_ref):
    # nwires accumulators, nwires/2 INDEPENDENT compare-exchange pairs
    # per iteration with a rotating partner pattern: wide ILP so the
    # VPU pipeline latency is hidden and the slope measures ALU
    # throughput, not dependency latency
    base = x_ref[...]
    v = [base * (1.0 + 0.001 * k) - 0.05 * k for k in range(nwires)]

    def body(i, carry):
        v = list(carry)
        # pairing rotates with i so values keep mixing (no folding)
        off = 1 + jax.lax.rem(i, nwires - 1)
        out = list(v)
        for k in range(0, nwires, 2):
            a, b = v[k], v[(k + 1) % nwires]
            out[k] = jnp.minimum(a, b)
            out[(k + 1) % nwires] = jnp.maximum(a, b)
        # cheap cross-mix between chains every iteration (2 ops total,
        # amortised into the count below as part of the pattern)
        out[0] = jnp.maximum(out[0], out[nwires // 2])
        del off
        return tuple(out)

    v = jax.lax.fori_loop(0, niter, body, tuple(v))
    acc = v[0]
    for t in v[1:]:
        acc = acc + t
    o_ref[...] = acc


def make(niter, nwires=8, bh=BH, bw=BW):
    return pl.pallas_call(
        partial(kernel, niter, nwires),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        grid=(H // bh, W // bw),
        in_specs=[pl.BlockSpec((bh, bw), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((bh, bw), lambda i, j: (i, j)),
    )


def timeit(fn, label, iters=6):
    x = jax.random.normal(jax.random.PRNGKey(0), (H, W), jnp.float32)
    f = jax.jit(fn)
    f(x).block_until_ready()
    t0 = time.perf_counter()
    acc = []
    for i in range(iters):
        acc.append(f(x + jnp.float32(i) * 1e-6))
    float(sum(jnp.sum(a[::997, ::997]) for a in acc))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label}: {dt:.2f} ms", flush=True)
    return dt


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    npx = H * W
    full = 10560 * 10560
    best = 0.0
    for nw, bh, bw in ((8, 128, 1280), (16, 64, 1280)):
        ops_per_iter = nw + 1         # nw/2 ce pairs (2 ops each) + mix
        ts = {}
        for n in (100, 200, 400):
            ts[n] = timeit(make(n, nw, bh, bw),
                           f"pallas ce nwires={nw} niter={n} "
                           f"({ops_per_iter} ops/px/iter)")
        slope = (ts[400] - ts[100]) / (400 - 100) / ops_per_iter
        rate = npx / (slope * 1e-3)
        best = max(best, rate)
        print(f"  nwires={nw}: sustained {rate/1e12:.3f}e12 min/max "
              f"ops/s", flush=True)
    print(f"VPU min/max CEILING (best): {best/1e12:.3f}e12 ops/s", flush=True)
    print(f"  => exact dense _detect_math floor at this ceiling: "
          f"810 ops/px * {full/1e6:.0f} Mpx = {810*full/best*1e3:.1f} ms",
          flush=True)

"""VPU min/max roofline probe (VERDICT r4 item 1b).

The claim under test: L.A.Cosmic's dense detection round is
VPU-ALU-bound at ~1.2e12 f32 min/max ops/s, so its ~163 ms marginal is
within ~15% of hardware for exact astroscrappy semantics.

Three measurements at full production scale (10560², f32):

1. PURE ALU RATE — chained compare-exchange networks over 8 resident
   full-frame views (rolled copies of one noise frame), op count swept
   200/400/800 per px.  One fused elementwise chain, no strip/padding
   machinery, no shifted-window regeneration: the slope of t(N) is the
   machine's marginal min/max rate with perfect locality.  ~zero HBM
   growth between sweep points, so the fit isolates ALU throughput.

2. PRODUCTION NETWORKS — the dense round's actual median set
   (med5(x) -> med5(s-like) -> med3(x) -> med7(med3)) via
   ops.filters.median_filter at the production strip_rows, chained with
   data dependencies exactly like _detect_math.  750 comparator ops/px
   (160+160+26+404, counted from the traced networks).

3. FULL _detect_math — the complete detection round including
   laplacian, noise model, dilates (~810 ops/px equivalent).

ratio(2/1) = the structure penalty a perfect fused Pallas kernel could
at most reclaim; if it is ~1, the ALU-ceiling claim is PROVEN and the
medians cannot be made faster without fewer comparators.

Protocol: perturb the input each iteration, chain dispatches, one
final scalar sync (PERF_NOTES measurement-correction rules).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from blackbox_tpu.ops import filters as F

H = W = 10560
NPX = H * W
# probe 1 runs at quarter area: 8 resident views + the fused chain's
# temps OOM 16 GB HBM at full frame; ALU rate is scale-independent
HP = WP = 5280
NPXP = HP * WP


def make_frame(key, h=H, w=W):
    return jax.random.normal(key, (h, w), jnp.float32)


# ---- probe 1: pure compare-exchange chains over resident views ----
def pure_chain(x, n_ops: int, n_wires: int = 8):
    views = [jnp.roll(x, i + 1, axis=(i % 2)) for i in range(n_wires - 1)]
    v = [x] + views
    # deterministic mixing pattern: round-robin compare-exchange pairs
    # (data-dependent chains — XLA cannot fold or DCE them)
    ops = []
    i = 0
    while len(ops) * 2 < n_ops:
        a = i % n_wires
        b = (i + 1 + (i // n_wires) % (n_wires - 1)) % n_wires
        if a != b:
            ops.append(("ce", min(a, b), max(a, b)))
        i += 1
    v = F.apply_ops(v, tuple(ops))
    return sum(jnp.sum(t[::997, ::997]) for t in v)


# ---- probe 2: the production median networks, chained ----
def median_stack(x, strip_rows: int):
    m5a = F.median_filter(x, 5, strip_rows)            # 160 ops/px
    s = x - m5a                                        # stand-in for s
    m5b = F.median_filter(s, 5, strip_rows)            # 160
    m3 = F.median_filter(x + m5b * 1e-6, 3, strip_rows)  # 26
    m7 = F.median_filter(m3, 7, strip_rows)            # 404
    return jnp.sum(m7[::997, ::997]) + jnp.sum(m5a[::997, ::997])


# ---- probe 3: full _detect_math ----
def detect_round(x, strip_rows: int):
    from blackbox_tpu.ops.cosmics import _detect_math, LACosmicParams
    p = LACosmicParams()
    cosm, m5 = _detect_math(
        x, jnp.ones_like(x, bool), jnp.float32(7.0), p,
        lambda a, k: F.median_filter(a, k, strip_rows),
        F.laplacian_subsampled)
    return jnp.sum(cosm) + jnp.sum(m5[::997, ::997])


def timeit(fn, label, iters=4, small=False):
    key = jax.random.PRNGKey(0)
    x = make_frame(key, HP, WP) if small else make_frame(key)
    f = jax.jit(fn)
    d = f(x)
    d.block_until_ready()
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        x2 = x + jnp.float32(i + 1) * 1e-6
        outs.append(f(x2))
    float(sum(o.astype(jnp.float64) if o.dtype != jnp.float64 else o
              for o in outs))  # one sync
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label}: {dt:.1f} ms", flush=True)
    return dt


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)

    # probe 1 sweep: slope = marginal ALU cost
    ts = {}
    for n in (200, 400, 800):
        ts[n] = timeit(lambda x, n=n: pure_chain(x, n),
                       f"pure chain {n} ops/px (5280^2)", small=True)
    slope4 = (ts[800] - ts[200]) / (800 - 200)  # ms/op/px at 1/4 area
    slope = slope4 * (NPX / NPXP)               # scaled to full frame
    rate = NPXP / (slope4 * 1e-3)               # ops/s
    print(f"pure ALU marginal: {slope*1000:.3f} us per op/px "
          f"=> {rate/1e12:.2f}e12 min/max ops/s", flush=True)
    print(f"  predicted 750-op median stack at this rate: "
          f"{750*slope:.1f} ms (+ intercept {ts[200]-200*slope:.1f})",
          flush=True)

    t_med = timeit(lambda x: median_stack(x, 176), "median stack (750 ops/px, strips)")
    t_det = timeit(lambda x: detect_round(x, 176), "full _detect_math")
    print(f"structure penalty (measured / pure-rate prediction): "
          f"{t_med / (750*slope + (ts[200]-200*slope)):.2f}x", flush=True)

"""Fused L.A.Cosmic iteration as a Pallas TPU kernel.

The jnp path (:mod:`blackbox_tpu.ops.cosmics`) runs ~12 stencil passes
per iteration over the 446 MB frame through XLA — every median / dilate
round-trips HBM.  This kernel fuses one full iteration per tile: the
tile plus a 12-pixel halo is DMA'd HBM→VMEM once, every stencil
(5x5/3x3/7x7 medians via odd-even sorting networks, the subsampled
Laplacian, the two significance dilations, the masked-median clean)
runs in VMEM, and only the cleaned tile + updated cosmic mask return to
HBM — one read + one write of the frame per iteration instead of ~24.

Semantics match ``ops.cosmics.lacosmic`` exactly (same networks, same
thresholds); the parity test runs this kernel in interpreter mode
against the jnp path.

STATUS: experimental on real hardware, and SUPERSEDED in practice.
The fully unrolled sorting networks (25/49 comparators on wide tiles)
push the current Mosaic toolchain's compile time past 30 minutes at
10.5k² regardless of tile shape.  Meanwhile the jnp strip path gained
shared sorted-column median networks (3-5x fewer min/max ops/px) and
exact windowed iterations (ops/cosmics.py, round 2), measuring
~0.2-0.3 s/frame — the HBM round-trips this kernel was written to
remove are no longer the bottleneck (the stage is ALU-bound).  Kept as
the VMEM-tiling reference for a future Mosaic revisit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 12          # stencil influence radius (rows)
LANE_HALO = 64     # column halo: DMA slice widths must be 128-aligned,
                   # so the lane halo is 64 per side (covers HALO, and
                   # W_padded + 2*64 stays a multiple of 128)


def _pad_edge(v, p):
    return jnp.pad(v, p, mode="edge")


def _oddeven_median(views):
    v = _oddeven_median_sorted(views)
    return v[len(v) // 2]


def _views(a, k):
    p = k // 2
    H, W = a.shape
    ap = _pad_edge(a, p)
    return [ap[dy:dy + H, dx:dx + W] for dy in range(k) for dx in range(k)]


def _median(a, k):
    return _oddeven_median(_views(a, k))


def _dilate_f(m, k):
    """Dilation of a 0/1 float mask via max-of-shifts (Mosaic has no
    robust boolean vector ops; all mask logic here is f32 arithmetic)."""
    p = k // 2
    H, W = m.shape
    mp = jnp.pad(m, p, constant_values=0.0)
    out = jnp.zeros_like(m)
    for dy in range(k):
        for dx in range(k):
            out = jnp.maximum(out, mp[dy:dy + H, dx:dx + W])
    return out


def _laplacian_subsampled(v):
    up = jnp.roll(v, 1, 0)
    dn = jnp.roll(v, -1, 0)
    lf = jnp.roll(v, 1, 1)
    rt = jnp.roll(v, -1, 1)
    pos = lambda a: jnp.maximum(a, 0.0)  # noqa: E731
    return 0.25 * (pos(2 * v - up - lf) + pos(2 * v - up - rt)
                   + pos(2 * v - dn - lf) + pos(2 * v - dn - rt))


def _masked_median5(a, bad_f, fallback):
    """bad_f is a 0/1 float mask; all arithmetic stays in f32."""
    big = jnp.float32(1e30)
    views = _views(a, 5)
    bviews = _views(bad_f, 5)
    vals = [v + b * (big - v) for v, b in zip(views, bviews)]
    vs = _oddeven_median_sorted(vals)
    n = sum((1.0 - b) for b in bviews)            # good-neighbour count
    i_lo = jnp.floor(jnp.maximum(n - 1.0, 0.0) * 0.5)
    i_hi = jnp.floor(n * 0.5)
    lo = jnp.zeros_like(a)
    hi = jnp.zeros_like(a)
    for r, vr in enumerate(vs):
        rf = jnp.float32(r)
        lo = lo + (jnp.float32(1.0) - jnp.minimum(jnp.abs(i_lo - rf),
                                                  1.0)) * vr
        hi = hi + (jnp.float32(1.0) - jnp.minimum(jnp.abs(i_hi - rf),
                                                  1.0)) * vr
    med = 0.5 * lo + 0.5 * hi
    has = jnp.minimum(n, 1.0)
    return has * med + (1.0 - has) * fallback


def _oddeven_median_sorted(vals):
    v = list(vals)
    n = len(v)
    for pas in range(n):
        for i in range(pas % 2, n - 1, 2):
            lo = jnp.minimum(v[i], v[i + 1])
            hi = jnp.maximum(v[i], v[i + 1])
            v[i], v[i + 1] = lo, hi
    return v


def _iter_kernel(clean_hbm, inmask_hbm, crmask_hbm, rdn_ref,
                 clean_out, crmask_out,
                 t_clean, t_in, t_cr, sem,
                 *, th, tw, sigclip, sigfrac, objlim):
    i = pl.program_id(0)
    j = pl.program_id(1)
    y0 = i * th
    x0 = j * tw
    hh = th + 2 * HALO
    ww = tw + 2 * LANE_HALO

    cp = pltpu.make_async_copy(
        clean_hbm.at[pl.ds(y0, hh), pl.ds(x0, ww)], t_clean, sem.at[0])
    ci = pltpu.make_async_copy(
        inmask_hbm.at[pl.ds(y0, hh), pl.ds(x0, ww)], t_in, sem.at[1])
    cc = pltpu.make_async_copy(
        crmask_hbm.at[pl.ds(y0, hh), pl.ds(x0, ww)], t_cr, sem.at[2])
    cp.start()
    ci.start()
    cc.start()
    cp.wait()
    ci.wait()
    cc.wait()

    clean = t_clean[:]
    inm = t_in[:]                 # 0/1 f32 masks end to end: Mosaic v5e
    crm = t_cr[:]                 # mishandles boolean vector casts
    rdn = rdn_ref[0]

    def gt(a, b):
        # f32 indicator of a > b without a boolean intermediate
        return jnp.float32(0.5) * (jnp.sign(a - b) + 1.0)

    m5 = jnp.maximum(_median(clean, 5), 1e-5)
    noise = jnp.sqrt(m5 + rdn * rdn)
    s = _laplacian_subsampled(clean) / (2.0 * noise)
    sp = s - _median(s, 5)
    m3 = _median(clean, 3)
    m37 = _median(m3, 7)
    f = jnp.maximum((m3 - m37) / noise, 0.01)

    good = 1.0 - inm
    cosm = gt(sp, sigclip) * gt(sp / f, objlim) * good
    cosm = _dilate_f(cosm, 3) * gt(sp, sigclip) * good
    cosm = _dilate_f(cosm, 5) * gt(sp, sigclip * sigfrac) * good

    crm2 = jnp.maximum(crm, cosm)

    bad = jnp.maximum(crm2, inm)
    repl = _masked_median5(clean, bad, m5)
    clean2 = clean + crm2 * (repl - clean)

    c = slice(HALO, HALO + th)
    cw = slice(LANE_HALO, LANE_HALO + tw)
    clean_out[:] = clean2[c, cw]
    crmask_out[:] = crm2[c, cw]


def _pick_tile(n: int, target: int, mult: int) -> int:
    """Largest divisor of n that is <= target and divisible by ``mult``
    (Mosaic block constraint); falls back to n itself (always legal)."""
    best = None
    for d in range(1, int(np.sqrt(n)) + 1):
        if n % d == 0:
            for c in (d, n // d):
                if c <= target and c % mult == 0 \
                        and (best is None or c > best):
                    best = c
    return best if best is not None else n


@functools.partial(jax.jit, static_argnames=("sigclip", "sigfrac",
                                             "objlim", "niter",
                                             "interpret"))
def lacosmic_pallas(data, inmask, rdnoise, sigclip: float = 15.0,
                    sigfrac: float = 0.01, objlim: float = 3.0,
                    niter: int = 3, interpret: bool = False):
    """Drop-in lacosmic via the fused Pallas iteration kernel.

    Returns (cleaned, crmask bool, per-iteration new-detection counts).
    """
    H, W = data.shape
    # lane dim: pad the width to a 128 multiple, then block the full
    # padded width (no 128-divisible divisor exists for 10560) and tile
    # over short row bands sized to the VMEM budget
    # pad the width to a 512 multiple so 512-lane blocks tile it: small
    # tiles keep each unrolled network instruction to a few vregs —
    # full-width rows blow Mosaic's compile time up by two orders
    Wp = -(-W // 512) * 512
    Hp = -(-H // 8) * 8
    tw = 512
    ww_ = tw + 2 * LANE_HALO
    budget = 6 << 20
    th_max = (budget - 3 * 2 * HALO * ww_ * 4) // ((3 * ww_ + 2 * tw) * 4)
    vmem_rows = max(8, int(th_max) // 8 * 8)
    th = _pick_tile(Hp, min(264, vmem_rows), 8)
    grid = (Hp // th, Wp // tw)
    hh, ww = th + 2 * HALO, tw + 2 * LANE_HALO

    kern = functools.partial(_iter_kernel, th=th, tw=tw,
                             sigclip=sigclip, sigfrac=sigfrac,
                             objlim=objlim)
    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((th, tw), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hh, ww), jnp.float32),
            pltpu.VMEM((hh, ww), jnp.float32),
            pltpu.VMEM((hh, ww), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )

    if inmask is None:
        inmask = jnp.zeros(data.shape, bool)
    clean = jnp.asarray(data, jnp.float32)
    crmask = jnp.zeros(data.shape, jnp.float32)
    rdn = jnp.reshape(jnp.asarray(rdnoise, jnp.float32), (1,))
    in_u8 = inmask.astype(jnp.float32)

    pads = ((HALO, HALO + Hp - H), (LANE_HALO, LANE_HALO + Wp - W))
    p2 = ((HALO, HALO), (LANE_HALO, LANE_HALO))

    counts = []
    prev = jnp.int32(0)
    for it in range(niter):
        if it == 0:
            clean_p = jnp.pad(clean, pads, mode="edge")
            cr_p = jnp.pad(crmask, pads, mode="edge")
        else:
            # clean/crmask already carry (Hp, Wp) from the kernel
            clean_p = jnp.pad(clean, p2, mode="edge")
            cr_p = jnp.pad(crmask, p2, mode="edge")
        in_p = jnp.pad(in_u8, pads, mode="edge")
        clean, crmask = call(clean_p, in_p, cr_p, rdn)
        tot = jnp.sum((crmask[:H, :W] > 0.5).astype(jnp.int32))
        counts.append(tot - prev)
        prev = tot

    return (clean[:H, :W], crmask[:H, :W] > 0.5, jnp.stack(counts))

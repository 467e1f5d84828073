"""Strip-resident k x k median filters as Pallas TPU kernels.

The jnp median path (:func:`blackbox_tpu.ops.filters.median_filter`)
runs the shared sorted-column networks over row strips under
``lax.map`` — measured within ~20-30% of the v5e VPU min/max ceiling
(PERF_NOTES.md "Speed-of-light accounting").  This kernel runs the SAME
comparator networks on a VMEM-resident tile, following the patterns
that made :mod:`blackbox_tpu.pallas.labelprop` compile where the fused
:mod:`blackbox_tpu.pallas.lacosmic` iterate did not (VERDICT r3 item
3): manual haloed DMA from an ANY-space input, ``pltpu.roll`` for the
shifted views (wrap-around only pollutes the halo), modest 8x128-
aligned tiles, and nothing else in the program.

Semantics: identical comparator networks to the jnp path, border pixels
keep the input value (astroscrappy interior-stencil behaviour,
/root/reference/blackbox.py:4305-4332).  Parity is tested in
tests/test_pallas_medians.py (interpreter) and on chip by
tools/_drive_medians (bit-equality against ops.filters.median_filter).

Reference equivalent: the median filters inside astroscrappy's
L.A.Cosmic (van Dokkum 2001), blackbox.py:4305-4332.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blackbox_tpu.ops.filters import (apply_ops, sc_select_ops,
                                      transposition_pairs)

LANE_HALO = 64     # HBM DMA slices stay 128-aligned: interior tile a
                   # multiple of 128 lanes + 64 halo lanes per side


def _roll(a, shift: int, axis: int):
    """Signed circular shift (pltpu.roll wants non-negative)."""
    if shift == 0:
        return a
    n = a.shape[axis]
    return pltpu.roll(a, shift % n, axis)


def _median_kernel(img_hbm, out_ref, t, sem, *, th, tw, k, halo):
    i = pl.program_id(0)
    j = pl.program_id(1)
    hh = th + 2 * halo
    ww = tw + 2 * LANE_HALO

    cp = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * th, hh), pl.ds(j * tw, ww)], t, sem)
    cp.start()
    cp.wait()

    a = t[:]
    p = k // 2
    # sorted columns, shared across the k horizontal window shifts:
    # view r after the transposition sort holds the rank-r value of
    # the k-tall column at every pixel.  Rolls wrap at the tile edge;
    # the halo (>= p per side) absorbs the corruption.
    colv = [_roll(a, -dy, 0) for dy in range(-p, p + 1)]
    colv = apply_ops(colv, [("ce", x, y)
                            for x, y in transposition_pairs(k)])
    # merge-network inputs: wire dx*k + r = rank-r of column at dx
    views = [None] * (k * k)
    for dxi, dx in enumerate(range(-p, p + 1)):
        for r in range(k):
            views[dxi * k + r] = _roll(colv[r], -dx, 1)
    ops, wires = sc_select_ops(k, (k * k // 2,))
    med = apply_ops(views, ops)[wires[0]]
    out_ref[:] = med[halo:halo + th, LANE_HALO:LANE_HALO + tw]


@functools.partial(jax.jit,
                   static_argnames=("k", "th", "tw", "interpret"))
def median_filter_pallas(img, k: int = 5, th: int = 128, tw: int = 512,
                         interpret: bool | None = None):
    """k x k median of a float32 image; borders keep the input value.

    One HBM read (haloed tile DMA) + one write per pixel; all
    comparator work VMEM-resident.  k must be odd and <= 9 (the halo
    rides the 64-lane DMA alignment margin).  interpret=None runs the
    compiled kernel on TPU and the interpreter elsewhere (so callers
    can route unconditionally; CPU tests stay correct, just slow).
    """
    if k % 2 != 1 or k > 9:
        raise ValueError(f"k={k}: odd k <= 9 only")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W = img.shape
    p = k // 2
    halo = 8                     # row halo, sublane-aligned (>= p)

    twe = tw if W >= tw else 128
    the = th if H >= th else 8
    Hp = -(-H // the) * the
    Wp = -(-W // twe) * twe
    grid = (Hp // the, Wp // twe)
    hh, ww = the + 2 * halo, twe + 2 * LANE_HALO

    # edge padding preserves the jnp path's border semantics for the
    # column sorts feeding interior pixels; the outermost p border of
    # the OUTPUT is restored from the input below either way
    img_p = jnp.pad(img, ((halo, halo + Hp - H),
                          (LANE_HALO, LANE_HALO + Wp - W)), mode="edge")

    kern = functools.partial(_median_kernel, th=the, tw=twe, k=k,
                             halo=halo)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((the, twe), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hh, ww), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(img_p.astype(jnp.float32))[:H, :W]
    # border keeps the input (reference border semantics)
    out = out.at[:p, :].set(img[:p, :])
    out = out.at[-p:, :].set(img[-p:, :])
    out = out.at[:, :p].set(img[:, :p])
    out = out.at[:, -p:].set(img[:, -p:])
    return out

"""Fused min-label propagation (connected components) as a Pallas kernel.

The jnp path (:func:`blackbox_tpu.ops.labeling.label_components`) runs
``iters`` separable 3x3 min-pools over the full frame — every iteration
round-trips the 446 MB label image through HBM (measured 6.1 ms/iter at
10.5k², i.e. ~195 ms for the production 32 iterations).  Information
travels one pixel per iteration, so a VMEM tile loaded once with an
``iters``-pixel halo can run *all* iterations locally: HBM traffic drops
from ``2*iters`` frame passes to one read + one write.

Semantics are identical to ``label_components`` (min over the 3x3
neighbourhood including self, background held at the BIG sentinel,
boundary treated as BIG — the jnp path's reduce_window "SAME" pads with
int32 max, and every in-frame label is < BIG, so the first pool step
already equalises the two paddings).

The kernel is mask-free: background pixels carry the BIG sentinel in the
label image itself, and the unmodified input tile (still resident in
VMEM) re-gates them every iteration.  Tile-edge wrap-around from
``pltpu.roll`` only corrupts the halo: a wrapped value entering at the
tile border travels at most ``iters - 1`` further pixels, and the halo
is ``iters`` wide, so the interior written back is exact.

Used by :func:`blackbox_tpu.ops.labeling.label_components` when running
on TPU (reference counts components on the host with scipy.ndimage —
/root/reference/blackbox.py:4343-4349).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_HALO = 64     # column halo: HBM DMA slice offsets/widths stay
                   # 128-aligned when the interior tile is a multiple of
                   # 128 and each side carries 64 halo lanes


def _min3(a, axis: int):
    """Min over {-1, 0, +1} shifts along ``axis`` (circular; the wrap
    only pollutes the halo — see module docstring).  pltpu.roll only
    accepts non-negative shifts, so -1 is written as size-1."""
    n = a.shape[axis]
    return jnp.minimum(a, jnp.minimum(pltpu.roll(a, 1, axis),
                                      pltpu.roll(a, n - 1, axis)))


def _prop_kernel(lab_hbm, out_ref, t_lab, sem, *, th, tw, halo, iters,
                 big):
    i = pl.program_id(0)
    j = pl.program_id(1)
    hh = th + 2 * halo
    ww = tw + 2 * LANE_HALO

    cp = pltpu.make_async_copy(
        lab_hbm.at[pl.ds(i * th, hh), pl.ds(j * tw, ww)], t_lab, sem)
    cp.start()
    cp.wait()

    lab0 = t_lab[:]
    bigv = jnp.int32(big)

    def cond(c):
        i, _, changed = c
        return jnp.logical_and(i < iters, changed)

    def body(c):
        i, lab, _ = c
        m = _min3(_min3(lab, 0), 1)
        # re-gate background from the resident input tile: background
        # pixels hold BIG and must never adopt a neighbour's label
        new = jnp.where(lab0 >= bigv, bigv, m)
        # early exit once the tile converges: extra iterations are
        # no-ops, so this is exactly equivalent to running all of them;
        # typical tiles settle in ~an object diameter (<10 iters), so
        # the check (~one compare+reduce) pays for itself several-fold
        return (i + 1, new, jnp.any(new != lab))

    _, lab, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), lab0, jnp.bool_(True)))
    out_ref[:] = lab[halo:halo + th, LANE_HALO:LANE_HALO + tw]


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def label_propagate_pallas(lab, iters: int = 32, interpret: bool = False):
    """Run ``iters`` masked 3x3 min-pool label iterations in one pass.

    lab : (H, W) int32 — per-pixel label (flat index + 1) for foreground,
        the ``H*W + 2`` BIG sentinel for background.

    Returns the propagated (H, W) int32 labels (background still BIG).
    """
    H, W = lab.shape
    halo = -(-iters // 8) * 8            # row halo, sublane-aligned
    if halo > LANE_HALO:
        raise ValueError(f"iters={iters} needs lane halo > {LANE_HALO}")

    tw = 512 if W >= 512 else 128
    th = 512 if H >= 512 else 8
    Hp = -(-H // th) * th
    Wp = -(-W // tw) * tw
    grid = (Hp // th, Wp // tw)
    hh, ww = th + 2 * halo, tw + 2 * LANE_HALO

    bigc = int(H * W + 2)
    lab_p = jnp.pad(lab, ((halo, halo + Hp - H),
                          (LANE_HALO, LANE_HALO + Wp - W)),
                    constant_values=bigc)

    kern = functools.partial(_prop_kernel, th=th, tw=tw, halo=halo,
                             iters=iters, big=bigc)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((hh, ww), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(lab_p)
    return out[:H, :W]

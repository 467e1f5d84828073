"""Per-source window gather as concurrent DMAs (Pallas kernel).

The catalog stages (segment moments, aperture photometry, PSF
photometry/vignettes, transient vetting) fetch a small square window
around every source from full-frame images.  Under ``vmap`` a batched
``lax.dynamic_slice`` lowers to an XLA gather measured at ~9 us per
window regardless of window size (PERF_NOTES.md) — at a 20k-slot
catalog capacity the gathers, not the per-window math, dominate every
catalog stage.  The reference never pays this shape of cost: its
SExtractor/PSFEx catalogs are exactly-sized host arrays walked by C
loops (/root/reference via zogy's run_sextractor — SURVEY.md §2.4).

Here each grid step issues a block of independent async HBM->VMEM
copies — one strided DMA per window — and waits for them together, so
the per-window cost is DMA issue overhead (~100 ns) instead of a
serialized gather, and blocks wholly past the live-source count are
skipped (zeros) exactly like :func:`blackbox_tpu.ops.windows.
chunked_slot_map`.  Windows are exact pixel copies, so downstream
results are bit-identical to the dynamic-slice path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_windows(size: int) -> int:
    """Windows per grid step: enough concurrent DMAs to hide latency,
    bounded so the (blk, size, lane-padded size) VMEM block stays small."""
    if size <= 48:
        return 16
    if size <= 112:
        return 8
    return 4


def _gather_kernel(y0_ref, x0_ref, nact_ref, *refs, n_img, size, blk):
    imgs = refs[:n_img]
    outs = refs[n_img:2 * n_img]
    sems = refs[2 * n_img]
    base = pl.program_id(0) * blk

    def dma(k, j):
        y = y0_ref[base + j]
        x = x0_ref[base + j]
        return pltpu.make_async_copy(
            imgs[k].at[pl.ds(y, size), pl.ds(x, size)],
            outs[k].at[j], sems.at[k, j])

    @pl.when(base < nact_ref[0])
    def _():
        for k in range(n_img):
            for j in range(blk):
                dma(k, j).start()
        for k in range(n_img):
            for j in range(blk):
                dma(k, j).wait()

    @pl.when(base >= nact_ref[0])
    def _():
        for k in range(n_img):
            outs[k][:] = jnp.zeros_like(outs[k])


@functools.partial(jax.jit,
                   static_argnames=("size", "interpret", "blk"))
def gather_windows(images, y0, x0, size: int, n_active=None,
                   interpret: bool = False, blk: int | None = None):
    """Gather ``(N, size, size)`` windows from each full-frame image.

    images   : tuple of (H, W) arrays (shared shape, any dtypes).
    y0, x0   : (N,) int starts, already clipped to [0, H-size]/[0, W-size]
               (``lax.dynamic_slice`` clamps; DMA must not read OOB, so
               this clips again defensively).
    n_active : traced count — blocks of slots starting at or past it are
               skipped and return zeros (chunk semantics identical to
               ops.windows.chunked_slot_map).

    Returns a tuple of (N, size, size) stacks, exact pixel copies.
    """
    imgs = tuple(images)
    H, W = imgs[0].shape
    for im in imgs[1:]:
        if im.shape != (H, W):
            raise ValueError("all images must share (H, W)")
    N = y0.shape[0]
    if blk is None:
        blk = _block_windows(size)
    nsteps = -(-N // blk)
    npad = nsteps * blk - N

    y0 = jnp.clip(y0.astype(jnp.int32), 0, H - size)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, W - size)
    if npad:
        y0 = jnp.pad(y0, (0, npad))
        x0 = jnp.pad(x0, (0, npad))
    nact = jnp.full((1,), N if n_active is None else n_active, jnp.int32)

    kern = functools.partial(_gather_kernel, n_img=len(imgs), size=size,
                             blk=blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(imgs),
        out_specs=tuple(
            pl.BlockSpec((blk, size, size), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in imgs),
        scratch_shapes=[pltpu.SemaphoreType.DMA((len(imgs), blk))],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((nsteps * blk, size, size), im.dtype)
            for im in imgs),
        interpret=interpret,
    )(y0, x0, nact, *imgs)
    if npad:
        outs = tuple(o[:N] for o in outs)
    return outs

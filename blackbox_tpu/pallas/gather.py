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

Each grid step issues a block of independent async HBM->VMEM copies —
one per window — and waits for them together, so the per-window cost is
DMA issue overhead instead of a serialized gather; blocks wholly past
the live-source count are skipped (zeros) exactly like
:func:`blackbox_tpu.ops.windows.chunked_slot_map`.

HBM slice indices must be tile-aligned ((8, 128) for 4-byte dtypes —
Mosaic refuses to ``memref_slice`` at unproven offsets; pass BLOCK
indices and multiply by the tile size in-kernel so the alignment is
provable), so each DMA fetches the enclosing aligned ``(Sh, Sw)``
super-window and the kernel rotates it in VMEM by the sub-tile offset
(``pltpu.roll`` with a traced shift) before writing the exact
``(size, size)`` window out.  Windows are exact pixel copies, so
downstream results are bit-identical to the dynamic-slice path.

STATUS: opt-in (``BBTPU_PALLAS_GATHER=1``).  Measured on a real v5e at
10.5k², 3 images, 48² windows, 20k slots / 4k live: 43.2 ms vs 161.9 ms
for a DENSE vmapped ``dynamic_slice`` — but the production path chunks
by the live count (ops.windows.chunked_slot_map), which lands ~33 ms
for the same work: the XLA gather actually costs ~2.7 us/window-image,
not the 9 us this kernel was designed against, and the DMA-issue +
rotate overhead eats the difference.  Useful only when most of the slot
capacity is live.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 8      # f32/i32 sublane tile
_LANE = 128   # lane tile


def _block_windows(size: int) -> int:
    """Windows per grid step: enough concurrent DMAs to hide latency,
    bounded so the per-image (blk, Sh, Sw) VMEM scratch stays small."""
    if size <= 48:
        return 16
    if size <= 112:
        return 8
    return 4


def _gather_kernel(ya_ref, xa_ref, dy_ref, dx_ref, nact_ref, *refs,
                   n_img, size, blk, sh, sw):
    imgs = refs[:n_img]
    outs = refs[n_img:2 * n_img]
    scr = refs[2 * n_img:3 * n_img]
    sems = refs[3 * n_img]
    base = pl.program_id(0) * blk

    def dma(k, j):
        # ya/xa hold BLOCK indices; multiplying by the tile size here
        # gives Mosaic a provably (8,128)-aligned slice offset (it does
        # no value-range analysis on prefetched scalars)
        y = ya_ref[base + j] * _SUB
        x = xa_ref[base + j] * _LANE
        return pltpu.make_async_copy(
            imgs[k].at[pl.ds(y, sh), pl.ds(x, sw)],
            scr[k].at[j], sems.at[k, j])

    @pl.when(base < nact_ref[0])
    def _():
        for k in range(n_img):
            for j in range(blk):
                dma(k, j).start()
        for k in range(n_img):
            for j in range(blk):
                dma(k, j).wait()
        for k in range(n_img):
            for j in range(blk):
                dy = dy_ref[base + j]
                dx = dx_ref[base + j]
                w = scr[k][j]
                # roll semantics: out[i] = in[(i - shift) mod n]; we
                # want out[i] = in[i + dy], i.e. shift = (n - dy) mod n
                w = pltpu.roll(w, jax.lax.rem(sh - dy, sh), 0)
                w = pltpu.roll(w, jax.lax.rem(sw - dx, sw), 1)
                outs[k][j] = w[:size, :size]

    @pl.when(base >= nact_ref[0])
    def _():
        for k in range(n_img):
            outs[k][:] = jnp.zeros_like(outs[k])


@functools.partial(jax.jit,
                   static_argnames=("size", "interpret", "blk"))
def gather_windows(images, y0, x0, size: int, n_active=None,
                   interpret: bool = False, blk: int | None = None):
    """Gather ``(N, size, size)`` windows from each full-frame image.

    images   : tuple of (H, W) arrays (shared shape; sub-4-byte dtypes
               are widened for the DMA and cast back).
    y0, x0   : (N,) int starts, clipped to [0, H-size]/[0, W-size] like
               ``lax.dynamic_slice``.
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
    in_dtypes = tuple(im.dtype for im in imgs)

    def _wide(im):
        if im.dtype.itemsize == 4:
            return im
        if im.dtype.itemsize > 4:
            # narrowing would silently lose mantissa/high bits and break
            # the exact-pixel-copy contract
            raise TypeError(f"gather_windows: unsupported 8-byte dtype "
                            f"{im.dtype}; cast explicitly if lossy is ok")
        if jnp.issubdtype(im.dtype, jnp.floating):
            return im.astype(jnp.float32)
        return im.astype(jnp.int32)

    imgs = tuple(_wide(im) for im in imgs)

    N = y0.shape[0]
    if blk is None:
        blk = _block_windows(size)
    nsteps = -(-N // blk)
    npad = nsteps * blk - N

    # aligned super-windows: (Sh, Sw) at (8, 128)-aligned offsets always
    # enclose the requested (size, size) window at (y0, x0); images are
    # edge-padded so the super-window never leaves the array
    sh = -(-size // _SUB) * _SUB + _SUB
    sw = -(-size // _LANE) * _LANE + _LANE
    Hp = -(-H // _SUB) * _SUB + _SUB
    Wp = -(-W // _LANE) * _LANE + _LANE
    imgs = tuple(jnp.pad(im, ((0, Hp - H), (0, Wp - W))) for im in imgs)

    y0 = jnp.clip(y0.astype(jnp.int32), 0, H - size)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, W - size)
    ya = y0 // _SUB            # block indices (kernel scales them back)
    xa = x0 // _LANE
    dy = y0 - ya * _SUB
    dx = x0 - xa * _LANE
    if npad:
        ya = jnp.pad(ya, (0, npad))
        xa = jnp.pad(xa, (0, npad))
        dy = jnp.pad(dy, (0, npad))
        dx = jnp.pad(dx, (0, npad))
    nact = jnp.full((1,), N if n_active is None else n_active, jnp.int32)

    kern = functools.partial(_gather_kernel, n_img=len(imgs), size=size,
                             blk=blk, sh=sh, sw=sw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(imgs),
        out_specs=tuple(
            pl.BlockSpec((blk, size, size), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in imgs),
        scratch_shapes=[pltpu.VMEM((blk, sh, sw), im.dtype)
                        for im in imgs]
        + [pltpu.SemaphoreType.DMA((len(imgs), blk))],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((nsteps * blk, size, size), im.dtype)
            for im in imgs),
        interpret=interpret,
    )(ya, xa, dy, dx, nact, *imgs)
    outs = tuple(o[:N] if npad else o for o in outs)
    return tuple(o.astype(dt) if o.dtype != dt else o
                 for o, dt in zip(outs, in_dtypes))

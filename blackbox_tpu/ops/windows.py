"""Chunked per-source window mapping with early exit.

The catalog stages (segment moments, aperture photometry, PSF
photometry) process a *fixed-capacity* slot axis (``max_sources``,
typically 20k) so the jitted program keeps static shapes; but a typical
frame fills only a quarter of the capacity, and the vmapped
``dynamic_slice`` window gathers are the dominant cost at ~9 us per
window regardless of content (PERF_NOTES.md).  The reference never pays
this: SExtractor's catalogs are exactly-sized host arrays
(/root/reference via zogy's run_sextractor — SURVEY.md §2.4).

:func:`chunked_slot_map` restores data-dependent cost without dynamic
shapes: slots are processed in fixed chunks under a ``fori_loop``, and a
``lax.cond`` skips every chunk that lies entirely past the (traced)
active-slot count — TPUs execute only the taken cond branch, so the
window gathers for empty capacity are never issued.  Skipped slots
return zeros; callers already gate on ``valid``/``k <= n`` flags.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_slot_windows(images, y0, x0, size: int, n_active=None,
                        chunk: int = 2048, use_pallas: bool | None = None):
    """Gather (N, size, size) windows from each (H, W) image at shared
    start coordinates (clipped like ``lax.dynamic_slice``).

    On TPU the windows are fetched by the Pallas DMA kernel
    (:mod:`blackbox_tpu.pallas.gather`) — one strided async copy per
    window, a block of them in flight per grid step — instead of the
    ~9 us/window XLA gather a vmapped ``dynamic_slice`` lowers to
    (PERF_NOTES.md).  Slots past ``n_active`` are skipped in blocks and
    return zeros.  Both paths return exact pixel copies.

    images : one (H, W) array or a tuple of them (shared shape).
    Returns the stack, or a tuple of stacks matching ``images``.
    """
    single = not isinstance(images, (tuple, list))
    imgs = (images,) if single else tuple(images)
    H, W = imgs[0].shape
    if use_pallas is None:
        import os
        # OPT-IN (BBTPU_PALLAS_GATHER=1): on a real v5e the DMA kernel
        # is bit-exact but NOT faster at production catalog sizes —
        # 43.2 ms vs ~33 ms chunked dynamic_slice for 4k live windows
        # (48², 3 images; dynslice measures 2.7 us/window-image dense,
        # not the 9 us the kernel was built against) — the per-window
        # DMA issue + in-VMEM rotate costs about what the XLA gather
        # does.  Kept for frames with very large live catalogs, where
        # block-skipping beats dense gathers.
        use_pallas = (jax.default_backend() == "tpu"
                      and os.environ.get("BBTPU_PALLAS_GATHER",
                                         "0") == "1")
    if use_pallas:
        from blackbox_tpu.pallas.gather import gather_windows
        outs = gather_windows(imgs, y0, x0, size, n_active=n_active)
    else:
        y0c = jnp.clip(y0.astype(jnp.int32), 0, H - size)
        x0c = jnp.clip(x0.astype(jnp.int32), 0, W - size)

        def one(y0i, x0i):
            return tuple(
                jax.lax.dynamic_slice(im, (y0i, x0i), (size, size))
                for im in imgs)

        outs = chunked_slot_map(one, (y0c, x0c), n_active=n_active,
                                chunk=chunk)
    return outs[0] if single else outs


def chunked_slot_map(fn, args, n_active=None, chunk: int = 2048):
    """``jax.vmap(fn)(*args)`` over the leading slot axis, skipping
    chunks of slots whose start index is ``>= n_active``.

    fn       : per-slot function; positional args are one slot's slices
               of ``args``; returns an array pytree.
    args     : tuple of arrays sharing the leading (capacity) axis.
    n_active : traced int — slots at index >= n_active yield zeros.
               ``None`` means all slots are active (plain vmap).
    chunk    : static chunk size (skip granularity).
    """
    cap = args[0].shape[0]
    if n_active is None or cap <= chunk:
        return jax.vmap(fn)(*args)

    nch = -(-cap // chunk)
    pad = nch * chunk - cap
    padded = tuple(
        jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)) for a in args)

    out_sds = jax.eval_shape(
        jax.vmap(fn),
        *(jax.ShapeDtypeStruct((chunk,) + a.shape[1:], a.dtype)
          for a in padded))
    zeros = jax.tree_util.tree_map(
        lambda t: jnp.zeros(t.shape, t.dtype), out_sds)
    acc0 = jax.tree_util.tree_map(
        lambda t: jnp.zeros((nch * chunk,) + t.shape[1:], t.dtype),
        out_sds)

    def body(c, acc):
        start = c * chunk
        sl = tuple(jax.lax.dynamic_slice_in_dim(a, start, chunk, 0)
                   for a in padded)
        res = jax.lax.cond(start < n_active,
                           lambda s: jax.vmap(fn)(*s),
                           lambda s: zeros, sl)
        return jax.tree_util.tree_map(
            lambda a, r: jax.lax.dynamic_update_slice_in_dim(
                a, r, start, 0), acc, res)

    acc = jax.lax.fori_loop(0, nch, body, acc0)
    if pad:
        acc = jax.tree_util.tree_map(lambda a: a[:cap], acc)
    return acc

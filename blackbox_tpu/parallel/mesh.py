"""Device-mesh parallelism for frame batches and frame tiles.

The reference parallelises one image per process / SLURM job (SURVEY.md
§2.3); the TPU-native equivalents are

* **batch (data) parallel**: a stack of frames sharded over a ``data``
  mesh axis — the jitted reduce pipeline vmaps over the batch and GSPMD
  partitions it with no code changes;
* **spatial (tile) parallel**: one mosaic sharded along columns over a
  ``tile`` axis for the stencil-heavy stages, with explicit halo exchange
  via ``ppermute`` inside ``shard_map`` (the analogue of sequence/context
  parallelism for a 10.5k-pixel frame — SURVEY.md §5.7).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(n_data: int, n_tile: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_tile
    dev = np.asarray(devices[:n]).reshape(n_data, n_tile)
    return Mesh(dev, axis_names=("data", "tile"))


def halo_exchange_cols(block, halo: int, axis_name: str = "tile"):
    """Pad a column-sharded block with ``halo`` columns from neighbours.

    Returns (H, W_local + 2*halo); the outermost shards are edge-padded
    (replicated border, matching the single-device stencil semantics).
    """
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)
    right_edge = block[:, -halo:]
    left_edge = block[:, :halo]
    # send my right edge to my right neighbour (it becomes their left halo)
    from_left = lax.ppermute(right_edge, axis_name,
                             perm=[(i, (i + 1) % n) for i in range(n)])
    from_right = lax.ppermute(left_edge, axis_name,
                              perm=[(i, (i - 1) % n) for i in range(n)])
    # outermost shards: replicate own border instead of the wrapped data
    from_left = jnp.where(idx == 0, jnp.repeat(block[:, :1], halo, axis=1),
                          from_left)
    from_right = jnp.where(idx == n - 1,
                           jnp.repeat(block[:, -1:], halo, axis=1),
                           from_right)
    return jnp.concatenate([from_left, block, from_right], axis=1)


def sharded_stencil(fn, mesh: Mesh, halo: int, axis_name: str = "tile"):
    """Wrap ``fn(padded_block) -> block`` as a column-sharded shard_map.

    ``fn`` receives a block padded by ``halo`` columns on both sides and
    must return the unpadded-width result.
    """
    @partial(jax.shard_map, mesh=mesh, in_specs=P(None, axis_name),
             out_specs=P(None, axis_name))
    def run(block):
        return fn(halo_exchange_cols(block, halo, axis_name))

    return run


def lacosmic_sharded(data, inmask, rdnoise, mesh: Mesh, params=None,
                     halo: int = 32, axis_name: str = "tile"):
    """L.A.Cosmic over a column-sharded mosaic — the PRODUCTION stencil
    chain under spatial parallelism, not a toy filter.

    Each shard runs the full dense 3-iteration pipeline on its block
    plus a ``halo``-column ppermute exchange.  The chain's influence
    radius is 9 px/iteration (detect 7 + clean 2), so 32 columns cover
    niter=3 with margin and the result is exactly the single-device
    dense path (parity asserted in tests/test_parallel.py).
    """
    import dataclasses

    from blackbox_tpu.ops.cosmics import LACosmicParams, lacosmic

    p = dataclasses.replace(params or LACosmicParams(), windowed=False,
                            use_pallas=False)
    need = 9 * p.niter + 3
    if halo < need:
        raise ValueError(f"halo {halo} < influence radius {need}")

    W_total = data.shape[1]

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(None, axis_name), P(None, axis_name)),
             out_specs=(P(None, axis_name), P(None, axis_name)))
    def run(block, mblock):
        pb = halo_exchange_cols(block, halo, axis_name)
        pm = halo_exchange_cols(mblock.astype(jnp.float32), halo,
                                axis_name) > 0.5
        # global column origin of the PADDED block: border restores must
        # key on frame borders, not shard seams
        col0 = lax.axis_index(axis_name) * block.shape[1] - halo
        clean, crm, _ = lacosmic(pb, pm, rdnoise, p,
                                 coords=(col0, W_total))
        return clean[:, halo:-halo], crm[:, halo:-halo]

    if inmask is None:
        inmask = jnp.zeros(data.shape, bool)
    return run(data, inmask)


def median3x3_sharded(img, mesh: Mesh, axis_name: str = "tile"):
    """3x3 median filter over a column-sharded mosaic (halo = 1)."""

    def stencil(padded):
        H, Wp = padded.shape
        pv = jnp.pad(padded, ((1, 1), (0, 0)), mode="edge")
        views = [pv[dy:dy + H, dx:dx + Wp - 2]
                 for dy in range(3) for dx in range(3)]
        return jnp.median(jnp.stack(views, 0), axis=0)

    return sharded_stencil(stencil, mesh, halo=1, axis_name=axis_name)(img)


def shard_batch(batch_pytree, mesh: Mesh):
    """Place a leading-batch pytree with the batch axis over 'data'."""
    from jax.sharding import NamedSharding
    sh = NamedSharding(mesh, P("data"))

    def put(x):
        return jax.device_put(x, NamedSharding(
            mesh, P(*(("data",) + (None,) * (x.ndim - 1)))))

    return jax.tree_util.tree_map(put, batch_pytree)


def make_batched_reduce(ctx, mesh: Mesh, with_catalog: bool = True):
    """Jitted multi-frame reduce, batch axis sharded over 'data'.

    This is the production throughput path: the per-frame program vmaps
    over a frame stack and GSPMD partitions the batch across the mesh —
    N chips reduce N frames per step with no cross-device traffic (the
    reference runs one SLURM job per frame instead; SURVEY.md §2.3).

    Returns ``fn(chan (B,C,y,x), osv, osh) -> pytree`` with a leading
    batch axis on every output; call :func:`shard_batch` on the inputs.
    """
    from blackbox_tpu.pipeline.reduce import (
        calibrate_detector, extract_catalog)

    def one(chan, osv, osh):
        sci, mask_m, stats = calibrate_detector(
            ctx, chan, osv, osh, None, None, None, None)
        out = {"image": sci, "mask": mask_m, "stats": stats}
        if with_catalog:
            ext = extract_catalog(ctx, sci, mask_m)
            out["stats"] = {**stats, **ext["stats"]}
            out["cat"] = ext["cat"]
        return out

    # shard_map over 'data' with a SEQUENTIAL per-device lax.map, not
    # vmap+GSPMD: the extraction path's Pallas kernels (labelprop) have
    # no vmap batching rule on TPU ("Pallas TPU lowering supports
    # ANY-space blocks only with trivial index_map" — measured on v5e),
    # and one frame already saturates a chip so intra-device batching
    # buys nothing (PERF_NOTES.md).  Devices still run their shards in
    # parallel, and per-frame math is bit-identical to the single-frame
    # program (lax.map cannot change reduction order; vmap could).
    def per_device(chan, osv, osh):
        return jax.lax.map(lambda t: one(*t), (chan, osv, osh))

    fn = jax.shard_map(per_device, mesh=mesh,
                       in_specs=(P("data"), P("data"), P("data")),
                       out_specs=P("data"), check_vma=False)
    return jax.jit(fn)

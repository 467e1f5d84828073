"""Tile-sharded source extraction: one mosaic over a column mesh.

The spatial-parallel analogue of the reference's one-process-per-image
model (SURVEY.md §5.7): the pixel-bound extraction stages — background
mesh, mini2back, matched filter, threshold and connected-component
labeling — run on column shards with explicit halo exchange, then the
per-source tail (:func:`blackbox_tpu.pipeline.reduce.catalog_tail`)
consumes the reassembled planes unchanged, so the sharded path is
bit-identical to :func:`extract_catalog` by construction:

* box stats are box-local → per-shard mesh columns + tiny ``all_gather``;
* the mesh median filter and nan-fill run replicated on the gathered
  (ny, nx) mesh (sub-ms);
* mini2back's two matmuls take the shard's column slice of the
  Catmull-Rom weight matrix — the contraction over mesh nodes is
  unchanged, only output columns are partitioned;
* the matched filter's column pass reads a ``radius``-column halo
  (zero-filled at frame edges, exactly the single-device zero pad);
* label propagation exchanges a ONE-column label halo per iteration
  (42 KB ppermutes) and pins GLOBAL flat-index labels, so iteration k
  of the sharded pool sees exactly what iteration k of the dense pool
  sees — the cross-shard root merge is the exchange itself, and the
  iteration-bounded semantics match the single-device
  :func:`label_components` pool path bit for bit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from blackbox_tpu.core import maskbits


def _halo_cols_fill(block, halo: int, fill, axis_name: str):
    """Column halo exchange with CONSTANT fill at the frame borders
    (stencils that zero-pad / init-pad, unlike the replicate-edge
    exchange in :func:`blackbox_tpu.parallel.mesh.halo_exchange_cols`)."""
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)
    right_edge = block[:, -halo:]
    left_edge = block[:, :halo]
    from_left = lax.ppermute(right_edge, axis_name,
                             perm=[(i, (i + 1) % n) for i in range(n)])
    from_right = lax.ppermute(left_edge, axis_name,
                              perm=[(i, (i - 1) % n) for i in range(n)])
    f = jnp.full_like(left_edge, fill)
    from_left = jnp.where(idx == 0, f, from_left)
    from_right = jnp.where(idx == n - 1, f, from_right)
    return jnp.concatenate([from_left, block, from_right], axis=1)


def extract_pixel_stages_sharded(ctx, sci, mask_m, mesh: Mesh,
                                 axis_name: str = "tile"):
    """Sharded background + detection.  Inputs/outputs are full-frame
    logical arrays laid out ``P(None, axis_name)``; returns
    (sub, bkg, bstd, seg, n, mesh_med, mesh_std) with the planes
    column-sharded and the scalars/meshes replicated."""
    from blackbox_tpu.ops.background import (_catmull_rom_matrix,
                                             _mesh_median_filter,
                                             box_stats)
    from blackbox_tpu.ops.detection import gaussian_kernel1d

    H, W = sci.shape
    n_tile = mesh.shape[axis_name]
    W_local = W // n_tile
    box = ctx.bkg_boxsize
    if W % n_tile or W_local % box:
        raise ValueError(
            f"width {W} must split into {n_tile} shards of whole "
            f"{box}-px background boxes")
    ny, nx = H // box, W // box
    Wy = jnp.asarray(_catmull_rom_matrix(H, ny, box))
    Wx = jnp.asarray(_catmull_rom_matrix(W, nx, box))
    k = gaussian_kernel1d(ctx.det_params.fwhm_filter)
    r = (k.shape[0] - 1) // 2
    p = ctx.det_params
    big = jnp.int32(H * W + 2)
    imax = jnp.iinfo(jnp.int32).max

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(None, axis_name), P(None, axis_name)),
             out_specs=(P(None, axis_name), P(None, axis_name),
                        P(None, axis_name), P(None, axis_name),
                        P(), P(), P()),
             check_vma=False)
    def run(sci_b, mask_b):
        ti = lax.axis_index(axis_name)
        x0 = ti * W_local

        # ---- background: local box stats, replicated mesh filter ----
        med_loc, std_loc = box_stats(sci_b, mask_b != 0, box,
                                     nsigma=ctx.bkg_nsigma)
        med = lax.all_gather(med_loc, axis_name, axis=1, tiled=True)
        std = lax.all_gather(std_loc, axis_name, axis=1, tiled=True)
        med = jnp.nan_to_num(med, nan=jnp.nanmedian(med))
        std = jnp.nan_to_num(std, nan=jnp.nanmedian(std))
        if ctx.bkg_filtersize > 1:
            med = _mesh_median_filter(med, ctx.bkg_filtersize)
            std = _mesh_median_filter(std, ctx.bkg_filtersize)
        # mini2back REPLICATED at full width, then slice this shard's
        # columns: a sliced weight matrix changes the matmul's shape
        # and with it the ulp-level accumulation (measured 1.5e-7
        # relative on CPU), which can flip threshold pixels — identical
        # shapes keep the sharded path bit-equal to the dense one.  The
        # redundant FLOPs are ~2% of frame time; the (H, W) temporary
        # dies inside this block.
        up_m = jnp.matmul(Wy, med, precision="highest")
        up_s = jnp.matmul(Wy, std, precision="highest")
        bkg_b = lax.dynamic_slice_in_dim(
            jnp.matmul(up_m, Wx.T, precision="highest"), x0, W_local, 1)
        bstd_b = lax.dynamic_slice_in_dim(
            jnp.matmul(up_s, Wx.T, precision="highest"), x0, W_local, 1)
        sub_b = sci_b - bkg_b

        # ---- matched filter: rows are shard-complete; the column pass
        # reads an r-column halo (zero fill = the dense zero pad) ----
        t = k.shape[0]
        pad_r = jnp.pad(sub_b, ((r, r), (0, 0)))
        fy = jnp.zeros_like(sub_b)
        for i in range(t):
            fy = fy + k[i] * pad_r[i:i + H, :]
        fyp = _halo_cols_fill(fy, r, 0.0, axis_name)
        filt = jnp.zeros_like(sub_b)
        for i in range(t):
            filt = filt + k[i] * fyp[:, i:i + W_local]

        excl_b = (mask_b & (maskbits.EDGE | maskbits.BAD
                            | maskbits.SATELLITE)) != 0
        det = (filt > p.nsigma * jnp.maximum(bstd_b, 1e-6)) & ~excl_b

        # ---- labeling: global flat-index labels, one-column halo per
        # iteration (the cross-shard merge) ----
        cols = jnp.arange(W_local, dtype=jnp.int32) + x0
        gidx = (jnp.arange(H, dtype=jnp.int32)[:, None] * W
                + cols[None, :] + 1)
        lab = jnp.where(det, gidx, big)

        def body(_, lab):
            lp = _halo_cols_fill(lab, 1, imax, axis_name)
            nb = lax.reduce_window(lp, imax, lax.min, (3, 1), (1, 1),
                                   "SAME")
            nb = lax.reduce_window(nb, imax, lax.min, (1, 3), (1, 1),
                                   "VALID")
            return jnp.where(det, nb, big)

        lab = lax.fori_loop(0, p.label_iters, body, lab)
        seg_b = jnp.where(det, lab, 0)
        n = lax.psum(jnp.sum((det & (lab == gidx)).astype(jnp.int32)),
                     axis_name)
        return sub_b, bkg_b, bstd_b, seg_b, n, med, std

    return run(sci, mask_m)


def extract_catalog_sharded(ctx, sci, mask_m, mesh: Mesh,
                            axis_name: str = "tile"):
    """Tile-sharded :func:`extract_catalog`: sharded pixel stages, then
    the shared per-source tail on the reassembled planes.

    The tail runs REPLICATED inside shard_map (every device executes
    the literal single-device program on the gathered planes): left to
    GSPMD — even with replicated-constrained inputs — the PSF-fit
    linear algebra gets partitioned into different matmul shapes whose
    ulp-level accumulation breaks bit-parity with the dense path
    (measured 6e-7 relative on flux_psf).  The gather is the tail's
    natural data dependence anyway (its windowed per-source gathers
    reach across the whole frame); the redundant per-device compute is
    the small per-source stage, not the sharded pixel stages."""
    from blackbox_tpu.pipeline.reduce import catalog_tail

    sub, bkg, bstd, seg, n, med, std = extract_pixel_stages_sharded(
        ctx, sci, mask_m, mesh, axis_name)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(None, axis_name), P(None, axis_name),
                       P(None, axis_name), P(None, axis_name),
                       P(None, axis_name), P(), P(), P()),
             out_specs=P(), check_vma=False)
    def tail2(sci_b, sub_b, bkg_b, bstd_b, seg_b, n_r, med_r, std_r):
        sci_r = lax.all_gather(sci_b, axis_name, axis=1, tiled=True)
        sub_r = lax.all_gather(sub_b, axis_name, axis=1, tiled=True)
        bkg_r = lax.all_gather(bkg_b, axis_name, axis=1, tiled=True)
        bstd_r = lax.all_gather(bstd_b, axis_name, axis=1, tiled=True)
        seg_r = lax.all_gather(seg_b, axis_name, axis=1, tiled=True)
        return catalog_tail(ctx, sci_r, sub_r, bkg_r, bstd_r, seg_r,
                            n_r, med_r, std_r)

    return tail2(sci, sub, bkg, bstd, seg, n, med, std)

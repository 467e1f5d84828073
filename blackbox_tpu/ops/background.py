"""Sky-background mesh estimation and full-resolution interpolation.

Replaces the SExtractor/zogy background machinery the reference leans on
(`bkg_boxsize`/`bkg_filtersize` from set_zogy, `zogy.mini2back` consumed at
/root/reference/buildref.py:2480-2493): per-box sigma-clipped median/STD
meshes, 3x3 median filtering of the mesh, and bicubic (Catmull-Rom)
upsampling to full resolution expressed as two dense matmuls — an
MXU-shaped formulation that makes mini->back essentially free on TPU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from blackbox_tpu.ops.stats import sorted_clipped_stats


def background_mesh(image, mask, boxsize: int, nsigma: float = 3.0,
                    filtersize: int = 3):
    """Sigma-clipped median/STD background mesh.

    image : (H, W); mask : bool (True = excluded) or None
    Returns (bkg_mini (ny, nx), std_mini (ny, nx)).
    """
    med, std = box_stats(image, mask, boxsize, nsigma)
    med = jnp.nan_to_num(med, nan=jnp.nanmedian(med))
    std = jnp.nan_to_num(std, nan=jnp.nanmedian(std))

    if filtersize > 1:
        med = _mesh_median_filter(med, filtersize)
        std = _mesh_median_filter(std, filtersize)
    return med, std


def box_stats(image, mask, boxsize: int, nsigma: float = 3.0):
    """Raw per-box clipped median/STD (NaN where a box is fully masked).

    The per-box computation is strictly box-local, so a column-sharded
    mosaic computes its mesh columns independently and ``all_gather``
    reassembles the exact single-device mesh (parallel/extract.py)."""
    H, W = image.shape
    ny, nx = H // boxsize, W // boxsize
    # large boxes: row-strided subsample per box — the reference's
    # get_rand_indices does the same statistically (random pixel
    # subsets, ~13k samples per 256-box at its default fraction) to
    # bound the clipping cost.  Rows only: row slices stay contiguous
    # on TPU (a 2-D ::2,::2 stride lowers as a gather that costs more
    # than it saves).  step 8 -> 8k samples per 256-box (mesh noise
    # ~1.1% of sigma) and halves the mesh cost (146 -> 80 ms/frame)
    step = 8 if boxsize >= 128 and boxsize % 8 == 0 else \
        (4 if boxsize >= 64 and boxsize % 4 == 0 else 1)
    img = image[:ny * boxsize:step, :nx * boxsize]
    bs = boxsize // step
    tiles = img.reshape(ny, bs, nx, boxsize).swapaxes(1, 2).reshape(
        ny, nx, -1)
    if mask is None:
        tbad = jnp.zeros(tiles.shape, bool)
    else:
        msk = mask[:ny * boxsize:step, :nx * boxsize]
        tbad = msk.reshape(ny, bs, nx, boxsize).swapaxes(1, 2).reshape(
            ny, nx, -1)

    # single-sort clipped statistics (sort dominates the mesh cost; the
    # interval formulation gives the same clip for one sort, ~80->35 ms)
    med, _, std, _ = sorted_clipped_stats(tiles, tbad, sigma=nsigma,
                                          iters=3)
    return med, std


def _mesh_median_filter(mesh, k: int):
    p = k // 2
    mp = jnp.pad(mesh, p, mode="edge")
    ny, nx = mesh.shape
    views = [mp[dy:dy + ny, dx:dx + nx] for dy in range(k) for dx in range(k)]
    return jnp.median(jnp.stack(views, 0), axis=0)


def _catmull_rom_matrix(n_out: int, n_mesh: int, boxsize: int) -> np.ndarray:
    """Dense (n_out, n_mesh) Catmull-Rom interpolation matrix.

    Mesh node i sits at pixel centre (i + 0.5) * boxsize - 0.5; edge nodes
    are replicated (clamped) outside the grid.
    """
    W = np.zeros((n_out, n_mesh), np.float32)
    centers0 = 0.5 * boxsize - 0.5
    for y in range(n_out):
        t = (y - centers0) / boxsize
        i0 = int(np.floor(t))
        u = t - i0
        # Catmull-Rom weights for nodes i0-1 .. i0+2
        w = np.array([
            0.5 * (-u ** 3 + 2 * u ** 2 - u),
            0.5 * (3 * u ** 3 - 5 * u ** 2 + 2),
            0.5 * (-3 * u ** 3 + 4 * u ** 2 + u),
            0.5 * (u ** 3 - u ** 2),
        ], np.float32)
        for j, wi in zip(range(i0 - 1, i0 + 3), w):
            W[y, min(max(j, 0), n_mesh - 1)] += wi
    return W


def mini2back(mesh, out_shape, boxsize: int, use_pallas: bool = False):
    """Bicubic upsample of a background mesh to full resolution.

    ``Wy @ mesh @ Wx.T`` with precomputed Catmull-Rom weight matrices
    (host-built, shape (H, ny) and (W, nx)).  The XLA matmul pair costs
    ~27.5 ms per 10.5k² call on v5e — identical across matmul
    precisions, so not MXU-pass-bound; a Pallas per-tile version
    (:mod:`blackbox_tpu.pallas.upsample`) is bit-identical but SLOWER
    (45.2 ms: per-tile K=41 matmuls pipeline worse than one big one),
    so the matmul stays the default; ``use_pallas=True`` opts in.
    """
    H, W = out_shape
    ny, nx = mesh.shape
    Wy = jnp.asarray(_catmull_rom_matrix(H, ny, boxsize))
    Wx = jnp.asarray(_catmull_rom_matrix(W, nx, boxsize))
    if use_pallas:
        from blackbox_tpu.pallas.upsample import upsample_mesh_pallas
        return upsample_mesh_pallas((mesh,), Wy, Wx, (H, W))[0]
    # full-precision matmuls: the background must be sub-ADU accurate
    # (bf16 MXU default would leave ~0.4% * sky-level errors)
    up = jnp.matmul(Wy, mesh, precision="highest")
    return jnp.matmul(up, Wx.T, precision="highest")

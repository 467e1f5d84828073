"""Background-mesh bicubic upsample as a Pallas tile kernel.

``ops.background.mini2back`` expands the (ny, nx) sigma-clipped mesh to
full frame resolution with two Catmull-Rom weight matmuls.  As plain XLA
matmuls this is stuck at ~29 ms per 10.5k² call regardless of matmul
precision (measured on v5e — the skinny K=41 contraction tiles poorly
and the op cannot fuse with its consumers), while the true cost is one
446 MB output write (~1 ms of HBM).  The reference gets the same
product from SExtractor's C bilinear background interpolation (via
zogy's mini2back — SURVEY.md §2.5).

Here each grid step computes one (th, tw) output tile as two TINY
matmuls entirely in VMEM — ``Wy[i·th:, :] @ mesh @ Wx[j·tw:, :].T`` with
the whole (ny, nx) mesh resident (a few KB) — so the kernel is a pure
streaming write.  Weights are f32 and the dots run at highest matmul
precision; on chip the result is bit-identical to the jnp path.

STATUS: opt-in (``mini2back(..., use_pallas=True)``).  Measured on v5e
at 10.5k²: 45.2 ms vs the XLA matmul's 27.5 ms — 861 per-tile K=41
matmuls at HIGHEST precision pipeline worse than one large fused pair,
and the op is nowhere near its ~1 ms write bound either way.  Kept as
the starting point for a future VPU banded-tap formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _up_kernel(wy_ref, wx_ref, *refs, n_img):
    meshes = refs[:n_img]
    outs = refs[n_img:]
    wy = wy_ref[:]                      # (th, ny)
    wx = wx_ref[:]                      # (tw, nx)
    for k in range(n_img):
        up = jax.lax.dot_general(
            wy, meshes[k][:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)          # (th, nx)
        outs[k][:] = jax.lax.dot_general(
            up, wx[:], (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)          # (th, tw)


@functools.partial(jax.jit, static_argnames=("out_shape", "interpret"))
def upsample_mesh_pallas(meshes, Wy, Wx, out_shape, interpret=False):
    """Evaluate ``Wy @ mesh @ Wx.T`` for each mesh, tile by tile.

    meshes    : tuple of (ny, nx) f32 mesh images
    Wy, Wx    : (H, ny) / (W, nx) f32 banded Catmull-Rom weights
    out_shape : (H, W)

    Returns a tuple of (H, W) f32 upsampled maps.
    """
    meshes = tuple(jnp.asarray(m, jnp.float32) for m in meshes)
    H, W = out_shape
    ny, nx = meshes[0].shape
    th = 256 if H % 256 == 0 else 8
    tw = 512
    Hp = -(-H // th) * th
    Wp = -(-W // tw) * tw
    Wy = jnp.asarray(Wy, jnp.float32)
    Wx = jnp.asarray(Wx, jnp.float32)
    if Hp != H:
        Wy = jnp.pad(Wy, ((0, Hp - H), (0, 0)))
    if Wp != W:
        Wx = jnp.pad(Wx, ((0, Wp - W), (0, 0)))
    grid = (Hp // th, Wp // tw)

    kern = functools.partial(_up_kernel, n_img=len(meshes))
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((th, ny), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tw, nx), lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((ny, nx), lambda i, j: (0, 0),
                        memory_space=pltpu.VMEM)] * len(meshes),
        out_specs=tuple(
            pl.BlockSpec((th, tw), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
            for _ in meshes),
        out_shape=tuple(
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)
            for _ in meshes),
        interpret=interpret,
    )(Wy, Wx, *meshes)
    return tuple(o[:H, :W] for o in outs)

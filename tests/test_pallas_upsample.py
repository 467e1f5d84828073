"""Interpret-mode parity of the Pallas mesh upsample vs the matmul path."""
import numpy as np
import jax.numpy as jnp

from blackbox_tpu.ops.background import mini2back, _catmull_rom_matrix
from blackbox_tpu.pallas.upsample import upsample_mesh_pallas


def test_upsample_matches_matmul_path():
    rng = np.random.default_rng(3)
    H = W = 1024
    box = 128
    ny = nx = 8
    mesh = (200.0 + 5.0 * rng.standard_normal((ny, nx))).astype(np.float32)
    ref = np.asarray(mini2back(jnp.asarray(mesh), (H, W), box,
                               use_pallas=False))
    Wy = _catmull_rom_matrix(H, ny, box)
    Wx = _catmull_rom_matrix(W, nx, box)
    got = np.asarray(upsample_mesh_pallas(
        (jnp.asarray(mesh),), Wy, Wx, (H, W), interpret=True)[0])
    # same weights, same contraction; only f32 dot order may differ
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-3)


def test_upsample_pair_and_nonmultiple_width():
    rng = np.random.default_rng(4)
    H, W = 520, 650                       # th=8 fallback, padded width
    box = 130
    ny, nx = 4, 5
    m1 = rng.standard_normal((ny, nx)).astype(np.float32)
    m2 = rng.standard_normal((ny, nx)).astype(np.float32)
    Wy = _catmull_rom_matrix(H, ny, box)
    Wx = _catmull_rom_matrix(W, nx, box)
    o1, o2 = upsample_mesh_pallas(
        (jnp.asarray(m1), jnp.asarray(m2)), Wy, Wx, (H, W),
        interpret=True)
    r1 = Wy @ m1 @ Wx.T
    r2 = Wy @ m2 @ Wx.T
    np.testing.assert_allclose(np.asarray(o1), r1, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o2), r2, atol=1e-4)

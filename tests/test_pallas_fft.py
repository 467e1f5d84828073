"""Parity of the Pallas split-real mixed-radix FFT vs numpy.

The kernel replaces pyfftw-inside-zogy transforms of the reference
(SURVEY.md §2.4) with a VMEM-resident split-f32 butterfly pipeline;
tests run the interpreter path on the CPU mesh.  Layout invariants
(scrambled spectrum + frequency maps) are covered host-side.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from blackbox_tpu.pallas.fft import (
    fft_cols_split, fft2_split, ifft2_split,
    plan, spectrum_perm, spectrum_freqs,
)


def test_plan_factors():
    assert plan(10752) == (512, 21, 9)
    assert plan(256) == (256, 1, 8)
    assert plan(1280) == (256, 5, 8)
    with pytest.raises(ValueError):
        plan(10560)        # odd part 165 unsupported
    with pytest.raises(ValueError):
        plan(84)           # cofactor 4 < 8


def test_spectrum_maps_are_inverse_permutations():
    for N in (32, 96, 1280):
        p = spectrum_perm(N)
        f = spectrum_freqs(N)
        assert sorted(p) == list(range(N))
        np.testing.assert_array_equal(f[p], np.arange(N))


@pytest.mark.parametrize("N", [16, 96, 160, 352, 448, 1344])
def test_fft_cols_parity(rng, N):
    L = 128
    xr = rng.standard_normal((N, L)).astype(np.float32)
    xi = rng.standard_normal((N, L)).astype(np.float32)
    yr, yi = fft_cols_split(jnp.asarray(xr), jnp.asarray(xi),
                            interpret=True)
    got = (np.asarray(yr) + 1j * np.asarray(yi))[spectrum_perm(N)]
    ref = np.fft.fft(xr + 1j * xi, axis=0)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 3e-6

    # inverse: scrambled in, natural out, with 1/N scaling
    zr, zi = fft_cols_split(yr, yi, inverse=True, scale=1.0 / N,
                            interpret=True)
    assert np.abs(np.asarray(zr) - xr).max() < 1e-4
    assert np.abs(np.asarray(zi) - xi).max() < 1e-4


def test_fft2_roundtrip_and_freq_layout(rng):
    H, W = 256, 384
    xr = rng.standard_normal((H, W)).astype(np.float32)
    xi = rng.standard_normal((H, W)).astype(np.float32)
    yr, yi = fft2_split(jnp.asarray(xr), jnp.asarray(xi), interpret=True)
    assert yr.shape == (W, H)       # transposed scrambled layout

    # unscramble host-side and compare to numpy fft2
    z = (np.asarray(yr) + 1j * np.asarray(yi))
    z = z[spectrum_perm(W)][:, spectrum_perm(H)].T
    ref = np.fft.fft2(xr + 1j * xi)
    assert np.abs(z - ref).max() / np.abs(ref).max() < 3e-6

    # spectrum_freqs maps each physical cell to its (u, v)
    fu = spectrum_freqs(H)
    fv = spectrum_freqs(W)
    p, q = 37, 101
    assert z[fu[q], fv[p]] == pytest.approx(
        complex(np.asarray(yr)[p, q] + 1j * np.asarray(yi)[p, q]),
        rel=1e-5)

    zr, zi = ifft2_split(yr, yi, interpret=True)
    assert np.abs(np.asarray(zr) - xr).max() < 2e-5
    assert np.abs(np.asarray(zi) - xi).max() < 2e-5


def test_forward_packs_two_real_frames(rng):
    """re=a, im=b: unpacking by hermitian symmetry recovers both specs."""
    N = 160
    a = rng.standard_normal((N, 128)).astype(np.float32)
    b = rng.standard_normal((N, 128)).astype(np.float32)
    yr, yi = fft_cols_split(jnp.asarray(a), jnp.asarray(b), interpret=True)
    Z = (np.asarray(yr) + 1j * np.asarray(yi))[spectrum_perm(N)]
    Zm = np.conj(Z[(-np.arange(N)) % N])
    A = 0.5 * (Z + Zm)
    B = -0.5j * (Z - Zm)
    np.testing.assert_allclose(A, np.fft.fft(a, axis=0), atol=2e-4)
    np.testing.assert_allclose(B, np.fft.fft(b, axis=0), atol=2e-4)

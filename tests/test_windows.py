import pytest
"""Chunked slot mapping (ops.windows): parity with the dense vmap path.

The chunked map must be bit-identical to plain vmap for every slot
below ``n_active`` and return zeros above it — the catalog stages gate
those slots on ``valid`` flags.
"""

import numpy as np
import jax
import jax.numpy as jnp

from blackbox_tpu.ops.windows import chunked_slot_map


def test_chunked_map_matches_vmap(rng):
    img = jnp.asarray(rng.normal(size=(200, 210)).astype(np.float32))
    cap, chunk = 50, 8
    y0 = jnp.asarray(rng.integers(0, 180, cap), jnp.int32)
    x0 = jnp.asarray(rng.integers(0, 190, cap), jnp.int32)

    def one(y, x):
        w = jax.lax.dynamic_slice(img, (y, x), (16, 16))
        return jnp.sum(w), jnp.max(w)

    dense = jax.vmap(one)(y0, x0)
    n = jnp.int32(21)         # mid-chunk: chunk 2 is partially active
    got = jax.jit(lambda nn: chunked_slot_map(
        one, (y0, x0), n_active=nn, chunk=chunk))(n)

    # chunks 0..2 cover slots 0..23 (>= n 21): all computed exactly
    for d, g in zip(dense, got):
        np.testing.assert_array_equal(np.asarray(d[:24]),
                                      np.asarray(g[:24]))
        assert np.all(np.asarray(g[24:]) == 0)


def test_chunked_map_all_active_and_none(rng):
    xs = jnp.asarray(rng.normal(size=(20, 4)).astype(np.float32))

    def one(v):
        return v * 2.0

    np.testing.assert_array_equal(
        np.asarray(chunked_slot_map(one, (xs,), n_active=jnp.int32(20),
                                    chunk=6)),
        np.asarray(jax.vmap(one)(xs)))
    np.testing.assert_array_equal(
        np.asarray(chunked_slot_map(one, (xs,), n_active=None)),
        np.asarray(jax.vmap(one)(xs)))


@pytest.mark.slow
def test_extract_catalog_chunked_matches_dense(rng):
    """End-to-end: catalog stages give identical results whether the
    capacity is chunk-skipped or densely mapped."""
    from blackbox_tpu.ops.detection import (
        DetectParams, detect_segments, segment_catalog)
    from blackbox_tpu.ops.photometry import aperture_photometry
    from blackbox_tpu.ops.psf import PSFParams, build_psf, psf_photometry

    H = W = 256
    sub = rng.normal(0, 1.0, (H, W)).astype(np.float32)
    xs = rng.uniform(30, W - 30, 40)
    ys = rng.uniform(30, H - 30, 40)
    g = np.arange(H, dtype=np.float32)
    for x, y in zip(xs, ys):
        sub += 2000.0 * np.exp(
            -0.5 * (((g[None, :] - x) ** 2 + (g[:, None] - y) ** 2)
                    / 1.8 ** 2))
    sub = jnp.asarray(sub)
    bstd = jnp.ones((H, W), jnp.float32)

    p = DetectParams(max_sources=4096, label_iters=16)
    seg, n = detect_segments(sub, bstd, None, p)
    cat = segment_catalog(sub, bstd, seg, n, p)
    dense_flux, _ = aperture_photometry(sub, bstd, cat["x"], cat["y"],
                                        (3.0, 6.0))
    chunk_flux, _ = aperture_photometry(sub, bstd, cat["x"], cat["y"],
                                        (3.0, 6.0), n_active=n)
    nn = int(n)
    assert 0 < nn < 4096
    # chunked and dense compile to different reduction orders: equal to
    # float rounding, not bit-exact
    np.testing.assert_allclose(np.asarray(dense_flux[:nn]),
                               np.asarray(chunk_flux[:nn]), rtol=1e-5)

    cat["snr"] = dense_flux[:, -1]
    cat["elong"] = jnp.ones_like(dense_flux[:, -1])
    pp = PSFParams(size=15, snr_min=100.0)
    m_d = build_psf(sub, bstd, cat, (H, W), pp)
    m_c = build_psf(sub, bstd, cat, (H, W), pp, n_active=n)
    np.testing.assert_allclose(np.asarray(m_d.basis),
                               np.asarray(m_c.basis), atol=1e-6)

    f_d, e_d = psf_photometry(sub, bstd, m_d, cat["x"], cat["y"])
    f_c, e_c = psf_photometry(sub, bstd, m_d, cat["x"], cat["y"],
                              n_active=n)
    np.testing.assert_allclose(np.asarray(f_d[:nn]),
                               np.asarray(f_c[:nn]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(e_d[:nn]),
                               np.asarray(e_c[:nn]), rtol=1e-5)

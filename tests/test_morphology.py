import pytest
"""scipy.ndimage parity for the device binary-morphology ops.

The reference uses binary_dilation / binary_closing / binary_fill_holes
in mask_init and fill_sat_holes (blackbox.py:4556-4596); these are the
golden oracles here.
"""
import numpy as np
import jax.numpy as jnp
import scipy.ndimage as ndi

from blackbox_tpu.ops.morphology import (
    binary_dilation, binary_closing, fill_holes)


def _blobby(rng, shape=(97, 130)):
    m = rng.random(shape) < 0.003
    m = ndi.binary_dilation(m, np.ones((5, 5)))
    # a ring with a hole (the fill_holes target)
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    r = np.hypot(yy - 40, xx - 60)
    m |= (r > 8) & (r < 12)
    # a border-touching concavity that must NOT be filled
    m[0:3, 20:40] = True
    return m


def test_dilation_matches_scipy(rng):
    m = _blobby(rng)
    got = np.asarray(binary_dilation(jnp.asarray(m), 2))
    ref = ndi.binary_dilation(m, np.ones((3, 3)), iterations=2)
    np.testing.assert_array_equal(got, ref)


def test_closing_matches_scipy(rng):
    m = _blobby(rng)
    got = np.asarray(binary_closing(jnp.asarray(m)))
    ref = ndi.binary_closing(m, np.ones((3, 3)))
    # scipy erodes with border_value=0, identical semantics interior;
    # compare away from the 1-px border
    np.testing.assert_array_equal(got[1:-1, 1:-1], ref[1:-1, 1:-1])


def test_fill_holes_matches_scipy(rng):
    m = _blobby(rng)
    got = np.asarray(fill_holes(jnp.asarray(m), iterations=3))
    ref = ndi.binary_fill_holes(m)
    np.testing.assert_array_equal(got, ref)


def test_fill_holes_spiral_needs_rounds(rng):
    """A spiral cavity exercises multi-round sweep convergence."""
    m = np.zeros((64, 64), bool)
    # square spiral wall
    lo, hi = 4, 59
    while hi - lo > 6:
        m[lo, lo:hi] = True
        m[lo:hi, hi] = True
        m[hi, lo + 4:hi] = True
        m[lo + 4:hi, lo] = True
        lo += 4
        hi -= 4
    ref = ndi.binary_fill_holes(m)
    got = np.asarray(fill_holes(jnp.asarray(m), iterations=12))
    np.testing.assert_array_equal(got, ref)


def test_fill_holes_vmapped(rng):
    import jax
    ms = np.stack([_blobby(rng), _blobby(rng)])
    got = np.asarray(jax.vmap(lambda a: fill_holes(a, 3))(jnp.asarray(ms)))
    for k in range(2):
        np.testing.assert_array_equal(got[k], ndi.binary_fill_holes(ms[k]))


def test_satcon_close_fill_matches_separate_calls(rng):
    from blackbox_tpu.ops.morphology import satcon_close_fill
    m = jnp.asarray(_blobby(rng))
    satcon, filled = satcon_close_fill(m, fill_iters=1)
    dil = binary_dilation(m, 1)
    ref_satcon = dil & ~m
    ref_filled = fill_holes(binary_closing(m | ref_satcon), 1)
    assert np.array_equal(np.asarray(satcon), np.asarray(ref_satcon))
    assert np.array_equal(np.asarray(filled), np.asarray(ref_filled))


@pytest.mark.slow
def test_euler_count_matches_int_formulation(rng):
    import jax.numpy as _jnp
    from blackbox_tpu.ops.labeling import euler_count

    def euler_int(mask):
        m = np.pad(np.asarray(mask).astype(np.int32), 1)
        a = m[:-1, :-1]; b = m[:-1, 1:]; c = m[1:, :-1]; d = m[1:, 1:]
        s = a + b + c + d
        q1 = np.sum(s == 1); q3 = np.sum(s == 3)
        qd = np.sum((s == 2) & (a == d) & (a != b))
        return (q1 - q3 - 2 * qd) // 4

    for shape in [(33, 64), (40, 61), (97, 96)]:   # W%32==0 edge incl.
        m = rng.random(shape) < 0.2
        m[0, -1] = True                            # border corners live
        m[-1, 0] = True
        assert int(euler_count(_jnp.asarray(m))) == int(euler_int(m))
    # hole-free blobs: count equals scipy component count
    m = _blobby(rng)
    filled = ndi.binary_fill_holes(m)
    _, ncomp = ndi.label(filled, structure=np.ones((3, 3), bool))
    assert int(euler_count(_jnp.asarray(filled))) == ncomp

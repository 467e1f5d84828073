"""Parity of the Pallas sorted-column median kernel vs the jnp path."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from blackbox_tpu.ops.filters import median_filter  # noqa: E402
from blackbox_tpu.pallas.medians import median_filter_pallas  # noqa: E402


@pytest.mark.parametrize("k", [3, 5, 7])
def test_median_parity_interpret(k, rng):
    img = rng.normal(100.0, 20.0, (48, 300)).astype(np.float32)
    # a few extreme outliers to exercise rank selection
    img[10, 40] = 1e6
    img[30, 250] = -1e6
    ref = np.asarray(median_filter(jnp.asarray(img), k, strip_rows=16))
    out = np.asarray(median_filter_pallas(
        jnp.asarray(img), k, th=16, tw=128, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_median_parity_multitile(rng):
    # multiple tiles in both grid dimensions, non-divisible shape
    img = rng.normal(0.0, 1.0, (70, 530)).astype(np.float32)
    ref = np.asarray(median_filter(jnp.asarray(img), 5, strip_rows=32))
    out = np.asarray(median_filter_pallas(
        jnp.asarray(img), 5, th=32, tw=256, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_lacosmic_pallas_medians_routing(rng):
    """lacosmic(pallas_medians=True) is bit-identical to the jnp strip
    path (the kernel runs interpreted off-TPU)."""
    from blackbox_tpu.ops.cosmics import LACosmicParams, lacosmic

    img = rng.normal(100.0, 5.0, (64, 160)).astype(np.float32)
    for y, x in [(10, 20), (40, 90), (50, 140)]:
        img[y, x] += 400.0          # cosmic hits
    inmask = np.zeros(img.shape, bool)
    base = dict(strip_rows=32, windowed=False)
    a = lacosmic(jnp.asarray(img), jnp.asarray(inmask), 9.0,
                 LACosmicParams(pallas_medians=False, **base))
    b = lacosmic(jnp.asarray(img), jnp.asarray(inmask), 9.0,
                 LACosmicParams(pallas_medians=True, **base))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))

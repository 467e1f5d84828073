import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blackbox_tpu.ops.cosmics import lacosmic, LACosmicParams
from blackbox_tpu.pallas.lacosmic import lacosmic_pallas


def _scene(rng, H=264, W=264, sky=300.0, ncr=40):
    img = rng.poisson(sky, (H, W)).astype(np.float32)
    cx = rng.integers(16, W - 16, ncr)
    cy = rng.integers(16, H - 16, ncr)
    amp = rng.uniform(3000, 30000, ncr)
    for x, y, a in zip(cx, cy, amp):
        img[y, x] += a
    return img, cx, cy


@pytest.mark.slow
def test_pallas_matches_jnp_interpret(rng):
    """The fused kernel (interpreter mode) reproduces the jnp path."""
    img, cx, cy = _scene(rng)
    inmask = np.zeros(img.shape, bool)
    inmask[50:60, 50:60] = True

    p = LACosmicParams(sigclip=10.0, strip_rows=66)
    clean_j, cr_j, cnt_j = lacosmic(jnp.asarray(img), jnp.asarray(inmask),
                                    jnp.float32(10.0), p)
    clean_p, cr_p, cnt_p = lacosmic_pallas(
        jnp.asarray(img), jnp.asarray(inmask), jnp.float32(10.0),
        sigclip=10.0, niter=3, interpret=True)

    # interiors agree (the jnp path restores original frame borders,
    # the kernel edge-pads them; both conventions are fine)
    s = slice(4, -4)
    cr_j = np.asarray(cr_j)[s, s]
    cr_p = np.asarray(cr_p)[s, s]
    agree = (cr_j == cr_p).mean()
    assert agree > 0.9999, agree

    cl_j = np.asarray(clean_j)[s, s]
    cl_p = np.asarray(clean_p)[s, s]
    both = cr_j == cr_p
    np.testing.assert_allclose(cl_p[both], cl_j[both], rtol=1e-5,
                               atol=0.1)

    # every injected cosmic found, masked region untouched
    crm = np.asarray(cr_p)
    hits = sum(1 for x, y in zip(cx, cy)
               if 4 <= x < img.shape[1] - 4 and 4 <= y < img.shape[0] - 4
               and crm[y - 4, x - 4])
    assert hits >= 0.95 * len(cx)
    assert not np.asarray(cr_p)[slice(50 - 4, 60 - 4),
                                slice(50 - 4, 60 - 4)].any()


def test_pallas_tile_gridding(rng):
    """Multi-tile grids agree with single-tile (halo correctness)."""
    img, cx, cy = _scene(rng, H=132, W=264, ncr=25)
    a = lacosmic_pallas(jnp.asarray(img), None, jnp.float32(10.0),
                        sigclip=10.0, niter=2, interpret=True)
    crm = np.asarray(a[1])
    hits = sum(1 for x, y in zip(cx, cy) if crm[y, x])
    assert hits >= 0.9 * len(cx)

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blackbox_tpu.config.defaults import ReductionSettings
from blackbox_tpu.core.geometry import TINY
from blackbox_tpu.ops.cosmics import LACosmicParams
from blackbox_tpu.ops.detection import DetectParams
from blackbox_tpu.ops.satdet import SatDetParams
from blackbox_tpu.parallel.mesh import (
    make_mesh, make_batched_reduce, median3x3_sharded, shard_batch)
from blackbox_tpu.pipeline.reduce import ReduceContext, make_reduce_fn
from blackbox_tpu.synth import make_raw_science


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _ctx():
    s = ReductionSettings(geometry=TINY)
    return ReduceContext.from_settings(
        s, "ML1",
        lac_params=LACosmicParams(sigclip=10.0, strip_rows=66),
        det_params=DetectParams(nsigma=1.5, max_sources=256,
                                label_iters=24),
        sat_params=SatDetParams(bin_factor=2, nsigma=8.0,
                                trail_halfwidth=4),
        bkg_boxsize=33, apphot_radii=(2.0, 4.5, 9.0))


def test_batched_reduce_matches_single(rng):
    """8-way data-parallel reduce == per-frame reduce, bit for bit."""
    ctx = _ctx()
    geom = TINY
    frames = []
    for i in range(8):
        raw, _ = make_raw_science(geom, np.random.default_rng(100 + i),
                                  nstars=20, ncosmics=4, trail=False,
                                  nsat=0)
        frames.append(geom.split_raw(raw))
    batch = tuple(jnp.stack([np.asarray(f[k]) for f in frames])
                  for k in range(3))

    mesh = make_mesh(8, 1)
    fn = make_batched_reduce(ctx, mesh)
    sb = shard_batch(batch, mesh)
    out = fn(*sb)
    assert out["image"].shape[0] == 8

    # single-frame reference on device 0
    single = make_reduce_fn(ctx)
    ref = single(jnp.asarray(frames[3][0]), jnp.asarray(frames[3][1]),
                 jnp.asarray(frames[3][2]), None, None, None, None)
    np.testing.assert_array_equal(np.asarray(out["image"][3]),
                                  np.asarray(ref["image"]))
    np.testing.assert_array_equal(np.asarray(out["mask"][3]),
                                  np.asarray(ref["mask"]))
    assert int(out["stats"]["nobjects"][3]) == \
        int(ref["stats"]["nobjects"])

    # the batch really is sharded over 8 devices
    assert len(out["image"].sharding.device_set) == 8


def test_median3x3_sharded_matches_dense(rng):
    img = jnp.asarray(rng.normal(0, 1, (64, 128)).astype(np.float32))
    mesh = make_mesh(1, 8)
    from jax.sharding import NamedSharding, PartitionSpec as P
    img_sh = jax.device_put(img, NamedSharding(mesh, P(None, "tile")))
    out = jax.jit(lambda x: median3x3_sharded(x, mesh))(img_sh)

    # dense reference
    pv = jnp.pad(img, 1, mode="edge")
    views = [pv[dy:dy + 64, dx:dx + 128]
             for dy in range(3) for dx in range(3)]
    ref = jnp.median(jnp.stack(views, 0), axis=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6)

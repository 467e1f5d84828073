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


@pytest.mark.slow
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


def test_lacosmic_sharded_matches_dense(rng):
    """The PRODUCTION cosmic-ray chain, column-sharded over 4 tiles,
    must equal the single-device dense result bit for bit — including
    at shard seams and true frame borders."""
    from blackbox_tpu.ops.cosmics import lacosmic
    from blackbox_tpu.parallel.mesh import lacosmic_sharded

    H, W = 96, 512
    img = rng.normal(300.0, 12.0, (H, W)).astype(np.float32)
    # cosmics ON shard seams (cols 128/256/384), at frame border, and
    # in the bulk
    for (y, x) in [(40, 128), (41, 127), (50, 256), (20, 384),
                   (3, 2), (60, 300), (90, 509)]:
        img[y, x] += 4000.0
    inm = np.zeros((H, W), bool)
    inm[10, 100:140] = True
    rdn = 10.0
    p = LACosmicParams(sigclip=8.0, strip_rows=32, windowed=False)

    cd, md, nd = jax.jit(lambda d, m: lacosmic(d, m, rdn, p))(
        jnp.asarray(img), jnp.asarray(inm))

    mesh = make_mesh(2, 4)
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P(None, "tile"))
    img_s = jax.device_put(jnp.asarray(img), sh)
    inm_s = jax.device_put(jnp.asarray(inm), sh)
    cs, ms = jax.jit(lambda d, m: lacosmic_sharded(
        d, m, rdn, mesh, p))(img_s, inm_s)

    np.testing.assert_array_equal(np.asarray(md), np.asarray(ms))
    np.testing.assert_array_equal(np.asarray(cd), np.asarray(cs))
    assert np.asarray(ms).sum() >= 7


def test_init_multihost_two_processes(tmp_path):
    """A REAL 2-process jax.distributed group on the CPU backend:
    both processes see the global device set and agree on a psum."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent("""
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        import jax
        jax.config.update("jax_platforms", "cpu")
        from blackbox_tpu.parallel.distributed import init_multihost
        pid = int(sys.argv[1])
        ok = init_multihost(coordinator="127.0.0.1:%s",
                            num_processes=2, process_id=pid)
        assert ok
        import jax.numpy as jnp
        assert jax.process_count() == 2, jax.process_count()
        assert jax.device_count() == 4, jax.device_count()
        from jax.experimental import multihost_utils
        val = multihost_utils.broadcast_one_to_all(jnp.int32(pid + 41))
        assert int(val) == 41         # process 0's value wins
        print("MULTIHOST_OK", pid, flush=True)
    """) % 29517
    procs = [subprocess.Popen(
        [sys.executable, "-c", script, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd="/root/repo", text=True) for i in range(2)]
    outs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            pr.kill()
            out, _ = pr.communicate()
        outs.append(out)
    for i, out in enumerate(outs):
        assert f"MULTIHOST_OK {i}" in out, out[-2000:]


def test_extract_catalog_sharded_parity(rng):
    """Tile-sharded extraction (background mesh + mini2back + matched
    filter + labelprop with cross-shard root merge) == single-device
    extract_catalog, bit for bit, including sources ON shard seams."""
    from blackbox_tpu.core import maskbits
    from blackbox_tpu.parallel.extract import extract_catalog_sharded
    from blackbox_tpu.pipeline.reduce import extract_catalog

    s = ReductionSettings(geometry=TINY)
    ctx = ReduceContext.from_settings(
        s, "ML1",
        det_params=DetectParams(nsigma=1.5, max_sources=256,
                                label_iters=24, moment_window=16,
                                moment_window_big=32, nbig_max=32),
        bkg_boxsize=16, apphot_radii=(2.0, 4.5, 9.0))

    H, W = 132, 320                       # TINY red mosaic
    img = rng.normal(200.0, 5.0, (H, W)).astype(np.float32)
    # gaussian stars: in the bulk, ON the 4-way seams (80/160/240),
    # straddling a seam, at the frame border
    yy, xx = np.mgrid[0:H, 0:W]
    for (yc, xc, f) in [(30, 40, 900.0), (50, 80, 1200.0),
                        (70, 160, 700.0), (90, 240, 1500.0),
                        (20, 158, 800.0), (64, 82, 650.0),
                        (5, 300, 1000.0), (128, 10, 1100.0)]:
        img += f * np.exp(-((yy - yc) ** 2 + (xx - xc) ** 2)
                          / (2 * 1.8 ** 2)).astype(np.float32)
    mask = np.zeros((H, W), np.uint8)
    mask[0:2, :] = maskbits.EDGE
    mask[100, 200:210] = maskbits.BAD

    sci = jnp.asarray(img)
    msk = jnp.asarray(mask)
    dense = jax.jit(lambda a, b: extract_catalog(ctx, a, b))(sci, msk)

    mesh = make_mesh(2, 4)
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P(None, "tile"))
    sharded = jax.jit(lambda a, b: extract_catalog_sharded(
        ctx, a, b, mesh))(jax.device_put(sci, sh),
                          jax.device_put(msk, sh))

    assert int(dense["stats"]["nobjects"]) >= 8
    assert int(sharded["stats"]["nobjects"]) == \
        int(dense["stats"]["nobjects"])
    np.testing.assert_array_equal(np.asarray(sharded["bkg"]),
                                  np.asarray(dense["bkg"]))
    np.testing.assert_array_equal(np.asarray(sharded["bkg_std"]),
                                  np.asarray(dense["bkg_std"]))
    for k in ("x", "y", "flux_iso", "npix", "peak", "valid",
              "flux_ap", "fluxerr_ap"):
        np.testing.assert_array_equal(
            np.asarray(sharded["cat"][k]), np.asarray(dense["cat"][k]),
            err_msg=k)
    # the PSF spatial-polynomial fit compiles with different FMA
    # contraction inside the shard_map manual region (measured 6e-7
    # relative on a handful of slots) — everything upstream of the fit
    # is bit-exact, so bound these two keys at float32 noise instead
    for k in ("flux_psf", "fluxerr_psf"):
        np.testing.assert_allclose(
            np.asarray(sharded["cat"][k]), np.asarray(dense["cat"][k]),
            rtol=1e-5, err_msg=k)
    for k in dense["stats"]:
        np.testing.assert_allclose(
            np.asarray(sharded["stats"][k]),
            np.asarray(dense["stats"][k]), rtol=1e-5, atol=1e-6,
            err_msg=k)


def test_batched_reduce_two_process_parity(tmp_path):
    """The PRODUCTION batched reduce executed on a REAL 2-process mesh
    (the DCN axis of SURVEY §5.8, not just initialization): one CPU
    device per process, a 2-frame batch sharded over 'data', and each
    process asserts its addressable shard is bit-identical to the
    single-device per-frame program."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent("""
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        import jax
        jax.config.update("jax_platforms", "cpu")
        import numpy as np
        from blackbox_tpu.parallel.distributed import init_multihost
        pid = int(sys.argv[1])
        assert init_multihost(coordinator="127.0.0.1:29533",
                              num_processes=2, process_id=pid)
        assert jax.device_count() == 4
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from blackbox_tpu.core.geometry import TINY
        from blackbox_tpu.config.defaults import ReductionSettings
        from blackbox_tpu.ops.cosmics import LACosmicParams
        from blackbox_tpu.ops.detection import DetectParams
        from blackbox_tpu.ops.satdet import SatDetParams
        from blackbox_tpu.pipeline.reduce import (ReduceContext,
                                                  make_reduce_fn)
        from blackbox_tpu.parallel.mesh import (make_mesh,
                                                make_batched_reduce)
        from blackbox_tpu.synth import make_raw_science

        s = ReductionSettings(geometry=TINY)
        ctx = ReduceContext.from_settings(
            s, "ML1",
            lac_params=LACosmicParams(sigclip=10.0, strip_rows=66),
            det_params=DetectParams(nsigma=1.5, max_sources=256,
                                    label_iters=24),
            sat_params=SatDetParams(bin_factor=2, nsigma=8.0,
                                    trail_halfwidth=4),
            bkg_boxsize=33, apphot_radii=(2.0, 4.5, 9.0))

        # both processes build BOTH frames deterministically
        frames = []
        for i in range(2):
            raw, _ = make_raw_science(
                TINY, np.random.default_rng(300 + i), nstars=20,
                ncosmics=4, trail=False, nsat=0)
            frames.append(TINY.split_raw(raw))
        batch = tuple(np.stack([np.asarray(f[k]) for f in frames])
                      for k in range(3))

        # ONE device per process: jax.devices() orders process 0's
        # devices first, so ids 0 and 2 straddle the process boundary
        devs = jax.devices()
        assert devs[0].process_index != devs[2].process_index
        mesh = make_mesh(2, 1, devices=[devs[0], devs[2]])

        def put(x):
            sh = NamedSharding(
                mesh, P(*(("data",) + (None,) * (x.ndim - 1))))
            return jax.make_array_from_callback(
                x.shape, sh, lambda idx: x[idx])

        out = make_batched_reduce(ctx, mesh)(*map(put, batch))

        # this process hosts exactly one frame of the batch
        img_sh = [sh for sh in out["image"].addressable_shards]
        assert len(img_sh) == 1
        k = img_sh[0].index[0].start or 0
        got_img = np.asarray(img_sh[0].data)[0]
        got_mask = np.asarray(
            out["mask"].addressable_shards[0].data)[0]

        ref = make_reduce_fn(ctx)(
            jnp.asarray(frames[k][0]), jnp.asarray(frames[k][1]),
            jnp.asarray(frames[k][2]), None, None, None, None)
        np.testing.assert_array_equal(got_img, np.asarray(ref["image"]))
        np.testing.assert_array_equal(got_mask, np.asarray(ref["mask"]))
        ns = out["stats"]["nobjects"]
        mine = np.asarray(ns.addressable_shards[0].data)[0]
        assert int(mine) == int(np.asarray(ref["stats"]["nobjects"]))
        print("BATCHED_2PROC_OK", pid, "frame", k, flush=True)
    """)
    procs = [subprocess.Popen(
        [sys.executable, "-c", script, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd="/root/repo", text=True) for i in range(2)]
    outs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            pr.kill()
            out, _ = pr.communicate()
        outs.append(out)
    for i, out in enumerate(outs):
        assert f"BATCHED_2PROC_OK {i}" in out, out[-3000:]
    # both frames of the batch were covered, one per process
    covered = {out.split("frame")[-1].strip()[:1] for out in outs}
    assert covered == {"0", "1"}, outs

"""Per-stage steady timings of the production reduce chain on the chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from blackbox_tpu.utils.compilecache import (enable_persistent_cache,
                                             host_fingerprint)
enable_persistent_cache(f"/tmp/jax_cache_blackbox_tpu_drive_{host_fingerprint()}")

from blackbox_tpu.core.geometry import MEERLICHT
from blackbox_tpu.config.defaults import ReductionSettings
from blackbox_tpu.pipeline.reduce import (ReduceContext, calibrate_detector,
                                          extract_catalog)
from blackbox_tpu.ops.cosmics import LACosmicParams, lacosmic
from blackbox_tpu.ops.detection import (DetectParams, detect_segments,
                                        segment_catalog, moments_shape)
from blackbox_tpu.ops.background import background_mesh, mini2back
from blackbox_tpu.ops.photometry import aperture_photometry
from blackbox_tpu.ops.psf import build_psf, psf_photometry
from blackbox_tpu.ops.satdet import detect_trails
from blackbox_tpu.ops.masking import build_mask
from blackbox_tpu.core import maskbits
from blackbox_tpu.synth.device import make_science_device

print("device:", jax.devices()[0])
geom = MEERLICHT
s = ReductionSettings(geometry=geom)
ctx = ReduceContext.from_settings(
    s, "ML1", lac_params=LACosmicParams(strip_rows=264),
    det_params=DetectParams(max_sources=20000, label_iters=32))

key = jax.random.PRNGKey(12345)
gen = jax.jit(lambda k: make_science_device(
    k, geom, nstars=4000, ncosmics=800, trail=True, nsat=20)[:3])
args = jax.block_until_ready(gen(key))
C = geom.n_chan
shape3 = (C, geom.ysize_chan, geom.xsize_chan)
k1, k2 = jax.random.split(jax.random.PRNGKey(99))
mbias = jax.block_until_ready(
    jax.jit(lambda k: 0.5 * jax.random.normal(k, shape3))(k1))
mflat = jax.block_until_ready(
    jax.jit(lambda k: 1.0 + 0.02 * jax.random.normal(k, shape3))(k2))
xtalk = np.random.default_rng(0).uniform(-2e-4, 2e-4, (C, C)).astype(
    np.float32)

cal = jax.jit(lambda c, v, h, mb, mf: calibrate_detector(
    ctx, c, v, h, mb, mf, None, xtalk))
sci, mask_m, stats = jax.block_until_ready(cal(*args, mbias, mflat))
print("calibrated; ncosmics:", int(stats["ncosmics"]))


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8].astype(jnp.float32)))


def t_stage(name, fn, *a, n=3):
    out = fn(*a)
    sync(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for i in range(n):
        aa = list(a)
        aa[0] = aa[0] + jnp.asarray(1e-7 * (i + 1), aa[0].dtype) \
            if jnp.issubdtype(aa[0].dtype, jnp.floating) else aa[0]
        t0 = time.time()
        out = fn(*aa)
        sync(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.time() - t0)
    print(f"{name:24s} {min(ts)*1e3:8.1f} ms")
    return out


# ---- calibrate stages ----
t_stage("whole calibrate", lambda c: cal(c, *args[1:], mbias, mflat),
        args[0])
bad0 = mask_m != 0
t_stage("lacosmic", jax.jit(lambda im, b: lacosmic(
    im, b, stats["rdnoise"], ctx.lac_params)), sci, bad0)
excl_t = (mask_m & (maskbits.SATURATED | maskbits.SAT_CONNECTED
                    | maskbits.BAD)) != 0
t_stage("detect_trails", jax.jit(lambda im, e: detect_trails(
    im, e, ctx.sat_params)), sci, excl_t)

# ---- extract stages ----
ext = jax.jit(lambda im, mk: extract_catalog(ctx, im, mk))
t_stage("whole extract", ext, sci, mask_m)

bm = jax.jit(lambda im, b: background_mesh(
    im, b, ctx.bkg_boxsize, nsigma=ctx.bkg_nsigma,
    filtersize=ctx.bkg_filtersize))
mesh, stdm = t_stage("background_mesh", bm, sci, bad0)
m2b = jax.jit(lambda m: mini2back(m, sci.shape, ctx.bkg_boxsize))
bkg = t_stage("mini2back", m2b, mesh)
bstd = jax.block_until_ready(m2b(stdm))
sub = jax.block_until_ready(sci - bkg)
excl = (mask_m & (maskbits.EDGE | maskbits.BAD | maskbits.SATELLITE)) != 0

dseg = jax.jit(lambda su, bs, e: detect_segments(su, bs, e,
                                                 ctx.det_params))
seg, n = t_stage("detect_segments", dseg, sub, bstd, excl)
scat = jax.jit(lambda su, bs, sg, nn: segment_catalog(
    su, bs, sg, nn, ctx.det_params))
cat = t_stage("segment_catalog", scat, sub, bstd, seg, n)
cat = dict(cat)
cat.update(moments_shape(cat))
aph = jax.jit(lambda su, bs, x, y, nn: aperture_photometry(
    su, bs, x, y, ctx.apphot_radii, n_active=nn))
t_stage("aperture", aph, sub, bstd, cat["x"], cat["y"], n)
bpsf = jax.jit(lambda su, bs, nn: build_psf(
    su, bs, cat, sci.shape, ctx.psf_params, n_active=nn))
model = t_stage("build_psf", bpsf, sub, bstd, n)
pph = jax.jit(lambda su, bs, nn: psf_photometry(
    su, bs, model, cat["x"], cat["y"], n_active=nn))
t_stage("psf_photometry", pph, sub, bstd, n)
print("n_sources:", int(n))
print("OK")

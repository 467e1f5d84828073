"""In-context cost of the round-5 production detect_sat_segments
switch: the full calibrate_detector program at 10560^2 with the tiled
segment pass ON vs OFF (steady, chained dispatches, one sync)."""
import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_blackbox_tpu_segcost")

import jax
import jax.numpy as jnp
import numpy as np

from blackbox_tpu.config.defaults import ReductionSettings
from blackbox_tpu.core.geometry import MEERLICHT
from blackbox_tpu.ops.cosmics import LACosmicParams
from blackbox_tpu.ops.detection import DetectParams
from blackbox_tpu.pipeline.reduce import ReduceContext, calibrate_detector
from blackbox_tpu.synth.device import make_science_device

print(jax.devices(), file=sys.stderr, flush=True)
geom = MEERLICHT
s = ReductionSettings(geometry=geom)
base = ReduceContext.from_settings(
    s, "ML1", lac_params=LACosmicParams(strip_rows=176),
    det_params=DetectParams(max_sources=20000, label_iters=32))

gen = jax.jit(lambda k: make_science_device(k, geom, nstars=4000,
                                            ncosmics=800, trail=True,
                                            nsat=20)[:3])
args = jax.block_until_ready(gen(jax.random.PRNGKey(12345)))

for seg in (False, True):
    ctx = dataclasses.replace(base, detect_sat_segments=seg)

    def step(chan, osv, osh):
        sci, mask_m, stats = calibrate_detector(ctx, chan, osv, osh,
                                                None, None, None, None)
        return {"nsats": stats["nsats"],
                "digest": jnp.sum(sci[::997, ::997])}

    f = jax.jit(step)
    out = f(*args)
    # block_until_ready LIES on this backend — force a real host pull
    int(out["nsats"]); float(out["digest"])
    t0 = time.perf_counter()
    outs = []
    for i in range(5):
        a2 = (args[0] + jnp.float32(i) * 1e-6,) + args[1:]
        outs.append(f(*a2))
    ns = [int(o["nsats"]) for o in outs]
    float(sum(o["digest"] for o in outs))
    dt = (time.perf_counter() - t0) / 5 * 1e3
    print(f"segments={seg}: {dt:.1f} ms/frame calibrate, nsats={ns[0]}",
          flush=True)

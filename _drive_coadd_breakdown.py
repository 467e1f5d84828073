"""Blocked co-add per-stage breakdown (VERDICT r4 item 6).

Runs the production mini-std path at half scale (5280², N=10) with
coadd_field_blocked(instrument=True): the pipeline is intentionally
broken by per-stage syncs so wall time attributes to host-prep /
host→device upload / device compute / device→host drain.  The
breakdown names the next cut.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_blackbox_tpu_drive_coadd")
import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

print("# devices:", jax.devices(), file=sys.stderr, flush=True)

from blackbox_tpu.astro.wcs import TanWCS
from blackbox_tpu.ops.background import mini2back
from blackbox_tpu.pipeline.buildref import (BuildRefSettings, RefInput,
                                            coadd_field_blocked)

H = W = 5280
N = 10
BOX = 256
PIX = 0.5642
wcs_out = TanWCS.simple(150.0, -30.0, PIX, (H, W))

rng = np.random.default_rng(5)
t0 = time.time()
inputs = []
gen = jax.jit(lambda k: (jax.random.normal(k, (H, W), jnp.float32)
                         * 8.0))
for i in range(N):
    img = np.asarray(jax.device_get(gen(jax.random.PRNGKey(i))))
    stdm = (7.0 + 1.5 * rng.random((H // BOX, W // BOX))
            ).astype(np.float32)
    bstd = np.asarray(jax.device_get(
        jax.jit(lambda m: mini2back(m, (H, W), BOX))(
            jnp.asarray(stdm))))
    msk = np.zeros((H, W), np.uint8)
    w_i = TanWCS.simple(150.0 + 2e-5 * i, -30.0 - 1e-5 * i, PIX,
                        (H, W), rot_deg=0.02 * i)
    inputs.append(RefInput(image=img, bkg_std=bstd, mask=msk, wcs=w_i,
                           zp=25.0 - 0.05 * i, bkg_std_mini=stdm,
                           bkg_boxsize=BOX))
print(f"# inputs built+pulled in {time.time()-t0:.0f}s",
      file=sys.stderr, flush=True)

s = BuildRefSettings()
for rep in range(2):
    t0 = time.time()
    out = coadd_field_blocked(inputs, wcs_out, (H, W), s,
                              instrument=True)
    wall = time.time() - t0
    tim = out["timings"]
    print(f"rep {rep}: wall {wall:.1f}s over {tim['nblocks']} blocks | "
          f"prep {tim['prep_s']:.1f} upload {tim['upload_s']:.1f} "
          f"compute {tim['compute_s']:.1f} drain {tim['drain_s']:.1f}",
          flush=True)
    print(f"  img sum {float(np.sum(out['image'])):.3e} "
          f"nclip {int(np.sum(out['nclipped']))}", flush=True)

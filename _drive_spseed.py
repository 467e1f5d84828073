"""Seed-count probe for the iteration-1 restructure candidate.

Idea under test (round 5 VERDICT item 1): in _detect_math, the fine
structure f = max((med3 - med7(med3))/noise, 0.01) — 430 of the dense
round's ~810 min/max ops/px — is consumed ONLY inside
``(sp > sigclip) & (sp/f > objlim)``.  If the EXACT seed set
{sp > sigclip} activates few 64-px cells on a realistic survey frame,
evaluating f (and growth + cleaning) windowed at those cells instead
of densely saves ~430 ops/px of dense work at the price of the
windowed machinery (~32 ms per ~888 cells measured).

This probe builds the bench-like science field (4000 stars, 20
saturating, 800 cosmics, trail, sky 300) at 10560^2 and counts the
exact-sp seed pixels and active cells — the go/no-go number.
Bright star cores DO pass the sp threshold (PERF_NOTES: that is why
the extrema-bound prescreen lost); the question is how many cells.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from blackbox_tpu.ops.filters import median_filter, laplacian_subsampled
from blackbox_tpu.synth.device import moffat_kernel

H = W = 10560


def build_frame(key, nstars=4000, nsat=20, ncosmics=800, sky=300.0,
                fwhm=3.0):
    ks = jax.random.split(key, 8)
    xs = jax.random.uniform(ks[0], (nstars,), minval=8.0, maxval=W - 8.)
    ys = jax.random.uniform(ks[1], (nstars,), minval=8.0, maxval=H - 8.)
    logf = jax.random.uniform(ks[2], (nstars,), minval=float(np.log(2e3)),
                              maxval=float(np.log(2e5)))
    fluxes = jnp.exp(logf)
    sx = jax.random.uniform(ks[3], (nsat,), minval=20.0, maxval=W - 20.)
    sy = jax.random.uniform(ks[4], (nsat,), minval=20.0, maxval=H - 20.)
    xs = jnp.concatenate([xs, sx]); ys = jnp.concatenate([ys, sy])
    fluxes = jnp.concatenate([fluxes, jnp.full((nsat,), 5e7)])
    delta = jnp.zeros((H, W), jnp.float32).at[
        jnp.clip(ys.astype(jnp.int32), 0, H - 1),
        jnp.clip(xs.astype(jnp.int32), 0, W - 1)].add(fluxes)
    psf = moffat_kernel((H, W), fwhm)
    img = jnp.fft.irfft2(jnp.fft.rfft2(delta) * jnp.fft.rfft2(psf),
                         s=(H, W))
    img = jnp.maximum(img, 0.0) + sky
    img = img + jnp.sqrt(jnp.maximum(img, 0.0)) * \
        jax.random.normal(ks[5], (H, W))
    cy = jax.random.randint(ks[6], (ncosmics,), 4, H - 4)
    cx = jax.random.randint(ks[7], (ncosmics,), 4, W - 4)
    camp = jax.random.uniform(jax.random.fold_in(key, 1), (ncosmics,),
                              minval=3000.0, maxval=40000.0)
    img = img.at[cy, cx].add(camp)
    img = img.at[cy, cx + 1].add(
        jnp.where(jnp.arange(ncosmics) % 3 != 0, 0.6 * camp, 0.0))
    # trail
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    x0, y0, x1, y1 = 0.1 * W, 0.2 * H, 0.9 * W, 0.8 * H
    nx_, ny_ = y1 - y0, -(x1 - x0)
    nrm = jnp.sqrt(nx_ ** 2 + ny_ ** 2)
    d = jnp.abs((xx - x0) * nx_ / nrm + (yy - y0) * ny_ / nrm)
    img = img + 4000.0 * jnp.exp(-0.5 * (d / max(fwhm / 2.355, 0.8)) ** 2)
    return img


def seed_stats(img, sigclip=15.0, rdnoise=10.0, cell=64):
    m5 = median_filter(img, 5, 176)
    noise = jnp.sqrt(jnp.maximum(m5, 1e-5) + rdnoise ** 2)
    s = laplacian_subsampled(img) / (2.0 * noise)
    sp = s - median_filter(s, 5, 176)
    seeds = sp > sigclip
    npx = jnp.sum(seeds)
    ch = H // cell
    cells = seeds.reshape(ch, cell, W // cell, cell).any((1, 3))
    return npx, jnp.sum(cells)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    f = jax.jit(lambda k: seed_stats(build_frame(k)))
    t0 = time.time()
    for i in range(2):
        npx, nc = f(jax.random.PRNGKey(12345 + i))
        print(f"frame {i}: seed px = {int(npx)}, active 64-cells = "
              f"{int(nc)} (of {(H//64)*(W//64)})", flush=True)
    print(f"total {time.time()-t0:.1f}s", flush=True)

"""Synthetic raw frames generated ON DEVICE (jax).

The host generator (:mod:`blackbox_tpu.synth.generator`) renders frames
in numpy and ships them to the device — at full MeerLICHT size that is a
~450 MB transfer which costs minutes over a tunneled TPU link and
dominates benchmark setup.  This module builds the same kind of frame
entirely on device: star field via a scattered delta image convolved
with a Moffat PSF in Fourier space (MXU/FFT-friendly), sky + Poisson
noise via the normal approximation, bias/overscan structure per channel,
and read noise — all jnp, all resident in HBM.

Used by ``bench.py`` and profiling harnesses; numerics match the host
generator closely enough for benchmark realism (same flux distribution,
same geometry contract as reference blackbox.py:6334-6402), while
golden-value tests keep using the host generator.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from blackbox_tpu.core.geometry import CCDGeometry


def moffat_kernel(shape, fwhm: float = 3.0, beta: float = 2.5):
    """Centred Moffat PSF image of the full frame size (for FFT conv)."""
    H, W = shape
    alpha = fwhm / (2 * np.sqrt(2 ** (1 / beta) - 1))
    y = jnp.arange(H, dtype=jnp.float32)
    x = jnp.arange(W, dtype=jnp.float32)
    # wrapped radii so the kernel is centred at (0, 0) for FFT use
    yy = jnp.minimum(y, H - y)[:, None]
    xx = jnp.minimum(x, W - x)[None, :]
    r2 = yy * yy + xx * xx
    k = (beta - 1) / (np.pi * alpha ** 2) * (1 + r2 / alpha ** 2) ** (-beta)
    return k / jnp.sum(k)


def make_science_device(key, geom: CCDGeometry, nstars: int = 4000,
                        sky_e: float = 300.0, fwhm: float = 3.0,
                        ncosmics: int = 800, trail: bool = True,
                        nsat: int = 20, flux_range=(2e3, 2e5),
                        telescope: str = "ML1"):
    """Synthetic raw science frame on device.

    Returns (chan_data, os_vert, os_hori) float32 stacks shaped like
    ``geom.split_raw`` output, plus a truth dict (star positions/fluxes).
    """
    from blackbox_tpu.config.defaults import GAIN, SATLEVEL
    from blackbox_tpu.config.base import get_par

    C = geom.n_chan
    H, W = geom.red_shape
    gain = jnp.asarray(np.resize(np.asarray(get_par(GAIN, telescope),
                                            np.float32), C))
    satlevel = jnp.asarray(np.resize(np.asarray(get_par(SATLEVEL, telescope),
                                                np.float32), C))
    ks = jax.random.split(key, 12)

    # ---- star field: scattered deltas -> FFT Moffat convolution ----
    xs = jax.random.uniform(ks[0], (nstars,), minval=8.0, maxval=W - 8.0)
    ys = jax.random.uniform(ks[1], (nstars,), minval=8.0, maxval=H - 8.0)
    logf = jax.random.uniform(ks[2], (nstars,),
                              minval=float(np.log(flux_range[0])),
                              maxval=float(np.log(flux_range[1])))
    fluxes = jnp.exp(logf)
    if nsat:
        sx = jax.random.uniform(ks[3], (nsat,), minval=20.0,
                                maxval=W - 20.0)
        sy = jax.random.uniform(ks[4], (nsat,), minval=20.0,
                                maxval=H - 20.0)
        xs = jnp.concatenate([xs, sx])
        ys = jnp.concatenate([ys, sy])
        fluxes = jnp.concatenate([fluxes, jnp.full((nsat,), 5e7)])

    delta = jnp.zeros((H, W), jnp.float32)
    iy = jnp.clip(ys.astype(jnp.int32), 0, H - 1)
    ix = jnp.clip(xs.astype(jnp.int32), 0, W - 1)
    delta = delta.at[iy, ix].add(fluxes)

    psf = moffat_kernel((H, W), fwhm)
    data_e = jnp.fft.irfft2(jnp.fft.rfft2(delta) * jnp.fft.rfft2(psf),
                            s=(H, W))
    data_e = jnp.maximum(data_e, 0.0) + sky_e

    # vignetting + 1 % pixel response
    yv = (jnp.arange(H, dtype=jnp.float32) - H / 2) / (H / 2)
    xv = (jnp.arange(W, dtype=jnp.float32) - W / 2) / (W / 2)
    flat = ((1.0 - 0.06 * (yv[:, None] ** 2 + xv[None, :] ** 2))
            * (1.0 + 0.01 * jax.random.normal(ks[5], (H, W))))
    data_e = data_e * flat

    # Poisson via normal approximation
    data_e = data_e + jnp.sqrt(jnp.maximum(data_e, 0.0)) \
        * jax.random.normal(ks[6], (H, W))

    # cosmic rays: 1-px deltas (+ a 0.6x neighbour for ~2/3 of them)
    cy = jax.random.randint(ks[7], (ncosmics,), 4, H - 4)
    cx = jax.random.randint(ks[8], (ncosmics,), 4, W - 4)
    camp = jax.random.uniform(ks[9], (ncosmics,), minval=3000.0,
                              maxval=40000.0)
    data_e = data_e.at[cy, cx].add(camp)
    data_e = data_e.at[cy, cx + 1].add(
        jnp.where(jnp.arange(ncosmics) % 3 != 0, 0.6 * camp, 0.0))

    # satellite trail: gaussian-profile diagonal line
    if trail:
        yy = jnp.arange(H, dtype=jnp.float32)[:, None]
        xx = jnp.arange(W, dtype=jnp.float32)[None, :]
        x0, y0, x1, y1 = 0.1 * W, 0.2 * H, 0.9 * W, 0.8 * H
        nx_, ny_ = y1 - y0, -(x1 - x0)
        nrm = jnp.sqrt(nx_ ** 2 + ny_ ** 2)
        d = jnp.abs((xx - x0) * nx_ / nrm + (yy - y0) * ny_ / nrm)
        sig = max(fwhm / 2.355, 0.8)
        data_e = data_e + 4000.0 * jnp.exp(-0.5 * (d / sig) ** 2)

    # ---- to raw channel stacks with overscan + bias structure ----
    chan = geom.disassemble(data_e)
    chan_adu = chan / gain[:, None, None]
    chan_adu = jnp.minimum(chan_adu, satlevel[:, None, None] * 1.05)

    bias_level = jax.random.uniform(ks[10], (C,), minval=7000.0,
                                    maxval=8000.0)
    rdnoise_adu = jax.random.uniform(ks[11], (C,), minval=4.0, maxval=6.0)

    def with_bias(shape3):
        return (bias_level[:, None, None]
                + rdnoise_adu[:, None, None]
                * jax.random.normal(jax.random.fold_in(key, hash(shape3)
                                                       % 997), shape3))

    chan_data = chan_adu + with_bias(chan.shape)
    os_vert = with_bias((C, geom.dy, geom.os_vert_width))
    os_hori = with_bias((C, geom.os_hori_height, geom.dx))

    truth = {"x": xs, "y": ys, "flux": fluxes}
    return chan_data, os_vert, os_hori, truth

"""Master bias / dark / flat construction as device median stacks.

Rebuild of the reference's ``master_prep`` compute core
(/root/reference/blackbox.py:4625-5247): individual calibrated frames are
median-combined as one float32 cube on device; master flats are first
normalised by their STATSEC medians, non-positive/edge pixels set to 1,
and the 16 channel gain-correction factors (GAINCF1..16) are derived by
matching channel medians vertically across the CCD centre line and then
chaining horizontally across channel boundaries (blackbox.py:5076-5161).
Frame *selection* (calendar windows, QC rejection, ncal_max capping) is
host-side policy in :mod:`blackbox_tpu.orchestration`; this module is the
pure device math.
"""

from __future__ import annotations

import jax.numpy as jnp

from blackbox_tpu.ops.stats import masked_median, masked_mean_std
from blackbox_tpu.core.geometry import CCDGeometry


def master_bias(stack):
    """Median-combine calibrated bias frames.

    stack : (N, C, ych, xch) [e-]
    Returns (master (C, ych, xch), stats dict with per-channel mean/std).
    """
    master = jnp.median(stack, axis=0)
    C = master.shape[0]
    flat = master.reshape(C, -1)
    mean, std = masked_mean_std(flat, axis=1)
    return master, {
        "mbias_chan_mean": mean,       # MBMEAN{c}
        "mbias_chan_std": std,         # MBSTD{c}
        "mbias_mean": jnp.mean(mean),
        "mbias_std": jnp.mean(std),
        "nmbias": jnp.int32(stack.shape[0]),
    }


def master_flat(stack, geom: CCDGeometry, norm_sec, bpm=None,
                nrows_vert: int | None = None,
                nrows_hori: int | None = None,
                ncols_hori: int | None = None):
    """Median-combine normalised flats and derive GAINCF factors.

    stack    : (N, C, ych, xch) calibrated flats [e-]
    norm_sec : (slice, slice) on the reduced mosaic (flat_norm_sec)
    bpm      : optional (C, ych, xch) uint8 mask (edge bit -> set to 1)

    Returns (master (C, ych, xch), stats: medsec per input, gaincf (C,)).
    """
    N, C, ych, xch = stack.shape
    nx = geom.nx

    # per-frame STATSEC median on the mosaic section.  Only the
    # norm_sec slice of each assembled mosaic is kept: materialising N
    # FULL mosaics (this runs eagerly from the master store, not under
    # jit) costs N x 446 MB at production scale on top of the cube and
    # the normalised copy — enough to OOM a 16 GB chip at N=15
    medsec = jnp.median(jnp.stack(
        [geom.assemble(stack[i])[norm_sec[0], norm_sec[1]]
         for i in range(N)]).reshape(N, -1), axis=1)
    normed = stack / jnp.maximum(medsec[:, None, None, None], 1e-6)
    master = jnp.median(normed, axis=0)

    # edge / non-positive -> 1
    bad = master <= 0
    if bpm is not None:
        from blackbox_tpu.core import maskbits
        bad = bad | ((bpm & maskbits.EDGE) != 0)
    master = jnp.where(bad, 1.0, master)

    # ---- GAINCF: vertical matching across the centre line ----
    nr = nrows_vert or max(min(200, ych // 4), 1)
    bottom_strip = master[:nx, ych - nr:, :]       # rows adjacent to centre
    top_strip = master[nx:, :nr, :]
    med_cntr = jnp.concatenate([
        jnp.median(bottom_strip.reshape(nx, -1), axis=1),
        jnp.median(top_strip.reshape(nx, -1), axis=1)], axis=0)   # (C,)
    factor = 1.0 / jnp.maximum(med_cntr, 1e-6)
    corr = master * factor[:, None, None]

    # ---- horizontal chaining on the corrected mosaic ----
    nrh = nrows_hori or max(min(2000, ych), 1)
    nch = ncols_hori or max(min(200, xch // 4), 1)
    mosaic = geom.assemble(corr)
    dy = ych
    ratios = [jnp.float32(1.0)]
    for i in range(1, nx):
        xb = i * xch
        left = mosaic[dy - nrh:dy + nrh, xb - nch:xb]
        right = mosaic[dy - nrh:dy + nrh, xb:xb + nch]
        ratios.append(jnp.median(left) / jnp.maximum(jnp.median(right),
                                                     1e-6))
    chain = jnp.cumprod(jnp.stack(ratios))        # (nx,)
    factor = factor * jnp.tile(chain, 2)
    factor = factor / jnp.mean(factor)

    stats = {
        "medsec": medsec,                  # per-input normalisation [e-]
        "gaincf": factor,                  # GAINCF1..16
        "nmflat": jnp.int32(N),
        "mflat_med": jnp.median(master),
    }
    return master, stats


def master_dark(stack, exptimes):
    """Median-combine dark frames scaled to 1 s."""
    scaled = stack / jnp.maximum(exptimes[:, None, None, None], 1e-6)
    master = jnp.median(scaled, axis=0)
    C = master.shape[0]
    mean, std = masked_mean_std(master.reshape(C, -1), axis=1)
    return master, {"mdark_chan_mean": mean, "mdark_chan_std": std,
                    "nmdark": jnp.int32(stack.shape[0])}

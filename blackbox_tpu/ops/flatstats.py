"""Flat-field quality statistics on device.

Rebuild of the reference's ``get_flatstats``
(/root/reference/blackbox.py:3661-3820): STATSEC and full-image masked
median/STD, per-channel medians, and a subimage grid of medians plus
below-median STDs feeding the RDIF-MAX / RSTD-MAX vignetting QC metrics.
The reference samples random pixel subsets to keep numpy masked-array cost
down; on TPU full reductions are cheaper than gathers, so statistics use
every unmasked pixel.
"""

from __future__ import annotations

import jax.numpy as jnp

from blackbox_tpu.ops.stats import masked_median, masked_mean_std


def flat_statistics(mosaic, mask, geom, statsec, subsize: int):
    """Compute flat statistics.

    mosaic  : (H, W) reduced flat [e-]
    mask    : (H, W) uint8 (0 = usable)
    statsec : (slice, slice) normalisation section
    subsize : subimage grid box size (ZOGY subimage_size)

    Returns a dict of device scalars / small arrays keyed like the header
    keywords they feed.
    """
    bad = mask != 0
    out = {}

    sec = mosaic[statsec]
    sec_bad = bad[statsec]
    med_sec = masked_median(sec.ravel(), sec_bad.ravel(), axis=0)
    _, std_sec = masked_mean_std(sec.ravel(), sec_bad.ravel(), axis=0)
    out["medsec"] = med_sec
    out["stdsec"] = std_sec
    out["rstdsec"] = std_sec / med_sec

    med = masked_median(mosaic.ravel(), bad.ravel(), axis=0)
    _, std = masked_mean_std(mosaic.ravel(), bad.ravel(), axis=0)
    out["flatmed"] = med
    out["flatstd"] = std
    out["flatrstd"] = std / med

    # per-channel stats on the channel stacks
    chan = geom.disassemble(mosaic)
    chan_bad = geom.disassemble(bad)
    C = chan.shape[0]
    out["flatm"] = masked_median(chan.reshape(C, -1),
                                 chan_bad.reshape(C, -1), axis=1)
    _, out["flats"] = masked_mean_std(chan.reshape(C, -1),
                                      chan_bad.reshape(C, -1), axis=1)
    out["flatrs"] = out["flats"] / out["flatm"]

    # subimage grid: medians and below-median STDs
    H, W = mosaic.shape
    ny, nx = H // subsize, W // subsize
    tiles = mosaic[:ny * subsize, :nx * subsize].reshape(
        ny, subsize, nx, subsize).swapaxes(1, 2).reshape(ny, nx, -1)
    tbad = bad[:ny * subsize, :nx * subsize].reshape(
        ny, subsize, nx, subsize).swapaxes(1, 2).reshape(ny, nx, -1)

    mini_med = masked_median(tiles, tbad, axis=2)            # (ny, nx)
    below = tbad | (tiles > mini_med[..., None])
    n = jnp.sum(~below, axis=2)
    ss = jnp.sum(jnp.where(below, 0.0,
                           (tiles - mini_med[..., None]) ** 2), axis=2)
    mini_std = jnp.sqrt(ss / jnp.maximum(n - 1, 1))

    # interior subimages only (erode the unit grid by one)
    interior = jnp.zeros((ny, nx), bool).at[1:-1, 1:-1].set(ny > 2)
    big = jnp.float32(jnp.inf)
    mn = jnp.min(jnp.where(interior, mini_med, big))
    mx = jnp.max(jnp.where(interior, mini_med, -big))
    out["nsubstot"] = jnp.asarray(ny * nx)
    out["nsubs"] = jnp.sum(interior)
    out["rdif_max"] = jnp.abs((mx - mn) / (mx + mn))
    rstd = jnp.where(interior & (mini_med != 0),
                     mini_std / jnp.abs(mini_med), -big)
    out["rstd_max"] = jnp.max(rstd)
    return out

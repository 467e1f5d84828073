"""Golden-value parity: our device kernels vs the REFERENCE's numpy
formulas, ported literally as oracles (SURVEY.md §4 commitment).

Each oracle transcribes the arithmetic of the cited reference block in
plain numpy; the test then asserts the framework kernel agrees.
"""

import numpy as np
import jax.numpy as jnp
from scipy import ndimage

from blackbox_tpu.core.geometry import TINY


# ---------------------------------------------------------------- flatstats

def _oracle_flatstats(data, mask, geom, statsec, subsize):
    """Literal port of get_flatstats (blackbox.py:3661-3820), on ALL
    pixels (the reference's get_rand_indices subsampling is a cost
    optimisation around the same statistics)."""
    out = {}
    mask_use = mask == 0
    sec, secm = data[statsec], mask_use[statsec]
    out["medsec"] = np.median(sec[secm])
    out["stdsec"] = np.std(sec[secm])
    out["rstdsec"] = out["stdsec"] / out["medsec"]
    out["flatmed"] = np.median(data[mask_use])
    out["flatstd"] = np.std(data[mask_use])

    chan = np.asarray(geom.disassemble(data))
    chanm = np.asarray(geom.disassemble(mask_use))
    C = chan.shape[0]
    out["flatm"] = np.array([np.median(chan[c][chanm[c]])
                             for c in range(C)])
    out["flats"] = np.array([np.std(chan[c][chanm[c]])
                             for c in range(C)])

    # 8x8-style subimage grid with the below-median STD trick
    # (blackbox.py:3754-3820)
    ys, xs = data.shape
    nys, nxs = ys // subsize, xs // subsize
    dm = np.ma.masked_array(data, mask=~mask_use)
    r = dm[:nys * subsize, :nxs * subsize].reshape(
        nys, subsize, nxs, subsize).swapaxes(1, 2).reshape(nys, nxs, -1)
    mini_median = np.ma.median(r, axis=2)
    mask_clip = r > mini_median.reshape(nys, nxs, 1)
    r2 = np.ma.masked_array(r, mask=np.ma.getmaskarray(r) | mask_clip)
    mini_std = np.sqrt(np.ma.sum(
        (r2 - mini_median.reshape(nys, nxs, 1)) ** 2, axis=2)
        / (np.ma.count(r2, axis=2) - 1))
    mask_cntr = ndimage.binary_erosion(np.ones(mini_median.shape, bool))
    mn = np.amin(mini_median[mask_cntr])
    mx = np.amax(mini_median[mask_cntr])
    out["rdif_max"] = np.abs((mx - mn) / (mx + mn))
    nz = mini_median[mask_cntr] != 0
    out["rstd_max"] = np.amax(np.asarray(mini_std[mask_cntr])[nz]
                              / np.abs(np.asarray(
                                  mini_median[mask_cntr])[nz]))
    return out


def test_flatstats_matches_reference_formulas(rng):
    from blackbox_tpu.ops.flatstats import flat_statistics
    geom = TINY
    H, W = geom.red_shape
    # vignetted flat + a masked blob
    yy, xx = np.mgrid[0:H, 0:W]
    vign = 1.0 - 0.1 * (((yy - H / 2) / H) ** 2 + ((xx - W / 2) / W) ** 2)
    data = (30000.0 * vign
            + rng.normal(0, 60.0, (H, W))).astype(np.float32)
    mask = np.zeros((H, W), np.uint8)
    mask[10:20, 30:50] = 1
    statsec = (slice(H // 4, 3 * H // 4), slice(W // 4, 3 * W // 4))
    subsize = max(min(H, W) // 8, 8)

    got = {k: np.asarray(v) for k, v in flat_statistics(
        jnp.asarray(data), jnp.asarray(mask), geom, statsec,
        subsize).items()}
    want = _oracle_flatstats(data, mask, geom, statsec, subsize)

    for k in ("medsec", "flatmed", "flatm"):
        np.testing.assert_allclose(got[k], want[k], rtol=2e-4,
                                   err_msg=k)
    for k in ("stdsec", "flatstd", "flats", "rstdsec"):
        # STD tolerance: f32 accumulation + ddof convention, N ~ 4e4
        np.testing.assert_allclose(got[k], want[k], rtol=5e-3,
                                   err_msg=k)
    np.testing.assert_allclose(got["rdif_max"], want["rdif_max"],
                               rtol=1e-2, atol=2e-4)
    np.testing.assert_allclose(got["rstd_max"], want["rstd_max"],
                               rtol=2e-2)


# ------------------------------------------------------------------ GAINCF

def _oracle_gaincf(master, geom, nrows_vert, nrows_hori, ncols_hori):
    """Literal port of the GAINCF derivation (blackbox.py:5076-5161):
    vertical matching at the centre line, then horizontal chaining on
    the progressively corrected mosaic, normalised to unit mean."""
    C = geom.n_chan
    nx = geom.nx
    mosaic = np.asarray(geom.assemble(jnp.asarray(master)), np.float64)
    corr = mosaic.copy()
    ysize, xsize = mosaic.shape
    dy, dx = ysize // 2, xsize // nx

    def chan_slice(c):
        row, col = (0, c) if c < nx else (1, c - nx)
        return (slice(row * dy, (row + 1) * dy),
                slice(col * dx, (col + 1) * dx))

    med_cntr = np.zeros(C)
    for c in range(C):
        d = corr[chan_slice(c)]
        med_cntr[c] = np.median(d[-nrows_vert:, :]) if c < nx \
            else np.median(d[:nrows_vert, :])
        corr[chan_slice(c)] /= med_cntr[c]
    factor = 1.0 / med_cntr
    for i in range(1, nx):
        y, x = dy, i * dx
        s1 = corr[y - nrows_hori:y + nrows_hori, x - ncols_hori:x]
        s2 = corr[y - nrows_hori:y + nrows_hori, x:x + ncols_hori]
        ratio = np.median(s1) / np.median(s2)
        corr[chan_slice(i)] *= ratio
        corr[chan_slice(i + nx)] *= ratio
        factor[i] *= ratio
        factor[i + nx] *= ratio
    return factor / np.mean(factor)


def test_gaincf_matches_reference_formulas(rng):
    from blackbox_tpu.pipeline.masters import master_flat
    geom = TINY
    C, ych, xch = geom.n_chan, geom.ysize_chan, geom.xsize_chan
    # per-channel gain offsets the factors must recover
    offsets = 1.0 + 0.05 * rng.standard_normal(C)
    stack = []
    for i in range(4):
        frame = np.full((C, ych, xch), 30000.0, np.float32)
        frame *= offsets[:, None, None]
        frame += rng.normal(0, 30.0, frame.shape).astype(np.float32)
        stack.append(frame)
    cube = jnp.asarray(np.stack(stack))
    H, W = geom.red_shape
    norm_sec = (slice(H // 4, 3 * H // 4), slice(W // 4, 3 * W // 4))

    nrv = max(ych // 4, 1)
    nrh, nch = ych, max(xch // 4, 1)
    master, stats = master_flat(cube, geom, norm_sec, nrows_vert=nrv,
                                nrows_hori=nrh, ncols_hori=nch)
    want = _oracle_gaincf(np.asarray(master, np.float64), geom,
                          nrv, nrh, nch)
    np.testing.assert_allclose(np.asarray(stats["gaincf"]), want,
                               rtol=2e-4)


# ---------------------------------------------------- overscan statistics

def test_overscan_channel_stats_match_clipped_oracle(rng):
    """BIASM/RDN per channel == astropy-style sigma-clipped mean/std of
    the vertical overscan (os_corr, blackbox.py:6407-6490)."""
    from blackbox_tpu.ops.overscan import overscan_correct, OverscanParams
    geom = TINY
    C = geom.n_chan
    chan = rng.normal(15000.0, 9.0,
                      (C, geom.ysize_chan, geom.xsize_chan)
                      ).astype(np.float32)
    osv = rng.normal(15000.0, 9.0,
                     (C, geom.ysize_chan, geom.xsize_os)
                     ).astype(np.float32)
    osh = rng.normal(15000.0, 9.0,
                     (C, geom.ysize_os, geom.xsize_chan)
                     ).astype(np.float32)
    # outliers the clipping must reject
    osv[:, 5, 2] += 8000.0
    out, stats = overscan_correct(jnp.asarray(chan), jnp.asarray(osv),
                                  jnp.asarray(osh),
                                  satlevel_e=jnp.full(C, 1e9),
                                  params=OverscanParams())

    def clipped(a, sigma=3.0, iters=5):
        a = np.asarray(a, np.float64).ravel()
        keep = np.ones(a.size, bool)
        for _ in range(iters):
            m = np.median(a[keep])
            s = np.std(a[keep])
            new = np.abs(a - m) <= sigma * s
            if new.sum() == keep.sum():
                break
            keep = new
        return a[keep].mean(), a[keep].std()

    biasm = np.asarray(stats["biasm"])
    rdn = np.asarray(stats["rdn"])
    for c in range(C):
        m, s = clipped(osv[c])
        assert abs(biasm[c] - m) < 0.5, (c, biasm[c], m)
        assert abs(rdn[c] - s) / s < 0.1, (c, rdn[c], s)


# ---------------------------------------------------------- qc_check shapes

def test_qc_check_reference_example1():
    """The reference's runnable example 1 (qc.py:566-571): a dict with a
    few keys graded for specific keywords."""
    from blackbox_tpu.qc import qc_check
    from blackbox_tpu.qc.ranges import QC_RANGES
    d = {"RDNOISE": 10.0, "S-SEEING": 5.5, "AIRMASS": 2.7, "Z-P": True,
         "FILTER": "q"}
    res = qc_check(d, QC_RANGES, "ML1",
                   keywords=["RDNOISE", "S-SEEING", "AIRMASS", "Z-P"],
                   hide_greens=False)
    graded = dict(zip(res.keys, res.colors))
    assert graded["RDNOISE"] == "green"          # well inside (5, 15)
    assert graded["S-SEEING"] == "yellow"        # 5.5 in (0.3, 6.0)
    assert graded["Z-P"] == "green"
    assert "AIRMASS" not in graded or graded["AIRMASS"] == "green"

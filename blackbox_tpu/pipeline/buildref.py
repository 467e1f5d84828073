"""Reference-image building: input selection + device co-addition.

Rebuild of the reference's buildref flow (/root/reference/buildref.py:
67-856 selection, 1425-2437 imcombine, 1013-1420 finalisation):

1. **Selection** (host, :func:`select_images`): per field x filter, cut
   the header-table index on QC flag, seeing, date window and tracking,
   pick the largest seeing-coherent subset (≤ max_spread), sort by
   limiting magnitude and keep images until the *projected* co-add depth
   (flux-space cumulative limiting magnitude, buildref.py:663-667) stops
   improving by more than ``dlimmag_proj_min``.
2. **Co-addition** (device, :func:`coadd_field`): remap each input onto
   the output TAN grid (Lanczos3), scale to a common zeropoint, weight
   by inverse variance with discard-bit zeroing, Gruen-clipped weighted
   mean, mask voting, effective headers — SURVEY.md §2.2.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np

log = logging.getLogger("blackbox_tpu")

from blackbox_tpu.core import maskbits
from blackbox_tpu.ops.coadd import (
    ClipParams, clipped_coadd, weighted_coadd, coadd_mask, coadd_bkg_std,
    a_swarp_search, saturation_protect)
from blackbox_tpu.ops.warp import (remap_grid, remap_grid_coarse,
                                   upsample_grid, lanczos_resample,
                                   nearest_resample, warp_shift2pass,
                                   grid_shift_ranges)


@dataclasses.dataclass(frozen=True)
class BuildRefSettings:
    """set_buildref equivalents (/root/reference/Settings/set_buildref.py)."""

    combine_type: str = "clipped"        # :39
    max_spread_seeing: float = 0.3       # :45
    seeing_max: float = 4.0              # per-filter cap, ″ (:90-92)
    # reference default applies NO qc_flag_max cut (buildref.py:107 with
    # qc_flag_max=None); red frames never publish real catalogs anyway
    qc_accept: tuple = ("green", "yellow", "orange")
    limmag_target: float = 23.0          # :106
    dmag: float = 0.5
    dlimmag_proj_min: float = 0.002      # marginal-gain cut (:121-126)
    nimages_min: int = 3                 # :111
    nimages_max: int = 40                # :116
    masktype_discard: int = 63           # :57 (all bits but edge... 63=BAD|CR|SAT|SATCON|SATL|EDGE)
    pixscale_out: float = 0.5642         # :70-73 MANUAL
    clip: ClipParams = ClipParams()
    # observatory sites (lat, lon[deg E], height[m]) per telescope —
    # night-date resolution of input products uses the site longitude
    site: Any = dataclasses.field(default_factory=lambda: {
        "ML": (-32.3799, 20.8112, 1802.0),
        "BG": (-29.2575, -70.7380, 2383.0),
    })


@dataclasses.dataclass
class RefInput:
    """One co-add input: device arrays + host metadata."""

    image: jnp.ndarray          # (H, W) calibrated, background-SUBTRACTED
    bkg_std: jnp.ndarray        # (H, W)
    mask: jnp.ndarray           # (H, W) uint8
    wcs: object                 # TanWCS
    zp: float                   # photometric zeropoint [mag]
    airmass: float = 1.0
    extco: float = 0.0          # extinction coefficient [mag/airmass]
    gain: float = 1.0
    rdnoise: float = 10.0
    saturate: float = 55000.0
    fwhm_pix: float = 4.0       # seeing FWHM [pix] (clip protection)
    psf_stamp: Optional[np.ndarray] = None   # (S, S) centre PSF
    # Optional compact background-STD representation: the (ny, nx)
    # sigma-clipped mesh whose Catmull-Rom upsample IS bkg_std
    # (ops.background.mini2back).  When every co-add input carries it,
    # the blocked combiner reconstructs each std slab on device from
    # the resident mesh instead of streaming full-res std planes —
    # 4 of the 9 host->device bytes/px of the co-add stream, bit-
    # identical rows (matmul rows are independent).
    bkg_std_mini: Optional[np.ndarray] = None   # (ny, nx) float32
    bkg_boxsize: int = 0                        # mesh box size [px]


def select_images(table: Sequence[dict],
                  s: BuildRefSettings = BuildRefSettings()):
    """Pick co-add inputs from header-table rows of one field x filter.

    Each row needs: QC-FLAG, S-SEEING ["], LIMMAG [mag], and anything the
    caller wants back.  Returns the selected rows, LIMMAG-sorted.
    """
    def _f(v, default):
        try:
            x = float(v)
            return x if np.isfinite(x) else default
        except (TypeError, ValueError):
            return default

    rows = [r for r in table
            if str(r.get("QC-FLAG", "red")).lower() in s.qc_accept
            and _f(r.get("S-SEEING"), 99.0) < s.seeing_max
            and np.isfinite(_f(r.get("LIMMAG"), np.nan))
            # keep only frames tracked at sidereal rate (reference
            # buildref.py:401 selects ISTRACKI == True); rows without
            # the column are assumed tracking
            and bool(r.get("ISTRACKI", True))]
    if not rows:
        return [], {"nsel": 0, "limmag_proj": None}

    # largest subset with seeing spread <= max_spread (pick_images port,
    # buildref.py:3175-3218): slide a window over sorted seeing values
    see = np.array([float(r["S-SEEING"]) for r in rows])
    order = np.argsort(see)
    best_lo, best_hi = 0, 1
    for lo in range(len(order)):
        hi = lo
        while (hi + 1 <= len(order) - 1
               and see[order[hi + 1]] <= see[order[lo]]
               * (1 + s.max_spread_seeing)):
            hi += 1
        if hi - lo > best_hi - best_lo:
            best_lo, best_hi = lo, hi
    rows = [rows[i] for i in order[best_lo:best_hi + 1]]

    # deepest first; accumulate projected depth in flux space
    rows.sort(key=lambda r: -float(r["LIMMAG"]))
    sel = []
    cum_flux = 0.0
    limmag_proj = None
    for r in rows:
        lm = float(r["LIMMAG"])
        # projected co-add limiting magnitude: the limiting flux scales
        # with the co-add noise, σ_co² = 1/Σ(1/σ_i²) with σ_i ∝
        # 10^(-0.4·lm_i)  ->  limmag_proj = 1.25·log10(Σ 10^(0.8·lm_i))
        # (buildref.py:663-667; N equal frames gain 1.25·log10 N mag)
        cum_flux += 10.0 ** (0.8 * lm)
        new_proj = 1.25 * np.log10(cum_flux)
        if len(sel) >= s.nimages_min:
            if new_proj > s.limmag_target + s.dmag:
                sel.append(r)
                limmag_proj = new_proj
                break
            if limmag_proj is not None \
                    and new_proj - limmag_proj < s.dlimmag_proj_min:
                break
        sel.append(r)
        limmag_proj = new_proj
        if len(sel) >= s.nimages_max:
            break
    return sel, {"nsel": len(sel), "limmag_proj": limmag_proj}


def coadd_field(inputs: Sequence[RefInput], out_wcs, out_shape,
                s: BuildRefSettings = BuildRefSettings(),
                zp_ref: Optional[float] = None,
                remap: str = "shift2pass"):
    """Remap + scale + combine one field's inputs on the output grid.

    remap="shift2pass" (production): the two-pass variable-weight
    shifted-add resample (ops.warp.warp_shift2pass) — per-pixel
    gathers run at ~1 px/cycle on v5e and made the co-add remap the
    dominant device cost (measured round 5: 123 of 209 s for a
    half-scale N=10 blocked stack).  "gather" restores the exact
    36-tap gather form (the shift2pass sampling-displacement bound is
    ~|d(ys)/dx|·|dxs| — sub-0.1 px for survey dither+rotation).

    Returns dict with image, bkg_std, mask, weights sum, per-input
    flux scales and the clip statistics.
    """
    N = len(inputs)
    if N == 0:
        raise ValueError("no co-add inputs")
    if zp_ref is None:
        zp_ref = max(inp.zp for inp in inputs)

    imgs, stds, msks, fscales = [], [], [], []
    for inp in inputs:
        # flux scale to the common zeropoint (prep_inputimages'
        # zp flattening, buildref.py:2442-2777): zp_i + extinction
        zp_i = inp.zp - inp.extco * (inp.airmass - 1.0)
        fs = 10.0 ** (0.4 * (zp_ref - zp_i))
        if remap == "shift2pass":
            sy_c, sx_c, Wy_c, Wx_c = remap_grid_coarse(
                inp.wcs, out_wcs, out_shape)
            ranges = grid_shift_ranges(sy_c, sx_c, blocks=8)
            ys = upsample_grid(jnp.asarray(sy_c, jnp.float32),
                               jnp.asarray(Wy_c), jnp.asarray(Wx_c))
            xs = upsample_grid(jnp.asarray(sx_c, jnp.float32),
                               jnp.asarray(Wy_c), jnp.asarray(Wx_c))
            img, std, msk = warp_shift2pass(
                (inp.image, inp.bkg_std, inp.mask),
                ("lanczos", "nearest", "nearest"),
                (0.0, jnp.float32(0.0), jnp.uint8(maskbits.EDGE)),
                (ys, xs), ranges)
            img = img * fs
            std = std * fs
        else:
            ys, xs = remap_grid(inp.wcs, out_wcs, out_shape)
            ys = jnp.asarray(ys)
            xs = jnp.asarray(xs)
            img = lanczos_resample(inp.image, ys, xs) * fs
            std = nearest_resample(inp.bkg_std, ys, xs,
                                   fill=jnp.float32(0.0)) * fs
            msk = nearest_resample(inp.mask, ys, xs,
                                   fill=jnp.uint8(maskbits.EDGE))
        imgs.append(img)
        stds.append(std)
        msks.append(msk)
        fscales.append(fs)

    stack = jnp.stack(imgs)
    stds = jnp.stack(stds)
    mask_stack = jnp.stack(msks)

    discard = (mask_stack & jnp.uint8(s.masktype_discard)) != 0
    w = jnp.where(discard | (stds <= 0), 0.0,
                  1.0 / jnp.maximum(stds, 1e-6) ** 2)

    # per-image noise scale from the (subsampled) native background STD
    # in the common flux scale — same convention as the blocked path
    sigmas = jnp.asarray(
        [float(np.median(np.asarray(inp.bkg_std)[::4, ::4])) * f
         for inp, f in zip(inputs, fscales)], jnp.float32)
    if s.combine_type == "clipped" and N >= s.clip.nmin_clip:
        radius = int(np.ceil(s.clip.protect_radius_fwhm
                             * max(inp.fwhm_pix for inp in inputs)))
        protect = saturation_protect(mask_stack, radius)
        co, wsum, nclip = clipped_coadd(stack, w, sigmas, s.clip,
                                        protect=protect)
    else:
        co, wsum = weighted_coadd(stack, w)
        nclip = jnp.zeros(out_shape, jnp.int32)

    mask_co = coadd_mask(mask_stack)
    std_co = coadd_bkg_std(wsum)
    # off-frame: no weight anywhere
    off = wsum <= 0
    mask_co = jnp.where(off, mask_co | maskbits.EDGE, mask_co)

    return {
        "image": co, "bkg_std": std_co, "mask": mask_co,
        "wsum": wsum, "nclipped": nclip,
        "fscales": np.asarray(fscales, np.float32),
        "zp": float(zp_ref),
        "nimages": N,
    }


def coadd_field_blocked(inputs: Sequence[RefInput], out_wcs, out_shape,
                        s: BuildRefSettings = BuildRefSettings(),
                        zp_ref: Optional[float] = None,
                        block_rows: int = 1320, pad_rows: int = 256,
                        instrument: bool = False,
                        remap: str = "shift2pass"):
    """Row-blocked co-addition for stacks that exceed device memory.

    A 40-image full-frame stack is ~18 GB of fp32 (SURVEY.md §7.4 hard
    part 5) — far beyond one chip's HBM.  SWarp streams input LINES per
    output line; the equivalent here: inputs stay in host RAM, and for
    each output row block every input contributes a fixed-height row
    slab (block + pad for dither/rotation, clamped at the edges).  The
    jitted block program remaps, scales and Gruen-clips the
    (N, block, W) stack on device; outputs accumulate on host.  Exactly
    :func:`coadd_field` semantics when every contribution fits the slab
    (checked per block; violations are logged and clipped to edge).
    """
    import jax

    N = len(inputs)
    if N == 0:
        raise ValueError("no co-add inputs")
    if zp_ref is None:
        zp_ref = max(inp.zp for inp in inputs)
    H, W = out_shape
    block_rows = min(block_rows, H)

    imgs = [np.asarray(inp.image, np.float32) for inp in inputs]
    msks = [np.asarray(inp.mask, np.uint8) for inp in inputs]
    Hin, Win = imgs[0].shape

    # background-STD source: when every input carries its mini mesh,
    # the std slabs rebuild on device from resident meshes + the
    # Catmull-Rom weight matrices (transferred ONCE) — cutting the
    # per-block host->device stream from 9 to 5 bytes/px.  Matmul rows
    # are independent, so row-sliced reconstruction is bit-identical
    # to slicing the full-res plane (ops.background.mini2back).
    use_mini = all(inp.bkg_std_mini is not None and inp.bkg_boxsize
                   for inp in inputs)
    use_mini = use_mini and len(
        {(inp.bkg_std_mini.shape, inp.bkg_boxsize)
         for inp in inputs}) == 1
    if use_mini:
        from blackbox_tpu.ops.background import _catmull_rom_matrix
        box_std = inputs[0].bkg_boxsize
        stdm_stack = jnp.asarray(np.stack(
            [np.asarray(inp.bkg_std_mini, np.float32)
             for inp in inputs]))
        Wy_std = jnp.asarray(_catmull_rom_matrix(
            Hin, stdm_stack.shape[1], box_std).astype(np.float32))
        Wx_std = jnp.asarray(_catmull_rom_matrix(
            Win, stdm_stack.shape[2], box_std).astype(np.float32))
        stds = None
    else:
        stds = [np.asarray(inp.bkg_std, np.float32)
                for inp in inputs]

    fscales = np.array(
        [10.0 ** (0.4 * (zp_ref - (inp.zp - inp.extco
                                   * (inp.airmass - 1.0))))
         for inp in inputs], np.float32)
    sigmas = jnp.asarray(
        [float(np.median(np.asarray(inp.bkg_std)[::4, ::4])) * f
         for inp, f in zip(inputs, fscales)], jnp.float32)
    do_clip = s.combine_type == "clipped" and N >= s.clip.nmin_clip
    protect_radius = int(np.ceil(s.clip.protect_radius_fwhm
                                 * max(inp.fwhm_pix for inp in inputs)))
    # blocks carry a protect-radius halo so saturation protection seen
    # by the Gruen clipping matches the unblocked coadd_field exactly:
    # without it, a saturated star just outside the block would leave
    # its PSF wings unprotected across the seam
    ext = protect_radius if do_clip else 0
    # halo start snaps DOWN to the 32-px coarse remap lattice: the
    # bilinear coordinate upsample then interpolates between the SAME
    # nodes as the resident path, keeping frame-boundary fill decisions
    # bit-aligned (an unaligned origin shifts coords by ~1e-4 px and
    # flips in-frame tests along the first/last column)
    erows = block_rows + 2 * ext + 32
    # +32: remap_grid_coarse's node grid overshoots the block by up
    # to one coarse step, and the slab must cover the overshoot node's
    # source rows or edge blocks read truncated slabs
    slab_h = min(erows + 32 + 2 * pad_rows, Hin)

    # pre-pass: every block x input coarse grid (host WCS math), the
    # slab origins, and — for the shift2pass remap — the UNION
    # per-strip integer shift ranges (static: one traced program is
    # shared by every input under lax.map and every block)
    grids = {}
    union_ry = union_rx = None
    for b0 in range(0, H, block_rows):
        ey0 = max(0, ((b0 - ext) // 32) * 32)
        for i in range(N):
            sy_c, sx_c, Wy_b, Wx_b = remap_grid_coarse(
                inputs[i].wcs, out_wcs, (erows, W), y0=ey0)
            lo = int(np.floor(sy_c.min())) - 4
            hi = int(np.ceil(sy_c.max())) + 4
            if hi - lo > slab_h:
                log.warning("coadd block y=%d input %d: contribution "
                            "span %d exceeds slab %d (raise pad_rows)",
                            b0, i, hi - lo, slab_h)
            y0s = int(np.clip(lo, 0, max(Hin - slab_h, 0)))
            grids[(b0, i)] = (sy_c, sx_c, Wy_b, Wx_b, y0s)
            if remap == "shift2pass":
                # blocks=1 (global ranges, not per-strip): the
                # lax.map body must stay small — the 8-strip body
                # under lax.map materialised tap slices (measured
                # 180 s/block vs 15 s with the global-range body),
                # and the extra taps beyond a strip's local need are
                # exact-zero-weight work
                ry, rx = grid_shift_ranges(sy_c - y0s, sx_c, blocks=1)
                if union_ry is None:
                    union_ry, union_rx = ry, rx
                else:
                    union_ry = (min(union_ry[0], ry[0]),
                                max(union_ry[1], ry[1]))
                    union_rx = (min(union_rx[0], rx[0]),
                                max(union_rx[1], rx[1]))

    @jax.jit
    def combine_block(slab_img, std_in, slab_msk, csy, csx, Wy, Wx,
                      fs):
        def one(t):
            im, st_t, mk, sy_c, sx_c, f = t
            if use_mini:
                # std slab rows rebuilt on device: rows y0s..y0s+slab_h
                # of mini2back's (Wy @ mesh) @ Wx.T — bit-identical to
                # slicing the full-res plane (matmul row independence)
                stdm, y0s = st_t
                wy = jax.lax.dynamic_slice(
                    Wy_std, (y0s, 0), (slab_h, Wy_std.shape[1]))
                st = jnp.matmul(jnp.matmul(wy, stdm,
                                           precision="highest"),
                                Wx_std.T, precision="highest")
            else:
                st = st_t
            # coarse -> full grids on device (two small matmuls)
            yl = upsample_grid(sy_c, Wy, Wx)
            xl = upsample_grid(sx_c, Wy, Wx)
            if remap == "shift2pass":
                # streaming shifted-adds instead of per-pixel gathers:
                # the gather form was the blocked co-add's dominant
                # device cost (123 of 209 s at half scale, round 5)
                img, std, m = warp_shift2pass(
                    (im, st, mk), ("lanczos", "nearest", "nearest"),
                    (0.0, jnp.float32(0.0), jnp.uint8(maskbits.EDGE)),
                    (yl, xl), (union_ry, union_rx))
                img = img * f
                std = std * f
            else:
                img = lanczos_resample(im, yl, xl) * f
                std = nearest_resample(st, yl, xl,
                                       fill=jnp.float32(0.0)) * f
                m = nearest_resample(mk, yl, xl,
                                     fill=jnp.uint8(maskbits.EDGE))
            return img, std, m

        # sequential over inputs (lax.map, not vmap and not python-
        # unrolled): vmap multiplies the live temps by N and OOMs;
        # python-unrolling lets XLA interleave all N inputs' warps and
        # ALSO OOMs (measured 27.9 GB at half scale).  The map body
        # does tax the shift2pass fusion (the same 10-input slab warp
        # measures 25 ms unrolled vs 616 ms mapped on chip), but with
        # GLOBAL shift ranges (blocks=1, small body) the mapped warp
        # still beats the per-pixel gather form by ~50x while keeping
        # peak liveness at one input's working set.
        stack, std_b, mask_b = jax.lax.map(
            one, (slab_img, std_in, slab_msk, csy, csx, fs))
        discard = (mask_b & jnp.uint8(s.masktype_discard)) != 0
        w = jnp.where(discard | (std_b <= 0), 0.0,
                      1.0 / jnp.maximum(std_b, 1e-6) ** 2)
        if do_clip:
            protect = saturation_protect(mask_b, protect_radius)
            co, wsum, nclip = clipped_coadd(stack, w, sigmas, s.clip,
                                            protect=protect)
        else:
            co, wsum = weighted_coadd(stack, w)
            nclip = jnp.zeros(co.shape, jnp.int32)
        mask_co = coadd_mask(mask_b)
        mask_co = jnp.where(wsum <= 0, mask_co | maskbits.EDGE, mask_co)
        # nclip <= N: uint8 on the wire when N fits — the device->host
        # drain is 3 bytes/px lighter at zero information loss (the
        # survey caps stacks at 40 images; the guard keeps direct
        # callers with >255 inputs exact rather than wrapping mod 256)
        if N <= 255:
            nclip = nclip.astype(jnp.uint8)
        return co, wsum, nclip, mask_co

    out_img = np.zeros(out_shape, np.float32)
    out_wsum = np.zeros(out_shape, np.float32)
    out_nclip = np.zeros(out_shape, np.int32)   # widened on drain
    out_mask = np.zeros(out_shape, np.uint8)

    Wy = Wx = None
    fs_dev = jnp.asarray(fscales)

    def drain(pending):
        """Materialise a finished block's interior into the host
        mosaics (cropping the protection halo)."""
        b0, hb, off, (co, wsum, nclip, mask_co) = pending
        out_img[b0:b0 + hb] = np.asarray(co)[off:off + hb]
        out_wsum[b0:b0 + hb] = np.asarray(wsum)[off:off + hb]
        out_nclip[b0:b0 + hb] = np.asarray(nclip)[off:off + hb]
        out_mask[b0:b0 + hb] = np.asarray(mask_co)[off:off + hb]

    # 1-deep software pipeline: while the device combines block k, the
    # host prepares and transfers block k+1's slabs (JAX dispatch is
    # async; only the np.asarray drain of block k-1 blocks).  Wall time
    # is then max(host prep + transfer, device compute) per block, not
    # their sum.
    # opt-in per-stage breakdown (instrument=True): the pipeline is
    # deliberately broken by a device sync after each stage so the
    # wall time attributes to host-prep / upload / device-compute /
    # drain — syncs pull a tiny strided scalar (block_until_ready can
    # return early on tunneled backends, PERF_NOTES).
    tim = ({"prep_s": 0.0, "upload_s": 0.0, "compute_s": 0.0,
            "drain_s": 0.0, "nblocks": 0} if instrument else None)

    def _sync(*arrs):
        for a in arrs:
            if isinstance(a, jnp.ndarray) and a.ndim >= 2:
                float(jnp.sum(a[..., ::509, ::509]))

    pending = None
    for b0 in range(0, H, block_rows):
        t0 = time.perf_counter() if instrument else 0.0
        hb = min(block_rows, H - b0)
        ey0 = max(0, ((b0 - ext) // 32) * 32)
        off = b0 - ey0
        slabs_i, slabs_s, slabs_m, csys, csxs = [], [], [], [], []
        y0s_list = []
        for i in range(N):
            sy_c, sx_c, Wy_b, Wx_b, y0s = grids[(b0, i)]
            if Wy is None:
                Wy, Wx = jnp.asarray(Wy_b), jnp.asarray(Wx_b)
            y0s_list.append(y0s)
            slabs_i.append(imgs[i][y0s:y0s + slab_h])
            if not use_mini:
                slabs_s.append(stds[i][y0s:y0s + slab_h])
            slabs_m.append(msks[i][y0s:y0s + slab_h])
            csys.append((sy_c - y0s).astype(np.float32))
            csxs.append(sx_c.astype(np.float32))
        stack_i = np.stack(slabs_i)
        stack_m = np.stack(slabs_m)
        stack_s = None if use_mini else np.stack(slabs_s)
        if instrument:
            t1 = time.perf_counter()
            tim["prep_s"] += t1 - t0
        if use_mini:
            std_in = (stdm_stack,
                      jnp.asarray(np.asarray(y0s_list, np.int32)))
        else:
            std_in = jnp.asarray(stack_s)
        dev_i = jnp.asarray(stack_i)
        dev_m = jnp.asarray(stack_m)
        dev_cy = jnp.asarray(np.stack(csys))
        dev_cx = jnp.asarray(np.stack(csxs))
        if instrument:
            _sync(dev_i, dev_m,
                  *(std_in if isinstance(std_in, tuple) else (std_in,)))
            t2 = time.perf_counter()
            tim["upload_s"] += t2 - t1
        res = combine_block(dev_i, std_in, dev_m, dev_cy, dev_cx,
                            Wy, Wx, fs_dev)
        if instrument:
            _sync(*res)
            t3 = time.perf_counter()
            tim["compute_s"] += t3 - t2
            tim["nblocks"] += 1
        if pending is not None:
            td = time.perf_counter() if instrument else 0.0
            drain(pending)
            if instrument:
                tim["drain_s"] += time.perf_counter() - td
        pending = (b0, hb, off, res)
    if pending is not None:
        td = time.perf_counter() if instrument else 0.0
        drain(pending)
        if instrument:
            tim["drain_s"] += time.perf_counter() - td

    std_co = np.asarray(coadd_bkg_std(jnp.asarray(out_wsum)))
    out = {
        "image": out_img, "bkg_std": std_co, "mask": out_mask,
        "wsum": out_wsum, "nclipped": out_nclip,
        "fscales": fscales, "zp": float(zp_ref), "nimages": N,
    }
    if instrument:
        out["timings"] = tim
    return out


def choose_clip_params(inputs: Sequence[RefInput],
                       s: BuildRefSettings = BuildRefSettings()):
    """A_swarp search over the inputs' centre PSF stamps (§2.2)."""
    stamps = [i.psf_stamp for i in inputs if i.psf_stamp is not None]
    if len(stamps) < 3:
        return s.clip
    arr = np.stack(stamps)
    A, ns, nout, nkept = a_swarp_search(arr, np.ones(len(arr), bool))
    return dataclasses.replace(s.clip, A=A, nsigma=ns)


def load_ref_input(red_path: str, bkg_boxsize: int = 256) -> RefInput:
    """Load one published science product set as a co-add input.

    Reads the _red/_mask/_psf products, re-estimates the background on
    device (the reference's prep_inputimages likewise rebuilds the
    background from the mini image or SExtractor,
    /root/reference/buildref.py:2442-2777).
    """
    import os
    import jax.numpy as jnp
    from blackbox_tpu.astro.wcs import TanWCS
    from blackbox_tpu.io.psffits import read_psf
    from blackbox_tpu.io.rice import read_rice
    from blackbox_tpu.ops.background import background_mesh, mini2back
    from blackbox_tpu.ops.psf import psf_at

    base = red_path[:red_path.index("_red.fits")]
    img, h = read_rice(red_path)
    mask, _ = read_rice(base + "_mask.fits.fz")
    img = jnp.asarray(np.asarray(img, np.float32))
    mask = jnp.asarray(np.asarray(mask, np.uint8))

    box = min(bkg_boxsize, img.shape[0] // 4)
    mesh, stdm = background_mesh(img, mask != 0, box)
    bkg = mini2back(mesh, img.shape, box)
    bstd = mini2back(stdm, img.shape, box)

    psf_stamp = None
    psf_path = base + "_psf.fits"
    if os.path.exists(psf_path):
        model = read_psf(psf_path)
        cy, cx = img.shape[0] / 2.0, img.shape[1] / 2.0
        psf_stamp = np.asarray(psf_at(model, cx, cy))

    # saturated-pixel interpolation before stacking (the reference runs
    # zogy.fixpix in prep_inputimages, buildref.py:2347)
    from blackbox_tpu.core import maskbits
    from blackbox_tpu.ops.filters import fixpix
    satbad = (mask & (maskbits.SATURATED | maskbits.SAT_CONNECTED)) != 0
    img = fixpix(img, satbad)

    # seeing FWHM in pixels for the clip-protection radius
    wcs = TanWCS.from_header(h)
    try:
        fwhm_pix = float(h.get("S-SEEING")) / max(wcs.pixscale, 1e-9)
    except (TypeError, ValueError):
        fwhm_pix = 4.0

    return RefInput(
        image=img - bkg, bkg_std=bstd, mask=mask,
        bkg_std_mini=np.asarray(stdm, np.float32), bkg_boxsize=box,
        wcs=wcs,
        zp=float(h.get("PC-ZP", 25.0)),
        airmass=float(h.get("AIRMASS", 1.0)),
        gain=float(h.get("GAIN", 1.0)),
        rdnoise=float(h.get("RDNOISE", 10.0)),
        saturate=float(h.get("SATURATE", 55000.0)),
        fwhm_pix=min(max(fwhm_pix, 1.0), 20.0),
        psf_stamp=psf_stamp)


def build_reference(tree, telescope: str, field_id: int, filt: str,
                    s: BuildRefSettings = BuildRefSettings(),
                    out_shape=None, pixscale: float = 0.5642,
                    dlimmag_min: float = 0.1, extract_ctx=None):
    """Full prep_ref flow: select -> co-add -> QC -> publication gate.

    Mirrors /root/reference/buildref.py:1013-1420: inputs come from the
    header-table index; the new reference replaces an existing one only
    if the projected limiting magnitude improves by ``dlimmag_min``
    (1296-1354; the old ref is archived, not deleted).
    Returns (status, info dict).
    """
    import os
    from blackbox_tpu.io.fits import Header, write_image
    from blackbox_tpu.io.rice import read_rice, write_rice
    from blackbox_tpu.io.storage import get_backend, list_files
    from blackbox_tpu.orchestration.headertable import query
    from blackbox_tpu.orchestration.paths import DataTree, base_name
    from blackbox_tpu.qc.engine import run_qc_check

    rows = query(tree, telescope, "cat", OBJECT=str(field_id),
                 FILTER=filt)
    sel, info = select_images(rows, s)
    if len(sel) < s.nimages_min:
        return "too_few_images", {"nsel": len(sel)}

    # resolve product paths from the red tree via the night dates
    from blackbox_tpu.config.base import get_par
    from blackbox_tpu.orchestration.paths import night_date
    site = get_par(s.site, telescope)
    inputs, used = [], []
    for r in sel:
        date = night_date(float(r["MJD-OBS"]), site[1])
        rdir = tree.red_dir(date)
        p = os.path.join(rdir, str(r["FILENAME"]).replace(
            "_red.fits", "_red.fits.fz"))
        if not os.path.exists(p):
            continue
        inputs.append(load_ref_input(p))
        used.append(os.path.basename(p))
    if len(inputs) < s.nimages_min:
        return "missing_products", {"nfound": len(inputs)}

    # output grid: the deepest input's WCS centre (center_type='grid'
    # uses the survey field definition; callers with a grid pass their
    # own out_shape/WCS through coadd_field directly)
    import jax.numpy as jnp
    wcs_out = inputs[0].wcs
    shape = out_shape or tuple(np.asarray(inputs[0].image.shape))

    sref = dataclasses.replace(s, clip=choose_clip_params(inputs, s))
    # resident stacks beyond ~4 GB go through the row-blocked streaming
    # combiner (SURVEY §7.4 hard part 5: 40 frames = 18 GB > HBM)
    stack_bytes = len(inputs) * int(np.prod(shape)) * 4 * 3
    if stack_bytes > 4e9:
        out = coadd_field_blocked(inputs, wcs_out, shape, sref)
        out = {k: (jnp.asarray(v) if k in ("image", "bkg_std", "mask")
                   else v) for k, v in out.items()}
    else:
        out = coadd_field(inputs, wcs_out, shape, sref)

    # limiting magnitude of the co-add at its common zeropoint
    from blackbox_tpu.astro.photcal import limiting_magnitude
    med_std = float(jnp.median(out["bkg_std"]))
    limmag = limiting_magnitude(out["zp"], med_std, 3.0, 1.0)
    out["limmag"] = limmag

    # improvement gate vs the existing reference
    rdir = tree.ref_dir(field_id)
    existing = [f for f in list_files(os.path.join(rdir, "*_red.fits*"))
                if f"_{filt}_" in os.path.basename(f)]
    if existing:
        _, h_old = read_rice(existing[-1])
        old_lim = float(h_old.get("LIMMAG", -99.0))
        if limmag < old_lim + dlimmag_min:
            return "not_deeper", {"limmag": limmag, "old": old_lim}
        # archive, don't delete (ref-old semantics)
        arch = os.path.join(rdir, "ref-old")
        be = get_backend(arch)
        be.make_dir(arch)
        for f in list_files(os.path.join(rdir, "*")):
            if get_backend(f).isfile(f):
                get_backend(f).copy(f, os.path.join(
                    arch, os.path.basename(f)))
                get_backend(f).remove(f)

    h = Header()
    h["IMAGETYP"] = ("ref", "reference co-add")
    h["OBJECT"] = (str(field_id), "field ID")
    h["FILTER"] = (filt, "filter")
    h["NIMAGES"] = (out["nimages"], "co-added images")
    h["PC-ZP"] = (round(out["zp"], 4), "[mag] common zeropoint")
    h["LIMMAG"] = (round(limmag, 4), "[mag] limiting magnitude")
    h["R-ASWARP"] = (sref.clip.A, "clipping amplitude A")
    h["R-NSIGMA"] = (sref.clip.nsigma, "clipping threshold")
    for i, name in enumerate(used[:40]):
        h[f"R-IM{i + 1}"] = (name, "input image")
    wcs_out.to_header(h)
    from blackbox_tpu.qc.ranges import QC_RANGES_REF
    flag = run_qc_check(h, telescope, check_key_type="ref",
                        ranges_table=QC_RANGES_REF)

    get_backend(rdir).make_dir(rdir)
    stamp = f"{telescope}_{field_id:05d}_{filt}_coadd"

    # source extraction + PSF on the co-add (the reference runs zogy in
    # ref-only mode on the combined image, buildref.py:1213-1242); the
    # resulting catalog/PSF are what the transient path consumes
    if extract_ctx is not None:
        import jax
        from blackbox_tpu.io.psffits import write_psf
        from blackbox_tpu.pipeline.catalogs import (
            device_cat_to_columns, write_catalog)
        from blackbox_tpu.pipeline.reduce import extract_catalog
        ext = jax.jit(lambda a, m: extract_catalog(extract_ctx, a, m))(
            out["image"], out["mask"])
        estats = {k: float(np.asarray(v))
                  for k, v in ext["stats"].items()}
        h["NOBJECTS"] = (int(estats["nobjects"]), "detected sources")
        h["S-SEEING"] = (round(estats["s_seeing_pix"] * pixscale, 3),
                         "[arcsec] co-add seeing")
        cat = {k: np.asarray(v) for k, v in ext["cat"].items()}
        cols = device_cat_to_columns(
            cat, out["zp"], wcs=wcs_out,
            n_aper=len(extract_ctx.apphot_radii))
        write_catalog(os.path.join(rdir, stamp + "_red_cat.fits"),
                      cols, h, "ref")
        if "psf" in ext:
            write_psf(os.path.join(rdir, stamp + "_psf.fits"),
                      ext["psf"], h)

    red_p = os.path.join(rdir, stamp + "_red.fits.fz")
    write_rice(red_p, np.asarray(out["image"], np.float32), h,
               qlevel=16.0)
    write_rice(os.path.join(rdir, stamp + "_mask.fits.fz"),
               np.asarray(out["mask"], np.uint8), h)
    write_rice(os.path.join(rdir, stamp + "_bkgstd.fits.fz"),
               np.asarray(out["bkg_std"], np.float32), h, qlevel=8.0)
    write_image(os.path.join(rdir, stamp + "_red_hdr.fits"), None, h)

    return ("published" if flag != "red" else "red_flagged"), {
        "path": red_p, "limmag": limmag, "nimages": out["nimages"],
        "qc": flag}

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
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from blackbox_tpu.core import maskbits
from blackbox_tpu.ops.coadd import (
    ClipParams, clipped_coadd, weighted_coadd, coadd_mask, coadd_bkg_std,
    a_swarp_search)
from blackbox_tpu.ops.warp import remap_grid, lanczos_resample, \
    nearest_resample


@dataclasses.dataclass(frozen=True)
class BuildRefSettings:
    """set_buildref equivalents (/root/reference/Settings/set_buildref.py)."""

    combine_type: str = "clipped"        # :39
    max_spread_seeing: float = 0.3       # :45
    seeing_max: float = 4.0              # per-filter cap, ″ (:90-92)
    qc_accept: tuple = ("green", "yellow")
    limmag_target: float = 23.0          # :106
    dmag: float = 0.5
    dlimmag_proj_min: float = 0.002      # marginal-gain cut (:121-126)
    nimages_min: int = 3                 # :111
    nimages_max: int = 40                # :116
    masktype_discard: int = 63           # :57 (all bits but edge... 63=BAD|CR|SAT|SATCON|SATL|EDGE)
    pixscale_out: float = 0.5642         # :70-73 MANUAL
    clip: ClipParams = ClipParams()


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
    psf_stamp: Optional[np.ndarray] = None   # (S, S) centre PSF


def select_images(table: Sequence[dict],
                  s: BuildRefSettings = BuildRefSettings()):
    """Pick co-add inputs from header-table rows of one field x filter.

    Each row needs: QC-FLAG, S-SEEING ["], LIMMAG [mag], and anything the
    caller wants back.  Returns the selected rows, LIMMAG-sorted.
    """
    rows = [r for r in table
            if str(r.get("QC-FLAG", "red")).lower() in s.qc_accept
            and float(r.get("S-SEEING", 99.0)) < s.seeing_max
            and not bool(r.get("ISTRACKI", False))]
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
                zp_ref: Optional[float] = None):
    """Remap + scale + combine one field's inputs on the output grid.

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
        ys, xs = remap_grid(inp.wcs, out_wcs, out_shape)
        ys = jnp.asarray(ys)
        xs = jnp.asarray(xs)
        # flux scale to the common zeropoint (prep_inputimages'
        # zp flattening, buildref.py:2442-2777): zp_i + extinction
        zp_i = inp.zp - inp.extco * (inp.airmass - 1.0)
        fs = 10.0 ** (0.4 * (zp_ref - zp_i))
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

    sigmas = jnp.asarray([float(jnp.median(st)) for st in stds],
                         jnp.float32)
    if s.combine_type == "clipped" and N >= s.clip.nmin_clip:
        co, wsum, nclip = clipped_coadd(stack, w, sigmas, s.clip)
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


def choose_clip_params(inputs: Sequence[RefInput],
                       s: BuildRefSettings = BuildRefSettings()):
    """A_swarp search over the inputs' centre PSF stamps (§2.2)."""
    stamps = [i.psf_stamp for i in inputs if i.psf_stamp is not None]
    if len(stamps) < 3:
        return s.clip
    arr = np.stack(stamps)
    A, ns, nout, nkept = a_swarp_search(arr, np.ones(len(arr), bool))
    return dataclasses.replace(s.clip, A=A, nsigma=ns)

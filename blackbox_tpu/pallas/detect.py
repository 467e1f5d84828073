"""Fused source detection: matched filter -> threshold -> labels, one pass.

The jnp detection chain (:func:`blackbox_tpu.ops.detection.
detect_segments`) materialises the matched-filtered frame, the boolean
detection map, the initial label image, the propagated labels and the
root mask — each a full-frame HBM round-trip (~10 ms/pass at 10.5k²,
"matched+thresh 42 ms" in PERF_NOTES.md) — before
:mod:`blackbox_tpu.pallas.labelprop` does the actual component labeling.
All of it is tile-local arithmetic: this kernel loads one image tile
(with a conv+propagation halo), convolves with the separable Gaussian
taps, thresholds against ``nsigma * max(bkg_std, 1e-6)``, seeds labels
with the pixels' global flat indices, runs all ``iters`` min-pool label
iterations in VMEM, and writes the final segment map plus a per-tile
root count — one HBM read per input and one write total.

Tap order, threshold math and propagation semantics replicate
``detection.matched_filter`` / ``detection.label_segments`` exactly
(bit-identical away from the halo, which the margins absorb — see
:mod:`blackbox_tpu.pallas.labelprop` for the wrap-corruption argument).
The reference runs SExtractor's C filter/threshold/deblend scan for this
(via zogy's run_sextractor — SURVEY.md §2.4).

STATUS: opt-in only (``BBTPU_PALLAS_DETECT=1``).  Measured on a real
v5e, the fusion saves just ~7 ms over the jnp chain (69.6 vs 76.7 ms at
10.5k² — XLA fuses matched+threshold and labeling already runs the
Pallas labelprop kernel), and with taps+std+excl enabled together the
kernel's live set exceeds Mosaic's 16 MB scoped-VMEM stack: compiles
either fail ("Ran out of memory in memory space vmem ... should not be
possible") or, right at the limit, SILENTLY MISCOMPILE (336k roots vs
3992 at full scale, while each feature in isolation is bit-exact on
chip).  Until the kernel is restructured to shrink peak liveness, the
default path stays jnp + labelprop.  A standalone reproduction
harness for the toolchain issue lives at
``tools/repro_pallas_detect_miscompile.py`` (run on the target chip;
healthy toolchains print all-OK rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blackbox_tpu.pallas.labelprop import LANE_HALO, _min3


def _conv_taps(x, taps, axis: int):
    """Separable zero-pad convolution as rolled adds (tap order and f32
    accumulation order identical to detection._conv1d; the circular
    wrap only corrupts the tile margin, absorbed by the halo)."""
    n = x.shape[axis]
    r = (len(taps) - 1) // 2
    out = None
    for i, k in enumerate(taps):
        sl = pltpu.roll(x, (r - i) % n, axis)
        term = jnp.float32(k) * sl
        out = term if out is None else out + term
    return out


def _detect_kernel(*refs, has_std, has_excl, taps, absval, nsigma,
                   iters, th, tw, halo, big, H, W):
    # refs: img, [std], [excl], seg_out, count_out, scratches..., sem
    img_hbm = refs[0]
    idx = 1
    std_hbm = excl_hbm = None
    if has_std:
        std_hbm = refs[idx]; idx += 1
    if has_excl:
        excl_hbm = refs[idx]; idx += 1
    seg_out = refs[idx]
    cnt_out = refs[idx + 1]
    scratches = refs[idx + 2:-1]
    sem = refs[-1]

    i = pl.program_id(0)
    j = pl.program_id(1)
    hh = th + 2 * halo
    ww = tw + 2 * LANE_HALO

    t_img = scratches[0]
    s = 1
    t_std = t_excl = None
    if std_hbm is not None:
        t_std = scratches[s]; s += 1
    if excl_hbm is not None:
        t_excl = scratches[s]; s += 1

    def fetch(src, dst, slot):
        cp = pltpu.make_async_copy(
            src.at[pl.ds(i * th, hh), pl.ds(j * tw, ww)], dst,
            sem.at[slot])
        cp.start()
        return cp

    cps = [fetch(img_hbm, t_img, 0)]
    if std_hbm is not None:
        cps.append(fetch(std_hbm, t_std, 1))
    if excl_hbm is not None:
        cps.append(fetch(excl_hbm, t_excl, 2))
    for cp in cps:
        cp.wait()

    x = t_img[:]
    if taps is not None:
        x = _conv_taps(_conv_taps(x, taps, 0), taps, 1)
    if absval:
        x = jnp.abs(x)
    if t_std is not None:
        thrmap = jnp.float32(nsigma) * jnp.maximum(t_std[:],
                                                   jnp.float32(1e-6))
    else:
        thrmap = jnp.float32(nsigma)
    det = x > thrmap
    if t_excl is not None:
        # int8 vector cmpi is unsupported on v5e Mosaic ("Target does
        # not support this comparison") — widen before comparing
        det = det & (t_excl[:].astype(jnp.int32) == 0)

    # global flat index labels in ORIGINAL (unpadded) coordinates; the
    # filtered map can spill past the original frame border into the
    # zero pad (taps reach r px), so detections are explicitly gated to
    # in-bounds pixels — otherwise pad pixels could count as roots or
    # bridge separate border components
    rr = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 1)
    orow = rr + (i * th - halo)
    ocol = cc + (j * tw - LANE_HALO)
    det = det & (orow >= 0) & (orow < jnp.int32(H)) \
        & (ocol >= 0) & (ocol < jnp.int32(W))
    flat = orow * jnp.int32(W) + ocol + 1
    bigv = jnp.int32(big)
    lab0 = jnp.where(det, flat, bigv)

    def body(_, lab):
        m = _min3(_min3(lab, 0), 1)
        return jnp.where(lab0 >= bigv, bigv, m)

    lab = jax.lax.fori_loop(0, iters, body, lab0)

    det_i = det[halo:halo + th, LANE_HALO:LANE_HALO + tw]
    lab_i = lab[halo:halo + th, LANE_HALO:LANE_HALO + tw]
    flat_i = flat[halo:halo + th, LANE_HALO:LANE_HALO + tw]
    seg_out[:] = jnp.where(det_i, lab_i, 0)
    # cnt_out is the whole (grid_h, grid_w) SMEM array (Mosaic rejects
    # sub-(8,128) blocks; a full-array block is always legal) — each
    # sequential grid step writes its own element exactly once
    cnt_out[i, j] = jnp.sum((det_i & (lab_i == flat_i)).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=(
    "taps", "absval", "nsigma", "iters", "interpret"))
def fused_detect_pallas(image, bkg_std, excl, taps, nsigma: float,
                        iters: int = 32, absval: bool = False,
                        interpret: bool = False):
    """Matched filter + threshold + connected-component labels, fused.

    image   : (H, W) f32 map to detect on.
    bkg_std : (H, W) f32 or None — threshold is
              ``nsigma * max(bkg_std, 1e-6)`` (None: scalar ``nsigma``).
    excl    : (H, W) bool/int mask or None — True pixels excluded.
    taps    : tuple of static float filter taps (odd length), or None
              to skip filtering.
    absval  : threshold ``|image|`` (transient Scorr detection).

    Returns (seg (H, W) int32 — 0 background, root-flat-index+1 labels —
    and n, the int32 component count), identical to
    ``detection.label_segments`` on the thresholded map.
    """
    H, W = image.shape
    r = 0 if taps is None else (len(taps) - 1) // 2
    halo = -(-(iters + r) // 8) * 8
    if halo > LANE_HALO:
        raise ValueError(f"iters+r={iters + r} needs lane halo > "
                         f"{LANE_HALO}")

    tw = 512 if W >= 512 else 128
    th = 512 if H >= 512 else 8
    Hp = -(-H // th) * th
    Wp = -(-W // tw) * tw
    grid = (Hp // th, Wp // tw)
    hh, ww = th + 2 * halo, tw + 2 * LANE_HALO
    big = int(H * W + 2)

    def padded(a, fill):
        return jnp.pad(a, ((halo, halo + Hp - H),
                           (LANE_HALO, LANE_HALO + Wp - W)),
                       constant_values=fill)

    inputs = [padded(image.astype(jnp.float32), 0.0)]
    scratch = [pltpu.VMEM((hh, ww), jnp.float32)]
    if bkg_std is not None:
        inputs.append(padded(bkg_std.astype(jnp.float32), 0.0))
        scratch.append(pltpu.VMEM((hh, ww), jnp.float32))
    if excl is not None:
        inputs.append(padded(excl.astype(jnp.int8), 1))
        scratch.append(pltpu.VMEM((hh, ww), jnp.int8))
    scratch.append(pltpu.SemaphoreType.DMA((3,)))

    kern = functools.partial(
        _detect_kernel, has_std=bkg_std is not None,
        has_excl=excl is not None, taps=taps, absval=absval,
        nsigma=float(nsigma), iters=iters, th=th, tw=tw, halo=halo,
        big=big, H=H, W=W)
    seg, cnt = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(inputs),
        out_specs=(
            pl.BlockSpec((th, tw), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(grid, lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
            jax.ShapeDtypeStruct(grid, jnp.int32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)
    return seg[:H, :W], jnp.sum(cnt)

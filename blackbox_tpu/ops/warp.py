"""WCS resampling on device: Lanczos3 and nearest-neighbour remap.

SWarp replacement (reference: zogy ``run_remap`` shells out to SWarp with
LANCZOS3 for images and NEAREST for masks — /root/reference/buildref.py:
1730-1827, 2102-2234; SURVEY.md §2.4).  The source-coordinate grids are
built host-side in float64 from the TAN WCS pair (one cheap O(H·W) pass),
while the interpolation itself is a device kernel: a separable 6-tap
Lanczos gather, expressed as 36 full-image ``take``s so XLA pipelines the
HBM traffic instead of scalar-looping.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def remap_grid(wcs_src, wcs_dst, shape_dst, step: int = 32,
               y0: int = 0):
    """Source pixel coordinates (ys, xs) for every destination pixel.

    Exact TAN->sky->TAN mapping is evaluated on a coarse (step x step)
    host grid in float64 and interpolated bilinearly to full resolution
    (the mapping between two TAN projections of nearby tangent points is
    smooth at the sub-milli-pixel level over 32 px).  Returns float32
    arrays (H, W) of 0-based source coords.  ``y0`` offsets the
    destination rows (row-blocked co-addition).
    """
    H, W = shape_dst
    gy = np.arange(y0, y0 + H + step, step, np.float64)
    gx = np.arange(0, W + step, step, np.float64)
    gyy, gxx = np.meshgrid(gy, gx, indexing="ij")
    ra, dec = wcs_dst.pix2sky(gxx, gyy)
    sx, sy = wcs_src.sky2pix(ra, dec)

    # separable bilinear refinement to the full grid
    def up(coarse):
        fy = np.arange(H, dtype=np.float64) / step
        fx = np.arange(W, dtype=np.float64) / step
        i0 = np.minimum(fy.astype(np.int64), len(gy) - 2)
        j0 = np.minimum(fx.astype(np.int64), len(gx) - 2)
        ty = (fy - i0)[:, None]
        tx = (fx - j0)[None, :]
        c = coarse
        a = c[i0][:, j0] * (1 - ty) * (1 - tx)
        a += c[i0][:, j0 + 1] * (1 - ty) * tx
        a += c[i0 + 1][:, j0] * ty * (1 - tx)
        a += c[i0 + 1][:, j0 + 1] * ty * tx
        return a.astype(np.float32)

    return up(sy), up(sx)


def remap_grid_coarse(wcs_src, wcs_dst, shape_dst, step: int = 32,
                      y0: int = 0):
    """Coarse-node source coordinates + bilinear upsample matrices.

    The full (H, W) grids of :func:`remap_grid` are ~1 s of host numpy
    per input per block; the same mapping is exactly representable as
    coarse float64 nodes (host, trivial) upsampled ON DEVICE by two
    small matmuls: ``ys = Wy @ sy @ Wx.T``.  Returns
    (sy, sx, Wy, Wx): (ny, nx) float32 coarse grids and (H, ny), (W, nx)
    float32 weights.  ``y0`` offsets destination rows; Wy/Wx depend
    only on (shape, step) when y0 is a step multiple.
    """
    H, W = shape_dst
    gy = np.arange(y0, y0 + H + step, step, np.float64)
    gx = np.arange(0, W + step, step, np.float64)
    gyy, gxx = np.meshgrid(gy, gx, indexing="ij")
    ra, dec = wcs_dst.pix2sky(gxx, gyy)
    sx, sy = wcs_src.sky2pix(ra, dec)

    def weights(n_out, n_nodes):
        Wm = np.zeros((n_out, n_nodes), np.float32)
        f = np.arange(n_out, dtype=np.float64) / step
        i0 = np.minimum(f.astype(np.int64), n_nodes - 2)
        t = (f - i0).astype(np.float32)
        Wm[np.arange(n_out), i0] = 1.0 - t
        Wm[np.arange(n_out), i0 + 1] = t
        return Wm

    # coarse grids stay float64 (tiny): callers localise coordinates
    # (subtract the slab offset) BEFORE casting to f32, else the cast
    # at ~1e4 px magnitude costs 1e-3 px up front
    return sy, sx, weights(H, len(gy)), weights(W, len(gx))


def upsample_grid(coarse, Wy, Wx):
    """Device bilinear upsample of a coarse coordinate grid."""
    up = jnp.matmul(Wy, coarse, precision="highest")
    return jnp.matmul(up, Wx.T, precision="highest")


def _lanczos_tap(frac, k: int, a: int):
    """Un-normalised Lanczos-a weight of tap ``k`` (offset k-a+1)."""
    x = frac - jnp.float32(k - a + 1)
    pix = jnp.pi * x
    eps = 1e-7
    w = jnp.where(jnp.abs(x) < eps, 1.0,
                  a * jnp.sin(pix) * jnp.sin(pix / a)
                  / jnp.maximum(pix * pix, eps))
    return jnp.where(jnp.abs(x) < a, w, 0.0)


def lanczos_resample(src, ys, xs, a: int = 3, fill: float = 0.0,
                     row_offset=0, n_rows: int | None = None):
    """Sample ``src`` at fractional coords with separable Lanczos-a.

    src    : (H, W) float32 — possibly a row SLAB of a taller frame
    ys, xs : (H', W') 0-based source coordinates, LOCAL to ``src``
    Out-of-bounds samples return ``fill``.

    ``row_offset``/``n_rows`` support slab sampling: the in-bounds test
    runs against the FULL frame (``row_offset + ys`` vs ``n_rows``)
    while tap indices clamp to the slab — callers guarantee the slab
    covers every in-bounds tap (see :func:`resample_blocked`).

    Tap weights are recomputed per tap instead of stored: a
    materialised (H', W', 2a) weight tensor costs 6x the frame in HBM
    and OOMs the blocked co-add with several inputs resident.
    """
    H, W = src.shape
    Ht = H if n_rows is None else n_rows
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = ys - y0
    fx = xs - x0
    sy = sum(_lanczos_tap(fy, k, a) for k in range(2 * a))
    sx = sum(_lanczos_tap(fx, k, a) for k in range(2 * a))
    iy0 = y0.astype(jnp.int32)
    ix0 = x0.astype(jnp.int32)

    flat = src.ravel()
    acc = jnp.zeros(ys.shape, src.dtype)
    for ky in range(2 * a):
        iy = jnp.clip(iy0 + (ky - a + 1), 0, H - 1)
        row = iy * W
        wrow = _lanczos_tap(fy, ky, a) / sy
        for kx in range(2 * a):
            ix = jnp.clip(ix0 + (kx - a + 1), 0, W - 1)
            # indices are pre-clipped: mode="clip" skips the gather's
            # out-of-bounds select pass (default mode is "fill")
            acc = acc + (wrow * (_lanczos_tap(fx, kx, a) / sx)
                         * jnp.take(flat, row + ix, mode="clip"))

    yg = ys + row_offset
    inb = (yg >= 0) & (yg <= Ht - 1) & (xs >= 0) & (xs <= W - 1)
    return jnp.where(inb, acc, fill)


def nearest_resample(src, ys, xs, fill=0, row_offset=0,
                     n_rows: int | None = None):
    """Nearest-neighbour remap (masks; SWarp RESAMPLING_TYPE NEAREST).

    ``row_offset``/``n_rows``: slab sampling, see
    :func:`lanczos_resample`."""
    H, W = src.shape
    Ht = H if n_rows is None else n_rows
    iy = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, H - 1)
    ix = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, W - 1)
    out = jnp.take(src.ravel(), iy * W + ix, mode="clip")
    yg = ys + row_offset
    inb = (yg >= -0.5) & (yg <= Ht - 0.5) & (xs >= -0.5) & \
        (xs <= W - 0.5)
    return jnp.where(inb, out, jnp.asarray(fill, src.dtype))


def resample_blocked(srcs, modes, fills, grid, block_rows: int = 1320,
                     a: int = 3, margin: int = 64,
                     unroll: bool = False):
    """Resample several same-grid sources in ONE row-blocked pass.

    srcs  : tuple of (H, W) source arrays (shared coordinate mapping)
    modes : per-source "lanczos" | "nearest"
    fills : per-source out-of-bounds fill value
    grid  : (sy, sx, Wy, Wx) coarse nodes + upsample weights from
            :func:`remap_grid_coarse`, or (ys, xs) full planes
    block_rows : rows per block; must divide the destination height
    margin : source rows of slack above/below each destination block.
        MUST bound the mapping's row deviation ``max |ys - y_dest|``
        plus the tap radius ``a`` — in-frame samples whose taps fall
        outside the slab come back wrong (out-of-frame samples are
        still filled correctly, the in-bounds test uses true frame
        coordinates).  Production new<->ref remaps deviate by a few px
        (same pointing); the 64 default covers a 0.3 deg rotation at
        10.5k².  Use :func:`grid_row_margin` to size it from a grid.

    Two full-scale measurements shape this design (PERF_NOTES.md):
    the dense tap loop keeps ~20 full-frame s32 index planes live
    (~9 GB of HLO temps — OOM inside the fused science program on a
    16 GB v5e), and full-frame-source gathers (111M-element operand)
    fault the v5e DMA engine at runtime.  Each block therefore slices
    a (block_rows + 2*margin)-row source SLAB with ``dynamic_slice``
    and gathers from slab-local indices — the same bounded-slab
    pattern the blocked co-add runs in production.
    """
    import jax

    if len(grid) == 4:
        sy, sx, Wy, Wx = grid
        H, W = Wy.shape[0], Wx.shape[0]
        coarse = True
    else:
        ys_full, xs_full = grid
        H, W = ys_full.shape
        coarse = False
    if H % block_rows:
        raise ValueError(f"block_rows {block_rows} must divide H {H}")
    nb = H // block_rows
    Hs = srcs[0].shape[0]
    slab_h = min(block_rows + 2 * margin, Hs)

    def one(args):
        i, blk = args
        if coarse:
            Wy_b = blk
            ys = jnp.matmul(jnp.matmul(Wy_b, sy, precision="highest"),
                            Wx.T, precision="highest")
            xs = jnp.matmul(jnp.matmul(Wy_b, sx, precision="highest"),
                            Wx.T, precision="highest")
        else:
            ys, xs = blk
        y0s = jnp.clip(i * block_rows - margin, 0, Hs - slab_h)
        ys_l = ys - y0s.astype(ys.dtype)
        outs = []
        for src, mode, fill in zip(srcs, modes, fills):
            slab = jax.lax.dynamic_slice(
                src, (y0s, jnp.int32(0)), (slab_h, src.shape[1]))
            if mode == "lanczos":
                outs.append(lanczos_resample(slab, ys_l, xs, a=a,
                                             fill=fill, row_offset=y0s,
                                             n_rows=Hs))
            elif mode == "nearest":
                outs.append(nearest_resample(slab, ys_l, xs, fill=fill,
                                             row_offset=y0s, n_rows=Hs))
            else:
                raise ValueError(f"unknown resample mode {mode!r}")
        return tuple(outs)

    idx = jnp.arange(nb, dtype=jnp.int32)
    if coarse:
        blocks = Wy.reshape(nb, block_rows, Wy.shape[1])
    else:
        blocks = (ys_full.reshape(nb, block_rows, W),
                  xs_full.reshape(nb, block_rows, W))
    if unroll:
        per = [one((idx[i], jax.tree_util.tree_map(lambda a: a[i],
                                                   blocks)))
               for i in range(nb)]
        return tuple(jnp.concatenate([p[j] for p in per], axis=0)
                     for j in range(len(srcs)))
    outs = jax.lax.map(one, (idx, blocks))
    return tuple(o.reshape(H, W) for o in outs)


def upsample_lerp(c, step: int, H: int, W: int):
    """Bilinear coarse-grid upsample as repeat + lerp (no matmuls).

    Mathematically identical to ``Wy @ c @ Wx.T`` with the bilinear
    weight matrices from :func:`remap_grid_coarse` (up to f32 lerp
    rounding), but bandwidth-bound instead of MXU-bound: the matmul
    pair costs ~14 ms per 10.5k² coordinate plane, the lerp ~2 ms."""
    c = jnp.asarray(c, jnp.float32)
    ny, nx = c.shape
    t = (jnp.arange(step, dtype=jnp.float32) / step)
    ty = jnp.tile(t, ny - 1)[:H, None]
    rows = (jnp.repeat(c[:-1], step, axis=0)[:H]
            + ty * jnp.repeat(c[1:] - c[:-1], step, axis=0)[:H])
    tx = jnp.tile(t, nx - 1)[:W][None, :]
    return (jnp.repeat(rows[:, :-1], step, axis=1)[:, :W]
            + tx * jnp.repeat(rows[:, 1:] - rows[:, :-1], step,
                              axis=1)[:, :W])


def grid_shift_ranges(sy, sx, step: int = 32, a: int = 3,
                      blocks: int = 1):
    """Integer shift ranges of a coarse grid: the static bounds
    :func:`warp_shift2pass` fans its shifted adds over.  Host-side
    (numpy coarse nodes from :func:`remap_grid_coarse`).

    blocks=1 returns ((ry0, ry1), (rx0, rx1)).  blocks=B returns
    (ry_list, rx_list) with B per-strip ranges: the row shift varies
    mostly along x (rotation sweep) and the column shift along y, so a
    column strip needs only its LOCAL row range — at 10.5k² a 3-arcmin
    rotation spans ~15 global shifts but ~8 per eighth-strip, nearly
    halving the pass count."""
    dy = np.asarray(sy, np.float64) - np.arange(
        sy.shape[0], dtype=np.float64)[:, None] * step
    dx = np.asarray(sx, np.float64) - np.arange(
        sx.shape[1], dtype=np.float64)[None, :] * step

    def rng(d):
        return (int(np.floor(d.min())) - a + 1,
                int(np.floor(d.max())) + a)

    if blocks <= 1:
        return rng(dy), rng(dx)
    # dy ranges per COLUMN strip (node axis 1), dx per ROW strip
    ny, nx = dy.shape
    # +1 node of overlap: a strip boundary falls inside a coarse cell
    ry = [rng(dy[:, max(0, (b * nx) // blocks - 1):
              ((b + 1) * nx) // blocks + 1]) for b in range(blocks)]
    rx = [rng(dx[max(0, (b * ny) // blocks - 1):
              ((b + 1) * ny) // blocks + 1, :]) for b in range(blocks)]
    return ry, rx


def warp_shift2pass(srcs, modes, fills, grid, ranges, a: int = 3):
    """Smooth-warp resample as TWO passes of variable-weight shifted
    adds — the TPU-native remap for production new<->ref registration.

    Per-pixel gathers are the wrong primitive on TPU: a full-scale
    36-tap Lanczos gather measures ~32 s/frame-triple on a v5e (HBM
    random access at ~1 px/cycle), while the DMA engine streams
    full-frame shifted reads at ~1 ms/pass.  A survey remap deviates
    from the identity by only a few pixels (same field, same pointing;
    rotator repeatability ~arcmin), so the separable Lanczos factors
    into integer SHIFTS with spatially-varying weights:

        pass 1 (rows):  V(y, x) = sum_s  src[y+s, x] * Ly(dys(y,x) - s)
        pass 2 (cols):  out(y, x) = sum_s V[y, x+s] * Lx(dxs(y,x) - s)

    with s spanning the static integer ``ranges`` from
    :func:`grid_shift_ranges`.  Each term is one streaming pass (the
    same shifted-add pattern as the detection filter), fused by XLA.

    Semantics vs the direct 36-tap form: the vertical weights are
    evaluated at the pixel's own column instead of the source column,
    a second-order approximation displacing the effective sampling
    point by |d(ys)/dx| * |dxs| — ~0.01 px for a 3-arcmin rotation at
    10.5k², far inside the ZOGY astrometric-variance budget (dx=0.25).
    Edge taps replicate the border row/column (pad mode 'edge'),
    matching the dense path's index clamping; out-of-frame samples
    fill exactly as the dense path.  For mappings too large or too
    wild for the bound, use :func:`resample_blocked` (exact, slow).

    srcs/modes/fills : as :func:`resample_blocked`
    grid   : (sy, sx, Wy, Wx) coarse form or (ys, xs) full planes
    ranges : ((ry0, ry1), (rx0, rx1)) inclusive integer shift bounds
    """
    if len(grid) == 4:
        sy, sx, Wy, Wx = grid
        ys = upsample_grid(jnp.asarray(sy, jnp.float32), Wy, Wx)
        xs = upsample_grid(jnp.asarray(sx, jnp.float32), Wy, Wx)
    elif len(grid) == 3:
        # (sy, sx, step): STATIC node spacing — the cheap lerp
        # reconstruction (see upsample_lerp).  step must be a python
        # int; under jit pass the grid as (sy, sx) coarse arrays plus
        # the static step kwarg of the calling layer.
        sy, sx, step = grid
        H, W = srcs[0].shape
        ys = upsample_lerp(sy, int(step), H, W)
        xs = upsample_lerp(sx, int(step), H, W)
    else:
        ys, xs = grid
    H, W = ys.shape
    ry, rx = ranges
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    dys = ys - yy
    dxs = xs - xx

    def pass_strip(imgs, d, r0, r1, axis, mode):
        # imgs share the mapping: weights/rounding indices compute ONCE.
        # The OUTPUT length along ``axis`` is the grid's, which may be
        # SHORTER than the source (blocked co-add: a slab taller than
        # the output block feeds the warp; shift s then reads source
        # row r + s exactly as in the equal-shape case, and the
        # bottom pad only covers the part the slab does not).
        n = d.shape[axis]
        n_src = imgs[0].shape[axis]
        pad = [(0, 0), (0, 0)]
        pad[axis] = (max(-r0, 0), max(r1 + n - n_src, 0))
        ps = [jnp.pad(im, pad, mode="edge") for im in imgs]
        off = max(-r0, 0)

        def sl(p, s):
            i0 = off + s
            return (p[i0:i0 + n, :] if axis == 0 else p[:, i0:i0 + n])

        def zero_like(im):
            shape = (n, im.shape[1]) if axis == 0 else (im.shape[0], n)
            return jnp.zeros(shape, im.dtype)

        if mode == "nearest":
            # rounding needs no tap margin: shrink to the round range
            n0, n1 = r0 + a - 1, r1 - a + 1
            si = jnp.clip(jnp.round(d).astype(jnp.int32), n0, n1)
            outs = [zero_like(im) for im in imgs]
            for s in range(n0, n1 + 1):
                m = si == s
                outs = [jnp.where(m, sl(p, s), o)
                        for p, o in zip(ps, outs)]
            return outs
        # Lanczos taps via the angle-addition identity: the naive
        # tap(d - s) evaluates 2 transcendentals per SHIFT per pixel
        # (~16 sin/px/pass at survey ranges — the VPU cost of the whole
        # remap); instead hoist 3 per PASS,
        #   sin(pi(d-s))   = sin(pi d) * (-1)^s
        #   sin(pi(d-s)/a) = sin(pi d/a) cos(pi s/a)
        #                  - cos(pi d/a) sin(pi s/a)
        # with the s-phases as host constants, so each tap is a few
        # mults + one reciprocal.
        import math
        # static integer re-centering: the angle-addition identity
        # evaluates sin(pi*d) — at slab-fed offsets (blocked co-add,
        # |d| up to a few hundred) the f32 argument ulp eats the
        # weights.  Shifting BOTH d and s by the range centre is exact
        # (ds = d - s unchanged) and bounds the argument by half the
        # range width.
        c0 = (r0 + r1) // 2
        d0 = d - c0
        pid = jnp.pi * d0
        s_pi = jnp.sin(pid)
        s_pa = jnp.sin(pid / a)
        c_pa = jnp.cos(pid / a)
        accs = [zero_like(im) for im in imgs]
        norm = jnp.zeros(d.shape, jnp.float32)
        for s in range(r0, r1 + 1):
            ds = d0 - (s - c0)
            sgn = float((-1.0) ** ((s - c0) % 2))
            cs = float(math.cos(math.pi * (s - c0) / a))
            ss = float(math.sin(math.pi * (s - c0) / a))
            num = (a * sgn) * s_pi * (s_pa * cs - c_pa * ss)
            pid2 = (jnp.pi * ds) ** 2
            w = jnp.where(jnp.abs(ds) < 1e-7, 1.0,
                          num / jnp.maximum(pid2, 1e-7))
            w = jnp.where(jnp.abs(ds) < a, w, 0.0)
            norm = norm + w
            accs = [acc + w * sl(p, s) for p, acc in zip(ps, accs)]
        norm = jnp.where(norm == 0, 1.0, norm)
        return [acc / norm for acc in accs]

    def pass_axis(imgs, d, r, axis, mode):
        if isinstance(r[0], (int, np.integer)):
            return pass_strip(imgs, d, r[0], r[1], axis, mode)
        # per-strip static ranges: the vertical pass strips along x
        # (row shift varies with x through the rotation sweep), the
        # horizontal pass along y — each strip fans over its LOCAL
        # range only, nearly halving the pass count at survey rotations
        B = len(r)
        n_perp = imgs[0].shape[1 - axis]
        blocks = []
        for b, (r0, r1) in enumerate(r):
            c0, c1 = (b * n_perp) // B, ((b + 1) * n_perp) // B
            if axis == 0:
                blocks.append(pass_strip(
                    [im[:, c0:c1] for im in imgs], d[:, c0:c1],
                    r0, r1, axis, mode))
            else:
                blocks.append(pass_strip(
                    [im[c0:c1, :] for im in imgs], d[c0:c1, :],
                    r0, r1, axis, mode))
        return [jnp.concatenate([blk[i] for blk in blocks],
                                axis=1 - axis)
                for i in range(len(imgs))]

    unknown = set(modes) - {"lanczos", "nearest"}
    if unknown:
        raise ValueError(f"unknown resample mode(s) {unknown}")

    def _widen(x):
        # Narrow-integer planes (the uint8 mask) ride the shifted
        # where-chains as float32: the u8 select chain is a measured
        # compile pathology on v5e (the SAME triple lands 199 ms with
        # the mask in u8, 71 ms widened — PERF_NOTES.md), and u8
        # values round-trip f32 exactly, so this is bit-identical.
        if (jnp.issubdtype(x.dtype, jnp.integer)
                and x.dtype.itemsize <= 2):
            return x.astype(jnp.float32)
        return x

    results = {}
    for mode in ("lanczos", "nearest"):
        group = [i for i, m in enumerate(modes) if m == mode]
        if not group:
            continue
        v = pass_axis([_widen(srcs[i]) for i in group], dys, ry, 0, mode)
        o = pass_axis(v, dxs, rx, 1, mode)
        # fill bounds come from the SOURCE's shape, not the grid's:
        # they coincide in the same-frame warp, but a slab-fed call
        # (blocked co-add) has a source taller than the output block,
        # and grid-shaped bounds wrongly filled every coordinate past
        # the block height (round-5 regression caught by the
        # blocked-vs-resident parity test)
        Hs, Ws = srcs[group[0]].shape
        if mode == "lanczos":
            inb = (ys >= 0) & (ys <= Hs - 1) & (xs >= 0) & \
                (xs <= Ws - 1)
        else:
            inb = (ys >= -0.5) & (ys <= Hs - 0.5) & (xs >= -0.5) & \
                (xs <= Ws - 0.5)
        for i, oi in zip(group, o):
            oi = jnp.where(inb, oi.astype(srcs[i].dtype),
                           jnp.asarray(fills[i], srcs[i].dtype))
            results[i] = oi
    return tuple(results[i] for i in range(len(srcs)))


def grid_row_margin(sy, step: int = 32, a: int = 3) -> int:
    """Slab margin for :func:`resample_blocked` from coarse row nodes:
    max |source row - destination row| over the grid + tap radius."""
    dest = np.arange(sy.shape[0], dtype=np.float64)[:, None] * step
    return int(np.ceil(np.max(np.abs(np.asarray(sy, np.float64)
                                     - dest)))) + a + 2


def remap(src, wcs_src, wcs_dst, shape_dst, order: str = "lanczos3",
          fill: float = 0.0):
    """SWarp-equivalent one-call remap of an image onto another WCS grid."""
    ys, xs = remap_grid(wcs_src, wcs_dst, shape_dst)
    ys = jnp.asarray(ys)
    xs = jnp.asarray(xs)
    if order == "nearest":
        return nearest_resample(src, ys, xs, fill)
    if order == "lanczos3":
        return lanczos_resample(src, ys, xs, a=3, fill=fill)
    raise ValueError(f"unknown resampling order {order!r}")

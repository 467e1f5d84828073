"""2-D median filters and small stencils, tiled for device memory.

A k x k median needs the k^2 shifted copies of the image resident; at
10560^2 float32 that is 22 GB for k=7, so the image is processed in row
strips under ``lax.map`` (sequential, compiled once) keeping the transient
footprint at ``k^2 * strip * W``.  A fused Pallas kernel for the L.A.Cosmic
pipeline lives in :mod:`blackbox_tpu.pallas.lacosmic`; these jnp versions
are the reference path and the CPU/test fallback.

Border semantics: the outermost ``k//2`` rows/columns keep the input value,
matching the behaviour of the reference's astroscrappy median filters
(/root/reference/blackbox.py:4325-4332 relies on them only for interior
stencils).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax


def _neighborhood_stack(strip, k: int):
    """(h + 2p, W + 2p) padded strip -> (k*k, h, W) shifted views."""
    h = strip.shape[0] - (k - 1)
    W = strip.shape[1] - (k - 1)
    views = [strip[dy:dy + h, dx:dx + W]
             for dy in range(k) for dx in range(k)]
    return jnp.stack(views, axis=0)


def _strip_apply(img, k: int, strip_rows: int, fn, extra=None):
    """Apply ``fn(stack, extra_stack) -> (h, W)`` over padded row strips."""
    H, W = img.shape
    p = k // 2
    nstrips = -(-H // strip_rows)
    Hpad = nstrips * strip_rows
    imgp = jnp.pad(img, ((p, p + Hpad - H), (p, p)), mode="edge")
    if extra is not None:
        extrap = jnp.pad(extra, ((p, p + Hpad - H), (p, p)), mode="edge")

    def one(i):
        r0 = i * strip_rows
        s = lax.dynamic_slice(imgp, (r0, 0), (strip_rows + 2 * p, W + 2 * p))
        st = _neighborhood_stack(s, k)
        if extra is None:
            return fn(st)
        e = lax.dynamic_slice(extrap, (r0, 0), (strip_rows + 2 * p, W + 2 * p))
        return fn(st, _neighborhood_stack(e, k))

    out = lax.map(one, jnp.arange(nstrips))
    return out.reshape(Hpad, W)[:H]


def _strip_apply_raw(img, k: int, strip_rows: int, fn, extra=None):
    """Apply ``fn(padded_strip[, extra_strip]) -> (h, W)`` over padded
    row strips."""
    H, W = img.shape
    p = k // 2
    nstrips = -(-H // strip_rows)
    Hpad = nstrips * strip_rows
    imgp = jnp.pad(img, ((p, p + Hpad - H), (p, p)), mode="edge")
    if extra is not None:
        extrap = jnp.pad(extra, ((p, p + Hpad - H), (p, p)), mode="edge")

    def one(i):
        r0 = i * strip_rows
        s = lax.dynamic_slice(imgp, (r0, 0), (strip_rows + 2 * p, W + 2 * p))
        if extra is None:
            return fn(s)
        e = lax.dynamic_slice(extrap, (r0, 0),
                              (strip_rows + 2 * p, W + 2 * p))
        return fn(s, e)

    out = lax.map(one, jnp.arange(nstrips))
    return out.reshape(Hpad, W)[:H]


def _oddeven_sort(vals: list) -> list:
    """Odd-even transposition sort of a list of same-shape arrays.

    n passes of elementwise min/max compare-exchanges — pure VPU work
    that XLA fuses. Crucially NOT lax.sort over a stacked axis: sorting
    a (k², h, W) stack along the non-minor axis lowers as a transpose
    whose degenerate-dim tile padding is catastrophic on TPU.
    """
    v = list(vals)
    n = len(v)
    for pas in range(n):
        start = pas % 2
        for i in range(start, n - 1, 2):
            lo = jnp.minimum(v[i], v[i + 1])
            hi = jnp.maximum(v[i], v[i + 1])
            v[i], v[i + 1] = lo, hi
    return v


# ---- comparator networks (host-built, traced as min/max chains) --------

@lru_cache(maxsize=None)
def batcher_pairs(m: int) -> tuple:
    """Batcher odd-even mergesort comparator pairs for m a power of 2."""
    assert m & (m - 1) == 0, "power of two"
    pairs = []
    p = 1
    while p < m:
        k = p
        while k >= 1:
            for j in range(k % p, m - k, 2 * k):
                for i in range(min(k, m - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return tuple(pairs)


@lru_cache(maxsize=None)
def transposition_pairs(n: int) -> tuple:
    """Odd-even transposition sort pairs (n passes; locality the TPU
    VPU pipeline loves — see median_filter)."""
    pairs = []
    for pas in range(n):
        for i in range(pas % 2, n - 1, 2):
            pairs.append((i, i + 1))
    return tuple(pairs)


def prune_pairs(pairs, needed_wires) -> tuple:
    """Prune a comparator network to the ops feeding ``needed_wires``.

    Reverse pass with the sound rule: an op whose outputs are both
    unneeded is dropped; one-sided ops degrade to a single min or max.
    Returns ops ('ce'|'min'|'max', a, b): 'min' -> a = min(a, b),
    'max' -> b = max(a, b), 'ce' -> both.
    """
    needed = set(needed_wires)
    ops = []
    for a, b in reversed(pairs):
        na, nb = a in needed, b in needed
        if not (na or nb):
            continue
        if na and nb:
            ops.append(("ce", a, b))
        elif na:
            ops.append(("min", a, b))
        else:
            ops.append(("max", a, b))
        needed.add(a)
        needed.add(b)
    return tuple(reversed(ops))


@lru_cache(maxsize=None)
def selection_ops(m: int, ranks: tuple, kind: str = "batcher") -> tuple:
    """Prune a sorting network on m lanes to the given output ranks."""
    pairs = batcher_pairs(m) if kind == "batcher" \
        else transposition_pairs(m)
    return prune_pairs(pairs, ranks)


def _oe_merge_pairs(L1, L2, pairs) -> list:
    """Batcher odd-even merge of two sorted wire lists.

    Appends compare-exchange pairs to ``pairs`` and returns the merged
    wire list in sorted order (general-length recursive construction;
    correctness brute-forced in tests/test_networks.py).
    """
    n1, n2 = len(L1), len(L2)
    if n1 == 0:
        return list(L2)
    if n2 == 0:
        return list(L1)
    if n1 == 1 and n2 == 1:
        pairs.append((L1[0], L2[0]))
        return [L1[0], L2[0]]
    E = _oe_merge_pairs(L1[0::2], L2[0::2], pairs)
    O = _oe_merge_pairs(L1[1::2], L2[1::2], pairs)
    res = [E[0]]
    i = 0
    while i < len(O) and i + 1 < len(E):
        pairs.append((O[i], E[i + 1]))
        res.append(O[i])
        res.append(E[i + 1])
        i += 1
    res.extend(O[i:])
    res.extend(E[i + 1:])
    return res


@lru_cache(maxsize=None)
def sorted_column_network(k: int) -> tuple:
    """Merge network selecting over a k x k window with SHARED sorted
    columns.

    Wire numbering: ``dx * k + r`` = rank-r element of the column at
    horizontal offset dx.  Column sorting happens once per pixel and is
    reused by the k horizontally-shifted windows — the big comparator
    saving over sorting all k^2 window values from scratch (the 7x7
    median drops ~5x in min/max op count).
    Returns (merge_pairs, sorted_wire_order).
    """
    pairs: list = []
    cols = [[dx * k + r for r in range(k)] for dx in range(k)]
    while len(cols) > 1:
        nxt = []
        for i in range(0, len(cols) - 1, 2):
            nxt.append(_oe_merge_pairs(cols[i], cols[i + 1], pairs))
        if len(cols) % 2:
            nxt.append(cols[-1])
        cols = nxt
    return tuple(pairs), tuple(cols[0])


@lru_cache(maxsize=None)
def sc_select_ops(k: int, ranks: tuple) -> tuple:
    """Pruned sorted-column network for the given sorted ranks.

    Returns (ops, wires) — after ``apply_ops``, sorted rank ``ranks[i]``
    sits on wire ``wires[i]``.
    """
    pairs, order = sorted_column_network(k)
    wires = tuple(order[r] for r in ranks)
    return prune_pairs(pairs, wires), wires


def apply_ops(vals: list, ops) -> list:
    v = list(vals)
    for kind, a, b in ops:
        if kind == "ce":
            lo = jnp.minimum(v[a], v[b])
            v[b] = jnp.maximum(v[a], v[b])
            v[a] = lo
        elif kind == "min":
            v[a] = jnp.minimum(v[a], v[b])
        else:
            v[b] = jnp.maximum(v[a], v[b])
    return v


def _next_pow2(n: int) -> int:
    m = 1
    while m < n:
        m *= 2
    return m


def select_rank(views: list, rank: int):
    """Exact rank-``rank`` element of n same-shape arrays via a pruned
    Batcher selection network (pad lanes hold +big and sort to the top,
    so ranks below n are unaffected)."""
    n = len(views)
    m = _next_pow2(n)
    if m > n:
        big = jnp.full_like(views[0], _BIG_F32)
        views = views + [big] * (m - n)
    out = apply_ops(views, selection_ops(m, (rank,)))
    return out[rank]


_BIG_F32 = 3.0e38


def _sc_column_views(strip, k: int):
    """Padded strip -> k column-shifted views, sorted along the shift.

    Each view is (h, W + 2p); view r holds the rank-r value of the
    k-tall column at every (y, x) of the padded width.  These sorted
    columns are SHARED by the k horizontally-shifted windows — the
    comparator saving that makes the sorted-column medians ~3-5x
    cheaper than sorting all k^2 window values per pixel.
    """
    h = strip.shape[0] - (k - 1)
    colv = [strip[dy:dy + h, :] for dy in range(k)]
    ops = [("ce", a, b) for a, b in transposition_pairs(k)]
    return apply_ops(colv, ops)


def _sc_window_views(colv, k: int):
    """Sorted-column views -> k*k merge-network inputs (wire dx*k+r)."""
    W = colv[0].shape[1] - (k - 1)
    views = [None] * (k * k)
    for dx in range(k):
        for r in range(k):
            views[dx * k + r] = colv[r][:, dx:dx + W]
    return views


def median_filter(img, k: int, strip_rows: int = 264):
    """k x k median filter; borders keep the input value.

    Sorted-column formulation inside sequential row strips: per-pixel
    column sorts (k-element transposition networks) shared across the k
    horizontal window shifts, then a pruned Batcher odd-even merge
    selecting the median — ~3-5x fewer min/max ops than per-window
    sorting.  Strips bound the live-copy footprint (k=7 at full frame
    would need ~21 GB HBM; per strip it is ~0.5 GB).
    """
    p = k // 2

    def fn(s):
        colv = _sc_column_views(s, k)
        views = _sc_window_views(colv, k)
        ops, wires = sc_select_ops(k, (k * k // 2,))
        return apply_ops(views, ops)[wires[0]]

    out = _strip_apply_raw(img, k, strip_rows, fn)
    return _restore_border(out, img, p)


def median_filter_sep(img, k: int, strip_rows: int = 264):
    """Separable k x k median: k-median along y then along x.

    The astroscrappy ``sepmed`` variant (~3x cheaper, quality-risky —
    the reference disables it, set_blackbox.py:215-218); provided so the
    sepmed knob has a real implementation.  Borders keep the input.
    """
    p = k // 2
    ops = [("ce", a, b) for a, b in transposition_pairs(k)]

    def fn(s):
        h = s.shape[0] - 2 * p
        W = s.shape[1] - 2 * p
        col = apply_ops([s[dy:dy + h, :] for dy in range(k)], ops)[k // 2]
        row = apply_ops([col[:, dx:dx + W] for dx in range(k)],
                        ops)[k // 2]
        return row

    out = _strip_apply_raw(img, k, strip_rows, fn)
    return _restore_border(out, img, p)


def masked_median_filter(img, bad, k: int = 5, strip_rows: int = 264,
                         fallback=None):
    """k x k median over neighbours where ``bad`` is False.

    Pixels whose whole neighbourhood is bad fall back to ``fallback``
    (default: the input value).
    """
    big = jnp.asarray(jnp.finfo(img.dtype).max, img.dtype)

    def fn(s, bs):
        # bad -> +big BEFORE the shared column sorts, so good values
        # sort below every masked one and dynamic ranks stay valid
        h = s.shape[0] - (k - 1)
        W = s.shape[1] - (k - 1)
        bviews_col = [bs[dy:dy + h, :] > 0.5 for dy in range(k)]
        vals_col = [jnp.where(b, big, s[dy:dy + h, :])
                    for dy, b in enumerate(bviews_col)]
        colv = apply_ops(vals_col,
                         [("ce", a, b)
                          for a, b in transposition_pairs(k)])
        views = _sc_window_views(colv, k)
        pairs, order = sorted_column_network(k)
        sorted_wires = apply_ops(views, [("ce", a, b) for a, b in pairs])
        vs = [sorted_wires[w] for w in order]
        n = sum(jnp.int32(1) - b[:, dx:dx + W].astype(jnp.int32)
                for b in bviews_col for dx in range(k))
        i_lo = jnp.maximum(n - 1, 0) // 2
        i_hi = n // 2
        # rank selection without gathers: one select per sorted slot
        lo = jnp.zeros_like(vs[0])
        hi = jnp.zeros_like(vs[0])
        for r, vr in enumerate(vs):
            lo = jnp.where(i_lo == r, vr, lo)
            hi = jnp.where(i_hi == r, vr, hi)
        med = 0.5 * (lo + hi)
        return jnp.where(n > 0, med, jnp.nan)

    out = _strip_apply_raw(img, k, strip_rows, fn,
                           extra=bad.astype(img.dtype))
    fb = img if fallback is None else fallback
    out = jnp.where(jnp.isnan(out), fb, out)
    return _restore_border(out, img, k // 2)


def _restore_border(out, img, p: int):
    if p == 0:
        return out
    H, W = img.shape
    ri = jnp.arange(H)[:, None]
    ci = jnp.arange(W)[None, :]
    border = (ri < p) | (ri >= H - p) | (ci < p) | (ci >= W - p)
    return jnp.where(border, img, out)


def laplacian_subsampled(img):
    """L+ of the 2x-subsampled image, rebinned back (van Dokkum 2001 §3).

    Subsampling by pixel replication followed by the 4-connected Laplacian
    and 2x2 averaging of its positive part.  Computed without materialising
    the 2x-subsampled image: each output pixel's four subpixels see the
    same centre value, so the rebinned positive Laplacian decomposes into
    the average of the four subpixel responses — evaluated here directly
    from the four neighbour differences.
    """
    # subpixel Laplacian at subpixel (a, b) of pixel (i, j):
    #   4*v - up - left_sub - right_sub - down  where the two neighbours
    # inside the same pixel equal v.  For subpixel (0,0):
    #   l = 4v - v(up) - v(left) - 2v  -> 2v - up - left ... etc.
    v = img
    up = jnp.roll(v, 1, 0)
    dn = jnp.roll(v, -1, 0)
    lf = jnp.roll(v, 1, 1)
    rt = jnp.roll(v, -1, 1)
    # four subpixels: (up,left), (up,right), (down,left), (down,right)
    l00 = 2 * v - up - lf
    l01 = 2 * v - up - rt
    l10 = 2 * v - dn - lf
    l11 = 2 * v - dn - rt
    pos = lambda a: jnp.maximum(a, 0.0)  # noqa: E731
    lplus = 0.25 * (pos(l00) + pos(l01) + pos(l10) + pos(l11))
    # the reference implementation zeroes nothing at borders; edge rows see
    # wrapped neighbours from jnp.roll — overwrite with 0 there
    H, W = img.shape
    ri = jnp.arange(H)[:, None]
    ci = jnp.arange(W)[None, :]
    border = (ri == 0) | (ri == H - 1) | (ci == 0) | (ci == W - 1)
    return jnp.where(border, 0.0, lplus)


def dilate(m, k: int = 3):
    """Boolean dilation with a k x k structure (single pass)."""
    p = k // 2
    x = jnp.pad(m.astype(jnp.float32), p)
    out = lax.reduce_window(x, -jnp.inf, lax.max, (k, k), (1, 1), "VALID")
    return out > 0.5


def fixpix(img, mask_bad, k: int = 5, strip_rows: int = 264,
           iterations: int = 2):
    """Interpolate masked pixels from their good neighbours.

    zogy ``fixpix`` equivalent (consumed by the reference's co-add prep,
    /root/reference/buildref.py:2347, 2647): masked pixels are replaced
    by the masked k x k median of good neighbours; a second pass fills
    pixels whose whole neighbourhood was bad.
    """
    out = img
    bad = mask_bad
    for _ in range(iterations):
        repl = masked_median_filter(out, bad, k, strip_rows)
        out = jnp.where(bad, repl, out)
        # pixels still at the fallback (all-bad neighbourhood) stay bad
        bad = bad & (repl == img)
    return out

"""Binary morphology on device (dilation, erosion, closing, hole fill).

Replaces the reference's ``scipy.ndimage`` calls (binary_dilation /
binary_closing / binary_fill_holes in mask_init and fill_sat_holes,
/root/reference/blackbox.py:4556-4596).

All 3x3 ops and the border flood fill run on **bit-packed words** (32
pixels per uint32, LSB = lowest x): vertical neighbours are row shifts
of the word array, horizontal neighbours are bit shifts with cross-word
carry — the bitboard trick.  A full-frame bool costs ~110 MB per pass;
packed it is ~3.5 MB, so the flood fill's ~50 log-doubling steps and
the separable 3x3 dilation/erosion become bandwidth-trivial (measured:
fill_holes 66 -> ~10 ms, dilation 35 -> ~4 ms at 10.5k² on one v5e).
Everything is jit/vmap friendly (fixed shapes, no data-dependent
control flow).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_FULL = np.uint32(0xFFFFFFFF)


def _pool(x_bool, op_is_max: bool, size: int = 3):
    init = -jnp.inf if op_is_max else jnp.inf
    fn = lax.max if op_is_max else lax.min
    x = x_bool.astype(jnp.float32)
    pad_val = 0.0 if op_is_max else 1.0
    p = size // 2
    x = jnp.pad(x, p, constant_values=pad_val)
    out = lax.reduce_window(x, init, fn, (size, size), (1, 1), "VALID")
    return out > 0.5


def _pack_bits(b):
    """bool (..., n) -> uint32 (..., ceil(n/32)), LSB = lowest index."""
    n = b.shape[-1]
    nw = -(-n // 32)
    pad = nw * 32 - n
    if pad:
        b = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(0, pad)])
    w = b.reshape(b.shape[:-1] + (nw, 32)).astype(jnp.uint32)
    return jnp.sum(w << jnp.arange(32, dtype=jnp.uint32), axis=-1,
                   dtype=jnp.uint32)


def _unpack_bits(w, n: int):
    b = (w[..., None] >> jnp.arange(32, dtype=jnp.uint32)) & jnp.uint32(1)
    return b.reshape(w.shape[:-1] + (-1,))[..., :n] > 0


def _valid_words(n: int):
    """(nw,) uint32 with the bits < n set (slack bits of the last word 0)."""
    return _pack_bits(jnp.arange(-(-n // 32) * 32) < n)


def _shift_rows(w, d: int, fill: int = 0):
    """Shift packed rows by +d along axis 0 (out-of-range rows = fill)."""
    if d == 0:
        return w
    H = w.shape[0]
    if d > 0:
        return jnp.pad(w, ((d, 0), (0, 0)), constant_values=fill)[:H]
    return jnp.pad(w, ((0, -d), (0, 0)), constant_values=fill)[-d:]


def _shift_cols_words(w, q: int, fill: int = 0):
    """Shift whole words by +q along the packed (last) axis."""
    if q == 0:
        return w
    nw = w.shape[-1]
    if q > 0:
        return jnp.pad(w, ((0, 0), (q, 0)), constant_values=fill)[:, :nw]
    return jnp.pad(w, ((0, 0), (0, -q)), constant_values=fill)[:, -q:]


def _shift_px(w, d: int, fill_one: bool = False):
    """Shift packed bits by +d PIXELS along the packed axis.

    new[p] = old[p - d]; pixels shifted in from outside are ``fill_one``.
    """
    if d == 0:
        return w
    fill = _FULL if fill_one else 0
    q, r = divmod(abs(d), 32)
    if d > 0:
        a = _shift_cols_words(w, q, fill)
        if r == 0:
            return a
        b = _shift_cols_words(w, q + 1, fill)
        return (a << r) | (b >> (32 - r))
    a = _shift_cols_words(w, -q, fill)
    if r == 0:
        return a
    b = _shift_cols_words(w, -(q + 1), fill)
    return (a >> r) | (b << (32 - r))


def _dilate3_packed(w, valid):
    """One 3x3 full-structure dilation in the packed domain (outside=0)."""
    v = w | _shift_rows(w, 1) | _shift_rows(w, -1)
    h = v | _shift_px(v, 1) | _shift_px(v, -1)
    return h & valid


def _erode3_packed(w, valid):
    """One 3x3 erosion, outside treated as True (matches the previous
    jnp pool formulation; scipy's border_value=0 differs only in the
    1-px border, which the callers' masks never rely on)."""
    w = w | ~valid
    v = w & _shift_rows(w, 1, _FULL) & _shift_rows(w, -1, _FULL)
    return v & _shift_px(v, 1, True) & _shift_px(v, -1, True)


def binary_dilation(m, iterations: int = 1, size: int = 3):
    """Dilation with a full ``size x size`` structure (scipy border: 0)."""
    if size == 3:
        valid = _valid_words(m.shape[-1])
        w = _pack_bits(m)
        for _ in range(iterations):
            w = _dilate3_packed(w, valid)
        return _unpack_bits(w, m.shape[-1])
    for _ in range(iterations):
        m = _pool(m, True, size)
    return m


def binary_erosion(m, iterations: int = 1, size: int = 3):
    """Erosion with a full structure (outside treated as True)."""
    if size == 3:
        valid = _valid_words(m.shape[-1])
        w = _pack_bits(m)
        for _ in range(iterations):
            w = _erode3_packed(w, valid)
        return _unpack_bits(w & valid, m.shape[-1])
    for _ in range(iterations):
        m = ~_pool(~m, True, size)
    return m


def binary_closing(m, size: int = 3):
    """Dilation followed by erosion (one packed round trip)."""
    if size == 3:
        valid = _valid_words(m.shape[-1])
        w = _erode3_packed(_dilate3_packed(_pack_bits(m), valid), valid)
        return _unpack_bits(w & valid, m.shape[-1])
    return binary_erosion(binary_dilation(m, size=size), size=size)


def _fill_holes_packed(w, valid, H: int, W: int, iterations: int):
    """:func:`fill_holes` in the packed domain (``w`` = packed mask with
    slack bits 0); returns the packed filled mask."""
    O = ~w & valid                  # complement; slack bits 0
    nw = O.shape[-1]
    # border seed: full first/last rows + first/last column bits
    border = jnp.zeros((H, nw), jnp.uint32)
    border = border.at[0, :].set(_FULL).at[-1, :].set(_FULL)
    n = nw * 32
    colbits = _pack_bits((jnp.arange(n) == 0) | (jnp.arange(n) == W - 1))
    border = border | colbits[None, :]
    R0 = O & border

    def sweep(R, axis: int, sgn: int):
        Rs = R & O
        Orun = O
        d = 1
        lim = H if axis == 0 else W
        while d < lim:
            if axis == 0:
                Rs = Rs | (_shift_rows(Rs, sgn * d) & Orun)
                Orun = Orun & _shift_rows(Orun, sgn * d)
            else:
                Rs = Rs | (_shift_px(Rs, sgn * d) & Orun)
                Orun = Orun & _shift_px(Orun, sgn * d)
            d *= 2
        return Rs

    def round_(_, R):
        R = sweep(R, 0, 1)
        R = sweep(R, 0, -1)
        R = sweep(R, 1, 1)
        R = sweep(R, 1, -1)
        return R

    reach = jax.lax.fori_loop(0, max(iterations, 1), round_, R0)
    return w | (O & ~reach)


def fill_holes(m, iterations: int = 3, size: int = 3):
    """Fill background regions not connected to the border.

    The complement is flooded from the border with alternating
    row/column associative sweeps solved by log-doubling —
    R ← R | (shift(R, d) & O_run), O_run ← O_run & shift(O_run, d),
    d doubling — so the fill does NOT scale with image size.
    ``iterations`` counts sweep rounds (one round resolves any monotone
    path; blob-shaped masks converge in 1-2, pathological spirals need
    more).  The whole iteration runs in the packed domain: one pack of
    the complement + seed, ~50 word-array steps, one unpack.
    """
    H, W = m.shape[-2], m.shape[-1]
    valid = _valid_words(W)
    w = _pack_bits(m)
    return _unpack_bits(_fill_holes_packed(w, valid, H, W, iterations)
                        & valid, W)


def satcon_close_fill(mask_sat, fill_iters: int = 1):
    """Fused saturation-morphology pipeline in ONE packed round trip.

    Returns ``(satcon_add, filled)`` bit-identical to the separate calls

        dil        = binary_dilation(mask_sat, 1)
        satcon_add = dil & ~mask_sat
        filled     = fill_holes(binary_closing(mask_sat | satcon_add),
                                fill_iters)

    but with a single pack + two unpacks: ``mask_sat | satcon_add`` is
    exactly the dilation, so closing reuses the packed ``dil`` word
    array and the flood fill runs on the packed ``closed`` directly —
    the three separate calls round-trip full-frame bools through HBM
    six times (measured 107 ms vs 8.4 ms for this form at 16x
    5280x1320 on one v5e).
    """
    H, W = mask_sat.shape[-2], mask_sat.shape[-1]
    return satcon_close_fill_packed(_pack_bits(mask_sat),
                                    _valid_words(W), H, W, fill_iters)


def satcon_close_fill_packed(w, valid, H: int, W: int,
                             fill_iters: int = 1):
    """:func:`satcon_close_fill` on an already-packed word array ``w``
    (slack bits 0) — callers that pack the mask for other bit-domain
    work (the crosstalk-victim union in ``ops.masking``) skip the
    second pack.  Returns unpacked ``(satcon_add, filled)``."""
    dil = _dilate3_packed(w, valid)
    satcon = dil & ~w
    closed = _erode3_packed(_dilate3_packed(dil, valid), valid) & valid
    filled = _fill_holes_packed(closed, valid, H, W, fill_iters)
    return _unpack_bits(satcon, W), _unpack_bits(filled & valid, W)

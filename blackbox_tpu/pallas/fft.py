"""Split-real mixed-radix FFT as a Pallas TPU kernel.

Why this exists: the ZOGY subtraction chain is transform-bound, and
XLA's TPU FFT custom call is pass-bound at the *complex64* elementwise
rate, which measures ~5x below split-f32 streaming throughput on a v5e
(PERF_NOTES.md "complex64 bandwidth facts"; 66.5 ms per 10752² complex
transform).  A matmul (four-step/Bailey) FFT is a measured dead tie —
MXU compute binds.  This kernel takes the third road: radix-2
butterflies on *split f32 re/im planes* held in VMEM, one HBM read and
one write per 1-D transform, with the odd factor handled by a small
unrolled DFT.  The reference pipeline gets its FFTs from pyfftw inside
zogy (SURVEY.md §2.4); this is the TPU-native equivalent.

Algorithm (per lane slab, FFT along axis 0 of an (N, L) pair):
N = N2·N1 with N1 = 2^k and N2 ∈ {1, 3, 5, 7, 11, 21} — exactly the
sizes :func:`blackbox_tpu.ops.zogy.fast_fft_size` emits.  Writing the
input row index n = n1 + N1·n2 and the output index k = r + N2·m:

  step A:  A[r·N1+n1] = Σ_n2 x[n2·N1+n1]·W_N2^{n2 r} · W_N^{n1 r}
  step B:  per group r, radix-2 DIF over n1 (natural in, bit-rev out)

so physical output row r·N1 + bitrev(m) holds X[r + N2·m] — a fixed
"scrambled" spectral layout.  NOTHING ever unscrambles it on the hot
path: elementwise spectral algebra is layout-agnostic, OTF planes are
built directly in the layout (:func:`spectrum_freqs`), and the inverse
kernel consumes it natively (DIT radix-2 = bit-rev in / natural out,
then conjugate twiddle + inverse DFT_N2), returning natural-order rows
with no reorder pass.  A full 2-D transform is therefore
``kernel → f32 transpose → kernel`` (the transpose only scrambles
lanes, which the column kernel treats independently), and its inverse
is the mirror — see :func:`fft2_split` / :func:`ifft2_split`.

The forward kernel transforms TWO real frames at once for free: feed
re = frame_a, im = frame_b (the split representation makes the
classic pack trick a no-op instead of a complex64 interleave pass).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ODD = (21, 11, 7, 5, 3, 1)


def plan(N: int) -> tuple[int, int, int]:
    """Factor N = N2 · 2^k with N2 the largest factor from the
    supported odd set.  Returns (N1, N2, k); raises if the remaining
    cofactor is not a power of two or is < 8."""
    for q in _ODD:
        if N % q == 0:
            N1 = N // q
            if N1 >= 8 and (N1 & (N1 - 1)) == 0:
                return N1, q, N1.bit_length() - 1
    raise ValueError(f"unsupported FFT size {N}: need N = q·2^k, "
                     f"q ∈ {_ODD}, 2^k >= 8")


def _bitrev(n: int, k: int) -> np.ndarray:
    out = np.zeros(n, np.int64)
    for i in range(n):
        b, x = 0, i
        for _ in range(k):
            b = (b << 1) | (x & 1)
            x >>= 1
        out[i] = b
    return out


@functools.lru_cache(maxsize=32)
def spectrum_perm(N: int) -> np.ndarray:
    """perm with X_natural[j] = scrambled[perm[j]] along one axis."""
    N1, N2, k = plan(N)
    br = _bitrev(N1, k)
    j = np.arange(N)
    r = j % N2
    m = j // N2
    return r * N1 + br[m]


@functools.lru_cache(maxsize=32)
def spectrum_freqs(N: int) -> np.ndarray:
    """Frequency index (0..N-1, i.e. fftfreq·N mod N) of each PHYSICAL
    row of the scrambled spectrum — the inverse permutation of
    :func:`spectrum_perm`.  OTF/filter planes evaluate their analytic
    spectra directly at these frequencies, so they are born in kernel
    layout and no unscramble pass ever runs."""
    p = spectrum_perm(N)
    inv = np.empty(N, np.int64)
    inv[p] = np.arange(N)
    return inv


@functools.lru_cache(maxsize=32)
def mirror_perm(N: int) -> np.ndarray:
    """Physical index of the NEGATED frequency for each physical row of
    the scrambled spectrum: row p holds frequency f[p], and
    ``mirror_perm(N)[p]`` is the row holding (N - f[p]) mod N.  The
    hermitian unpack of a packed two-real-frame forward transform is a
    gather by this permutation along both axes plus a sign flip on the
    imaginary plane (conj) — see :mod:`blackbox_tpu.ops.zogy`'s split
    path."""
    f = spectrum_freqs(N)
    P = spectrum_perm(N)
    return P[(N - f) % N]


def _tables(N: int, inverse: bool):
    """Host-side twiddle tables for one axis length.

    Returns (twA_re, twA_im, twB_re, twB_im, w21) —
    twA: (N, 1) step-A twiddle in physical row order r·N1+n1;
    twB: (max(k-1,1)·N1, 1) per-stage full-length butterfly twiddles
         (top half of each 2h block = 1, bottom = W_{2h}^j), stage s
         (DIF order, h = N1>>(s+1)) at rows [s·N1, (s+1)·N1);
    w21: (N2, N2) complex128 DFT constants (embedded as immediates).
    """
    N1, N2, k = plan(N)
    sign = 1.0 if inverse else -1.0
    n1 = np.arange(N1)
    r = np.arange(N2)
    twA = np.exp(sign * 2j * np.pi * np.outer(r, n1) / N)   # (N2, N1)
    twA = twA.reshape(-1, 1)
    nstage = max(k - 1, 1)
    twB = np.ones((nstage, N1), np.complex128)
    for s in range(k - 1):
        h = N1 >> (s + 1)
        j = np.arange(N1)
        jh = j % (2 * h)
        tw = np.exp(sign * 2j * np.pi * (jh - h) / (2 * h))
        twB[s] = np.where(jh < h, 1.0, tw)
    twB = twB.reshape(-1, 1)
    w21 = np.exp(sign * 2j * np.pi * np.outer(r, r) / N2)
    f32 = lambda a: np.ascontiguousarray(a, np.float32)  # noqa: E731
    return (f32(twA.real), f32(twA.imag),
            f32(twB.real), f32(twB.imag), w21)


def _butterfly(vr, vi, h: int):
    """One radix-2 add/sub round on an (N1, S) pair viewed as
    (blocks, 2h, S): out = concat([a+b, a-b], axis=1)."""
    N1, S = vr.shape
    b = N1 // (2 * h)
    vr3 = vr.reshape(b, 2 * h, S)
    vi3 = vi.reshape(b, 2 * h, S)
    ar, br_ = vr3[:, :h, :], vr3[:, h:, :]
    ai, bi = vi3[:, :h, :], vi3[:, h:, :]
    nr = jnp.concatenate([ar + br_, ar - br_], axis=1)
    ni = jnp.concatenate([ai + bi, ai - bi], axis=1)
    return nr.reshape(N1, S), ni.reshape(N1, S)


def _cmul_table(vr, vi, tr, ti):
    """(vr + i·vi) · (tr + i·ti) with (N1, 1) broadcast tables."""
    return vr * tr - vi * ti, vr * ti + vi * tr


def _fft_kernel(twa_re, twa_im, twb_re, twb_im,
                in_re, in_im, out_re, out_im, buf_re, buf_im, sem,
                *, N1, N2, k, S, w21, inverse, scale):
    slab = pl.program_id(0)
    N = N1 * N2

    cp_r = pltpu.make_async_copy(
        in_re.at[:, pl.ds(slab * S, S)], buf_re, sem.at[0])
    cp_i = pltpu.make_async_copy(
        in_im.at[:, pl.ds(slab * S, S)], buf_im, sem.at[1])
    cp_r.start()
    cp_i.start()
    cp_r.wait()
    cp_i.wait()

    CH = min(128, N1)

    def step_a():
        """Forward step A: DFT_N2 over strided rows + twiddle W_N^{n1 r},
        chunk by chunk (reads and writes partition the same row set)."""
        for c0 in range(0, N1, CH):
            xs = [(buf_re[pl.ds(n2 * N1 + c0, CH), :],
                   buf_im[pl.ds(n2 * N1 + c0, CH), :])
                  for n2 in range(N2)]
            for r in range(N2):
                acc_r = acc_i = None
                for n2 in range(N2):
                    wr = float(w21[n2, r].real)
                    wi = float(w21[n2, r].imag)
                    xr, xi = xs[n2]
                    tr = wr * xr - wi * xi
                    ti = wr * xi + wi * xr
                    acc_r = tr if acc_r is None else acc_r + tr
                    acc_i = ti if acc_i is None else acc_i + ti
                tar = twa_re[pl.ds(r * N1 + c0, CH), :]
                tai = twa_im[pl.ds(r * N1 + c0, CH), :]
                orr, oii = _cmul_table(acc_r, acc_i, tar, tai)
                buf_re[pl.ds(r * N1 + c0, CH), :] = orr
                buf_im[pl.ds(r * N1 + c0, CH), :] = oii

    def step_a_inv():
        """Inverse step A': conj twiddle then inverse DFT_N2 back to
        natural n2-major rows."""
        for c0 in range(0, N1, CH):
            bs = []
            for r in range(N2):
                br_ = buf_re[pl.ds(r * N1 + c0, CH), :]
                bi_ = buf_im[pl.ds(r * N1 + c0, CH), :]
                tar = twa_re[pl.ds(r * N1 + c0, CH), :]
                tai = twa_im[pl.ds(r * N1 + c0, CH), :]
                bs.append(_cmul_table(br_, bi_, tar, tai))
            for n2 in range(N2):
                acc_r = acc_i = None
                for r in range(N2):
                    wr = float(w21[r, n2].real)
                    wi = float(w21[r, n2].imag)
                    xr, xi = bs[r]
                    tr = wr * xr - wi * xi
                    ti = wr * xi + wi * xr
                    acc_r = tr if acc_r is None else acc_r + tr
                    acc_i = ti if acc_i is None else acc_i + ti
                if scale != 1.0:
                    acc_r = acc_r * scale
                    acc_i = acc_i * scale
                buf_re[pl.ds(n2 * N1 + c0, CH), :] = acc_r
                buf_im[pl.ds(n2 * N1 + c0, CH), :] = acc_i

    def radix2(r):
        vr = buf_re[pl.ds(r * N1, N1), :]
        vi = buf_im[pl.ds(r * N1, N1), :]
        if not inverse:
            # DIF: butterfly, then post-twiddle (last stage h=1 trivial)
            for s in range(k):
                h = N1 >> (s + 1)
                vr, vi = _butterfly(vr, vi, h)
                if h > 1:
                    tr = twb_re[pl.ds(s * N1, N1), :]
                    ti = twb_im[pl.ds(s * N1, N1), :]
                    vr, vi = _cmul_table(vr, vi, tr, ti)
        else:
            # DIT: pre-twiddle, then butterfly; h = 1, 2, ..., N1/2.
            # Stage-s' twiddle (h = N1>>(s'+1)) reuses the DIF table.
            for s in range(k - 1, -1, -1):
                h = N1 >> (s + 1)
                if h > 1:
                    tr = twb_re[pl.ds(s * N1, N1), :]
                    ti = twb_im[pl.ds(s * N1, N1), :]
                    vr, vi = _cmul_table(vr, vi, tr, ti)
                vr, vi = _butterfly(vr, vi, h)
        buf_re[pl.ds(r * N1, N1), :] = vr
        buf_im[pl.ds(r * N1, N1), :] = vi

    if not inverse:
        if N2 > 1:
            step_a()
        for r in range(N2):
            radix2(r)
    else:
        for r in range(N2):
            radix2(r)
        if N2 > 1:
            step_a_inv()
        elif scale != 1.0:
            buf_re[:, :] = buf_re[:, :] * scale
            buf_im[:, :] = buf_im[:, :] * scale

    cp_r = pltpu.make_async_copy(
        buf_re, out_re.at[:, pl.ds(slab * S, S)], sem.at[0])
    cp_i = pltpu.make_async_copy(
        buf_im, out_im.at[:, pl.ds(slab * S, S)], sem.at[1])
    cp_r.start()
    cp_i.start()
    cp_r.wait()
    cp_i.wait()


def fft_cols_split(xr, xi, inverse: bool = False, scale: float = 1.0,
                   interpret: bool | None = None):
    """1-D FFT along axis 0 of a split-complex (N, L) pair.

    ``interpret=None`` resolves to the Pallas interpreter off-TPU (the
    CPU test mesh) and to the compiled kernel on TPU.

    Forward: natural rows in -> SCRAMBLED spectral rows out (physical
    row r·N1+bitrev(m) holds X[r+N2·m]; :func:`spectrum_freqs` gives
    each row's frequency).  Inverse: scrambled spectral rows in ->
    natural rows out, multiplied by ``scale`` (pass 1/N for a true
    inverse; the kernel never divides on its own).

    L must be a multiple of 128 (callers pad lanes; production frames
    are 10752-wide).  Returns (yr, yi) float32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fft_cols_jit(xr, xi, inverse, float(scale), bool(interpret))


@functools.partial(jax.jit,
                   static_argnames=("inverse", "scale", "interpret"))
def _fft_cols_jit(xr, xi, inverse: bool, scale: float, interpret: bool):
    N, L = xr.shape
    if xi.shape != (N, L):
        raise ValueError("re/im shape mismatch")
    S = 128
    if L % S:
        raise ValueError(f"lane count {L} must be a multiple of {S}")
    N1, N2, k = plan(N)
    twa_re, twa_im, twb_re, twb_im, w21 = _tables(N, inverse)

    kern = functools.partial(
        _fft_kernel, N1=N1, N2=N2, k=k, S=S, w21=w21,
        inverse=inverse, scale=float(scale))

    grid = (L // S,)
    yr, yi = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=(jax.ShapeDtypeStruct((N, L), jnp.float32),
                   jax.ShapeDtypeStruct((N, L), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((N, S), jnp.float32),
                        pltpu.VMEM((N, S), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        # The live set at production N=10752 is ~25 MB (the two (N, S)
        # slab buffers are 11 MB; unrolled butterfly stages and the
        # step-A chunk cache make up the rest) — above Mosaic's 16 MB
        # default scoped-VMEM limit but nowhere near the v5e's 128 MB
        # physical VMEM.  Raise the cap instead of shrinking the slab:
        # S < 128 lanes would relayout every access.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(twa_re), jnp.asarray(twa_im),
      jnp.asarray(twb_re), jnp.asarray(twb_im),
      xr.astype(jnp.float32), xi.astype(jnp.float32))
    return yr, yi


def fft2_split(xr, xi, interpret: bool | None = None):
    """2-D FFT of a split-complex (H, W) pair.

    Returns (Yr, Yi) in TRANSPOSED SCRAMBLED layout: shape (W, H);
    element [p, q] is the spectrum at frequency
    (u, v) = (spectrum_freqs(H)[q], spectrum_freqs(W)[p]).
    Elementwise algebra composes freely in this layout;
    :func:`ifft2_split` undoes it exactly.
    """
    yr, yi = fft_cols_split(xr, xi, interpret=interpret)       # axis 0
    yr, yi = yr.T, yi.T                                        # (W, H)
    return fft_cols_split(yr, yi, interpret=interpret)         # axis 1


def ifft2_split(yr, yi, scale: bool = True,
                interpret: bool | None = None):
    """Inverse of :func:`fft2_split`: (W, H) transposed-scrambled in,
    natural (H, W) out; divides by H·W when ``scale``."""
    W, H = yr.shape
    s = 1.0 / W if scale else 1.0
    zr, zi = fft_cols_split(yr, yi, inverse=True, scale=s,
                            interpret=interpret)               # axis 1
    zr, zi = zr.T, zi.T                                        # (H, W)
    s = 1.0 / H if scale else 1.0
    return fft_cols_split(zr, zi, inverse=True, scale=s,
                          interpret=interpret)                 # axis 0


def unscramble2(yr, yi):
    """Natural-order complex spectrum from :func:`fft2_split` output —
    test/debug glue (two gathers + a transpose), NEVER on the hot path."""
    W, H = yr.shape
    pr = jnp.asarray(spectrum_perm(W))
    pc = jnp.asarray(spectrum_perm(H))
    z = (yr + 1j * yi)[pr][:, pc].T
    return z

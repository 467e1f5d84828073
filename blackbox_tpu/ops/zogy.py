"""ZOGY optimal image subtraction as a pure-FFT device program.

The reference gets D/S/Scorr from the external zogy package's
``optimal_subtraction`` (called at /root/reference/blackbox.py:2350,2460;
pyfftw + C binaries underneath — SURVEY.md §2.4/§2.5).  Here the full
statistic chain (Zackay, Ofek & Gal-Yam 2016, ApJ 830:27; PAPERS.md) is
``jnp.fft.rfft2`` arithmetic on device:

    D̂  = (f_r P̂_r N̂ − f_n P̂_n R̂) / √(σ_n² f_r² |P̂_r|² + σ_r² f_n² |P̂_n|²)
    Ŝ  = F_D P̂_D* D̂
    Scorr = S / √V[S],   V[S] = k_n²⊗V_N + k_r²⊗V_R + V_ast

with the source-noise and astrometric-variance corrections of §3.3 of the
paper.  PSFs enter as small stamps (PSFModel samples) and are embedded
into full-frame OTFs.  Everything is float32 except the frequency-domain
accumulations, which XLA keeps in complex64.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ZogyParams:
    eps: float = 1e-12        # denominator floor
    dx: float = 0.25          # astrometric rms [pix] between new and ref
    dy: float = 0.25
    fratio_floor: float = 1e-3
    # Support size [px] assumed for the matched-filter kernels k_n/k_r
    # when squaring them for the V[S] source-noise term (variance-map
    # path only).  The kernels are PSF-sized with fast-decaying
    # deconvolution ringing, so their squares can be built on a
    # kernel_stamp² aliased grid and expanded to the full spectrum with
    # two small separable DFT matmuls — replacing four full-frame FFTs
    # (~200 ms at 10.5k²) with ~10 ms of MXU work.  0 = exact
    # full-frame round-trip.
    kernel_stamp: int = 256
    # Zero-pad the frames to the next FFT-friendly size before the
    # transform chain.  XLA's TPU FFT at 10560 (odd part 3·5·11) runs
    # ~30% slower per transform than at 10752 = 2⁹·21 (measured on
    # v5e; PERF_NOTES.md), so padding 1.8% more pixels is a large net
    # win.  Only the ~PSF-width border band differs from the unpadded
    # statistic (wraparound sees zeros instead of the opposite edge);
    # it lies inside the EDGE mask either way.
    pad_fast: bool = True
    # Pack PAIRS of real transforms into single complex transforms:
    # fft2(new + i·ref) carries both forward spectra (unpacked by
    # hermitian symmetry), and every pair of real inverse transforms
    # rides one ifft2 as its real/imaginary parts.  The chain is
    # transform-bound, so if a complex fft2 costs anywhere below 2x an
    # rfft2 this wins: the production 6-transform chain becomes 3
    # complex transforms (the variance-map 8 becomes 4).  Exact
    # algebra; the unpacking subtraction loses at most ~1e-7 relative
    # precision where one spectrum dwarfs the other.
    # Measured on v5e at 10752²: complex roundtrip = 1.20x a real one
    # (130.6 vs 108.9 ms) -> pair 290.6 -> 271.2 ms; interior
    # max|dScorr| vs unpacked = 2.7e-3 at sigma=1 (threshold is 6
    # sigma, so detection flips are negligible).
    # The spectral ALGEBRA stays on rfft half planes either way —
    # carrying the redundant mirror columns through the elementwise
    # chain doubled its HBM traffic (~100 ms/frame at 10.5k²); the
    # mirror rebuilds in one fused pass per packed inverse.
    pack_fft: bool = True
    # FFT implementation: "xla" = jnp.fft custom calls (complex64);
    # "split" = the Pallas split-real mixed-radix kernel
    # (:mod:`blackbox_tpu.pallas.fft`) with ALL spectral algebra on
    # split f32 planes in the kernel's scrambled layout.  complex64
    # elementwise throughput measures ~5x below split-f32 on v5e
    # (PERF_NOTES.md), so the split path wins when the kernel's
    # transform cost is competitive.  Requires frame sides that pad to
    # a multiple of 128 (production 10560 -> 10752 qualifies); falls
    # back to "xla" otherwise.
    # "auto" (the default since round 4) = "split" on TPU for
    # production-scale frames, "xla" elsewhere.  Measured on v5e: the
    # full var_bkg subtraction at 10560² runs 190 vs 475 ms
    # (same-session A/B), and against a float64 host oracle the split
    # path is MORE accurate than the complex64 custom calls on every
    # statistic at both 2560² and 5120² compiled (Scorr interior max
    # dev 1.4e-4 vs 5.6e-4 of scale at 5120²) — f64-built twiddles +
    # split-f32 algebra round better than the complex64 pipeline.
    # Caveat for exotic callers: on a PURE-NOISE scene (no sources)
    # the two impls' Scorr can differ by ~5% rms — S is bit-stable
    # but V_src is tiny there, so its f32 rounding is amplified; with
    # any real scene both impls sit inside the oracle tolerance.
    fft: str = "auto"


def psf_to_otf(psf_stamp, shape, full: bool = False):
    """OTF of a centred (S, S) PSF stamp on an (H, W) frame grid.

    Mathematically identical to zero-padding the stamp to the frame,
    rolling its centre pixel to (0, 0) and taking ``rfft2`` — but a
    zero-padded full-frame FFT costs ~50 ms at 10.5k² while the DFT of
    a 25-px-support function is two small separable complex matmuls
    (MXU, ~1 ms):  OTF[u, v] = Σ_yx psf[y,x]·e^(-2πi·u(y-c)/H)
    ·e^(-2πi·v(x-c)/W).

    full=False returns the rfft half plane (W//2+1 columns); full=True
    the complete W-column spectrum (the ``pack_fft`` representation),
    built by EXACT hermitian mirroring of the half plane — evaluating
    the exponentials at the mirrored frequencies directly would be
    hermitian only to f32 rounding, and that anti-hermitian residue
    cross-talks between the two real signals sharing a packed ifft2.
    """
    H, W = shape
    S = psf_stamp.shape[-1]
    c = S // 2
    u = jnp.arange(H, dtype=jnp.float32)[:, None]        # (H, 1)
    y = (jnp.arange(S, dtype=jnp.float32) - c)[None, :]  # (1, S)
    Ey = jnp.exp(-2j * jnp.pi / H * (u * y))             # (H, S)
    ncol = W // 2 + 1
    v = jnp.arange(ncol, dtype=jnp.float32)[None, :]
    x = (jnp.arange(S, dtype=jnp.float32) - c)[:, None]
    Ex = jnp.exp(-2j * jnp.pi / W * (x * v))             # (S, ncol)
    mid = jnp.matmul(psf_stamp.astype(jnp.complex64), Ex,
                     precision="highest")                # (S, ncol)
    half = jnp.matmul(Ey, mid, precision="highest")      # (H, ncol)
    return hermitian_full(half, W) if full else half


def otf_to_psf_stamp(otf, shape, S: int):
    """Centred (S, S) PSF stamp from a full-frame OTF — the inverse of
    :func:`psf_to_otf` as two small separable DFT matmuls.

    Bit-equivalent (to f32 rounding) to ``irfft2(otf)`` followed by
    rolling the (0, 0) centre to (S//2, S//2) and cropping — but the
    full-frame inverse costs ~50 ms at 10.5k² while the S-row DFT
    contraction is MXU work over the spectrum it already has to read:
    psf[i, j] = (1/HW)·Σ_uv OTF[u, v]·e^(2πi·u(i-c)/H)·e^(2πi·v(j-c)/W).
    Accepts either the rfft half plane (real-signal hermitian columns
    fold in with weight 2) or the full W-column spectrum.
    """
    H, W = shape
    c = S // 2
    y = (jnp.arange(S, dtype=jnp.float32) - c)[:, None]     # (S, 1)
    u = jnp.arange(H, dtype=jnp.float32)[None, :]           # (1, H)
    Ey = jnp.exp(2j * jnp.pi / H * (y * u))                 # (S, H)
    ncol = otf.shape[-1]
    v = jnp.arange(ncol, dtype=jnp.float32)[:, None]        # (ncol, 1)
    x = (jnp.arange(S, dtype=jnp.float32) - c)[None, :]     # (1, S)
    Ex = jnp.exp(2j * jnp.pi / W * (v * x))                 # (ncol, S)
    if ncol != W:
        # rfft half plane: interior columns stand for themselves and
        # their conjugate mirror; Re(conj pair) doubles, so fold a
        # column weight into Ex and keep the real part
        colw = jnp.full((ncol, 1), 2.0, jnp.float32)
        colw = colw.at[0].set(1.0)
        if W % 2 == 0:
            colw = colw.at[-1].set(1.0)
        Ex = colw * Ex
    mid = jnp.matmul(Ey, otf.astype(jnp.complex64),
                     precision="highest")                   # (S, ncol)
    out = jnp.matmul(mid, Ex, precision="highest")          # (S, S)
    return jnp.real(out) / (H * W)


def hermitian_full(half, W: int):
    """Expand an rfft half plane (H, W//2+1) to the full W-column
    spectrum of a real signal: A(u, c) = conj(A(-u, W-c)), bit-exact."""
    tail = jnp.conj(half[:, W - half.shape[1]:0:-1])     # cols W-1..Wr
    tail = jnp.roll(tail[::-1, :], 1, 0)                 # row u -> -u
    return jnp.concatenate([half, tail], axis=1)


def fast_fft_size(n: int) -> int:
    """Smallest m >= n of the form 2^a·{1,3,5,7,11,21}.

    On the v5e, transform time tracks the size's odd part: 10560
    (odd 165) round-trips in 137 ms, 10752 = 2⁹·21 in 105 ms, 10240 =
    2¹¹·5 in 92 ms, while 10800 (odd 675) takes 928 ms.  The allowed
    odd parts are the measured-fast ones.
    """
    best = None
    for m in (1, 3, 5, 7, 11, 21):
        c = m
        while c < n:
            c <<= 1
        if best is None or c < best:
            best = c
    return best


def _kernel_sq_stamps(psf_new, psf_ref, fn, fr, sn, sr, eps, K):
    """K×K aliased stamps of k_n², k_r².

    k_n/k_r sample a continuous frequency response (ratios of the PSF
    stamps' DTFTs), so evaluating the same formulas on a K×K grid and
    inverse-transforming yields the true kernels folded with period K —
    identical to the full-frame kernels wherever they decay inside
    K/2 px.  The squares are then K×K stamps the caller expands to
    full-frame spectra with its layout's separable-DFT builder.
    """
    Pn = psf_to_otf(psf_new, (K, K))
    Pr = psf_to_otf(psf_ref, (K, K))
    Pn2 = jnp.abs(Pn) ** 2
    Pr2 = jnp.abs(Pr) ** 2
    den = sn ** 2 * fr ** 2 * Pr2 + sr ** 2 * fn ** 2 * Pn2 + eps
    kn = jnp.fft.irfft2(fn * fr ** 2 * jnp.conj(Pn) * Pr2 / den, (K, K))
    kr = jnp.fft.irfft2(fr * fn ** 2 * jnp.conj(Pr) * Pn2 / den, (K, K))
    # irfft2 leaves the kernel centre at index (0, 0); fftshift moves it
    # to (K//2, K//2), the centre convention psf_to_otf expects
    return jnp.fft.fftshift(kn) ** 2, jnp.fft.fftshift(kr) ** 2


def _kernel_sq_otfs(psf_new, psf_ref, fn, fr, sn, sr, eps, K, shape,
                    full: bool = False):
    """Full-frame spectra of k_n², k_r² from the K×K aliased stamps."""
    kn2, kr2 = _kernel_sq_stamps(psf_new, psf_ref, fn, fr, sn, sr,
                                 eps, K)
    return (psf_to_otf(kn2, shape, full=full),
            psf_to_otf(kr2, shape, full=full))


def _signed_freqs(N: int):
    """Scrambled-layout frequency of each physical row, in the SIGNED
    (fftfreq-style) convention: f - N for f > N/2."""
    from blackbox_tpu.pallas.fft import spectrum_freqs
    import numpy as _np
    f = spectrum_freqs(N).astype(_np.int64)
    return jnp.asarray(_np.where(f > N // 2, f - N, f), jnp.float32)


def _otf_scr(psf_stamp, shape):
    """Split (re, im) OTF planes of a centred real stamp in the
    TRANSPOSED SCRAMBLED layout of :func:`pallas.fft.fft2_split`:
    plane[p, q] = OTF[fu[q], fv[p]] with fu/fv = ``spectrum_freqs``.

    Same separable-DFT construction as :func:`psf_to_otf` (the stamp's
    support is ~25 px, so the DFT is two small matmuls), but the
    frequency vectors are permuted into kernel order host-side, so the
    plane is BORN in the split path's layout — no unscramble pass ever
    runs.  Four real f32 matmuls instead of complex64 ones: the MXU
    eats them at full rate and the output lands already split.
    """
    from blackbox_tpu.pallas.fft import spectrum_freqs
    Hp, Wp = shape
    S = psf_stamp.shape[-1]
    c = S // 2
    # SIGNED frequencies: negating a float is exact, so cos/sin of the
    # mirrored frequency are EXACTLY the conjugate pair and the plane
    # is hermitian to f32 equality (not just rounding) — without this,
    # the anti-hermitian rounding residue is amplified by the 1/√den
    # deconvolution wherever the OTF decays to the f32 noise floor and
    # leaks into the imaginary (discarded) half of the packed inverses.
    fu = _signed_freqs(Hp)                                 # (Hp,)
    fv = _signed_freqs(Wp)                                 # (Wp,)
    y = jnp.arange(S, dtype=jnp.float32) - c
    ay = (-2 * jnp.pi / Hp) * fu[:, None] * y[None, :]     # (Hp, S)
    ax = (-2 * jnp.pi / Wp) * fv[:, None] * y[None, :]     # (Wp, S)
    eyr, eyi = jnp.cos(ay), jnp.sin(ay)
    exr, exi = jnp.cos(ax), jnp.sin(ax)
    pT = psf_stamp.astype(jnp.float32).T                   # [x, y]
    mr = jnp.matmul(exr, pT, precision="highest")          # (Wp, S)
    mi = jnp.matmul(exi, pT, precision="highest")
    re = (jnp.matmul(mr, eyr.T, precision="highest")
          - jnp.matmul(mi, eyi.T, precision="highest"))    # (Wp, Hp)
    im = (jnp.matmul(mr, eyi.T, precision="highest")
          + jnp.matmul(mi, eyr.T, precision="highest"))
    return re, im


def _otf_scr_to_stamp(ar, ai, shape, S: int):
    """Centred (S, S) real stamp from split scrambled-layout spectrum
    planes — the split twin of :func:`otf_to_psf_stamp`."""
    Hp, Wp = shape
    c = S // 2
    fu = _signed_freqs(Hp)
    fv = _signed_freqs(Wp)
    t = jnp.arange(S, dtype=jnp.float32) - c
    ay = (2 * jnp.pi / Hp) * fu[:, None] * t[None, :]      # (Hp, S)
    ax = (2 * jnp.pi / Wp) * fv[:, None] * t[None, :]      # (Wp, S)
    eyr, eyi = jnp.cos(ay), jnp.sin(ay)
    exr, exi = jnp.cos(ax), jnp.sin(ax)
    # C = Ex^T A over the Wp axis (complex), then D = C Ey over Hp;
    # stamp = Re(D)^T / (Hp Wp)
    cr = (jnp.matmul(exr.T, ar, precision="highest")
          - jnp.matmul(exi.T, ai, precision="highest"))    # (S, Hp)
    ci = (jnp.matmul(exr.T, ai, precision="highest")
          + jnp.matmul(exi.T, ar, precision="highest"))
    dr = (jnp.matmul(cr, eyr, precision="highest")
          - jnp.matmul(ci, eyi, precision="highest"))      # (S, S)
    return dr.T / (Hp * Wp)


def split_fft_size(n: int) -> int:
    """Smallest fast FFT size >= n that the split kernel accepts as a
    LANE count too: a multiple of 128 (each axis takes a turn as the
    lane dimension of :func:`pallas.fft.fft_cols_split`)."""
    m = fast_fft_size(n)
    while m % 128:
        m = fast_fft_size(m + 1)
    return m


def _freq_grids(shape):
    H, W = shape
    fy = jnp.fft.fftfreq(H).astype(jnp.float32)          # (H,)
    fx = jnp.fft.rfftfreq(W).astype(jnp.float32)         # (W//2+1,)
    return fy, fx


def _zogy_split(new, ref, psf_new, psf_ref, sn, sr, fn, fr,
                var_new, var_ref, var_bkg_new, var_bkg_ref,
                p: ZogyParams, want_psf_d: bool):
    """zogy_subtract on the Pallas split-real FFT (see ZogyParams.fft).

    Identical mathematics to the xla path; the representation changes:
    ALL spectral planes are split (re, im) f32 pairs in the kernel's
    transposed scrambled layout (elementwise algebra is layout-blind,
    and complex64 elementwise runs ~5x below split-f32 on v5e).  The
    packed forward fft2_split(new, ref) carries both spectra; they
    separate by ONE hermitian-mirror gather (mirror_perm both axes +
    conj).  Each pair of real inverse transforms rides one
    ifft2_split of Y = A + iB, whose natural-order real/imag parts
    are the two images — so the production var_bkg chain keeps the
    xla path's 3-transform count."""
    from blackbox_tpu.pallas.fft import (fft2_split, ifft2_split,
                                         mirror_perm)
    H, W = new.shape
    Hp, Wp = split_fft_size(H), split_fft_size(W)
    shape = (Hp, Wp)
    if (Hp, Wp) != (H, W):
        def _pad(a):
            return jnp.pad(a, ((0, Hp - H), (0, Wp - W)))
        new, ref = _pad(new), _pad(ref)
        var_new = None if var_new is None else _pad(var_new)
        var_ref = None if var_ref is None else _pad(var_ref)

    mpr = jnp.asarray(mirror_perm(Wp))
    mpc = jnp.asarray(mirror_perm(Hp))

    def _cm(ar, ai, br, bi):
        return ar * br - ai * bi, ar * bi + ai * br

    def _unpack(ar, ai):
        """Split spectra of the two real frames packed in one forward
        transform: A = (Z + M(Z))/2, B = -i(Z - M(Z))/2 with
        M(Z) = conj(Z at negated frequencies) — a two-axis gather by
        the precomputed mirror permutations."""
        gr = jnp.take(jnp.take(ar, mpr, 0), mpc, 1)
        gi = jnp.take(jnp.take(ai, mpr, 0), mpc, 1)
        return ((0.5 * (ar + gr), 0.5 * (ai - gi)),
                (0.5 * (ai + gi), 0.5 * (gr - ar)))

    def _inv_pair(A, B):
        """Two real inverses in one kernel transform: for hermitian
        A, B the natural-order ifft of Y = A + iB has re = a, im = b."""
        (Ar, Ai), (Br, Bi) = A, B
        return ifft2_split(Ar - Bi, Ai + Br)

    Zr, Zi = fft2_split(new, ref)                   # (Wp, Hp) split
    (Nr, Ni), (Rr, Ri) = _unpack(Zr, Zi)

    pn = _otf_scr(psf_new, shape)
    pr_ = _otf_scr(psf_ref, shape)

    fn = jnp.float32(fn)
    fr = jnp.maximum(jnp.float32(fr), p.fratio_floor)
    sn = jnp.maximum(jnp.float32(sn), 1e-6)
    sr = jnp.maximum(jnp.float32(sr), 1e-6)

    Pn2 = pn[0] ** 2 + pn[1] ** 2
    Pr2 = pr_[0] ** 2 + pr_[1] ** 2
    den = sn ** 2 * fr ** 2 * Pr2 + sr ** 2 * fn ** 2 * Pn2 + p.eps
    sq = jnp.sqrt(den)

    t1 = _cm(pr_[0], pr_[1], Nr, Ni)
    t2 = _cm(pn[0], pn[1], Rr, Ri)
    D_hat = ((fr * t1[0] - fn * t2[0]) / sq,
             (fr * t1[1] - fn * t2[1]) / sq)
    F_D = fn * fr / jnp.sqrt(sn ** 2 * fr ** 2 + sr ** 2 * fn ** 2)

    # matched-filter kernels (conj(P) folds in as a sign flip on im)
    cn = fn * fr ** 2 * Pr2 / den
    cr_ = fr * fn ** 2 * Pn2 / den
    kn_hat = (cn * pn[0], -cn * pn[1])
    kr_hat = (cr_ * pr_[0], -cr_ * pr_[1])

    npx = Hp * Wp

    def _k2_scr():
        K = p.kernel_stamp
        if K and K < min(H, W):
            kn2, kr2 = _kernel_sq_stamps(
                psf_new, psf_ref, fn, fr, sn, sr, p.eps, K)
        else:
            # full-frame kernels: one packed inverse gives both, one
            # packed forward re-transforms the squares — exact path,
            # off in production
            kn, kr = _inv_pair(kn_hat, kr_hat)
            return _unpack(*fft2_split(kn ** 2, kr ** 2))
        return _otf_scr(kn2, shape), _otf_scr(kr2, shape)

    D = None
    if var_new is not None or var_ref is not None:
        kn2_hat, kr2_hat = _k2_scr()
        vcap = 1e4 * (sn ** 2 + sr ** 2)
        Vn = (sn ** 2 * jnp.ones(shape, jnp.float32) if var_new is None
              else jnp.clip(var_new, 0.0, vcap))
        Vr = (sr ** 2 * jnp.ones(shape, jnp.float32) if var_ref is None
              else jnp.clip(var_ref, 0.0, vcap))
        Vn_hat, Vr_hat = _unpack(*fft2_split(Vn, Vr))
        a = _cm(kn2_hat[0], kn2_hat[1], *Vn_hat)
        b = _cm(kr2_hat[0], kr2_hat[1], *Vr_hat)
        D, V_src = _inv_pair(D_hat, (a[0] + b[0], a[1] + b[1]))
    else:
        sum_kn2 = jnp.sum(kn_hat[0] ** 2 + kn_hat[1] ** 2) / npx
        sum_kr2 = jnp.sum(kr_hat[0] ** 2 + kr_hat[1] ** 2) / npx
        vbn = sn ** 2 if var_bkg_new is None else var_bkg_new
        vbr = sr ** 2 if var_bkg_ref is None else var_bkg_ref
        if getattr(vbn, "ndim", 0) == 2 and vbn.shape != shape:
            vbn = jnp.pad(vbn, ((0, Hp - H), (0, Wp - W)), mode="edge")
        if getattr(vbr, "ndim", 0) == 2 and vbr.shape != shape:
            vbr = jnp.pad(vbr, ((0, Hp - H), (0, Wp - W)), mode="edge")
        V_src = vbn * sum_kn2 + vbr * sum_kr2
        if var_bkg_new is not None or var_bkg_ref is not None:
            kn2_hat, kr2_hat = _k2_scr()
            a = _cm(kn2_hat[0], kn2_hat[1], Nr, Ni)
            b = _cm(kr2_hat[0], kr2_hat[1], Rr, Ri)
            D, src = _inv_pair(D_hat, (a[0] + b[0], a[1] + b[1]))
            V_src = V_src + jnp.maximum(src, 0.0)
    if D is None:
        D = ifft2_split(*D_hat)[0]

    Sn, Sr = _inv_pair(_cm(kn_hat[0], kn_hat[1], Nr, Ni),
                       _cm(kr_hat[0], kr_hat[1], Rr, Ri))
    S = Sn - Sr

    def _grad(img):
        gy = 0.5 * (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0))
        gx = 0.5 * (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1))
        return gy, gx

    dSn_dy, dSn_dx = _grad(Sn)
    dSr_dy, dSr_dx = _grad(Sr)
    V_ast = (p.dx ** 2 * (dSn_dx ** 2 + dSr_dx ** 2)
             + p.dy ** 2 * (dSn_dy ** 2 + dSr_dy ** 2))

    V_S = V_src + V_ast
    Scorr = S / jnp.sqrt(jnp.maximum(V_S, p.eps))

    F_S = jnp.sum(fn ** 2 * fr ** 2 * Pn2 * Pr2 / den) / npx
    F_S = jnp.maximum(F_S, p.eps)
    Fpsf = S / F_S
    Fpsferr = jnp.sqrt(jnp.maximum(V_S, p.eps)) / F_S

    def _crop(a):
        return a[:H, :W] if (Hp, Wp) != (H, W) else a

    out = {"D": _crop(D), "S": _crop(S), "Scorr": _crop(Scorr),
           "Fpsf": _crop(Fpsf), "Fpsferr": _crop(Fpsferr),
           "F_D": F_D, "F_S": F_S}
    if want_psf_d:
        c = fn * fr / (F_D * sq)
        pd = _cm(pn[0], pn[1], pr_[0], pr_[1])
        out["psf_D"] = _otf_scr_to_stamp(c * pd[0], c * pd[1], shape,
                                         psf_new.shape[-1])
    return out


def zogy_subtract(new, ref, psf_new, psf_ref, sn, sr,
                  fn=1.0, fr=1.0, var_new=None, var_ref=None,
                  var_bkg_new=None, var_bkg_ref=None,
                  params: ZogyParams = ZogyParams(),
                  want_psf_d: bool = True):
    """Optimal subtraction of a registered (ref -> new grid) image pair.

    new, ref : (H, W) background-subtracted images [e-]
    psf_new, psf_ref : (S, S) unit-sum PSF stamps on the same grid
    sn, sr   : scalar background STDs [e-]
    fn, fr   : flux zeropoint scalings (fr/fn = flux ratio ref/new)
    var_new, var_ref : optional (H, W) explicit variance maps for the
        Scorr source-noise correction (two forward FFTs)
    var_bkg_new, var_bkg_ref : optional smooth background-variance maps
        (or scalars).  The FAST production path: the total variance is
        modelled as V = V_bkg + max(source, 0) with the Poisson source
        term taken from the images themselves, so k²⊗V needs NO extra
        forward FFT — k_bkg·ΣK² uses the Parseval sums (the kernels'
        ~25-px support cannot resolve the ≥256-px background mesh) and
        the source term reuses N̂/R̂ in one merged inverse transform,
        rectified after convolution (less biased than the reference's
        per-pixel clip before it).  Ignored when var_new/var_ref given.
    want_psf_d : include the ``psf_D`` stamp (thumbnail/vetting use).
        Cheap either way — the stamp is a small DFT contraction of the
        already-built P̂_D spectrum (:func:`otf_to_psf_stamp`), not a
        full-frame inverse FFT

    Returns dict with D (difference, new-image flux units), S, Scorr,
    Fpsf/Fpsferr (PSF flux + error of a transient at each pixel), and the
    difference PSF stamp ``psf_D`` (same size as psf_new) with its flux
    normalisation F_D.

    The chain is full-frame-FFT bound (~50 ms per 10.5k² transform on
    one v5e chip), so transforms are budgeted: scalar variances take a
    Parseval shortcut (V[S] source term = Vn·Σkn² with Σkn² summed in
    the frequency domain — no kernel round-trip), the two source-noise
    back-transforms merge into one, and the astrometric-variance
    gradients are real-space centred differences of S_n/S_r (matching
    the reference's ``np.gradient``; interior-exact, and the 1-px
    wrap-around border lies inside the EDGE mask) instead of four
    spectral-derivative inverse FFTs.
    """
    p = params
    H, W = new.shape
    impl = p.fft
    if impl == "auto":
        # split on TPU at production-scale frames (padding to a 128
        # multiple is then the same fast size the xla path picks);
        # xla elsewhere — tiny frames would pay heavy padding, and the
        # CPU mesh would pay the kernel interpreter.  pad_fast=False
        # is an explicit exact-size request the split kernel cannot
        # honour (it always pads to a 128 multiple), so it stays xla.
        import jax
        impl = ("split" if jax.default_backend() == "tpu"
                and min(H, W) >= 1024 and p.pad_fast else "xla")
    if impl == "split":
        return _zogy_split(new, ref, psf_new, psf_ref, sn, sr, fn, fr,
                           var_new, var_ref, var_bkg_new, var_bkg_ref,
                           p, want_psf_d)
    Hp = fast_fft_size(H) if p.pad_fast else H
    Wp = fast_fft_size(W) if p.pad_fast else W
    shape = (Hp, Wp)
    if (Hp, Wp) != (H, W):
        def _pad(a):
            return jnp.pad(a, ((0, Hp - H), (0, Wp - W)))
        new = _pad(new)
        ref = _pad(ref)
        var_new = None if var_new is None else _pad(var_new)
        var_ref = None if var_ref is None else _pad(var_ref)

    pack = p.pack_fft
    Wr = Wp // 2 + 1

    # ALL spectral algebra runs on rfft HALF planes regardless of
    # packing — full-column planes double the HBM traffic of every
    # elementwise op in the chain, which measured ~100 ms/frame at
    # 10.5k² (the packing win is in the transforms, not the algebra).
    # Packed transforms unpack to half right after the forward and
    # re-mirror hermitianly right before the inverse.

    def _fwd_pair(a, b):
        """Forward HALF-plane spectra of two real frames: one complex
        fft2 when packing (unpacked by hermitian symmetry, sliced to
        the half plane), two rfft2 otherwise."""
        if not pack:
            return jnp.fft.rfft2(a), jnp.fft.rfft2(b)
        Z = jnp.fft.fft2(a + 1j * b)
        Zh = Z[:, :Wr]
        # Z(-k) on the half plane only: columns (W - v) mod W for
        # v in [0, Wr) are [0, W-1, ..., W-Wr+1]; rows (H - u) mod H
        cols = jnp.concatenate([Z[:, :1],
                                jnp.flip(Z[:, Wp - Wr + 1:], 1)], 1)
        Zc = jnp.conj(jnp.roll(jnp.flip(cols, 0), 1, 0))
        return 0.5 * (Zh + Zc), -0.5j * (Zh - Zc)

    def _inv_pair(A, B):
        """Two real inverse transforms from HALF-plane spectra: one
        complex ifft2 when packing (the full plane of A + iB rebuilds
        from hermitian symmetry in one fused tail pass), two irfft2
        otherwise."""
        if not pack:
            return (jnp.fft.irfft2(A, shape), jnp.fft.irfft2(B, shape))
        head = A + 1j * B
        # tail of A+iB at mirrored frequencies: conj(A) + i·conj(B)
        # evaluated at (-u, W-v) = conj((A - iB)[-u, W-v])
        t = jnp.conj((A - 1j * B)[:, Wp - Wr:0:-1])
        t = jnp.roll(t[::-1, :], 1, 0)
        Y = jnp.fft.ifft2(jnp.concatenate([head, t], axis=1))
        return jnp.real(Y), jnp.imag(Y)

    def _inv_one(A):
        """Single real inverse of a HALF-plane spectrum."""
        return jnp.fft.irfft2(A, shape)

    N_hat, R_hat = _fwd_pair(new, ref)
    Pn = psf_to_otf(psf_new, shape)
    Pr = psf_to_otf(psf_ref, shape)

    fn = jnp.float32(fn)
    fr = jnp.maximum(jnp.float32(fr), p.fratio_floor)
    sn = jnp.maximum(jnp.float32(sn), 1e-6)
    sr = jnp.maximum(jnp.float32(sr), 1e-6)

    Pn2 = jnp.abs(Pn) ** 2
    Pr2 = jnp.abs(Pr) ** 2
    den = sn ** 2 * fr ** 2 * Pr2 + sr ** 2 * fn ** 2 * Pn2 + p.eps
    sq = jnp.sqrt(den)

    # difference image (eq. 13) and its PSF (eq. 14-15); the inverse
    # transform of D̂ is deferred so it can share a packed ifft2 with
    # whichever variance spectrum the variance path produces
    D_hat = (fr * Pr * N_hat - fn * Pn * R_hat) / sq
    F_D = fn * fr / jnp.sqrt(sn ** 2 * fr ** 2 + sr ** 2 * fn ** 2)
    P_D_hat = fn * fr * Pn * Pr / (F_D * sq)

    # matched-filter kernels k_n, k_r (eq. 26-29)
    kn_hat = fn * fr ** 2 * jnp.conj(Pn) * Pr2 / den
    kr_hat = fr * fn ** 2 * jnp.conj(Pr) * Pn2 / den

    # rfft half-plane column weights for full-spectrum sums: the
    # interior columns appear once but stand for two
    colw = jnp.full((Wr,), 2.0, jnp.float32)
    colw = colw.at[0].set(1.0)
    if Wp % 2 == 0:
        colw = colw.at[-1].set(1.0)

    def _spec_mean(x):
        return jnp.sum(colw * x) / (Hp * Wp)

    def _k2_hats():
        K = params.kernel_stamp
        if K and K < min(H, W):
            return _kernel_sq_otfs(
                psf_new, psf_ref, fn, fr, sn, sr, p.eps, K, shape)
        kn, kr = _inv_pair(kn_hat, kr_hat)
        return _fwd_pair(kn ** 2, kr ** 2)

    D = None
    if var_new is not None or var_ref is not None:
        kn2_hat, kr2_hat = _k2_hats()
        # variance maps are clamped: the float32 FFT loses ~7 digits,
        # so a handful of huge sentinel pixels would corrupt V[S]
        # frame-wide
        vcap = 1e4 * (sn ** 2 + sr ** 2)
        Vn = (sn ** 2 * jnp.ones(shape, jnp.float32) if var_new is None
              else jnp.clip(var_new, 0.0, vcap))
        Vr = (sr ** 2 * jnp.ones(shape, jnp.float32) if var_ref is None
              else jnp.clip(var_ref, 0.0, vcap))
        # one merged back-transform (linearity), sharing a packed
        # inverse with D
        Vn_hat, Vr_hat = _fwd_pair(Vn, Vr)
        D, V_src = _inv_pair(D_hat, kn2_hat * Vn_hat + kr2_hat * Vr_hat)
    else:
        # Σk² Parseval sums cover the (smooth or scalar) background term
        sum_kn2 = _spec_mean(jnp.abs(kn_hat) ** 2)
        sum_kr2 = _spec_mean(jnp.abs(kr_hat) ** 2)
        vbn = sn ** 2 if var_bkg_new is None else var_bkg_new
        vbr = sr ** 2 if var_bkg_ref is None else var_bkg_ref
        if getattr(vbn, "ndim", 0) == 2 and vbn.shape != shape:
            vbn = jnp.pad(vbn, ((0, Hp - H), (0, Wp - W)), mode="edge")
        if getattr(vbr, "ndim", 0) == 2 and vbr.shape != shape:
            vbr = jnp.pad(vbr, ((0, Hp - H), (0, Wp - W)), mode="edge")
        V_src = vbn * sum_kn2 + vbr * sum_kr2
        if var_bkg_new is not None or var_bkg_ref is not None:
            # Poisson source term from the images' own spectra: one
            # merged inverse transform (sharing a packed ifft2 with D),
            # rectified post-convolution
            kn2_hat, kr2_hat = _k2_hats()
            D, src = _inv_pair(D_hat, kn2_hat * N_hat + kr2_hat * R_hat)
            V_src = V_src + jnp.maximum(src, 0.0)
    if D is None:
        D = _inv_one(D_hat)

    # astrometric variance (eq. 30-33): gradients of S_n = k_n ⊗ N,
    # S_r = k_r ⊗ R, scaled by the registration rms.  Real-space
    # centred differences (the reference's np.gradient) cost two
    # inverse FFTs instead of four spectral derivatives.
    Sn, Sr = _inv_pair(kn_hat * N_hat, kr_hat * R_hat)

    # score image S = F_D·(D ⊛ P_D-reversed) (eq. 16-17).  Exact
    # algebra: Ŝ = F_D P̂_D* D̂ = k̂_n N̂ − k̂_r R̂, so S = S_n − S_r
    # and the dedicated inverse FFT of Ŝ is free.
    S = Sn - Sr

    def _grad(img):
        gy = 0.5 * (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0))
        gx = 0.5 * (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1))
        return gy, gx

    dSn_dy, dSn_dx = _grad(Sn)
    dSr_dy, dSr_dx = _grad(Sr)
    V_ast = (p.dx ** 2 * (dSn_dx ** 2 + dSr_dx ** 2)
             + p.dy ** 2 * (dSn_dy ** 2 + dSr_dy ** 2))

    V_S = V_src + V_ast
    Scorr = S / jnp.sqrt(jnp.maximum(V_S, p.eps))

    # PSF-flux translation (eq. 41-42): F_psf = S / F_S.  The sum runs
    # over the FULL spectrum; the rfft half-plane stores interior
    # columns once, so they count twice (DC column, and the Nyquist
    # column for even W, appear exactly once) — colw from above.
    F_S = _spec_mean(fn ** 2 * fr ** 2 * Pn2 * Pr2 / den)
    F_S = jnp.maximum(F_S, p.eps)
    Fpsf = S / F_S
    Fpsferr = jnp.sqrt(jnp.maximum(V_S, p.eps)) / F_S

    def _crop(a):
        return a[:H, :W] if (Hp, Wp) != (H, W) else a

    out = {"D": _crop(D), "S": _crop(S), "Scorr": _crop(Scorr),
           "Fpsf": _crop(Fpsf), "Fpsferr": _crop(Fpsferr),
           "F_D": F_D, "F_S": F_S}
    if want_psf_d:
        # difference PSF stamp for thumbnail/vetting use: small DFT
        # contraction instead of a ~50 ms full-frame inverse FFT
        out["psf_D"] = otf_to_psf_stamp(P_D_hat, shape,
                                        psf_new.shape[-1])
    return out


def flux_ratio(flux_new, flux_ref, snr_new, snr_ref, valid,
               snr_min: float = 20.0):
    """Clipped-median flux ratio fr/fn from matched PSF-star fluxes.

    The reference's ``get_fratio`` (zogy; consumed buildref.py:2782-3014)
    matches PSFEx stars between images and takes a clipped mean of the
    optimal-flux ratios; same statistic here with a median + MAD clip.
    """
    ok = valid & (snr_new > snr_min) & (snr_ref > snr_min) \
        & (flux_new > 0) & (flux_ref > 0)
    r = jnp.where(ok, flux_new / jnp.maximum(flux_ref, 1e-9), jnp.nan)
    med = jnp.nanmedian(r)
    mad = jnp.nanmedian(jnp.abs(r - med)) * 1.4826
    keep = ok & (jnp.abs(r - med) < 3.0 * jnp.maximum(mad, 1e-6))
    r2 = jnp.where(keep, r, jnp.nan)
    fratio = jnp.nanmedian(r2)
    fstd = jnp.nanstd(r2)
    return (jnp.nan_to_num(fratio, nan=1.0),
            jnp.nan_to_num(fstd, nan=0.0), jnp.sum(keep))

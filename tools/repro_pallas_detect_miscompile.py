"""Reproduction harness: Mosaic scoped-VMEM silent miscompile in the
fused detection kernel (:mod:`blackbox_tpu.pallas.detect`).

Observed on a real TPU v5e (jax 0.8.x / Mosaic of 2026-08), full
methodology and numbers in PERF_NOTES.md "session-D kernels":

* every feature of the kernel is BIT-EXACT in isolation (taps only,
  std-threshold only, excl-mask only) at 4096² and 10560²;
* with taps + std + excl enabled TOGETHER the live set crosses
  Mosaic's 16 MB scoped-VMEM stack:
  - at 4096² the compile FAILS with "Ran out of memory in memory
    space vmem ... this should not be possible" (the honest outcome);
  - at 10560² the same program COMPILES and SILENTLY MISCOMPILES:
    336 131 roots against the jnp chain's 3 992 on an identical
    frame — no warning, no error.

Because the failure is a wrong-answer compile near a resource limit
(risk class: silent data corruption), the kernel ships quarantined
behind ``BBTPU_PALLAS_DETECT=1`` (ops/detection.py:129-147) and the
production detection path stays jnp + the Pallas labelprop kernel.
The measured upside of un-quarantining is ~7 ms/frame (69.6 vs
76.7 ms at 10.5k²) — not worth the risk class until the kernel is
restructured to halve peak liveness.

Run me on the target chip to reproduce:

    python tools/repro_pallas_detect_miscompile.py [size]

Prints one line per feature combination: root counts from the Pallas
kernel vs the jnp oracle, plus foreground/label mismatch counts.  A
healthy toolchain prints zeros everywhere; the miscompile shows up in
the final (taps+std+excl) row at size 10560, or as a VMEM compile
error at 4096.
"""

import sys

import jax
import jax.numpy as jnp

from blackbox_tpu.ops import detection as det
from blackbox_tpu.ops.detection import gaussian_taps
from blackbox_tpu.ops.labeling import label_components


def jnp_oracle(im, bstd, excl, taps, use_taps, use_std, use_excl):
    x = im
    if use_taps:
        ka = jnp.asarray(taps, jnp.float32)
        x = det._conv1d(det._conv1d(x, ka, 0), ka, 1)
    thr = 4.0 * jnp.maximum(bstd, 1e-6) if use_std else jnp.float32(4.0)
    d = x > thr
    if use_excl:
        d = d & (excl == 0)
    lab = label_components(d, iters=16, use_pallas=False)
    H, W = im.shape
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) + 1
    n = jnp.sum((d & (lab == idx)).astype(jnp.int32))
    return jnp.where(d, lab, 0), n


def main(size: int = 10560) -> int:
    from blackbox_tpu.pallas.detect import fused_detect_pallas

    print("device:", jax.devices()[0])
    H = W = size
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (H, W), jnp.float32)
    ky, kx = jax.random.split(key)
    yy = jax.random.randint(ky, (500,), 10, H - 10)
    xx = jax.random.randint(kx, (500,), 10, W - 10)
    img = img.at[yy, xx].add(50.0)
    bstd = jnp.ones((H, W), jnp.float32)
    excl = jnp.zeros((H, W), jnp.int8)
    taps = gaussian_taps(3.0)

    bad = 0
    for (use_taps, use_std, use_excl) in [
            (True, False, False), (False, True, False),
            (False, False, True), (True, True, True)]:
        t = taps if use_taps else None
        s = bstd if use_std else None
        e = excl if use_excl else None
        try:
            seg_p, n_p = jax.jit(
                lambda im, t=t, s=s, e=e: fused_detect_pallas(
                    im, s, e, t, 4.0, iters=16))(img)
            n_p = int(n_p)
        except Exception as exc:  # noqa: BLE001 - report compile fails
            print(f"taps={use_taps} std={use_std} excl={use_excl}: "
                  f"COMPILE/RUN ERROR: {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:120]}")
            bad += 1
            continue
        seg_j, n_j = jax.jit(
            lambda im, a=use_taps, b=use_std, c=use_excl:
            jnp_oracle(im, bstd, excl, taps, a, b, c))(img)
        mism = int(jnp.sum((seg_p != 0) != (seg_j != 0)))
        lmism = int(jnp.sum(seg_p != seg_j))
        ok = n_p == int(n_j) and mism == 0 and lmism == 0
        bad += not ok
        print(f"taps={use_taps} std={use_std} excl={use_excl}: "
              f"n_pallas={n_p} n_jnp={int(n_j)} fg-mismatch={mism} "
              f"label-mismatch={lmism} {'OK' if ok else 'MISCOMPILE'}")
    return bad


if __name__ == "__main__":
    sys.exit(1 if main(int(sys.argv[1]) if len(sys.argv) > 1
                       else 10560) else 0)

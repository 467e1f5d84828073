"""Persistent XLA compilation cache, fingerprinted by host CPU.

Two measured facts motivate this (PERF_NOTES.md):

* the TPU compiler's autotuning is deterministic per HLO-module hash
  but varies up to ~35% in executable quality across hashes of the
  same program — a persistent cache pins whichever compile a process
  first lands, making production throughput reproducible and letting a
  good compile survive process restarts;
* a cache written by a *different host CPU* returns corrupted results
  on the CPU backend (not just SIGILL), so the default directory is
  keyed by the /proc/cpuinfo model name.

The reference has no analogue — its native binaries are AOT-compiled
(SExtractor, SWarp, astroscrappy); JIT compilation variance is a
TPU/XLA-specific operational concern.
"""

from __future__ import annotations

import hashlib
import logging

log = logging.getLogger(__name__)


def host_fingerprint() -> str:
    """Short tag identifying the host CPU (cache-compatibility key).

    Hashes the model name AND the feature-flags line: VM hosts expose
    the same model string with differing feature sets, and XLA:CPU AOT
    artifacts compiled for a superset of the current host's features
    load with a SIGILL/corruption warning.
    """
    try:
        import jax
        import jaxlib
        with open("/proc/cpuinfo") as f:
            lines = f.read().splitlines()
        key = [next((ln for ln in lines if ln.startswith(pat)), "")
               for pat in ("model name", "flags")]
        # AOT artifacts also encode XLA-internal pseudo-features
        # (+prefer-no-gather etc.) that vary with the compiler build,
        # not the host — key the cache on the jax/jaxlib versions too
        key += [jax.__version__, jaxlib.__version__]
        return hashlib.sha1("\n".join(key).encode()).hexdigest()[:10]
    except OSError:
        return "nohost"


def _canary_expected() -> int:
    """Integer-exact known answer of the canary program (host numpy)."""
    import numpy as np
    a = (np.arange(256 * 256, dtype=np.int32).reshape(256, 256) % 97)
    b = (np.arange(256 * 256, dtype=np.int32).reshape(256, 256) % 89)
    m = a @ b.T                       # entries <= 96*88*256, no overflow
    # & 0x3FF keeps the 65536-element running sum below 2^31:
    # numpy promotes int32 cumsum to int64 while XLA wraps in
    # int32, so the canary must never overflow
    return int(np.cumsum(m.ravel() & 0x3FF)[-1] % 1000003)


def _canary_ok() -> bool:
    """Run a small jitted integer program THROUGH the cache and compare
    against the exact host answer.  Detects the stale-AOT failure mode
    where XLA:CPU loads an artifact compiled for a different machine
    variant and silently returns corrupted results (observed twice —
    PERF_NOTES.md; the cpuinfo fingerprint did not distinguish the
    hosts because the divergent bits are LLVM tuning features, not CPU
    flags)."""
    import jax
    import jax.numpy as jnp

    def prog(n):
        a = (jnp.arange(256 * 256, dtype=jnp.int32).reshape(256, 256)
             % 97)
        b = (jnp.arange(256 * 256, dtype=jnp.int32).reshape(256, 256)
             % 89)
        m = jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        return jnp.cumsum(m.ravel() & 0x3FF)[-1] % 1000003 + n * 0

    got = int(jax.jit(prog)(jnp.int32(0)))
    return got == _canary_expected()


def enable_persistent_cache(path=None) -> str | None:
    """Point JAX at a persistent compilation cache directory.

    path : True/None -> auto (/tmp, host-fingerprinted); str -> use as
        given; False -> do nothing.
    Returns the directory in effect, or None when disabled/failed.

    On the CPU backend a known-answer canary is compiled through the
    cache; a wrong answer means the directory holds artifacts from an
    incompatible host variant, and the whole directory is wiped and
    re-created (a fresh compile beats silently corrupt science).
    """
    if path is False:
        return None
    try:
        import jax
        if path is None or path is True:
            # auto mode defers to an already-configured cache (e.g. the
            # test suite's conftest dir)
            cur = getattr(jax.config, "jax_compilation_cache_dir", None)
            if cur:
                return str(cur)
            path = f"/tmp/jax_cache_blackbox_tpu_{host_fingerprint()}"
        jax.config.update("jax_compilation_cache_dir", str(path))
        # the canary must itself be served from the cache to prove the
        # cache's artifacts run correctly on this host: drop the
        # persistence threshold for its compile only
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0)
        try:
            if jax.default_backend() == "cpu" and not _canary_ok():
                import os
                import shutil
                log.error("compile-cache canary FAILED: wiping stale "
                          "cache directory %s (artifacts from an "
                          "incompatible host variant)", path)
                shutil.rmtree(str(path), ignore_errors=True)
                os.makedirs(str(path), exist_ok=True)
                jax.clear_caches()
                if not _canary_ok():  # genuine miscompile, not cache
                    log.error("canary still failing on a fresh cache — "
                              "disabling the persistent cache")
                    jax.config.update("jax_compilation_cache_dir", None)
                    return None
        finally:
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 10)
        return str(path)
    except Exception:
        log.exception("could not enable the persistent compile cache")
        return None

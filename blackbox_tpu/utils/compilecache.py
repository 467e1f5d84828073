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
        with open("/proc/cpuinfo") as f:
            lines = f.read().splitlines()
        key = [next((ln for ln in lines if ln.startswith(pat)), "")
               for pat in ("model name", "flags")]
        return hashlib.sha1("\n".join(key).encode()).hexdigest()[:10]
    except OSError:
        return "nohost"


def enable_persistent_cache(path=None) -> str | None:
    """Point JAX at a persistent compilation cache directory.

    path : True/None -> auto (/tmp, host-fingerprinted); str -> use as
        given; False -> do nothing.
    Returns the directory in effect, or None when disabled/failed.
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
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          10)
        return str(path)
    except Exception:
        log.exception("could not enable the persistent compile cache")
        return None

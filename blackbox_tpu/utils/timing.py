"""Opt-in wall-time + memory tracing (SURVEY.md §5.1).

The reference brackets nearly every function with ``log_timing_memory``
wall/RSS lines and ``mem_use`` RSS snapshots behind ``set_zogy.timing``
(reference blackbox.py:201-202, 4638, 5243-5245).  Same label-based log
format here, plus device-side equivalents: HBM stats from the backend
and a ``jax.profiler`` trace context for deep dives.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

log = logging.getLogger("blackbox_tpu")

# master switch (reference: set_zogy.timing); env override for ops
TIMING = os.environ.get("BLACKBOX_TPU_TIMING", "0") not in ("0", "",
                                                            "false")


def _rss_gb() -> float:
    try:
        with open("/proc/self/statm") as fh:
            pages = int(fh.read().split()[1])
        return pages * os.sysconf("SC_PAGE_SIZE") / 1024 ** 3
    except Exception:
        return float("nan")


def mem_use(label: str = "") -> float:
    """RSS snapshot in GB, logged with the label (reference mem_use)."""
    gb = _rss_gb()
    if TIMING:
        log.info("memory use [GB]: rss=%.3f in %s", gb, label)
    return gb


def log_timing_memory(t0: float, label: str = "") -> float:
    """Wall time since t0 + RSS, reference log format
    ('wall-time spent in ...')."""
    dt = time.time() - t0
    if TIMING:
        log.info("wall-time spent in %s: %.3f s; rss=%.3f GB",
                 label, dt, _rss_gb())
    return dt


def device_memory_stats(device=None) -> dict:
    """Live HBM usage of a jax device (empty dict if unsupported)."""
    try:
        import jax
        d = device or jax.devices()[0]
        stats = d.memory_stats() or {}
        return {k: stats[k] for k in ("bytes_in_use", "peak_bytes_in_use",
                                      "bytes_limit") if k in stats}
    except Exception:
        return {}


@contextlib.contextmanager
def timer(label: str, sync=None):
    """Context timer: ``with timer('overscan', sync=arr): ...``

    ``sync`` — optional array/pytree blocked on before stopping the
    clock (device work is async; without a sync the timer measures
    dispatch only).
    """
    t0 = time.time()
    try:
        yield
    finally:
        if sync is not None:
            try:
                import jax
                jax.block_until_ready(sync)
            except Exception:
                pass
        log_timing_memory(t0, label)


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace context (TensorBoard-compatible output)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

"""utils/: tracing, advisory locks, device watchdog, multihost helpers."""

import logging
import os
import threading
import time

import pytest

from blackbox_tpu.utils import timing as T
from blackbox_tpu.utils.locks import LockTimeout, advisory_lock
from blackbox_tpu.utils.watchdog import DeviceHang, run_with_watchdog
from blackbox_tpu.parallel.distributed import _first_host, init_multihost


def test_timing_logs(caplog):
    old = T.TIMING
    T.TIMING = True
    try:
        with caplog.at_level(logging.INFO, logger="blackbox_tpu"):
            t0 = time.time()
            dt = T.log_timing_memory(t0, "unit-test-step")
            gb = T.mem_use("unit-test-mem")
        assert dt >= 0 and gb > 0
        msgs = [r.message for r in caplog.records]
        assert any("wall-time spent in unit-test-step" in m for m in msgs)
        assert any("unit-test-mem" in m for m in msgs)
    finally:
        T.TIMING = old


def test_timer_context():
    with T.timer("block"):
        x = sum(range(1000))
    assert x == 499500


def test_advisory_lock_excludes(tmp_path):
    path = str(tmp_path / "master_bias.fits")
    order = []

    def worker():
        with advisory_lock(path, timeout=10):
            order.append("b-in")
            order.append("b-out")

    with advisory_lock(path, timeout=10):
        order.append("a-in")
        t = threading.Thread(target=worker)
        t.start()
        time.sleep(0.6)             # b must be blocked while a holds it
        assert order == ["a-in"]
        order.append("a-out")
    t.join(5)
    assert order == ["a-in", "a-out", "b-in", "b-out"]
    assert os.path.exists(path + ".lock")


def test_advisory_lock_timeout(tmp_path):
    path = str(tmp_path / "x.fits")
    with advisory_lock(path, timeout=10):
        # a second, independent fd in another thread must time out
        err = []

        def worker():
            try:
                with advisory_lock(path, timeout=0.4, poll=0.1):
                    err.append("acquired")
            except LockTimeout:
                err.append("timeout")

        t = threading.Thread(target=worker)
        t.start()
        t.join(5)
        assert err == ["timeout"]


def test_watchdog_pass_and_hang():
    assert run_with_watchdog(lambda a: a + 1, 41, timeout_s=5) == 42
    t0 = time.monotonic()
    with pytest.raises(DeviceHang):
        run_with_watchdog(time.sleep, 3.0, timeout_s=0.3, label="sleepy")
    # the timeout path must return promptly, NOT join the hung worker
    # (shutdown(wait=True) would block the full 3 s sleep)
    assert time.monotonic() - t0 < 2.0


def test_first_host():
    assert _first_host("node01") == "node01"
    assert _first_host("n[01-03]") == "n01"
    assert _first_host("gpu[7,9-12],cpu01") == "gpu7"
    assert _first_host("a01,a02") == "a01"


def test_init_multihost_single_noop(monkeypatch):
    monkeypatch.delenv("SLURM_NTASKS", raising=False)
    assert init_multihost() is False


def test_compile_cache_knob():
    """compile_cache settings knob: auto defers to an existing dir,
    explicit path overrides, False disables."""
    import jax
    from blackbox_tpu.utils.compilecache import enable_persistent_cache

    before = getattr(jax.config, "jax_compilation_cache_dir", None)
    try:
        assert enable_persistent_cache(False) is None
        # conftest configured a cache dir -> auto keeps it
        got = enable_persistent_cache(True)
        assert got == before and before is not None
        # explicit path overrides
        got = enable_persistent_cache("/tmp/jax_cache_bbt_test_knob")
        assert got == "/tmp/jax_cache_bbt_test_knob"
        assert jax.config.jax_compilation_cache_dir == got
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


@pytest.mark.slow
def test_compile_cache_canary(tmp_path, monkeypatch):
    """The known-answer canary passes on a healthy cache, and a
    mismatching answer wipes the directory instead of serving stale
    artifacts (the silent-corruption mode documented in PERF_NOTES)."""
    import jax
    from blackbox_tpu.utils import compilecache as cc

    d = tmp_path / "cache"
    d.mkdir()
    (d / "stale.bin").write_bytes(b"x")
    prev = getattr(jax.config, "jax_compilation_cache_dir", None)
    try:
        out = cc.enable_persistent_cache(str(d))
        assert out == str(d)
        assert (d / "stale.bin").exists()       # healthy: untouched

        # poison the expected answer -> canary "fails" -> dir wiped;
        # the fresh-cache retry also fails -> cache disabled
        monkeypatch.setattr(cc, "_canary_expected", lambda: -1)
        out = cc.enable_persistent_cache(str(d))
        assert out is None
        assert not (d / "stale.bin").exists()
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)

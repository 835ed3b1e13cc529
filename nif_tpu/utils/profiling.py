"""Tracing / profiling / debugging utilities.

The reference has no in-library profiling; users attach a Keras TensorBoard
callback (reference README.md:78-81). TPU-native equivalents:

* ``trace(logdir)``       — context manager around ``jax.profiler.trace``;
  open the result in TensorBoard's profile plugin or Perfetto.
* ``StepTimer``           — steady-state step timing that cannot be fooled
  by async dispatch: chains a scalar readback.
* ``enable_nan_checks()`` — flips ``jax_debug_nans`` so the first NaN
  raises with a traceback into the offending op (the "race detector"
  equivalent for pure-functional numerics, SURVEY.md section 5).
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["trace", "StepTimer", "enable_nan_checks", "disable_nan_checks"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace('./tb-logs'): run_steps()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks() -> None:
    jax.config.update("jax_debug_nans", True)


def disable_nan_checks() -> None:
    jax.config.update("jax_debug_nans", False)


class StepTimer:
    """Wall-clock step timing with a device sync per window.

    Async dispatch (and RPC-tunneled backends) make naive per-step timing
    meaningless; this timer syncs by reading back a scalar from the last
    step of each window.

    Usage::

        timer = StepTimer(window=50)
        for batch in data:
            state, loss = step(state, batch)
            stats = timer.tick(loss)     # None except at window edges
            if stats:
                print(f"{stats['steps_per_sec']:.1f} steps/s")
    """

    def __init__(self, window: int = 50):
        self.window = window
        self._count = 0
        self._t0: Optional[float] = None

    def tick(self, sync_value) -> Optional[dict]:
        self._count += 1
        if self._t0 is None:
            # Sync before starting the window so compile time is excluded.
            jax.block_until_ready(sync_value)
            float(jax.device_get(jax.numpy.ravel(sync_value)[0]))
            self._t0 = time.perf_counter()
            self._count = 0
            return None
        if self._count < self.window:
            return None
        float(jax.device_get(jax.numpy.ravel(sync_value)[0]))
        dt = time.perf_counter() - self._t0
        stats = {
            "steps_per_sec": self._count / dt,
            "sec_per_step": dt / self._count,
            "window": self._count,
        }
        self._t0 = time.perf_counter()
        self._count = 0
        return stats

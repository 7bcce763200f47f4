"""Profiling / tracing utilities.

The reference's only instrumentation is a pair of hand-rolled
data_time/batch_time meters (trainer.py:212-230, SURVEY.md SS5); here the
equivalents are the Trainer's meters + audio-seconds/s counters, plus real
`jax.profiler` traces viewable in XProf/TensorBoard.

Enable for a training run with env FCSE_PROFILE_DIR=/path (traces steps
[FCSE_PROFILE_START, FCSE_PROFILE_START+FCSE_PROFILE_STEPS), defaults
10..15, skipping compile warmup), or use `trace()` directly.
"""

from __future__ import annotations

import contextlib
import logging
import os
from typing import Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str):
    """Context manager: profile everything inside to `log_dir`."""
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield
    logger.info("wrote profiler trace to %s", log_dir)


class StepProfiler:
    """Traces a window of train steps based on FCSE_PROFILE_* env vars."""

    def __init__(self):
        self.dir: Optional[str] = os.environ.get("FCSE_PROFILE_DIR")
        self.start = int(os.environ.get("FCSE_PROFILE_START", "10"))
        self.steps = int(os.environ.get("FCSE_PROFILE_STEPS", "5"))
        self._active = False
        self._done = False

    def step(self, global_step: int) -> None:
        """Call once per train step with the global step index."""
        if self.dir is None or self._done:
            return
        if not self._active and global_step >= self.start:
            os.makedirs(self.dir, exist_ok=True)
            jax.profiler.start_trace(self.dir)
            self._active = True
            logger.info("profiler trace started at step %d", global_step)
        elif self._active and global_step >= self.start + self.steps:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            logger.info("profiler trace written to %s", self.dir)

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

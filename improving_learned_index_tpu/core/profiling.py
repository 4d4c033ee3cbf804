"""Tracing / profiling hooks.

Reference capability (SURVEY.md §5): torch.profiler -> TensorBoard with a
wait/warmup/active schedule (src/llama2/finetune/finetune.py:84-96) plus
passages/s throughput logging (src/deep_impact/index.py:37).  TPU
equivalents: ``jax.profiler`` traces viewable in TensorBoard/XProf, and a
ThroughputMeter for per-stage docs/s / queries/s counters.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Iterator, Optional, Union

from .logging import get_logger

logger = get_logger("profiling", stream=False)


@contextlib.contextmanager
def trace(log_dir: Union[str, Path], enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed block.

    View with TensorBoard: ``tensorboard --logdir <log_dir>``.
    """
    if not enabled:
        yield
        return
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {log_dir}")


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class ScheduledTracer:
    """wait/warmup/active/repeat stepping (the reference's torch.profiler
    schedule, finetune.py:87-90): call ``step()`` once per training step."""

    def __init__(
        self,
        log_dir: Union[str, Path],
        wait: int = 1,
        warmup: int = 1,
        active: int = 2,
        repeat: int = 1,
        enabled: bool = True,
    ):
        self.log_dir = str(log_dir)
        self.wait, self.warmup, self.active, self.repeat = wait, warmup, active, repeat
        self.enabled = enabled
        self._step = 0
        self._tracing = False
        self._cycles = 0

    def step(self) -> None:
        if not self.enabled or self._cycles >= self.repeat:
            return
        cycle_len = self.wait + self.warmup + self.active
        pos = self._step % cycle_len
        if pos == self.wait + self.warmup and not self._tracing:
            import jax

            Path(self.log_dir).mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._tracing = True
        elif pos == 0 and self._tracing:
            import jax

            jax.profiler.stop_trace()
            self._tracing = False
            self._cycles += 1
        self._step += 1

    def close(self) -> None:
        if self._tracing:
            import jax

            jax.profiler.stop_trace()
            self._tracing = False


class ThroughputMeter:
    """Rolling items/s counter (reference passages/s logging, index.py:37)."""

    def __init__(self, name: str = "items"):
        self.name = name
        self.start = time.time()
        self.count = 0

    def update(self, n: int) -> None:
        self.count += n

    @property
    def rate(self) -> float:
        elapsed = time.time() - self.start
        return self.count / elapsed if elapsed > 0 else 0.0

    def log(self) -> str:
        msg = f"{self.count} {self.name} [{self.rate:.2f} {self.name}/s]"
        logger.info(msg)
        return msg

"""Profiling & MFU accounting.

The reference's only tracing is a ``@profile`` decorator and wall-clock
prints (SURVEY.md §5.1). Here: a ``jax.profiler`` trace context for real
device timelines, a cost-analysis-based FLOPs counter for any jitted
function, and an MFU meter for the train loop (MFU is a north-star metric;
BASELINE.md).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax

# Peak dense matmul throughput per chip, bf16, FLOP/s.
PEAK_FLOPS = {
    "tpu v5 lite": 197e12,  # v5e: 197 TFLOP/s bf16 (394 is the int8 number)
    "tpu v4": 275e12,
    "tpu v6 lite": 918e12,  # v6e/trillium
    "cpu": 1e11,  # nominal, for smoke runs
}


def device_peak_flops() -> float:
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "cpu").lower()
    for key, val in PEAK_FLOPS.items():
        if key in kind:
            return val
    return PEAK_FLOPS["cpu"]


def estimate_flops(jitted_fn, *args, **kwargs) -> float:
    """XLA cost-analysis FLOPs for one invocation of a jitted function."""
    lowered = jitted_fn.lower(*args, **kwargs)
    try:
        analysis = lowered.compile().cost_analysis()
        if analysis:
            return float(analysis.get("flops", 0.0))
    except Exception:  # pragma: no cover - backend-dependent
        pass
    return 0.0


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/soccerdiffusion_tpu_trace"):
    """jax.profiler trace context; view with tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class MFUMeter:
    """Tracks achieved model FLOPs utilization across steps."""

    flops_per_step: float
    num_devices: int = 1
    peak_flops: float = field(default_factory=device_peak_flops)
    _steps: int = 0
    _elapsed: float = 0.0
    _t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, steps: int = 1) -> None:
        assert self._t0 is not None, "call start() first"
        self._elapsed += time.perf_counter() - self._t0
        self._steps += steps
        self._t0 = None

    def cancel(self) -> None:
        """Discard an open start() window without recording it."""
        self._t0 = None

    @property
    def mfu(self) -> float:
        if self._elapsed == 0:
            return 0.0
        achieved = self.flops_per_step * self._steps / self._elapsed
        return achieved / (self.peak_flops * self.num_devices)

    @property
    def steps_per_sec(self) -> float:
        return self._steps / self._elapsed if self._elapsed else 0.0

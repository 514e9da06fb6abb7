"""Profiling/MFU accounting utilities (utils/profiling.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from soccerdiffusion_tpu.utils.profiling import (
    MFUMeter,
    device_peak_flops,
    estimate_flops,
)


class TestProfiling:
    def test_device_peak_flops_positive(self):
        assert device_peak_flops() > 0

    def test_estimate_flops_matmul(self):
        """A (256, 256) @ (256, 256) matmul is 2*256^3 = 33.6 MFLOP; the
        cost-analysis estimate must be within 2x (backends count fused
        elementwise differently, but the dot dominates)."""
        a = jnp.ones((256, 256), jnp.float32)
        f = jax.jit(lambda x: x @ x)
        flops = estimate_flops(f, a)
        expected = 2 * 256**3
        assert expected / 2 <= flops <= expected * 2, flops

    def test_mfu_meter_accounts_steps(self):
        import time

        meter = MFUMeter(flops_per_step=1e5)
        meter.start()
        time.sleep(0.01)
        meter.stop(steps=4)
        assert meter.steps_per_sec > 0
        # 4e5 FLOP over >=10 ms against any real peak is well under 1.0
        assert 0 <= meter.mfu < 1.0


class TestTraceAggregation:
    """Parser for jax.profiler Chrome traces (benchmarks/profile_train_step)."""

    def make_trace(self):
        return {"traceEvents": [
            {"ph": "M", "name": "process_name", "pid": 3,
             "args": {"name": "/device:TPU:0"}},
            {"ph": "M", "name": "thread_name", "pid": 3, "tid": 3,
             "args": {"name": "XLA Ops"}},
            {"ph": "M", "name": "thread_name", "pid": 3, "tid": 2,
             "args": {"name": "XLA Modules"}},
            {"ph": "M", "name": "process_name", "pid": 701,
             "args": {"name": "/host:CPU"}},
            {"ph": "M", "name": "thread_name", "pid": 701, "tid": 9,
             "args": {"name": "XLA Ops"}},
            # device op events (counted)
            {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.1", "dur": 10.0},
            {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.1", "dur": 5.0},
            {"ph": "X", "pid": 3, "tid": 3, "name": "copy.2", "dur": 7.5},
            # module-level span on the device (NOT counted: wrong thread)
            {"ph": "X", "pid": 3, "tid": 2, "name": "jit_step", "dur": 99.0},
            # host-side "XLA Ops" thread (NOT counted: host pid)
            {"ph": "X", "pid": 701, "tid": 9, "name": "hostop", "dur": 50.0},
        ]}

    def test_aggregates_device_ops_only(self):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))))
        from benchmarks.profile_train_step import aggregate_device_ops

        agg, total = aggregate_device_ops(self.make_trace())
        assert agg == {"fusion.1": 15.0, "copy.2": 7.5}
        assert total == 22.5

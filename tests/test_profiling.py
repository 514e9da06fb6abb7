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

"""Keep the driver entry points green: single-chip trace and the full
multichip dryrun on the 8-device CPU mesh."""

import jax

import __graft_entry__ as graft


class TestGraftEntry:
    def test_dryrun_multichip_8(self):
        graft.dryrun_multichip(8)

    def test_dryrun_multichip_2(self):
        # odd little meshes must also work (pure DP fallback)
        graft.dryrun_multichip(2)

    def test_entry_traces(self):
        fn, args = graft.entry()
        out = jax.eval_shape(fn, *args)
        assert out.shape == (2, 10, 20)

    def test_dryrun_dcn_8(self):
        graft.dryrun_dcn(8)

    def test_dryrun_serving_8(self):
        graft.dryrun_serving(8)

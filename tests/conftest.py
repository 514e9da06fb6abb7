"""Test harness configuration.

Tests run hermetically on CPU with 8 virtual XLA devices so that multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4). These env
vars must be set before JAX is imported anywhere in the test process.
"""

import os

# Force-override: the outer environment pins JAX_PLATFORMS to the TPU plugin
# (and the plugin re-asserts "axon,cpu" over the env var at import time),
# which would run tests on hardware with bf16 default matmul precision and
# break float32 parity tolerances. XLA_FLAGS must be in the env before the
# first backend initialization; the platform choice must be applied through
# jax.config, which wins over the plugin's override.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# The ring/mesh tests run 8-device collectives on however few host cores
# this box has; under load the cross-device rendezvous can exceed XLA:CPU's
# default collective timeout and hard-abort the process ("Fatal Python
# error: Aborted" materializing the result). Raise it — slow is fine,
# aborting the suite is not.
if "xla_cpu_collective_timeout_seconds" not in _flags:
    _flags += " --xla_cpu_collective_timeout_seconds=1200"
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# --------------------------------------------------------------- test tiers
#
# The default run excludes `-m slow` (pyproject addopts) to keep push/PR
# feedback fast (VERDICT r3 weak #6: the suite had crept to ~30-42 min);
# the CI nightly lane runs everything with `-m ""`. Centralized here (one
# list, measured from `--durations`) instead of scattered decorators so
# re-tiering after a durations run is a one-file change. Every subsystem
# keeps at least one fast test in the default tier.
SLOW_MODULES = {
    "test_graft_entry",   # driver + CI compile-check the entries directly
    "test_multihost",     # two-process distributed init (~110 s)
    "test_swin_port",     # torch Swin-T port parity (~36 s)
    "test_e2e_fixture",   # fixture import stays default; train/report marked
    "test_examples",      # preliminary-tier example scripts (~40-90 s each)
}
SLOW_TESTS = {
    # (module, substring of test id)
    ("test_distill", "test_cli_guidance_records_provenance"),
    ("test_fused_decoder_layer", "test_policy_forward_and_grads_match"),
    ("test_fused_decoder_layer", "test_grads_match_autodiff"),
    ("test_fused_vit_block", "test_policy_wiring_param_compat_and_grad"),
    ("test_fused_vit_block", "test_proprio_encoder_wiring_parity"),
    ("test_fused_vit_block", "test_bf16_grads_close_to_quick"),
    ("test_fused_vit_block", "test_grad_accumulates_across_grid"),
    ("test_fused_vit_block", "test_grads_match_autodiff"),
    ("test_packed", "test_train_step_on_packed_image_batch"),
    ("test_vision", "test_swin_tiny_forward"),
    ("test_vision", "test_matches_full_and_none"),
    ("test_fused_chunk", "test_block_sizes_agree"),
    ("test_fused_chunk", "test_full_chunk_matches_xla_sampler"),
    ("test_fused_chunk", "test_eight_head_parity"),
    ("test_fused_chunk", "test_grouped_blockdiag_matches_xla"),
    ("test_import_torch_checkpoint", "test_apply_pretrained_backbone"),
    ("test_ring_attention", "test_train_step_under_ring_mesh"),
    ("test_inference", "TestShardedFusedServing"),
    ("test_inference", "test_rollout_with_images_updates_buffers"),
    ("test_inference", "test_cached_token_rollout_matches_raw_frames"),
    ("test_inference", "test_chunk_fused_rollout_matches_xla_rollout"),
    ("test_evaluation", "test_report_round_trip"),
    ("test_evaluation", "TestPosteriorMeanReport"),
    ("test_vision_task", "test_image_sensitivity_probe_runs"),
    ("test_distill", "test_mean_target_differs_and_trains"),
    ("test_distill", "test_composes_with_guidance"),
    # round-5 re-tier (clean --durations run, 2026-08-20): the >=22 s
    # tail of the default tier; every module keeps faster default
    # representatives of the same subsystem
    ("test_vision_task", "test_sensitivity_variants_match_separate_calls"),
    ("test_vision_task", "test_aux_cue_head_trains_and_shares_encoder"),
    ("test_inference", "test_closed_loop_cached_image_tokens"),
    ("test_inference", "test_guided_sampler_w0_equals_nulled_batch"),
    ("test_fused_denoise", "test_batch_block_sizes"),
    ("test_fused_denoise", "test_eight_head_h512_parity"),
    ("test_fused_encoder", "test_parity_default_family_bf16"),
    ("test_fused_encoder", "test_rollout_with_fused_encoder_matches_xla_rollout"),
    ("test_fused_encoder", "test_guided_rollout_with_fused_encoder_matches_xla"),
    ("test_fused_encoder_stack", "test_policy_encoder_fused_stack_matches"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        module = item.module.__name__ if item.module else ""
        if module == "test_e2e_fixture":
            continue  # marks its own slow test; import tier stays default
        if module in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
            continue
        for mod, frag in SLOW_TESTS:
            if module == mod and frag in item.nodeid:
                item.add_marker(pytest.mark.slow)
                break

#!/bin/bash
# Decompose the flagship step's flat "depth-0 remainder" (~25.7 ms wall /
# ~21 ms device; docs/perf_notes.md round 3) into module costs by ablation,
# on the real chip. One tunnel client at a time: lanes run SEQUENTIALLY.
#
#   nohup bash benchmarks/mfu_remainder_ablate.sh > /tmp/mfu_remainder.log 2>&1 &
#
# All lanes are vit_depth=0 (no ViT stack) at B=256 with pre-patchified
# uint8 inputs, so deltas attribute the remainder RTT-free:
#   r0    full remainder (baseline)
#   rdec  num_decoder_layers=0           -> r0-rdec   = denoiser stack
#   rprop proprio+gamestate encoders off -> r0-rprop  = proprio encoders
#                                           + the decoder's cross-attention
#                                           shrink (S 311 -> ~11)
#   rskel both off                       -> rdec-rskel = proprio alone
#                                           (no decoder to confound)
#   rimg  use_images off                 -> r0-rimg   = patch embed + posenc
#                                           + pool + seq encoder + u8 copies
cd "$(dirname "$0")/.." || exit 1
export MFU_ONLY=none MFU_ABLATE=depth0 MFU_BATCH=256

run_lane() {
  echo "=== lane $1: $2"
  MFU_OVERRIDES="$2" timeout 1200 python benchmarks/train_mfu.py
}

run_lane r0 '{}'
run_lane rdec '{"num_decoder_layers": 0}'
run_lane rprop '{"use_action_history": false, "use_imu": false, "use_joint_states": false, "use_gamestate": false}'
run_lane rskel '{"num_decoder_layers": 0, "use_action_history": false, "use_imu": false, "use_joint_states": false, "use_gamestate": false}'
run_lane rimg '{"use_images": false}'
echo "=== remainder ablation done"

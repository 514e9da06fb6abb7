#!/bin/bash
# Round-3 second-half MFU ladder: sequential lanes on the ONE tunnel TPU
# client (CLAUDE.md: never overlap TPU processes). Each lane is one
# train_mfu.py invocation of the fused vit_flagship step with a knob
# override; results append as JSON lines to the log.
#
#   nohup bash benchmarks/mfu_ladder_r3b.sh > /tmp/mfu_ladder.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

run() {
  name="$1"; shift
  echo "### lane $name: $*" >&2
  MFU_ONLY=vit_flagship_fused MFU_FUSED_FRAMES=16 "$@" \
    timeout 2400 python benchmarks/train_mfu.py \
    | sed "s/vit_flagship_fused_f16/${name}/"
}

# A: re-anchor the current default (patch 32, T=49, concat stack/merge)
run baseline_p32 env
# B: aligned geometry — patch 28 -> T=64: rank-4 stack/merge paths + free
#    (FT, W) reshapes; +31% stack FLOPs (more tokens)
run p28_aligned env MFU_OVERRIDES='{"vit_patch_size": 28}'
# C: proprio encoders through fused Pallas blocks
run enc_fused env MFU_OVERRIDES='{"encoder_fused_block": true}'
# D: denoising decoder remat (drop stored cross K/V from the stream)
run dec_remat env MFU_OVERRIDES='{"remat_decoder": true}'
# E: everything combined
run combined env MFU_OVERRIDES='{"vit_patch_size": 28, "encoder_fused_block": true, "remat_decoder": true}'
echo '{"ladder": "done"}'

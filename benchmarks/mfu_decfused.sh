#!/bin/bash
# Measure the fused decoder-layer kernel (decoder_fused_block) and the
# flat-buffer AdamW (flat_optimizer) on the chip, against the round-3
# remainder ablation (benchmarks/mfu_remainder_ablate.sh: depth-0
# remainder 25.1 ms). Lanes run SEQUENTIALLY (one tunnel client).
#
#   nohup bash benchmarks/mfu_decfused.sh > /tmp/mfu_decfused.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1
export MFU_BATCH=256

lane() {
  echo "=== lane $1: $2 ($3)"
  MFU_ONLY="$3" MFU_ABLATE="$4" MFU_OVERRIDES="$2" timeout 2400 python benchmarks/train_mfu.py
}

# depth-0 remainder lanes (MFU_ONLY=none + ABLATE)
lane d0_decfused '{"decoder_fused_block": true}' none depth0
lane d0_flat '{"flat_optimizer": true}' none depth0
lane d0_both '{"decoder_fused_block": true, "flat_optimizer": true}' none depth0
# full flagship step with both
lane full_both '{"decoder_fused_block": true, "flat_optimizer": true}' vit_flagship_fused ""
echo "=== decfused ladder done"

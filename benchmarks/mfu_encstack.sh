#!/bin/bash
# Measure the fused whole-stack proprio-encoder kernel (encoder_fused_stack)
# on the chip. Sequential lanes (one tunnel client).
#   nohup bash benchmarks/mfu_encstack.sh > /tmp/mfu_encstack.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1
export MFU_BATCH=256

lane() {
  echo "=== lane $1: $2 ($3)"
  MFU_ONLY="$3" MFU_ABLATE="$4" MFU_OVERRIDES="$2" timeout 2400 python benchmarks/train_mfu.py
}

lane d0_encstack '{"encoder_fused_stack": true}' none depth0
lane full_encstack '{"encoder_fused_stack": true}' vit_flagship_fused ""
lane full_encdec '{"encoder_fused_stack": true, "decoder_fused_block": true}' vit_flagship_fused ""
echo "=== encstack ladder done"

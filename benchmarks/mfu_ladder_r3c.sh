#!/bin/bash
# Round-3 third MFU ladder: push the patch-28 aligned geometry (now the
# flagship default, 43.9% MFU at frames=16/B=256) past the 45% target.
# Sequential lanes, ONE tunnel client (CLAUDE.md).
#
#   nohup bash benchmarks/mfu_ladder_r3c.sh > /tmp/mfu_ladder_c.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

run() {
  name="$1"; shift
  echo "### lane $name: $*" >&2
  MFU_ONLY=vit_flagship_fused "$@" \
    timeout 2400 python benchmarks/train_mfu.py \
    | sed "s/vit_flagship_fused_f[0-9]*/${name}/"
}

# A: frames=32 — halve fused-program count per step
run p28_f32 env MFU_FUSED_FRAMES=32
# B: frames=8 — doubled program count (bracket the optimum)
run p28_f8 env MFU_FUSED_FRAMES=8
# C: B=512 at frames=16 — amortize the flat per-step remainder
run p28_b512 env MFU_FUSED_FRAMES=16 MFU_BATCH=512,256
# D: depth-0 remainder at patch 28 (attribution for the ladder)
MFU_ONLY=none MFU_ABLATE=depth0 timeout 2400 python benchmarks/train_mfu.py
echo '{"ladder": "done"}'

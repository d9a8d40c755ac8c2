#!/bin/bash
# Round-4 hardware queue, stage 1 (fresh chain — round-3's chain is done):
#   1. flagship bench.py under the NEW stall guard (BENCH_r04 dress
#      rehearsal — the round-3 official number was a tunnel-stall artifact)
#   2. flagship latency row
#   3. EsViT window-attention floor probe (kernel vs XLA vs pure dots,
#      per stage) — re-derives the r3 bound from measurements
#   4. K=100 MDN-ResNet on ONE chip via the new K-chunked capacity path
#      (B=32, fallback B=8) — the reference's headline GMM config
#   5. EfficientNet-B4 transcendental A/B (stock SiLU vs hard-swish gate)
#   6. serving-path hardware numbers (score-CLI wave + AOT bundle)
# Axon rules per CLAUDE.md: ONE TPU process at a time, natural exits only,
# internal timeouts, never edit this file while it runs.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*"; }

log "=== 1. flagship bench (stall guard) ==="
timeout 3000 python bench.py 2>/dev/null | tee /tmp/r4_flagship.json

log "=== 2. flagship latency ==="
timeout 3000 python bench.py --latency 2>/dev/null | tee /tmp/r4_latency.json

log "=== 3. esvit floor probe ==="
timeout 3000 python tools/bench_esvit_floor.py 2>&1 | tail -20

log "=== 4. K=100 mdn_resnet chunked, B=32 ==="
if ! timeout 3000 python tools/probe_epoch.py --which mdn_resnet \
      --gaussians 100 --batch 32 --epochs 4 --n-train 64 \
      > /tmp/r4_k100_b32.json 2>/tmp/r4_k100_b32.err; then
  log "B=32 failed (see /tmp/r4_k100_b32.err tail below); retrying B=8"
  tail -5 /tmp/r4_k100_b32.err
  timeout 3000 python tools/probe_epoch.py --which mdn_resnet \
      --gaussians 100 --batch 8 --epochs 4 --n-train 32 \
      > /tmp/r4_k100_b8.json 2>/tmp/r4_k100_b8.err || tail -5 /tmp/r4_k100_b8.err
fi
tail -4 /tmp/r4_k100_b32.json 2>/dev/null; tail -4 /tmp/r4_k100_b8.json 2>/dev/null

log "=== 5. effnet transcendental A/B ==="
timeout 1500 python bench.py --backbone enc_eff_net 2>/dev/null | tee /tmp/r4_effnet_stock.json
VITAD_EFFNET_HARDSWISH=1 timeout 1500 python bench.py --backbone enc_eff_net 2>/dev/null | tee /tmp/r4_effnet_hardswish.json

log "=== 6. serving hardware bench ==="
timeout 3000 python tools/bench_serving.py 2>&1 | tail -15

log "queue15 done"

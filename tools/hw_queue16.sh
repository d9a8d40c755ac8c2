#!/bin/bash
# Round-4 hardware queue, stage 2 — waits for queue15's natural exit
# (marker line in its log), then:
#   1. K=100 MDN-ResNet on ONE chip (bf16-cotangent fix in) — B=32 then B=8
#   2. EsViT attention floor, slope protocol (dispatch overhead cancels)
#   3. EsViT e2e A/Bs: stock vs XLA-routed stage-3 (VITAD_SWIN_XLA_MAX_N=49)
#      vs forced W_BLK 8/4
# Axon rules per CLAUDE.md. Never edit while running.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*"; }

log "waiting for queue15 marker"
while ! grep -q "queue15 done" /tmp/r4_queue15.log 2>/dev/null; do sleep 60; done
log "queue15 done — starting"

log "=== 1. K=100 mdn_resnet chunked, B=32 ==="
if ! timeout 4800 python tools/probe_epoch.py --which mdn_resnet \
      --gaussians 100 --batch 32 --epochs 4 --n-train 64 \
      > /tmp/r4_k100_b32.json 2>/tmp/r4_k100_b32.err; then
  log "B=32 failed; tail:"; tail -5 /tmp/r4_k100_b32.err
  log "retrying B=8"
  timeout 4800 python tools/probe_epoch.py --which mdn_resnet \
      --gaussians 100 --batch 8 --epochs 4 --n-train 32 \
      > /tmp/r4_k100_b8.json 2>/tmp/r4_k100_b8.err || tail -5 /tmp/r4_k100_b8.err
fi
tail -6 /tmp/r4_k100_b32.json 2>/dev/null; tail -6 /tmp/r4_k100_b8.json 2>/dev/null

log "=== 2. esvit floor probe (slope protocol) ==="
timeout 3000 python tools/bench_esvit_floor.py 2>&1 | grep -v WARNING | tail -8

log "=== 3. esvit e2e A/Bs ==="
log "--- stock"
timeout 1500 python bench.py --backbone enc_esvit 2>/dev/null | tee /tmp/r4_esvit_stock.json
log "--- stage3 -> XLA (VITAD_SWIN_XLA_MAX_N=49)"
VITAD_SWIN_XLA_MAX_N=49 timeout 1500 python bench.py --backbone enc_esvit 2>/dev/null | tee /tmp/r4_esvit_xla49.json
log "--- W_BLK=8"
VITAD_SWIN_WBLK=8 timeout 1500 python bench.py --backbone enc_esvit 2>/dev/null | tee /tmp/r4_esvit_wblk8.json
log "--- W_BLK=4"
VITAD_SWIN_WBLK=4 timeout 1500 python bench.py --backbone enc_esvit 2>/dev/null | tee /tmp/r4_esvit_wblk4.json

log "queue16 done"

#!/bin/bash
# Round-4 hardware queue, stage 12 — waits for queue25, then measures the
# sublane-padded chunked K=100 path (params padded to 104, kc=8) vs the
# 1.62 s/epoch kc=10 baseline. Same B=32 probe configuration.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site
log() { echo "[$(date +%H:%M:%S)] $*"; }
log "waiting for queue25 marker"
while ! grep -q "queue25 done" /tmp/r4_queue25.log 2>/dev/null; do sleep 60; done
log "queue25 done — starting"
log "--- K=100 padded chunked (kc=8 on K=104), B=32"
timeout 4200 python tools/probe_epoch.py --which mdn_resnet \
    --gaussians 100 --batch 32 --epochs 4 --n-train 64 2>&1 | tail -8
log "queue26 done"

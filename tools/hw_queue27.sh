#!/bin/bash
# Round-4 hardware queue, stage 13: padded chunked K=100 retry with the
# online-LSE phase A (stack removed). B=32 apples-to-apples vs 1.62 s/epoch.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site
log() { echo "[$(date +%H:%M:%S)] $*"; }
log "--- K=100 padded chunked (kc=8/K=104, online-LSE), B=32"
timeout 3600 python tools/probe_epoch.py --which mdn_resnet \
    --gaussians 100 --batch 32 --epochs 4 --n-train 64 2>&1 | tail -8
log "queue27 done"

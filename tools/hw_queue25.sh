#!/bin/bash
# Round-4 hardware queue, stage 11: chunked K=100 batch scaling — B=64
# (reference transformer-MDN default batch). Larger batches amortize the
# per-chunk dispatch; transient ll-stack roughly doubles (fits check).
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site
log() { echo "[$(date +%H:%M:%S)] $*"; }
log "--- K=100 chunked, B=64"
timeout 4200 python tools/probe_epoch.py --which mdn_resnet \
    --gaussians 100 --batch 64 --epochs 4 --n-train 128 2>&1 | tail -8
log "queue25 done"

#!/bin/bash
# Round-4 hardware queue, stage 5 (chip free after queue18):
#   1. EsViT XLA49 + WBLK1 (is smaller still better?)
#   2. EsViT WBLK2 repeat (confirm 4360 vs 4502 ordering vs combo)
#   3. K=100 kc=20 probe WITH stderr (silent death in queue18)
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site
log() { echo "[$(date +%H:%M:%S)] $*"; }

log "--- esvit XLA49 + WBLK1"
VITAD_SWIN_XLA_MAX_N=49 VITAD_SWIN_WBLK=1 timeout 1500 python bench.py --backbone enc_esvit 2>/dev/null
log "--- esvit XLA49 + WBLK2 repeat"
VITAD_SWIN_XLA_MAX_N=49 VITAD_SWIN_WBLK=2 timeout 1500 python bench.py --backbone enc_esvit 2>/dev/null

log "--- K=100 kc=20 probe (stderr kept)"
VITAD_MDN_KCHUNK=20 timeout 4800 python tools/probe_epoch.py --which mdn_resnet \
    --gaussians 100 --batch 32 --epochs 4 --n-train 64 2>&1 | tail -25

log "queue19 done"

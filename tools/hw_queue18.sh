#!/bin/bash
# Round-4 hardware queue, stage 4 — waits for queue17, then:
#   1. EsViT combo A/Bs: XLA-routed stage 3 x W_BLK {4,2}; NesT W_BLK=4
#   2. K=100 chunk-size sweep: VITAD_MDN_KCHUNK=20 (fewer, bigger chunks)
# Axon rules per CLAUDE.md.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*"; }

log "waiting for queue17 marker"
while ! grep -q "queue17 done" /tmp/r4_queue17.log 2>/dev/null; do sleep 60; done
log "queue17 done — starting"

log "--- esvit XLA49 + WBLK4"
VITAD_SWIN_XLA_MAX_N=49 VITAD_SWIN_WBLK=4 timeout 1500 python bench.py --backbone enc_esvit 2>/dev/null
log "--- esvit XLA49 + WBLK2"
VITAD_SWIN_XLA_MAX_N=49 VITAD_SWIN_WBLK=2 timeout 1500 python bench.py --backbone enc_esvit 2>/dev/null
log "--- esvit WBLK2"
VITAD_SWIN_WBLK=2 timeout 1500 python bench.py --backbone enc_esvit 2>/dev/null
log "--- nest WBLK4"
VITAD_SWIN_WBLK=4 timeout 1500 python bench.py --backbone enc_nest 2>/dev/null
log "--- nest stock control"
timeout 1500 python bench.py --backbone enc_nest 2>/dev/null

log "--- K=100 kc=20 probe"
VITAD_MDN_KCHUNK=20 timeout 4800 python tools/probe_epoch.py --which mdn_resnet \
    --gaussians 100 --batch 32 --epochs 4 --n-train 64 2>/dev/null | tail -3

log "queue18 done"

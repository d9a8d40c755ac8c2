#!/bin/bash
# Round-4 hardware queue, stage 6:
#   1. complete the W_BLK decision matrix (nest WBLK1; esvit WBLK1 alone)
#   2. EsViT family at candidate defaults (XLA49+WBLK1): ae_esvit(+_small), latency
#   3. serving bench re-run (clean; now incl. the scores-only bundle leg)
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site
log() { echo "[$(date +%H:%M:%S)] $*"; }

log "--- nest WBLK1"
VITAD_SWIN_WBLK=1 timeout 1500 python bench.py --backbone enc_nest 2>/dev/null
log "--- esvit WBLK1 alone"
VITAD_SWIN_WBLK=1 timeout 1500 python bench.py --backbone enc_esvit 2>/dev/null
log "--- ae_esvit at candidate defaults"
VITAD_SWIN_XLA_MAX_N=49 VITAD_SWIN_WBLK=1 timeout 1500 python bench.py --backbone ae_esvit 2>/dev/null
log "--- ae_esvit_small at candidate defaults"
VITAD_SWIN_XLA_MAX_N=49 VITAD_SWIN_WBLK=1 timeout 1500 python bench.py --backbone ae_esvit_small 2>/dev/null
log "--- esvit latency at candidate defaults"
VITAD_SWIN_XLA_MAX_N=49 VITAD_SWIN_WBLK=1 timeout 1800 python bench.py --latency --backbone enc_esvit 2>/dev/null

log "=== serving bench (with scores-only leg) ==="
timeout 4500 python tools/bench_serving.py 2>&1 | grep -v WARNING

log "queue20 done"

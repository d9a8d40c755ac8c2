#!/bin/bash
# Round-4 hardware queue, stage 7 — confirm the new code DEFAULTS:
# stock bench must now read ~5050 (esvit) / ~4960 (nest) with NO env;
# flagship re-check (ViT kernel untouched — expect ~3100).
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site
log() { echo "[$(date +%H:%M:%S)] $*"; }
log "--- esvit at committed defaults"
timeout 1500 python bench.py --backbone enc_esvit 2>/dev/null
log "--- nest at committed defaults"
timeout 1500 python bench.py --backbone enc_nest 2>/dev/null
log "--- flagship re-check"
timeout 3000 python bench.py 2>/dev/null
log "--- esvit latency at defaults"
timeout 1800 python bench.py --latency --backbone enc_esvit 2>/dev/null
log "queue21 done"

#!/bin/bash
# Round-5 hardware queue, stage 1:
#  (a) EsViT lever matrix for the r4 VERDICT's two named residuals —
#      Pallas block-LN (VITAD_PALLAS_LN=1, now reaching swin's per-block
#      norms) and gather-based window partition (VITAD_SWIN_PARTITION=
#      gather, kills the 6-D transposes + rolls), each alone and combined,
#      vs the committed defaults.
#  (b) chunked-MDN K=100 B=32 epoch probe: direct chunk backward (default,
#      phase B consumes phase A's ll_total — no forward recompute) vs the
#      old vjp path.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site
log() { echo "[$(date +%H:%M:%S)] $*"; }

log "--- EsViT baseline (committed defaults)"
timeout 1800 python bench.py --backbone enc_esvit 2>&1 | tail -2
log "--- EsViT + VITAD_PALLAS_LN=1 (block LNs through the fused kernel)"
VITAD_PALLAS_LN=1 timeout 1800 python bench.py --backbone enc_esvit 2>&1 | tail -2
log "--- EsViT + VITAD_SWIN_PARTITION=gather"
VITAD_SWIN_PARTITION=gather timeout 1800 python bench.py --backbone enc_esvit 2>&1 | tail -2
log "--- EsViT + both levers"
VITAD_PALLAS_LN=1 VITAD_SWIN_PARTITION=gather timeout 1800 python bench.py --backbone enc_esvit 2>&1 | tail -2

log "--- chunked MDN K=100 B=32: DIRECT backward (new default)"
timeout 3600 python tools/probe_epoch.py --which mdn_resnet \
    --gaussians 100 --batch 32 --epochs 4 --n-train 64 2>&1 | tail -8
log "--- chunked MDN K=100 B=32: VJP backward (old path, A/B control)"
VITAD_MDN_CHUNK_BWD=vjp timeout 3600 python tools/probe_epoch.py --which mdn_resnet \
    --gaussians 100 --batch 32 --epochs 4 --n-train 64 2>&1 | tail -8
log "queue28 done"

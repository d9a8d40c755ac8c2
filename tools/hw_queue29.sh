#!/bin/bash
# Round-5 hardware queue, stage 2 (waits for queue28's bash PID):
#  (a) NesT per-level floor probe (r4 VERDICT item 5)
#  (b) megakernel speed-of-light pricing for the flagship DeiT block
#      (r4 VERDICT item 6)
#  (c) serving paths re-run incl. the new --weights-dtype one-shot A/B
#      (r4 VERDICT item 3)
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site
log() { echo "[$(date +%H:%M:%S)] $*"; }
if [ -n "$1" ]; then
    log "waiting on PID $1 (queue28)"
    while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
log "--- chunked MDN K=100 B=32 DIRECT backward RE-RUN (queue28's run had a"
log "    337 s tunnel stall in epoch 3; clean epochs read 1.44 s; 6 epochs)"
timeout 3600 python tools/probe_epoch.py --which mdn_resnet \
    --gaussians 100 --batch 32 --epochs 6 --n-train 64 2>&1 | tail -30
log "--- chunked MDN K=100 B=64 DIRECT backward (r4 B=64 baseline 2.40 s)"
timeout 3600 python tools/probe_epoch.py --which mdn_resnet \
    --gaussians 100 --batch 64 --epochs 4 --n-train 128 2>&1 | tail -30
log "--- EsViT + VITAD_SWIN_LN_FOLD=1 (LN folded into qkv/fc1 GEMMs)"
VITAD_SWIN_LN_FOLD=1 timeout 1800 python bench.py --backbone enc_esvit 2>&1 | tail -2
log "--- flagship driver bench, defaults (control)"
timeout 1800 python bench.py 2>&1 | tail -2
log "--- flagship driver bench + VITAD_VIT_LN_FOLD=1"
VITAD_VIT_LN_FOLD=1 timeout 1800 python bench.py 2>&1 | tail -2
log "--- NesT floor probe"
timeout 3000 python tools/bench_nest_floor.py 2>&1 | tail -8
log "--- megakernel pricing (flagship DeiT block)"
timeout 3000 python tools/megakernel_price.py 2>&1 | tail -40
log "--- serving bench (incl. weights-dtype one-shot A/B)"
timeout 3000 python tools/bench_serving.py 2>&1 | tail -14
log "queue29 done"

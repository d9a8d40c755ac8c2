#!/bin/bash
# Round-4 hardware queue, stage 8 — waits for queue21, then refreshes the
# full 21-key backbone table under the committed r4 defaults (swin W_BLK=1
# + tiny-window XLA routing, FusedBatchNorm, GELU policy) so
# tools/backbone_bench.json is one coherent post-r4 snapshot.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site
log() { echo "[$(date +%H:%M:%S)] $*"; }

log "waiting for queue21 marker"
while ! grep -q "queue21 done" /tmp/r4_queue21.log 2>/dev/null; do sleep 60; done
log "queue21 done — starting backbone sweep"

cp tools/backbone_bench.json tools/backbone_bench_pre_r4.json 2>/dev/null
timeout 9000 python tools/bench_backbones.py --fork 2>&1 | tail -40

log "queue22 done"

#!/bin/bash
# Thirteenth hardware queue stage, behind hw_queue12.sh (PID $1):
# per-epoch probes for the trainer families queue10/11 did not cover, so
# every product trainer has a steady-state epoch number measured with the
# in-process per-epoch protocol (the only one that survives the tunnel's
# one-time variance — see tools/epoch_probe.json):
#   1. NF-20 on deit features      (slope method said 0.048 s/epoch)
#   2. NF-resnet (3 stage flows)   (never epoch-probed)
#   3. MDN-resnet (2 stage heads)  (never epoch-probed; K=50 like the
#      round-2 CLI proof — K=100 D=2048 pressures HBM with Adam state)
# Axon rules (CLAUDE.md): one TPU client at a time, natural exits, never
# edit this file while it runs.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*"; }
run() { "$@" 2>&1 | grep -v "^WARNING" ; rc=${PIPESTATUS[0]}; [ "$rc" != 0 ] && log "STEP FAILED rc=$rc: $*"; }

PRIMARY_PID="$1"
if [ -n "$PRIMARY_PID" ]; then
    log "waiting for queue12 pid $PRIMARY_PID"
    while kill -0 "$PRIMARY_PID" 2>/dev/null; do sleep 60; done
    log "queue12 done"
fi

log "=== 1/3 nf scan probe ==="
run python tools/probe_epoch.py --which nf --epochs 10 --n-train 160 --batch 32

log "=== 2/3 nf_resnet scan probe ==="
run python tools/probe_epoch.py --which nf_resnet --epochs 10 --n-train 160 --batch 32

log "=== 3/3 mdn_resnet scan probe (K=50) ==="
run python tools/probe_epoch.py --which mdn_resnet --epochs 10 --n-train 160 --batch 32 --gaussians 50

log "queue13 done"

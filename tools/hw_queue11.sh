#!/bin/bash
# Eleventh hardware queue stage, behind hw_queue10.sh (PID $1):
# per-epoch probes for the IMAGE trainers. Queue8 proved the two-point
# slope protocol cannot survive the tunnel's ~1000 s one-time variance
# (recon scan read t_short=1512 s vs t_long=438 s — a NEGATIVE slope;
# queue6/8 loop slopes disagree 0.35 vs 11 s/epoch). probe_epoch times
# every epoch INSIDE one process, so one-time costs (compiles, staging,
# tunnel stalls at startup) are visibly separated from steady state.
#   1. recon scan probe          -> steady epoch_time + train/rest split
#   2. recon scan --no-retain    -> retention-copy share
#   3. recon loop probe          -> dispatch-scheduling control
#   4. recon scan probe, REPEAT  -> run-to-run variance
#   5. vae scan probe            -> per-epoch resolution for queue9's VAE rows
# axon rules (CLAUDE.md): one TPU client at a time, natural exits, never
# edit this file while it runs.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*"; }
run() { "$@" 2>&1 | grep -v "^WARNING" ; rc=${PIPESTATUS[0]}; [ "$rc" != 0 ] && log "STEP FAILED rc=$rc: $*"; }

PRIMARY_PID="$1"
if [ -n "$PRIMARY_PID" ]; then
    log "waiting for queue10 pid $PRIMARY_PID"
    while kill -0 "$PRIMARY_PID" 2>/dev/null; do sleep 60; done
    log "queue10 done"
fi

log "=== 1/5 recon scan probe ==="
run python tools/probe_epoch.py --which recon --epochs 10 --n-train 160 --batch 32

log "=== 2/5 recon scan probe --no-retain ==="
run python tools/probe_epoch.py --which recon --epochs 10 --n-train 160 --batch 32 --no-retain

log "=== 3/5 recon loop probe ==="
run python tools/probe_epoch.py --which recon --epochs 10 --n-train 160 --batch 32 --scan 0

log "=== 4/5 recon scan probe (repeat, variance) ==="
run python tools/probe_epoch.py --which recon --epochs 10 --n-train 160 --batch 32

log "=== 5/5 vae scan probe ==="
run python tools/probe_epoch.py --which vae --epochs 10 --n-train 160 --batch 32

log "queue11 done"

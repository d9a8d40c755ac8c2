#!/bin/bash
# Fourteenth hardware queue stage, behind hw_queue13.sh (PID $1):
# post-change flagship sanity — one bench.py run (DeiT-base + NF-20
# inference) to confirm today's LayerNorm/retention changes left the
# headline number intact before the driver's end-of-round BENCH run,
# and one latency-mode run for the serving row. Axon rules per CLAUDE.md.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*"; }

PRIMARY_PID="$1"
if [ -n "$PRIMARY_PID" ]; then
    log "waiting for queue13 pid $PRIMARY_PID"
    while kill -0 "$PRIMARY_PID" 2>/dev/null; do sleep 60; done
    log "queue13 done"
fi

log "=== flagship bench ==="
python bench.py 2>/dev/null | tee /tmp/flagship_recheck.json

log "=== flagship latency ==="
python bench.py --latency 2>/dev/null | tee -a /tmp/flagship_recheck.json

log "queue14 done"

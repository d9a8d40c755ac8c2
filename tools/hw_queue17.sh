#!/bin/bash
# Round-4 hardware queue, stage 3 — waits for queue16, then:
#   1. serving-path hardware bench (clean re-run: the first attempt was
#      contaminated by a concurrent rehearsal process AND died on the
#      baked-bundle HTTP 413 — now weights-external + incremental rows)
# Axon rules per CLAUDE.md.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*"; }

log "waiting for queue16 marker"
while ! grep -q "queue16 done" /tmp/r4_queue16.log 2>/dev/null; do sleep 60; done
log "queue16 done — starting"

log "=== serving hardware bench (external-weights bundle) ==="
timeout 4000 python tools/bench_serving.py 2>&1 | grep -v "WARNING"

log "queue17 done"

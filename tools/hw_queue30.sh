#!/bin/bash
# Round-5 stage 3: (a) exercise the newly stall-guarded NON-SCAN bench
# branch on hardware (advisor fix — it must produce a sane number and an
# honest stall flag); (b) BENCH_BATCH=256 probe (is the flagship number
# batch-starved at 128?).
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site
log() { echo "[$(date +%H:%M:%S)] $*"; }
log "--- flagship, BENCH_SCAN=0 (non-scan branch, now stall-guarded)"
BENCH_SCAN=0 timeout 1800 python bench.py 2>&1 | tail -2
log "--- flagship, BENCH_BATCH=256 (scan protocol)"
BENCH_BATCH=256 timeout 1800 python bench.py 2>&1 | tail -2
log "queue30 done"

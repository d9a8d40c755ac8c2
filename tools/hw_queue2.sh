#!/bin/bash
# Follow-on hardware queue: waits for the primary hw_queue.sh (by PID, $1)
# to exit, then captures serving-latency numbers (bench.py --latency).
# Same axon rules as hw_queue.sh: one TPU client at a time, natural exits,
# never edit this file while it runs.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*"; }

PRIMARY_PID="$1"
if [ -n "$PRIMARY_PID" ]; then
    log "waiting for primary queue pid $PRIMARY_PID"
    while kill -0 "$PRIMARY_PID" 2>/dev/null; do sleep 60; done
    log "primary queue done"
fi

: > tools/latency_bench.jsonl
for args in "" "--backbone enc_res_net" "--backbone enc_esvit"; do
    log "latency $args"
    # shellcheck disable=SC2086
    python bench.py --latency $args 2>/dev/null | tee -a tools/latency_bench.jsonl
done
log "latency queue done"

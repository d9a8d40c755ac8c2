#!/bin/bash
# Fifth hardware queue stage: post-GELU-policy EsViT trace refresh. The
# GELU re-benches moved enc_esvit 2852 -> 3773 img/s, so the round-3 trace
# decomposition (44.2 ms: copies 13.6 / pallas 19.9) is stale — capture a
# fresh one so the revised bound analysis rests on current numbers.
# Waits for hw_queue4.sh (by PID, $1). axon rules: one TPU client at a
# time, natural exits, never edit this file while it runs.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*"; }

PRIMARY_PID="$1"
if [ -n "$PRIMARY_PID" ]; then
    log "waiting for queue4 pid $PRIMARY_PID"
    while kill -0 "$PRIMARY_PID" 2>/dev/null; do sleep 60; done
    log "queue4 done"
fi

log "=== trace decomposition: enc_esvit (post-GELU-policy) ==="
python tools/profile_trace.py --model enc_esvit --batch 128 --top 25 \
    > tools/trace_esvit_postgelu.txt 2>&1
tail -30 tools/trace_esvit_postgelu.txt

log "queue5 done"

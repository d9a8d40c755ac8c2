#!/bin/bash
# Eighth hardware queue stage: redo the mdn+recon epoch benches with the
# warmup-child protocol (queue6's run was invalidated by the cross-process
# remote-compile cache: the first timed child paid a fresh compile, the
# second didn't, flipping slopes negative). Waits for hw_queue7.sh (by
# PID, $1). axon rules (CLAUDE.md): one TPU client at a time, natural
# exits, never edit this file while it runs.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*"; }

PRIMARY_PID="$1"
if [ -n "$PRIMARY_PID" ]; then
    log "waiting for queue7 pid $PRIMARY_PID"
    while kill -0 "$PRIMARY_PID" 2>/dev/null; do sleep 60; done
    log "queue7 done"
fi

log "=== 1/1 epoch re-bench with warmup children: mdn + recon ==="
python tools/bench_epoch.py --which mdn,recon --n-train 160 --batch 32 \
    2>&1 | grep -v "^WARNING"

log "queue8 done"

#!/bin/bash
# Round-4 hardware queue, stage 10: EsViT device trace at the committed
# defaults (W_BLK=1 + stage-3 XLA routing) for the decomposition record.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site
log() { echo "[$(date +%H:%M:%S)] $*"; }
log "--- esvit trace at r4 defaults"
timeout 2400 python tools/profile_trace.py --model enc_esvit --batch 128 \
    > tools/trace_esvit_r4.txt 2>/tmp/trace_esvit_r4.err || tail -3 /tmp/trace_esvit_r4.err
tail -25 tools/trace_esvit_r4.txt
log "queue24 done"

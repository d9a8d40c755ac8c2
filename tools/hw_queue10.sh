#!/bin/bash
# Tenth hardware queue stage, behind hw_queue9.sh (PID $1):
# MDN epoch-floor decomposition. tools/epoch_bench.json (queue8, post
# device-side retention) has MDN-100 at 2.41 s/epoch scanned / 3.07
# looped, but the step bound (tools/train_bench.json, 759 img/s B=32)
# prices a 128-image train epoch at ~0.21 s — and NF-20 with the same
# harness runs at 0.048 s/epoch, so the floor scales with the head, not
# the epoch driver. Four probes split it:
#   1. scan probe, epoch 1 traced -> xplane decomposition gives the
#      DEVICE time of one epoch (train scan + valid scan + retention)
#   2. scan probe --no-retain -> retention-copy share
#   3. loop probe -> dispatch-scheduling share
# axon rules (CLAUDE.md): one TPU client at a time, natural exits, never
# edit this file while it runs.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*"; }

PRIMARY_PID="$1"
if [ -n "$PRIMARY_PID" ]; then
    log "waiting for queue9 pid $PRIMARY_PID"
    while kill -0 "$PRIMARY_PID" 2>/dev/null; do sleep 60; done
    log "queue9 done"
fi

TRACE_DIR=$(mktemp -d /tmp/mdn_epoch_trace.XXXX)

log "=== 1/4 scan probe (epoch 1 traced) ==="
VITAD_TRACE=$TRACE_DIR python tools/probe_mdn_epoch.py --epochs 10 \
    --n-train 160 --batch 32 --gaussians 100 2>&1 | grep -v "^WARNING"

log "=== 2/4 trace decomposition of the traced epoch ==="
python - <<EOF 2>&1 | grep -v "^WARNING"
import sys
sys.path.insert(0, ".")
from tools.profile_trace import parse_xplane, print_categories
agg, planes = parse_xplane("$TRACE_DIR")
total_ps = sum(v[0] for v in agg.values())
print("planes:", planes)
print(f"total device op time in the traced epoch: {total_ps/1e9:.1f} ms")
print_categories(agg, 1)
rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:25]
for name, (ps, cnt) in rows:
    print(f"{name[:70]:70s} {ps/1e9:9.3f} ms {cnt:6d}")
EOF

log "=== 3/4 scan probe --no-retain ==="
python tools/probe_mdn_epoch.py --epochs 10 --n-train 160 --batch 32 \
    --gaussians 100 --no-retain 2>&1 | grep -v "^WARNING"

log "=== 4/4 loop probe ==="
python tools/probe_mdn_epoch.py --epochs 10 --n-train 160 --batch 32 \
    --gaussians 100 --scan 0 2>&1 | grep -v "^WARNING"

log "queue10 done"

#!/bin/bash
# Third hardware queue stage (round 3): measure the shared-GELU-policy
# change. Waits for hw_queue2.sh (by PID, $1) to exit, then:
#   1. clears the stale EfficientFormer rows from backbone_bench.json
#      (they were measured with exact-erf GELU) and re-benches them
#   2. runs an exact-erf control (VITAD_EXACT_GELU=1) on enc_eff_former so
#      the win is attributable to the GELU flavor alone
# Same axon rules as the other queues: one TPU client at a time, natural
# exits, never edit this file while it runs.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*"; }

PRIMARY_PID="$1"
if [ -n "$PRIMARY_PID" ]; then
    log "waiting for queue2 pid $PRIMARY_PID"
    while kill -0 "$PRIMARY_PID" 2>/dev/null; do sleep 60; done
    log "queue2 done"
fi

log "=== clearing stale eff_former rows (pre-GELU-policy numbers) ==="
python - <<'EOF'
import json
p = 'tools/backbone_bench.json'
rows = json.load(open(p))
stale = {}
for k in ('enc_eff_former', 'ae_eff_former', 'ae_eff_former_small',
          'ae_esvit', 'ae_esvit_small', 'ae_nest', 'ae_nest_small'):
    if k in rows:
        stale[k] = rows.pop(k)
json.dump(rows, open(p, 'w'), indent=1, sort_keys=True)
json.dump(stale, open('tools/backbone_bench_pre_gelu.json', 'w'), indent=1)
print('cleared:', sorted(stale))
EOF

log "=== re-bench GELU-affected rows (policy GELU) ==="
python tools/bench_backbones.py --fork \
    --models enc_eff_former,ae_eff_former,ae_eff_former_small,ae_esvit,ae_esvit_small,ae_nest,ae_nest_small \
    2>&1 | grep -v "^WARNING"

log "=== A/B control: exact-erf GELU (old behavior) ==="
VITAD_EXACT_GELU=1 python bench.py --backbone enc_eff_former \
    2>/dev/null | tee tools/gelu_ab_effformer.jsonl

log "queue3 done"

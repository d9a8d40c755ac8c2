#!/bin/bash
# Seventh hardware queue stage: A/B the FusedBatchNorm change (inference
# BN affine in compute dtype → fuses into conv epilogues) on every
# BN-carrying registry family. Waits for hw_queue6.sh (by PID, $1).
# axon rules (CLAUDE.md): one TPU client at a time, natural exits, never
# edit this file while it runs.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*"; }

PRIMARY_PID="$1"
if [ -n "$PRIMARY_PID" ]; then
    log "waiting for queue6 pid $PRIMARY_PID"
    while kill -0 "$PRIMARY_PID" 2>/dev/null; do sleep 60; done
    log "queue6 done"
fi

log "=== 1/2 snapshot pre-FusedBatchNorm rows ==="
python - <<'EOF'
import json
p = 'tools/backbone_bench.json'
rows = json.load(open(p))
keep = {}
for k in ('enc_res_net', 'enc_cnn', 'enc_eff_net', 'enc_eff_former',
          'ae_res_net', 'ae_res_net_small', 'ae_cnn', 'ae_deit'):
    if k in rows:
        keep[k] = rows.pop(k)
json.dump(rows, open(p, 'w'), indent=1, sort_keys=True)
json.dump(keep, open('tools/backbone_bench_pre_fusedbn.json', 'w'), indent=1)
print('snapshotted:', sorted(keep))
EOF

log "=== 2/2 re-bench BN-carrying families (FusedBatchNorm) ==="
python tools/bench_backbones.py --fork \
    --models enc_res_net,enc_cnn,enc_eff_net,enc_eff_former,ae_res_net,ae_res_net_small,ae_cnn,ae_deit \
    2>&1 | grep -v "^WARNING"

log "queue7 done"

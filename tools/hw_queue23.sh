#!/bin/bash
# Round-4 hardware queue, stage 9: refresh the swin-kernel-affected rows of
# tools/backbone_bench.json under the committed r4 defaults (the stage-8
# sweep resumed from cache, so these rows were stale pre-r4 numbers).
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site
log() { echo "[$(date +%H:%M:%S)] $*"; }

python - <<'PY'
import json
p = "tools/backbone_bench.json"
rows = json.load(open(p))
for k in ("enc_esvit", "enc_nest", "ae_esvit", "ae_esvit_small",
          "ae_nest", "ae_nest_small", "enc_eff_net"):
    rows.pop(k, None)
json.dump(rows, open(p, "w"), indent=1)
print("evicted stale swin/effnet rows")
PY

timeout 6000 python tools/bench_backbones.py --fork \
    --models enc_esvit,enc_nest,ae_esvit,ae_esvit_small,ae_nest,ae_nest_small,enc_eff_net 2>&1 | tail -20

log "queue23 done"

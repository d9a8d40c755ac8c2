#!/bin/bash
# Twelfth hardware queue stage: fused Pallas LayerNorm A/B.
# Waits for the queue10→queue11 chain parent (by PID, $1), then measures
# the three LN-heavy hierarchical backbones under:
#   a) stock (exact f32 flax LN — the committed backbone_bench.json rows)
#   b) VITAD_PALLAS_LN=1  (ops/pallas/layer_norm.py one-pass kernel)
#   c) VITAD_BF16_LN=1    (XLA-only bf16-normalize control: separates
#      "kernel won because of fewer HBM passes" from "f32 map ops were
#      the cost")
# Stock is re-run same-session so the A/B shares tunnel conditions rather
# than comparing against a cached row from another day. Rows land in
# tools/ln_ab.jsonl as single JSON objects ({backbone, variant, rc, ...});
# a crashed bench still writes a row (rc != 0) so failures are visible.
# Axon rules (CLAUDE.md): one TPU client at a time, natural exits, never
# edit this file while it runs.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*"; }

PRIMARY_PID="$1"
if [ -n "$PRIMARY_PID" ]; then
    log "waiting for queue10/11 chain pid $PRIMARY_PID"
    while kill -0 "$PRIMARY_PID" 2>/dev/null; do sleep 60; done
    log "queue10/11 chain done"
fi

bench_row() { # $1=backbone $2=variant-label $3=env-assignment (may be "")
    local bb="$1" var="$2" assign="$3" line rc
    log "=== $bb $var ==="
    if [ -n "$assign" ]; then
        line=$(env "$assign" python bench.py --backbone "$bb" 2>>/tmp/q12_err.log)
    else
        line=$(python bench.py --backbone "$bb" 2>>/tmp/q12_err.log)
    fi
    rc=$?
    VITAD_ROW="$line" python - "$bb" "$var" "$rc" >> tools/ln_ab.jsonl <<'PY'
import json, os, sys
bb, var, rc = sys.argv[1], sys.argv[2], int(sys.argv[3])
row = {"backbone": bb, "variant": var, "rc": rc}
for ln in os.environ.get("VITAD_ROW", "").strip().splitlines():
    try:
        row.update(json.loads(ln))
        break
    except json.JSONDecodeError:
        continue
print(json.dumps(row))
PY
    tail -1 tools/ln_ab.jsonl
}

: > tools/ln_ab.jsonl
for bb in enc_nest enc_esvit enc_eff_former; do
    bench_row "$bb" stock ""
    bench_row "$bb" pallas_ln "VITAD_PALLAS_LN=1"
    bench_row "$bb" bf16_ln "VITAD_BF16_LN=1"
done

log "queue12 done"

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
# than comparing against a cached row from another day.
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

: > tools/ln_ab.jsonl
for bb in enc_nest enc_esvit enc_eff_former; do
    log "=== $bb stock (exact LN) ==="
    python bench.py --backbone "$bb" 2>/dev/null \
        | sed "s/^/{\"variant\": \"stock\"} /" | tee -a tools/ln_ab.jsonl
    log "=== $bb VITAD_PALLAS_LN=1 ==="
    VITAD_PALLAS_LN=1 python bench.py --backbone "$bb" 2>/dev/null \
        | sed "s/^/{\"variant\": \"pallas_ln\"} /" | tee -a tools/ln_ab.jsonl
    log "=== $bb VITAD_BF16_LN=1 ==="
    VITAD_BF16_LN=1 python bench.py --backbone "$bb" 2>/dev/null \
        | sed "s/^/{\"variant\": \"bf16_ln\"} /" | tee -a tools/ln_ab.jsonl
done

log "queue12 done"

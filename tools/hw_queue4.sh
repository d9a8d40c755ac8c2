#!/bin/bash
# Round-3 (session 2) consolidated hardware queue: everything left pending
# behind the tunnel outage (hw_queue.sh stages 2-5 + hw_queue2 + hw_queue3).
# axon rules (CLAUDE.md): one TPU client at a time, natural exits, never
# edit this file while it runs.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*"; }

log "waiting for axon backend (natural-exit probes)"
tries=0
until python -c "import jax; assert [d for d in jax.devices() if d.platform != 'cpu']" 2>/dev/null; do
    tries=$((tries + 1))
    log "probe $tries: backend unavailable"
    sleep 60
done
log "backend up after $tries failed probes"

log "=== 1/8 clear stale GELU-affected rows ==="
python - <<'EOF'
import json
p = 'tools/backbone_bench.json'
rows = json.load(open(p))
stale = {}
for k in ('enc_eff_former', 'enc_esvit', 'enc_nest',
          'ae_eff_former', 'ae_eff_former_small',
          'ae_esvit', 'ae_esvit_small', 'ae_nest', 'ae_nest_small'):
    if k in rows:
        stale[k] = rows.pop(k)
json.dump(rows, open(p, 'w'), indent=1, sort_keys=True)
json.dump(stale, open('tools/backbone_bench_pre_gelu.json', 'w'), indent=1)
print('cleared:', sorted(stale))
EOF

log "=== 2/8 re-bench GELU-affected rows (policy GELU) ==="
python tools/bench_backbones.py --fork \
    --models enc_eff_former,enc_esvit,enc_nest,ae_eff_former,ae_eff_former_small,ae_esvit,ae_esvit_small,ae_nest,ae_nest_small \
    2>&1 | grep -v "^WARNING"

log "=== 3/8 A/B control: exact-erf GELU on enc_eff_former ==="
VITAD_EXACT_GELU=1 python bench.py --backbone enc_eff_former \
    2>/dev/null | tee tools/gelu_ab_effformer.jsonl

log "=== 4/8 bench_epoch mdn,nf,recon scan-of-batches epochs ==="
python tools/bench_epoch.py --which mdn,nf,recon --n-train 160 --batch 32 \
    2>&1 | grep -v "^WARNING"

log "=== 5/8 bench.py flagship confirm ==="
python bench.py

log "=== 6/8 serving latency: flagship, res_net, esvit ==="
: > tools/latency_bench.jsonl
for args in "" "--backbone enc_res_net" "--backbone enc_esvit"; do
    log "latency $args"
    # shellcheck disable=SC2086
    python bench.py --latency $args 2>/dev/null | tee -a tools/latency_bench.jsonl
done

log "=== 7/8 trace decomposition: enc_eff_former ==="
python tools/profile_trace.py --model enc_eff_former --batch 128 --top 25 \
    > tools/trace_eff_former.txt 2>&1
tail -30 tools/trace_eff_former.txt

log "=== 8/8 trace decomposition: enc_nest ==="
python tools/profile_trace.py --model enc_nest --batch 128 --top 25 \
    > tools/trace_nest.txt 2>&1
tail -30 tools/trace_nest.txt

log "queue done"

#!/bin/bash
# Round-3 hardware measurement queue. Run inside tmux (NOT under a killing
# timeout: axon clients must exit naturally — see CLAUDE.md TPU rules).
#
# Waits for the axon backend (each probe is a subprocess that exits on its
# own: seconds when the tunnel is up, ~25 min UNAVAILABLE when down), then
# runs the pending round-3 measurements one TPU client at a time:
#   1. the five encoder rows missing from tools/backbone_bench.json
#      (adaptive protocol, fresh subprocess per model)
#   2. scan-of-batches epoch benches (mdn, nf, recon)
#   3. bench.py flagship confirm
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*"; }

log "waiting for axon backend (natural-exit probes)"
tries=0
until python -c "import jax; assert [d for d in jax.devices() if d.platform != 'cpu']" 2>/dev/null; do
    tries=$((tries + 1))
    log "probe $tries: backend unavailable; sleeping 60s"
    sleep 60
done
log "backend up after $tries failed probes"

log "=== 1/3 bench_backbones: missing encoder rows (fork-per-model) ==="
python tools/bench_backbones.py --fork \
    --models enc_deit,enc_vit,enc_esvit,enc_nest,enc_res_net \
    2>&1 | grep -v "^WARNING"

log "=== 2/3 bench_epoch: mdn,nf,recon scan-of-batches epochs ==="
python tools/bench_epoch.py --which mdn,nf,recon --n-train 160 --batch 32 \
    2>&1 | grep -v "^WARNING"

log "=== 3/5 bench.py flagship confirm ==="
python bench.py

log "=== 4/5 trace decomposition: enc_eff_former (no bound analysis yet) ==="
python tools/profile_trace.py --model enc_eff_former --batch 128 --top 25 \
    > tools/trace_eff_former.txt 2>&1
tail -30 tools/trace_eff_former.txt

log "=== 5/5 trace decomposition: enc_nest ==="
python tools/profile_trace.py --model enc_nest --batch 128 --top 25 \
    > tools/trace_nest.txt 2>&1
tail -30 tools/trace_nest.txt

log "queue done"

#!/bin/bash
# Sixth hardware queue stage: prove the device-side best-weight retention
# fix (pipeline/early_stopping.retain_snapshot) on the chip — MDN-100 and
# recon ae_deit epoch benches measured 10-11 s/epoch because early stopping
# device_get-ed 400-470 MB of params every improving epoch; expected
# post-fix: MDN ~0.3 s/epoch, recon ~1 s/epoch. axon rules (CLAUDE.md):
# one TPU client at a time, natural exits, never edit this while it runs.
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

log "=== 1/1 epoch re-bench: mdn + recon (post retain_snapshot fix) ==="
python tools/bench_epoch.py --which mdn,recon --n-train 160 --batch 32 \
    2>&1 | grep -v "^WARNING"

log "queue6 done"

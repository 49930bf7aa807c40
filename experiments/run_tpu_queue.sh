#!/bin/bash
# Round-3 TPU measurement queue — run when the axon pool returns from a
# hard-down window (CLAUDE.md: probe before queueing TPU work).
#
#   bash experiments/run_tpu_queue.sh [outdir]
#
# Runs, sequentially (never concurrently — the chip and the tunnel are
# both contention-sensitive):
#   1. grouped-RMW raster kernel A/B — DONE round 3: every grouped
#      variant slower; result transcribed into docs/PERF.md ("Grouped-RMW
#      kernel — measured, REJECTED").  Kept here for re-runs.
#   2. PixRefer VGG-split perceptual A/B + device-resident steps/s
# and tees each log into $OUT for later transcription into docs/PERF.md.
# NOTE: item 2's first compile (K-repeated full GAN step at 512²) takes
# 20+ min on this 1-core host — no output until "compiled ..." prints.
set -u
OUT=${1:-/tmp/tpu_queue}
mkdir -p "$OUT"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "probing TPU pool..."
if ! timeout 180 python -c "import jax; print(jax.devices())" \
        >"$OUT/probe.log" 2>&1; then
  echo "pool still down (probe hung or failed; see $OUT/probe.log)"
  exit 1
fi
cat "$OUT/probe.log"

echo "== 1/2 grouped raster A/B =="
timeout 3000 python experiments/profile_raster_grouped.py 2>&1 \
  | tee "$OUT/raster_grouped.log"

echo "== 2/2 pixrefer vgg-split A/B =="
timeout 3000 python experiments/profile_pixrefer_vgg.py 2>&1 \
  | tee "$OUT/pixrefer_vgg.log"

echo "queue done; logs in $OUT"

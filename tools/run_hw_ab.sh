#!/bin/bash
# Round-3 hardware A/B runbook: run every pending measurement on the real
# TPU in one pass and save outputs under log/hw_ab/. Safe to re-run; the
# persistent XLA compile cache makes repeats fast.
#
#   bash tools/run_hw_ab.sh
#
# Measurements:
#   1. bench.py            — full bench incl. the r3 serving entries
#                            (int8 KV, positions tables, multi-chunk k4,
#                            squeezeformer fused chunk)
#   2. bench_chunk_q8.py   — fused chunk-step config sweep at B=32/128
set -u
cd "$(dirname "$0")/.."
mkdir -p log/hw_ab
ts=$(date +%Y%m%d_%H%M%S)

echo "== TPU check =="
timeout 600 python -c "import jax; print(jax.devices())" || {
  echo "TPU tunnel unavailable; aborting"; exit 1; }

echo "== bench.py =="
timeout 5400 python bench.py 2> "log/hw_ab/bench_${ts}.log" \
  | tee "log/hw_ab/bench_${ts}.json"
tail -40 "log/hw_ab/bench_${ts}.log"

echo "== chunk-step config sweep =="
timeout 3600 python tools/bench_chunk_q8.py 32 128 \
  2>&1 | tee "log/hw_ab/chunk_q8_${ts}.log"

echo "done — outputs in log/hw_ab/*_${ts}.*"

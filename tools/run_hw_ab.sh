#!/bin/bash
# Round-4 hardware runbook: every pending measurement on the real TPU in
# one pass, outputs under log/hw_ab/. Safe to re-run; the persistent XLA
# compile cache makes repeats fast. ONE TPU job at a time — don't run
# while anything else uses the tunnel.
#
#   bash tools/run_hw_ab.sh
#
# Measurements:
#   1. bench.py            — full bench: ring-cache serving (default) +
#                            roll ablation, int8 KV, multi-chunk k4,
#                            per-family full-context B=32 (fused vs xla),
#                            squeezeformer fused-train step
#   2. bench_chunk_q8.py   — chunk-step config sweep at B=32/128 incl.
#                            ring entries + fixed-block int8 ablation
#   3. soak_stream.py      — hour-of-audio streaming soak (ring + table
#                            horizon crossing; flat-memory evidence)
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

echo "== streaming soak (60 min of audio, 2 slots, ring engine) =="
timeout 3600 python tools/soak_stream.py \
  --model_dir examples/tiny_zh_synth/inference_model \
  --minutes 60 --streams 2 --pos_table_len 8192 \
  2>&1 | tee "log/hw_ab/soak_${ts}.log"

echo "done — outputs in log/hw_ab/*_${ts}.*"

#!/bin/bash
# Hardware runbook: every pending measurement on the real TPU in one
# pass, outputs under log/hw_ab/ (committed — they are the raw evidence
# docs/status.md cites). Safe to re-run; the persistent XLA compile
# cache makes repeats fast. ONE TPU job at a time — don't run while
# anything else uses the tunnel.
#
#   bash tools/run_hw_ab.sh
#
# Measurements:
#   1. bench.py --full     — headline rows (ring serving + exact-
#                            positions tick, train B=16/32, per-family
#                            B=32, predict_long) PLUS the ablation rows
#                            (roll-cache, multi-chunk k4, flash variant,
#                            squeezeformer fused-train A/B)
#   2. soak_stream.py      — hour-of-audio streaming soak (ring + table
#                            horizon crossing; flat-memory evidence)
#
# (The round-4 int8-KV sweep tool bench_chunk_q8.py was deleted with the
# int8 route itself — decision record in docs/streaming_roofline.md.)
set -u
cd "$(dirname "$0")/.."
mkdir -p log/hw_ab
ts=$(date +%Y%m%d_%H%M%S)

echo "== TPU check =="
timeout 600 python -c "import jax; print(jax.devices())" || {
  echo "TPU tunnel unavailable; aborting"; exit 1; }

echo "== bench.py --full =="
timeout 5400 python bench.py --full 2> "log/hw_ab/bench_${ts}.log" \
  | tee "log/hw_ab/bench_${ts}.json"
tail -40 "log/hw_ab/bench_${ts}.log"

echo "== streaming soak (60 min of audio, 2 slots, ring engine) =="
timeout 3600 python tools/soak_stream.py \
  --model_dir examples/tiny_zh_synth/inference_model \
  --minutes 60 --streams 2 --pos_table_len 8192 \
  2>&1 | tee "log/hw_ab/soak_${ts}.log"

echo "done — outputs in log/hw_ab/*_${ts}.*"

"""Measure the XLA-vs-flash attention crossover that drives the "auto"
routing default (models/attention.py _flash_route, VERDICT r2 item 7).

Sweeps full-context encode time of the full 12-layer bf16 Conformer at
post-subsampling lengths spanning the open band between the fused
whole-layer kernel's VMEM ceiling (~600 frames) and the known flash win
at 1200, with the fused layer disabled so the XLA↔flash comparison is
isolated. Prints a table and the recommended FLASH_CROSSOVER_T.

Run on the real chip:  python tools/bench_attention_routing.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # repo-root bench helpers (build/init_vars/bench_full_context)


def main():
    import jax
    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}", file=sys.stderr)
    results = []
    # post-subsampling targets → input frames T_in = 4*T2 + 7
    for t2 in (512, 640, 768, 896, 1024, 1280):
        t_in = 4 * t2 + 7
        B = max(1, min(8, 8192 // t2))
        row = {"t2": t2, "B": B}
        for name, flash in (("xla", False), ("flash", True)):
            model = bench.build("bf16", use_flash=flash, use_fused=False)
            variables = bench.init_vars(model)
            sec, _ = bench.bench_full_context(model, variables, B, t_in,
                                              K=16, runs=3)
            row[name] = sec * 1e3
        row["speedup"] = row["xla"] / row["flash"]
        results.append(row)
        print(f"T2={t2:5d} B={B}: xla {row['xla']:7.2f} ms  "
              f"flash {row['flash']:7.2f} ms  ({row['speedup']:.2f}x)",
              flush=True)
    wins = [r["t2"] for r in results if r["speedup"] > 1.0]
    if wins:
        print(f"recommended FLASH_CROSSOVER_T = {min(wins)}")
    else:
        print("flash never won in the swept band — raise the crossover "
              "past", results[-1]["t2"])


if __name__ == "__main__":
    main()

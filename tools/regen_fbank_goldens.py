"""Regenerate tests/goldens/fbank_goldens.npz from the INDEPENDENT torch
oracle (tools/kaldi_fbank_torch.py) — VERDICT r3 item 3.

Round-1 goldens were frozen from this repo's own numpy kernels
(regression-only). These goldens instead come from a second, independent
float64 implementation of the Kaldi algorithm, so the golden tests now
validate CORRECTNESS against an external derivation, not just stability.
Waves are kept identical to the round-1 set (noise / 440 Hz tone /
chirp, 0.5 s @ 16 kHz, int16 scale).

Usage: python tools/regen_fbank_goldens.py  (prints the measured
agreement between the float32 product kernels and the float64 oracle —
the numbers the test tolerances in tests/test_fbank_goldens.py and
tests/test_fbank_torch_oracle.py pin).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kaldi_fbank_torch import (fbank_torch, linear_torch,  # noqa: E402
                               mel_banks_torch, mfcc_torch)

GOLDENS = os.path.join(os.path.dirname(__file__), "..", "tests",
                       "goldens", "fbank_goldens.npz")


def main():
    import torch
    from masr_tpu.ops.fbank import (fbank_numpy, linear_numpy, mel_banks,
                                    mfcc_numpy, povey_window)
    g = dict(np.load(GOLDENS))
    out = {k: v for k, v in g.items() if k.startswith("wave_")}
    for name in ("noise", "tone", "chirp"):
        wav = g[f"wave_{name}"]
        out[f"fbank_{name}"] = fbank_torch(wav).astype(np.float32)
        out[f"mfcc_{name}"] = mfcc_torch(wav).astype(np.float32)
        out[f"linear_{name}"] = linear_torch(wav / 32768.0).astype(
            np.float32)
        for kind, ours in (("fbank", fbank_numpy(wav)),
                           ("mfcc", mfcc_numpy(wav)),
                           ("linear", linear_numpy(wav / 32768.0))):
            want = out[f"{kind}_{name}"]
            d = np.abs(ours - want)
            print(f"{kind}_{name}: max={d.max():.2e} "
                  f"p99={np.percentile(d, 99):.2e}")
    out["mel_banks_80_512"] = mel_banks_torch(
        80, 512, 16000.0).numpy().astype(np.float32)
    out["povey_400"] = torch.hann_window(
        400, periodic=False, dtype=torch.float64).pow(0.85).numpy().astype(
        np.float32)
    print("mel_banks max diff:",
          np.abs(out["mel_banks_80_512"] - mel_banks(80, 512, 16000.0)).max())
    print("povey max diff:",
          np.abs(out["povey_400"] - povey_window(400)).max())
    np.savez(GOLDENS, **out)
    print("written", os.path.abspath(GOLDENS))


if __name__ == "__main__":
    main()

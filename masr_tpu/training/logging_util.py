"""Scalar logging (replaces the reference's VisualDL LogWriter,
trainer.py:17,420-422): JSONL scalars under log_dir, one line per point —
trivially plottable and diffable."""
import json
import os
import time


class ScalarWriter(object):
    def __init__(self, log_dir="log"):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "scalars.jsonl"), "a",
                       encoding="utf-8", buffering=1)

    def add_scalar(self, tag, value, step):
        self._f.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step),
             "ts": time.time()}) + "\n")

    def close(self):
        self._f.close()

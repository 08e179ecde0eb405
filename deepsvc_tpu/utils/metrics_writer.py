"""Scalar metrics logging (the reference's TensorBoardX role,
Learner.py:203-212).

Writes JSONL scalar events ({step, tag, value, wall_time}) — trivially
greppable/plottable and dependency-free; point TensorBoard at the same
directory via its JSONL importers if desired.
"""

from __future__ import annotations

import json
import os
import time


class MetricsWriter:
    def __init__(self, logdir: str, filename: str = "scalars.jsonl"):
        os.makedirs(logdir, exist_ok=True)
        self._f = open(os.path.join(logdir, filename), "a", buffering=1)

    def add_scalar(self, tag: str, value: float, step: int):
        self._f.write(
            json.dumps(
                {
                    "step": int(step),
                    "tag": tag,
                    "value": float(value),
                    "wall_time": time.time(),
                }
            )
            + "\n"
        )

    def add_scalars(self, scalars: dict, step: int, prefix: str = ""):
        for k, v in scalars.items():
            self.add_scalar(f"{prefix}{k}", v, step)

    def close(self):
        self._f.close()

"""Training summaries (reference tensorboard plumbing, SURVEY.md §5.5).

The reference writes per-loss scalars + gt-overlay image summaries via
tb-nightly (network.py:~L60-L120, train_val.py summary intervals).  Here:
a thin writer that emits TensorBoard event files via tf.summary when
tensorflow is importable (it is in this environment) and always mirrors
scalars to a JSONL file (machine-readable, no TB needed).
"""

from __future__ import annotations

import json
import os
from typing import Any


class SummaryWriter:
    def __init__(self, log_dir: str, jsonl_name: str = "events.jsonl"):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, jsonl_name), "a")
        self._tf = None
        try:
            import tensorflow as tf  # type: ignore

            self._tf = tf
            self._writer = tf.summary.create_file_writer(log_dir)
        except Exception:
            self._writer = None

    def scalar(self, tag: str, value: float, step: int):
        self._jsonl.write(json.dumps({"step": step, tag: float(value)}) + "\n")
        if self._writer is not None:
            with self._writer.as_default():
                self._tf.summary.scalar(tag, float(value), step=step)

    def scalars(self, values: dict[str, Any], step: int):
        record = {"step": step}
        for k, v in values.items():
            record[k] = float(v)
        self._jsonl.write(json.dumps(record) + "\n")
        if self._writer is not None:
            with self._writer.as_default():
                for k, v in values.items():
                    self._tf.summary.scalar(k, float(v), step=step)

    def image(self, tag: str, image, step: int):
        """image: (H, W, 3) uint8 (e.g. utils.visualization gt overlay)."""
        if self._writer is not None:
            with self._writer.as_default():
                self._tf.summary.image(tag, image[None], step=step)

    def flush(self):
        self._jsonl.flush()
        if self._writer is not None:
            self._writer.flush()

    def close(self):
        self.flush()
        self._jsonl.close()

"""TensorBoard summarizer (parity: ``anakin/utils/summarizer.py``)."""
from __future__ import annotations

import os
from typing import Dict

from flax.metrics import tensorboard


class Summarizer:
    def __init__(self, dump_path: str, enabled: bool = True):
        self.enabled = enabled
        if enabled:
            self.writer = tensorboard.SummaryWriter(os.path.join(dump_path, "runs"))

    def summarize_losses(self, losses: Dict, step: int, prefix: str = "train"):
        if not self.enabled:
            return
        for k, v in losses.items():
            if v is None:
                continue
            self.writer.scalar(f"{prefix}/loss/{k}", float(v), step)

    def summarize_evaluator(self, evaluator, epoch: int, split: str = "train"):
        if not self.enabled:
            return
        for name, scalars in evaluator.get_measures_all_striped().items():
            for k, v in scalars.items():
                self.writer.scalar(f"{split}/{name}/{k}", float(v), epoch)
        self.writer.flush()

    def close(self):
        if self.enabled:
            self.writer.close()

"""Metric/observability facade.

The reference logs scalars (train_loss, total_train_loss, CLAP/KAD gauges),
audio clips and mel-spectrogram images to wandb (entity/group/tags) with a
tensorboard branch (script/train/train_audioldm_lora.py:333-344,570-592,
176-229). This facade keeps the same metric names/semantics with wandb and
tensorboard optional, and always writes a local JSONL stream so headless TPU
runs are observable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np


class MetricLogger:
    def __init__(
        self,
        output_dir: str,
        project: str = "audioldm-tpu",
        wandb_config: Optional[dict] = None,
        use_wandb: bool = False,
        run_name: Optional[str] = None,
    ):
        os.makedirs(output_dir, exist_ok=True)
        self._jsonl = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                kw = dict(wandb_config or {})
                self._wandb = wandb.init(project=project, name=run_name, **kw)
            except Exception as e:  # wandb optional / offline
                print(f"[logging] wandb unavailable ({e}); JSONL only")

    def log(self, metrics: dict, step: int):
        rec = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            if isinstance(v, (int, float, np.floating, np.integer)):
                rec[k] = float(v)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_audio(self, name: str, waveform: np.ndarray, sample_rate: int, step: int, output_dir: Optional[str] = None):
        """Persist a clip (wandb if available, always a wav on disk —
        the reference's validation-audio logging, train:186-198)."""
        from audioldm_tpu.data.wavio import write_wav

        folder = output_dir or os.path.dirname(self._jsonl.name)
        path = os.path.join(folder, f"{name.replace('/', '_')}_step{step}.wav")
        write_wav(path, waveform, sample_rate)
        if self._wandb is not None:
            import wandb

            self._wandb.log({name: wandb.Audio(np.asarray(waveform), sample_rate=sample_rate)}, step=step)
        return path

    def close(self):
        self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()

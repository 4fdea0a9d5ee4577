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
import math
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
        use_tensorboard: bool = False,
        run_name: Optional[str] = None,
    ):
        os.makedirs(output_dir, exist_ok=True)
        self._dir = output_dir
        self._jsonl = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        self._wandb = None
        self._tb = None
        if use_wandb:
            try:
                import wandb

                kw = dict(wandb_config or {})
                self._wandb = wandb.init(project=project, name=run_name, **kw)
            except Exception as e:  # wandb optional / offline
                print(f"[logging] wandb unavailable ({e}); JSONL only")
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(output_dir, "tensorboard"))
            except Exception as e:  # tensorboard optional
                print(f"[logging] tensorboard unavailable ({e}); JSONL only")

    def log(self, metrics: dict, step: int):
        rec = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            if isinstance(v, (int, float, np.floating, np.integer)):
                # JSON has no NaN/Infinity: json.dumps would emit a bare
                # `NaN` token that breaks jq/JSON.parse on the whole line
                # (round-5 review finding); null keeps the line valid and
                # the non-finite value visible
                rec[k] = float(v) if math.isfinite(v) else None
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if self._tb is not None:
            for k, v in rec.items():
                if k not in ("step", "time") and v is not None:
                    self._tb.add_scalar(k, v, global_step=step)

    def log_audio(self, name: str, waveform: np.ndarray, sample_rate: int, step: int, output_dir: Optional[str] = None):
        """Persist a clip (wandb/tensorboard if available, always a wav on
        disk — the reference's validation-audio logging, train:186-198)."""
        from audioldm_tpu.data.wavio import write_wav

        folder = output_dir or self._dir
        path = os.path.join(folder, f"{name.replace('/', '_')}_step{step}.wav")
        write_wav(path, waveform, sample_rate)
        if self._wandb is not None:
            import wandb

            self._wandb.log({name: wandb.Audio(np.asarray(waveform), sample_rate=sample_rate)}, step=step)
        if self._tb is not None:
            import torch

            self._tb.add_audio(name, torch.from_numpy(np.array(waveform, copy=True))[None], global_step=step, sample_rate=sample_rate)
        return path

    def log_image(self, name: str, png_bytes: bytes, step: int, output_dir: Optional[str] = None):
        """Persist a PNG (the reference logs mel-spectrogram images to wandb
        AND tensorboard, train_audioldm_lora.py:78-95,176-198); always a file
        on disk."""
        folder = output_dir or self._dir
        path = os.path.join(folder, f"{name.replace('/', '_')}_step{step}.png")
        with open(path, "wb") as f:
            f.write(png_bytes)
        decoded = None
        if self._wandb is not None or self._tb is not None:
            try:
                import io

                from PIL import Image

                decoded = np.asarray(Image.open(io.BytesIO(png_bytes)).convert("RGB"))
            except Exception:
                decoded = None
        if decoded is not None and self._wandb is not None:
            import wandb

            self._wandb.log({name: wandb.Image(decoded)}, step=step)
        if decoded is not None and self._tb is not None:
            self._tb.add_image(name, decoded, global_step=step, dataformats="HWC")
        return path

    def close(self):
        self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()
        if self._tb is not None:
            self._tb.close()

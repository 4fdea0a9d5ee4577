"""Config layer + general utilities tests (reference: config/config.yaml
schema, script/utilities/tools.py capabilities)."""

import json
import os

import numpy as np

from audioldm_tpu.config import LoRAConfig, RunConfig, TrainConfig
from audioldm_tpu.utils.tools import (
    build_dataset_json_from_list,
    get_restore_step,
    md5_file,
    retrieve,
    verify_checkpoint,
)


def test_run_config_from_yaml():
    cfg = RunConfig.from_yaml(os.path.join(os.path.dirname(__file__), "..", "configs", "default.yaml"))
    assert cfg.base_model_id == "cvssp/audioldm-s-full-v2"
    assert cfg.lora.r == 2 and cfg.lora.lora_alpha == 2
    assert cfg.train.train_batch_size == 2
    assert cfg.train.learning_rate == 1.0e-5
    assert cfg.train.betas == (0.9, 0.999)
    assert cfg.lora.scale == 1.0


def test_reference_yaml_schema(tmp_path):
    """The reference's own config.yaml values load (config/config.yaml:14-30)."""
    y = tmp_path / "c.yaml"
    y.write_text(
        "base_model_id: m\nlora:\n  r: 2\n  lora_alpha: 4\n"
        "train:\n  learning_rate: 0.0001\n  weight_decay: 0.01\n  checkpointing_steps: 50000\n"
    )
    cfg = RunConfig.from_yaml(str(y))
    assert cfg.lora.lora_alpha == 4 and cfg.lora.scale == 2.0
    assert cfg.train.learning_rate == 1e-4
    assert cfg.train.checkpointing_steps == 50000


def test_dataset_json(tmp_path):
    p = str(tmp_path / "d.json")
    d = build_dataset_json_from_list(["a", "b"], p)
    assert d["data"][1]["caption"] == "b"
    assert json.load(open(p)) == d


def test_get_restore_step(tmp_path):
    assert get_restore_step(str(tmp_path)) is None
    (tmp_path / "checkpoint-100").mkdir()
    (tmp_path / "checkpoint-9700").mkdir()
    assert get_restore_step(str(tmp_path)) == 9700


def test_md5_and_verify(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"hello")
    digest = md5_file(str(p))
    assert verify_checkpoint(str(p), digest)
    assert not verify_checkpoint(str(p), "0" * 32)


def test_retrieve():
    cfg = {"train": {"lr": 1e-4, "betas": [0.9, 0.99]}}
    assert retrieve(cfg, "train/lr") == 1e-4
    assert retrieve(cfg, "train/betas/1") == 0.99
    assert retrieve(cfg, "missing/x", default=7) == 7
    assert retrieve(TrainConfig(), "learning_rate") == 1e-5

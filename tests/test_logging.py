"""End-to-end tracker tests for the MetricLogger facade.

The reference logs scalars, audio clips and mel PNGs to wandb with a
tensorboard branch (reference script/train/train_audioldm_lora.py:333-344,
570-592). wandb is absent in this image (zero egress), so the wandb branch
stays fallback-tested; the tensorboard branch IS installed (torch's
SummaryWriter + the tensorboard event reader) and is exercised here all the
way through: write scalars/audio/image, then read the event file back and
assert values, steps and payloads — not just that a directory appeared.
"""

import json
import os

import numpy as np
import pytest

from audioldm_tpu.utils.logging import MetricLogger

pytestmark = pytest.mark.quick


def _tiny_png():
    # hand-rolled 2x2 RGB PNG via PIL if present, else a pre-baked byte blob
    try:
        import io

        from PIL import Image

        buf = io.BytesIO()
        arr = np.array(
            [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 0]]], dtype=np.uint8
        )
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue(), arr
    except Exception:
        return None, None


def _accumulator(tb_dir):
    from tensorboard.backend.event_processing import event_accumulator

    acc = event_accumulator.EventAccumulator(
        tb_dir,
        size_guidance={
            event_accumulator.SCALARS: 0,
            event_accumulator.AUDIO: 0,
            event_accumulator.IMAGES: 0,
        },
    )
    acc.Reload()
    return acc


def test_tensorboard_branch_end_to_end(tmp_path):
    out = str(tmp_path)
    logger = MetricLogger(out, use_tensorboard=True)
    assert logger._tb is not None, "tensorboard SummaryWriter should be available"

    # scalars: the reference's wandb key names, multiple steps
    logger.log({"train_loss": 0.5, "lr": 1e-4}, step=1)
    logger.log({"train_loss": 0.25, "lr": 9e-5}, step=2)

    # audio: 0.1 s of a 440 Hz tone at 16 kHz
    sr = 16000
    t = np.arange(int(0.1 * sr)) / sr
    wav = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    wav_path = logger.log_audio("val/audio", wav, sr, step=2)
    assert os.path.exists(wav_path)

    png, arr = _tiny_png()
    if png is not None:
        img_path = logger.log_image("val/mel", png, step=2)
        assert os.path.exists(img_path)
    logger.close()

    # JSONL stream always written, same records
    with open(os.path.join(out, "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert [r["step"] for r in recs] == [1, 2]
    assert recs[0]["train_loss"] == 0.5 and recs[1]["train_loss"] == 0.25

    # read the event file back
    acc = _accumulator(os.path.join(out, "tensorboard"))
    scalars = {t: acc.Scalars(t) for t in acc.Tags()["scalars"]}
    assert set(scalars) == {"train_loss", "lr"}
    assert [(e.step, e.value) for e in scalars["train_loss"]] == [
        (1, pytest.approx(0.5)),
        (2, pytest.approx(0.25)),
    ]
    assert [e.step for e in scalars["lr"]] == [1, 2]

    audio_tags = acc.Tags()["audio"]
    assert any("val/audio" in t for t in audio_tags)
    (ev,) = acc.Audio(audio_tags[0])
    assert ev.step == 2 and ev.sample_rate == sr

    if png is not None:
        image_tags = acc.Tags()["images"]
        assert any("val/mel" in t for t in image_tags)
        (iev,) = acc.Images(image_tags[0])
        assert iev.step == 2 and iev.width == 2 and iev.height == 2


def test_wandb_branch_degrades_to_jsonl(tmp_path, capsys):
    # wandb is not installed in this image: use_wandb=True must not raise,
    # must say so, and must still stream JSONL
    logger = MetricLogger(str(tmp_path), use_wandb=True)
    assert logger._wandb is None
    assert "wandb unavailable" in capsys.readouterr().out
    logger.log({"train_loss": 1.0}, step=0)
    logger.close()
    with open(os.path.join(str(tmp_path), "metrics.jsonl")) as f:
        (rec,) = [json.loads(line) for line in f]
    assert rec["train_loss"] == 1.0


def test_non_numeric_metrics_skipped_in_jsonl(tmp_path):
    logger = MetricLogger(str(tmp_path))
    logger.log({"train_loss": 0.1, "note": "not-a-number"}, step=0)
    logger.close()
    with open(os.path.join(str(tmp_path), "metrics.jsonl")) as f:
        (rec,) = [json.loads(line) for line in f]
    assert "note" not in rec and rec["train_loss"] == pytest.approx(0.1)

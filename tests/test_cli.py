"""CLI end-to-end smoke tests over tiny saved checkpoints — the framework's
replacements for the reference entry points (SURVEY.md §2a #10-14)."""

import json
import os

import jax
import numpy as np
import pytest

from audioldm_tpu import cli
from audioldm_tpu.ckpt import save_audioldm_checkpoint
from audioldm_tpu.config import DDIMConfig
from audioldm_tpu.data.wavio import read_wav, write_wav
from audioldm_tpu.pipeline.generate import random_modules
from tests.test_pipeline import TINY_TEXT, TINY_UNET, TINY_VAE, TINY_VOC


def _write_tokenizer_files(folder):
    from tokenizers.implementations import ByteLevelBPETokenizer

    corpus = os.path.join(folder, "_corpus.txt")
    with open(corpus, "w") as f:
        f.write("hip hop music with heavy bass and drums\n" * 30)
    tok = ByteLevelBPETokenizer()
    tok.train([corpus], vocab_size=300, min_frequency=1,
              special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"])
    tok.save_model(folder)


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ckpt"))
    # the text tower must cover the tokenizer's vocab (300) — widen it
    text_cfg = TINY_TEXT.__class__(**{**TINY_TEXT.__dict__, "vocab_size": 512})
    modules = random_modules(
        jax.random.PRNGKey(0),
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfg=text_cfg, vocoder_cfg=TINY_VOC,
        ddim_cfg=DDIMConfig(),
    )
    save_audioldm_checkpoint(d, modules)
    tok_dir = os.path.join(d, "tokenizer")
    os.makedirs(tok_dir, exist_ok=True)
    _write_tokenizer_files(tok_dir)
    return d


def test_cli_generate(tiny_checkpoint, tmp_path):
    out = str(tmp_path / "gen.wav")
    cli.main([
        "generate", "--checkpoint", tiny_checkpoint, "--prompt", "hip hop music",
        "--steps", "2", "--seconds", "0.01", "--output", out, "--fp32",
    ])
    wav, sr = read_wav(out)
    assert sr == 16000 and len(wav) == 160
    assert np.any(wav != 0)


def test_cli_generate_with_lora(tiny_checkpoint, tmp_path):
    from safetensors.numpy import save_file

    from audioldm_tpu.ckpt import load_audioldm_checkpoint
    from audioldm_tpu.config import LoRAConfig
    from audioldm_tpu.lora import export_peft_state_dict, init_lora

    bundle = load_audioldm_checkpoint(tiny_checkpoint)
    lora = init_lora(jax.random.PRNGKey(1), bundle["params"]["unet"], LoRAConfig(r=2, lora_alpha=4))
    lora = jax.tree.map(lambda x: x + 0.05, lora)
    lora_path = str(tmp_path / "model.safetensors")
    save_file({k: np.asarray(v) for k, v in export_peft_state_dict(lora).items()}, lora_path)

    out = str(tmp_path / "gen_lora.wav")
    cli.main([
        "generate", "--checkpoint", tiny_checkpoint, "--prompt", "hip hop music",
        "--lora", lora_path, "--lora-alpha", "4",
        "--steps", "2", "--seconds", "0.01", "--output", out, "--fp32",
    ])
    base = str(tmp_path / "gen_base.wav")
    cli.main([
        "generate", "--checkpoint", tiny_checkpoint, "--prompt", "hip hop music",
        "--steps", "2", "--seconds", "0.01", "--output", base, "--fp32",
    ])
    a, _ = read_wav(out)
    b, _ = read_wav(base)
    assert np.max(np.abs(a - b)) > 1e-5  # merged adapter changed the output

    # weighted composition: repeated --lora PATH:WEIGHT merges
    # sum_i w_i*(alpha/r)*B_i A_i (exactness unit-tested in test_lora.py);
    # at w=0.5+0.5 of the SAME adapter the merge equals the w=1 merge
    comp = str(tmp_path / "gen_comp.wav")
    cli.main([
        "generate", "--checkpoint", tiny_checkpoint, "--prompt", "hip hop music",
        "--lora", f"{lora_path}:0.5", "--lora", f"{lora_path}:0.5", "--lora-alpha", "4",
        "--steps", "2", "--seconds", "0.01", "--output", comp, "--fp32",
    ])
    c, _ = read_wav(comp)
    np.testing.assert_allclose(c, a, atol=2e-4)


def test_cli_generate_audio_to_audio(tiny_checkpoint, tmp_path):
    src = str(tmp_path / "src.wav")
    rs = np.random.RandomState(0)
    write_wav(src, (rs.randn(160) * 0.1).astype(np.float32), 16000)

    out = str(tmp_path / "a2a.wav")
    cli.main([
        "generate", "--checkpoint", tiny_checkpoint, "--prompt", "hip hop music",
        "--init-audio", src, "--strength", "0.5",
        "--steps", "2", "--seconds", "0.01", "--output", out, "--fp32",
    ])
    wav, sr = read_wav(out)
    assert sr == 16000 and len(wav) == 160 and np.any(wav != 0)

    # inpainting: regenerate the first half + the top mel-bin octave
    out2 = str(tmp_path / "inpaint.wav")
    cli.main([
        "generate", "--checkpoint", tiny_checkpoint, "--prompt", "hip hop music",
        "--init-audio", src, "--inpaint", "0.0-0.005", "--inpaint-freq", "4-8",
        "--steps", "2", "--seconds", "0.01", "--output", out2, "--fp32",
    ])
    wav2, _ = read_wav(out2)
    assert len(wav2) == 160 and np.any(wav2 != 0)

    with pytest.raises(SystemExit):
        cli.main([
            "generate", "--checkpoint", tiny_checkpoint, "--prompt", "x",
            "--init-audio", src, "--scheduler", "lcm",
            "--steps", "2", "--seconds", "0.01", "--output", out, "--fp32",
        ])


def test_cli_a2a_flag_validation(tiny_checkpoint, tmp_path):
    """Advisor round-3 findings: a2a flags without --init-audio, malformed
    ranges, and too-low strength all fail fast with a clean message."""
    src = str(tmp_path / "src.wav")
    write_wav(src, np.zeros(160, np.float32), 16000)
    base = ["generate", "--checkpoint", tiny_checkpoint, "--prompt", "x",
            "--steps", "2", "--seconds", "0.01", "--fp32",
            "--output", str(tmp_path / "o.wav")]

    # a2a flags are silently-ignored no more: each requires --init-audio
    for flags in (["--inpaint", "0.0-0.005"], ["--strength", "0.5"],
                  ["--inpaint-freq", "4-8"], ["--sample-posterior"]):
        with pytest.raises(SystemExit, match="init-audio"):
            cli.main(base + flags)

    # malformed range: 0-1-2 must not parse as a 3-tuple
    with pytest.raises(SystemExit, match="LO-HI"):
        cli.main(base + ["--init-audio", src, "--inpaint", "0-1-2"])

    # int(steps*strength) == 0 -> descriptive error, not a trace-time crash
    with pytest.raises(SystemExit, match="too low"):
        cli.main(base + ["--init-audio", src, "--strength", "0.05"])


def test_cli_slice(tmp_path, rng):
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    write_wav(str(wav_dir / "a.wav"), rng.uniform(-0.5, 0.5, 32000).astype(np.float32), 16000)
    out_dir = str(tmp_path / "segs")
    cli.main(["slice", "--input", str(wav_dir), "--output", out_dir, "--seconds", "1.0"])
    assert len([f for f in os.listdir(out_dir) if f.endswith(".wav")]) == 2


@pytest.fixture(scope="module")
def tiny_clap_dir(tmp_path_factory):
    import torch
    from safetensors.torch import save_file
    from transformers import ClapAudioConfig as HFAudio
    from transformers import ClapConfig, ClapModel
    from transformers import ClapTextConfig as HFText

    d = str(tmp_path_factory.mktemp("clap"))
    text_cfg = dict(vocab_size=512, hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
                    intermediate_size=32, max_position_embeddings=100, projection_dim=8)
    # audio tower must accept the real 48 kHz feature geometry: 64 mel bins,
    # 1001 frames -> spec_size 256
    audio_cfg = dict(window_size=4, num_mel_bins=64, spec_size=256, patch_size=4,
                     patch_stride=[4, 4], patch_embeds_hidden_size=4, depths=[1, 1],
                     num_attention_heads=[1, 2], hidden_size=8, projection_dim=8,
                     enable_fusion=True, aff_block_r=4)
    torch.manual_seed(0)
    model = ClapModel(ClapConfig(text_config=text_cfg, audio_config=audio_cfg, projection_dim=8)).eval()
    sd = {k: v.contiguous() for k, v in model.state_dict().items()}
    save_file(sd, os.path.join(d, "model.safetensors"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"text_config": text_cfg, "audio_config": audio_cfg}, f)
    _write_tokenizer_files(d)
    return d


def test_cli_generate_best_of(tiny_checkpoint, tiny_clap_dir, tmp_path):
    """--best-of N generates N candidates in one batch and keeps the
    CLAP-highest: the kept wav must be one of the --batch N candidates from
    the same seed (identical latents), and the guard rails must fire."""
    cand = str(tmp_path / "cand.wav")
    cli.main([
        "generate", "--checkpoint", tiny_checkpoint, "--prompt", "hip hop music",
        "--steps", "2", "--seconds", "0.01", "--batch", "2", "--seed", "5",
        "--output", cand, "--fp32",
    ])
    c0, _ = read_wav(str(tmp_path / "cand_0.wav"))
    c1, _ = read_wav(str(tmp_path / "cand_1.wav"))
    assert not np.array_equal(c0, c1)  # per-row latents differ

    best = str(tmp_path / "best.wav")
    cli.main([
        "generate", "--checkpoint", tiny_checkpoint, "--prompt", "hip hop music",
        "--steps", "2", "--seconds", "0.01", "--best-of", "2", "--seed", "5",
        "--clap", tiny_clap_dir, "--output", best, "--fp32",
    ])
    b, _ = read_wav(best)
    assert np.array_equal(b, c0) or np.array_equal(b, c1)

    with pytest.raises(SystemExit, match="--clap"):
        cli.main(["generate", "--checkpoint", tiny_checkpoint, "--prompt", "x",
                  "--best-of", "2", "--output", best])
    with pytest.raises(SystemExit, match="--batch 1"):
        cli.main(["generate", "--checkpoint", tiny_checkpoint, "--prompt", "x",
                  "--best-of", "2", "--batch", "2", "--clap", tiny_clap_dir,
                  "--output", best])


def test_cli_score(tiny_clap_dir, tmp_path, rng):
    gen_dir = tmp_path / "gen"
    ref_dir = tmp_path / "ref"
    gen_dir.mkdir(), ref_dir.mkdir()
    for i in range(3):
        write_wav(str(gen_dir / f"g{i}.wav"), rng.uniform(-0.4, 0.4, 8000).astype(np.float32), 16000)
        write_wav(str(ref_dir / f"r{i}.wav"), rng.uniform(-0.4, 0.4, 8000).astype(np.float32), 16000)
    out = str(tmp_path / "scores.json")
    cli.main([
        "score", "--checkpoint", tiny_clap_dir, "--generated", str(gen_dir),
        "--reference", str(ref_dir), "--prompt", "hip hop music", "--output", out,
    ])
    results = json.load(open(out))
    assert results["num_generated"] == 3
    assert 0.0 <= results["clap_score_mean"] <= 1.0
    assert np.isfinite(results["kad"])


def test_embed_audio_chunked_matches_unchunked(tiny_clap_dir, rng):
    """Fixed-size chunked corpus embedding (one compile for any corpus
    length) is numerically identical to the single-batch path."""
    from audioldm_tpu.eval.scoring import ClapScorer

    scorer = ClapScorer.from_checkpoint(tiny_clap_dir)
    wavs = [rng.uniform(-0.4, 0.4, 48000).astype(np.float32) for _ in range(5)]
    one = np.asarray(scorer.embed_audio(wavs, batch_size=None))
    chunked = np.asarray(scorer.embed_audio(wavs, batch_size=2))  # 2+2+1(pad)
    np.testing.assert_allclose(chunked, one, atol=2e-5)


def test_cli_train_with_validation(tiny_checkpoint, tiny_clap_dir, tmp_path, rng):
    """End-to-end train entry point with periodic validation wired (the
    reference's epoch-cadence log_validation, train_audioldm_lora.py:597-607):
    produces validation wavs, mel PNGs, and clap/kad metric keys."""
    import yaml

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    for i in range(4):
        write_wav(str(data_dir / f"{i}.wav"), rng.uniform(-0.4, 0.4, 4000).astype(np.float32), 16000)
        (data_dir / f"{i}.txt").write_text("hip hop music")

    cfg_path = tmp_path / "run.yaml"
    yaml.safe_dump(
        {
            "validation_prompt": "hip hop music",
            "num_validation_images": 2,
            "lora": {"r": 2, "lora_alpha": 2},
            "train": {"train_batch_size": 2, "max_train_steps": 97000, "checkpointing_steps": 1000},
            "mel": {"n_mel": 8, "duration": 0.16},
        },
        cfg_path.open("w"),
    )
    out_dir = str(tmp_path / "out")
    cli.main([
        "train", "--checkpoint", tiny_checkpoint, "--config", str(cfg_path),
        "--dataset", str(data_dir), "--output", out_dir, "--epochs", "2",
        "--dp", "1", "--log-every", "1", "--validate-every", "1",
        "--clap-dir", tiny_clap_dir, "--val-clips", "2", "--val-steps", "2",
        "--val-seconds", "0.01", "--tensorboard",
    ])
    files = os.listdir(out_dir)
    assert any(f.startswith("validation_") and f.endswith(".wav") for f in files)
    assert any(f.startswith("validation_mel_") and f.endswith(".png") for f in files)
    assert "tensorboard" in files
    recs = [json.loads(l) for l in open(os.path.join(out_dir, "metrics.jsonl"))]
    keys = set().union(*[set(r) for r in recs])
    # metric names mirror the reference's wandb keys
    assert {"train_loss", "total_train_loss", "lr", "epoch"} <= keys
    assert {"clap_score", "original_clap_score", "kad_score_lora", "kad_score_original"} <= keys


def test_cli_distill_then_lcm_generate(tiny_checkpoint, tmp_path, rng):
    """End-to-end LCM distillation entry point: distill a few steps on tiny
    data, then sample with the exported adapter via --scheduler lcm in 4
    steps (the fewer-FLOPs path PERF.md's roofline points at)."""
    import yaml

    data_dir = tmp_path / "ddata"
    data_dir.mkdir()
    for i in range(4):
        write_wav(str(data_dir / f"{i}.wav"), rng.uniform(-0.4, 0.4, 4000).astype(np.float32), 16000)
        (data_dir / f"{i}.txt").write_text("hip hop music")
    cfg_path = tmp_path / "drun.yaml"
    yaml.safe_dump(
        {
            "lora": {"r": 2, "lora_alpha": 2},
            "train": {"train_batch_size": 2, "learning_rate": 0.001},
            "mel": {"n_mel": 8, "duration": 0.16},
        },
        cfg_path.open("w"),
    )
    out_dir = str(tmp_path / "lcm")
    cli.main([
        "distill", "--checkpoint", tiny_checkpoint, "--config", str(cfg_path),
        "--dataset", str(data_dir), "--output", out_dir, "--max-steps", "3",
        "--batch-size", "2", "--log-every", "1", "--w", "2.0", "--dp", "1",
    ])
    assert os.path.exists(os.path.join(out_dir, "model.safetensors"))
    recs = [json.loads(l) for l in open(os.path.join(out_dir, "metrics.jsonl"))]
    assert all(np.isfinite(r["distill_loss"]) for r in recs)

    out = str(tmp_path / "lcm4.wav")
    cli.main([
        "generate", "--checkpoint", tiny_checkpoint, "--prompt", "hip hop music",
        "--lora", os.path.join(out_dir, "model.safetensors"),
        "--scheduler", "lcm", "--steps", "4", "--seconds", "0.01",
        "--output", out, "--fp32",
    ])
    wav, sr = read_wav(out)
    assert sr == 16000 and len(wav) == 160 and np.all(np.isfinite(wav))


def test_cli_score_checkpoint_subfolder_layout(tiny_clap_dir, tmp_path, rng):
    """score --checkpoint accepts a checkpoint dir with a clap/ subfolder, as
    its help documents (VERDICT missing #6)."""
    import shutil

    ckpt = tmp_path / "ckpt_with_clap"
    ckpt.mkdir()
    shutil.copytree(tiny_clap_dir, str(ckpt / "clap"))
    gen_dir = tmp_path / "gen2"
    gen_dir.mkdir()
    for i in range(2):
        write_wav(str(gen_dir / f"g{i}.wav"), rng.uniform(-0.4, 0.4, 8000).astype(np.float32), 16000)
    out = str(tmp_path / "scores2.json")
    cli.main([
        "score", "--checkpoint", str(ckpt), "--generated", str(gen_dir),
        "--prompt", "hip hop music", "--output", out,
    ])
    results = json.load(open(out))
    assert results["num_generated"] == 2


def test_cli_serve(tiny_checkpoint, tmp_path):
    """serve CLI: requests jsonl + adapter bank -> wavs in request order
    (BASELINE config 5 surface)."""
    import jax

    from safetensors.numpy import save_file

    from audioldm_tpu.ckpt import load_audioldm_checkpoint
    from audioldm_tpu.config import LoRAConfig
    from audioldm_tpu.lora import export_peft_state_dict, init_lora

    bundle = load_audioldm_checkpoint(tiny_checkpoint)
    lora = init_lora(jax.random.PRNGKey(1), bundle["params"]["unet"], LoRAConfig(r=2, lora_alpha=2))
    lora = jax.tree.map(lambda x: x + 0.05, lora)
    lora_path = str(tmp_path / "hiphop.safetensors")
    save_file({k: np.asarray(v) for k, v in export_peft_state_dict(lora).items()}, lora_path)

    reqs = tmp_path / "reqs.jsonl"
    reqs.write_text(
        '{"prompt": "hip hop beat", "adapter": "hiphop"}\n'
        '{"prompt": "jazz piano", "adapter": null}\n'
        '{"prompt": "boom bap", "adapter": "hiphop"}\n'
    )
    out = str(tmp_path / "served")
    cli.main([
        "serve", "--checkpoint", tiny_checkpoint, "--requests", str(reqs),
        "--lora", f"hiphop={lora_path}", "--steps", "2", "--seconds", "0.01",
        "--output", out, "--fp32",
    ])
    wavs = sorted(os.listdir(out))
    assert wavs == ["000000.wav", "000001.wav", "000002.wav"]
    w0, sr = read_wav(os.path.join(out, "000000.wav"))
    assert sr == 16000 and len(w0) == 160 and np.any(w0 != 0)


def test_cli_generate_guidance_interval(tiny_checkpoint, tmp_path):
    """--guidance-interval generates end to end; malformed/incompatible
    values fail fast with a clean message (limited-interval CFG,
    pipeline/generate.py denoise)."""
    out = str(tmp_path / "gi.wav")
    cli.main([
        "generate", "--checkpoint", tiny_checkpoint, "--prompt", "hip hop music",
        "--steps", "2", "--seconds", "0.01", "--output", out, "--fp32",
        "--guidance-interval", "0.0,0.3",
    ])
    wav, sr = read_wav(out)
    assert sr == 16000 and len(wav) == 160 and np.any(wav != 0)

    base = ["generate", "--checkpoint", tiny_checkpoint, "--prompt", "x",
            "--steps", "2", "--seconds", "0.01", "--fp32",
            "--output", str(tmp_path / "o.wav")]
    with pytest.raises(SystemExit, match="LO,HI"):
        cli.main(base + ["--guidance-interval", "0.1"])
    with pytest.raises(SystemExit, match="0 <= LO <= HI <= 1"):
        cli.main(base + ["--guidance-interval", "0.7,0.2"])
    with pytest.raises(SystemExit, match="lcm"):
        cli.main(base + ["--guidance-interval", "0.1,0.5", "--scheduler", "lcm"])
    with pytest.raises(SystemExit, match="not combinable"):
        cli.main(base + ["--guidance-interval", "0.1,0.5", "--window-seconds", "0.005"])

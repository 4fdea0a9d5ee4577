"""Command-line entry points — the framework's replacements for the
reference's scripts (SURVEY.md §2a components 1, 10-14):

  generate        text->audio (replaces app.py + script/inference/generate_audio.py)
  train           LoRA fine-tune (replaces script/train/train_audioldm_lora.py)
  distill         LCM consistency distillation: 50-step CFG sampler -> 1-8 step
                  LoRA adapter (beyond the reference; train/distill.py)
  serve           batched multi-LoRA serving: requests jsonl -> wavs (BASELINE config 5;
                  the reference has only the single-adapter merge script)
  score           CLAP/KAD scoring of wav dirs (replaces script/inference/inference.py,
                  which cannot even import in the reference — SURVEY.md §0)
  export-dataset  HF dataset -> wav+caption-txt pairs (replaces data/dataset/make_audio_caption.py)
  push-dataset    wav+txt dir -> HF dataset [+hub push] (replaces data/dataset/push_to_huggingHace_datasets.py)
  slice           cut wavs into fixed segments (replaces test.py)

Unlike the reference (which hardcodes every hyperparameter and never reads
its own config.yaml — SURVEY.md §5 'Config/flag system'), every command
honors the typed RunConfig/yaml schema with CLI overrides.

Usage: python -m audioldm_tpu.cli <command> [options]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _is_float(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def _parse_ranges(spec: str, conv):
    """``LO-HI[,LO-HI...]`` -> list of 2-tuples. Raises ValueError on any
    piece that is not exactly two ``conv``-parseable values (``0-1-2`` must
    not silently become a 3-tuple — advisor round-3 finding)."""
    out = []
    for r in spec.split(","):
        parts = r.split("-")
        if len(parts) != 2:
            raise ValueError(f"range {r!r} is not LO-HI")
        out.append((conv(parts[0]), conv(parts[1])))
    return out


def _add_generate(sub):
    p = sub.add_parser("generate", help="text -> audio")
    p.add_argument("--checkpoint", required=True, help="audioldm checkpoint dir (HF layout)")
    p.add_argument("--prompt", required=True)
    p.add_argument("--negative-prompt", default="")
    p.add_argument("--lora", action="append", default=None, metavar="PATH[:WEIGHT]",
                   help="PEFT LoRA safetensors to merge at load; repeat with "
                        ":WEIGHT suffixes for an exact weighted composition "
                        "(delta = sum_i w_i*(alpha/r)*B_i A_i)")
    p.add_argument("--lora-alpha", type=float, default=None)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--guidance", type=float, default=2.5)
    p.add_argument("--scheduler", default="ddim", choices=["ddim", "dpm++", "lcm"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--best-of", type=int, default=None,
                   help="generate N candidates in one batch and keep the one the CLAP "
                        "model scores highest against the prompt (requires --clap; "
                        "automatic-scoring analog of the reference's validation CLAP "
                        "formula, train_audioldm_lora.py:128-137)")
    p.add_argument("--clap", default=None,
                   help="CLAP model dir (or a checkpoint dir holding clap/) for --best-of")
    p.add_argument("--output", default="output.wav")
    p.add_argument("--init-audio", default=None, metavar="WAV",
                   help="audio-to-audio: SDEdit style transfer from this clip "
                        "(VAE-encode, noise to --strength's timestep, denoise the rest)")
    p.add_argument("--strength", type=float, default=None,
                   help="(0,1] fraction of the schedule to re-run for --init-audio "
                        "(diffusers img2img convention; 1.0 = full redraw from the "
                        "noised init; default 0.75)")
    p.add_argument("--inpaint", default=None, metavar="T0-T1[,T0-T1...]",
                   help="second-ranges of --init-audio to REGENERATE; the rest is held "
                        "to the source every DDIM step (latent inpainting)")
    p.add_argument("--inpaint-freq", default=None, metavar="LO-HI[,LO-HI...]",
                   help="mel-bin ranges (of 64) to regenerate across the whole clip — "
                        "e.g. 32-64 redraws the top octave (super-resolution)")
    p.add_argument("--sample-posterior", action="store_true",
                   help="sample the VAE posterior for --init-audio instead of its mode")
    p.add_argument("--window-seconds", type=float, default=None,
                   help="long-form clips: MultiDiffusion windowed denoising — predict eps on "
                        "overlapping windows of this many seconds (one batched UNet call per "
                        "step) and average the overlaps; linear instead of quadratic cost in "
                        "clip length. Off = exact reference sampling")
    p.add_argument("--window-overlap", type=float, default=0.5,
                   help="fraction of window overlap for --window-seconds (default 0.5)")
    p.add_argument("--guidance-interval", default=None, metavar="LO,HI",
                   help="limited-interval CFG (Kynkäänniemi et al. 2024): apply guidance only "
                        "on steps whose timestep falls in [LO,HI] (fractions of the train "
                        "range, e.g. 0.05,0.65); other steps run the conditional-only UNet at "
                        "half cost. Off = exact reference every-step CFG")
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel devices: shard the UNet's attention/FF over a tp mesh for multi-chip latency scaling (parallel/tp.py)")


def cmd_generate(args):
    import jax
    import jax.numpy as jnp

    from audioldm_tpu.config import LoRAConfig
    from audioldm_tpu.data.tokenizer import load_tokenizer
    from audioldm_tpu.data.wavio import write_wav
    from audioldm_tpu.pipeline.generate import AudioLDMModules, make_generate_fn

    if jax.devices()[0].platform == "tpu":
        from audioldm_tpu.kernels import use_flash_attention, use_fused_mrf

        use_flash_attention(True)  # 1.7x faster sampling on TPU (PERF.md)
        use_fused_mrf(True)  # fused vocoder MRF stages, -18% vocoder (PERF.md)

    modules = AudioLDMModules.from_checkpoint(args.checkpoint)
    if args.lora:
        from audioldm_tpu.ckpt import load_safetensors
        from audioldm_tpu.lora import compose_adapters, import_peft_state_dict, merge_lora

        parts = []
        for spec in args.lora:
            path, sep, w = spec.rpartition(":")
            if sep and not os.path.exists(spec) and _is_float(w):
                weight = float(w)
            else:
                path, weight = spec, 1.0
            lora, rank = import_peft_state_dict(load_safetensors(path))
            alpha = args.lora_alpha if args.lora_alpha is not None else float(rank)
            parts.append((lora, LoRAConfig(r=rank, lora_alpha=alpha), weight))
        # zero-overhead inference: merge at load (W += sum_i w_i*(alpha/r)*A_i B_i)
        composed, ccfg = compose_adapters(parts)
        modules = modules._replace(unet=merge_lora(modules.unet, composed, ccfg))
        desc = ", ".join(f"{s} (r={c.r}, w={w})" for (_, c, w), s in zip(parts, args.lora))
        print(f"merged LoRA: {desc}")

    if args.best_of is not None:
        if args.best_of < 2 or args.batch != 1:
            raise SystemExit("--best-of needs N >= 2 and --batch 1 (candidates fill the batch)")
        if not args.clap:
            raise SystemExit("--best-of needs --clap (CLAP model dir for reranking)")
        args.batch = args.best_of

    tokenizer = load_tokenizer(os.path.join(args.checkpoint, "tokenizer"))
    tok = tokenizer([args.prompt] * args.batch)
    unc = tokenizer([args.negative_prompt])

    if not args.init_audio:
        # audio-to-audio flags are meaningless without an init clip; running
        # plain text-to-audio instead would silently ignore the user's intent
        a2a_flags = [f for f, on in (("--strength", args.strength is not None),
                                     ("--inpaint", args.inpaint is not None),
                                     ("--inpaint-freq", args.inpaint_freq is not None),
                                     ("--sample-posterior", args.sample_posterior)) if on]
        if a2a_flags:
            verb = "requires" if len(a2a_flags) == 1 else "require"
            raise SystemExit(f"{'/'.join(a2a_flags)} {verb} --init-audio WAV (audio-to-audio)")

    guidance_interval = None
    if args.guidance_interval is not None:
        try:
            lo, hi = (float(x) for x in args.guidance_interval.split(","))
        except ValueError:
            raise SystemExit("--guidance-interval expects LO,HI fractions (e.g. 0.05,0.65)")
        if not 0.0 <= lo <= hi <= 1.0:
            raise SystemExit("--guidance-interval needs 0 <= LO <= HI <= 1")
        if args.scheduler == "lcm":
            raise SystemExit("--guidance-interval is meaningless with lcm (no CFG)")
        if args.window_seconds is not None or args.tp > 1 or args.init_audio:
            raise SystemExit("--guidance-interval is not combinable with --window-seconds/--tp/--init-audio")
        guidance_interval = (lo, hi)

    if args.init_audio:
        if args.tp > 1 or args.best_of is not None or args.window_seconds is not None:
            raise SystemExit("--init-audio is not combinable with --tp/--best-of/--window-seconds")
        if args.scheduler == "lcm":
            raise SystemExit("--init-audio supports ddim/dpm++ (lcm uses its own distilled grid)")
        if args.strength is None:
            args.strength = 0.75
        if int(args.steps * args.strength) < 1:
            raise SystemExit(
                f"--strength {args.strength} too low for --steps {args.steps}: "
                "int(steps * strength) must be >= 1 (it is the number of denoise steps run)"
            )
        if (args.inpaint or args.inpaint_freq) and args.scheduler != "ddim":
            raise SystemExit("--inpaint/--inpaint-freq require --scheduler ddim")
        from audioldm_tpu.data.wavio import read_wav
        from audioldm_tpu.ops.resample import resample_np
        from audioldm_tpu.pipeline import latent_mask, make_a2a_fn, prepare_init_mel

        wav_in, sr_in = read_wav(args.init_audio)
        wav_in = np.asarray(wav_in, np.float32)
        if wav_in.ndim == 2:
            wav_in = wav_in.mean(axis=-1)
        sr_model = modules.vocoder_cfg.sampling_rate
        if sr_in != sr_model:
            wav_in = resample_np(wav_in, sr_in, sr_model)
        mel_init = prepare_init_mel(wav_in, modules, args.seconds)

        inp_mask = None
        if args.inpaint or args.inpaint_freq:
            try:
                times = _parse_ranges(args.inpaint, float) if args.inpaint else None
                freqs = _parse_ranges(args.inpaint_freq, int) if args.inpaint_freq else None
            except ValueError:
                raise SystemExit("--inpaint/--inpaint-freq expect LO-HI[,LO-HI...] ranges")
            inp_mask = latent_mask(modules, args.seconds, regenerate_times=times,
                                   regenerate_mel_bins=freqs)

        _a2a = make_a2a_fn(
            modules, num_inference_steps=args.steps, audio_length_in_s=args.seconds,
            strength=args.strength, guidance_scale=args.guidance,
            dtype=jnp.float32 if args.fp32 else jnp.bfloat16, scheduler=args.scheduler,
            inpaint_mask=inp_mask, sample_posterior=args.sample_posterior,
        )

        def fn(ids, am, uids, uam, rng, _a2a=_a2a, _mel=mel_init):
            return _a2a(_mel, ids, am, uids, uam, rng)

        mode = "inpainting" if inp_mask is not None else f"style transfer (strength {args.strength})"
        print(f"audio-to-audio from {args.init_audio}: {mode}")
    elif args.tp > 1:
        if args.window_seconds is not None:
            raise SystemExit("--window-seconds is not wired into the --tp path; use one or the other")
        from audioldm_tpu.parallel import make_tp_generate_fn, make_tp_mesh, shard_modules

        mesh = make_tp_mesh(args.tp)
        fn = make_tp_generate_fn(
            shard_modules(mesh, modules), mesh, num_inference_steps=args.steps,
            audio_length_in_s=args.seconds, guidance_scale=args.guidance,
            dtype=jnp.float32 if args.fp32 else jnp.bfloat16, scheduler=args.scheduler,
        )
        print(f"tensor-parallel over {args.tp} devices (attention heads + FF sharded)")
    else:
        fn = make_generate_fn(
            modules, num_inference_steps=args.steps, audio_length_in_s=args.seconds,
            guidance_scale=args.guidance, dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
            scheduler=args.scheduler, window_seconds=args.window_seconds,
            window_overlap=args.window_overlap, guidance_interval=guidance_interval,
        )
        # AOT-compile the two stage programs in parallel threads: overlaps
        # the remote compiles, ~-20% one-shot CLI latency on TPU (PERF.md)
        fn.precompile(
            jnp.asarray(tok["input_ids"]), jnp.asarray(tok["attention_mask"]),
            jnp.asarray(unc["input_ids"]), jnp.asarray(unc["attention_mask"]),
            jax.random.PRNGKey(args.seed),
        )
    wav = np.asarray(
        fn(
            jnp.asarray(tok["input_ids"]), jnp.asarray(tok["attention_mask"]),
            jnp.asarray(unc["input_ids"]), jnp.asarray(unc["attention_mask"]),
            jax.random.PRNGKey(args.seed),
        )
    )
    sr = modules.vocoder_cfg.sampling_rate
    if args.best_of is not None:
        from audioldm_tpu.eval.scoring import ClapScorer
        from audioldm_tpu.ops import resample

        scorer = ClapScorer.from_checkpoint(args.clap)
        wav48 = [np.asarray(resample(jnp.asarray(w), sr, 48000)) for w in wav]
        scores = scorer.clap_scores(wav48, args.prompt)
        best = int(np.argmax(scores))
        write_wav(args.output, wav[best], sr)
        print(f"best-of-{args.best_of}: kept candidate {best} "
              f"(clap {scores[best]:.4f}; all: {[round(float(s), 4) for s in scores]})")
        print(f"wrote {args.output}")
    elif args.batch == 1:
        write_wav(args.output, wav[0], sr)
        print(f"wrote {args.output}")
    else:
        stem, ext = os.path.splitext(args.output)
        for i in range(args.batch):
            write_wav(f"{stem}_{i}{ext}", wav[i], sr)
        print(f"wrote {args.batch} clips to {stem}_*{ext}")


def _add_train(sub):
    p = sub.add_parser("train", help="LoRA fine-tune")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--config", default=None, help="run config yaml (config.yaml schema)")
    p.add_argument("--dataset", default=None, help="HF dataset id or wav+txt dir (overrides config)")
    p.add_argument("--output", default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None, help="train for N epochs (config num_train_epochs)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--log-every", type=int, default=10, help="host metric fetch cadence (steps)")
    p.add_argument("--profile-dir", default=None, help="capture a jax.profiler device trace of steps 2-5 into this dir (xprof/TensorBoard)")
    p.add_argument("--dp", type=int, default=None, help="data-parallel devices (default: all)")
    # periodic validation (reference: log_validation every validation_epochs
    # epochs, train_audioldm_lora.py:597-607)
    p.add_argument("--validate-every", type=int, default=None, help="validation cadence in EPOCHS (default: config validation_epochs; 0 disables)")
    p.add_argument("--clap-dir", default=None, help="CLAP model dir for validation CLAP/KAD scoring")
    p.add_argument("--val-prompt", default=None, help="validation prompt (default: config validation_prompt)")
    p.add_argument("--val-clips", type=int, default=None, help="clips per validation (default: config num_validation_images)")
    p.add_argument("--val-steps", type=int, default=50)
    p.add_argument("--val-seconds", type=float, default=4.0)


def cmd_train(args):
    import jax
    import jax.numpy as jnp

    from audioldm_tpu.config import RunConfig
    from audioldm_tpu.data import AudioCaptionDataset, DataPipeline
    from audioldm_tpu.data.tokenizer import load_tokenizer
    from audioldm_tpu.lora import init_lora
    from audioldm_tpu.parallel import make_mesh
    from audioldm_tpu.pipeline.generate import AudioLDMModules
    from audioldm_tpu.train import Trainer
    from audioldm_tpu.train.trainer import init_train_state
    from audioldm_tpu.utils import MetricLogger

    import dataclasses as _dc

    run = RunConfig.from_yaml(args.config) if args.config else RunConfig()
    if args.dataset:
        run = _dc.replace(run, dataset_hub_id=args.dataset)
    output_dir = args.output or run.output_dir
    tcfg = run.train
    if args.max_steps:
        tcfg = _dc.replace(tcfg, max_train_steps=args.max_steps)
    if args.batch_size:
        tcfg = _dc.replace(tcfg, train_batch_size=args.batch_size)

    if jax.devices()[0].platform == "tpu":
        from audioldm_tpu.kernels import use_flash_attention, use_fused_mrf

        use_flash_attention(True)  # 1.8x faster training step on TPU (PERF.md)
        use_fused_mrf(True)  # fused vocoder MRF in the validation generator

    modules = AudioLDMModules.from_checkpoint(args.checkpoint)
    tokenizer = load_tokenizer(os.path.join(args.checkpoint, "tokenizer"))

    if os.path.isdir(run.dataset_hub_id):
        source = run.dataset_hub_id
    else:
        from datasets import load_dataset

        source = load_dataset(run.dataset_hub_id, split="train")
    pipe = DataPipeline(
        AudioCaptionDataset(source), tokenizer, run.mel,
        add_ons=run.data.add_ons, trim=run.data.trim,
        freqm=run.data.freqm, timem=run.data.timem,
    )

    mesh = make_mesh(args.dp) if (args.dp or jax.device_count() > 1) else None
    logger = MetricLogger(output_dir, wandb_config=run.wandb, use_wandb=args.wandb,
                          use_tensorboard=args.tensorboard)
    trainer = Trainer(modules, run.lora, tcfg, output_dir, mesh=mesh, logger=logger,
                      dtype=jnp.bfloat16 if tcfg.mixed_precision == "bfloat16" else jnp.float32)
    # the trainer may have cast the frozen towers to bf16 — drop our fp32
    # reference so only ONE copy of the GB-scale weights stays in HBM
    # (validation closures below must capture the same bundle)
    modules = trainer.modules

    lora = init_lora(jax.random.PRNGKey(tcfg.seed), modules.unet, run.lora)
    state = init_train_state(lora, trainer.optimizer)
    if args.resume:
        state = trainer.restore(state)
        print(f"resumed at step {int(state.step)}")

    # accelerate semantics (train_audioldm_lora.py:407,445-447): one optimizer
    # step consumes per-device-batch x num_devices x accumulation samples —
    # fit() splits the flat batch into [accum, micro, ...] where the micro
    # axis (bs x dp) shards over the mesh
    global_bs = (
        tcfg.train_batch_size
        * (mesh.devices.size if mesh else 1)
        * max(tcfg.gradient_accumulation_steps, 1)
    )
    steps_per_epoch = max(len(pipe.dataset) // global_bs, 1)

    # measured sizing hint (PERF.md round-3 sweep): per-chip samples/s PEAKS at
    # per-device batch 2 on v5e (the 4096-token attention saturates the MXU) and
    # declines monotonically after; scale-out belongs to dp, not batch
    if tcfg.train_batch_size > 2 and jax.devices()[0].platform == "tpu":
        print(
            f"hint: per-device batch {tcfg.train_batch_size} > 2 lowers per-chip "
            "throughput on v5e (measured peak: b=2, ~39.5 samples/s/chip; see "
            "PERF.md train sweep) — prefer batch_size=2 with more dp/accum"
        )

    # periodic validation harness (reference: train_audioldm_lora.py:597-607)
    validate_every_epochs = args.validate_every if args.validate_every is not None else run.validation_epochs
    validate_fn = None
    if validate_every_epochs and validate_every_epochs > 0:
        from audioldm_tpu.train.validation import log_validation

        scorer = None
        if args.clap_dir:
            from audioldm_tpu.eval.scoring import ClapScorer

            scorer = ClapScorer.from_checkpoint(args.clap_dir)
        val_prompt = args.val_prompt or run.validation_prompt
        val_clips = args.val_clips or run.num_validation_images
        # KAD reference corpus: prepared dataset clips (the reference scores
        # against its training-set audio list, train:597-607)
        ref_audios = None
        if scorer is not None:
            rng0 = np.random.default_rng(tcfg.seed)
            ref_audios = []
            for i in range(min(val_clips, len(pipe.dataset))):
                wav, sr, _ = pipe.dataset.get_raw(i)
                prepared, _ = pipe.prepare_waveform(wav, sr, rng0)
                ref_audios.append(prepared)

        # ONE compiled generate fn reused across every validation (a fresh
        # make_generate_fn per call would re-trace the whole pipeline)
        from audioldm_tpu.pipeline.generate import make_generate_fn

        val_generate = make_generate_fn(
            modules, num_inference_steps=args.val_steps,
            audio_length_in_s=args.val_seconds, with_lora=True,
        )

        def validate_fn(state, step):
            return log_validation(
                modules, state.lora, run.lora, tokenizer, val_prompt,
                num_clips=val_clips, num_inference_steps=args.val_steps,
                audio_length_in_s=args.val_seconds, scorer=scorer,
                ref_audios_16k=ref_audios, logger=logger, step=step,
                seed=tcfg.seed, generate_fn=val_generate,
            )

    # train-step pytree: the loss keys plus any numeric add-on outputs
    # (conditioning signals ride along like the reference's full collate
    # dict, train_audioldm_lora.py:415-420 — XLA drops unused inputs); the
    # big host-side intermediates (waveform/stft) and eval-only extras stay
    # on the host
    base_keys = ("log_mel_spec", "input_ids", "attention_mask")
    host_only = {"waveform", "stft", "waveform_48k", "random_start",
                 "duration", "sampling_rate", "text"}

    def to_device_batch(b):
        out = {k: b[k] for k in base_keys}
        for k, v in b.items():
            if k not in out and k not in host_only and isinstance(v, np.ndarray):
                out[k] = v
        return out

    data_iter = (
        to_device_batch(b)
        for b in pipe.batches(global_bs, np.random.default_rng(tcfg.seed), prefetch=run.data.prefetch)
    )
    state, metrics = trainer.fit(
        state, data_iter, jax.random.PRNGKey(tcfg.seed + 1),
        log_every=args.log_every,
        steps_per_epoch=steps_per_epoch,
        num_epochs=args.epochs or (tcfg.num_train_epochs if args.max_steps is None else None),
        validate_every_epochs=validate_every_epochs if validate_fn else None,
        validate_fn=validate_fn,
        profile_dir=args.profile_dir,
    )
    trainer.save(state)
    if "loss" in metrics:
        print(f"done at step {int(state.step)}; final loss {float(metrics['loss']):.4f}")
    else:
        print(f"done at step {int(state.step)}; no steps run (already at max_steps or empty dataset)")


def _add_distill(sub):
    p = sub.add_parser(
        "distill",
        help="LCM consistency-distill the 50-step CFG sampler into a 1-8 step "
             "LoRA adapter (serve it with generate --scheduler lcm --lora ...)",
    )
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--config", default=None, help="run config yaml (config.yaml schema)")
    p.add_argument("--dataset", default=None, help="HF dataset id or wav+txt dir (overrides config)")
    p.add_argument("--output", required=True)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--w", default="2.5",
                   help="guidance baked into the student: a float, or LO,HI to sample w~U[LO,HI] per example")
    p.add_argument("--ema-decay", type=float, default=0.95)
    p.add_argument("--num-ddim-steps", type=int, default=50, help="teacher trajectory grid size")
    p.add_argument("--teacher-lora", default=None,
                   help="PEFT safetensors merged into the teacher first (distill a fine-tuned genre model)")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--dp", type=int, default=None, help="data-parallel devices (default: all)")


def cmd_distill(args):
    import jax
    import jax.numpy as jnp

    from audioldm_tpu.config import RunConfig
    from audioldm_tpu.data import AudioCaptionDataset, DataPipeline
    from audioldm_tpu.data.tokenizer import load_tokenizer
    from audioldm_tpu.lora import init_lora
    from audioldm_tpu.parallel import make_mesh
    from audioldm_tpu.pipeline.generate import AudioLDMModules
    from audioldm_tpu.train import make_optimizer
    from audioldm_tpu.train.distill import (
        add_uncond_tokens, init_distill_state, make_distill_step,
    )
    from audioldm_tpu.utils import MetricLogger

    import dataclasses as _dc

    run = RunConfig.from_yaml(args.config) if args.config else RunConfig()
    if args.dataset:
        run = _dc.replace(run, dataset_hub_id=args.dataset)
    tcfg = run.train
    if args.max_steps:
        tcfg = _dc.replace(tcfg, max_train_steps=args.max_steps)
    if args.batch_size:
        tcfg = _dc.replace(tcfg, train_batch_size=args.batch_size)
    w = tuple(float(x) for x in args.w.split(",")) if "," in args.w else float(args.w)

    if jax.devices()[0].platform == "tpu":
        from audioldm_tpu.kernels import use_flash_attention, use_fused_mrf

        use_flash_attention(True)
        use_fused_mrf(True)

    modules = AudioLDMModules.from_checkpoint(args.checkpoint)
    tokenizer = load_tokenizer(os.path.join(args.checkpoint, "tokenizer"))
    if args.teacher_lora:
        from audioldm_tpu.ckpt import load_safetensors
        from audioldm_tpu.config import LoRAConfig
        from audioldm_tpu.lora import import_peft_state_dict, merge_lora

        tree, rank = import_peft_state_dict(load_safetensors(args.teacher_lora))
        modules = modules._replace(
            unet=merge_lora(modules.unet, tree, LoRAConfig(r=rank, lora_alpha=float(rank)))
        )
    dtype = jnp.bfloat16 if tcfg.mixed_precision == "bfloat16" else jnp.float32
    if dtype == jnp.bfloat16:
        bf = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
        modules = modules._replace(unet=bf(modules.unet), vae=bf(modules.vae))

    if os.path.isdir(run.dataset_hub_id):
        source = run.dataset_hub_id
    else:
        from datasets import load_dataset

        source = load_dataset(run.dataset_hub_id, split="train")
    pipe = DataPipeline(AudioCaptionDataset(source), tokenizer, run.mel)

    mesh = make_mesh(args.dp) if (args.dp or jax.device_count() > 1) else None
    dp = mesh.devices.size if mesh else 1
    global_bs = tcfg.train_batch_size * dp
    logger = MetricLogger(args.output)

    lora = init_lora(jax.random.PRNGKey(tcfg.seed), modules.unet, run.lora)
    optimizer = make_optimizer(tcfg)
    state = init_distill_state(lora, optimizer)
    step_fn = make_distill_step(
        modules, optimizer, run.lora, mesh=mesh, dtype=dtype, w=w,
        num_ddim_steps=args.num_ddim_steps, ema_decay=args.ema_decay,
    )

    base_keys = ("log_mel_spec", "input_ids", "attention_mask")
    rng = jax.random.PRNGKey(tcfg.seed + 1)
    data_iter = pipe.batches(global_bs, np.random.default_rng(tcfg.seed), prefetch=run.data.prefetch)
    metrics = {}
    for batch in data_iter:
        if int(state.step) >= tcfg.max_train_steps:
            break
        b = add_uncond_tokens({k: batch[k] for k in base_keys}, tokenizer)
        rng, key = jax.random.split(rng)
        state, metrics = step_fn(state, b, key)
        step = int(state.step)
        if step % args.log_every == 0 or step == tcfg.max_train_steps:
            logger.log({"distill_loss": float(metrics["loss"]),
                        "grad_norm": float(metrics["grad_norm"])}, step=step)

    # EMA adapter is the sampler (model.safetensors, PEFT layout -> usable by
    # generate/serve --lora with --scheduler lcm); raw student kept alongside
    from safetensors.numpy import save_file

    from audioldm_tpu.lora import export_peft_state_dict

    os.makedirs(args.output, exist_ok=True)
    for name, tree in (("model", state.ema_lora), ("student", state.lora)):
        sd = {k: np.asarray(v) for k, v in export_peft_state_dict(jax.device_get(tree)).items()}
        save_file(sd, os.path.join(args.output, f"{name}.safetensors"))
    loss_txt = f"; final loss {float(metrics['loss']):.4f}" if "loss" in metrics else ""
    print(f"distilled {int(state.step)} steps -> {args.output}/model.safetensors{loss_txt}")


def _add_serve(sub):
    p = sub.add_parser("serve", help="batched multi-LoRA serving: requests file -> wavs, or --port for the HTTP daemon")
    p.add_argument("--checkpoint", required=True, help="audioldm checkpoint dir (HF layout)")
    p.add_argument("--port", type=int, default=None,
                   help="run the HTTP serving daemon on this port (continuous microbatching; "
                        "POST /v1/generate, POST /v1/adapters hot-load, /healthz, /v1/stats)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--batch-delay-ms", type=float, default=50.0,
                   help="daemon batching window: close a batch when the oldest request has waited this long")
    p.add_argument("--warmup", action="store_true",
                   help="daemon: precompile every bucket's program (thread-parallel) before accepting traffic")
    p.add_argument("--requests", default=None,
                   help="jsonl file: {\"prompt\": ..., \"adapter\": <name|null>} per line")
    p.add_argument("--lora", action="append", default=[], metavar="NAME=PATH",
                   help="adapter bank entry (PEFT safetensors); repeatable")
    p.add_argument("--compose", action="append", default=[], metavar="NAME=COMP:W,COMP:W",
                   help="register a weighted composition of bank adapters as a "
                        "servable adapter (exact: delta = sum w_i*scale*B_i A_i); repeatable")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--guidance", type=float, default=2.5)
    p.add_argument("--scheduler", default="ddim", choices=["ddim", "dpm++", "lcm"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-batch", type=int, default=None)
    p.add_argument("--max-adapters", type=int, default=None,
                   help="bank capacity policy: hot-loading past this count "
                        "LRU-evicts the least-recently-served adapter not "
                        "pinned by a composition (daemon only)")
    p.add_argument("--geometry", action="append", default=[], metavar="SPEC",
                   help="daemon compile-geometry allowlist entry; repeatable. "
                        "'default' = this command's --steps/--seconds/--guidance/"
                        "--scheduler, or a JSON object with any of steps/seconds/"
                        "guidance/scheduler/window_seconds/window_overlap/"
                        "guidance_interval (missing fields take this command's "
                        "flags — the same defaults the daemon fills into bare "
                        "requests). With at least one --geometry, requests whose "
                        "compile key is not listed get HTTP 400 instead of "
                        "triggering a minutes-long serve-path compile or an "
                        "HBM-OOM probe; without it, any geometry is accepted")
    p.add_argument("--output", default=None, help="output dir (000000.wav ... in request order)")
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--dp", type=int, default=None, help="data-parallel devices")


def cmd_serve(args):
    import jax
    import jax.numpy as jnp

    from audioldm_tpu.ckpt import load_safetensors
    from audioldm_tpu.config import LoRAConfig
    from audioldm_tpu.data.tokenizer import load_tokenizer
    from audioldm_tpu.data.wavio import write_wav
    from audioldm_tpu.lora import import_peft_state_dict
    from audioldm_tpu.parallel import make_mesh
    from audioldm_tpu.pipeline.generate import AudioLDMModules
    from audioldm_tpu.serve import AdapterBank, ServeEngine

    if jax.devices()[0].platform == "tpu":
        from audioldm_tpu.kernels import use_flash_attention, use_fused_mrf

        use_flash_attention(True)
        use_fused_mrf(True)

    modules = AudioLDMModules.from_checkpoint(args.checkpoint)
    tokenizer = load_tokenizer(os.path.join(args.checkpoint, "tokenizer"))

    bank = None
    lcfg = LoRAConfig()
    if args.lora:
        adapters = {}
        rank = None
        for spec in args.lora:
            name, _, path = spec.partition("=")
            if not path:
                raise SystemExit(f"--lora expects NAME=PATH, got {spec!r}")
            tree, rank = import_peft_state_dict(load_safetensors(path))
            adapters[name] = tree
        lcfg = LoRAConfig(r=rank, lora_alpha=float(rank))
        bank = AdapterBank.from_adapters(adapters, lcfg)

    mesh = make_mesh(args.dp) if args.dp else None
    engine = ServeEngine(
        modules, tokenizer, lcfg, bank=bank, mesh=mesh,
        dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
    )
    for spec in args.compose:
        name, _, rest = spec.partition("=")
        if not rest:
            raise SystemExit(f"--compose expects NAME=COMP:W,COMP:W, got {spec!r}")
        weights = {}
        for term in rest.split(","):
            comp, _, w = term.partition(":")
            weights[comp] = float(w) if w else 1.0
        engine.add_composed(name, weights)
        print(f"composed adapter {name!r} = {weights}")

    if (args.port is None) == (args.requests is None):
        raise SystemExit("serve needs exactly one of --requests (offline batch) or --port (HTTP daemon)")

    if args.port is not None:
        from audioldm_tpu.serve import GenParams, Microbatcher, make_server

        if args.warmup:
            print("warming up: compiling every bucket's program ...")
            engine.warmup(num_inference_steps=args.steps, audio_length_in_s=args.seconds,
                          guidance_scale=args.guidance, scheduler=args.scheduler)
        # the daemon's request defaults: fields a client omits are filled
        # from this GenParams (built from this command's flags), and
        # `--geometry default` allowlists exactly it — consistent by
        # construction, so `serve --steps 25 --geometry default` serves
        # bare requests instead of 400ing them (round-5 review finding)
        defaults = GenParams(
            num_inference_steps=args.steps, audio_length_in_s=args.seconds,
            guidance_scale=args.guidance, scheduler=args.scheduler,
        )
        geometries = None
        if args.geometry:
            import dataclasses

            geometries = []
            for spec in args.geometry:
                if spec == "default":
                    geometries.append(defaults)
                    continue
                # only fields PRESENT in the JSON are passed; missing ones
                # keep the server defaults above — same fill-in contract
                # as the HTTP handler's request parse (daemon.py
                # _generate), where JSON null also counts as absent (a
                # null here used to TypeError at startup while the
                # handler accepted it; round-5 review finding). A
                # hardcoded copy here would silently 400 requests when
                # one copy drifts.
                _conv = {"steps": ("num_inference_steps", int),
                         "seconds": ("audio_length_in_s", float),
                         "guidance": ("guidance_scale", float),
                         "scheduler": ("scheduler", str),
                         "window_seconds": ("window_seconds", float),
                         "window_overlap": ("window_overlap", float)}
                try:
                    d = json.loads(spec)
                    if not isinstance(d, dict):
                        raise ValueError("not a JSON object")
                    unknown = set(d) - set(_conv) - {"guidance_interval"}
                    if unknown:
                        raise ValueError(f"unknown fields {sorted(unknown)}")
                    kw = {_conv[k][0]: _conv[k][1](v) for k, v in d.items()
                          if k != "guidance_interval" and v is not None}
                    gi = d.get("guidance_interval")
                    if gi is not None:
                        # same gate as the HTTP handler: a malformed entry
                        # here would be dead config no request can match
                        if not isinstance(gi, (list, tuple)) or len(gi) != 2:
                            raise ValueError("guidance_interval expects [lo, hi]")
                        lo, hi = (float(x) for x in gi)
                        if not 0.0 <= lo <= hi <= 1.0:
                            raise ValueError("guidance_interval needs 0 <= lo <= hi <= 1")
                        kw["guidance_interval"] = (lo, hi)
                    # validate() at startup: an entry the pipeline would
                    # reject (bad scheduler, windowed+gi) is dead config
                    # no request can ever serve — fail loud here
                    geometries.append(dataclasses.replace(defaults, **kw).validate())
                except (ValueError, TypeError, json.JSONDecodeError) as e:
                    raise SystemExit(f"--geometry expects 'default' or a JSON object "
                                     f"(steps/seconds/guidance/scheduler/window_seconds/"
                                     f"window_overlap/guidance_interval), got {spec!r}: {e}")
            print(f"geometry allowlist: {[g.geometry() for g in geometries]}")
        batcher = Microbatcher(
            engine, max_batch=args.max_batch or engine.bucket_sizes[-1],
            max_delay_ms=args.batch_delay_ms, base_seed=args.seed,
            max_adapters=args.max_adapters, geometries=geometries,
            defaults=defaults,
        )
        server = make_server(batcher, modules.vocoder_cfg.sampling_rate,
                             host=args.host, port=args.port)
        print(f"serving on http://{args.host}:{server.server_address[1]} "
              f"(POST /v1/generate; adapters: {sorted(bank.names) if bank else ['base']})")
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            server.server_close()
            batcher.close()
        return

    if args.output is None:
        raise SystemExit("offline serve (--requests) needs --output")
    requests = []
    with open(args.requests) as f:
        for line in f:
            line = line.strip()
            if line:
                requests.append(json.loads(line))
    if not requests:
        raise SystemExit(f"no requests in {args.requests}")
    for r in requests:
        engine.submit(r["prompt"], r.get("adapter"))
    wavs = engine.flush(
        num_inference_steps=args.steps, audio_length_in_s=args.seconds,
        guidance_scale=args.guidance, seed=args.seed, max_batch=args.max_batch,
    )
    os.makedirs(args.output, exist_ok=True)
    sr = modules.vocoder_cfg.sampling_rate
    for i in range(wavs.shape[0]):
        write_wav(os.path.join(args.output, f"{i:06d}.wav"), wavs[i], sr)
    print(f"served {wavs.shape[0]} requests -> {args.output}")


def _add_score(sub):
    p = sub.add_parser("score", help="CLAP/KAD scoring of generated vs reference wav dirs")
    p.add_argument("--checkpoint", required=True, help="checkpoint dir with a clap/ subfolder, or a CLAP model dir")
    p.add_argument("--generated", required=True)
    p.add_argument("--reference", default=None)
    p.add_argument("--prompt", default=None)
    p.add_argument("--output", default=None, help="write results json here")


def cmd_score(args):
    from audioldm_tpu.eval.scoring import score_directories

    results = score_directories(
        clap_dir=args.checkpoint,
        generated_dir=args.generated,
        reference_dir=args.reference,
        prompt=args.prompt,
    )
    print(json.dumps(results, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)


def _add_export(sub):
    p = sub.add_parser("export-dataset", help="HF dataset -> wav + caption txt pairs")
    p.add_argument("--dataset", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--output", required=True)
    p.add_argument("--limit", type=int, default=None)


def cmd_export(args):
    from datasets import load_dataset

    from audioldm_tpu.data.wavio import write_wav

    ds = load_dataset(args.dataset, split=args.split)
    os.makedirs(args.output, exist_ok=True)
    n = 0
    for i, item in enumerate(ds):
        if args.limit and n >= args.limit:
            break
        wav = np.asarray(item["audio"]["array"], np.float32)
        sr = int(item["audio"]["sampling_rate"])
        write_wav(os.path.join(args.output, f"{i:06d}.wav"), wav, sr)
        with open(os.path.join(args.output, f"{i:06d}.txt"), "w") as f:
            f.write(item.get("caption", ""))
        n += 1
    print(f"exported {n} items to {args.output}")


def _add_push(sub):
    p = sub.add_parser("push-dataset", help="wav+txt dir -> HF dataset (+push)")
    p.add_argument("--input", required=True)
    p.add_argument("--repo", default=None, help="hub repo id to push to (omit for local save)")
    p.add_argument("--save", default=None, help="local dataset dir to save to")


def cmd_push(args):
    from datasets import Dataset

    from audioldm_tpu.data.dataset import AudioCaptionDataset

    ds = AudioCaptionDataset(args.input)
    records = {"audio": [], "caption": []}
    for i in range(len(ds)):
        wav, sr, cap = ds.get_raw(i)
        records["audio"].append({"array": wav, "sampling_rate": sr})
        records["caption"].append(cap)
    hf = Dataset.from_dict(records)
    if args.save:
        hf.save_to_disk(args.save)
        print(f"saved dataset to {args.save}")
    if args.repo:
        hf.push_to_hub(args.repo)
        print(f"pushed to {args.repo}")


def _add_slice(sub):
    p = sub.add_parser("slice", help="cut wavs into fixed-length segments")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--seconds", type=float, default=4.0)


def cmd_slice(args):
    from audioldm_tpu.data.wavio import slice_wav

    paths = (
        [args.input]
        if args.input.endswith(".wav")
        else [os.path.join(args.input, f) for f in sorted(os.listdir(args.input)) if f.endswith(".wav")]
    )
    total = 0
    for p in paths:
        total += len(slice_wav(p, args.output, args.seconds))
    print(f"wrote {total} segments to {args.output}")


def _honor_jax_platforms_env():
    """Make ``JAX_PLATFORMS=cpu python -m audioldm_tpu.cli ...`` actually run
    on CPU. Some preloaded remote-TPU backends (sitecustomize register())
    call ``jax.config.update("jax_platforms", ...)`` at interpreter start,
    which silently OVERRIDES the env var for every subprocess — observed:
    a subprocess with env JAX_PLATFORMS=cpu still ran on the tunnel TPU
    (ckpt-drill round 4). Re-assert the user's env choice before any
    jax.devices() call.

    Deliberately narrowed to the force-CPU contract (env primary == cpu):
    this image exports JAX_PLATFORMS=axon globally, so honoring arbitrary
    env values would undo an in-process ``jax.config.update("jax_platforms",
    "cpu")`` (the tests' conftest) whenever cli.main() is called in-process."""
    want = os.environ.get("JAX_PLATFORMS", "")
    if not want or want.split(",")[0] != "cpu":
        return
    import jax

    if str(jax.config.jax_platforms or "").split(",")[0] != "cpu":
        jax.config.update("jax_platforms", want)


def main(argv=None):
    _honor_jax_platforms_env()
    parser = argparse.ArgumentParser(prog="audioldm_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)
    for add in (_add_generate, _add_train, _add_distill, _add_serve, _add_score, _add_export, _add_push, _add_slice):
        add(sub)
    args = parser.parse_args(argv)
    {
        "generate": cmd_generate,
        "train": cmd_train,
        "distill": cmd_distill,
        "serve": cmd_serve,
        "score": cmd_score,
        "export-dataset": cmd_export,
        "push-dataset": cmd_push,
        "slice": cmd_slice,
    }[args.command](args)


if __name__ == "__main__":
    main()

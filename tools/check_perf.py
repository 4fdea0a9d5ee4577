"""Perf-regression smoke check on the real TPU chip (VERDICT round-2 #5).

Runs the two load-bearing benches — the CFG-batch-2 UNet epsilon-step and
(unless --skip-pipeline) the full 50-step generation pipeline — and compares
them against the committed thresholds in tools/perf_thresholds.json.
Exits nonzero on any regression, so one command catches e.g. a flash-routing
regression (UNet step 13 -> 33 ms) before it ships.

The correctness suite runs on CPU and cannot see perf; this is the TPU-side
counterpart. Uses the repo's persistent compile cache, so a warm run costs
seconds (plus bench windows), not a cold compile.

Usage:  python tools/check_perf.py [--skip-pipeline] [--thresholds FILE]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def _median_iters(f, iters: int = 5) -> float:
    """Median of per-iteration walls. The tunnel transport can stall a
    single device_get for seconds (an 11.9 s outlier vs 0.40 s neighbors,
    PERF.md round-5) — a 3-iter MEAN would blow through the tightened
    thresholds as a fake regression; the median of 5 absorbs one stall.
    Same rationale as bench.py's headline loop."""
    walls = []
    for i in range(iters):
        t0 = time.perf_counter()
        f(2 + i)
        walls.append(time.perf_counter() - t0)
    return sorted(walls)[iters // 2]


def bench_unet_step() -> float:
    """Slope-timed UNet epsilon step (ms), flash attention routed."""
    from tools.bench_unet_step import timed_step
    from audioldm_tpu.config import UNetConfig
    from audioldm_tpu.kernels import use_flash_attention
    from audioldm_tpu.models.unet import init_unet

    use_flash_attention(True)
    cfg = UNetConfig()
    from audioldm_tpu.utils.fastinit import random_params_like, shapes_of

    sh = shapes_of(init_unet, cfg)
    params = jax.jit(lambda k: random_params_like(k, sh, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    x = jnp.zeros((2, 256, 16, cfg.in_channels), jnp.bfloat16)
    t = jnp.asarray([981, 981], jnp.int32)
    lbl = jnp.ones((2, cfg.projection_class_embeddings_input_dim), jnp.bfloat16)
    return timed_step(params, x, t, lbl, cfg) * 1e3


def bench_pipeline() -> float:
    """Full text->audio pipeline (s/clip at 50 DDIM steps), same shapes as
    bench.py."""
    from audioldm_tpu.kernels import use_flash_attention
    from audioldm_tpu.pipeline.generate import make_generate_fn
    from tools.bench_serving import full_modules  # ONE init/module recipe for all tools

    use_flash_attention(True)
    from audioldm_tpu.kernels import use_fused_mrf

    use_fused_mrf(True)
    modules = full_modules()
    fn = make_generate_fn(modules, num_inference_steps=50, audio_length_in_s=10.24,
                          guidance_scale=2.5, dtype=jnp.bfloat16)
    ids = jnp.full((1, 512), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((1, 512), jnp.int32)
    u_ids = jnp.full((1, 512), 1, jnp.int32).at[:, 0].set(0)
    u_mask = jnp.zeros((1, 512), jnp.int32).at[:, 0].set(1)

    def run(seed):
        wav = fn(ids, mask, u_ids, u_mask, jax.random.PRNGKey(seed))
        return jax.device_get(wav[0, :8])

    run(0)  # compile (warm via persistent cache) + warmup
    run(1)
    return _median_iters(run)


def bench_train() -> float:
    """Slope-timed LoRA train step (ms) at the sweep optimum (b=2, flash
    fwd+bwd) — guards the streaming Pallas backward."""
    from tools.bench_serving import full_modules
    from tools.bench_train_step import bench_one

    return bench_one(full_modules(), 2, 64, False, True) * 1e3


def bench_serving() -> float:
    """Batch-4 uniform-adapter ServeEngine s/clip (merged route, per-bucket
    split-compiled programs, fused MRF vocoder) — guards the serving stack
    end to end: tokenize, bucketing, merged-adapter cache, flush-style
    dispatch, vocode, host fetch. A regression in any serve-side routing
    decision (split gate, bucket compile, kernel flags) shows up here even
    when the raw pipeline bench stays clean."""
    from audioldm_tpu.config import LoRAConfig
    from audioldm_tpu.kernels import use_flash_attention, use_fused_mrf
    from audioldm_tpu.lora import init_lora
    from audioldm_tpu.serve import AdapterBank, ServeEngine
    from tools.bench_serving import Tok, full_modules

    use_flash_attention(True)
    use_fused_mrf(True)
    modules = full_modules()
    lcfg = LoRAConfig(r=4, lora_alpha=4)
    adapter = jax.tree.map(
        lambda x: (x + 0.01).astype(jnp.bfloat16),
        init_lora(jax.random.PRNGKey(1), modules.unet, lcfg),
    )
    bank = AdapterBank.from_adapters({"a": adapter}, lcfg)
    eng = ServeEngine(modules, Tok(), lcfg, bank=bank, bucket_sizes=(4,))
    prompts = ["hip hop beat"] * 4
    adapters = ["a"] * 4
    gen = dict(num_inference_steps=50, audio_length_in_s=10.24, guidance_scale=2.5)
    eng.generate(prompts, adapters=adapters, seed=0, **gen)  # compile
    eng.generate(prompts, adapters=adapters, seed=1, **gen)  # warm
    return _median_iters(
        lambda seed: eng.generate(prompts, adapters=adapters, seed=seed, **gen)
    ) / 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--thresholds", default=os.path.join(os.path.dirname(__file__), "perf_thresholds.json"))
    ap.add_argument("--skip-pipeline", action="store_true",
                    help="skip the full-pipeline bench (cold compile is expensive)")
    ap.add_argument("--skip-train", action="store_true",
                    help="skip the train-step bench (compiles the fwd+bwd program)")
    ap.add_argument("--serving", action="store_true",
                    help="also gate the batch-4 ServeEngine path (extra per-bucket compile)")
    args = ap.parse_args()
    with open(args.thresholds) as f:
        thr = json.load(f)

    results, failures = {}, []

    ms = bench_unet_step()
    results["unet_step_ms"] = round(ms, 2)
    if ms > thr["unet_step_ms"]:
        failures.append(f"unet_step_ms {ms:.2f} > {thr['unet_step_ms']}")

    if not args.skip_pipeline:
        s = bench_pipeline()
        results["pipeline_s_per_clip"] = round(s, 4)
        if s > thr["pipeline_s_per_clip"]:
            failures.append(f"pipeline_s_per_clip {s:.4f} > {thr['pipeline_s_per_clip']}")

    if not args.skip_train:
        ms = bench_train()
        results["train_step_b2_ms"] = round(ms, 2)
        if ms > thr["train_step_b2_ms"]:
            failures.append(f"train_step_b2_ms {ms:.2f} > {thr['train_step_b2_ms']}")

    if args.serving:
        s = bench_serving()
        results["serving_s_per_clip_b4"] = round(s, 4)
        if s > thr["serving_s_per_clip_b4"]:
            failures.append(f"serving_s_per_clip_b4 {s:.4f} > {thr['serving_s_per_clip_b4']}")

    print(json.dumps({"ok": not failures, "results": results, "failures": failures}))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

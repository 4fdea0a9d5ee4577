"""Serving + sampler benchmarks at full model size on TPU:
- DPM-Solver++ 2M 25/20 steps single-prompt latency
- multi-LoRA serving batch 4: mixed adapters (gathered, unmerged) and
  uniform adapter (merged-cache route) clips/s
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from audioldm_tpu.config import (
    ClapTextConfig,
    DDIMConfig,
    LoRAConfig,
    UNetConfig,
    VAEConfig,
    VocoderConfig,
)
from audioldm_tpu.kernels import use_flash_attention, use_fused_mrf
from audioldm_tpu.lora import init_lora
from audioldm_tpu.models.clap_text import init_clap_text
from audioldm_tpu.models.unet import init_unet
from audioldm_tpu.models.vae import init_vae
from audioldm_tpu.models.vocoder import init_vocoder
from audioldm_tpu.pipeline.generate import AudioLDMModules, make_generate_fn
from audioldm_tpu.serve import AdapterBank, ServeEngine


class Tok:
    def __call__(self, texts, max_length=None):
        n = 512
        ids = np.full((len(texts), n), 1, np.int32)
        mask = np.zeros((len(texts), n), np.int32)
        for i, t in enumerate(texts):
            toks = [0] + [5 + (sum(map(ord, w)) % 40) for w in t.split()] + [2]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def full_modules():
    # fused-draw random weights: tiny init program vs the 320 s-cold-compile
    # per-leaf init graph (see audioldm_tpu/utils/fastinit.py)
    from audioldm_tpu.utils.fastinit import random_params_like, shapes_of

    sh_unet = shapes_of(init_unet, UNetConfig())
    sh_vae = shapes_of(init_vae, VAEConfig())
    sh_text = shapes_of(init_clap_text, ClapTextConfig())
    sh_voc = shapes_of(init_vocoder, VocoderConfig())

    def _init(key):
        ks = jax.random.split(key, 4)
        return (
            random_params_like(ks[0], sh_unet, dtype=jnp.bfloat16),
            random_params_like(ks[1], sh_vae, dtype=jnp.bfloat16),
            random_params_like(ks[2], sh_text),
            random_params_like(ks[3], sh_voc),
        )

    t0 = time.perf_counter()
    unet_p, vae_p, text_p, voc_p = jax.jit(_init)(jax.random.PRNGKey(0))
    jax.block_until_ready(unet_p)
    print(f"# init: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    return AudioLDMModules(
        unet=unet_p, vae=vae_p, text_encoder=text_p, vocoder=voc_p,
        unet_cfg=UNetConfig(), vae_cfg=VAEConfig(), text_cfg=ClapTextConfig(),
        vocoder_cfg=VocoderConfig(), ddim_cfg=DDIMConfig(),
    )


def main():
    use_flash_attention(True)
    use_fused_mrf(True)
    modules = full_modules()
    seconds = 10.24

    # -- DPM++ latency ---------------------------------------------------------
    ids = jnp.full((1, 512), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((1, 512), jnp.int32)
    u_ids = jnp.full((1, 512), 1, jnp.int32).at[:, 0].set(0)
    u_mask = jnp.zeros((1, 512), jnp.int32).at[:, 0].set(1)
    for steps in (25, 20):
        fn = make_generate_fn(
            modules, num_inference_steps=steps, audio_length_in_s=seconds,
            guidance_scale=2.5, dtype=jnp.bfloat16, scheduler="dpm++",
        )

        def run(seed):
            wav = fn(ids, mask, u_ids, u_mask, jax.random.PRNGKey(seed))
            return jax.device_get(wav[0, :8])

        run(0); run(1)
        t0 = time.perf_counter()
        for i in range(5):
            run(2 + i)
        dt = (time.perf_counter() - t0) / 5
        print(f"dpm++ {steps} steps: {dt:.3f} s/clip", flush=True)

    # -- multi-LoRA serving ----------------------------------------------------
    lcfg = LoRAConfig(r=4, lora_alpha=4)
    mk = lambda s: jax.tree.map(
        lambda x: (x + 0.01).astype(jnp.bfloat16),
        init_lora(jax.random.PRNGKey(s), modules.unet, lcfg),
    )
    bank = AdapterBank.from_adapters({"a": mk(1), "b": mk(2)}, lcfg)
    eng = ServeEngine(modules, Tok(), lcfg, bank=bank, bucket_sizes=(4,))
    prompts = ["hip hop beat"] * 4
    gen = dict(num_inference_steps=50, audio_length_in_s=seconds, guidance_scale=2.5)

    eng_fine = ServeEngine(modules, Tok(), lcfg, bank=bank, bucket_sizes=(1, 2, 4))
    mixed = ["a", "b", "a", "base"]
    for tag, e, adapters in (
        ("mixed coarse-buckets(4,) gate->rank-r", eng, mixed),
        ("mixed fine-buckets(1,2,4) split->merged", eng_fine, mixed),
        ("uniform->merged", eng, ["a", "a", "a", "a"]),
    ):
        e.generate(prompts, adapters=adapters, seed=0, **gen)  # compile
        e.generate(prompts, adapters=adapters, seed=1, **gen)
        t0 = time.perf_counter()
        for i in range(3):
            e.generate(prompts, adapters=adapters, seed=2 + i, **gen)
        dt = (time.perf_counter() - t0) / 3
        print(f"serve batch=4 {tag}: {dt:.3f} s/batch = {dt/4:.3f} s/clip ({4/dt:.2f} clips/s)", flush=True)


if __name__ == "__main__" and not any(f in sys.argv for f in ("--sweep", "--hybrid", "--flush", "--lcm", "--knee")):
    main()


def batch_sweep():
    """Throughput vs batch size for uniform-adapter (merged-route) traffic."""
    use_flash_attention(True)
    use_fused_mrf(True)
    modules = full_modules()
    lcfg = LoRAConfig(r=4, lora_alpha=4)
    adapter = jax.tree.map(
        lambda x: (x + 0.01).astype(jnp.bfloat16),
        init_lora(jax.random.PRNGKey(1), modules.unet, lcfg),
    )
    bank = AdapterBank.from_adapters({"a": adapter}, lcfg)
    for b in (1, 2, 4, 8):
        eng = ServeEngine(modules, Tok(), lcfg, bank=bank, bucket_sizes=(b,))
        prompts = ["hip hop beat"] * b
        gen = dict(num_inference_steps=50, audio_length_in_s=10.24, guidance_scale=2.5)
        eng.generate(prompts, adapters=["a"] * b, seed=0, **gen)
        eng.generate(prompts, adapters=["a"] * b, seed=1, **gen)
        t0 = time.perf_counter()
        for i in range(3):
            eng.generate(prompts, adapters=["a"] * b, seed=2 + i, **gen)
        dt = (time.perf_counter() - t0) / 3
        print(f"serve merged batch={b}: {dt:.3f} s/batch = {dt/b:.3f} s/clip ({b/dt:.2f} clips/s)", flush=True)


if __name__ == "__main__" and "--sweep" in sys.argv:
    batch_sweep()
    sys.exit(0)


_FENCE_WARM = []


def _chip_healthy(budget_s: float = 8.0) -> bool:
    """Tiny matmul fence: a sick worker (post-OOM) hangs or runs 10-20x
    slow (NOTES.md environment gotchas) — abort the sweep rather than
    record garbage. The FIRST fence in a process pays client registration
    + a tunnel compile (measured 4-73 s healthy!), so it runs untimed;
    only the cached re-execution (~0.03 s healthy) is held to the budget."""
    x = jnp.ones((512, 512), jnp.bfloat16)
    if not _FENCE_WARM:
        jax.device_get((x @ x)[0, :1])
        _FENCE_WARM.append(True)
    t0 = time.perf_counter()
    jax.device_get((x @ x)[0, :1])
    dt = time.perf_counter() - t0
    if dt > budget_s:
        print(f"# CHIP UNHEALTHY: cached 512^2 matmul fence took {dt:.1f}s — stop", flush=True)
        return False
    return True


def throughput_knee():
    """VERDICT round-3 #5: find the max-throughput batch size SAFELY.

    The b=1..8 sweep is flat at ~0.77-0.8 s/clip, so clips/s/chip grows
    ~linearly with batch until HBM pressure; a naive b=32 probe crashed the
    worker (NOTES.md). This sweep steps b=8,12,16,20,24 with a chip health
    check between sizes, treats an allocation failure as the ceiling, and
    reports clips/s + pipeline MFU at each point. Plain base traffic (no
    adapters): the merged/uniform route all production batches ride."""
    from audioldm_tpu.utils import flops as fl

    use_flash_attention(True)
    use_fused_mrf(True)
    modules = full_modules()
    gen = dict(num_inference_steps=50, audio_length_in_s=10.24, guidance_scale=2.5)
    per_clip = fl.pipeline_flops(steps=50)["total"].useful
    best = None
    for b in (8, 12, 16, 20, 24):
        if not _chip_healthy():
            break
        eng = ServeEngine(modules, Tok(), LoRAConfig(), bucket_sizes=(b,))
        prompts = ["hip hop beat"] * b
        try:
            eng.generate(prompts, seed=0, **gen)  # compile
            eng.generate(prompts, seed=1, **gen)
            t0 = time.perf_counter()
            for i in range(3):
                eng.generate(prompts, seed=2 + i, **gen)
            dt = (time.perf_counter() - t0) / 3
        except Exception as e:  # noqa: BLE001 — OOM/alloc failure = ceiling
            print(f"serve batch={b}: FAILED ({type(e).__name__}: {str(e)[:120]})", flush=True)
            break
        cps = b / dt
        mfu = fl.mfu(b * per_clip, dt)
        print(f"serve batch={b}: {dt:.3f} s/batch = {dt/b:.3f} s/clip "
              f"({cps:.2f} clips/s, mfu {mfu:.3f})", flush=True)
        if best is None or cps > best[1]:
            best = (b, cps, dt / b, mfu)
        del eng
    if best:
        print(f"KNEE: batch={best[0]} -> {best[1]:.2f} clips/s/chip "
              f"({best[2]:.3f} s/clip, mfu {best[3]:.3f})", flush=True)


if __name__ == "__main__" and "--knee" in sys.argv:
    throughput_knee()
    sys.exit(0)


def hybrid_sweep():
    """Mixed-adapter serving: rank-r vs hybrid dense (C<=128 densified)."""
    use_flash_attention(True)
    use_fused_mrf(True)
    modules = full_modules()
    lcfg = LoRAConfig(r=4, lora_alpha=4)
    mk = lambda s: jax.tree.map(
        lambda x: (x + 0.01).astype(jnp.bfloat16),
        init_lora(jax.random.PRNGKey(s), modules.unet, lcfg),
    )
    bank = AdapterBank.from_adapters({"a": mk(1), "b": mk(2)}, lcfg)
    gen = dict(num_inference_steps=50, audio_length_in_s=10.24, guidance_scale=2.5)
    adapters = ["a", "b", "a", "base"]
    for tag, dmax in (("rank-r", None), ("hybrid<=128", 128), ("hybrid<=256", 256), ("hybrid<=384", 384)):
        eng = ServeEngine(modules, Tok(), lcfg, bank=bank, bucket_sizes=(4,),
                          dense_lora_max_dim=dmax)
        prompts = ["hip hop beat"] * 4
        eng.generate(prompts, adapters=adapters, seed=0, **gen)
        eng.generate(prompts, adapters=adapters, seed=1, **gen)
        t0 = time.perf_counter()
        for i in range(3):
            eng.generate(prompts, adapters=adapters, seed=2 + i, **gen)
        dt = (time.perf_counter() - t0) / 3
        print(f"serve mixed {tag}: {dt:.3f} s/batch = {dt/4:.3f} s/clip", flush=True)


if __name__ == "__main__" and "--hybrid" in sys.argv:
    hybrid_sweep()
    sys.exit(0)


def flush_overlap():
    """flush() throughput: overlapped dispatch (all chunks queued before the
    first fetch) vs a sequential fetch-between-chunks baseline (VERDICT r2 #6)."""
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
    gen = dict(num_inference_steps=50, audio_length_in_s=10.24, guidance_scale=2.5)
    n = 8  # 2 chunks of 4

    def overlapped(seed):
        for i in range(n):
            eng.submit(f"hip hop beat {i}", "a")
        return eng.flush(seed=seed, max_batch=4, **gen)

    def sequential(seed):
        # same chunks, but fetch each before dispatching the next
        outs = []
        for c in range(0, n, 4):
            eng._rng_counter += 1
            parts = eng._generate_async(
                [f"hip hop beat {i}" for i in range(c, c + 4)], ["a"] * 4,
                gen["num_inference_steps"], gen["audio_length_in_s"],
                gen["guidance_scale"], "ddim",
                jax.random.fold_in(jax.random.PRNGKey(seed), eng._rng_counter),
            )
            outs.append(eng._assemble(parts, 4))
        return np.concatenate(outs)

    for tag, run in (("sequential", sequential), ("overlapped-flush", overlapped)):
        eng._rng_counter = 0
        run(0); eng._rng_counter = 0; run(0)  # compile + warm
        t0 = time.perf_counter()
        for i in range(3):
            eng._rng_counter = 0
            run(i)
        dt = (time.perf_counter() - t0) / 3
        print(f"flush n={n} chunks=4 {tag}: {dt:.3f} s = {dt/n:.3f} s/clip ({n/dt:.2f} clips/s)", flush=True)


if __name__ == "__main__" and "--flush" in sys.argv:
    flush_overlap()
    sys.exit(0)


def lcm_latency():
    """Single-prompt latency of the LCM consistency sampler (no CFG, one
    UNet eval/step at batch 1) at 1/2/4/8 steps — the distilled fast path."""
    use_flash_attention(True)
    use_fused_mrf(True)
    modules = full_modules()
    ids = jnp.full((1, 512), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((1, 512), jnp.int32)
    u_ids = jnp.full((1, 512), 1, jnp.int32).at[:, 0].set(0)
    u_mask = jnp.zeros((1, 512), jnp.int32).at[:, 0].set(1)
    for steps in (8, 4, 2, 1):
        fn = make_generate_fn(
            modules, num_inference_steps=steps, audio_length_in_s=10.24,
            guidance_scale=1.0, dtype=jnp.bfloat16, scheduler="lcm",
        )

        def run(seed):
            wav = fn(ids, mask, u_ids, u_mask, jax.random.PRNGKey(seed))
            return jax.device_get(wav[0, :8])

        run(0); run(1)
        t0 = time.perf_counter()
        for i in range(10):
            run(2 + i)
        dt = (time.perf_counter() - t0) / 10
        print(f"lcm {steps} steps: {dt:.3f} s/clip", flush=True)


if __name__ == "__main__" and "--lcm" in sys.argv:
    lcm_latency()
    sys.exit(0)

"""Headline benchmark: wall-clock per 10 s clip at 50 DDIM steps on one TPU
chip (BASELINE.md north star: < 1 s on v5e-8; the reference publishes no
latency numbers — SURVEY.md §6).

Runs the full jit-fused text->audio pipeline (CLAP text encode -> CFG-batched
50-step DDIM lax.scan over the full-size audioldm-s UNet -> VAE decode ->
HiFi-GAN vocoder) at the reference's flagship geometry: 10.24 s clip
(1024 mel frames -> 256x16x8 latents), bf16 compute. Weights are random-init
(zero-egress environment: the real checkpoint cannot be downloaded; FLOP/
byte profile is identical).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
roofline fields (tflops_useful / mfu / padded_peak_frac from the analytic
counter in audioldm_tpu.utils.flops, VERDICT round-3 #1) and the tracked
compile metrics (init_s / compile_s, VERDICT round-3 #2).
``vs_baseline`` = target_seconds / measured_seconds vs the 1.0 s/clip north
star (>1.0 means faster than target).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compile cache: the driver re-runs this every round.  On the
# remote-tunnel backend a cache HIT still ships the serialized executable
# (~70 MB for the split pipeline) up the tunnel at ~0.3-0.4 MB/s — measured
# 185-261 s, SLOWER than the ~100 s server-side recompile — so the cache is
# opt-in here (AUDIOLDM_BENCH_CACHE=1); on local backends it is a pure win.
if os.environ.get("AUDIOLDM_BENCH_CACHE") == "1":
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def main():
    from audioldm_tpu.kernels import use_flash_attention, use_fused_mrf
    from audioldm_tpu.pipeline.generate import make_generate_fn

    # Pallas flash attention: 8x faster than XLA attention at the UNet's
    # level-0 shape ([2,8,4096,16]) on v5e; ~16% off the whole UNet step.
    use_flash_attention(True)
    # Pallas fused vocoder MRF stages: -18% vocoder time (PERF.md)
    use_fused_mrf(True)

    steps = 50
    seconds = 10.24
    guidance = 2.5

    # one fused normal draw + slices per model: the per-leaf init graph cost
    # 320 s cold compile / ~100 s even on a persistent-cache hit (the tunnel
    # ships the 36 MB executable at ~1 MB/s) — utils/fastinit.py docstring
    from audioldm_tpu.config import ClapTextConfig, UNetConfig, VAEConfig, VocoderConfig
    from audioldm_tpu.models.clap_text import init_clap_text
    from audioldm_tpu.models.unet import init_unet
    from audioldm_tpu.models.vae import init_vae
    from audioldm_tpu.models.vocoder import init_vocoder
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

    # The bundle starts as AVALS (ShapeDtypeStructs from eval_shape of the
    # init fn itself, so dtypes match the real buffers exactly): jit.lower
    # accepts avals, which lets the two stage AOT compiles below START while
    # the init program is still compiling/executing on the server — all three
    # are independent server-side work. The dataclass fields are swapped for
    # the real buffers once init lands (pytree flatten happens at call time).
    from audioldm_tpu.pipeline.generate import AudioLDMModules
    from audioldm_tpu.config import DDIMConfig

    aval_u, aval_v, aval_t, aval_voc = jax.eval_shape(
        _init, jax.ShapeDtypeStruct((2,), jnp.uint32)
    )
    modules = AudioLDMModules(
        unet=aval_u, vae=aval_v, text_encoder=aval_t, vocoder=aval_voc,
        unet_cfg=UNetConfig(), vae_cfg=VAEConfig(), text_cfg=ClapTextConfig(),
        vocoder_cfg=VocoderConfig(), ddim_cfg=DDIMConfig(),
    )

    def _run_init():
        t0 = time.perf_counter()
        params = jax.jit(_init)(jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        return params, time.perf_counter() - t0

    # split_compile: text+denoise+VAE and the vocoder compile as two XLA
    # programs — compile time is roughly the sum of stages instead of the
    # superlinear monolithic blowup (740 s driver-observed in round 2);
    # steady state is identical (one extra async enqueue).
    fn = make_generate_fn(
        modules, num_inference_steps=steps, audio_length_in_s=seconds,
        guidance_scale=guidance, dtype=jnp.bfloat16, split_compile=True,
    )

    ids = jnp.full((1, 512), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((1, 512), jnp.int32)
    u_ids = jnp.full((1, 512), 1, jnp.int32).at[:, 0].set(0)
    u_mask = jnp.zeros((1, 512), jnp.int32).at[:, 0].set(1)

    def run(seed):
        wav = fn(ids, mask, u_ids, u_mask, jax.random.PRNGKey(seed))
        # force full completion with a device->host fetch: on this remote
        # backend block_until_ready returns before execution finishes
        return jax.device_get(wav[0, :8])

    # compile + warmup: AOT-compile the two stage programs in parallel
    # threads (remote compiles overlap), with the INIT program's compile +
    # execution overlapped as a third concurrent job — precompile lowers
    # from the aval bundle, so it never waits on real buffers.
    # AUDIOLDM_BENCH_AOT=0 keeps the serial lazy-jit path for A/B.
    from concurrent.futures import ThreadPoolExecutor

    t_all = time.perf_counter()
    stages = {}
    if os.environ.get("AUDIOLDM_BENCH_AOT") != "0":
        with ThreadPoolExecutor(2) as ex:
            f_init = ex.submit(_run_init)
            f_pre = ex.submit(fn.precompile, ids, mask, u_ids, u_mask, jax.random.PRNGKey(0))
            params, init_s = f_init.result()
            # precompile lowers from the AVAL bundle only — wait for it
            # before mutating the modules fields it may still be flattening
            # (advisor round-3 finding: unsynchronized cross-thread mutation)
            stages = f_pre.result() or {}
            modules.unet, modules.vae, modules.text_encoder, modules.vocoder = params
    else:
        (modules.unet, modules.vae, modules.text_encoder, modules.vocoder), init_s = _run_init()
    print(f"# init: {init_s:.1f}s (overlapped with stage compiles)", file=sys.stderr)
    for k, v in stages.items():
        print(f"# {k}: {v:.1f}s (overlapped)", file=sys.stderr)
    # first-execution receipt: run-1 receipts showed the stage compiles are
    # NOT the cold-start bottleneck (47+25 s overlapped) — the bulk of the
    # 287 s window was the FIRST EXECUTION of the compiled programs on the
    # tunnel backend. Track it separately, split per stage, so the variance
    # has an address (mel-exec vs voc-exec).
    t_first = time.perf_counter()
    first_mel_s = first_voc_s = None
    st = fn.stage_fns() if hasattr(fn, "stage_fns") else None
    if st is not None:
        c_mel, c_voc = st
        if os.environ.get("AUDIOLDM_BENCH_EXECSIZE") == "1":
            # serialized-executable sizes: tests the hypothesis that the
            # first-execution cost is the executable shipping up the tunnel
            # (~0.3-0.4 MB/s measured for persistent-cache uploads)
            try:
                from jax.experimental.serialize_executable import serialize
                for name, c in (("mel", c_mel), ("voc", c_voc)):
                    payload = serialize(c)[0]
                    print(f"# {name} serialized executable: "
                          f"{len(payload) / 1e6:.1f} MB", file=sys.stderr)
            except Exception as e:  # noqa: BLE001 — receipt only
                print(f"# execsize probe failed: {e}", file=sys.stderr)
        t0 = time.perf_counter()
        mel = c_mel(modules, ids, mask, u_ids, u_mask, jax.random.PRNGKey(0))
        jax.device_get(mel[0, :1, 0, 0])
        first_mel_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(c_voc(modules, mel)[0, :8])
        first_voc_s = time.perf_counter() - t0
        print(f"# first mel exec: {first_mel_s:.1f}s, first voc exec: {first_voc_s:.1f}s",
              file=sys.stderr)
    else:
        run(0)
    first_run_s = time.perf_counter() - t_first
    compile_s = time.perf_counter() - t_all
    print(f"# first run: {first_run_s:.1f}s", file=sys.stderr)
    print(f"# compile+warmup: {compile_s:.1f}s", file=sys.stderr)
    run(1)

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        run(2 + i)
    dt = (time.perf_counter() - t0) / iters

    # secondary fast-path metrics (VERDICT round-3 #8): DPM-Solver++ at 25
    # steps, LCM at 4 steps, and 50-step DDIM with limited-interval guidance
    # (0.05, 0.65) — tracked in the bench of record so regressions in the
    # fast paths are caught round-over-round. They share ONE extra vocoder
    # program; failures degrade to null, never kill the headline.
    # AUDIOLDM_BENCH_FAST=1 skips them (headline-only run).
    secondary = {"dpmpp25_s": None, "lcm4_s": None, "gi50_s": None}
    if os.environ.get("AUDIOLDM_BENCH_FAST") != "1":
        from audioldm_tpu.pipeline.generate import generate_mel, vocode

        voc_samples = int(seconds * modules.vocoder_cfg.sampling_rate)

        @jax.jit
        def _voc2(mods, mel):
            return vocode(mods, mel, voc_samples)

        def _mk(n, sched, gi=None):
            @jax.jit
            def _mel(mods, i, m, ui, um, rng):
                return generate_mel(mods, i, m, ui, um, rng, n, seconds,
                                    guidance, dtype=jnp.bfloat16, scheduler=sched,
                                    guidance_interval=gi)
            return _mel

        for key, n, sched in (("dpmpp25_s", 25, "dpm++"), ("lcm4_s", 4, "lcm"),
                              ("gi50_s", 50, "ddim")):
            try:
                mel_fn = _mk(n, sched, gi=(0.05, 0.65) if key == "gi50_s" else None)

                def run2(seed):
                    wav = _voc2(modules, mel_fn(modules, ids, mask, u_ids, u_mask,
                                                jax.random.PRNGKey(seed)))
                    return jax.device_get(wav[0, :8])

                tc = time.perf_counter()
                run2(0)
                print(f"# {key} compile+warmup: {time.perf_counter() - tc:.1f}s",
                      file=sys.stderr)
                run2(1)
                t0 = time.perf_counter()
                for i in range(iters):
                    run2(2 + i)
                secondary[key] = round((time.perf_counter() - t0) / iters, 4)
            except Exception as e:  # noqa: BLE001 — secondary must not kill headline
                print(f"# {key} FAILED: {type(e).__name__}: {e}", file=sys.stderr)

    # roofline accounting (analytic matmul-class FLOPs; utils/flops.py is
    # cross-checked against XLA cost_analysis in tests/test_flops.py)
    from audioldm_tpu.utils import flops as fl

    total = fl.pipeline_flops(steps=steps)["total"]

    target = 1.0  # BASELINE.json north star: <1 s / 10 s clip @ 50 steps
    print(
        json.dumps(
            {
                "metric": "seconds_per_10s_clip_50_ddim_steps",
                "value": round(dt, 4),
                "unit": "s",
                "vs_baseline": round(target / dt, 4),
                "tflops_useful": round(total.useful / dt / 1e12, 2),
                "mfu": round(fl.mfu(total.useful, dt), 4),
                "padded_peak_frac": round(fl.mfu(total.padded, dt), 4),
                "init_s": round(init_s, 1),
                "compile_s": round(compile_s, 1),
                # per-stage compile receipts (threads overlap; VERDICT r3 #1)
                "mel_compile_s": round(stages["mel_compile_s"], 1) if "mel_compile_s" in stages else None,
                "voc_compile_s": round(stages["voc_compile_s"], 1) if "voc_compile_s" in stages else None,
                "first_run_s": round(first_run_s, 1),
                "first_mel_exec_s": None if first_mel_s is None else round(first_mel_s, 1),
                "first_voc_exec_s": None if first_voc_s is None else round(first_voc_s, 1),
                # few-step samplers (NOT the headline; 50-step DDIM is)
                "ddim50_s": round(dt, 4),
                **secondary,
            }
        )
    )


if __name__ == "__main__":
    main()

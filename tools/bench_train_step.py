"""LoRA train-step benchmark at full model size on TPU (device-pure: N steps
inside one jit via lax.scan, slope-timed over two loop lengths)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from tools.bench_serving import full_modules
from audioldm_tpu.config import LoRAConfig, TrainConfig
from audioldm_tpu.kernels import use_flash_attention
from audioldm_tpu.lora import init_lora
from audioldm_tpu.train import make_optimizer
from audioldm_tpu.train.trainer import lora_loss_fn
import optax


def bench_one(modules, b: int, L: int, remat: bool, flash: bool, bwd_bk=None) -> float:
    """Slope-timed seconds per train step at batch b."""
    use_flash_attention(flash)
    if bwd_bk:
        import importlib

        _fa = importlib.import_module("audioldm_tpu.kernels.flash_attention")
        _fa._BWD_BLOCK_K = bwd_bk
    lcfg = LoRAConfig(r=2, lora_alpha=2)
    tcfg = TrainConfig(learning_rate=1e-4)
    lora = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
    opt = make_optimizer(tcfg)
    opt_state = opt.init(lora)

    batch = {
        "log_mel_spec": jnp.ones((b, 1024, 64, 1), jnp.float32),
        "input_ids": jnp.full((b, L), 5, jnp.int32).at[:, 0].set(0),
        "attention_mask": jnp.ones((b, L), jnp.int32),
    }

    def make_loop(n):
        @jax.jit
        def loop(mods, lora_, opt_state_, keys):
            # modules travel as device buffers; rebind into the closure-free body
            def body(carry, key):
                l_, o_ = carry
                (loss, _), grads = jax.value_and_grad(
                    lambda l: lora_loss_fn(l, mods, batch, key, lcfg.scale, jnp.bfloat16, remat=remat),
                    has_aux=True,
                )(l_)
                updates, o_ = opt.update(grads, o_, l_)
                return (optax.apply_updates(l_, updates), o_), loss

            (l_, o_), losses = jax.lax.scan(body, (lora_, opt_state_), keys[:n])
            return losses[-1]

        return loop

    n_lo = 8
    keys = jax.random.split(jax.random.PRNGKey(0), n_lo * 3)
    lo, hi = make_loop(n_lo), make_loop(n_lo * 3)

    def run(loop):
        return float(jax.device_get(loop(modules, lora, opt_state, keys)))

    for _ in range(2):
        run(lo); run(hi)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); run(lo)
        t1 = time.perf_counter(); run(hi)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * n_lo))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--tokens", type=int, default=64, help="caption bucket length")
    ap.add_argument("--no-flash", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--bwd-bk", type=int, default=None, help="override flash backward block_k")
    ap.add_argument("--sweep", action="store_true",
                    help="batch/remat sweep (VERDICT round-3 #3): b in {2,4,8,16,32} x remat, table with samples/s + MFU")
    ap.add_argument("--distill", action="store_true",
                    help="time the LCM distillation step instead (student fwd+bwd + CFG teacher + EMA target)")
    args = ap.parse_args()

    from audioldm_tpu.utils import flops as fl

    modules = full_modules()

    def report(b, remat, dt):
        tf = fl.train_step_flops(batch=b, remat=remat, seqlen=args.tokens)["total"]
        mfu = fl.mfu(tf.useful, dt)
        print(
            f"train step b={b:2d} remat={int(remat)}: {dt*1e3:7.1f} ms  "
            f"{b/dt:7.1f} samples/s  {tf.useful/dt/1e12:5.1f} TFLOP/s ({100*mfu:.1f}% MFU)",
            flush=True,
        )

    if args.distill:
        import optax

        from audioldm_tpu.config import LoRAConfig
        from audioldm_tpu.kernels import use_flash_attention
        from audioldm_tpu.lora import init_lora
        from audioldm_tpu.train.distill import init_distill_state, make_distill_step

        use_flash_attention(not args.no_flash)
        b, L = args.batch, args.tokens
        lcfg = LoRAConfig(r=2, lora_alpha=2)
        lora = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
        opt = optax.adamw(1e-4)
        state = init_distill_state(lora, opt)
        step = make_distill_step(modules, opt, lcfg, dtype=jnp.bfloat16, w=2.5)
        batch = {
            "log_mel_spec": jnp.ones((b, 1024, 64, 1), jnp.float32),
            "input_ids": jnp.full((b, L), 5, jnp.int32).at[:, 0].set(0),
            "attention_mask": jnp.ones((b, L), jnp.int32),
            "uncond_ids": jnp.full((1, L), 1, jnp.int32).at[:, 0].set(0),
            "uncond_mask": jnp.zeros((1, L), jnp.int32).at[:, 0].set(1),
        }
        for i in range(2):
            state, m = step(state, batch, jax.random.PRNGKey(i))
        # fence with a host fetch: on this remote backend block_until_ready
        # returns before execution finishes (NOTES gotcha) — without it the
        # timed window absorbs the compile
        jax.device_get(jax.tree.leaves(state.lora)[0].ravel()[:1])
        n = 10
        t0 = time.perf_counter()
        for i in range(n):
            state, m = step(state, batch, jax.random.PRNGKey(2 + i))
        print(f"# warm loss {float(m['loss']):.4f}")  # fences the dispatch queue
        dt = (time.perf_counter() - t0) / n
        print(f"distill step b={b}: {dt*1e3:7.1f} ms  {b/dt:7.1f} samples/s", flush=True)
        return

    if args.sweep:
        for remat in (False, True):
            for b in (2, 4, 8, 16, 32):
                if remat and b < 8:
                    continue  # remat only matters once HBM pressure is real
                try:
                    dt = bench_one(modules, b, args.tokens, remat, not args.no_flash, args.bwd_bk)
                except Exception as e:  # OOM etc — record and continue
                    print(f"train step b={b} remat={int(remat)}: FAILED ({type(e).__name__})", flush=True)
                    continue
                report(b, remat, dt)
        return

    dt = bench_one(modules, args.batch, args.tokens, args.remat, not args.no_flash, args.bwd_bk)
    report(args.batch, args.remat, dt)


if __name__ == "__main__":
    main()

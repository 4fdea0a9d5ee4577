"""A/B the fused Pallas MRF stage kernel (kernels/mrf_conv.py) against the
XLA resblock path on the real vocoder geometry (mel [B,1024,64] -> 163,840
samples). Slope-timed device-pure (same harness as bench_pipeline_tail).

Usage: python tools/bench_vocoder_mrf.py [--batch 1]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audioldm_tpu.config import VocoderConfig
from audioldm_tpu.kernels import mrf_conv
from audioldm_tpu.models.vocoder import apply_vocoder, init_vocoder
from audioldm_tpu.utils.fastinit import random_params_like, shapes_of


def timed(fn, params, *xs, iters=12):
    def make_loop(n):
        @jax.jit
        def loop(p, *a):
            def body(i, carry):
                out = fn(p, *carry)
                eps = (jnp.mean(out.astype(jnp.float32)) * 0).astype(carry[0].dtype)
                return (carry[0] + eps,) + carry[1:]

            r = jax.lax.fori_loop(0, n, body, a)
            return fn(p, *r)

        return loop

    lo, hi = make_loop(iters), make_loop(iters * 3)

    def run(loop):
        out = loop(params, *xs)
        _ = jax.device_get(out.reshape(-1)[:4])

    for _ in range(2):
        run(lo); run(hi)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); run(lo)
        t1 = time.perf_counter(); run(hi)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * iters))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--block-t", type=int, default=0, help="override block size")
    ap.add_argument("--max-channels", type=int, default=0, help="override routing gate")
    args = ap.parse_args()
    if args.block_t:
        # force the exact block size, bypassing the VMEM cap — a sweep wants
        # the attempt (and its OOM, if any), not a silent XLA fallback
        mrf_conv.pick_block_t = lambda t, c=32, _b=args.block_t: _b if t >= _b else None
    if args.max_channels:
        mrf_conv._MAX_CHANNELS = args.max_channels

    cfg = VocoderConfig()
    sh = shapes_of(init_vocoder, cfg)
    params = jax.jit(lambda k: random_params_like(k, sh))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    mel = jax.random.normal(jax.random.PRNGKey(1), (args.batch, 1024, 64), jnp.float32)

    orig_stage = mrf_conv.fused_mrf_stage
    for routed in (False, True):
        calls = []
        mrf_conv.fused_mrf_stage = lambda *a, **kw: (calls.append(1), orig_stage(*a, **kw))[1]
        mrf_conv.use_fused_mrf(routed)
        try:
            t = timed(lambda p, m: apply_vocoder(p, cfg, m), params, mel)
        finally:
            mrf_conv.use_fused_mrf(False)
            mrf_conv.fused_mrf_stage = orig_stage
        rec = {
            "variant": "fused_mrf" if routed else "xla",
            "batch": args.batch, "ms": round(t * 1e3, 2),
            "routed_stages": len(calls),
        }
        if routed and not calls:
            rec["warning"] = "fused variant did NOT route (gate rejected) — timing is the XLA path"
        print(json.dumps(rec))


if __name__ == "__main__":
    main()

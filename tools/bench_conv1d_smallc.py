"""Premise check for the vocoder's late-stage conv floor (VERDICT r2 #9):
is XLA's NWC conv1d at tiny channel counts (C=32/64) leaving MXU lanes on
the table vs an explicit im2col matmul ([T, k*C] @ [k*C, C])?

If XLA tap-loops the conv, each tap is a [T,32]@[32,32] pass — 4x pad on the
contraction AND 4x on the output lanes. im2col packs the contraction to
k*C (96/224/352), cutting MXU passes ~k/ceil(k*C/128)x, at the cost of
materializing the [T, k*C] patches (HBM) — unless a Pallas kernel builds the
patches in VMEM. This tool measures (a) vs (b) in pure XLA to decide
whether the Pallas fused-resblock kernel is worth building.

Timing: in-jit fori_loop (device-pure slope), fp32 and bf16.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

ITERS = 50


def conv_direct(x, w, dil):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,),
        padding=[((w.shape[0] - 1) * dil // 2,) * 2],
        rhs_dilation=(dil,), dimension_numbers=("NWC", "WIO", "NWC"),
    )


def conv_im2col(x, w, dil):
    """x [B,T,C], w [k,C,Cout]: pad, stack k dilated shifts -> [B,T,k*C] @ [k*C,Cout]."""
    k, c, cout = w.shape
    pad = (k - 1) * dil // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    t = x.shape[1]
    patches = jnp.concatenate([xp[:, i * dil : i * dil + t, :] for i in range(k)], axis=-1)
    return jnp.einsum("btk,ko->bto", patches, w.reshape(k * c, cout),
                      preferred_element_type=jnp.float32).astype(x.dtype)


def timed(fn, x, w, dil):
    @jax.jit
    def loop(x, w):
        def body(i, acc):
            y = fn(acc, w, dil)
            return y  # chain: output feeds next iter (same shape) — no DCE
        return jax.lax.fori_loop(0, ITERS, body, x)

    y = loop(x, w)
    _ = jax.device_get(y[0, :2, 0])  # compile + fence
    t0 = time.perf_counter()
    y = loop(x, w)
    _ = jax.device_get(y[0, :2, 0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    rng = np.random.default_rng(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        for t, c, k, dil in [
            (163840, 32, 11, 5), (163840, 32, 7, 3), (163840, 32, 3, 1),
            (81920, 64, 11, 5), (81920, 64, 7, 3),
        ]:
            x = jnp.asarray(rng.standard_normal((1, t, c)), dtype)
            w = jnp.asarray(rng.standard_normal((k, c, c)) * 0.05, dtype)
            ms_d = timed(conv_direct, x, w, dil)
            ms_i = timed(conv_im2col, x, w, dil)
            # parity sanity at this shape
            yd = conv_direct(x.astype(jnp.float32), w.astype(jnp.float32), dil)
            yi = conv_im2col(x.astype(jnp.float32), w.astype(jnp.float32), dil)
            err = float(jnp.max(jnp.abs(yd - yi)))
            print(json.dumps({
                "dtype": str(jnp.dtype(dtype).name), "T": t, "C": c, "k": k, "dil": dil,
                "direct_ms": round(ms_d, 3), "im2col_ms": round(ms_i, 3),
                "speedup": round(ms_d / ms_i, 2), "max_abs_err": err,
            }))


if __name__ == "__main__":
    main()

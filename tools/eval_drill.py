"""Full-geometry CLAP checkpoint -> `cli score` -> CLAP/KAD parity drill
(VERDICT round-4 #3).

The generation stack got its end-to-end full-geometry drill in round 4
(tools/ckpt_drill.py); this is the eval-stack analogue. The reference scores
everything with full CLAP ``laion/clap-htsat-fused``
(/root/reference/script/train/train_audioldm_lora.py:361-362,
/root/reference/script/inference/inference.py:86-87) and its published
result IS a CLAP/KAD delta — so the eval seam matters as much as the
generation seam. The HTSAT port was parity-pinned only at a toy config
(tests/test_clap_audio.py TINY); this drill runs the WHOLE eval chain at the
real checkpoint geometry:

1. Initializes a raw-torch ``transformers.ClapModel`` at the
   ``laion/clap-htsat-fused`` architecture (the transformers ClapConfig
   DEFAULTS with ``enable_fusion=True``: HTSAT window 8 / spec 256 /
   depths 2-2-6-2 / heads 4-8-16-32 / embed 96->768 / proj 512; RoBERTa
   text 12x768). Zero-init relative-position-bias tables and identity BN
   stats are randomized first so the drill actually exercises those
   conversion + runtime paths (the ckpt_drill anti-vacuity lesson). The one
   knob that differs from stock: text vocab 512 so the repo's test byte-BPE
   tokenizer covers it — no shape seam downstream of the pooled projection.
2. Writes it as an HF-layout CLAP dir (model.safetensors + config.json +
   tokenizer files) and synthesizes two small 48 kHz wav corpora
   (distinct deterministic tone+noise mixtures; quantization cancels
   because BOTH stacks read the same int16 files back).
3. Runs ``python -m audioldm_tpu.cli score --generated --reference
   --prompt`` — the real user surface — as a subprocess.
4. Recomputes the numbers the reference way in raw torch: per-clip
   ``ClapFeatureExtractor`` (truncation="fusion"; per-clip calls force
   ``is_longer=True`` exactly like the reference's one-clip processor
   calls, train_audioldm_lora.py:129,304-305) -> ``ClapModel
   .get_audio_features`` -> F.normalize; text via the same tokenizer ids
   the CLI uses -> ``get_text_features``; CLAP score ``(cos+1)/2``
   (:128-137) and KAD = unbiased MMD^2 x100 with torch-pdist-median
   bandwidth from the GENERATED set (:234-294,321).
5. Asserts parity: per-clip CLAP scores, their mean, and KAD — plus
   anti-vacuity gates (embedding spread, non-constant scores, bandwidth not
   on the 1.0 fallback) so parity-on-degenerate-embeddings can't pass.

Tolerance rationale (measured, see NOTES round-5): the fused-feature log-mel
matches transformers to ~2e-3 dB and the tiny-geometry tower to 5e-4; at
full geometry the 12-block Swin + projection amplifies this to ~1e-3 on
normalized embeddings. CLAP scores are inner products of normalized
embeddings (same order); KAD is quadratic in embedding perturbations but
scaled x100, so its gate is relative to the score scale.

Exit 0 on parity (prints a JSON line), nonzero otherwise.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np

SR = 48000


def _randomize_untrained(model, seed: int) -> None:
    """Relative-position-bias tables are zero-init and BatchNorm stats are
    identity in a fresh ClapModel — parity over those would not notice a
    dropped conversion key or a wrong BN axis. Randomize them (the same move
    tests/test_clap_audio.py makes at tiny geometry)."""
    import torch

    with torch.no_grad():
        g = torch.Generator().manual_seed(seed + 1)
        for n, p in model.named_parameters():
            if "relative_position_bias_table" in n:
                p.copy_(torch.randn(p.shape, generator=g) * 0.5)
        for n, b in model.named_buffers():
            if "running_mean" in n:
                b.copy_(torch.randn(b.shape, generator=g) * 0.5)
            elif "running_var" in n:
                b.copy_(torch.rand(b.shape, generator=g) + 0.5)


def build_clap_checkpoint(out_dir: str, width: str, seed: int = 0):
    """HF-layout CLAP dir at ``laion/clap-htsat-fused`` geometry (``full``)
    or the same block graph at 1/4 channel width (``quarter`` — the
    ckpt_drill FULLGEOM rationale: every structural path at a CPU-friendly
    cost). Returns the live torch model for the oracle replay."""
    import torch
    from safetensors.torch import save_file
    from transformers import ClapConfig, ClapModel

    from test_cli import _write_tokenizer_files

    # transformers ClapConfig defaults ARE the laion/clap-htsat-fused
    # geometry; fusion must be switched on and the text vocab shrunk to the
    # test tokenizer's coverage
    text_cfg = dict(vocab_size=512)
    audio_cfg = dict(enable_fusion=True)
    proj = 512
    if width == "quarter":
        text_cfg.update(hidden_size=192, num_hidden_layers=12,
                        num_attention_heads=4, intermediate_size=768,
                        projection_dim=128)
        audio_cfg.update(patch_embeds_hidden_size=24, hidden_size=192,
                         num_attention_heads=[1, 2, 4, 8], projection_dim=128)
        proj = 128

    torch.manual_seed(seed)
    model = ClapModel(ClapConfig(text_config=text_cfg, audio_config=audio_cfg,
                                 projection_dim=proj)).eval()
    _randomize_untrained(model, seed)

    os.makedirs(out_dir, exist_ok=True)
    sd = {k: v.contiguous() for k, v in model.state_dict().items()}
    save_file(sd, os.path.join(out_dir, "model.safetensors"))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(model.config.to_dict(), f, indent=2)
    _write_tokenizer_files(out_dir)
    return model


def make_wavs(folder: str, n: int, seed: int, seconds: float = 3.0) -> None:
    """``n`` distinct deterministic 48 kHz clips: per-clip chords + band
    noise at ~0.3 amplitude (int16-robust — the ckpt_drill silence lesson)."""
    from audioldm_tpu.data.wavio import write_wav

    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    os.makedirs(folder, exist_ok=True)
    for stale in os.listdir(folder):
        # both the CLI and the torch oracle glob EVERY *.wav: leftovers
        # from a larger prior --clips run in a reused --out dir would be
        # silently scored (parity still passes — both stacks read the same
        # files — so the wrong corpus is invisible; round-5 review finding)
        if stale.endswith(".wav"):
            os.remove(os.path.join(folder, stale))
    for i in range(n):
        freqs = rng.uniform(80.0, 4000.0, size=4)
        amps = rng.uniform(0.05, 0.15, size=4)
        wav = sum(a * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
                  for f, a in zip(freqs, amps))
        wav = wav + 0.05 * rng.standard_normal(t.shape)
        wav = (0.3 * wav / np.abs(wav).max()).astype(np.float32)
        write_wav(os.path.join(folder, f"{i:03d}.wav"), wav, SR)


def torch_oracle(model, clap_dir: str, gen_dir: str, ref_dir: str, prompt: str) -> dict:
    """The reference's eval math in raw torch from the same wav files and
    the same tokenizer ids the CLI uses."""
    import torch
    import torch.nn.functional as F
    from transformers import ClapFeatureExtractor

    from audioldm_tpu.data.tokenizer import load_tokenizer
    from audioldm_tpu.data.wavio import read_wav

    fe = ClapFeatureExtractor()

    def embed_dir(folder):
        embs = []
        for name in sorted(os.listdir(folder)):
            if not name.endswith(".wav"):
                continue
            wav, sr = read_wav(os.path.join(folder, name))
            assert sr == SR
            inputs = fe(wav, sampling_rate=SR, return_tensors="pt")
            with torch.no_grad():
                e = model.get_audio_features(**inputs)
            embs.append(F.normalize(e, dim=-1)[0])
        return torch.stack(embs)

    gen = embed_dir(gen_dir)
    ref = embed_dir(ref_dir)

    tok = load_tokenizer(clap_dir)
    enc = tok([prompt], max_length=77)
    with torch.no_grad():
        te = model.get_text_features(
            input_ids=torch.from_numpy(np.asarray(enc["input_ids"], np.int64)),
            attention_mask=torch.from_numpy(np.asarray(enc["attention_mask"], np.int64)),
        )
    te = F.normalize(te, dim=-1)

    clap_scores = (((gen @ te.T).squeeze(1) + 1.0) / 2.0).numpy()

    # KAD, reference formula: bandwidth = torch-pdist median over the
    # GENERATED set (call order calc_kernel_audio_distance(ref, gen), :321),
    # gaussian kernel, unbiased MMD^2, x100
    bw = float(torch.median(torch.pdist(gen.float())))
    fallback = bw < 1e-6 or np.isnan(bw)
    if fallback:
        bw = 1.0
    gamma = 1.0 / (2.0 * bw**2 + 1e-8)

    def mmd_term(a, b, cross):
        d2 = (a * a).sum(1)[:, None] + (b * b).sum(1)[None, :] - 2.0 * (a @ b.T)
        k = torch.exp(-gamma * d2)
        if cross:
            return k.mean()
        k = k - torch.diag(torch.diagonal(k))
        return k.sum() / (a.shape[0] * (a.shape[0] - 1))

    x, y = ref.float(), gen.float()
    kad = float((mmd_term(x, x, False) + mmd_term(y, y, False) - 2 * mmd_term(x, y, True)) * 100.0)
    spread = float(torch.median(torch.pdist(torch.cat([gen, ref]).float())))
    return {"clap_scores": clap_scores, "clap_score_mean": float(clap_scores.mean()),
            "kad": kad, "bandwidth": bw, "bandwidth_fallback": fallback,
            "embed_spread": spread}


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--width", choices=["full", "quarter"], default="full")
    ap.add_argument("--clips", type=int, default=4, help="wavs per corpus")
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--prompt", default="hip hop beat with heavy bass")
    ap.add_argument("--out", default=None, help="work dir (default: temp)")
    ap.add_argument("--platform", choices=["cpu", "tpu"], default="cpu")
    ap.add_argument("--score-atol", type=float, default=None,
                    help="per-clip CLAP score atol (default 2e-3 cpu / 1e-2 tpu)")
    ap.add_argument("--kad-atol", type=float, default=None,
                    help="KAD atol (default 0.05 cpu / 0.25 tpu; KAD is x100-scaled)")
    args = ap.parse_args()
    score_atol = args.score_atol if args.score_atol is not None else (
        2e-3 if args.platform == "cpu" else 1e-2)
    kad_atol = args.kad_atol if args.kad_atol is not None else (
        0.05 if args.platform == "cpu" else 0.25)

    # the drill's torch work is backend-free; only the CLI subprocess picks
    # a jax platform
    work = args.out or tempfile.mkdtemp(prefix="eval_drill_")
    clap_dir = os.path.join(work, "clap")
    gen_dir = os.path.join(work, "gen")
    ref_dir = os.path.join(work, "ref")

    t0 = time.time()
    print(f"# building {args.width}-geometry CLAP checkpoint at {clap_dir}", file=sys.stderr)
    model = build_clap_checkpoint(clap_dir, args.width, seed=args.seed)
    make_wavs(gen_dir, args.clips, seed=args.seed + 100, seconds=args.seconds)
    make_wavs(ref_dir, args.clips, seed=args.seed + 200, seconds=args.seconds)
    print(f"# checkpoint + corpora built in {time.time() - t0:.1f}s", file=sys.stderr)

    # 1) the real user surface: cli score as a subprocess
    out_json = os.path.join(work, "scores.json")
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    if args.platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    cmd = [sys.executable, "-m", "audioldm_tpu.cli", "score",
           "--checkpoint", clap_dir, "--generated", gen_dir,
           "--reference", ref_dir, "--prompt", args.prompt,
           "--output", out_json]
    print(f"# running: {' '.join(cmd)}", file=sys.stderr)
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if proc.returncode != 0:
        print(proc.stdout, file=sys.stderr)
        print(proc.stderr, file=sys.stderr)
        raise SystemExit(f"cli score failed (exit {proc.returncode})")
    cli_s = time.time() - t0
    print(f"# cli score: {cli_s:.1f}s", file=sys.stderr)
    with open(out_json) as f:
        ours = json.load(f)

    # 2) raw-torch replay, reference math
    t0 = time.time()
    oracle = torch_oracle(model, clap_dir, gen_dir, ref_dir, args.prompt)
    print(f"# torch oracle: {time.time() - t0:.1f}s", file=sys.stderr)

    # anti-vacuity: degenerate embeddings would make any parity trivial
    if oracle["bandwidth_fallback"]:
        raise SystemExit("VACUOUS: KAD bandwidth hit the 1.0 fallback — "
                         "embeddings are degenerate, parity proves nothing")
    if oracle["embed_spread"] < 1e-3:
        raise SystemExit(f"VACUOUS: embedding spread {oracle['embed_spread']:.2e} — "
                         "all clips map to ~one embedding")
    if float(np.std(oracle["clap_scores"])) < 1e-5:
        raise SystemExit("VACUOUS: per-clip CLAP scores are constant")

    score_diff = np.abs(np.asarray(ours["clap_scores"]) - oracle["clap_scores"])
    mean_diff = abs(ours["clap_score_mean"] - oracle["clap_score_mean"])
    kad_diff = abs(ours["kad"] - oracle["kad"])
    result = {
        "drill": f"{args.width}@{args.clips}clips/{args.seconds}s",
        "platform": args.platform,
        "clap_score_mean_ours": round(ours["clap_score_mean"], 6),
        "clap_score_mean_oracle": round(oracle["clap_score_mean"], 6),
        "clap_score_max_diff": float(score_diff.max()),
        "kad_ours": round(ours["kad"], 6),
        "kad_oracle": round(oracle["kad"], 6),
        "kad_diff": kad_diff,
        "bandwidth": round(oracle["bandwidth"], 6),
        "embed_spread": round(oracle["embed_spread"], 6),
        "score_atol": score_atol,
        "kad_atol": kad_atol,
        "pass": bool(score_diff.max() <= score_atol and mean_diff <= score_atol
                     and kad_diff <= kad_atol),
        "cli_s": round(cli_s, 1),
    }
    print(json.dumps(result))
    if not result["pass"]:
        raise SystemExit(
            f"PARITY FAIL: clap max|diff|={score_diff.max():.6f} (atol {score_atol}), "
            f"kad|diff|={kad_diff:.6f} (atol {kad_atol})"
        )


if __name__ == "__main__":
    main()

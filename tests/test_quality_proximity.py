"""Fast-path proximity gauge smoke (round-5 review finding: the tool had
zero automated coverage, so a signature drift in batch_fused_features /
apply_clap_audio / make_scan_fn would break the once-per-round on-chip run
with nothing catching it first).

Runs tools/quality_proximity.py --width tiny as a subprocess — the same
entry the on-chip run uses — and asserts the gauge's structural contract:
every tracked fast path gets a finite CLAP-cosine and mel-correlation
against ddim50, the different-seed anchor is published next to them, and
the anchor reads FARTHER from ddim50 than the fast paths do (the
dynamic-range guard that keeps the gauge non-vacuous; NOTES round-5
gauge-design lesson).
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tiny_proximity_gauge():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "quality_proximity.py"),
         "--width", "tiny", "--cpu"],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["width"] == "tiny"
    # vocoder gain calibration ran (uncalibrated random HiFi-GAN emits
    # ~1e-4 amplitude and the whole gauge reads exactly 1.0 — vacuous)
    assert result["vocoder_gain"] > 0
    paths = ["gi50", "dpmpp3", "lcm2", "windowed"]
    for k in paths + ["anchor_diffseed"]:
        assert -1.0 <= result[f"clap_cos_{k}"] <= 1.0
        assert -1.0 <= result[f"mel_corr_{k}"] <= 1.0
    # the anchor (different seed, same sampler) must read farther from
    # ddim50 than every fast path — otherwise the gauge has no dynamic
    # range and the per-path numbers are meaningless
    anchor = result["mel_corr_anchor_diffseed"]
    for k in paths:
        assert result[f"mel_corr_{k}"] > anchor, (k, result)

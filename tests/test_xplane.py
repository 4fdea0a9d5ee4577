"""tools/read_xplane.py — wire-format decode of real jax.profiler traces.

Captures a tiny CPU trace with jax.profiler (the same writer that
`train --profile-dir` uses) and asserts the standalone reader recovers
planes/events with plausible durations, without tensorboard-plugin-profile.
"""

import io
import os

import jax
import jax.numpy as jnp
import pytest

import sys

pytestmark = pytest.mark.quick  # fast core-numerics tier (pyproject markers)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import read_xplane  # noqa: E402


def _capture_trace(tmp_path):
    logdir = os.path.join(tmp_path, "trace")

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x.T).sum()

    x = jnp.ones((128, 128), jnp.float32)
    f(x).block_until_ready()  # compile outside the trace window
    with jax.profiler.trace(logdir):
        for _ in range(3):
            f(x).block_until_ready()
    return logdir


def test_reader_on_real_trace(tmp_path):
    logdir = _capture_trace(str(tmp_path))
    files = read_xplane.find_xplane_files(logdir)
    assert files, "jax.profiler wrote no xplane.pb"

    planes = read_xplane.parse_xspace(open(files[0], "rb").read())
    assert planes, "decoded zero planes"
    named = {p["name"] for p in planes}
    # A python/host plane always exists; device plane name varies by backend.
    assert any(named), f"planes have no names: {named}"

    all_events = {}
    for p in planes:
        all_events.update(p["events"])
    assert all_events, "decoded zero events"
    # Durations are picoseconds: positive, and nothing absurd (> 1000 s).
    for name, (cnt, ps) in all_events.items():
        assert cnt >= 1
        assert 0 <= ps < 1e15, (name, ps)
    # The traced jit region shows up by name on some plane.
    joined = " ".join(all_events)
    assert "jit" in joined or "tanh" in joined or "dot" in joined.lower()


def test_summarize_prints_ranked_table(tmp_path):
    logdir = _capture_trace(str(tmp_path))
    out = io.StringIO()
    planes = read_xplane.summarize(logdir, top=5, out=out)
    text = out.getvalue()
    assert planes
    assert "== plane:" in text and " ms " in text


def test_by_line_breakdown(tmp_path):
    logdir = _capture_trace(str(tmp_path))
    out = io.StringIO()
    planes = read_xplane.summarize(logdir, top=3, by_line=True, out=out)
    assert "-- line:" in out.getvalue()
    for p in planes:
        assert len(p["line_details"]) == p["lines"]
        # per-line sums reassemble the plane-level aggregation
        total = {}
        for ln in p["line_details"]:
            for name, (cnt, ps) in ln["events"].items():
                c0, p0 = total.get(name, (0, 0))
                total[name] = (c0 + cnt, p0 + ps)
        assert total == p["events"]


def test_missing_path_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_xplane.summarize(os.path.join(str(tmp_path), "nope"))


def test_varint_roundtrip():
    buf = bytes([0x96, 0x01])  # 150
    val, pos = read_xplane._read_varint(buf, 0)
    assert (val, pos) == (150, 2)

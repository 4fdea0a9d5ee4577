"""Data layer tests: vendored BPE vs the Rust tokenizers wheel, wav I/O
round-trips, and the batched feature pipeline (reference behaviors:
datasets.py:128-134 tokenization, :174-212 prep, :301-367 features)."""

import numpy as np
import pytest

from audioldm_tpu.config import MelConfig
from audioldm_tpu.data.dataset import (
    AudioCaptionDataset,
    DataPipeline,
    random_segment,
    trim_silence,
)
from audioldm_tpu.data.tokenizer import RobertaBPETokenizer
from audioldm_tpu.data.wavio import read_wav, slice_wav, write_wav

# per-test quick marks: the text-bucketing embedding-equivalence test
# (~11 s, compiles the CLAP tower at two bucket lengths) stays out of the
# quick tier (pyproject markers)

SMALL_MEL = MelConfig(duration=0.32)  # 5120 samples -> 32 frames


@pytest.fixture(scope="module")
def bpe_files(tmp_path_factory):
    """Train a tiny byte-level BPE with the Rust lib; both tokenizers load
    the same files."""
    from tokenizers.implementations import ByteLevelBPETokenizer

    d = tmp_path_factory.mktemp("bpe")
    corpus = d / "corpus.txt"
    corpus.write_text(
        "hip hop music with heavy bass and drums\n"
        "a boom bap beat with punchy kick drum patterns\n"
        "groovy instrumental track, old-school vibe 123\n" * 20
    )
    tok = ByteLevelBPETokenizer()
    tok.train(
        [str(corpus)],
        vocab_size=300,
        min_frequency=1,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"],
    )
    tok.save_model(str(d))
    return str(d / "vocab.json"), str(d / "merges.txt")


@pytest.mark.quick
def test_vendored_bpe_matches_rust(bpe_files):
    from tokenizers.implementations import ByteLevelBPETokenizer

    vocab, merges = bpe_files
    rust = ByteLevelBPETokenizer(vocab, merges)
    ours = RobertaBPETokenizer.from_files(vocab, merges)
    for text in [
        "hip hop music",
        "a boom bap beat with 808s!",
        "  spaces   and\tunusual\nwhitespace",
        "UPPER lower MiXeD 42",
        "unicode: café ♪",
    ]:
        assert ours.encode_text(text) == rust.encode(text).ids, text


@pytest.mark.quick
def test_tokenizer_call_pads_and_truncates(bpe_files):
    vocab, merges = bpe_files
    tok = RobertaBPETokenizer.from_files(vocab, merges)
    out = tok(["hip hop music", "a"], max_length=16)
    assert out["input_ids"].shape == (2, 16)
    assert out["input_ids"][0, 0] == tok.bos_token_id
    assert out["attention_mask"].sum(axis=1)[1] < 16
    # round-trip
    assert "hip hop music" in tok.decode(out["input_ids"][0])
    long = tok("word " * 100, max_length=8)
    assert long["input_ids"].shape == (1, 8)
    assert long["input_ids"][0, -1] == tok.eos_token_id


@pytest.mark.quick
def test_wav_roundtrip(tmp_path, rng):
    x = rng.uniform(-0.9, 0.9, 8000).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000
    # half-LSB rounding + 32767-vs-32768 scale: bounded by ~4.5e-5
    np.testing.assert_allclose(y, x, atol=5e-5)


@pytest.mark.quick
def test_slice_wav(tmp_path, rng):
    x = (rng.standard_normal(16000 * 3) * 0.3).astype(np.float32)
    p = str(tmp_path / "long.wav")
    write_wav(p, x, 16000)
    outs = slice_wav(p, str(tmp_path / "segs"), segment_seconds=1.0)
    assert len(outs) == 3
    seg, sr = read_wav(outs[1])
    assert len(seg) == 16000


@pytest.mark.quick
def test_random_segment_silence_retry():
    rng = np.random.default_rng(0)
    wav = np.zeros(10000, np.float32)
    wav[8000:9000] = 0.5  # only one non-silent region
    hits = 0
    for _ in range(20):
        seg, start = random_segment(wav, 1000, rng)
        if np.max(np.abs(seg)) > 1e-4:
            hits += 1
    assert hits > 10  # retry raises the hit rate far above the 10% base rate


@pytest.mark.quick
def test_trim_silence():
    wav = np.concatenate([np.zeros(3000), np.full(2000, 0.3), np.zeros(3000)]).astype(np.float32)
    out = trim_silence(wav)
    assert len(out) < len(wav)
    assert np.max(np.abs(out)) == pytest.approx(0.3)


@pytest.mark.quick
def test_pipeline_batch_shapes(bpe_files, rng):
    vocab, merges = bpe_files
    tok = RobertaBPETokenizer.from_files(vocab, merges)
    items = [
        {"wav": (rng.standard_normal(24000) * 0.4).astype(np.float32), "sr": 24000, "caption": "hip hop music"},
        {"wav": (rng.standard_normal(8000) * 0.4).astype(np.float32), "sr": 16000, "caption": "boom bap beat"},
    ]
    ds = AudioCaptionDataset(items)
    pipe = DataPipeline(ds, tok, SMALL_MEL, add_ons=("calculate_relative_bandwidth",), max_text_length=16)
    batch = pipe.make_batch([0, 1], np.random.default_rng(0))
    assert batch["log_mel_spec"].shape == (2, 32, 64, 1)
    assert batch["stft"].shape == (2, 32, 512)
    assert batch["waveform"].shape == (2, SMALL_MEL.num_samples)
    assert batch["input_ids"].shape == (2, 16)
    assert batch["freq_energy_percentile"].shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(batch["log_mel_spec"])))
    # normalize_wav caps amplitude at 0.5 (datasets.py:174-177)
    assert np.max(np.abs(batch["waveform"])) <= 0.5 + 1e-6


@pytest.mark.quick
def test_pipeline_iterator(bpe_files, rng):
    vocab, merges = bpe_files
    tok = RobertaBPETokenizer.from_files(vocab, merges)
    items = [
        {"wav": (rng.standard_normal(6000) * 0.4).astype(np.float32), "sr": 16000, "caption": f"clip {i}"}
        for i in range(5)
    ]
    pipe = DataPipeline(AudioCaptionDataset(items), tok, SMALL_MEL, max_text_length=8)
    batches = list(pipe.batches(2, np.random.default_rng(0), epochs=1))
    assert len(batches) == 2  # drop_last
    assert batches[0]["log_mel_spec"].shape[0] == 2


@pytest.mark.quick
def test_pipeline_iterator_rejects_impossible_batch(bpe_files, rng):
    """A dataset smaller than the (global) batch with drop_last must raise,
    not spin forever yielding nothing."""
    import pytest as _pytest

    vocab, merges = bpe_files
    tok = RobertaBPETokenizer.from_files(vocab, merges)
    items = [{"wav": (rng.standard_normal(6000) * 0.4).astype(np.float32), "sr": 16000, "caption": "x"}]
    pipe = DataPipeline(AudioCaptionDataset(items), tok, SMALL_MEL, max_text_length=8)
    with _pytest.raises(ValueError, match="no full batch"):
        next(iter(pipe.batches(8, np.random.default_rng(0))))


@pytest.mark.quick
def test_wav_dir_dataset(tmp_path, bpe_files, rng):
    for i in range(2):
        write_wav(str(tmp_path / f"c{i}.wav"), (rng.standard_normal(6000) * 0.2).astype(np.float32), 16000)
        (tmp_path / f"c{i}.txt").write_text(f"caption {i}")
    ds = AudioCaptionDataset(str(tmp_path))
    assert len(ds) == 2
    wav, sr, cap = ds.get_raw(1)
    assert sr == 16000 and cap == "caption 1" and len(wav) == 6000


@pytest.mark.quick
def test_wav_dir_dataset_is_lazy(tmp_path, rng, monkeypatch):
    """Construction must do O(1) decode work — the reference keeps its HF
    dataset lazy (datasets.py:95-117); an eager copy is O(dataset) RAM."""
    import audioldm_tpu.data.dataset as ds_mod

    for i in range(4):
        write_wav(str(tmp_path / f"c{i}.wav"), (rng.standard_normal(3000) * 0.2).astype(np.float32), 16000)
        (tmp_path / f"c{i}.txt").write_text(f"caption {i}")

    calls = {"n": 0}
    real = ds_mod.read_wav

    def counting_read(path):
        calls["n"] += 1
        return real(path)

    monkeypatch.setattr(ds_mod, "read_wav", counting_read)
    ds = AudioCaptionDataset(str(tmp_path))
    assert calls["n"] == 0  # zero decodes at construction
    assert len(ds) == 4
    ds.get_raw(2)
    assert calls["n"] == 1  # one decode per accessed item


class _FakeHF:
    """Map-style HF-dataset stand-in that counts row accesses and refuses
    full iteration (the old eager __init__ iterated every row)."""

    features = {"audio": None, "caption": None}

    def __init__(self, n, rng):
        self.rows = [
            {"audio": {"array": (rng.standard_normal(3000) * 0.3).astype(np.float32),
                       "sampling_rate": 16000},
             "caption": f"clip {i}", "metadata": {"k": i}}
            for i in range(n)
        ]
        self.accesses = 0

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, i):
        self.accesses += 1
        return self.rows[i]

    def __iter__(self):
        raise AssertionError("lazy dataset must not iterate the full source")


@pytest.mark.quick
def test_hf_dataset_is_lazy_and_memoized(rng):
    src = _FakeHF(6, rng)
    ds = AudioCaptionDataset(src)
    assert src.accesses == 0  # construction touches no rows
    assert len(ds) == 6
    wav, sr, cap = ds.get_raw(3)
    assert sr == 16000 and cap == "clip 3" and len(wav) == 3000
    assert src.accesses == 1
    # metadata right after get_raw rides the one-row memo (HF rows decode
    # the audio column on every access — no double decode)
    assert ds.get_metadata(3) == {"k": 3}
    assert src.accesses == 1
    ds.get_raw(0)
    assert src.accesses == 2


@pytest.mark.quick
def test_hf_dataset_pipeline_end_to_end(bpe_files, rng):
    vocab, merges = bpe_files
    tok = RobertaBPETokenizer.from_files(vocab, merges)
    src = _FakeHF(3, rng)
    pipe = DataPipeline(AudioCaptionDataset(src), tok, SMALL_MEL,
                        add_ons=("calculate_relative_bandwidth",), max_text_length=8)
    batch = pipe.make_batch([0, 2], np.random.default_rng(0))
    assert batch["log_mel_spec"].shape[0] == 2
    assert batch["freq_energy_percentile"].shape == (2, 2)
    assert src.accesses == 2  # one row access per item, metadata memoized


@pytest.mark.quick
def test_spec_augment_masks():
    """Per-item SpecAugment: each batch item gets its OWN contiguous mask
    band (reference draws per item in __getitem__, datasets.py:426-442)."""
    import jax.numpy as jnp

    from audioldm_tpu.data.dataset import frequency_masking, label_vector, time_masking

    rng2 = np.random.default_rng(3)
    mel = jnp.ones((8, 32, 64))
    fm = np.asarray(frequency_masking(mel, 16, rng2))
    bands = []
    for b in range(8):
        zero_cols = np.where(fm[b].sum(axis=0) == 0)[0]
        assert 2 <= len(zero_cols) <= 16
        assert np.all(np.diff(zero_cols) == 1)  # contiguous band
        bands.append((zero_cols[0], len(zero_cols)))
    assert len(set(bands)) > 1  # distinct masks across items

    tm = np.asarray(time_masking(mel, 16, rng2))
    rows = []
    for b in range(8):
        zero_rows = np.where(tm[b].sum(axis=1) == 0)[0]
        assert 2 <= len(zero_rows) <= 16
        rows.append((zero_rows[0], len(zero_rows)))
    assert len(set(rows)) > 1

    # masked-fraction distribution: mean mask length ~ (m/8 + m)/2 over many draws
    big = np.asarray(frequency_masking(jnp.ones((256, 8, 64)), 16, np.random.default_rng(0)))
    lens = (big.sum(axis=1) == 0).sum(axis=-1)
    assert 7.0 < lens.mean() < 11.0  # E[U[2,16)] = 9

    lv = label_vector("drums, bass", {"drums": 0, "bass": 3, "piano": 5}, 8)
    np.testing.assert_array_equal(np.where(lv == 1.0)[0], [0, 3])


@pytest.mark.quick
def test_pipeline_spec_augment_per_item(bpe_files, rng):
    vocab, merges = bpe_files
    tok = RobertaBPETokenizer.from_files(vocab, merges)
    items = [
        {"wav": (rng.standard_normal(16000) * 0.4).astype(np.float32), "sr": 16000, "caption": "a"}
        for _ in range(4)
    ]
    pipe = DataPipeline(AudioCaptionDataset(items), tok, SMALL_MEL, max_text_length=8, freqm=16, timem=8)
    batch = pipe.make_batch([0, 1, 2, 3], np.random.default_rng(0))
    mel = np.asarray(batch["log_mel_spec"])[..., 0]
    cols = [tuple(np.where((mel[b] == 0).all(axis=0))[0]) for b in range(4)]
    assert len(set(cols)) > 1  # per-item frequency bands differ


def test_text_bucketing_embedding_equivalence(bpe_files, rng):
    """Length-bucketed (shorter-padded) tokenization must give the SAME
    pooled text embedding as 512-padding: pad-aware position ids + masked
    attention (the basis for the train-step bucketing optimization)."""
    import jax
    import jax.numpy as jnp

    from audioldm_tpu.config import ClapTextConfig
    from audioldm_tpu.models.clap_text import apply_clap_text, init_clap_text

    cfg = ClapTextConfig(
        vocab_size=320, hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=32, max_position_embeddings=300, projection_dim=8,
    )
    params = init_clap_text(jax.random.PRNGKey(0), cfg)
    vocab, merges = bpe_files
    tok = RobertaBPETokenizer.from_files(vocab, merges)
    caps = ["hip hop music", "boom bap beat with drums"]
    full = tok(caps, max_length=256)
    short = {k: np.asarray(v)[:, :64] for k, v in tok(caps, max_length=256).items()}
    e_full = apply_clap_text(params, cfg, jnp.asarray(full["input_ids"]), jnp.asarray(full["attention_mask"]))["text_embeds"]
    e_short = apply_clap_text(params, cfg, jnp.asarray(short["input_ids"]), jnp.asarray(short["attention_mask"]))["text_embeds"]
    np.testing.assert_allclose(np.asarray(e_full), np.asarray(e_short), atol=1e-5)


@pytest.mark.quick
def test_pipeline_prefetch_thread(bpe_files, rng):
    vocab, merges = bpe_files
    tok = RobertaBPETokenizer.from_files(vocab, merges)
    items = [
        {"wav": (rng.standard_normal(6000) * 0.4).astype(np.float32), "sr": 16000, "caption": f"clip {i}"}
        for i in range(5)
    ]
    pipe = DataPipeline(AudioCaptionDataset(items), tok, SMALL_MEL, max_text_length=8)
    plain = list(pipe.batches(2, np.random.default_rng(0), epochs=1))
    fetched = list(pipe.batches(2, np.random.default_rng(0), epochs=1, prefetch=2))
    assert len(fetched) == len(plain) == 2
    for a, b in zip(plain, fetched):
        np.testing.assert_allclose(np.asarray(a["log_mel_spec"]), np.asarray(b["log_mel_spec"]), atol=1e-6)


@pytest.mark.quick
def test_pipeline_empty_dataset_raises(bpe_files, rng):
    """An EMPTY dataset must raise even without drop_last — the per-epoch
    range is empty, so the epochs=None loop used to busy-spin forever
    yielding nothing (round-5 review finding)."""
    vocab, merges = bpe_files
    tok = RobertaBPETokenizer.from_files(vocab, merges)
    pipe = DataPipeline(AudioCaptionDataset([]), tok, SMALL_MEL, max_text_length=8)
    with pytest.raises(ValueError, match="0 items"):
        next(iter(pipe.batches(2, np.random.default_rng(0), drop_last=False)))


def test_pipeline_prefetch_abandoned_iterator_stops_worker(bpe_files, rng):
    """Abandoning a prefetching iterator mid-epoch (Trainer.fit breaks at
    max_steps) must let the worker thread exit instead of leaving it
    blocked in q.put holding prefetch+1 built batches for the rest of the
    process (round-5 review finding)."""
    import threading
    import time as _time

    vocab, merges = bpe_files
    tok = RobertaBPETokenizer.from_files(vocab, merges)
    items = [
        {"wav": (rng.standard_normal(6000) * 0.4).astype(np.float32), "sr": 16000, "caption": f"clip {i}"}
        for i in range(6)
    ]
    pipe = DataPipeline(AudioCaptionDataset(items), tok, SMALL_MEL, max_text_length=8)
    before = threading.active_count()
    it = pipe.batches(1, np.random.default_rng(0), epochs=None, prefetch=2)
    next(it)  # worker is now running and will fill the queue
    it.close()  # consumer abandons mid-epoch (what a GC'd generator does)
    deadline = _time.monotonic() + 10.0
    while threading.active_count() > before and _time.monotonic() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before, "prefetch worker leaked"


def test_read_wav_rejects_compressed_formats(tmp_path):
    """A mu-law wav reports bits=8 and used to fall into the unsigned-PCM8
    branch, decoding silently as garbage — non-PCM, non-float formats must
    raise (round-5 review finding)."""
    import struct

    data = bytes(range(64))
    for fmt_code in (6, 7):  # a-law, mu-law
        payload = struct.pack("<HHIIHH", fmt_code, 1, 8000, 8000, 1, 8)
        riff = (b"RIFF" + struct.pack("<I", 4 + 8 + len(payload) + 8 + len(data))
                + b"WAVE" + b"fmt " + struct.pack("<I", len(payload)) + payload
                + b"data" + struct.pack("<I", len(data)) + data)
        p = tmp_path / f"fmt{fmt_code}.wav"
        p.write_bytes(riff)
        with pytest.raises(ValueError, match="unsupported wav"):
            read_wav(str(p))


def test_rust_wrap_tokenizer_honors_padding_longest(bpe_files):
    """The Rust-wheel wrapper must honor padding != 'max_length' like the
    vendored fallback — ignoring it made output shapes depend on whether
    the 'tokenizers' wheel is installed (round-5 review finding)."""
    import os

    from audioldm_tpu.data.tokenizer import load_tokenizer

    vocab, merges = bpe_files
    folder = os.path.dirname(vocab)
    wrap = load_tokenizer(folder)
    vend = RobertaBPETokenizer.from_files(vocab, merges)
    texts = ["hip hop", "hip hop music with a long caption"]
    a = wrap(texts, max_length=64, padding="longest")
    b = vend(texts, max_length=64, padding="longest")
    assert a["input_ids"].shape == b["input_ids"].shape
    assert a["input_ids"].shape[1] < 64  # actually batch-longest, not max
    np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
    np.testing.assert_array_equal(a["attention_mask"], b["attention_mask"])


@pytest.mark.quick
def test_load_dir_48k_guards(tmp_path):
    """Empty directories and zero-length wavs fail with actionable errors,
    not a bare np.stack/ZeroDivisionError deep in the feature path; .WAV
    uppercase extensions are accepted (round-5 review finding)."""
    from audioldm_tpu.eval.scoring import _load_dir_48k

    with pytest.raises(ValueError, match="no .wav files"):
        _load_dir_48k(str(tmp_path))
    write_wav(str(tmp_path / "a.WAV"), np.zeros(480, np.float32) + 0.1, 48000)
    assert len(_load_dir_48k(str(tmp_path))) == 1
    with open(tmp_path / "empty.wav", "wb") as f:  # header-only RIFF
        import struct
        payload = struct.pack("<HHIIHH", 1, 1, 48000, 96000, 2, 16)
        f.write(b"RIFF" + struct.pack("<I", 4 + 8 + len(payload) + 8) + b"WAVE"
                + b"fmt " + struct.pack("<I", len(payload)) + payload
                + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="empty wav"):
        _load_dir_48k(str(tmp_path))


def test_metric_logger_nonfinite_values_stay_valid_json(tmp_path):
    """NaN/inf metric values must not produce bare `NaN` tokens that break
    strict-JSON consumers of metrics.jsonl (round-5 review finding)."""
    import json as _json

    from audioldm_tpu.utils.logging import MetricLogger

    lg = MetricLogger(str(tmp_path))
    lg.log({"loss": float("nan"), "lr": 1e-4, "bad": float("inf")}, step=1)
    lg.close()
    line = open(tmp_path / "metrics.jsonl").readline()
    rec = _json.loads(line)  # strict parse must succeed
    assert rec["loss"] is None and rec["bad"] is None and rec["lr"] == 1e-4

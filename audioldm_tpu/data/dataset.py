"""Dataset ingestion + feature-extraction pipeline.

Behavioral spec (reference ``HfAudioDataset``, script/data/datasets.py:33-521):
per item — random 10.24 s segment with <=10 silence retries, resample to
16 kHz, normalize (mean-center, peak-norm, x0.5), zero-pad to 163,840
samples, STFT+log-mel to [1024, 64], RoBERTa-tokenize the caption to
max_length 512; plugin add-ons selected by name (datasets.py:46, registry in
script/data/dataset_plugin.py).

TPU-first re-design (BASELINE config 3 "batch data prep"):
- host side does only the cheap, irregular work (segmenting, caption pick,
  tokenization) in numpy;
- the regular DSP (resample, STFT, mel, log) runs **batched on device** via
  one jit — the per-item torch DSP in dataloader workers becomes a single
  fused XLA program over the whole batch;
- randomness is explicit (seeded numpy Generator), unlike the reference's
  unseeded torch RNG (datasets.py:187-188,426-428) — documented deviation.

The plugin registry keeps the reference's add-on concept (explicit registry
instead of eval-by-name). DSP add-ons live here (waveform_rs_48k, relative
bandwidth, bandwidth extra channel, Kaldi fbank); the metadata-driven add-ons
(VITS/fs2/g2p phonemes, drum beat) live in data/plugins_meta.py.
"""

from __future__ import annotations

import os
from typing import Callable, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from audioldm_tpu.config import MelConfig
from audioldm_tpu.ops import log_mel_spectrogram, resample
from audioldm_tpu.ops.mel import normalize_wav, pad_wav
from audioldm_tpu.data.wavio import read_wav

# ---------------------------------------------------------------------------
# Plugin registry (reference: eval-by-name at datasets.py:46 — replaced with
# an explicit registry; no eval()).
# ---------------------------------------------------------------------------

PLUGINS: dict[str, Callable] = {}


def register_plugin(name: str):
    def deco(fn):
        PLUGINS[name] = fn
        return fn

    return deco


@register_plugin("waveform_rs_48k")
def waveform_rs_48k(item: dict, cfg: MelConfig) -> dict:
    """48 kHz resample add-on (reference: dataset_plugin.py:134-145)."""
    wav = jnp.asarray(item["waveform"])
    return {"waveform_48k": np.asarray(resample(wav, cfg.sampling_rate, 48000))}


@register_plugin("calculate_relative_bandwidth")
def calculate_relative_bandwidth(item: dict, cfg: MelConfig) -> dict:
    """5th/95th-percentile frequency band of STFT energy, scaled to [0,1000)
    (reference: dataset_plugin.py:81-100)."""
    stft = np.asarray(item["stft"])  # [T, F]
    freq_dim = stft.shape[-1]
    dist = np.cumsum(stft.sum(axis=0))
    total = dist[-1]
    lower = int(np.argmin(np.abs(total * 0.05 - dist)))
    higher = int(np.argmin(np.abs(total * 0.95 - dist)))
    return {
        "freq_energy_percentile": np.asarray(
            [int(lower / freq_dim * 1000), int(higher / freq_dim * 1000)], np.int64
        )
    }


@register_plugin("calculate_mel_spec_relative_bandwidth_as_extra_channel")
def mel_bandwidth_extra_channel(
    item: dict, cfg: MelConfig,
    latent_t_size: Optional[int] = None, latent_f_size: Optional[int] = None,
) -> dict:
    """Latent-resolution band mask conditioning channel
    (reference: dataset_plugin.py:103-131). Latent grid defaults to the mel
    geometry over the audioldm-s VAE's 4x downsampling (tracks cfg.duration/
    cfg.n_mel; the reference reads it from the model config)."""
    if latent_t_size is None:
        latent_t_size = cfg.target_length // 4
    if latent_f_size is None:
        latent_f_size = cfg.n_mel // 4
    mel = np.exp(np.clip(np.asarray(item["log_mel_spec"]), None, 10))
    freq_dim = mel.shape[-1]
    dist = np.cumsum(mel.sum(axis=0))
    total = dist[-1]
    lower = int(latent_f_size * (np.argmin(np.abs(total * 0.05 - dist)) / freq_dim))
    higher = int(latent_f_size * (np.argmin(np.abs(total * 0.95 - dist)) / freq_dim))
    mask = np.zeros((latent_t_size, latent_f_size), np.float32)
    mask[:, lower:higher] = 1.0
    return {
        "mel_spec_bandwidth_cond_extra_channel": mask,
        "freq_energy_percentile": np.asarray([lower, higher], np.int64),
    }


_KALDI_NORM_MEAN = -4.2677393  # reference: dataset_plugin.py:346-347
_KALDI_NORM_STD = 4.5689974


def _kaldi_plugin(item: dict, cfg: MelConfig, target_sr: int) -> dict:
    """Shared body of the 16k/32k Kaldi-fbank plugins (reference:
    dataset_plugin.py:345-385 and :388-419): resample -> mean-subtract ->
    Kaldi fbank (exact torchaudio.compliance.kaldi semantics, ops/kaldi.py)
    -> pad/crop to the mel target length -> (x - mean) / (2 std)."""
    from audioldm_tpu.ops.kaldi import kaldi_fbank

    wav = np.asarray(item["waveform"], np.float32)
    if cfg.sampling_rate != target_sr:
        wav = np.asarray(resample(jnp.asarray(wav), cfg.sampling_rate, target_sr))
    wav = wav - wav.mean()
    fbank = kaldi_fbank(wav, sample_frequency=float(target_sr), num_mel_bins=128)
    target_len = cfg.target_length
    p = target_len - fbank.shape[0]
    if p > 0:
        fbank = np.pad(fbank, ((0, p), (0, 0)))
    elif p < 0:
        fbank = fbank[:target_len]
    fbank = (fbank - _KALDI_NORM_MEAN) / (_KALDI_NORM_STD * 2)
    return {"ta_kaldi_fbank": fbank.astype(np.float32)}


@register_plugin("extract_kaldi_fbank_feature")
def extract_fbank(item: dict, cfg: MelConfig) -> dict:
    """128-bin Kaldi log filterbank at 16 kHz (reference:
    dataset_plugin.py:345-385)."""
    return _kaldi_plugin(item, cfg, 16000)


@register_plugin("extract_kaldi_fbank_feature_32k")
def extract_fbank_32k(item: dict, cfg: MelConfig) -> dict:
    """128-bin Kaldi log filterbank at 32 kHz (reference:
    dataset_plugin.py:388-419)."""
    return _kaldi_plugin(item, cfg, 32000)


# ---------------------------------------------------------------------------
# Dataset
# ---------------------------------------------------------------------------


class AudioCaptionDataset:
    """Uniform INDEX-LAZY view over (waveform, sr, caption) triples from:
    - a HuggingFace dataset (items with ``audio.array``/``audio.sampling_rate``
      /``caption`` — the reference's ingestion, datasets.py:95-106),
    - an in-memory list of dicts,
    - a directory of ``*.wav`` + same-stem ``*.txt`` caption files (the layout
      data/dataset/make_audio_caption.py produces).

    Construction does O(1) decode work for the HF and directory sources —
    only the index (row count / wav file list) is materialized; waveforms
    are decoded per item inside :meth:`get_raw` (matching the reference's
    lazy per-item access, datasets.py:95-117, and required for any
    real-size corpus: the old eager copy was O(dataset) RAM — VERDICT
    round-3 weak #3). The in-memory list path serves items as given."""

    def __init__(self, source):
        self.items: Optional[list[dict]] = None
        self._hf = None
        self._dir = None
        if isinstance(source, str):
            self._dir = source
            self._stems = [
                os.path.splitext(n)[0]
                for n in sorted(os.listdir(source))
                if n.endswith(".wav")
            ]
        elif hasattr(source, "features"):  # HF dataset (map-style / Arrow)
            if not hasattr(source, "__getitem__") or not hasattr(source, "__len__"):
                raise ValueError(
                    "HF dataset source must be indexable (map-style); for a "
                    "streaming IterableDataset, materialize a split first "
                    "(the reference trains on map-style splits too — "
                    "script/data/datasets.py:95-106)"
                )
            self._hf = source
            # one-row memo: HF rows decode the audio column on EVERY access,
            # and get_raw(i) + get_metadata(i) back-to-back would decode twice
            self._hf_memo: tuple[int, dict] | None = None
        elif isinstance(source, (list, tuple)):
            self.items = list(source)
        else:
            raise ValueError(f"unsupported dataset source: {type(source)}")

    def __len__(self) -> int:
        if self.items is not None:
            return len(self.items)
        if self._hf is not None:
            return len(self._hf)
        return len(self._stems)

    def get_raw(self, i: int) -> tuple[np.ndarray, int, str]:
        """Decode item ``i``: (waveform float32, sample rate, caption)."""
        if self._dir is not None:
            stem = self._stems[i]
            wav, sr = read_wav(os.path.join(self._dir, stem + ".wav"))
            cap_path = os.path.join(self._dir, stem + ".txt")
            caption = open(cap_path).read().strip() if os.path.exists(cap_path) else ""
            return wav, sr, caption
        if self._hf is not None:
            item = self._hf_row(int(i))
            return (
                np.asarray(item["audio"]["array"], np.float32),
                int(item["audio"]["sampling_rate"]),
                item.get("caption", ""),
            )
        item = self.items[i]
        if "path" in item:
            wav, sr = read_wav(item["path"])
        else:
            wav, sr = np.asarray(item["wav"], np.float32), item["sr"]
        return wav, sr, item.get("caption", "")

    def get_metadata(self, i: int) -> dict:
        """Per-item metadata (phonemes, beat/downbeat, labels — the
        reference's sidecar fields, datasets.py:108-117). Directory sources
        read the same-stem ``.json`` sidecar lazily."""
        if self._dir is not None:
            meta_path = os.path.join(self._dir, self._stems[i] + ".json")
            if os.path.exists(meta_path):
                import json

                return json.load(open(meta_path))
            return {}
        if self._hf is not None:
            return self._hf_row(int(i)).get("metadata", {}) or {}
        return self.items[i].get("metadata", {}) or {}

    def _hf_row(self, i: int) -> dict:
        if self._hf_memo is not None and self._hf_memo[0] == i:
            return self._hf_memo[1]
        item = self._hf[i]
        self._hf_memo = (i, item)
        return item


def random_segment(wav: np.ndarray, target: int, rng: np.random.Generator, retries: int = 10) -> tuple[np.ndarray, int]:
    """Random segment with silence retry (reference: datasets.py:179-195)."""
    n = wav.shape[-1]
    if n <= target:
        return wav, 0
    start = 0
    for _ in range(retries):
        start = int(rng.uniform(0, n - target))
        if np.max(np.abs(wav[start : start + target])) > 1e-4:
            break
    return wav[start : start + target], start


def _draw_mask_params(dim: int, max_len: int, batch: int, rng: np.random.Generator) -> tuple[np.ndarray, np.ndarray]:
    """Per-item (start, length) for a SpecAugment mask — the reference draws
    one pair PER ITEM (datasets.py:426-442 runs in per-item __getitem__)."""
    lens = rng.uniform(max_len // 8, max_len, size=batch).astype(np.int32)
    starts = np.stack([rng.uniform(0, max(dim - int(l), 1)) for l in lens]).astype(np.int32)
    return starts, lens


@jax.jit
def _apply_masks(
    log_mel: jnp.ndarray,
    f_start: jnp.ndarray, f_len: jnp.ndarray,
    t_start: jnp.ndarray, t_len: jnp.ndarray,
) -> jnp.ndarray:
    """Batched per-item frequency+time masking over ``[B, T, F]`` in one jit
    (mask i covers ``[start_i, start_i+len_i)``; len 0 disables)."""
    b, t, f = log_mel.shape
    fi = jnp.arange(f)[None, :]
    keep_f = (fi < f_start[:, None]) | (fi >= (f_start + f_len)[:, None])  # [B, F]
    ti = jnp.arange(t)[None, :]
    keep_t = (ti < t_start[:, None]) | (ti >= (t_start + t_len)[:, None])  # [B, T]
    return log_mel * keep_f[:, None, :].astype(log_mel.dtype) * keep_t[:, :, None].astype(log_mel.dtype)


def frequency_masking(log_mel: jnp.ndarray, freqm: int, rng: np.random.Generator) -> jnp.ndarray:
    """SpecAugment frequency mask, per item over ``[B, T, F]``
    (reference: datasets.py:430-435 — mask length U[freqm/8, freqm))."""
    b, t, f = log_mel.shape
    starts, lens = _draw_mask_params(f, freqm, b, rng)
    zeros = np.zeros(b, np.int32)
    return _apply_masks(log_mel, jnp.asarray(starts), jnp.asarray(lens), jnp.asarray(zeros), jnp.asarray(zeros))


def time_masking(log_mel: jnp.ndarray, timem: int, rng: np.random.Generator) -> jnp.ndarray:
    """SpecAugment time mask, per item (reference: datasets.py:437-442)."""
    b, t, f = log_mel.shape
    starts, lens = _draw_mask_params(t, timem, b, rng)
    zeros = np.zeros(b, np.int32)
    return _apply_masks(log_mel, jnp.asarray(zeros), jnp.asarray(zeros), jnp.asarray(starts), jnp.asarray(lens))


def label_vector(labels: str, index_dict: dict[str, int], num_classes: int) -> np.ndarray:
    """Comma-separated label string -> one-hot float vector (reference:
    datasets.py:455-469)."""
    out = np.zeros(num_classes, np.float32)
    if labels:
        for s in labels.split(","):
            s = s.strip()
            if s in index_dict:
                out[int(index_dict[s])] = 1.0
    return out


def trim_silence(wav: np.ndarray, threshold: float = 1e-4, chunk: int = 1000) -> np.ndarray:
    """Leading/trailing silence trim — the reference *intends* this but the
    ``trim_wav`` attribute shadows the method so it never runs
    (datasets.py:44 vs :214; SURVEY.md §0). Implemented, default off to match
    reference defaults."""
    if np.max(np.abs(wav)) < threshold:
        return wav
    n = len(wav)
    start = 0
    while start + chunk < n and np.max(np.abs(wav[start : start + chunk])) < threshold:
        start += chunk
    end = n
    while end - chunk > 0 and np.max(np.abs(wav[end - chunk : end])) < threshold:
        end -= chunk
    return wav[start:end]


class DataPipeline:
    """Batched host->device feature pipeline producing training batches
    {log_mel_spec [B,1024,64,1], input_ids, attention_mask} (the reference's
    collate output, train_audioldm_lora.py:415-420)."""

    def __init__(
        self,
        dataset: AudioCaptionDataset,
        tokenizer,
        mel_cfg: MelConfig = MelConfig(),
        add_ons: Sequence[str] = (),
        trim: bool = False,
        max_text_length: int = 512,
        freqm: int = 0,
        timem: int = 0,
        bucket_text: bool = True,
    ):
        self.dataset = dataset
        self.tokenizer = tokenizer
        self.mel_cfg = mel_cfg
        self.add_ons = [PLUGINS[a] for a in add_ons]
        self.trim = trim
        self.max_text_length = max_text_length
        self.bucket_text = bucket_text
        self.freqm = freqm  # spec-augment (reference: datasets.py:430-442)
        self.timem = timem
        cfg = mel_cfg
        self._mel_fn = jax.jit(lambda w: log_mel_spectrogram(w, cfg, return_stft=True))

    def prepare_waveform(self, wav: np.ndarray, sr: int, rng: np.random.Generator) -> tuple[np.ndarray, int]:
        """Host prep: segment -> resample -> normalize -> (trim) -> pad
        (reference order: datasets.py:494-521). Hot loops run in the native
        C++ library (cpp/audioprep.cpp) when available, numpy otherwise."""
        from audioldm_tpu.data import native

        cfg = self.mel_cfg
        seg, start = random_segment(wav, int(sr * cfg.duration), rng)
        if sr != cfg.sampling_rate:
            if native.available():
                seg = native.resample_native(seg, sr, cfg.sampling_rate)
            else:
                seg = np.asarray(resample(jnp.asarray(seg), sr, cfg.sampling_rate))
        seg = native.normalize_native(seg) if native.available() else normalize_wav(seg)
        if self.trim:
            seg = trim_silence(seg)
        return pad_wav(seg, cfg.num_samples), start

    def make_batch(self, indices: Sequence[int], rng: np.random.Generator, with_plugins: bool = True) -> dict:
        want_meta = with_plugins and bool(self.add_ons)
        wavs, captions, starts, metas = [], [], [], []
        for i in indices:
            wav, sr, caption = self.dataset.get_raw(i)
            if want_meta:
                # same pass as get_raw: the dataset's one-row memo makes this
                # free for HF sources (rows decode audio on every access)
                metas.append(self.dataset.get_metadata(i))
            prepared, start = self.prepare_waveform(wav, sr, rng)
            wavs.append(prepared)
            captions.append(caption)
            starts.append(start)
        waveforms = np.stack(wavs)  # [B, num_samples]
        log_mel, stft = self._mel_fn(jnp.asarray(waveforms))
        if self.freqm > 0 or self.timem > 0:
            # per-item SpecAugment in one jit (reference: datasets.py:426-442)
            bsz, t_dim, f_dim = log_mel.shape
            zeros = np.zeros(bsz, np.int32)
            f_s, f_l = _draw_mask_params(f_dim, self.freqm, bsz, rng) if self.freqm > 0 else (zeros, zeros)
            t_s, t_l = _draw_mask_params(t_dim, self.timem, bsz, rng) if self.timem > 0 else (zeros, zeros)
            log_mel = _apply_masks(log_mel, jnp.asarray(f_s), jnp.asarray(f_l), jnp.asarray(t_s), jnp.asarray(t_l))
        if self.bucket_text:
            # length bucketing: pad to the smallest multiple of 64 covering
            # the batch instead of always 512 — pad-aware position ids +
            # masked attention make the pooled embedding identical (tested),
            # and the per-step RoBERTa forward shrinks ~8x for short captions.
            # (The reference always pads to 512: datasets.py:128-134.)
            probe = self.tokenizer(captions, max_length=self.max_text_length)
            longest = int(np.max(np.sum(np.asarray(probe["attention_mask"]), axis=-1)))
            bucket = min(self.max_text_length, max(64, ((longest + 63) // 64) * 64))
            tok = {
                "input_ids": np.asarray(probe["input_ids"])[:, :bucket],
                "attention_mask": np.asarray(probe["attention_mask"])[:, :bucket],
            }
        else:
            tok = self.tokenizer(captions, max_length=self.max_text_length)
        batch = {
            "log_mel_spec": log_mel[..., None],  # NHWC
            "stft": stft,
            "waveform": waveforms,
            "input_ids": jnp.asarray(tok["input_ids"]),
            "attention_mask": jnp.asarray(tok["attention_mask"]),
            "random_start": np.asarray(starts),
            "duration": self.mel_cfg.duration,
            "sampling_rate": self.mel_cfg.sampling_rate,
        }
        if with_plugins and self.add_ons:
            log_mel_np, stft_np = np.asarray(log_mel), np.asarray(stft)
            rows: list[dict] = []
            for b in range(len(indices)):
                item = {
                    "waveform": waveforms[b],
                    "log_mel_spec": log_mel_np[b],
                    "stft": stft_np[b],
                    "metadata": metas[b],
                    "random_start": starts[b],
                    "duration": self.mel_cfg.duration,
                    "sampling_rate": self.mel_cfg.sampling_rate,
                }
                row: dict = {}
                for fn in self.add_ons:
                    row.update(fn(item, self.mel_cfg))
                rows.append(row)
            for k in {k for r in rows for k in r}:
                vals = [r.get(k) for r in rows]
                if k == "text":
                    # flan-t5 dispatch blanks text only for TTS items
                    # (dataset_plugin.py:148-170); caption items keep theirs
                    batch[k] = [captions[b] if v is None else v for b, v in enumerate(vals)]
                    continue
                if any(v is None for v in vals):
                    raise ValueError(
                        f"add-on output {k!r} produced for only some batch items"
                    )
                # numeric add-ons stack into batch arrays; string add-ons
                # stay as python lists
                batch[k] = np.stack(vals) if isinstance(vals[0], np.ndarray) else list(vals)
        return batch

    def batches(
        self,
        batch_size: int,
        rng: np.random.Generator,
        shuffle: bool = True,
        drop_last: bool = True,
        epochs: Optional[int] = None,
        prefetch: int = 0,
    ) -> Iterator[dict]:
        """Batch iterator. ``prefetch > 0`` builds batches in a background
        thread (the TPU-side analogue of the reference's 4 dataloader worker
        subprocesses, train_audioldm_lora.py:430-436 — here host prep overlaps
        the device step instead of competing with it)."""

        def gen():
            epoch = 0
            n = len(self.dataset)
            if n == 0 or (drop_last and n < batch_size):
                # would otherwise spin forever yielding nothing (a tiny
                # dataset with a large global batch = per-device bs x dp;
                # or an empty dataset, whose per-epoch range is empty even
                # without drop_last — round-5 review finding)
                raise ValueError(
                    f"dataset has {n} items < batch_size {batch_size}"
                    + (" with drop_last" if drop_last else "")
                    + " — no full batch can ever be formed"
                )
            while epochs is None or epoch < epochs:
                order = rng.permutation(n) if shuffle else np.arange(n)
                for i in range(0, n - (batch_size - 1 if drop_last else 0), batch_size):
                    yield self.make_batch(list(order[i : i + batch_size]), rng)
                epoch += 1

        if prefetch <= 0:
            yield from gen()
            return

        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        stop = object()
        closed = threading.Event()

        def _put(item) -> bool:
            # bounded put: a consumer that abandons the iterator (e.g.
            # Trainer.fit breaking at max_steps mid-epoch) used to leave
            # the worker blocked in q.put FOREVER, pinning prefetch+1
            # built batches and a live thread per fit() for the rest of
            # the process (round-5 review finding)
            while not closed.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            # exceptions travel to the consumer — a crashed pipeline must
            # NOT look like clean end-of-data to the training loop
            try:
                for item in gen():
                    if not _put(item):
                        return
                _put(stop)
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                _put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # runs on GeneratorExit too: signal the worker and drain the
            # queue so a mid-put worker unblocks and exits promptly
            closed.set()
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

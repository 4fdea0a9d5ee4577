"""Metadata-driven plugin parity (reference: script/data/dataset_plugin.py).

Expectations are hand-derived from the reference's documented id
constructions (symbol-table order, interleaving, pad ids/lengths, beat row
mapping) — not from running its code.
"""

import numpy as np
import pytest

from audioldm_tpu.config import MelConfig
from audioldm_tpu.data import plugins_meta as pm
from audioldm_tpu.data.dataset import PLUGINS

pytestmark = pytest.mark.quick  # fast core-numerics tier (pyproject markers)

CFG = MelConfig()


def test_all_reference_plugins_registered():
    # the complete add-on inventory of dataset_plugin.py
    expected = {
        "get_vits_phoneme_ids",
        "get_vits_phoneme_ids_no_padding",
        "extract_vits_phoneme_and_flant5_text",
        "extract_fs2_phoneme_and_flant5_text",
        "extract_fs2_phoneme_g2p_en_feature",
        "extract_phoneme_g2p_en_feature",
        "extract_drum_beat",
        "extract_kaldi_fbank_feature",
        "extract_kaldi_fbank_feature_32k",
        "waveform_rs_48k",
        "calculate_relative_bandwidth",
        "calculate_mel_spec_relative_bandwidth_as_extra_channel",
    }
    assert expected <= set(PLUGINS)


def test_vits_symbol_table_layout():
    # construction order: pad, punctuation, letters, IPA, special
    # (dataset_plugin.py:19-25)
    assert pm.VITS_SYMBOLS[0] == "_"
    assert pm.VITS_SYMBOLS[1] == ";"
    assert pm.VITS_SYMBOLS[16] == " "  # 16 punctuation chars, space last
    assert pm.VITS_SYMBOLS[17] == "A"
    assert pm.VITS_SYMBOLS[42] == "Z"
    assert pm.VITS_SYMBOLS[43] == "a"
    assert pm.VITS_SYMBOLS[-5:] == list("♪☎☒☝⚠")
    # the IPA run ends "...'̩'ᵻ" — the apostrophe appears twice, so the
    # reference table carries exactly one duplicate and its dict comp maps
    # "'" to the LAST occurrence (dataset_plugin.py:14,26-28); ours matches.
    assert len(pm.VITS_SYMBOLS) - len(set(pm.VITS_SYMBOLS)) == 1
    dup_positions = [i for i, s in enumerate(pm.VITS_SYMBOLS) if s == "'"]
    assert pm._VITS_SYMBOL_TO_ID["'"] == dup_positions[-1]


def test_vits_phoneme_ids_interleaves_blanks():
    item = {"metadata": {"phonemes": "aA "}}
    out = PLUGINS["get_vits_phoneme_ids"](item, CFG)["phoneme_idx"]
    assert out.shape == (310,) and out.dtype == np.int64
    ids = [pm.VITS_SYMBOLS.index(c) for c in "aA "]
    # [0, p1, 0, p2, 0, p3, 0, pad...]
    assert out[:7].tolist() == [0, ids[0], 0, ids[1], 0, ids[2], 0]
    assert not out[7:].any()


def test_vits_phoneme_ids_truncates_overflow():
    out = PLUGINS["get_vits_phoneme_ids"]({"metadata": {"phonemes": "a" * 200}}, CFG)
    assert out["phoneme_idx"].shape == (310,)


def test_vits_phoneme_ids_strict_on_unknown():
    with pytest.raises(KeyError):
        PLUGINS["get_vits_phoneme_ids"]({"metadata": {"phonemes": "☃"}}, CFG)


def test_vits_no_padding_appends_end_marker_and_maps_unknown():
    item = {"metadata": {"phonemes": "ab☃"}}  # snowman not in table
    out = PLUGINS["get_vits_phoneme_ids_no_padding"](item, CFG)["phoneme_idx"]
    a, b = pm.VITS_SYMBOLS.index("a"), pm.VITS_SYMBOLS.index("b")
    warn = pm.VITS_SYMBOLS.index("⚠")
    assert out[:4].tolist() == [a, b, 0, warn]  # unknown -> '_' == 0
    assert out.shape == (310,)


def test_vits_no_padding_truncates_at_310():
    item = {"metadata": {"phonemes": "a" * 400}}
    out = PLUGINS["get_vits_phoneme_ids_no_padding"](item, CFG)["phoneme_idx"]
    assert out.shape == (310,)
    assert (out == pm.VITS_SYMBOLS.index("a")).all()


def test_vits_flant5_dispatch():
    out = PLUGINS["extract_vits_phoneme_and_flant5_text"](
        {"metadata": {"phonemes": "ab"}}, CFG
    )
    assert out["text"] == "" and out["phoneme_idx"].shape == (310,)
    # caption-only item: empty phoneme sequence (just the end marker) and NO
    # text override — the reference blanks text only in the has-phonemes
    # branch (dataset_plugin.py:155-156), so captions survive
    out2 = PLUGINS["extract_vits_phoneme_and_flant5_text"]({"metadata": {}}, CFG)
    assert out2["phoneme_idx"][0] == pm.VITS_SYMBOLS.index("⚠")
    assert not out2["phoneme_idx"][1:].any()
    assert "text" not in out2
    with pytest.raises(AssertionError):
        PLUGINS["extract_vits_phoneme_and_flant5_text"](
            {"metadata": {"phoneme": ["K"]}}, CFG
        )


def test_fs2_phoneme_table_pins():
    # exact id assignment (dataset_plugin.py:176-250)
    assert pm._FS2_LOOKUP["K"] == 0
    assert pm._FS2_LOOKUP["NG"] == 2
    assert pm._FS2_LOOKUP["spn"] == 61
    assert pm._FS2_LOOKUP["sp"] == 63
    assert pm._FS2_LOOKUP["HH"] == 70
    assert len(pm._FS2_LOOKUP) == 71


def test_fs2_phoneme_feature():
    item = {"metadata": {"phoneme": ["K", "AA1", "not-a-phone", "HH"]}}
    out = PLUGINS["extract_fs2_phoneme_g2p_en_feature"](item, CFG)["phoneme_idx"]
    assert out.shape == (135,)
    assert out[:3].tolist() == [0, 22, 70]  # unknown filtered, not mapped
    assert (out[3:] == 71).all()  # pad id = vocab size


def test_g2p_phoneme_feature():
    item = {"metadata": {"phoneme": [" ", "AA", "ZH", "B"]}}
    out = PLUGINS["extract_phoneme_g2p_en_feature"](item, CFG)["phoneme_idx"]
    assert out.shape == (250,)
    assert out[:4].tolist() == [0, 1, 39, 7]
    assert (out[4:] == 40).all()


def test_fs2_flant5_dispatch():
    out = PLUGINS["extract_fs2_phoneme_and_flant5_text"](
        {"metadata": {"phoneme": ["K"]}}, CFG
    )
    assert out["text"] == "" and out["phoneme_idx"][0] == 0
    # caption-only: empty (all-pad) phoneme sequence, caption kept
    out2 = PLUGINS["extract_fs2_phoneme_and_flant5_text"]({"metadata": {}}, CFG)
    assert "text" not in out2
    assert (out2["phoneme_idx"] == 71).all()


def test_drum_beat_rows_and_values():
    # original file at 44.1 kHz, 10.24 s segment starting at sample 1000
    sr = 44100
    seg = int(sr * CFG.duration)
    meta = {
        "sample_rate": sr,
        # one beat inside, one before the segment (filtered), one beat
        # coinciding with a downbeat
        "beat": [1000 + seg // 4, 500, 1000 + seg // 2],
        "downbeat": [1000 + seg // 2],
    }
    item = {"metadata": meta, "random_start": 1000, "duration": CFG.duration}
    out = PLUGINS["extract_drum_beat"](item, CFG)["cond_beat_downbeat"]
    assert out.shape == (256, 16)
    r_beat = int((seg // 4) / seg * 256)
    r_both = int((seg // 2) / seg * 256)
    assert np.allclose(out[r_beat], -0.5)
    assert np.allclose(out[r_both], 0.5)  # downbeat(+1.0) + beat(-0.5)
    untouched = np.delete(out, [r_beat, r_both], axis=0)
    assert not untouched.any()


def test_drum_beat_row_clamp():
    sr = 16000
    seg = int(sr * CFG.duration)
    meta = {"sample_rate": sr, "beat": [seg], "downbeat": []}  # exactly at end
    item = {"metadata": meta, "random_start": 0, "duration": CFG.duration}
    out = PLUGINS["extract_drum_beat"](item, CFG)["cond_beat_downbeat"]
    assert np.allclose(out[255], -0.5)  # clamped to the last row


def test_pipeline_integration_with_metadata_addons():
    from audioldm_tpu.data import AudioCaptionDataset, DataPipeline

    class Tok:
        def __call__(self, texts, max_length=None, **kw):
            ids = np.ones((len(texts), max_length), np.int32)
            mask = np.zeros((len(texts), max_length), np.int32)
            mask[:, :8] = 1
            return {"input_ids": ids, "attention_mask": mask}

    rng = np.random.default_rng(0)
    sr = 16000
    items = [
        {
            "wav": rng.standard_normal(sr * 2).astype(np.float32),
            "sr": sr,
            "caption": "a test sound",
            "metadata": {"phonemes": "ab"},
        }
        for _ in range(2)
    ]
    ds = AudioCaptionDataset(items)
    pipe = DataPipeline(ds, Tok(), add_ons=["extract_vits_phoneme_and_flant5_text"])
    batch = pipe.make_batch([0, 1], np.random.default_rng(1))
    assert batch["phoneme_idx"].shape == (2, 310)
    assert batch["text"] == ["", ""]


def test_pipeline_mixed_tts_and_caption_batch():
    """A batch mixing TTS (phonemes) and caption-only items collates with
    per-item text: TTS rows blanked, caption rows keep their caption."""
    from audioldm_tpu.data import AudioCaptionDataset, DataPipeline

    class Tok:
        def __call__(self, texts, max_length=None, **kw):
            ids = np.ones((len(texts), max_length), np.int32)
            mask = np.zeros((len(texts), max_length), np.int32)
            mask[:, :8] = 1
            return {"input_ids": ids, "attention_mask": mask}

    rng = np.random.default_rng(0)
    sr = 16000
    items = [
        {"wav": rng.standard_normal(sr).astype(np.float32), "sr": sr,
         "caption": "tts item", "metadata": {"phonemes": "ab"}},
        {"wav": rng.standard_normal(sr).astype(np.float32), "sr": sr,
         "caption": "a drum loop", "metadata": {}},
    ]
    pipe = DataPipeline(
        AudioCaptionDataset(items), Tok(),
        add_ons=["extract_vits_phoneme_and_flant5_text"],
    )
    batch = pipe.make_batch([0, 1], np.random.default_rng(1))
    assert batch["text"] == ["", "a drum loop"]
    assert batch["phoneme_idx"].shape == (2, 310)

from audioldm_tpu.ops.mel import (
    dynamic_range_compression,
    dynamic_range_decompression,
    get_mel_from_wav,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    pad_spec,
    stft_magnitude,
)
from audioldm_tpu.ops.resample import resample

__all__ = [
    "dynamic_range_compression",
    "dynamic_range_decompression",
    "get_mel_from_wav",
    "hann_window",
    "log_mel_spectrogram",
    "mel_filterbank",
    "pad_spec",
    "stft_magnitude",
    "resample",
]

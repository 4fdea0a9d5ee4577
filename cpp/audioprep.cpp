// Native host-side audio prep kernels for the data-loader hot path.
//
// The reference's per-item CPU pipeline (segment -> resample -> normalize ->
// pad, script/data/datasets.py:494-521) runs in torch/torchaudio inside 4
// dataloader worker processes (SURVEY.md §3.3). Here the host-side hot loops
// are native C++ (this TU, built to libaudioprep.so, bound via ctypes in
// audioldm_tpu/data/native.py) feeding the batched on-device mel pipeline.
//
// Functions are plain C ABI over contiguous float32 buffers; the polyphase
// kernel bank is computed in Python (audioldm_tpu/ops/resample.py — single
// source of truth for the filter math) and passed in.

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Polyphase resample: out length must be ceil(n_in * up / down).
// kernels: [up][kw] filter bank; input is implicitly zero-padded by
// `width` on the left and `width + down` on the right (torchaudio layout).
void resample_poly_f32(const float* in, int64_t n_in, float* out,
                       int64_t n_out, const float* kernels, int64_t up,
                       int64_t down, int64_t width, int64_t kw) {
  for (int64_t frame = 0; frame * up < n_out; ++frame) {
    const int64_t in_start = frame * down - width;  // first tap sample index
    for (int64_t phase = 0; phase < up; ++phase) {
      const int64_t oi = frame * up + phase;
      if (oi >= n_out) break;
      const float* k = kernels + phase * kw;
      double acc = 0.0;
      // clip tap range to valid input samples (outside = zero pad)
      int64_t t0 = in_start < 0 ? -in_start : 0;
      int64_t t1 = kw;
      if (in_start + t1 > n_in) t1 = n_in - in_start;
      for (int64_t t = t0; t < t1; ++t) acc += (double)in[in_start + t] * k[t];
      out[oi] = (float)acc;
    }
  }
}

// Mean-center, peak-normalize, scale to max amplitude 0.5
// (reference: datasets.py:174-177).
void normalize_wav_f32(float* buf, int64_t n, float eps) {
  double mean = 0.0;
  for (int64_t i = 0; i < n; ++i) mean += buf[i];
  mean /= (double)n;
  float peak = 0.0f;
  for (int64_t i = 0; i < n; ++i) {
    float v = (float)(buf[i] - mean);
    buf[i] = v;
    float a = v < 0 ? -v : v;
    if (a > peak) peak = a;
  }
  const float scale = 0.5f / (peak + eps);
  for (int64_t i = 0; i < n; ++i) buf[i] *= scale;
}

// PCM16 -> float32 in [-1, 1), channel-averaged to mono.
void decode_pcm16_f32(const int16_t* in, int64_t n_frames, int32_t channels,
                      float* out) {
  const float inv = 1.0f / 32768.0f;
  for (int64_t i = 0; i < n_frames; ++i) {
    float acc = 0.0f;
    for (int32_t c = 0; c < channels; ++c) acc += (float)in[i * channels + c];
    out[i] = acc * inv / (float)channels;
  }
}

// Max |x| over a window — silence detection for the random-segment retry
// loop (reference: datasets.py:187-193).
float peak_abs_f32(const float* in, int64_t n) {
  float peak = 0.0f;
  for (int64_t i = 0; i < n; ++i) {
    float a = in[i] < 0 ? -in[i] : in[i];
    if (a > peak) peak = a;
  }
  return peak;
}

}  // extern "C"

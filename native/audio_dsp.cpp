// Native audio DSP for the VibeVoice-TPU host pipeline.
//
// The reference delegates its host-side audio work to librosa/resampy/
// soundfile's native code (reference vibevoice/processor/
// vibevoice_tokenizer_processor.py:271-309, finetune/data_vibevoice.py:165-192).
// This library provides the same hot host ops as a self-contained C++ core
// consumed via ctypes (vibevoice_tpu/utils/native_dsp.py):
//
//   * windowed-sinc polyphase resampling (arbitrary rational rate change)
//   * dB-FS normalisation with anti-clipping (the AudioNormalizer math)
//   * int16 <-> float32 PCM conversion with channel averaging
//
// Build: `make -C native` (produces libaudio_dsp.so).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

inline double sinc(double x) {
  if (x == 0.0) return 1.0;
  const double px = kPi * x;
  return std::sin(px) / px;
}

inline double hann(double n, double N) {
  return 0.5 - 0.5 * std::cos(2.0 * kPi * n / N);
}

uint64_t gcd_u64(uint64_t a, uint64_t b) {
  while (b) {
    uint64_t t = a % b;
    a = b;
    b = t;
  }
  return a;
}

}  // namespace

extern "C" {

// Polyphase windowed-sinc resampler. Returns the number of output samples
// written (<= out_capacity), or -1 on error.
//
// The filter has `half_taps` zero crossings per side at the lower of the two
// rates, Hann-windowed — the same design class resampy's kaiser_fast uses.
long long vv_resample(const float* in, long long n_in, long long sr_in,
                      long long sr_out, int half_taps, float* out,
                      long long out_capacity) {
  if (n_in <= 0 || sr_in <= 0 || sr_out <= 0 || half_taps <= 0) return -1;
  if (sr_in == sr_out) {
    long long n = n_in < out_capacity ? n_in : out_capacity;
    std::memcpy(out, in, sizeof(float) * static_cast<size_t>(n));
    return n;
  }
  const uint64_t g = gcd_u64(static_cast<uint64_t>(sr_in), static_cast<uint64_t>(sr_out));
  const long long up = sr_out / static_cast<long long>(g);
  const long long down = sr_in / static_cast<long long>(g);

  // cutoff at the Nyquist of the lower rate, in units of the input rate
  const double cutoff = (sr_out < sr_in) ? (double)sr_out / (double)sr_in : 1.0;
  // taps measured in *input* samples
  const double taps_in = (double)half_taps / cutoff;

  const long long n_out_total = (n_in * up + down - 1) / down;
  const long long n_out = n_out_total < out_capacity ? n_out_total : out_capacity;

  for (long long m = 0; m < n_out; ++m) {
    // output sample m corresponds to input time t = m * down / up
    const double t = (double)m * (double)down / (double)up;
    const long long center = (long long)std::floor(t);
    const long long lo = center - (long long)std::ceil(taps_in) ;
    const long long hi = center + (long long)std::ceil(taps_in) + 1;
    double acc = 0.0;
    double wsum = 0.0;
    for (long long k = lo; k <= hi; ++k) {
      const double dt = (double)k - t;
      if (std::fabs(dt) > taps_in) continue;
      const double w =
          sinc(dt * cutoff) * hann(dt + taps_in, 2.0 * taps_in) * cutoff;
      wsum += w;
      if (k >= 0 && k < n_in) acc += (double)in[k] * w;
    }
    // normalise the window so DC gain stays 1 near the edges
    out[m] = (float)(wsum != 0.0 ? acc / wsum * 1.0 : 0.0);
  }
  return n_out;
}

// dB-FS normalisation + anti-clipping (reference AudioNormalizer,
// vibevoice_tokenizer_processor.py:19-87). In-place.
void vv_db_normalize(float* audio, long long n, float target_db_fs, float eps) {
  if (n <= 0) return;
  double ss = 0.0;
  for (long long i = 0; i < n; ++i) ss += (double)audio[i] * (double)audio[i];
  const double rms = std::sqrt(ss / (double)n);
  const double scalar = std::pow(10.0, target_db_fs / 20.0) / (rms + eps);
  double maxv = 0.0;
  for (long long i = 0; i < n; ++i) {
    audio[i] = (float)(audio[i] * scalar);
    const double a = std::fabs(audio[i]);
    if (a > maxv) maxv = a;
  }
  if (maxv > 1.0) {
    const double inv = 1.0 / (maxv + eps);
    for (long long i = 0; i < n; ++i) audio[i] = (float)(audio[i] * inv);
  }
}

// Interleaved int16 PCM -> mono float32 (channel average).
void vv_pcm16_to_float_mono(const int16_t* pcm, long long frames, int channels,
                            float* out) {
  const double scale = 1.0 / 32768.0;
  for (long long i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) acc += (double)pcm[i * channels + c];
    out[i] = (float)(acc / channels * scale);
  }
}

// float32 -> int16 PCM with clipping.
void vv_float_to_pcm16(const float* in, long long n, int16_t* out) {
  for (long long i = 0; i < n; ++i) {
    float v = in[i];
    if (v > 1.0f) v = 1.0f;
    if (v < -1.0f) v = -1.0f;
    out[i] = (int16_t)std::lrintf(v * 32767.0f);
  }
}

}  // extern "C"

// triad_data — native host-side data ops for the triad_tpu input pipeline.
//
// The reference delegates its native-performance data work to external
// libraries (libavcodec via torchcodec/torchaudio, cuDNN via torch —
// SURVEY §2 "external dependency surface"). This library is the
// framework-owned equivalent for the decode-adjacent hot loops that sit
// between media bytes and fixed-shape device batches:
//
//   * kaiser-windowed-sinc polyphase resampling to 16 kHz (the quality
//     class of torchaudio's Resample, reference dataset.py:83-85)
//   * per-row zero-mean/unit-var waveform normalization (the HF
//     processor step, reference model.py:56-62) fused with padding to
//     the static length
//   * uint8 -> float32 bilinear resize fused with ImageNet
//     normalization (reference dataset.py:96-133)
//
// Exposed as a plain C ABI consumed via ctypes
// (triad_tpu/data/native.py); OpenMP-free, thread-safe, no global state
// — the Python thread pool provides the parallelism.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Resampling: kaiser-windowed sinc, polyphase evaluation.
// ---------------------------------------------------------------------------

static double bessel_i0(double x) {
  // Series expansion; converges quickly for the beta range used here.
  double sum = 1.0, term = 1.0;
  const double half_x = x / 2.0;
  for (int k = 1; k < 64; ++k) {
    term *= (half_x / k) * (half_x / k);
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

// out must hold resample_output_length(n_in, sr_in, sr_out) floats.
int64_t resample_output_length(int64_t n_in, int32_t sr_in, int32_t sr_out) {
  return (n_in * static_cast<int64_t>(sr_out) + sr_in - 1) / sr_in;
}

// Polyphase kaiser-sinc resampler (zero-phase, lowpass at the tighter
// Nyquist). width = taps per side at the *lower* rate.
void resample_kaiser(const float* in, int64_t n_in, int32_t sr_in,
                     float* out, int64_t n_out, int32_t sr_out,
                     int32_t width, double beta) {
  if (sr_in == sr_out) {
    std::memcpy(out, in, sizeof(float) * std::min(n_in, n_out));
    for (int64_t i = n_in; i < n_out; ++i) out[i] = 0.f;
    return;
  }
  const double ratio = static_cast<double>(sr_out) / sr_in;
  const double cutoff = (ratio < 1.0 ? ratio : 1.0) * 0.97;  // anti-alias
  const double scale = (ratio < 1.0 ? ratio : 1.0);
  const double i0_beta = bessel_i0(beta);
  // taps per side in input samples
  const double taps = width / (ratio < 1.0 ? ratio : 1.0);

  for (int64_t j = 0; j < n_out; ++j) {
    const double t_in = j / ratio;  // position in input samples
    const int64_t lo = static_cast<int64_t>(std::ceil(t_in - taps));
    const int64_t hi = static_cast<int64_t>(std::floor(t_in + taps));
    double acc = 0.0, wsum = 0.0;
    for (int64_t i = lo; i <= hi; ++i) {
      const double dt = (i - t_in);
      const double x = dt * cutoff;
      double sinc = (std::abs(x) < 1e-12)
                        ? 1.0
                        : std::sin(M_PI * x) / (M_PI * x);
      const double frac = dt / taps;
      if (frac <= -1.0 || frac >= 1.0) continue;
      const double win =
          bessel_i0(beta * std::sqrt(1.0 - frac * frac)) / i0_beta;
      const double w = sinc * win * cutoff * scale / scale;  // normalized below
      wsum += w;
      if (i >= 0 && i < n_in) acc += w * in[i];
    }
    out[j] = (wsum > 0.0) ? static_cast<float>(acc / wsum * 1.0) : 0.f;
  }
}

// ---------------------------------------------------------------------------
// Waveform normalize + pad (HF processor quirk, model.py:56-62):
// stats over the full padded row, eps 1e-7.
// ---------------------------------------------------------------------------

void normalize_pad_waveform(const float* in, int64_t n_in, float* out,
                            int64_t n_out) {
  const int64_t n_copy = std::min(n_in, n_out);
  double sum = 0.0;
  for (int64_t i = 0; i < n_copy; ++i) sum += in[i];
  // padded zeros contribute 0 to the sum but count in the denominator
  const double mean = sum / static_cast<double>(n_out);
  double var = 0.0;
  for (int64_t i = 0; i < n_copy; ++i) {
    const double d = in[i] - mean;
    var += d * d;
  }
  var += (n_out - n_copy) * mean * mean;  // zeros' deviation
  var /= static_cast<double>(n_out);
  const double inv = 1.0 / std::sqrt(var + 1e-7);
  for (int64_t i = 0; i < n_copy; ++i)
    out[i] = static_cast<float>((in[i] - mean) * inv);
  const float pad_val = static_cast<float>((0.0 - mean) * inv);
  for (int64_t i = n_copy; i < n_out; ++i) out[i] = pad_val;
}

// ---------------------------------------------------------------------------
// Image: uint8 HWC -> float32 HWC bilinear resize + ImageNet normalize
// (half-pixel centers, matching cv2/torch interpolate align_corners=False).
// ---------------------------------------------------------------------------

void resize_normalize_u8(const uint8_t* in, int32_t h, int32_t w,
                         float* out, int32_t size, int32_t normalize) {
  static const float kMean[3] = {0.485f, 0.456f, 0.406f};
  static const float kStd[3] = {0.229f, 0.224f, 0.225f};
  for (int32_t oy = 0; oy < size; ++oy) {
    const float fy = (oy + 0.5f) * h / size - 0.5f;
    int32_t y0 = static_cast<int32_t>(std::floor(fy));
    float wy = fy - y0;
    if (y0 < 0) { y0 = 0; wy = 0.f; }
    int32_t y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    for (int32_t ox = 0; ox < size; ++ox) {
      const float fx = (ox + 0.5f) * w / size - 0.5f;
      int32_t x0 = static_cast<int32_t>(std::floor(fx));
      float wx = fx - x0;
      if (x0 < 0) { x0 = 0; wx = 0.f; }
      int32_t x1 = x0 + 1 < w ? x0 + 1 : w - 1;
      for (int32_t c = 0; c < 3; ++c) {
        const float tl = in[(y0 * w + x0) * 3 + c];
        const float tr = in[(y0 * w + x1) * 3 + c];
        const float bl = in[(y1 * w + x0) * 3 + c];
        const float br = in[(y1 * w + x1) * 3 + c];
        float v = (tl * (1 - wx) + tr * wx) * (1 - wy) +
                  (bl * (1 - wx) + br * wx) * wy;
        v *= (1.0f / 255.0f);
        if (normalize) v = (v - kMean[c]) / kStd[c];
        out[(oy * size + ox) * 3 + c] = v;
      }
    }
  }
}

}  // extern "C"

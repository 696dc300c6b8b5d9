// serenade_native: host-side DSP kernels for the preprocessing runtime.
//
// The reference leans on external native libraries for its CPU hot spots
// (pyworld's C++ Harvest, pysptk's C mcep — SURVEY §0). This library is the
// TPU build's native runtime counterpart, bound via ctypes
// (serenade_tpu/native): preprocessing hosts without an accelerator run F0
// and mel-cepstrum extraction here instead of paying XLA-on-CPU compile
// costs, and the JAX implementations are cross-checked against it in tests.
//
// Exposed C ABI:
//   sn_yin_f0:  YIN pitch tracking (same algorithm/constants as
//               serenade_tpu/ops/f0.py — CMND, absolute threshold, local-min
//               walk, parabolic refinement, dip+energy voicing).
//   sn_freqt:   SPTK frequency-warping recursion (ops/sptk.py freqt).
//   sn_sp2mc_cepstrum_stage is not needed: python does the FFT, freqt is
//               the O(L*order) hot loop.
//
// Build: make -C native  (g++ -O3 -shared; no external dependencies).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// In-place iterative radix-2 FFT on interleaved complex data.
void fft_radix2(double* re, double* im, int n, bool inverse) {
  for (int i = 1, j = 0; i < n; ++i) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (int len = 2; len <= n; len <<= 1) {
    double ang = 2.0 * M_PI / len * (inverse ? 1.0 : -1.0);
    double wr = std::cos(ang), wi = std::sin(ang);
    for (int i = 0; i < n; i += len) {
      double cr = 1.0, ci = 0.0;
      for (int k = 0; k < len / 2; ++k) {
        double ur = re[i + k], ui = im[i + k];
        double vr = re[i + k + len / 2] * cr - im[i + k + len / 2] * ci;
        double vi = re[i + k + len / 2] * ci + im[i + k + len / 2] * cr;
        re[i + k] = ur + vr;
        im[i + k] = ui + vi;
        re[i + k + len / 2] = ur - vr;
        im[i + k + len / 2] = ui - vi;
        double ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
  if (inverse) {
    for (int i = 0; i < n; ++i) {
      re[i] /= n;
      im[i] /= n;
    }
  }
}

int next_pow2(int n) {
  int p = 1;
  while (p < n) p <<= 1;
  return p;
}

}  // namespace

extern "C" {

// YIN F0 estimation. audio: n samples; out_f0/out_vuv: n_frames floats
// with n_frames = 1 + n / hop (hop = fs * frame_period_ms / 1000).
// Returns n_frames, or -1 on error.
int sn_yin_f0(const float* audio, int64_t n, int fs, double f0_floor,
              double f0_ceil, double frame_period_ms, double threshold,
              float* out_f0, float* out_vuv) {
  if (n <= 0 || fs <= 0 || f0_floor <= 0 || f0_ceil <= f0_floor) return -1;
  const int hop = static_cast<int>(fs * frame_period_ms / 1000.0);
  const int max_lag = static_cast<int>(std::ceil(fs / f0_floor)) + 1;
  const int min_lag = std::max(static_cast<int>(fs / f0_ceil), 2);
  const int W = next_pow2(max_lag * 2);
  const int frame_len = W + max_lag;
  const int n_frames = 1 + static_cast<int>(n / hop);

  // zero-padded copy: [pad/2 | audio | pad] like the JAX op
  const int pad = frame_len;
  std::vector<double> x(static_cast<size_t>(n) + pad / 2 + pad, 0.0);
  for (int64_t i = 0; i < n; ++i) x[pad / 2 + i] = audio[i];

  const int nfft = next_pow2(frame_len + W);
  std::vector<double> are(nfft), aim(nfft), bre(nfft), bim(nfft);
  std::vector<double> d(max_lag), cmnd(max_lag);

  for (int f = 0; f < n_frames; ++f) {
    const double* frame = x.data() + static_cast<size_t>(f) * hop;

    // cross-correlation r(tau) = sum_{t<W} x[t]x[t+tau] via FFT
    std::fill(are.begin(), are.end(), 0.0);
    std::fill(aim.begin(), aim.end(), 0.0);
    std::fill(bre.begin(), bre.end(), 0.0);
    std::fill(bim.begin(), bim.end(), 0.0);
    for (int t = 0; t < W; ++t) are[t] = frame[t];
    for (int t = 0; t < frame_len; ++t) bre[t] = frame[t];
    fft_radix2(are.data(), aim.data(), nfft, false);
    fft_radix2(bre.data(), bim.data(), nfft, false);
    for (int k = 0; k < nfft; ++k) {
      // conj(A) * B
      double rr = are[k] * bre[k] + aim[k] * bim[k];
      double ri = are[k] * bim[k] - aim[k] * bre[k];
      are[k] = rr;
      aim[k] = ri;
    }
    fft_radix2(are.data(), aim.data(), nfft, true);

    // running energies
    double p0 = 0.0;
    for (int t = 0; t < W; ++t) p0 += frame[t] * frame[t];
    double p_tau = p0;
    d[0] = 0.0;
    for (int tau = 1; tau < max_lag; ++tau) {
      p_tau += frame[tau + W - 1] * frame[tau + W - 1]
             - frame[tau - 1] * frame[tau - 1];
      d[tau] = p0 + p_tau - 2.0 * are[tau];
    }

    // cumulative mean normalized difference
    cmnd[0] = 1.0;
    double cum = 0.0;
    for (int tau = 1; tau < max_lag; ++tau) {
      cum += d[tau];
      cmnd[tau] = cum > 1e-12 ? d[tau] * tau / cum : 1.0;
    }

    // first dip under threshold in the valid band, else global min
    int tau0 = -1;
    double best = 1e30;
    int best_tau = min_lag;
    for (int tau = min_lag; tau < max_lag - 1; ++tau) {
      if (cmnd[tau] < best) {
        best = cmnd[tau];
        best_tau = tau;
      }
      if (tau0 < 0 && cmnd[tau] < threshold) tau0 = tau;
    }
    if (tau0 < 0) tau0 = best_tau;
    // local-minimum walk
    while (tau0 + 1 < max_lag - 1 && cmnd[tau0 + 1] < cmnd[tau0]) ++tau0;
    if (tau0 < min_lag) tau0 = min_lag;
    if (tau0 > max_lag - 2) tau0 = max_lag - 2;

    // parabolic interpolation
    double ym1 = cmnd[tau0 - 1], y0 = cmnd[tau0], yp1 = cmnd[tau0 + 1];
    double denom = ym1 - 2.0 * y0 + yp1;
    double delta = std::fabs(denom) > 1e-12 ? 0.5 * (ym1 - yp1) / denom : 0.0;
    if (delta > 1.0) delta = 1.0;
    if (delta < -1.0) delta = -1.0;
    double tau_star = tau0 + delta;

    double f0 = fs / std::max(tau_star, 1.0);
    double energy = p0 / W;
    bool voiced = (y0 < std::max(threshold * 2.5, 0.35)) && (energy > 1e-7) &&
                  (f0 >= f0_floor) && (f0 <= f0_ceil);
    out_f0[f] = voiced ? static_cast<float>(f0) : 0.0f;
    out_vuv[f] = voiced ? 1.0f : 0.0f;
  }
  return n_frames;
}

// SPTK frequency transform: c (n_frames x in_len) -> out (n_frames x
// (order+1)), alpha warping. Matches serenade_tpu/ops/sptk.py freqt.
void sn_freqt(const double* c, int n_frames, int in_len, int order,
              double alpha, double* out) {
  const int m1 = order + 1;
  std::vector<double> g(m1), dcol(m1);
  for (int f = 0; f < n_frames; ++f) {
    const double* row = c + static_cast<size_t>(f) * in_len;
    std::fill(g.begin(), g.end(), 0.0);
    for (int i = in_len - 1; i >= 0; --i) {
      std::copy(g.begin(), g.end(), dcol.begin());
      g[0] = row[i] + alpha * dcol[0];
      if (order >= 1) g[1] = (1.0 - alpha * alpha) * dcol[0] + alpha * dcol[1];
      for (int m = 2; m <= order; ++m)
        g[m] = dcol[m - 1] + alpha * (dcol[m] - g[m - 1]);
    }
    std::copy(g.begin(), g.end(), out + static_cast<size_t>(f) * m1);
  }
}

}  // extern "C"

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
#include <algorithm>
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

// Harvest-class F0 (same algorithm/constants as serenade_tpu/ops/harvest.py,
// which documents the relationship to WORLD's Harvest): band-pass channels
// at 1/24-octave spacing, four event-interval candidate detectors,
// channel-run merge, instantaneous-frequency refinement at the harmonics,
// Viterbi V/UV track selection.  The C++ and JAX implementations
// cross-validate each other (tests/test_native.py).
// Returns n_frames (= 1 + n/hop) or -1 on error.
int sn_harvest_f0(const float* audio, int64_t n, int fs, double f0_floor,
                  double f0_ceil, double frame_period_ms, float* out_f0,
                  float* out_vuv) {
  if (n <= 0 || fs <= 0 || f0_floor <= 0 || f0_ceil <= f0_floor) return -1;
  const double kTargetFs = 8000.0;
  const int r = std::max(static_cast<int>(fs / kTargetFs), 1);
  const double fs_d = static_cast<double>(fs) / r;
  const int hop = static_cast<int>(fs * frame_period_ms / 1000.0);
  const int n_frames = 1 + static_cast<int>(n / hop);
  const double hop_d = static_cast<double>(hop) / r;

  // --- decimate: Nuttall-windowed-sinc low-pass, then take every r-th ---
  const int64_t len_d = (n + r - 1) / r;
  std::vector<double> xd(len_d, 0.0);
  if (r == 1) {
    for (int64_t i = 0; i < n; ++i) xd[i] = audio[i];
  } else {
    const double cutoff = 0.47 / r;  // cycles/sample at the input rate
    const int half = 16 * r;
    std::vector<double> h(2 * half + 1);
    double hsum = 0.0;
    for (int i = -half; i <= half; ++i) {
      double t = i == 0 ? 2.0 * M_PI * cutoff
                        : std::sin(2.0 * M_PI * cutoff * i) / i;
      double u = (i + half) / static_cast<double>(2 * half);
      double w = 0.355768 - 0.487396 * std::cos(2.0 * M_PI * u)
               + 0.144232 * std::cos(4.0 * M_PI * u)
               - 0.012604 * std::cos(6.0 * M_PI * u);
      h[i + half] = t * w;
      hsum += t * w;
    }
    for (double& v : h) v /= hsum;
    for (int64_t o = 0; o < len_d; ++o) {
      const int64_t c = o * r;
      double acc = 0.0;
      for (int i = -half; i <= half; ++i) {
        int64_t idx = c + i;
        if (idx >= 0 && idx < n) acc += h[i + half] * audio[idx];
      }
      xd[o] = acc;
    }
  }

  // --- channels ---
  const int n_ch = static_cast<int>(
      std::ceil(std::log2(f0_ceil / f0_floor) * 24.0));
  const int max_flh = static_cast<int>(
      std::lround(fs_d / (f0_floor * std::pow(2.0, 1.0 / 24.0)) * 2.0));
  const int nfft = next_pow2(static_cast<int>(len_d) + 4 * max_flh);

  std::vector<double> xre(nfft, 0.0), xim(nfft, 0.0);
  for (int64_t i = 0; i < len_d; ++i) xre[i] = xd[i];
  fft_radix2(xre.data(), xim.data(), nfft, false);

  std::vector<int> frame_s(n_frames);
  for (int f = 0; f < n_frames; ++f)
    frame_s[f] = std::min(static_cast<int>(f * hop_d),
                          static_cast<int>(len_d) - 1);

  const int kSlots = 16;
  std::vector<double> cand(static_cast<size_t>(n_frames) * kSlots, 0.0);
  std::vector<int> slot_count(n_frames, 0);
  std::vector<double> run_sum(n_frames, 0.0);
  std::vector<int> run_len(n_frames, 0);

  std::vector<double> fre(nfft), fim(nfft), y(nfft);

  auto interval_at = [&](const std::vector<double>& ev, double s) -> double {
    // f0 from the event pair enclosing sample s (piecewise constant)
    if (ev.size() < 2) return 0.0;
    auto it = std::upper_bound(ev.begin(), ev.end(), s + 1.0);
    if (it == ev.begin() || it == ev.end()) return 0.0;
    double nx = *it, pv = *(it - 1);
    if (nx <= pv + 1e-3) return 0.0;
    return fs_d / (nx - pv);
  };

  for (int c = 0; c < n_ch; ++c) {
    const double bf0 = f0_floor * std::pow(2.0, (c + 1) / 24.0);
    const int flh = static_cast<int>(std::lround(fs_d / bf0 * 2.0));

    // band-pass: Nuttall envelope * cos(2 pi bf0 t), kernel centered at 0
    std::fill(fre.begin(), fre.end(), 0.0);
    std::fill(fim.begin(), fim.end(), 0.0);
    for (int i = -flh; i <= flh; ++i) {
      double u = (i + flh) / static_cast<double>(2 * flh);
      double w = 0.355768 - 0.487396 * std::cos(2.0 * M_PI * u)
               + 0.144232 * std::cos(4.0 * M_PI * u)
               - 0.012604 * std::cos(6.0 * M_PI * u);
      fre[(i % nfft + nfft) % nfft] = w * std::cos(2.0 * M_PI * bf0 * i / fs_d);
    }
    fft_radix2(fre.data(), fim.data(), nfft, false);
    for (int k = 0; k < nfft; ++k) {
      double rr = fre[k] * xre[k] - fim[k] * xim[k];
      double ri = fre[k] * xim[k] + fim[k] * xre[k];
      fre[k] = rr;
      fim[k] = ri;
    }
    fft_radix2(fre.data(), fim.data(), nfft, true);
    for (int k = 0; k < nfft; ++k) y[k] = fre[k];

    // four estimators (falling/rising zero crossings of y and of dy):
    // build the event lists once per channel, then evaluate frames
    std::vector<double> evs[4];
    const int64_t vl = static_cast<int64_t>(len_d);
    for (int64_t t = 0; t + 1 < vl; ++t) {
      double a = y[t], b = y[t + 1];
      if (a > 0.0 && b <= 0.0 && a != b)
        evs[0].push_back(t + a / (a - b));  // falling ZC
      if (-a > 0.0 && -b <= 0.0 && a != b)
        evs[1].push_back(t + (-a) / (b - a));  // rising ZC
    }
    for (int64_t t = 0; t + 2 < vl; ++t) {
      double a = y[t + 1] - y[t], b = y[t + 2] - y[t + 1];
      if (a > 0.0 && b <= 0.0 && a != b)
        evs[2].push_back(t + a / (a - b));  // peaks
      if (-a > 0.0 && -b <= 0.0 && a != b)
        evs[3].push_back(t + (-a) / (b - a));  // dips
    }

    const double lo_gate = 0.9 * bf0, hi_gate = 1.1 * bf0;
    for (int f = 0; f < n_frames; ++f) {
      double s = frame_s[f];
      double sum = 0.0;
      bool valid = true;
      for (int e = 0; e < 4; ++e) {
        double v = interval_at(evs[e], s);
        if (v <= 0.0) {
          valid = false;
          break;
        }
        sum += v;
      }
      double m4 = sum / 4.0;
      bool gated = valid && m4 > lo_gate && m4 < hi_gate && m4 >= f0_floor &&
                   m4 <= f0_ceil;
      if (gated) {
        run_sum[f] += m4;
        run_len[f] += 1;
      } else if (run_len[f] > 0) {  // close the run
        if (slot_count[f] < kSlots)
          cand[static_cast<size_t>(f) * kSlots + slot_count[f]++] =
              run_sum[f] / run_len[f];
        run_sum[f] = 0.0;
        run_len[f] = 0;
      }
    }
  }
  for (int f = 0; f < n_frames; ++f)
    if (run_len[f] > 0 && slot_count[f] < kSlots)
      cand[static_cast<size_t>(f) * kSlots + slot_count[f]++] =
          run_sum[f] / run_len[f];

  // --- refinement: IF at the harmonics, Nuttall window over 3 periods ---
  const double kCostScale = 4.0, kVoicedBias = 0.12;
  const double kOctaveCost = 6.0, kSwitchCost = 0.4;
  const int kHarm = 6;
  std::vector<double> ref_f0(static_cast<size_t>(n_frames) * kSlots, 0.0);
  std::vector<double> cost(static_cast<size_t>(n_frames) * kSlots, 1e6);
  const double nyq = 0.5 * fs_d;
  for (int f = 0; f < n_frames; ++f) {
    for (int k = 0; k < slot_count[f]; ++k) {
      double c0 = cand[static_cast<size_t>(f) * kSlots + k];
      if (c0 < 1.0) continue;
      int halfw = static_cast<int>(std::ceil(1.5 * fs_d / c0));
      double num = 0.0, den = 0.0, dev = 0.0;
      for (int h = 1; h <= kHarm; ++h) {
        double fh = c0 * h;
        if (fh >= nyq) break;
        double re = 0.0, im = 0.0, re_d = 0.0, im_d = 0.0;
        for (int i = -halfw; i <= halfw; ++i) {
          int64_t idx = frame_s[f] + i;
          if (idx < 0 || idx >= static_cast<int64_t>(len_d)) continue;
          double t_rel = i / fs_d;
          double u = t_rel * c0 / 3.0 + 0.5;
          if (u < 0.0 || u > 1.0) continue;
          double w = 0.355768 - 0.487396 * std::cos(2.0 * M_PI * u)
                   + 0.144232 * std::cos(4.0 * M_PI * u)
                   - 0.012604 * std::cos(6.0 * M_PI * u);
          double dw = (0.487396 * 2.0 * M_PI * std::sin(2.0 * M_PI * u)
                     - 0.144232 * 4.0 * M_PI * std::sin(4.0 * M_PI * u)
                     + 0.012604 * 6.0 * M_PI * std::sin(6.0 * M_PI * u))
                    * (c0 / 3.0);
          double ph = 2.0 * M_PI * fh * t_rel;
          double cs = std::cos(ph), sn = std::sin(ph);
          double xv = xd[idx];
          re += xv * w * cs;
          im -= xv * w * sn;
          re_d += xv * dw * cs;
          im_d -= xv * dw * sn;
        }
        double p = re * re + im * im;
        if (p < 1e-20) continue;
        double delta = -(im_d * re - re_d * im) / (2.0 * M_PI * p);
        double est_h = (fh + delta) / h;
        // per-harmonic consistency gate (see ops/harvest.py): fundamental
        // main-lobe leakage into the h>=2 probes otherwise biases flat
        if (std::fabs(est_h - c0) >= 0.1 * c0) continue;
        double amp = std::sqrt(p);
        num += amp * est_h;
        den += amp;
        dev += amp * std::fabs(est_h - c0);
      }
      if (den <= 1e-8) continue;
      double refined = num / den;
      double spread = dev / (den * std::max(refined, 1.0));
      if (std::fabs(refined - c0) < 0.18 * c0 && refined >= f0_floor &&
          refined <= f0_ceil) {
        ref_f0[static_cast<size_t>(f) * kSlots + k] = refined;
        cost[static_cast<size_t>(f) * kSlots + k] = spread * kCostScale;
      }
    }
  }

  // --- Viterbi over K voiced states + 1 unvoiced (ops/f0.py trellis) ---
  const int S = kSlots + 1;
  std::vector<double> dp(static_cast<size_t>(n_frames) * S);
  std::vector<int> bp(static_cast<size_t>(n_frames) * S, 0);
  auto logf = [&](int f, int s) -> double {
    if (s == kSlots) return 0.0;
    double v = ref_f0[static_cast<size_t>(f) * kSlots + s];
    return std::log2(std::max(v, 1.0));
  };
  auto emit = [&](int f, int s) -> double {
    return s == kSlots ? kVoicedBias
                       : cost[static_cast<size_t>(f) * kSlots + s];
  };
  for (int s = 0; s < S; ++s) dp[s] = emit(0, s);
  for (int f = 1; f < n_frames; ++f) {
    for (int s = 0; s < S; ++s) {
      double best = 1e30;
      int arg = 0;
      bool cur_v = s < kSlots;
      for (int p = 0; p < S; ++p) {
        bool prev_v = p < kSlots;
        double trans = 0.0;
        if (cur_v && prev_v)
          trans += kOctaveCost * std::fabs(logf(f, s) - logf(f - 1, p));
        if (cur_v != prev_v) trans += kSwitchCost;
        double tot = dp[static_cast<size_t>(f - 1) * S + p] + trans;
        if (tot < best) {
          best = tot;
          arg = p;
        }
      }
      dp[static_cast<size_t>(f) * S + s] = best + emit(f, s);
      bp[static_cast<size_t>(f) * S + s] = arg;
    }
  }
  int s = 0;
  double best = 1e30;
  for (int k = 0; k < S; ++k)
    if (dp[static_cast<size_t>(n_frames - 1) * S + k] < best) {
      best = dp[static_cast<size_t>(n_frames - 1) * S + k];
      s = k;
    }
  for (int f = n_frames - 1; f >= 0; --f) {
    double v = s < kSlots ? ref_f0[static_cast<size_t>(f) * kSlots + s] : 0.0;
    bool voiced = v >= f0_floor && v <= f0_ceil;
    out_f0[f] = voiced ? static_cast<float>(v) : 0.0f;
    out_vuv[f] = voiced ? 1.0f : 0.0f;
    if (f > 0) s = bp[static_cast<size_t>(f) * S + s];
  }
  return n_frames;
}

// CheapTrick spectral envelope (WORLD's analyzer, the pyworld.cheaptrick
// role): |H(w)|^2 per frame, out_sp is n_frames x (fft_size/2+1).
// Mirrors serenade_tpu/ops/world.py cheaptrick step for step
// (pitch-synchronous 3*T0 Hanning with window-weighted DC removal, DC
// bin correction, fractional-width box smoothing, sinc lifter + Q1
// compensation in the cepstral domain) so the two implementations
// cross-validate. fft_size must be a power of two
// (ops/world.py _fft_size_for). Returns 0, or -1 on error.
int sn_cheaptrick(const float* audio, int64_t n, int fs, const float* f0,
                  int n_frames, double f0_floor, double frame_period_ms,
                  int fft_size, double* out_sp) {
  if (n <= 0 || fs <= 0 || n_frames <= 0 || fft_size <= 0 ||
      (fft_size & (fft_size - 1)) != 0)
    return -1;
  const int hop = static_cast<int>(fs * frame_period_ms / 1000.0);
  // frame centers must stay inside the padded buffer (the JAX twin
  // clamps gathers; here out-of-range frames would read past the heap)
  if (hop <= 0 || static_cast<int64_t>(n_frames - 1) * hop > n) return -1;
  const int F = fft_size / 2 + 1;
  const int max_half = fft_size / 2;
  const double bin_hz = static_cast<double>(fs) / fft_size;
  const int pad = max_half + 1;

  std::vector<double> xp(static_cast<size_t>(n) + 2 * pad, 0.0);
  for (int64_t i = 0; i < n; ++i) xp[pad + i] = audio[i];

  std::vector<double> re(fft_size), im(fft_size), win(fft_size);
  std::vector<double> power(F), rep(F), smoothed(F), csum(F + 1);

  for (int f = 0; f < n_frames; ++f) {
    double f0s = f0[f] <= 0.0f ? 500.0 : f0[f];
    f0s = std::max(f0s, f0_floor);
    const int center = f * hop;

    // pitch-synchronous Hanning of length 3*T0 inside the buffer
    const double half_len = std::rint(1.5 * fs / f0s);
    double wsum = 0.0, xw = 0.0;
    for (int j = 0; j < fft_size; ++j) {
      const int off = j - max_half;
      double w = 0.0;
      if (std::abs(off) <= half_len)
        w = 0.5 + 0.5 * std::cos(M_PI * off / std::max(half_len, 1.0));
      win[j] = w;
      const double xv = xp[center + off + pad];
      wsum += w;
      xw += xv * w;
    }
    const double mean = xw / std::max(wsum, 1e-9);
    for (int j = 0; j < fft_size; ++j) {
      const int off = j - max_half;
      re[j] = (xp[center + off + pad] - mean) * win[j];
      im[j] = 0.0;
    }
    fft_radix2(re.data(), im.data(), fft_size, false);
    for (int k = 0; k < F; ++k) power[k] = re[k] * re[k] + im[k] * im[k] + 1e-12;

    // DCCorrection: add the spectrum mirrored around f0 below f0
    const double f0_bins = f0s / bin_hz;
    for (int k = 0; k < F; ++k) {
      rep[k] = 0.0;
      if (k < f0_bins) {
        const double mirror = f0_bins - k;
        const double lo = std::min(std::max(std::floor(mirror), 0.0),
                                   static_cast<double>(F - 2));
        const double frac = std::min(std::max(mirror - lo, 0.0), 1.0);
        const int lo_i = static_cast<int>(lo);
        rep[k] = (1.0 - frac) * power[lo_i] + frac * power[lo_i + 1];
      }
    }
    for (int k = 0; k < F; ++k) power[k] += rep[k];

    // LinearSmoothing: fractional-width box filter via cumulative sum
    const double w_bins = (2.0 * f0s / 3.0) / bin_hz;
    csum[0] = 0.0;
    for (int k = 0; k < F; ++k) csum[k + 1] = csum[k] + power[k];
    for (int k = 0; k < F; ++k) {
      const double lo = std::min(std::max(k - w_bins / 2.0, 0.0),
                                 static_cast<double>(F - 1));
      const double hi = std::min(std::max(k + w_bins / 2.0, 0.0),
                                 static_cast<double>(F - 1));
      const int lo_i = static_cast<int>(std::floor(lo));
      const int hi_i = static_cast<int>(std::floor(hi));
      const double area = csum[hi_i] - csum[lo_i]
          + (hi - hi_i) * power[std::min(hi_i, F - 1)]
          - (lo - lo_i) * power[std::min(lo_i, F - 1)];
      smoothed[k] = area / std::max(hi - lo, 1e-6);
    }

    // cepstral liftering: log -> quefrency -> sinc lifter * Q1 comp -> back
    for (int k = 0; k < fft_size; ++k) {
      const int kk = std::min(k, fft_size - k);
      re[k] = std::log(std::max(smoothed[kk], 1e-12));
      im[k] = 0.0;
    }
    fft_radix2(re.data(), im.data(), fft_size, true);  // cepstrum (real)
    for (int k = 0; k < fft_size; ++k) {
      const double q = std::min(k, fft_size - k) / static_cast<double>(fs);
      const double f0q = f0s * q;
      const double lifter = f0q == 0.0
          ? 1.0
          : std::sin(M_PI * f0q) / std::max(M_PI * f0q, 1e-9);
      const double comp = (1.0 + 0.3) - 0.3 * std::cos(2.0 * M_PI * f0q);
      re[k] *= lifter * comp;
      im[k] = 0.0;
    }
    fft_radix2(re.data(), im.data(), fft_size, false);
    double* row = out_sp + static_cast<size_t>(f) * F;
    for (int k = 0; k < F; ++k) row[k] = std::exp(re[k]);
  }
  return 0;
}

// Coarse band aperiodicity in dB (the pyworld.d4c coded-aperiodicity
// role): out_bap is n_frames x n_bands with bands at 3 kHz spacing,
// n_bands = floor(min(15000, fs/2 - 3000) / 3000). Mirrors
// serenade_tpu/ops/world.py band_aperiodicity (Hann-windowed power
// spectrum, Wiener-Khinchin autocorrelation at the exact fractional
// pitch period, window-decay normalization). Returns n_bands, -1 on error.
int sn_band_aperiodicity(const float* audio, int64_t n, int fs,
                         const float* f0, int n_frames,
                         double frame_period_ms, float* out_bap) {
  if (n <= 0 || fs <= 0 || n_frames <= 0) return -1;
  const int hop = static_cast<int>(fs * frame_period_ms / 1000.0);
  // frame windows must stay inside the padded buffer (see sn_cheaptrick)
  if (hop <= 0 || static_cast<int64_t>(n_frames - 1) * hop > n) return -1;
  const int win_len = 1024;
  const int nfft = 2 * win_len;
  const int F = nfft / 2 + 1;
  const int n_bands =
      static_cast<int>(std::min(15000.0, fs / 2.0 - 3000.0) / 3000.0);
  if (n_bands <= 0) return -1;

  std::vector<double> xp(static_cast<size_t>(n) + win_len / 2 + win_len, 0.0);
  for (int64_t i = 0; i < n; ++i) xp[win_len / 2 + i] = audio[i];

  std::vector<double> window(win_len), re(nfft), im(nfft);
  std::vector<double> power(F), freqs(F), w2(F), cosv(F);
  for (int j = 0; j < win_len; ++j)
    window[j] = 0.5 - 0.5 * std::cos(2.0 * M_PI * j / win_len);
  for (int k = 0; k < F; ++k)
    freqs[k] = static_cast<double>(k) * fs / nfft;

  // the window's own power spectrum (for the decay normalization)
  std::fill(re.begin(), re.end(), 0.0);
  std::fill(im.begin(), im.end(), 0.0);
  for (int j = 0; j < win_len; ++j) re[j] = window[j];
  fft_radix2(re.data(), im.data(), nfft, false);
  double w2_sum = 0.0;
  for (int k = 0; k < F; ++k) {
    const double wgt = (k == 0 || k == F - 1) ? 0.5 : 1.0;
    w2[k] = (re[k] * re[k] + im[k] * im[k]) * wgt;
    w2_sum += w2[k];
  }

  for (int f = 0; f < n_frames; ++f) {
    const double f0s = std::max(f0[f] <= 0.0f ? 500.0 : f0[f], 40.0);
    const double tau = 1.0 / f0s;
    const int center = f * hop;
    std::fill(re.begin(), re.end(), 0.0);
    std::fill(im.begin(), im.end(), 0.0);
    for (int j = 0; j < win_len; ++j)
      re[j] = xp[center + j] * window[j];
    fft_radix2(re.data(), im.data(), nfft, false);
    double r_w = 0.0;
    for (int k = 0; k < F; ++k) {
      const double wgt = (k == 0 || k == F - 1) ? 0.5 : 1.0;
      power[k] = (re[k] * re[k] + im[k] * im[k]) * wgt;
      cosv[k] = std::cos(2.0 * M_PI * freqs[k] * tau);
      r_w += w2[k] * cosv[k];
    }
    r_w /= w2_sum;

    float* row = out_bap + static_cast<size_t>(f) * n_bands;
    for (int b = 0; b < n_bands; ++b) {
      const double lo = b * 3000.0;
      const double hi = (b + 1) * 3000.0;
      double energy = 0.0, r = 0.0;
      for (int k = 0; k < F; ++k) {
        if (freqs[k] >= lo && freqs[k] < hi) {
          energy += power[k];
          r += power[k] * cosv[k];
        }
      }
      const double rn = r / std::max(energy, 1e-12) / std::max(r_w, 1e-3);
      const double ap = std::min(std::max(1.0 - rn, 1e-6), 1.0);
      row[b] = f0[f] <= 0.0f ? 0.0f
                             : static_cast<float>(10.0 * std::log10(ap));
    }
  }
  return n_bands;
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

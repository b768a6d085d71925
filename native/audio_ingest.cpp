// Native host-side audio ingest for mla_tpu (the runtime tier around the
// TPU compute path; the reference's host front-end prep is its hot loop #1,
// SURVEY.md §3.1 — decode/resample stay on host, so they are implemented
// natively here and exposed to Python via ctypes).
//
// Components:
//   - RIFF/WAVE decoder: PCM 8/16/24/32-bit and IEEE float32/64, any
//     channel count (mean-downmixed to mono), fmt-chunk walking.
//   - Polyphase rational resampler: windowed-sinc (Kaiser) low-pass FIR at
//     L/M rate conversion, zero-phase-aligned like scipy.resample_poly.
//   - Streaming ring buffer: accumulate arbitrary sample blocks, pop
//     fixed-size front-end chunks with patch-hop overlap retention.
//
// Build: g++ -O3 -march=native -shared -fPIC audio_ingest.cpp -o libaudio_ingest.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// ---------- Kaiser-windowed sinc FIR (scipy.resample_poly semantics) ----------

double bessel_i0(double x) {
  // series expansion; converges fast for the beta range we use
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 64; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-21 * sum) break;
  }
  return sum;
}

long gcd_long(long a, long b) { return b == 0 ? a : gcd_long(b, a % b); }

// firwin(2*half_len+1, cutoff, window=('kaiser', beta)) * scale — the same
// filter scipy.resample_poly builds internally (half_len = 10 * max(L, M)).
std::vector<double> design_filter(long up, long down) {
  const long max_rate = std::max(up, down);
  const double f_c = 1.0 / (2.0 * max_rate);  // normalized (Nyquist = 0.5)
  const long half_len = 10 * max_rate;
  const long n = 2 * half_len + 1;
  const double beta = 5.0;
  std::vector<double> h(n);
  const double i0b = bessel_i0(beta);
  for (long i = 0; i < n; ++i) {
    const double m = static_cast<double>(i) - half_len;
    const double sinc = (m == 0.0) ? 2.0 * f_c
                                   : std::sin(2.0 * kPi * f_c * m) / (kPi * m);
    const double r = m / half_len;
    const double kaiser = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / i0b;
    h[i] = sinc * kaiser;
  }
  // normalize DC gain to `up` (resample_poly scales by up)
  double dc = 0.0;
  for (double v : h) dc += v;
  const double scale = static_cast<double>(up) / dc;
  for (double& v : h) v *= scale;
  return h;
}

}  // namespace

extern "C" {

// ---------- WAV decode ----------

// Returns sample count written (mono), or -1 on parse error, -2 if out
// buffer too small. If out == nullptr, performs a dry run returning the
// required mono sample count and *sample_rate.
long wav_decode(const uint8_t* data, long n_bytes, float* out, long max_out,
                int* sample_rate) {
  if (n_bytes < 44 || std::memcmp(data, "RIFF", 4) || std::memcmp(data + 8, "WAVE", 4))
    return -1;
  long pos = 12;
  int fmt_code = -1, channels = 0, bits = 0, rate = 0;
  const uint8_t* pcm = nullptr;
  long pcm_bytes = 0;
  while (pos + 8 <= n_bytes) {
    const char* id = reinterpret_cast<const char*>(data + pos);
    uint32_t size;
    std::memcpy(&size, data + pos + 4, 4);
    const uint8_t* body = data + pos + 8;
    if (pos + 8 + static_cast<long>(size) > n_bytes) size = static_cast<uint32_t>(n_bytes - pos - 8);
    if (!std::memcmp(id, "fmt ", 4) && size >= 16) {
      uint16_t code, ch, bps;
      uint32_t sr;
      std::memcpy(&code, body, 2);
      std::memcpy(&ch, body + 2, 2);
      std::memcpy(&sr, body + 4, 4);
      std::memcpy(&bps, body + 14, 2);
      if (code == 0xFFFE && size >= 40) std::memcpy(&code, body + 24, 2);  // extensible
      fmt_code = code;
      channels = ch;
      bits = bps;
      rate = static_cast<int>(sr);
    } else if (!std::memcmp(id, "data", 4)) {
      pcm = body;
      pcm_bytes = size;
    }
    pos += 8 + size + (size & 1);  // chunks are word-aligned
  }
  if (!pcm || channels <= 0 || rate <= 0) return -1;
  const long bytes_per_sample = bits / 8;
  if (bytes_per_sample <= 0) return -1;
  const long n_frames = pcm_bytes / (bytes_per_sample * channels);
  if (sample_rate) *sample_rate = rate;
  if (!out) return n_frames;
  if (n_frames > max_out) return -2;

  const double inv_ch = 1.0 / channels;
  for (long f = 0; f < n_frames; ++f) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* p = pcm + (f * channels + c) * bytes_per_sample;
      double v = 0.0;
      if (fmt_code == 3) {  // IEEE float
        if (bits == 32) {
          float x;
          std::memcpy(&x, p, 4);
          v = x;
        } else if (bits == 64) {
          double x;
          std::memcpy(&x, p, 8);
          v = x;
        }
      } else {  // PCM
        if (bits == 16) {
          int16_t x;
          std::memcpy(&x, p, 2);
          v = x / 32768.0;
        } else if (bits == 32) {
          int32_t x;
          std::memcpy(&x, p, 4);
          v = x / 2147483648.0;
        } else if (bits == 24) {
          int32_t x = (p[0] << 8) | (p[1] << 16) | (p[2] << 24);
          v = (x >> 8) / 8388608.0;
        } else if (bits == 8) {
          v = (p[0] - 128) / 128.0;
        }
      }
      acc += v;
    }
    out[f] = static_cast<float>(acc * inv_ch);
  }
  return n_frames;
}

// ---------- Polyphase resample ----------

// scipy.signal.resample_poly(x, up, down) semantics (kaiser beta=5,
// half_len=10*max_rate, same-phase output length ceil(n*up/down)).
// Returns samples written, -2 if out buffer too small.
long resample_poly(const float* in, long n_in, long sr_in, long sr_out,
                   float* out, long max_out) {
  if (sr_in == sr_out) {
    if (n_in > max_out) return -2;
    std::memcpy(out, in, n_in * sizeof(float));
    return n_in;
  }
  const long g = gcd_long(sr_in, sr_out);
  const long up = sr_out / g, down = sr_in / g;
  const long n_out = (n_in * up + down - 1) / down;
  if (n_out > max_out) return -2;
  const std::vector<double> h = design_filter(up, down);
  const long half_len = (static_cast<long>(h.size()) - 1) / 2;

  // y[m] = sum_k h[k] * x_up[m*down - k + half_len], where x_up is the
  // zero-stuffed input: x_up[i] = x[i/up] when i % up == 0.
  for (long m = 0; m < n_out; ++m) {
    const long center = m * down + half_len;
    // only taps where (center - k) % up == 0 contribute; walk those
    double acc = 0.0;
    // smallest k >= max(0, center - (n_in-1)*up) with (center - k) % up == 0
    long k_lo = std::max(0L, center - (n_in - 1) * up);
    const long rem = (center - k_lo) % up;
    k_lo += rem;  // align to a multiple
    const long k_hi = std::min(static_cast<long>(h.size()) - 1, center);
    for (long k = k_lo; k <= k_hi; k += up) {
      acc += h[k] * in[(center - k) / up];
    }
    out[m] = static_cast<float>(acc);
  }
  return n_out;
}

// ---------- mu-law wire codec (G.711-style, mu=255) ----------
// Same math as mla_tpu.data.audio_io.mulaw_{encode,decode} (the serving
// wire format); the native tier lets high-rate feeders compress before the
// HTTP hop without touching Python per block. nearbyint (round-half-even)
// matches numpy's rounding exactly.

void mulaw_encode(const float* in, long n, uint8_t* out) {
  const double denom = std::log1p(255.0);
  for (long i = 0; i < n; ++i) {
    double x = std::max(-1.0, std::min(1.0, static_cast<double>(in[i])));
    const double s = (x > 0.0) - (x < 0.0);
    const double y = s * std::log1p(255.0 * std::fabs(x)) / denom;
    const double q = std::nearbyint((y + 1.0) * 127.5);
    out[i] = static_cast<uint8_t>(std::max(0.0, std::min(255.0, q)));
  }
}

void mulaw_decode(const uint8_t* in, long n, float* out) {
  const double lp = std::log1p(255.0);
  for (long i = 0; i < n; ++i) {
    const double y = in[i] / 127.5 - 1.0;
    const double s = (y > 0.0) - (y < 0.0);
    out[i] = static_cast<float>(s * std::expm1(std::fabs(y) * lp) / 255.0);
  }
}

// ---------- 4-bit block-independent IMA ADPCM encoder ----------
// The serving wire codec (mla_tpu/data/adpcm.py is the spec and the
// bit-exact numpy twin; the device decodes inside the jitted chunk
// program). Blocks reset encoder state (pred = first sample, step index
// from the integer mean |first difference|) so encode parallelizes across
// blocks and decode parallelizes on the TPU.

namespace {

const int32_t kAdpcmStep[89] = {
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767};

const int32_t kAdpcmIndex[8] = {-1, -1, -1, -1, 2, 4, 6, 8};

}  // namespace

namespace {

// One row of the wire buffer, block-interleaved: per block the
// self-contained unit [nibbles block/2 | pred0 int16-LE | index0].
// Bit-identical to adpcm.adpcm4_encode's numpy path.
void adpcm4_encode_row(const int16_t* row, long n, long block,
                       uint8_t* wrow) {
  const long n_blocks = n / block;
  const long wb = block / 2 + 3;
  for (long blk = 0; blk < n_blocks; ++blk) {
    const int16_t* b = row + blk * block;
    uint8_t* unit = wrow + blk * wb;
    long sum = 0;
    for (long i = 1; i < block; ++i)
      sum += std::labs(static_cast<long>(b[i]) - b[i - 1]);
    const int32_t mean =
        block > 1 ? static_cast<int32_t>(sum / (block - 1)) : 0;
    int32_t index = 0;
    while (index < 88 && kAdpcmStep[index] < mean) ++index;
    int32_t pred = b[0];
    unit[block / 2] = static_cast<uint8_t>(pred & 0xFF);
    unit[block / 2 + 1] = static_cast<uint8_t>((pred >> 8) & 0xFF);
    unit[block / 2 + 2] = static_cast<uint8_t>(index);
    for (long i = 0; i < block; ++i) {
      const int32_t step = kAdpcmStep[index];
      int32_t diff = b[i] - pred;
      const int32_t sign = diff < 0;
      int32_t mag = sign ? -diff : diff;
      const int32_t n3 = mag >= step;
      mag -= n3 * step;
      const int32_t h = step >> 1;
      const int32_t n2 = mag >= h;
      mag -= n2 * h;
      const int32_t q = step >> 2;
      const int32_t n1 = mag >= q;
      const int32_t code = (sign << 3) | (n3 << 2) | (n2 << 1) | n1;
      const int32_t delta = (step >> 3) + n3 * step + n2 * h + n1 * q;
      pred += sign ? -delta : delta;
      pred = std::max(-32768, std::min(32767, pred));
      index = std::max(0, std::min(88, index + kAdpcmIndex[code & 7]));
      if (i & 1)
        unit[i >> 1] |= static_cast<uint8_t>(code << 4);
      else
        unit[i >> 1] = static_cast<uint8_t>(code);
    }
  }
}

}  // namespace

// x: [rows, n] int16 with n a multiple of block -> block-interleaved wire
// [rows, (n/block)*(block/2+3)] uint8. Blocks are coder-independent, so
// rows encode in parallel when cores exist (the serving host here has 1;
// the serving tier therefore buffers wire bytes and never encodes).
void adpcm4_encode(const int16_t* x, long rows, long n, long block,
                   uint8_t* wire) {
  const long wrow_len = n / 2 + 3 * (n / block);
  const long n_threads =
      std::min<long>(rows, std::max(1u, std::thread::hardware_concurrency()));
  if (n_threads <= 1 || rows == 1) {
    for (long r = 0; r < rows; ++r)
      adpcm4_encode_row(x + r * n, n, block, wire + r * wrow_len);
    return;
  }
  std::vector<std::thread> pool;
  std::atomic<long> next(0);
  for (long t = 0; t < n_threads; ++t)
    pool.emplace_back([&]() {
      for (long r = next.fetch_add(1); r < rows; r = next.fetch_add(1))
        adpcm4_encode_row(x + r * n, n, block, wire + r * wrow_len);
    });
  for (auto& th : pool) th.join();
}

// 2-bit variant (the thinnest wire rung; mla_tpu/data/adpcm.py
// adpcm2_encode's numpy path is the spec — bit-identical): code =
// sign<<1 | mag, delta = step/2 + mag*step, index += mag ? +2 : -1.
// Wire unit per block: [codes block/4 | pred0 int16-LE | index0].
void adpcm2_encode_row(const int16_t* row, long n, long block,
                       uint8_t* wrow) {
  const long n_blocks = n / block;
  const long wb = block / 4 + 3;
  for (long blk = 0; blk < n_blocks; ++blk) {
    const int16_t* b = row + blk * block;
    uint8_t* unit = wrow + blk * wb;
    long sum = 0;
    for (long i = 1; i < block; ++i)
      sum += std::labs(static_cast<long>(b[i]) - b[i - 1]);
    const int32_t mean =
        block > 1 ? static_cast<int32_t>(sum / (block - 1)) : 0;
    int32_t index = 0;
    while (index < 88 && kAdpcmStep[index] < mean) ++index;
    int32_t pred = b[0];
    unit[block / 4] = static_cast<uint8_t>(pred & 0xFF);
    unit[block / 4 + 1] = static_cast<uint8_t>((pred >> 8) & 0xFF);
    unit[block / 4 + 2] = static_cast<uint8_t>(index);
    for (long i = 0; i < block; ++i) {
      const int32_t step = kAdpcmStep[index];
      const int32_t diff = b[i] - pred;
      const int32_t sign = diff < 0;
      const int32_t mag = (sign ? -diff : diff) >= step;
      const int32_t code = (sign << 1) | mag;
      const int32_t delta = (step >> 1) + mag * step;
      pred += sign ? -delta : delta;
      pred = std::max(-32768, std::min(32767, pred));
      index = std::max(0, std::min(88, index + (mag ? 2 : -1)));
      const int sh = (i & 3) * 2;
      if (sh == 0)
        unit[i >> 2] = static_cast<uint8_t>(code);
      else
        unit[i >> 2] |= static_cast<uint8_t>(code << sh);
    }
  }
}
void adpcm2_encode(const int16_t* x, long rows, long n, long block,
                   uint8_t* wire) {
  const long wrow_len = n / 4 + 3 * (n / block);
  const long n_threads =
      std::min<long>(rows, std::max(1u, std::thread::hardware_concurrency()));
  if (n_threads <= 1 || rows == 1) {
    for (long r = 0; r < rows; ++r)
      adpcm2_encode_row(x + r * n, n, block, wire + r * wrow_len);
    return;
  }
  std::vector<std::thread> pool;
  std::atomic<long> next(0);
  for (long t = 0; t < n_threads; ++t)
    pool.emplace_back([&]() {
      for (long r = next.fetch_add(1); r < rows; r = next.fetch_add(1))
        adpcm2_encode_row(x + r * n, n, block, wire + r * wrow_len);
    });
  for (auto& th : pool) th.join();
}

// ---------- Streaming ring buffer ----------

struct RingBuffer {
  std::vector<float> buf;
  long start = 0;  // absolute index of buf[0] in the stream
  long len = 0;    // valid samples
};

void* ring_new() { return new RingBuffer(); }

void ring_free(void* rb) { delete static_cast<RingBuffer*>(rb); }

void ring_push(void* rb, const float* x, long n) {
  auto* r = static_cast<RingBuffer*>(rb);
  r->buf.resize(r->len + n);
  std::memcpy(r->buf.data() + r->len, x, n * sizeof(float));
  r->len += n;
}

long ring_size(void* rb) { return static_cast<RingBuffer*>(rb)->len; }

// Pop a chunk of `chunk` samples (written to out) and advance by `advance`
// samples, keeping the overlap tail. Returns 1 on success, 0 if not enough
// data buffered.
int ring_pop_chunk(void* rb, float* out, long chunk, long advance) {
  auto* r = static_cast<RingBuffer*>(rb);
  if (r->len < chunk) return 0;
  std::memcpy(out, r->buf.data(), chunk * sizeof(float));
  const long adv = std::min(advance, r->len);
  r->buf.erase(r->buf.begin(), r->buf.begin() + adv);
  r->len -= adv;
  r->start += adv;
  return 1;
}

}  // extern "C"

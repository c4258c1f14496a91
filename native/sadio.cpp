// sadio — native audio I/O for the synthetic-audio-detection TPU framework.
//
// The reference leans on ffmpeg subprocesses + torchaudio C++ ops for all
// decode work (reference: audio_convert.py:26-34, submodel_trainer.py:143).
// This library is the TPU-framework equivalent of that native layer: a
// dependency-free RIFF/WAVE parser with mono downmix and a multithreaded
// batch decoder, exposed through a C ABI consumed via ctypes
// (synthetic_audio_detection_tpu/audio/native.py). It keeps the host decode
// stage off the Python GIL so DataLoader-style prefetch threads scale with
// cores.
//
// Supported: PCM 8/16/24/32-bit, IEEE float32/64, WAVE_FORMAT_EXTENSIBLE,
// arbitrary channel counts, chunk-order tolerant (same coverage as the
// pure-Python audio/wavio.py, byte-identical results — tests/test_native.py).
//
// Build: make -C native   (produces native/libsadio.so)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr uint16_t kFmtPcm = 0x0001;
constexpr uint16_t kFmtFloat = 0x0003;
constexpr uint16_t kFmtExtensible = 0xFFFE;

struct WavView {
  uint16_t format_tag = 0;
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  const uint8_t* data = nullptr;
  size_t data_size = 0;
};

inline uint16_t rd16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0] | (p[1] << 8));
}
inline uint32_t rd32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0] | (p[1] << 8) | (p[2] << 16) |
                               (static_cast<uint32_t>(p[3]) << 24));
}

// Returns 0 on success, negative error code otherwise.
int parse_wav(const uint8_t* buf, size_t size, WavView* out) {
  if (size < 12 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0)
    return -1;  // not RIFF/WAVE
  size_t pos = 12;
  bool have_fmt = false, have_data = false;
  while (pos + 8 <= size) {
    const uint8_t* cid = buf + pos;
    uint32_t csize = rd32(buf + pos + 4);
    size_t body = pos + 8;
    if (body + csize > size) csize = static_cast<uint32_t>(size - body);
    if (memcmp(cid, "fmt ", 4) == 0) {
      if (csize < 16) return -2;
      out->format_tag = rd16(buf + body);
      out->channels = rd16(buf + body + 2);
      out->sample_rate = rd32(buf + body + 4);
      out->bits = rd16(buf + body + 14);
      if (out->format_tag == kFmtExtensible && csize >= 40)
        out->format_tag = rd16(buf + body + 24);  // SubFormat GUID head
      have_fmt = true;
    } else if (memcmp(cid, "data", 4) == 0) {
      out->data = buf + body;
      out->data_size = csize;
      have_data = true;
    }
    pos = body + csize + (csize & 1);  // chunks are word-aligned
    if (have_fmt && have_data) break;
  }
  if (!have_fmt) return -2;
  if (!have_data) return -3;
  if (out->channels < 1) return -4;
  return 0;
}

int64_t frame_count(const WavView& w) {
  size_t bytes_per_sample = w.bits / 8;
  if (bytes_per_sample == 0) return -5;
  return static_cast<int64_t>(w.data_size / (bytes_per_sample * w.channels));
}

// Decode + mean-downmix into out[0..frames). Returns frames written or <0.
int64_t decode_mono(const WavView& w, float* out, int64_t max_frames) {
  int64_t frames = frame_count(w);
  if (frames < 0) return frames;
  if (frames > max_frames) frames = max_frames;
  const int ch = w.channels;
  const float inv_ch = 1.0f / ch;
  const uint8_t* p = w.data;

  if (w.format_tag == kFmtPcm) {
    switch (w.bits) {
      case 16: {
        const float s = 1.0f / 32768.0f;
        for (int64_t i = 0; i < frames; ++i) {
          float acc = 0.f;
          for (int c = 0; c < ch; ++c) {
            int16_t v = static_cast<int16_t>(rd16(p + (i * ch + c) * 2));
            acc += v * s;
          }
          out[i] = acc * inv_ch;
        }
        return frames;
      }
      case 32: {
        const double s = 1.0 / 2147483648.0;
        for (int64_t i = 0; i < frames; ++i) {
          double acc = 0.0;
          for (int c = 0; c < ch; ++c) {
            int32_t v = static_cast<int32_t>(rd32(p + (i * ch + c) * 4));
            acc += v * s;
          }
          out[i] = static_cast<float>(acc * inv_ch);
        }
        return frames;
      }
      case 24: {
        const float s = 1.0f / 8388608.0f;
        for (int64_t i = 0; i < frames; ++i) {
          float acc = 0.f;
          for (int c = 0; c < ch; ++c) {
            const uint8_t* q = p + (i * ch + c) * 3;
            int32_t v = q[0] | (q[1] << 8) | (q[2] << 16);
            if (v >= (1 << 23)) v -= (1 << 24);
            acc += v * s;
          }
          out[i] = acc * inv_ch;
        }
        return frames;
      }
      case 8: {  // unsigned
        const float s = 1.0f / 128.0f;
        for (int64_t i = 0; i < frames; ++i) {
          float acc = 0.f;
          for (int c = 0; c < ch; ++c)
            acc += (static_cast<float>(p[i * ch + c]) - 128.0f) * s;
          out[i] = acc * inv_ch;
        }
        return frames;
      }
      default:
        return -6;
    }
  } else if (w.format_tag == kFmtFloat) {
    if (w.bits == 32) {
      for (int64_t i = 0; i < frames; ++i) {
        float acc = 0.f;
        for (int c = 0; c < ch; ++c) {
          float v;
          memcpy(&v, p + (i * ch + c) * 4, 4);
          acc += v;
        }
        out[i] = acc * inv_ch;
      }
      return frames;
    }
    if (w.bits == 64) {
      for (int64_t i = 0; i < frames; ++i) {
        double acc = 0.0;
        for (int c = 0; c < ch; ++c) {
          double v;
          memcpy(&v, p + (i * ch + c) * 8, 8);
          acc += v;
        }
        out[i] = static_cast<float>(acc * inv_ch);
      }
      return frames;
    }
    return -6;
  }
  return -7;  // unsupported format tag
}

// Read a whole file into memory. Returns bytes read or <0.
int64_t slurp(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return -10;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (n < 0) { fclose(f); return -10; }
  buf->resize(static_cast<size_t>(n));
  size_t got = fread(buf->data(), 1, buf->size(), f);
  fclose(f);
  if (got != buf->size()) return -10;
  return n;
}

}  // namespace

extern "C" {

// Probe a WAV in memory. Returns 0 on success.
int sadio_wav_info(const uint8_t* data, int64_t size, int32_t* channels,
                   int32_t* sample_rate, int64_t* frames) {
  WavView w;
  int rc = parse_wav(data, static_cast<size_t>(size), &w);
  if (rc != 0) return rc;
  *channels = w.channels;
  *sample_rate = w.sample_rate;
  *frames = frame_count(w);
  return 0;
}

// Decode a WAV in memory to mono float32 (mean downmix).
// Returns frames written, or negative error.
int64_t sadio_decode_mono(const uint8_t* data, int64_t size, float* out,
                          int64_t max_frames, int32_t* sample_rate) {
  WavView w;
  int rc = parse_wav(data, static_cast<size_t>(size), &w);
  if (rc != 0) return rc;
  *sample_rate = w.sample_rate;
  return decode_mono(w, out, max_frames);
}

// Decode one file from disk to mono float32.
int64_t sadio_decode_file_mono(const char* path, float* out,
                               int64_t max_frames, int32_t* sample_rate) {
  std::vector<uint8_t> buf;
  int64_t n = slurp(path, &buf);
  if (n < 0) return n;
  return sadio_decode_mono(buf.data(), n, out, max_frames, sample_rate);
}

// Batch: decode `n` files into out[n, max_frames] (row-major), mean-downmixed,
// zero-padded. lengths[i] = frames decoded (or negative error), rates[i] =
// sample rate. `threads` worker threads (0 = hardware concurrency).
void sadio_decode_batch(const char** paths, int32_t n, float* out,
                        int64_t max_frames, int64_t* lengths, int32_t* rates,
                        int32_t threads) {
  if (threads <= 0) threads = static_cast<int32_t>(std::thread::hardware_concurrency());
  if (threads < 1) threads = 1;
  std::atomic<int32_t> next(0);
  auto worker = [&]() {
    std::vector<uint8_t> buf;
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n) return;
      float* row = out + static_cast<int64_t>(i) * max_frames;
      memset(row, 0, sizeof(float) * static_cast<size_t>(max_frames));
      int64_t got = slurp(paths[i], &buf);
      if (got < 0) {
        lengths[i] = got;
        rates[i] = 0;
        continue;
      }
      int32_t rate = 0;
      int64_t frames = sadio_decode_mono(buf.data(), got, row, max_frames, &rate);
      lengths[i] = frames;
      rates[i] = rate;
    }
  };
  std::vector<std::thread> pool;
  for (int32_t t = 0; t < threads && t < n; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

// Polyphase windowed-sinc resampling: y[k*new_g + p] = dot(xpad[k*orig_g : k*orig_g+L], kern[p]).
// `kern` is the [new_g, L] bank the Python side computes (ops/resample.py
// _sinc_kernels — torchaudio semantics); this is only the hot strided-dot
// loop, multithreaded over output positions. `x` has length n; the function
// pads with `width` zeros left and `width + orig_g` right internally.
// Returns samples written (= target_len) or <0 on error.
int64_t sadio_resample_poly(const float* x, int64_t n, const float* kern,
                            int32_t new_g, int32_t orig_g, int32_t L,
                            int32_t width, float* out, int64_t target_len,
                            int32_t threads) {
  if (n <= 0 || new_g <= 0 || orig_g <= 0 || L <= 0) return -20;
  const int64_t padded = n + width + width + orig_g;
  std::vector<float> xp(static_cast<size_t>(padded), 0.f);
  memcpy(xp.data() + width, x, sizeof(float) * static_cast<size_t>(n));
  const int64_t n_pos = (padded - L) / orig_g + 1;

  if (threads <= 0) threads = static_cast<int32_t>(std::thread::hardware_concurrency());
  if (threads < 1) threads = 1;
  std::atomic<int64_t> next(0);
  const int64_t chunk = 1024;  // output-frame positions per work unit

  auto worker = [&]() {
    for (;;) {
      int64_t start = next.fetch_add(chunk);
      if (start >= n_pos) return;
      int64_t end = start + chunk < n_pos ? start + chunk : n_pos;
      for (int64_t k = start; k < end; ++k) {
        const float* seg = xp.data() + k * orig_g;
        for (int32_t p = 0; p < new_g; ++p) {
          int64_t oi = k * new_g + p;
          if (oi >= target_len) break;
          const float* kp = kern + static_cast<int64_t>(p) * L;
          float acc = 0.f;
          for (int32_t i = 0; i < L; ++i) acc += seg[i] * kp[i];
          out[oi] = acc;
        }
      }
    }
  };
  std::vector<std::thread> pool;
  for (int32_t t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return target_len;
}

}  // extern "C"

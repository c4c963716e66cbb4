// Native data-loader core for avr_tpu.
//
// The reference feeds training through torch DataLoader worker processes
// (reference/avr_runner.py:94-96) and tinycudann's C++ runtime; this is the
// TPU build's native host-side equivalent: multi-threaded decoding of
// dataset files (.npy IR arrays, PCM/float WAV) with strided downsampling
// and windowing into caller-owned float32 matrices, so Python only performs
// one vectorized batched rFFT afterwards.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image):
//   avr_load_npy_batch  — MeshRIR-style per-IR .npy files ([1, T] float32/64)
//   avr_load_wav_batch  — RAF-style rir.wav files (PCM16/24/32, float32/64)
// Both return 0 on success, a negative error code (index of the first
// failing file minus 1) otherwise.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- npy ----
// Minimal .npy reader: v1.0/v2.0 headers, C-order, float32/float64,
// little-endian. Returns false on malformed/unsupported input.
bool read_npy(const char* path, std::vector<double>& out,
              std::vector<int64_t>& shape) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[8];
  if (std::fread(magic, 1, 8, f) != 8 || std::memcmp(magic, "\x93NUMPY", 6)) {
    std::fclose(f);
    return false;
  }
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char b[2];
    if (std::fread(b, 1, 2, f) != 2) { std::fclose(f); return false; }
    header_len = b[0] | (b[1] << 8);
  } else {
    unsigned char b[4];
    if (std::fread(b, 1, 4, f) != 4) { std::fclose(f); return false; }
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | (uint32_t(b[3]) << 24);
  }
  std::string header(header_len, '\0');
  if (std::fread(header.data(), 1, header_len, f) != header_len) {
    std::fclose(f);
    return false;
  }
  bool is_f8 = header.find("'<f8'") != std::string::npos;
  bool is_f4 = header.find("'<f4'") != std::string::npos;
  if ((!is_f4 && !is_f8) ||
      header.find("'fortran_order': False") == std::string::npos) {
    std::fclose(f);
    return false;
  }
  auto lp = header.find("'shape': (");
  if (lp == std::string::npos) { std::fclose(f); return false; }
  lp += 10;
  auto rp = header.find(')', lp);
  std::string dims = header.substr(lp, rp - lp);
  shape.clear();
  int64_t total = 1;
  for (size_t i = 0; i < dims.size();) {
    while (i < dims.size() && !isdigit(dims[i])) i++;
    if (i >= dims.size()) break;
    int64_t v = 0;
    while (i < dims.size() && isdigit(dims[i])) v = v * 10 + (dims[i++] - '0');
    shape.push_back(v);
    total *= v;
  }
  if (shape.empty()) { std::fclose(f); return false; }
  out.resize(total);
  bool ok;
  if (is_f8) {
    ok = std::fread(out.data(), 8, total, f) == size_t(total);
  } else {
    std::vector<float> tmp(total);
    ok = std::fread(tmp.data(), 4, total, f) == size_t(total);
    if (ok) for (int64_t i = 0; i < total; i++) out[i] = tmp[i];
  }
  std::fclose(f);
  return ok;
}

// ---------------------------------------------------------------- wav ----
bool read_wav(const char* path, std::vector<double>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  unsigned char hdr[12];
  if (std::fread(hdr, 1, 12, f) != 12 || std::memcmp(hdr, "RIFF", 4) ||
      std::memcmp(hdr + 8, "WAVE", 4)) {
    std::fclose(f);
    return false;
  }
  uint16_t fmt = 0, channels = 1, bits = 16;
  std::vector<unsigned char> data;
  while (true) {
    unsigned char ch[8];
    if (std::fread(ch, 1, 8, f) != 8) break;
    uint32_t size = ch[4] | (ch[5] << 8) | (ch[6] << 16) | (uint32_t(ch[7]) << 24);
    if (!std::memcmp(ch, "fmt ", 4)) {
      std::vector<unsigned char> p(size);
      if (std::fread(p.data(), 1, size, f) != size) break;
      fmt = p[0] | (p[1] << 8);
      channels = p[2] | (p[3] << 8);
      bits = p[14] | (p[15] << 8);
      if (fmt == 0xFFFE && size >= 26) fmt = p[24] | (p[25] << 8);
    } else if (!std::memcmp(ch, "data", 4)) {
      data.resize(size);
      if (std::fread(data.data(), 1, size, f) != size) break;
      if (fmt) break;
    } else {
      std::fseek(f, size + (size & 1), SEEK_CUR);
    }
    if (size & 1) std::fseek(f, 1, SEEK_CUR);
  }
  std::fclose(f);
  if (data.empty() || channels == 0) return false;

  size_t n;
  std::vector<double> all;
  if (fmt == 1 && bits == 16) {
    n = data.size() / 2;
    all.resize(n);
    auto* p = reinterpret_cast<int16_t*>(data.data());
    for (size_t i = 0; i < n; i++) all[i] = p[i] / 32768.0;
  } else if (fmt == 1 && bits == 32) {
    n = data.size() / 4;
    all.resize(n);
    auto* p = reinterpret_cast<int32_t*>(data.data());
    for (size_t i = 0; i < n; i++) all[i] = p[i] / 2147483648.0;
  } else if (fmt == 1 && bits == 24) {
    n = data.size() / 3;
    all.resize(n);
    for (size_t i = 0; i < n; i++) {
      int32_t v = data[3 * i] | (data[3 * i + 1] << 8) | (data[3 * i + 2] << 16);
      v = (v << 8) >> 8;  // sign-extend
      all[i] = v / 8388608.0;
    }
  } else if (fmt == 3 && bits == 32) {
    n = data.size() / 4;
    all.resize(n);
    auto* p = reinterpret_cast<float*>(data.data());
    for (size_t i = 0; i < n; i++) all[i] = p[i];
  } else if (fmt == 3 && bits == 64) {
    n = data.size() / 8;
    all.resize(n);
    auto* p = reinterpret_cast<double*>(data.data());
    for (size_t i = 0; i < n; i++) all[i] = p[i];
  } else {
    return false;
  }
  // downmix to mono
  if (channels > 1) {
    size_t frames = all.size() / channels;
    out.resize(frames);
    for (size_t i = 0; i < frames; i++) {
      double s = 0;
      for (unsigned c = 0; c < channels; c++) s += all[i * channels + c];
      out[i] = s / channels;
    }
  } else {
    out.swap(all);
  }
  return true;
}

// ------------------------------------------------------------ threading ---
template <typename Fn>
int parallel_for_files(int n_files, Fn&& body) {
  unsigned n_threads =
      std::min<unsigned>(std::max(1u, std::thread::hardware_concurrency()), 16);
  std::atomic<int> next{0}, first_error{0};
  auto worker = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n_files) {
      if (!body(i)) {
        int expected = 0;
        first_error.compare_exchange_strong(expected, -(i + 1));
      }
    }
  };
  std::vector<std::thread> pool;
  for (unsigned t = 0; t < n_threads; t++) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return first_error.load();
}

}  // namespace

extern "C" {

// Decode n_files .npy IRs into out[n_files, seq_len]: take row 0 of each
// array, stride-downsample by `stride`, start the window at `start`
// (post-stride index), zero-pad short tails.
int avr_load_npy_batch(const char** paths, int n_files, float* out,
                       int64_t seq_len, int64_t stride, int64_t start) {
  return parallel_for_files(n_files, [&](int i) {
    std::vector<double> raw;
    std::vector<int64_t> shape;
    if (!read_npy(paths[i], raw, shape)) return false;
    int64_t row_len = shape.back();
    const double* row = raw.data();  // row 0 of [1, T] (or flat [T])
    float* dst = out + int64_t(i) * seq_len;
    for (int64_t t = 0; t < seq_len; t++) {
      int64_t src = (start + t) * stride;
      dst[t] = src < row_len ? float(row[src]) : 0.0f;
    }
    return true;
  });
}

// Decode n_files WAVs into out[n_files, seq_len] with stride-downsampling.
int avr_load_wav_batch(const char** paths, int n_files, float* out,
                       int64_t seq_len, int64_t stride) {
  return parallel_for_files(n_files, [&](int i) {
    std::vector<double> audio;
    if (!read_wav(paths[i], audio)) return false;
    float* dst = out + int64_t(i) * seq_len;
    for (int64_t t = 0; t < seq_len; t++) {
      int64_t src = t * stride;
      dst[t] = src < int64_t(audio.size()) ? float(audio[src]) : 0.0f;
    }
    return true;
  });
}

int avr_fastload_version() { return 1; }

}  // extern "C"

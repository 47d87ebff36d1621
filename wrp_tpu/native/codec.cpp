// Native wire codec: the host-side hot loops of the streaming runtime.
//
// The reference spent most of its per-sector host time in
// Sector::fromByteArray + the repack loop (rpv2.cu:350-387 measures it as
// "deserialize"/"restructuring"; SURVEY.md section 6 shows host input
// dominated every GPU variant).  This is the same transform, vectorisable
// and parallelised over channel/part planes:
//
//   wire:   m*n samples x [hhI hhQ vvI vvQ vhI vhQ], int16 big-endian
//           (sector.cpp:52-62, read_single.cc:15)
//   planar: float32 [channels][2][m][n]  (the device-facing layout)
//
// Build: see build.py / Makefile in this directory.  Exposed via ctypes.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline int16_t be16(const uint8_t *p) {
  return static_cast<int16_t>((static_cast<uint16_t>(p[0]) << 8) |
                              static_cast<uint16_t>(p[1]));
}

void decode_plane(const uint8_t *wire, float *dst, size_t samples,
                  size_t offset_bytes, size_t stride_bytes) {
  const uint8_t *src = wire + offset_bytes;
  for (size_t s = 0; s < samples; ++s) {
    dst[s] = static_cast<float>(be16(src));
    src += stride_bytes;
  }
}

// Row-permuting variants: range row r lands at (r % radix)*(m/radix) +
// r/radix — the radix-DIT input order of the fused kernel
// (ops/pallas/fullchain.py radix_row_order).  Same cost as natural order:
// only the destination offset formula changes.
template <typename T>
void decode_plane_radix(const uint8_t *wire, T *dst, int64_t m, int64_t n,
                        size_t offset_bytes, size_t stride_bytes,
                        int32_t radix) {
  const uint8_t *src = wire + offset_bytes;
  const int64_t M = m / radix;
  for (int64_t r = 0; r < m; ++r) {
    T *row = dst + ((r % radix) * M + r / radix) * n;
    for (int64_t j = 0; j < n; ++j) {
      row[j] = static_cast<T>(be16(src));
      src += stride_bytes;
    }
  }
}

}  // namespace

extern "C" {

// wire[m*n*ch*4] BE int16 interleaved -> out[ch*2*m*n] float32 planar.
void wrp_decode_iq(const uint8_t *wire, float *out, int64_t m, int64_t n,
                   int64_t ch, int32_t num_threads) {
  const size_t samples = static_cast<size_t>(m) * static_cast<size_t>(n);
  const size_t stride = static_cast<size_t>(ch) * 4;  // bytes per sample
  const int planes = static_cast<int>(ch) * 2;

  if (num_threads <= 1 || planes <= 1) {
    for (int p = 0; p < planes; ++p) {
      decode_plane(wire, out + static_cast<size_t>(p) * samples, samples,
                   static_cast<size_t>(p) * 2, stride);
    }
    return;
  }
  // honour the thread-count knob: round-robin the planes over at most
  // num_threads workers (one-thread-per-plane would spawn ch*2 threads
  // no matter what WRP_CODEC_THREADS asked for)
  const int workers = std::min(num_threads, static_cast<int32_t>(planes));
  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int w = 0; w < workers; ++w) {
    pool.emplace_back([=] {
      for (int p = w; p < planes; p += workers) {
        decode_plane(wire, out + static_cast<size_t>(p) * samples, samples,
                     static_cast<size_t>(p) * 2, stride);
      }
    });
  }
  for (auto &t : pool) t.join();
}

// wire BE int16 interleaved -> int16 planar (compact device-feed layout:
// halves H2D bytes vs float32; the device converts on-chip).  radix > 1
// additionally writes range rows in radix-DIT order for the fused kernel.
void wrp_decode_iq_i16(const uint8_t *wire, int16_t *out, int64_t m,
                       int64_t n, int64_t ch, int32_t num_threads,
                       int32_t radix) {
  const size_t samples = static_cast<size_t>(m) * static_cast<size_t>(n);
  const size_t stride = static_cast<size_t>(ch) * 4;
  const int planes = static_cast<int>(ch) * 2;
  auto decode = [=](int p) {
    if (radix > 1) {
      decode_plane_radix<int16_t>(wire, out + static_cast<size_t>(p) * samples,
                                  m, n, static_cast<size_t>(p) * 2, stride,
                                  radix);
      return;
    }
    const uint8_t *src = wire + static_cast<size_t>(p) * 2;
    int16_t *dst = out + static_cast<size_t>(p) * samples;
    for (size_t s = 0; s < samples; ++s) {
      dst[s] = be16(src);
      src += stride;
    }
  };
  if (num_threads <= 1 || planes <= 1) {
    for (int p = 0; p < planes; ++p) decode(p);
    return;
  }
  const int workers = std::min(num_threads, static_cast<int32_t>(planes));
  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int w = 0; w < workers; ++w) {
    pool.emplace_back([=] {
      for (int p = w; p < planes; p += workers) decode(p);
    });
  }
  for (auto &t : pool) t.join();
}

// planar float32 [ch][2][m][n] -> wire BE int16 interleaved (producer side).
// Rounds to nearest-even like the Python encoder (np.round + astype), and
// wraps out-of-range values mod 2^16 the same way numpy's astype does —
// the two encoders must emit identical wire bytes for identical floats
// (truncation-toward-zero here used to shift LSBs vs the Python path).
void wrp_encode_iq(const float *planar, uint8_t *wire, int64_t m, int64_t n,
                   int64_t ch) {
  const size_t samples = static_cast<size_t>(m) * static_cast<size_t>(n);
  const size_t stride = static_cast<size_t>(ch) * 4;
  const int planes = static_cast<int>(ch) * 2;
  for (int p = 0; p < planes; ++p) {
    const float *src = planar + static_cast<size_t>(p) * samples;
    uint8_t *dst = wire + static_cast<size_t>(p) * 2;
    for (size_t s = 0; s < samples; ++s) {
      const float f = src[s];
      // NaN -> 0 (defined behaviour; inputs are integer-valued by
      // contract, so this only triggers on corrupt data)
      const int64_t v64 = (f == f) ? llrintf(f) : 0;
      const uint16_t v = static_cast<uint16_t>(v64 & 0xffff);
      dst[s * stride] = static_cast<uint8_t>((v >> 8) & 0xff);
      dst[s * stride + 1] = static_cast<uint8_t>(v & 0xff);
    }
  }
}

// float32 array -> big-endian bytes (floats.c aftoab equivalent).
void wrp_encode_be_f32(const float *src, uint8_t *dst, int64_t count) {
  for (int64_t i = 0; i < count; ++i) {
    uint32_t bits;
    std::memcpy(&bits, &src[i], 4);
    dst[i * 4 + 0] = static_cast<uint8_t>((bits >> 24) & 0xff);
    dst[i * 4 + 1] = static_cast<uint8_t>((bits >> 16) & 0xff);
    dst[i * 4 + 2] = static_cast<uint8_t>((bits >> 8) & 0xff);
    dst[i * 4 + 3] = static_cast<uint8_t>(bits & 0xff);
  }
}

}  // extern "C"

// Native data-path core for gpt4roi_tpu.
//
// The reference's input pipeline rides torch's C++ dataloader + cv2; this
// library provides the TPU framework's equivalent hot-path primitives so the
// host-side pipeline never bottlenecks the accelerator:
//   * fused bilinear resize (uint8 HWC -> float32, align_corners=false,
//     matching cv2/torch half-pixel semantics and the separable-matrix
//     formulation used on device) + CLIP normalisation, multithreaded over
//     rows;
//   * batched sequence collation: pad int32 id/label rows into fixed
//     (B, S) buffers in one pass.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in the image).
// Build: make -C native  (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

struct Tap {
  int lo;
  int hi;
  float frac;
};

// half-pixel (align_corners=false) source taps with border clamp — identical
// to gpt4roi_tpu.ops.interp.resize_matrix(..., align_corners=False).
static void build_taps(int in_size, int out_size, std::vector<Tap>& taps) {
  taps.resize(out_size);
  for (int i = 0; i < out_size; ++i) {
    double src = (i + 0.5) * (static_cast<double>(in_size) / out_size) - 0.5;
    src = std::min(std::max(src, 0.0), static_cast<double>(in_size - 1));
    int lo = static_cast<int>(std::floor(src));
    lo = std::min(lo, in_size > 1 ? in_size - 2 : 0);
    int hi = std::min(lo + 1, in_size - 1);
    taps[i] = {lo, hi, static_cast<float>(src - lo)};
  }
}

static void run_rows(int oh, int nthreads,
                     const std::function<void(int, int)>& fn) {
  if (nthreads <= 1) {
    fn(0, oh);
    return;
  }
  std::vector<std::thread> pool;
  int chunk = (oh + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int lo = t * chunk;
    int hi = std::min(oh, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back(fn, lo, hi);
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// uint8 (H, W, 3) -> float32 (OH, OW, 3), bilinear align_corners=false,
// then per-channel (x - mean) / std. mean/std are length-3.
void resize_normalize_u8(const uint8_t* src, int h, int w, float* dst, int oh,
                         int ow, const float* mean, const float* std_,
                         int nthreads) {
  std::vector<Tap> ytaps, xtaps;
  build_taps(h, oh, ytaps);
  build_taps(w, ow, xtaps);
  float inv_std[3] = {1.0f / std_[0], 1.0f / std_[1], 1.0f / std_[2]};

  auto body = [&](int row_lo, int row_hi) {
    std::vector<float> rowbuf(static_cast<size_t>(w) * 3);
    for (int i = row_lo; i < row_hi; ++i) {
      const Tap& ty = ytaps[i];
      const uint8_t* r0 = src + static_cast<size_t>(ty.lo) * w * 3;
      const uint8_t* r1 = src + static_cast<size_t>(ty.hi) * w * 3;
      float fy = ty.frac;
      // blend the two source rows once, reuse for every output column
      for (int x = 0; x < w * 3; ++x) {
        rowbuf[x] = (1.0f - fy) * r0[x] + fy * r1[x];
      }
      float* out = dst + static_cast<size_t>(i) * ow * 3;
      for (int j = 0; j < ow; ++j) {
        const Tap& tx = xtaps[j];
        const float* c0 = rowbuf.data() + static_cast<size_t>(tx.lo) * 3;
        const float* c1 = rowbuf.data() + static_cast<size_t>(tx.hi) * 3;
        float fx = tx.frac;
        for (int c = 0; c < 3; ++c) {
          float v = (1.0f - fx) * c0[c] + fx * c1[c];
          out[j * 3 + c] = (v - mean[c]) * inv_std[c];
        }
      }
    }
  };
  run_rows(oh, nthreads, body);
}

// Pad variable-length int32 rows into (B, S). lengths[i] gives row i's
// length; rows are concatenated in `flat`. Fill with pad_value; also writes
// a float32 attention mask when mask != nullptr.
void collate_pad_i32(const int32_t* flat, const int64_t* lengths, int batch,
                     int seq_len, int32_t pad_value, int32_t* out,
                     float* mask) {
  const int32_t* cursor = flat;
  for (int b = 0; b < batch; ++b) {
    int n = static_cast<int>(std::min<int64_t>(lengths[b], seq_len));
    int32_t* row = out + static_cast<size_t>(b) * seq_len;
    std::memcpy(row, cursor, sizeof(int32_t) * n);
    std::fill(row + n, row + seq_len, pad_value);
    if (mask != nullptr) {
      float* mrow = mask + static_cast<size_t>(b) * seq_len;
      std::fill(mrow, mrow + n, 1.0f);
      std::fill(mrow + n, mrow + seq_len, 0.0f);
    }
    cursor += lengths[b];
  }
}

int datapath_version() { return 1; }

}  // extern "C"

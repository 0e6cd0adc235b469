// rsuper_native: multithreaded host-side volume kernels for the data path.
//
// The reference leans on SimpleITK's C++ core for its offline preprocessing
// (resample-to-1mm, HU clip, z-score: dataset_conversion/abdomenatlas_3d.py,
// nii2npz.py, predict_abdomenatlas.py:325). This library is the native
// equivalent for the TPU build: trilinear / nearest-neighbour resampling and
// fused clip+z-score, parallelised with std::thread across volume slabs.
// Exposed as plain C symbols for ctypes (no pybind11 in this toolchain).
//
// Build: make -C native   (produces librsuper_native.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int default_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 4;
}

template <typename F>
void parallel_for(int64_t n, int nthreads, F&& fn) {
  if (nthreads <= 1 || n < 2) {
    fn(0, n);
    return;
  }
  nthreads = std::min<int64_t>(nthreads, n);
  std::vector<std::thread> ts;
  ts.reserve(nthreads);
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([lo, hi, &fn] { fn(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// Trilinear resample src (sx, sy, sz) -> dst (dx, dy, dz), arbitrary zoom.
// Coordinate convention matches scipy.ndimage.zoom(grid_mode=False):
// src_coord = dst_index * (s - 1) / (d - 1) for d > 1 (endpoint-aligned).
int rsuper_resample_trilinear(const float* src, int64_t sx, int64_t sy,
                              int64_t sz, float* dst, int64_t dx, int64_t dy,
                              int64_t dz, int nthreads) {
  if (!src || !dst || sx < 1 || sy < 1 || sz < 1 || dx < 1 || dy < 1 || dz < 1)
    return -1;
  if (nthreads <= 0) nthreads = default_threads();
  const double fx = dx > 1 ? double(sx - 1) / double(dx - 1) : 0.0;
  const double fy = dy > 1 ? double(sy - 1) / double(dy - 1) : 0.0;
  const double fz = dz > 1 ? double(sz - 1) / double(dz - 1) : 0.0;
  const int64_t s_yz = sy * sz;

  parallel_for(dx, nthreads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      double xs = i * fx;
      int64_t x0 = std::min<int64_t>(int64_t(xs), sx - 1);
      int64_t x1 = std::min<int64_t>(x0 + 1, sx - 1);
      double wx = xs - double(x0);
      for (int64_t j = 0; j < dy; ++j) {
        double ys = j * fy;
        int64_t y0 = std::min<int64_t>(int64_t(ys), sy - 1);
        int64_t y1 = std::min<int64_t>(y0 + 1, sy - 1);
        double wy = ys - double(y0);
        float* out_row = dst + (i * dy + j) * dz;
        const float* p00 = src + x0 * s_yz + y0 * sz;
        const float* p01 = src + x0 * s_yz + y1 * sz;
        const float* p10 = src + x1 * s_yz + y0 * sz;
        const float* p11 = src + x1 * s_yz + y1 * sz;
        for (int64_t k = 0; k < dz; ++k) {
          double zs = k * fz;
          int64_t z0 = std::min<int64_t>(int64_t(zs), sz - 1);
          int64_t z1 = std::min<int64_t>(z0 + 1, sz - 1);
          double wz = zs - double(z0);
          double c00 = p00[z0] * (1 - wz) + p00[z1] * wz;
          double c01 = p01[z0] * (1 - wz) + p01[z1] * wz;
          double c10 = p10[z0] * (1 - wz) + p10[z1] * wz;
          double c11 = p11[z0] * (1 - wz) + p11[z1] * wz;
          double c0 = c00 * (1 - wy) + c01 * wy;
          double c1 = c10 * (1 - wy) + c11 * wy;
          out_row[k] = float(c0 * (1 - wx) + c1 * wx);
        }
      }
    }
  });
  return 0;
}

// Nearest-neighbour resample for label volumes (uint8).
int rsuper_resample_nearest_u8(const uint8_t* src, int64_t sx, int64_t sy,
                               int64_t sz, uint8_t* dst, int64_t dx,
                               int64_t dy, int64_t dz, int nthreads) {
  if (!src || !dst || sx < 1 || sy < 1 || sz < 1 || dx < 1 || dy < 1 || dz < 1)
    return -1;
  if (nthreads <= 0) nthreads = default_threads();
  const double fx = dx > 1 ? double(sx - 1) / double(dx - 1) : 0.0;
  const double fy = dy > 1 ? double(sy - 1) / double(dy - 1) : 0.0;
  const double fz = dz > 1 ? double(sz - 1) / double(dz - 1) : 0.0;
  const int64_t s_yz = sy * sz;
  parallel_for(dx, nthreads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t xs = std::min<int64_t>(int64_t(std::lround(i * fx)), sx - 1);
      for (int64_t j = 0; j < dy; ++j) {
        int64_t ys = std::min<int64_t>(int64_t(std::lround(j * fy)), sy - 1);
        const uint8_t* row = src + xs * s_yz + ys * sz;
        uint8_t* out_row = dst + (i * dy + j) * dz;
        for (int64_t k = 0; k < dz; ++k) {
          int64_t zs = std::min<int64_t>(int64_t(std::lround(k * fz)), sz - 1);
          out_row[k] = row[zs];
        }
      }
    }
  });
  return 0;
}

// Fused clip + z-score in place: x = (clip(x, lo, hi) - mean) / std.
// Two passes: parallel clip+moments, then parallel normalise.
int rsuper_clip_zscore(float* data, int64_t n, float lo, float hi,
                       int nthreads) {
  if (!data || n < 1) return -1;
  if (nthreads <= 0) nthreads = default_threads();
  std::atomic<double> sum_a{0.0}, sumsq_a{0.0};
  parallel_for(n, nthreads, [&](int64_t a, int64_t b) {
    double s = 0.0, s2 = 0.0;
    for (int64_t i = a; i < b; ++i) {
      float v = std::min(std::max(data[i], lo), hi);
      data[i] = v;
      s += v;
      s2 += double(v) * v;
    }
    double cur = sum_a.load();
    while (!sum_a.compare_exchange_weak(cur, cur + s)) {
    }
    cur = sumsq_a.load();
    while (!sumsq_a.compare_exchange_weak(cur, cur + s2)) {
    }
  });
  double mean = sum_a.load() / double(n);
  double var = sumsq_a.load() / double(n) - mean * mean;
  double inv = 1.0 / std::max(std::sqrt(std::max(var, 0.0)), 1e-8);
  parallel_for(n, nthreads, [&](int64_t a, int64_t b) {
    for (int64_t i = a; i < b; ++i)
      data[i] = float((data[i] - mean) * inv);
  });
  return 0;
}

// Fused NIfTI payload decode: raw little-endian voxels (any of the common
// NIfTI datatypes) -> float32 with the header's scl_slope/scl_inter applied,
// one threaded pass. Replaces numpy's frombuffer -> multiply -> add ->
// astype chain (three temporaries) on the volume-read hot path
// (data/nifti.read_nifti; reference loads via nibabel + .astype).
// dtype codes are NIfTI-1: 2=u8, 4=i16, 8=i32, 16=f32, 64=f64, 512=u16.
int rsuper_nifti_scale_cast_f32(const uint8_t* src, int dtype_code, int64_t n,
                                float slope, float inter, float* dst,
                                int nthreads) {
  if (!src || !dst || n < 1) return -1;
  if (nthreads <= 0) nthreads = default_threads();
  const float s = slope == 0.0f ? 1.0f : slope;

  auto run = [&](auto conv) {
    parallel_for(n, nthreads, [&](int64_t a, int64_t b) {
      for (int64_t i = a; i < b; ++i) dst[i] = conv(i) * s + inter;
    });
  };
  switch (dtype_code) {
    case 2:
      run([&](int64_t i) { return float(src[i]); });
      return 0;
    case 4: {
      run([&](int64_t i) {
        int16_t v;
        std::memcpy(&v, src + 2 * i, 2);
        return float(v);
      });
      return 0;
    }
    case 8: {
      run([&](int64_t i) {
        int32_t v;
        std::memcpy(&v, src + 4 * i, 4);
        return float(v);
      });
      return 0;
    }
    case 16: {
      run([&](int64_t i) {
        float v;
        std::memcpy(&v, src + 4 * i, 4);
        return v;
      });
      return 0;
    }
    case 64: {
      run([&](int64_t i) {
        double v;
        std::memcpy(&v, src + 8 * i, 8);
        return float(v);
      });
      return 0;
    }
    case 512: {
      run([&](int64_t i) {
        uint16_t v;
        std::memcpy(&v, src + 2 * i, 2);
        return float(v);
      });
      return 0;
    }
    default:
      return -2;  // caller falls back to the numpy path
  }
}

// Fused channel-first → packed channels-last mask transfer encode.
//
// The train loader ships the three one-hot mask stacks (label / unk /
// segment, each (C, N) channel-first uint8 straight out of the dataset) to
// the device as ONE bit-packed channels-last byte plane: voxel v, channel j
// (j < C label, < 2C unk, else segment) lands at bit (j & 7) of byte
// out[v * W8 + (j >> 3)] with W8 = ceil(3C / 8) — exactly
// np.packbits(concat(moveaxis(...)), bitorder='little'). Doing it in one
// pass replaces a moveaxis + concatenate + packbits chain that copies the
// 3·C·N uint8 stack four times on the 1-core loader host (the steady-state
// training bottleneck; reference train_ddp.py:114 never packs — it feeds a
// local PCIe GPU). nullptr unk/seg mean all-zero (mask-only cases) and are
// skipped entirely.
int rsuper_pack_masks_cl(const uint8_t* label, const uint8_t* unk,
                         const uint8_t* seg, int64_t C, int64_t N,
                         uint8_t* out, int nthreads) {
  if (!label || !out || C < 1 || N < 1) return -1;
  if (nthreads <= 0) nthreads = default_threads();
  const int64_t W8 = (3 * C + 7) / 8;
  const uint8_t* stacks[3] = {label, unk, seg};
  parallel_for(N, nthreads, [&](int64_t lo, int64_t hi) {
    for (int64_t byte = 0; byte < W8; ++byte) {
      // the 8 channel planes feeding this output byte (nullptr stacks and
      // tail bits contribute fixed zeros)
      const uint8_t* planes[8];
      int live = 0;
      uint8_t bits[8];
      for (int k = 0; k < 8; ++k) {
        const int64_t j = byte * 8 + k;
        if (j >= 3 * C) break;
        const uint8_t* base = stacks[j / C];
        if (!base) continue;
        planes[live] = base + (j % C) * N;
        bits[live++] = uint8_t(1u << k);
      }
      uint8_t* o = out + lo * W8 + byte;
      if (live == 8) {
        // full-byte fast path: branchless 8-stream compose the compiler can
        // unroll/vectorise (every byte lands here when 8 | 3·C and no stack
        // is null — the production 16-class case)
        const uint8_t *p0 = planes[0], *p1 = planes[1], *p2 = planes[2],
                      *p3 = planes[3], *p4 = planes[4], *p5 = planes[5],
                      *p6 = planes[6], *p7 = planes[7];
        for (int64_t v = lo; v < hi; ++v, o += W8)
          *o = uint8_t((p0[v] != 0) | (p1[v] != 0) << 1 | (p2[v] != 0) << 2 |
                       (p3[v] != 0) << 3 | (p4[v] != 0) << 4 |
                       (p5[v] != 0) << 5 | (p6[v] != 0) << 6 |
                       (p7[v] != 0) << 7);
      } else {
        for (int64_t v = lo; v < hi; ++v, o += W8) {
          uint8_t acc = 0;
          for (int p = 0; p < live; ++p)
            acc |= bits[p] & uint8_t(-(planes[p][v] != 0));
          *o = acc;
        }
      }
    }
  });
  return 0;
}

}  // extern "C"

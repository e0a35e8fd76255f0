// synergy_native: CPU runtime kernels for synergynet-tpu.
//
// The TPU compute path is JAX/XLA (see synergynet_tpu/render/raster.py,
// synergynet_tpu/detect/nms.py); this library is the host-side native
// fallback mirroring the role of the reference's C++/Cython layer
// (reference: Sim3DR/lib/rasterize_kernel.cpp, FaceBoxes/utils/nms/
// cpu_nms.pyx) for environments without an accelerator and for oracle
// cross-checks.
//
// Design notes (deliberately different structure from the reference):
// - The rasterizer precomputes, per triangle, the affine forms of the
//   barycentric coordinates u(x, y) and v(x, y) (the same formulation the
//   XLA fragment generator uses), then scans the clamped bbox evaluating
//   two fused multiply-adds per pixel instead of re-deriving dot products.
// - Coverage rule, degenerate handling (den == 0 -> u = v = 0, bbox fill),
//   strictly-greater depth test and uint8 truncation blend match the
//   framework semantics bit-for-bit.
// - NMS takes score-sorted boxes and emits a keep mask using the same
//   +1-inclusive IoU as the detector.
//
// Build: see native/build.py (g++ -O3 -shared -fPIC).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct TriCoeffs {
  // u = u0 + ux*x + uy*y ; v likewise. Valid when finite (non-degenerate).
  float u0, ux, uy;
  float v0, vx, vy;
  bool degenerate;
};

TriCoeffs bary_coeffs(const float* p0, const float* p1, const float* p2) {
  const float e0x = p2[0] - p0[0], e0y = p2[1] - p0[1];  // v0 = p2 - p0
  const float e1x = p1[0] - p0[0], e1y = p1[1] - p0[1];  // v1 = p1 - p0
  const float d00 = e0x * e0x + e0y * e0y;
  const float d01 = e0x * e1x + e0y * e1y;
  const float d11 = e1x * e1x + e1y * e1y;
  const float den = d00 * d11 - d01 * d01;
  TriCoeffs c{};
  // Relative degeneracy tolerance, matching the XLA kernel's rule.
  if (std::fabs(den) <= 1e-6f * d00 * d11) {
    c.degenerate = true;
    return c;
  }
  const float inv = 1.0f / den;
  // u(x,y) = inv * (d11 * (v0 . (p - p0)) - d01 * (v1 . (p - p0)))
  c.ux = inv * (d11 * e0x - d01 * e1x);
  c.uy = inv * (d11 * e0y - d01 * e1y);
  c.u0 = -(c.ux * p0[0] + c.uy * p0[1]);
  c.vx = inv * (d00 * e1x - d01 * e0x);
  c.vy = inv * (d00 * e1y - d01 * e0y);
  c.v0 = -(c.vx * p0[0] + c.vy * p0[1]);
  c.degenerate = false;
  return c;
}

}  // namespace

extern "C" {

// Z-buffer rasterize with per-vertex colors into a uint8 image.
// vertices: (nver, 3) xyz, image coords. triangles: (ntri, 3) int32.
// colors: (nver, 3) in [0, 1]. image: (h, w, 3) uint8, blended in place.
// depth: (h, w) float32, callers init to -1e8. reverse flips written rows.
void syn_rasterize(const float* vertices, const int32_t* triangles,
                   const float* colors, int32_t nver, int32_t ntri,
                   int32_t h, int32_t w, uint8_t* image, float* depth,
                   float alpha, int32_t reverse) {
  (void)nver;
  for (int32_t t = 0; t < ntri; ++t) {
    const int32_t ia = triangles[3 * t], ib = triangles[3 * t + 1],
                  ic = triangles[3 * t + 2];
    const float* pa = vertices + 3 * ia;
    const float* pb = vertices + 3 * ib;
    const float* pc = vertices + 3 * ic;

    int32_t x0 = (int32_t)std::floor(std::fmin(pa[0], std::fmin(pb[0], pc[0])));
    int32_t x1 = (int32_t)std::ceil(std::fmax(pa[0], std::fmax(pb[0], pc[0])));
    int32_t y0 = (int32_t)std::floor(std::fmin(pa[1], std::fmin(pb[1], pc[1])));
    int32_t y1 = (int32_t)std::ceil(std::fmax(pa[1], std::fmax(pb[1], pc[1])));
    x0 = x0 < 0 ? 0 : x0;
    y0 = y0 < 0 ? 0 : y0;
    x1 = x1 > w - 1 ? w - 1 : x1;
    y1 = y1 > h - 1 ? h - 1 : y1;
    if (x1 < x0 || y1 < y0) continue;

    const TriCoeffs c = bary_coeffs(pa, pb, pc);
    for (int32_t y = y0; y <= y1; ++y) {
      const float uy = c.degenerate ? 0.f : c.u0 + c.uy * (float)y;
      const float vy = c.degenerate ? 0.f : c.v0 + c.vy * (float)y;
      for (int32_t x = x0; x <= x1; ++x) {
        const float u = c.degenerate ? 0.f : uy + c.ux * (float)x;
        const float v = c.degenerate ? 0.f : vy + c.vx * (float)x;
        if (!(u >= 0.f && v >= 0.f && u + v < 1.f)) continue;
        const float w0 = 1.f - u - v, w1 = v, w2 = u;
        const float z = w0 * pa[2] + w1 * pb[2] + w2 * pc[2];
        float* zp = depth + (size_t)y * w + x;
        if (z > *zp) {
          const int32_t yy = reverse ? (h - 1 - y) : y;
          uint8_t* px = image + ((size_t)yy * w + x) * 3;
          for (int k = 0; k < 3; ++k) {
            const float col = w0 * colors[3 * ia + k] +
                              w1 * colors[3 * ib + k] +
                              w2 * colors[3 * ic + k];
            px[k] = (uint8_t)((1.f - alpha) * (float)px[k] +
                              alpha * 255.f * col);
          }
          *zp = z;
        }
      }
    }
  }
}

// UV texture-mapped z-buffer render — the native equivalent of the
// reference's _render_texture_core (Sim3DR/lib/rasterize_kernel.cpp,
// declared rasterize.h:103-108 but never exposed through its Cython
// bridge) and of render/texture.py's sampling semantics: per-pixel UVs
// interpolated from the winning triangle, v measured from the bottom,
// optional bilinear filtering. texture: (th, tw, 3) float32 in [0, 1].
// image/depth conventions match syn_rasterize.
void syn_render_texture(const float* vertices, const int32_t* triangles,
                        const float* tex_coords, const float* texture,
                        int32_t ntri, int32_t h, int32_t w,
                        int32_t th, int32_t tw, uint8_t* image, float* depth,
                        float alpha, int32_t reverse, int32_t bilinear) {
  for (int32_t t = 0; t < ntri; ++t) {
    const int32_t ia = triangles[3 * t], ib = triangles[3 * t + 1],
                  ic = triangles[3 * t + 2];
    const float* pa = vertices + 3 * ia;
    const float* pb = vertices + 3 * ib;
    const float* pc = vertices + 3 * ic;

    int32_t x0 = (int32_t)std::floor(std::fmin(pa[0], std::fmin(pb[0], pc[0])));
    int32_t x1 = (int32_t)std::ceil(std::fmax(pa[0], std::fmax(pb[0], pc[0])));
    int32_t y0 = (int32_t)std::floor(std::fmin(pa[1], std::fmin(pb[1], pc[1])));
    int32_t y1 = (int32_t)std::ceil(std::fmax(pa[1], std::fmax(pb[1], pc[1])));
    x0 = x0 < 0 ? 0 : x0;
    y0 = y0 < 0 ? 0 : y0;
    x1 = x1 > w - 1 ? w - 1 : x1;
    y1 = y1 > h - 1 ? h - 1 : y1;
    if (x1 < x0 || y1 < y0) continue;

    const TriCoeffs c = bary_coeffs(pa, pb, pc);
    for (int32_t y = y0; y <= y1; ++y) {
      const float uy = c.degenerate ? 0.f : c.u0 + c.uy * (float)y;
      const float vy = c.degenerate ? 0.f : c.v0 + c.vy * (float)y;
      for (int32_t x = x0; x <= x1; ++x) {
        const float u = c.degenerate ? 0.f : uy + c.ux * (float)x;
        const float v = c.degenerate ? 0.f : vy + c.vx * (float)x;
        if (!(u >= 0.f && v >= 0.f && u + v < 1.f)) continue;
        const float w0 = 1.f - u - v, w1 = v, w2 = u;
        const float z = w0 * pa[2] + w1 * pb[2] + w2 * pc[2];
        float* zp = depth + (size_t)y * w + x;
        if (z > *zp) {
          const float uu = w0 * tex_coords[2 * ia] +
                           w1 * tex_coords[2 * ib] + w2 * tex_coords[2 * ic];
          const float vv = w0 * tex_coords[2 * ia + 1] +
                           w1 * tex_coords[2 * ib + 1] +
                           w2 * tex_coords[2 * ic + 1];
          const float tx = uu * (float)(tw - 1);
          const float ty = (1.f - vv) * (float)(th - 1);
          float col[3];
          if (bilinear) {
            float fx0 = std::floor(tx), fy0 = std::floor(ty);
            int32_t ix0 = (int32_t)fx0, iy0 = (int32_t)fy0;
            ix0 = ix0 < 0 ? 0 : (ix0 > tw - 1 ? tw - 1 : ix0);
            iy0 = iy0 < 0 ? 0 : (iy0 > th - 1 ? th - 1 : iy0);
            const int32_t ix1 = ix0 + 1 > tw - 1 ? tw - 1 : ix0 + 1;
            const int32_t iy1 = iy0 + 1 > th - 1 ? th - 1 : iy0 + 1;
            const float gx = tx - (float)ix0, gy = ty - (float)iy0;
            for (int k = 0; k < 3; ++k) {
              const float c00 = texture[((size_t)iy0 * tw + ix0) * 3 + k];
              const float c01 = texture[((size_t)iy0 * tw + ix1) * 3 + k];
              const float c10 = texture[((size_t)iy1 * tw + ix0) * 3 + k];
              const float c11 = texture[((size_t)iy1 * tw + ix1) * 3 + k];
              col[k] = (c00 * (1.f - gx) + c01 * gx) * (1.f - gy) +
                       (c10 * (1.f - gx) + c11 * gx) * gy;
            }
          } else {
            int32_t ix = (int32_t)std::lround(tx);
            int32_t iy = (int32_t)std::lround(ty);
            ix = ix < 0 ? 0 : (ix > tw - 1 ? tw - 1 : ix);
            iy = iy < 0 ? 0 : (iy > th - 1 ? th - 1 : iy);
            for (int k = 0; k < 3; ++k)
              col[k] = texture[((size_t)iy * tw + ix) * 3 + k];
          }
          const int32_t yy = reverse ? (h - 1 - y) : y;
          uint8_t* px = image + ((size_t)yy * w + x) * 3;
          for (int k = 0; k < 3; ++k)
            px[k] = (uint8_t)((1.f - alpha) * (float)px[k] +
                              alpha * 255.f * col[k]);
          *zp = z;
        }
      }
    }
  }
}

// One-ring vertex normals: cross products accumulated per corner then
// normalized (guarded by 1e-6 like the framework's get_ver_normal).
void syn_vertex_normals(const float* vertices, const int32_t* triangles,
                        int32_t nver, int32_t ntri, float* out) {
  std::memset(out, 0, sizeof(float) * 3 * (size_t)nver);
  for (int32_t t = 0; t < ntri; ++t) {
    const int32_t ia = triangles[3 * t], ib = triangles[3 * t + 1],
                  ic = triangles[3 * t + 2];
    const float* pa = vertices + 3 * ia;
    const float* pb = vertices + 3 * ib;
    const float* pc = vertices + 3 * ic;
    const float ux = pb[0] - pa[0], uy = pb[1] - pa[1], uz = pb[2] - pa[2];
    const float vx = pc[0] - pa[0], vy = pc[1] - pa[1], vz = pc[2] - pa[2];
    const float nx = uy * vz - uz * vy;
    const float ny = uz * vx - ux * vz;
    const float nz = ux * vy - uy * vx;
    for (int32_t idx : {ia, ib, ic}) {
      out[3 * idx] += nx;
      out[3 * idx + 1] += ny;
      out[3 * idx + 2] += nz;
    }
  }
  for (int32_t i = 0; i < nver; ++i) {
    float* n = out + 3 * i;
    float norm = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
    if (norm <= 0.f) norm = 1e-6f;
    n[0] /= norm;
    n[1] /= norm;
    n[2] /= norm;
  }
}

// Greedy NMS over score-DESCENDING-sorted corner boxes (n, 4).
// keep: (n,) uint8 out-mask. IoU uses +1-inclusive areas.
void syn_nms_mask(const float* boxes, int32_t n, float thresh,
                  uint8_t* keep) {
  std::vector<float> area((size_t)n);
  for (int32_t i = 0; i < n; ++i) {
    const float* b = boxes + 4 * i;
    area[i] = (b[2] - b[0] + 1.f) * (b[3] - b[1] + 1.f);
    keep[i] = 1;
  }
  for (int32_t i = 0; i < n; ++i) {
    if (!keep[i]) continue;
    const float* bi = boxes + 4 * i;
    for (int32_t j = i + 1; j < n; ++j) {
      if (!keep[j]) continue;
      const float* bj = boxes + 4 * j;
      const float xx1 = std::fmax(bi[0], bj[0]);
      const float yy1 = std::fmax(bi[1], bj[1]);
      const float xx2 = std::fmin(bi[2], bj[2]);
      const float yy2 = std::fmin(bi[3], bj[3]);
      const float iw = std::fmax(0.f, xx2 - xx1 + 1.f);
      const float ih = std::fmax(0.f, yy2 - yy1 + 1.f);
      const float inter = iw * ih;
      if (inter / (area[i] + area[j] - inter) >= thresh) keep[j] = 0;
    }
  }
}

}  // extern "C"

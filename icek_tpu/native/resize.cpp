// Native (C++) skimage-parity image resize for the offline prep pipeline.
//
// Re-implements the exact float64 numeric path of
// icek_tpu/data/images.py::resize_like_reference — which itself reproduces
// skimage.transform.resize as used by the reference prep
// (geo-aware/create_input_files.py:332) — and fuses the surrounding
// /255 -> resize -> clip -> CHW-transpose -> float16 chain of
// images.py::_prepare into one pass over the data.
//
// BIT-EXACTNESS CONTRACT (enforced by tests/test_native.py): the float16
// output is bit-identical to the scipy path.  That requires replicating
// scipy.ndimage's float64 arithmetic to the ulp:
//
//  * correlate1d (symmetric kernel): per output element the sum is
//    accumulated as  center*w[r]  then  (left_j + right_j)*w[r+j]  for
//    j = r (outermost) down to 1 — determined empirically against
//    scipy 1.17 (the symmetric fast path of NI_Correlate1D).
//  * zoom (order=1, grid_mode=True, mode="mirror"): output coordinate
//    cc = zoom*(k + 0.5) - 0.5 with zoom = in/out; interpolation term
//    order is footprint C-order with per-axis weight association
//    ((v * wy) * wx) — the NI_ZoomShift accumulation.
//  * Gaussian kernel weights are computed by the CALLER (numpy) and
//    passed in, so numpy's pairwise-sum normalization is reproduced by
//    construction.
//  * double -> half uses a single direct conversion (_Float16), which is
//    round-to-nearest-even without an intermediate float32 double-round,
//    matching numpy's astype(float16).
//
// Build with -ffp-contract=off: FMA contraction would change the bits.

#include <cstdint>
#include <vector>

namespace {

// mirror boundary ("reflect about edge sample centers, no edge repeat"):
// period 2(n-1); valid for any offset magnitude.
inline int64_t mirror_index(int64_t i, int64_t n) {
  if (n == 1) return 0;
  const int64_t period = 2 * (n - 1);
  int64_t m = i % period;
  if (m < 0) m += period;
  return m < n ? m : period - m;
}

// mirror mapping of a real coordinate (scipy map_coordinate, mode mirror).
inline double mirror_coord(double cc, int64_t n) {
  if (n == 1) return 0.0;
  const double p = 2.0 * (double)(n - 1);
  if (cc < 0.0) cc = -cc;
  if (cc > p) {
    // bring into [0, p) — prep coordinates never get here (|cc| < p for
    // any zoom toward out>=1), but keep it total.
    cc -= p * (double)(int64_t)(cc / p);
  }
  if (cc > (double)(n - 1)) cc = p - cc;
  return cc;
}

// Summation order in both correlators matches scipy's symmetric
// NI_Correlate1D per output element: center tap first, then symmetric
// pairs from the OUTERMOST tap inward (determined empirically, see header
// comment).  Only the loop structure differs between the two for cache
// friendliness; the per-element float64 op order is identical.

// Filter axis 0 of an (n0, row_len) array whose rows are contiguous:
// whole-row vectorized passes (out_row = center_row*wc, then
// += (upper+lower)*w per pair).
void correlate_rows(const double* in, double* out, int64_t n0,
                    int64_t row_len, const double* w, int64_t r) {
  std::vector<int64_t> mir(n0 + 2 * r);
  for (int64_t i = 0; i < (int64_t)mir.size(); ++i)
    mir[i] = mirror_index(i - r, n0);
  const double wc = w[r];
  for (int64_t i = 0; i < n0; ++i) {
    double* op = out + i * row_len;
    const double* cp = in + mir[i + r] * row_len;
    for (int64_t k = 0; k < row_len; ++k) op[k] = cp[k] * wc;
    for (int64_t j = r; j >= 1; --j) {
      const double* ap = in + mir[i + r - j] * row_len;
      const double* bp = in + mir[i + r + j] * row_len;
      const double wj = w[r + j];
      for (int64_t k = 0; k < row_len; ++k) op[k] += (ap[k] + bp[k]) * wj;
    }
  }
}

// Filter axis 1 of an (n0, n1, C) array: per-row, all C channels of each
// output column computed together (taps step by C within the row).
void correlate_cols(const double* in, double* out, int64_t n0, int64_t n1,
                    int64_t C, const double* w, int64_t r) {
  std::vector<int64_t> mir(n1 + 2 * r);
  for (int64_t i = 0; i < (int64_t)mir.size(); ++i)
    mir[i] = mirror_index(i - r, n1);
  const double wc = w[r];
  for (int64_t i = 0; i < n0; ++i) {
    const double* ip = in + i * n1 * C;
    double* op = out + i * n1 * C;
    for (int64_t k = 0; k < n1; ++k) {
      const double* cp = ip + mir[k + r] * C;
      for (int64_t ch = 0; ch < C; ++ch) {
        double s = cp[ch] * wc;
        for (int64_t j = r; j >= 1; --j)
          s += (ip[mir[k + r - j] * C + ch] + ip[mir[k + r + j] * C + ch]) *
               w[r + j];
        op[k * C + ch] = s;
      }
    }
  }
}

}  // namespace

extern "C" {

// img: (H, W, C) uint8, C-contiguous.  wy/wx: symmetric Gaussian kernels of
// radius ry/rx (length 2r+1) or r<0 to skip that axis' prefilter.  lo/hi:
// clip bounds (the /255 image's global min/max).  out: (C, outH, outW)
// float16 (as uint16 bits), C-contiguous.  Returns 0 on success.
int icek_resize_chw_f16(const uint8_t* img, int64_t H, int64_t W, int64_t C,
                        const double* wy, int64_t ry, const double* wx,
                        int64_t rx, int64_t outH, int64_t outW, double lo,
                        double hi, uint16_t* out) {
  if (H < 1 || W < 1 || C < 1 || outH < 1 || outW < 1) return 1;
  const int64_t n = H * W * C;
  std::vector<double> a(n), b;
  for (int64_t i = 0; i < n; ++i) a[i] = (double)img[i] / 255.0;

  // Gaussian prefilter, one full-array pass per filtered axis (axis 0 then
  // axis 1 — gaussian_filter's sequential-axis semantics).  The channel
  // axis is never filtered (sigma 0), so each (H, W) plane is independent;
  // strides below treat the array as (H, W*C) for axis 0 and per-channel
  // strided lines for axis 1.
  const double* cur = a.data();
  if (ry >= 0) {
    b.resize(n);
    correlate_rows(a.data(), b.data(), H, W * C, wy, ry);
    cur = b.data();
  }
  std::vector<double> c;
  if (rx >= 0) {
    c.resize(n);
    correlate_cols(cur, c.data(), H, W, C, wx, rx);
    cur = c.data();
  }

  // zoom order=1, grid_mode, mirror — precompute per-axis sample indices
  // and weights.
  std::vector<int64_t> y0(outH), y1(outH), x0(outW), x1(outW);
  std::vector<double> wy0(outH), wy1(outH), wx0(outW), wx1(outW);
  const double zy = (double)H / (double)outH;
  const double zx = (double)W / (double)outW;
  for (int64_t oy = 0; oy < outH; ++oy) {
    double cc = mirror_coord(zy * ((double)oy + 0.5) - 0.5, H);
    int64_t base = (int64_t)cc;  // cc >= 0 after mirror
    if ((double)base > cc) --base;
    double t = cc - (double)base;
    y0[oy] = base;
    y1[oy] = base + 1 < H ? base + 1 : H - 1;
    wy1[oy] = t;
    wy0[oy] = 1.0 - t;
  }
  for (int64_t ox = 0; ox < outW; ++ox) {
    double cc = mirror_coord(zx * ((double)ox + 0.5) - 0.5, W);
    int64_t base = (int64_t)cc;
    if ((double)base > cc) --base;
    double t = cc - (double)base;
    x0[ox] = base;
    x1[ox] = base + 1 < W ? base + 1 : W - 1;
    wx1[ox] = t;
    wx0[ox] = 1.0 - t;
  }

  for (int64_t oy = 0; oy < outH; ++oy) {
    const double* r0 = cur + y0[oy] * W * C;
    const double* r1 = cur + y1[oy] * W * C;
    const double w0 = wy0[oy], w1 = wy1[oy];
    for (int64_t ox = 0; ox < outW; ++ox) {
      const int64_t c0 = x0[ox] * C, c1 = x1[ox] * C;
      const double u0 = wx0[ox], u1 = wx1[ox];
      for (int64_t ch = 0; ch < C; ++ch) {
        // NI_ZoomShift term order: (0,0) (0,1) (1,0) (1,1), each (v*wy)*wx.
        double s = (r0[c0 + ch] * w0) * u0 + (r0[c1 + ch] * w0) * u1 +
                   (r1[c0 + ch] * w1) * u0 + (r1[c1 + ch] * w1) * u1;
        if (s < lo) s = lo;
        if (s > hi) s = hi;
        _Float16 h = (_Float16)s;  // direct f64->f16, RNE (no f32 step)
        uint16_t bits;
        __builtin_memcpy(&bits, &h, 2);
        out[(ch * outH + oy) * outW + ox] = bits;
      }
    }
  }
  return 0;
}
}

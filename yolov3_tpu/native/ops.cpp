// yolov3_tpu native host ops: greedy NMS + fixed-point bilinear letterbox.
//
// The reference consumes native kernels through third-party libraries
// (torchvision.ops.nms C++/CUDA at utils/general.py:733, OpenCV's C++ for
// image ops); this framework owns its host-side native layer instead.
// Compiled to a shared library by yolov3_tpu/native/__init__.py and loaded
// via ctypes — no pybind11 dependency.
//
// Semantics contracts (tested in tests/test_native.py):
//  - yolo_greedy_nms matches ops/nms.py::_greedy_nms (XLA) exactly: descending
//    score order with first-index tie-break, suppression at iou > thres on the
//    class-offset boxes, output rows [x1,y1,x2,y2,conf,cls].
//  - yolo_resize_linear_u8 matches cv2.resize(..., INTER_LINEAR) on uint8
//    byte-for-byte (OpenCV's 11-bit fixed-point scheme, resize.cpp).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Greedy NMS
// ---------------------------------------------------------------------------

// boxes_off: (n,4) xyxy with class offset applied (agnostic => no offset)
// boxes:     (n,4) xyxy raw
// scores:    (n,)  candidates with score <= 0 are invalid
// cls:       (n,)
// out:       (max_det, 6) rows [x1,y1,x2,y2,conf,cls]; zero-padded
// returns number of detections kept
int yolo_greedy_nms(const float* boxes_off, const float* boxes,
                    const float* scores, const float* cls, int n,
                    float iou_thres, int max_det, float* out) {
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  // stable sort, descending score: equal scores keep ascending-index order,
  // matching XLA argmax/top_k tie-breaking.
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return scores[a] > scores[b]; });

  std::memset(out, 0, sizeof(float) * 6 * (size_t)max_det);
  std::vector<float> kept;  // kept offset boxes, flat x1 y1 x2 y2 area
  kept.reserve((size_t)max_det * 5);
  int nkept = 0;
  for (int oi = 0; oi < n && nkept < max_det; ++oi) {
    const int i = order[oi];
    const float s = scores[i];
    if (s <= 0.0f) break;  // remaining are all invalid
    const float* b = boxes_off + (size_t)i * 4;
    const float area_i = (b[2] - b[0]) * (b[3] - b[1]);
    bool suppressed = false;
    for (int k = 0; k < nkept; ++k) {
      const float* kb = &kept[(size_t)k * 5];
      const float ix1 = std::max(b[0], kb[0]);
      const float iy1 = std::max(b[1], kb[1]);
      const float ix2 = std::min(b[2], kb[2]);
      const float iy2 = std::min(b[3], kb[3]);
      const float iw = std::max(ix2 - ix1, 0.0f);
      const float ih = std::max(iy2 - iy1, 0.0f);
      const float inter = iw * ih;
      const float iou = inter / (area_i + kb[4] - inter + 1e-7f);
      if (iou > iou_thres) {
        suppressed = true;
        break;
      }
    }
    if (suppressed) continue;
    float* row = out + (size_t)nkept * 6;
    const float* rb = boxes + (size_t)i * 4;
    row[0] = rb[0];
    row[1] = rb[1];
    row[2] = rb[2];
    row[3] = rb[3];
    row[4] = s;
    row[5] = cls[i];
    kept.push_back(b[0]);
    kept.push_back(b[1]);
    kept.push_back(b[2]);
    kept.push_back(b[3]);
    kept.push_back(area_i);
    ++nkept;
  }
  return nkept;
}

// Batched wrapper: bs images, each with n candidate slots.
// out: (bs, max_det, 6); n_valid: (bs,)
void yolo_greedy_nms_batch(const float* boxes_off, const float* boxes,
                           const float* scores, const float* cls, int bs, int n,
                           float iou_thres, int max_det, float* out,
                           int* n_valid) {
  for (int b = 0; b < bs; ++b) {
    n_valid[b] = yolo_greedy_nms(
        boxes_off + (size_t)b * n * 4, boxes + (size_t)b * n * 4,
        scores + (size_t)b * n, cls + (size_t)b * n, n, iou_thres, max_det,
        out + (size_t)b * max_det * 6);
  }
}

// ---------------------------------------------------------------------------
// Fixed-point bilinear resize (cv2 INTER_LINEAR parity for uint8)
// ---------------------------------------------------------------------------

static const int kCoefBits = 11;                 // INTER_RESIZE_COEF_BITS
static const int kCoefScale = 1 << kCoefBits;    // 2048

static inline short sat_short(float v) {
  // OpenCV saturate_cast<short>(float): round-half-to-even then clamp.
  const float r = std::nearbyintf(v);
  if (r < -32768.0f) return -32768;
  if (r > 32767.0f) return 32767;
  return (short)r;
}

static void build_taps(int src_len, int dst_len, int cn, std::vector<int>& ofs,
                       std::vector<short>& coef,
                       std::vector<uint8_t>* clamped = nullptr) {
  // cv2 computes scale as 1/inv_scale (two divisions) — replicate exactly,
  // the last-ulp difference vs src/dst changes coefficient rounding.
  const double scale = 1.0 / ((double)dst_len / src_len);
  ofs.resize(dst_len);
  coef.resize((size_t)dst_len * 2);
  if (clamped) clamped->assign(dst_len, 0);
  for (int d = 0; d < dst_len; ++d) {
    // cv2 computes the source coordinate in float (resize.cpp): match its
    // rounding exactly for byte parity.
    float f = (float)(((double)d + 0.5) * scale - 0.5);
    int s = (int)std::floor(f);
    f -= s;
    bool cl = false;
    if (s < 0) {
      s = 0;
      f = 0.0f;
      cl = true;
    }
    if (s >= src_len - 1) {
      s = src_len - 2;
      f = 1.0f;
      cl = true;
    }
    if (src_len == 1) {  // degenerate: single source pixel
      s = 0;
      f = 0.0f;
      cl = true;
    }
    if (clamped) (*clamped)[d] = cl ? 1 : 0;
    ofs[d] = s * cn;
    coef[(size_t)d * 2] = sat_short((1.0f - f) * (float)kCoefScale);
    coef[(size_t)d * 2 + 1] = sat_short(f * (float)kCoefScale);
  }
}

// src: (sh, sw, cn) uint8 row-major; dst: (dh, dw, cn) uint8.
// Matches cv2.resize INTER_LINEAR: horizontal pass into int32 rows with
// 11-bit coefficients, vertical pass with OpenCV's uchar cast
// ((b0*(S0>>4))>>16 + (b1*(S1>>4))>>16 + 2) >> 2.
void yolo_resize_linear_u8(const uint8_t* src, int sh, int sw, int cn,
                           uint8_t* dst, int dh, int dw) {
  std::vector<int> xofs, yofs;
  std::vector<short> xcoef, ycoef;
  std::vector<uint8_t> yclamp;
  build_taps(sw, dw, cn, xofs, xcoef);
  build_taps(sh, dh, 1, yofs, ycoef, &yclamp);

  const int row_elems = dw * cn;
  // two cached horizontally-resized rows (int32), like OpenCV's ring buffer
  std::vector<int> rows((size_t)row_elems * 2);
  int cached[2] = {-1, -1};

  for (int dy = 0; dy < dh; ++dy) {
    const int sy0 = yofs[dy];
    const int sy1 = (sh == 1) ? sy0 : sy0 + 1;
    int* r[2];
    const int want[2] = {sy0, sy1};
    for (int k = 0; k < 2; ++k) {
      const int slot = want[k] & 1;  // parity-keyed cache: adjacent rows differ
      if (cached[slot] != want[k]) {
        const uint8_t* srow = src + (size_t)want[k] * sw * cn;
        int* drow = rows.data() + (size_t)slot * row_elems;
        for (int dx = 0; dx < dw; ++dx) {
          const int sx = xofs[dx];
          const int a0 = xcoef[(size_t)dx * 2];
          const int a1 = xcoef[(size_t)dx * 2 + 1];
          const uint8_t* p = srow + sx;
          const uint8_t* q = (sw == 1) ? p : p + cn;
          for (int c = 0; c < cn; ++c)
            drow[dx * cn + c] = p[c] * a0 + q[c] * a1;
        }
        cached[slot] = want[k];
      }
      r[k] = rows.data() + (size_t)(want[k] & 1) * row_elems;
    }
    const int b0 = ycoef[(size_t)dy * 2];
    const int b1 = ycoef[(size_t)dy * 2 + 1];
    uint8_t* drow = dst + (size_t)dy * row_elems;
    const int* S0 = r[0];
    const int* S1 = r[1];
    if (yclamp[dy]) {
      // cv2 emits vertically-clamped border rows as a plain fixed-point cast
      // of the single h-resized source row: (r + 1023) >> 11 (half-down),
      // not the two-row blend (verified byte-exact vs cv2 in test_native.py).
      const int* S = (b0 > 0) ? S0 : S1;
      for (int x = 0; x < row_elems; ++x) {
        const int v = (S[x] + 1023) >> 11;
        drow[x] = (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
      }
    } else {
      for (int x = 0; x < row_elems; ++x) {
        const int v =
            (((b0 * (S0[x] >> 4)) >> 16) + ((b1 * (S1[x] >> 4)) >> 16) + 2) >>
            2;
        drow[x] = (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
      }
    }
  }
}

// Letterbox: resize (rw, rh) then pad into a (dh, dw) canvas filled with
// `color`, offset (top, left). One call, no intermediate copies.
void yolo_letterbox_u8(const uint8_t* src, int sh, int sw, int cn,
                       uint8_t* dst, int dh, int dw, int rh, int rw, int top,
                       int left, const uint8_t* color) {
  // fill canvas
  for (int y = 0; y < dh; ++y) {
    uint8_t* row = dst + (size_t)y * dw * cn;
    if (y == 0) {
      for (int x = 0; x < dw; ++x)
        for (int c = 0; c < cn; ++c) row[x * cn + c] = color[c];
    } else {
      std::memcpy(row, dst, (size_t)dw * cn);
    }
  }
  if (rh == sh && rw == sw) {  // no resize — blit
    for (int y = 0; y < rh; ++y)
      std::memcpy(dst + ((size_t)(y + top) * dw + left) * cn,
                  src + (size_t)y * sw * cn, (size_t)rw * cn);
    return;
  }
  std::vector<uint8_t> resized((size_t)rh * rw * cn);
  yolo_resize_linear_u8(src, sh, sw, cn, resized.data(), rh, rw);
  for (int y = 0; y < rh; ++y)
    std::memcpy(dst + ((size_t)(y + top) * dw + left) * cn,
                resized.data() + (size_t)y * rw * cn, (size_t)rw * cn);
}

}  // extern "C"

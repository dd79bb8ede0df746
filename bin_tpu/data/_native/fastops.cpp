/* bin_tpu._fastops — native host-side data-path kernels.
 *
 * The build/serving host has a single CPU core feeding the TPU
 * (SURVEY.md §8 hard part (e)); these fused single-pass kernels remove
 * numpy's temporary-array passes from the loader hot path:
 *
 *   crop_norm_u8:  uint8 (T,H,W,3) frames -> float32 (T,ch,cw,3) crop with
 *                  optional H/W/T flips and 1/255 normalization, one pass.
 *   blur_average_u8: uint8 (T,H,W,3) sharp stream -> float32 (K,H,W,3)
 *                  blurry frames (mean of `taps` frames, stride `stride`)
 *                  via a running uint16 window sum, one pass over the clip.
 *
 * The reference ships no native code (SURVEY.md §3.1) — this is part of the
 * TPU-native runtime around the compute path, with a numpy fallback when
 * the extension is not built (see bin_tpu/data/fastops.py).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <vector>

#include <numpy/arrayobject.h>

namespace {

constexpr float kInv255 = 1.0f / 255.0f;

// crop_norm_u8(frames_u8, y0, x0, ch, cw, flip_h, flip_w, flip_t) -> f32
PyObject* crop_norm_u8(PyObject*, PyObject* args) {
  PyArrayObject* frames;
  long y0, x0, ch, cw;
  int flip_h, flip_w, flip_t;
  if (!PyArg_ParseTuple(args, "O!llllppp", &PyArray_Type, &frames, &y0, &x0,
                        &ch, &cw, &flip_h, &flip_w, &flip_t)) {
    return nullptr;
  }
  if (PyArray_NDIM(frames) != 4 || PyArray_TYPE(frames) != NPY_UINT8 ||
      !PyArray_IS_C_CONTIGUOUS(frames) || PyArray_DIM(frames, 3) != 3) {
    PyErr_SetString(PyExc_ValueError,
                    "expected C-contiguous uint8 (T,H,W,3) array");
    return nullptr;
  }
  const npy_intp t = PyArray_DIM(frames, 0);
  const npy_intp h = PyArray_DIM(frames, 1);
  const npy_intp w = PyArray_DIM(frames, 2);
  if (y0 < 0 || x0 < 0 || y0 + ch > h || x0 + cw > w || ch <= 0 || cw <= 0) {
    PyErr_SetString(PyExc_ValueError, "crop window out of bounds");
    return nullptr;
  }
  npy_intp dims[4] = {t, ch, cw, 3};
  PyArrayObject* out =
      reinterpret_cast<PyArrayObject*>(PyArray_SimpleNew(4, dims, NPY_FLOAT32));
  if (!out) return nullptr;

  const uint8_t* src = static_cast<const uint8_t*>(PyArray_DATA(frames));
  float* dst = static_cast<float*>(PyArray_DATA(out));
  Py_BEGIN_ALLOW_THREADS
  for (npy_intp ti = 0; ti < t; ++ti) {
    const npy_intp src_t = flip_t ? (t - 1 - ti) : ti;
    for (npy_intp yi = 0; yi < ch; ++yi) {
      const npy_intp src_y = y0 + (flip_h ? (ch - 1 - yi) : yi);
      const uint8_t* row = src + ((src_t * h + src_y) * w + x0) * 3;
      float* orow = dst + ((ti * ch + yi) * cw) * 3;
      if (!flip_w) {
        for (npy_intp i = 0; i < cw * 3; ++i) orow[i] = row[i] * kInv255;
      } else {
        for (npy_intp xi = 0; xi < cw; ++xi) {
          const uint8_t* px = row + (cw - 1 - xi) * 3;
          orow[xi * 3 + 0] = px[0] * kInv255;
          orow[xi * 3 + 1] = px[1] * kInv255;
          orow[xi * 3 + 2] = px[2] * kInv255;
        }
      }
    }
  }
  Py_END_ALLOW_THREADS
  return reinterpret_cast<PyObject*>(out);
}

// blur_average_u8(frames_u8, taps, stride) -> float32 (K,H,W,3)
PyObject* blur_average_u8(PyObject*, PyObject* args) {
  PyArrayObject* frames;
  long taps, stride;
  if (!PyArg_ParseTuple(args, "O!ll", &PyArray_Type, &frames, &taps, &stride)) {
    return nullptr;
  }
  if (PyArray_NDIM(frames) != 4 || PyArray_TYPE(frames) != NPY_UINT8 ||
      !PyArray_IS_C_CONTIGUOUS(frames)) {
    PyErr_SetString(PyExc_ValueError,
                    "expected C-contiguous uint8 (T,H,W,C) array");
    return nullptr;
  }
  const npy_intp t = PyArray_DIM(frames, 0);
  const npy_intp plane =
      PyArray_DIM(frames, 1) * PyArray_DIM(frames, 2) * PyArray_DIM(frames, 3);
  if (taps <= 0 || taps > 255 || stride <= 0) {  // uint16 sum: 255*255 fits
    PyErr_SetString(PyExc_ValueError, "need 0 < taps <= 255 and stride > 0");
    return nullptr;
  }
  if (t < taps) {  // guard BEFORE the truncating division: (t-taps)/stride
    // rounds toward zero for negative numerators, which would yield k=1
    // and an out-of-bounds read past the input buffer
    PyErr_SetString(PyExc_ValueError, "clip shorter than taps");
    return nullptr;
  }
  const npy_intp k = (t - taps) / stride + 1;
  npy_intp dims[4] = {k, PyArray_DIM(frames, 1), PyArray_DIM(frames, 2),
                      PyArray_DIM(frames, 3)};
  PyArrayObject* out =
      reinterpret_cast<PyArrayObject*>(PyArray_SimpleNew(4, dims, NPY_FLOAT32));
  if (!out) return nullptr;

  const uint8_t* src = static_cast<const uint8_t*>(PyArray_DATA(frames));
  float* dst = static_cast<float*>(PyArray_DATA(out));
  Py_BEGIN_ALLOW_THREADS {
    std::vector<uint16_t> sum(static_cast<size_t>(plane), 0);
    // output normalized to [0, 1] (mean / 255), matching the f32 pipeline
    const float inv = 1.0f / (static_cast<float>(taps) * 255.0f);
    npy_intp window_lo = 0;  // frames [window_lo, window_hi) are in `sum`
    npy_intp window_hi = 0;
    for (npy_intp ki = 0; ki < k; ++ki) {
      const npy_intp lo = ki * stride;
      const npy_intp hi = lo + taps;
      if (lo >= window_hi) {  // disjoint: rebuild
        std::memset(sum.data(), 0, sum.size() * sizeof(uint16_t));
        window_lo = window_hi = lo;
      }
      for (; window_lo < lo; ++window_lo) {  // evict old frames
        const uint8_t* f = src + window_lo * plane;
        for (npy_intp i = 0; i < plane; ++i) sum[i] -= f[i];
      }
      for (; window_hi < hi; ++window_hi) {  // admit new frames
        const uint8_t* f = src + window_hi * plane;
        for (npy_intp i = 0; i < plane; ++i) sum[i] += f[i];
      }
      float* o = dst + ki * plane;
      for (npy_intp i = 0; i < plane; ++i) o[i] = sum[i] * inv;
    }
  }
  Py_END_ALLOW_THREADS
  return reinterpret_cast<PyObject*>(out);
}

PyMethodDef kMethods[] = {
    {"crop_norm_u8", crop_norm_u8, METH_VARARGS,
     "Fused uint8 crop + flips + 1/255 normalize -> float32."},
    {"blur_average_u8", blur_average_u8, METH_VARARGS,
     "Running-window mean of `taps` uint8 frames, stride `stride` -> f32."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "_fastops",
                       "bin_tpu native host data-path kernels", -1, kMethods};

}  // namespace

PyMODINIT_FUNC PyInit__fastops(void) {
  import_array();  // numpy C API init (returns nullptr on failure)
  return PyModule_Create(&kModule);
}

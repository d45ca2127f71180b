// Native host data pipeline: decode + full train-time augmentation +
// normalization in one GIL-free call per sample.
//
// The reference's host pipeline is native too (torch's C++ DataLoader
// machinery + OpenCV kernels, driven per-op from Python,
// util/transform.py + util/dataset.py:61-71). This module fuses the whole
// per-sample chain — JPEG/PNG decode, BGR->RGB float conversion, random
// scale (bilinear image / nearest label), rotation with mean/ignore
// border fill, 5x5 Gaussian blur, horizontal flip, pad-to-crop, crop,
// mean/std normalization, int64 label widening — into two C calls with no
// Python between pixel ops and no intermediate numpy temporaries.
// Randomness stays in Python (the per-(seed,epoch,sample) stream,
// semseg_tpu/data/transform.py::per_sample_rng): Python draws the
// parameters, this module does the pixels, so the native path is
// bit-compatible with the Python path given the same draws.
//
// Built against the system OpenCV C++ (see csrc/setup.py); the pip cv2
// wheel exports no OpenCV symbols, so both can live in one process.

#define PY_SSIZE_T_CLEAN
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <Python.h>
#include <numpy/arrayobject.h>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include <cmath>
#include <cstring>

namespace {

PyObject* mat_to_array_f32(const cv::Mat& m) {
  npy_intp dims[3] = {m.rows, m.cols, m.channels()};
  PyObject* arr = PyArray_SimpleNew(m.channels() > 1 ? 3 : 2, dims, NPY_FLOAT32);
  if (!arr) return nullptr;
  cv::Mat cont = m.isContinuous() ? m : m.clone();
  std::memcpy(PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)), cont.data,
              cont.total() * cont.elemSize());
  return arr;
}

PyObject* mat_to_array_u8(const cv::Mat& m) {
  npy_intp dims[2] = {m.rows, m.cols};
  PyObject* arr = PyArray_SimpleNew(2, dims, NPY_UINT8);
  if (!arr) return nullptr;
  cv::Mat cont = m.isContinuous() ? m : m.clone();
  std::memcpy(PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)), cont.data,
              cont.total());
  return arr;
}

// read_pair(image_path, label_path) -> (float32 RGB HWC, uint8 HW)
// Matches SemData.__getitem__: imread color BGR -> RGB -> float32, label
// grayscale (reference util/dataset.py:61-66).
PyObject* read_pair(PyObject*, PyObject* args) {
  const char* ipath;
  const char* lpath;
  if (!PyArg_ParseTuple(args, "ss", &ipath, &lpath)) return nullptr;

  cv::Mat img, lab;
  Py_BEGIN_ALLOW_THREADS
  cv::Mat bgr = cv::imread(ipath, cv::IMREAD_COLOR);
  if (!bgr.empty()) {
    cv::cvtColor(bgr, bgr, cv::COLOR_BGR2RGB);
    bgr.convertTo(img, CV_32FC3);
  }
  lab = cv::imread(lpath, cv::IMREAD_GRAYSCALE);
  Py_END_ALLOW_THREADS

  if (img.empty()) {
    PyErr_Format(PyExc_RuntimeError, "failed to read image %s", ipath);
    return nullptr;
  }
  if (lab.empty()) {
    PyErr_Format(PyExc_RuntimeError, "failed to read label %s", lpath);
    return nullptr;
  }
  PyObject* ia = mat_to_array_f32(img);
  if (!ia) return nullptr;
  PyObject* la = mat_to_array_u8(lab);
  if (!la) {
    Py_DECREF(ia);
    return nullptr;
  }
  return Py_BuildValue("(NN)", ia, la);
}

// augment(img f32 HWC3, lab u8 HW, fx, fy, has_rotate, angle, blur,
//         flip, crop_h, crop_w, h_off, w_off, pad0, pad1, pad2, ignore,
//         mean0, mean1, mean2, std0, std1, std2, has_std)
//   -> (img f32 [crop_h, crop_w, 3] normalized, lab int64 [crop_h, crop_w])
// fx/fy <= 0 skips the scale resize. NOTE cv::resize with fx/fy samples
// with the EXACT scale factors (not dsize/ssize), so fx/fy must be passed
// through — an explicit dsize resize is a different image. Offsets are in
// padded coords (Python draws them from cvRound(h*fy) analytic dims,
// validated against the real geometry below).
PyObject* augment(PyObject*, PyObject* args) {
  PyObject *img_obj, *lab_obj;
  int has_rotate, blur, flip, crop_h, crop_w, h_off, w_off;
  double fx, fy, angle, pad0, pad1, pad2, mean0, mean1, mean2, std0, std1,
      std2;
  int ignore, has_std;
  if (!PyArg_ParseTuple(
          args, "OOddidiiiiiidddiddddddi", &img_obj, &lab_obj, &fx,
          &fy, &has_rotate, &angle, &blur, &flip, &crop_h, &crop_w,
          &h_off, &w_off, &pad0, &pad1, &pad2, &ignore, &mean0, &mean1,
          &mean2, &std0, &std1, &std2, &has_std))
    return nullptr;

  PyArrayObject* img_arr = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(img_obj, NPY_FLOAT32, NPY_ARRAY_IN_ARRAY));
  if (!img_arr) return nullptr;
  PyArrayObject* lab_arr = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(lab_obj, NPY_UINT8, NPY_ARRAY_IN_ARRAY));
  if (!lab_arr) {
    Py_DECREF(img_arr);
    return nullptr;
  }
  if (PyArray_NDIM(img_arr) != 3 || PyArray_DIM(img_arr, 2) != 3 ||
      PyArray_NDIM(lab_arr) != 2) {
    PyErr_SetString(PyExc_ValueError, "expect img [H,W,3] f32, lab [H,W] u8");
    Py_DECREF(img_arr);
    Py_DECREF(lab_arr);
    return nullptr;
  }

  const int ih = static_cast<int>(PyArray_DIM(img_arr, 0));
  const int iw = static_cast<int>(PyArray_DIM(img_arr, 1));
  cv::Mat img(ih, iw, CV_32FC3, PyArray_DATA(img_arr));
  cv::Mat lab(static_cast<int>(PyArray_DIM(lab_arr, 0)),
              static_cast<int>(PyArray_DIM(lab_arr, 1)), CV_8UC1,
              PyArray_DATA(lab_arr));

  cv::Mat fimg, flab;
  bool bad_geom = false;
  Py_BEGIN_ALLOW_THREADS
  fimg = img;
  flab = lab;
  // 1) random scale (transform.py::RandScale: cv2.resize(None, fx, fy))
  if (fx > 0 && fy > 0) {
    cv::resize(fimg, fimg, cv::Size(), fx, fy, cv::INTER_LINEAR);
    cv::resize(flab, flab, cv::Size(), fx, fy, cv::INTER_NEAREST);
  }
  // 2) random rotate with border fills (transform.py::RandRotate)
  if (has_rotate) {
    cv::Mat m = cv::getRotationMatrix2D(
        cv::Point2f(flab.cols / 2.0f, flab.rows / 2.0f), angle, 1.0);
    cv::warpAffine(fimg, fimg, m, fimg.size(), cv::INTER_LINEAR,
                   cv::BORDER_CONSTANT, cv::Scalar(pad0, pad1, pad2));
    cv::warpAffine(flab, flab, m, flab.size(), cv::INTER_NEAREST,
                   cv::BORDER_CONSTANT, cv::Scalar(ignore));
  }
  // 3) 5x5 Gaussian blur (transform.py::RandomGaussianBlur). If neither
  // resize nor rotate ran, fimg/flab still wrap the caller's numpy
  // buffers — copy before the first in-place op so augment() never
  // mutates its inputs.
  if (blur) {
    if (fimg.data == img.data) fimg = fimg.clone();
    cv::GaussianBlur(fimg, fimg, cv::Size(5, 5), 0);
  }
  // 4) horizontal flip
  if (flip) {
    if (fimg.data == img.data) fimg = fimg.clone();
    if (flab.data == lab.data) flab = flab.clone();
    cv::flip(fimg, fimg, 1);
    cv::flip(flab, flab, 1);
  }
  // 5) pad-to-crop (mean fill image, ignore fill label), then crop
  {
    int pad_h = std::max(crop_h - fimg.rows, 0);
    int pad_w = std::max(crop_w - fimg.cols, 0);
    if (pad_h > 0 || pad_w > 0) {
      int top = pad_h / 2, left = pad_w / 2;
      cv::copyMakeBorder(fimg, fimg, top, pad_h - top, left, pad_w - left,
                         cv::BORDER_CONSTANT, cv::Scalar(pad0, pad1, pad2));
      cv::copyMakeBorder(flab, flab, top, pad_h - top, left, pad_w - left,
                         cv::BORDER_CONSTANT, cv::Scalar(ignore));
    }
    if (h_off < 0 || w_off < 0 || h_off + crop_h > fimg.rows ||
        w_off + crop_w > fimg.cols) {
      bad_geom = true;
    } else {
      fimg = fimg(cv::Rect(w_off, h_off, crop_w, crop_h));
      flab = flab(cv::Rect(w_off, h_off, crop_w, crop_h));
      // 6) normalize (transform.py::Normalize, 0-255 scale). Plain IEEE
      // f32 subtract + divide, bit-matching numpy's (image - mean) / std
      // (cv::divide multiplies by a reciprocal — 1 ulp off).
      fimg = fimg.clone();  // own the crop before in-place math
      const float m[3] = {static_cast<float>(mean0),
                          static_cast<float>(mean1),
                          static_cast<float>(mean2)};
      const float s[3] = {static_cast<float>(std0),
                          static_cast<float>(std1),
                          static_cast<float>(std2)};
      // Raw-output mode (uint8 wire: mean 0, no std) skips the pass —
      // subtracting 0 and storing back would cost a full image
      // read+write per sample on the host's augmentation threads.
      const bool is_noop =
          !has_std && mean0 == 0.0 && mean1 == 0.0 && mean2 == 0.0;
      if (!is_noop) {
        for (int r = 0; r < fimg.rows; ++r) {
          float* p = fimg.ptr<float>(r);
          for (int c = 0; c < fimg.cols; ++c) {
            for (int k = 0; k < 3; ++k) {
              float v = p[3 * c + k] - m[k];
              p[3 * c + k] = has_std ? v / s[k] : v;
            }
          }
        }
      }
    }
  }
  Py_END_ALLOW_THREADS

  if (bad_geom) {
    PyErr_Format(PyExc_ValueError,
                 "crop (%d+%d, %d+%d) exceeds padded dims (%d, %d) — "
                 "Python-side geometry disagrees with cv2 resize",
                 h_off, crop_h, w_off, crop_w, fimg.rows, fimg.cols);
    Py_DECREF(img_arr);
    Py_DECREF(lab_arr);
    return nullptr;
  }

  PyObject* out_img = mat_to_array_f32(fimg);
  npy_intp ldims[2] = {crop_h, crop_w};
  PyObject* out_lab = PyArray_SimpleNew(2, ldims, NPY_INT64);
  if (!out_img || !out_lab) {
    Py_XDECREF(out_img);
    Py_XDECREF(out_lab);
    Py_DECREF(img_arr);
    Py_DECREF(lab_arr);
    return nullptr;
  }
  int64_t* lp =
      static_cast<int64_t*>(PyArray_DATA(reinterpret_cast<PyArrayObject*>(out_lab)));
  for (int r = 0; r < crop_h; ++r) {
    const uint8_t* src = flab.ptr<uint8_t>(r);
    for (int c = 0; c < crop_w; ++c) lp[static_cast<int64_t>(r) * crop_w + c] = src[c];
  }

  Py_DECREF(img_arr);
  Py_DECREF(lab_arr);
  return Py_BuildValue("(NN)", out_img, out_lab);
}

PyMethodDef methods[] = {
    {"read_pair", read_pair, METH_VARARGS,
     "decode (image, label) -> (f32 RGB HWC, u8 HW)"},
    {"augment", augment, METH_VARARGS,
     "fused scale/rotate/blur/flip/pad/crop/normalize"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_hostpipe",
    "native (C++/OpenCV) host data pipeline", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__hostpipe(void) {
  import_array();
  cv::setNumThreads(0);  // loader threads parallelize across samples
  return PyModule_Create(&moduledef);
}

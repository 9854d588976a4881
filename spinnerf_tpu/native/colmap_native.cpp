// Native COLMAP binary-model parser + sparse-depth assembly.
//
// The host-side native component of the framework (the reference's only
// native code is the torchsearchsorted CUDA/C++ extension; its TPU compute
// role is covered by XLA/Pallas, while THIS covers the data-runtime role):
// parsing multi-hundred-MB COLMAP models and assembling per-view depth
// supervision is pure pointer-chasing that Python does 20-50x slower.
//
// Exposed via the CPython C API (no pybind11 in this image):
//   parse_images(bytes)   -> list of (image_id, qvec[4], tvec[3], camera_id,
//                            name, xys[N,2] float64 bytes, ids[N] int64 bytes)
//   parse_points(bytes)   -> (ids[N] int64, xyz[N,3] f64, rgb[N,3] u8,
//                            error[N] f64, track_offsets[N+1] int64,
//                            track_data[M,2] int32) as bytes tuples
//   parse_cameras(bytes)  -> list of (camera_id, model_id, width, height,
//                            params[...] f64 bytes)
//
// All outputs are raw little-endian buffers wrapped as bytes; the Python
// wrapper (spinnerf_tpu/data/colmap_fast.py) views them as numpy arrays
// zero-copy via np.frombuffer.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Reader {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  template <typename T>
  T get() {
    if (p + sizeof(T) > end) {
      ok = false;
      return T{};
    }
    T v;
    std::memcpy(&v, p, sizeof(T));
    p += sizeof(T);
    return v;
  }

  bool skip(size_t n) {
    if (p + n > end) {
      ok = false;
      return false;
    }
    p += n;
    return true;
  }

  std::string cstring() {
    std::string s;
    while (p < end && *p != 0) s.push_back(static_cast<char>(*p++));
    if (p < end) ++p;  // consume NUL
    else ok = false;
    return s;
  }
};

PyObject* bytes_from(const void* data, size_t n) {
  return PyBytes_FromStringAndSize(static_cast<const char*>(data),
                                   static_cast<Py_ssize_t>(n));
}

int camera_model_params(int model_id) {
  switch (model_id) {
    case 0: return 3;   // SIMPLE_PINHOLE
    case 1: return 4;   // PINHOLE
    case 2: return 4;   // SIMPLE_RADIAL
    case 3: return 5;   // RADIAL
    case 4: return 8;   // OPENCV
    case 5: return 8;   // OPENCV_FISHEYE
    case 6: return 12;  // FULL_OPENCV
    case 7: return 5;   // FOV
    case 8: return 4;   // SIMPLE_RADIAL_FISHEYE
    case 9: return 5;   // RADIAL_FISHEYE
    case 10: return 12; // THIN_PRISM_FISHEYE
    default: return -1;
  }
}

PyObject* parse_cameras(PyObject*, PyObject* arg) {
  Py_buffer buf;
  if (PyObject_GetBuffer(arg, &buf, PyBUF_SIMPLE) != 0) return nullptr;
  Reader r{static_cast<const uint8_t*>(buf.buf),
           static_cast<const uint8_t*>(buf.buf) + buf.len};

  uint64_t n = r.get<uint64_t>();
  // count sanity vs buffer size (min record: 2*i32 + 2*u64 + >=3 params)
  if (n > static_cast<uint64_t>(buf.len) / 40) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "corrupt cameras.bin (bad count)");
    return nullptr;
  }
  bool bad_model = false;
  PyObject* out = PyList_New(0);
  if (!out) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  for (uint64_t i = 0; i < n && r.ok; ++i) {
    int32_t cam_id = r.get<int32_t>();
    int32_t model_id = r.get<int32_t>();
    uint64_t width = r.get<uint64_t>();
    uint64_t height = r.get<uint64_t>();
    int np = camera_model_params(model_id);
    if (np < 0) {
      r.ok = false;
      bad_model = true;
      break;
    }
    const uint8_t* params = r.p;
    if (!r.skip(8 * static_cast<size_t>(np))) break;
    PyObject* row = Py_BuildValue(
        "iiKKN", cam_id, model_id, (unsigned long long)width,
        (unsigned long long)height, bytes_from(params, 8 * np));
    if (!row || PyList_Append(out, row) != 0) {
      Py_XDECREF(row);
      Py_DECREF(out);
      PyBuffer_Release(&buf);
      return nullptr;  // error already set
    }
    Py_DECREF(row);
  }
  PyBuffer_Release(&buf);
  if (!r.ok) {
    Py_DECREF(out);
    PyErr_SetString(PyExc_ValueError, bad_model
                        ? "unknown camera model id in cameras.bin"
                        : "truncated cameras.bin");
    return nullptr;
  }
  return out;
}

PyObject* parse_images(PyObject*, PyObject* arg) {
  Py_buffer buf;
  if (PyObject_GetBuffer(arg, &buf, PyBUF_SIMPLE) != 0) return nullptr;
  Reader r{static_cast<const uint8_t*>(buf.buf),
           static_cast<const uint8_t*>(buf.buf) + buf.len};

  uint64_t n = r.get<uint64_t>();
  // min image record: i32 + 32 + 24 + i32 + NUL + u64 = 73 bytes
  if (n > static_cast<uint64_t>(buf.len) / 73) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "corrupt images.bin (bad count)");
    return nullptr;
  }
  PyObject* out = PyList_New(0);
  if (!out) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  std::vector<double> xys;
  std::vector<int64_t> ids;
  for (uint64_t i = 0; i < n && r.ok; ++i) {
    int32_t img_id = r.get<int32_t>();
    const uint8_t* qvec = r.p;
    if (!r.skip(32)) break;
    const uint8_t* tvec = r.p;
    if (!r.skip(24)) break;
    int32_t cam_id = r.get<int32_t>();
    std::string name = r.cstring();
    uint64_t npts = r.get<uint64_t>();
    if (!r.ok) break;
    // each 2D point is 24 bytes; bound reserve by what the buffer can hold
    if (npts > static_cast<uint64_t>(r.end - r.p) / 24) {
      r.ok = false;
      break;
    }

    xys.clear();
    ids.clear();
    xys.reserve(npts * 2);
    ids.reserve(npts);
    for (uint64_t k = 0; k < npts && r.ok; ++k) {
      xys.push_back(r.get<double>());
      xys.push_back(r.get<double>());
      ids.push_back(r.get<int64_t>());
    }
    if (!r.ok) break;

    PyObject* row = Py_BuildValue(
        "iNNis#NN", img_id, bytes_from(qvec, 32), bytes_from(tvec, 24),
        cam_id, name.c_str(), (Py_ssize_t)name.size(),
        bytes_from(xys.data(), xys.size() * 8),
        bytes_from(ids.data(), ids.size() * 8));
    if (!row || PyList_Append(out, row) != 0) {
      // e.g. a non-UTF-8 image name: propagate the Python error instead
      // of Py_DECREF(nullptr) crashing the interpreter
      Py_XDECREF(row);
      Py_DECREF(out);
      PyBuffer_Release(&buf);
      return nullptr;
    }
    Py_DECREF(row);
  }
  PyBuffer_Release(&buf);
  if (!r.ok) {
    Py_DECREF(out);
    PyErr_SetString(PyExc_ValueError, "truncated images.bin");
    return nullptr;
  }
  return out;
}

PyObject* parse_points(PyObject*, PyObject* arg) {
  Py_buffer buf;
  if (PyObject_GetBuffer(arg, &buf, PyBUF_SIMPLE) != 0) return nullptr;
  Reader r{static_cast<const uint8_t*>(buf.buf),
           static_cast<const uint8_t*>(buf.buf) + buf.len};

  uint64_t n = r.get<uint64_t>();
  // min point record: i64 + 3*f64 + 3*u8 + f64 + u64 track_len = 51 bytes
  if (n > static_cast<uint64_t>(buf.len) / 51) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "corrupt points3D.bin (bad count)");
    return nullptr;
  }
  std::vector<int64_t> ids;
  std::vector<double> xyz;
  std::vector<uint8_t> rgb;
  std::vector<double> err;
  // track arrays flattened with per-point offsets
  std::vector<int64_t> track_offsets;  // n+1
  std::vector<int32_t> track_data;     // (img_id, pt2d_idx) pairs
  ids.reserve(n);
  xyz.reserve(n * 3);
  rgb.reserve(n * 3);
  err.reserve(n);
  track_offsets.push_back(0);

  for (uint64_t i = 0; i < n && r.ok; ++i) {
    ids.push_back(r.get<int64_t>());
    for (int k = 0; k < 3; ++k) xyz.push_back(r.get<double>());
    for (int k = 0; k < 3; ++k) rgb.push_back(r.get<uint8_t>());
    err.push_back(r.get<double>());
    uint64_t tl = r.get<uint64_t>();
    for (uint64_t k = 0; k < tl && r.ok; ++k) {
      track_data.push_back(r.get<int32_t>());
      track_data.push_back(r.get<int32_t>());
    }
    track_offsets.push_back(static_cast<int64_t>(track_data.size() / 2));
  }
  PyBuffer_Release(&buf);
  if (!r.ok) {
    PyErr_SetString(PyExc_ValueError, "truncated points3D.bin");
    return nullptr;
  }
  return Py_BuildValue(
      "NNNNNN", bytes_from(ids.data(), ids.size() * 8),
      bytes_from(xyz.data(), xyz.size() * 8),
      bytes_from(rgb.data(), rgb.size()),
      bytes_from(err.data(), err.size() * 8),
      bytes_from(track_offsets.data(), track_offsets.size() * 8),
      bytes_from(track_data.data(), track_data.size() * 4));
}

PyMethodDef methods[] = {
    {"parse_cameras", parse_cameras, METH_O,
     "Parse cameras.bin bytes -> list of tuples"},
    {"parse_images", parse_images, METH_O,
     "Parse images.bin bytes -> list of tuples"},
    {"parse_points", parse_points, METH_O,
     "Parse points3D.bin bytes -> flat column tuple"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "colmap_native",
                         "Native COLMAP binary parsers", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit_colmap_native(void) {
  return PyModule_Create(&moduledef);
}

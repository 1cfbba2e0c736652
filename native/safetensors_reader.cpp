// Fast safetensors reader: mmap + header parse + zero-copy tensor views.
//
// The converter reads multi-GB checkpoints (SD1.5 UNet is 3.4 GB fp32); going
// through Python-side file reads costs an extra copy per tensor. This reader mmaps
// the file once and hands out pointers into the mapping; numpy wraps them without
// copying (minsdtf_tpu/weights/native_io.py). C API over ctypes — no pybind11 in
// the image.
//
// safetensors format: u64 little-endian header length N, then N bytes of JSON
// {"name": {"dtype": "F32", "shape": [..], "data_offsets": [b, e]}, ...,
//  "__metadata__": {...}}, then the data section; offsets are relative to the end
// of the header.

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <unordered_map>
#include <vector>

namespace {

struct TensorInfo {
  std::string dtype;
  std::vector<int64_t> shape;
  uint64_t begin = 0;
  uint64_t end = 0;
};

struct File {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t size = 0;
  const uint8_t* data = nullptr;  // start of the data section
  size_t data_size = 0;           // bytes in the data section
  std::vector<std::string> names;
  std::unordered_map<std::string, TensorInfo> tensors;
  std::string error;
};

// ---- minimal JSON scanner (sufficient for the flat safetensors header) -----------

struct Scanner {
  const char* p;
  const char* end;
  bool ok = true;

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) p++;
  }
  bool consume(char c) {
    skip_ws();
    if (p < end && *p == c) { p++; return true; }
    ok = false;
    return false;
  }
  bool peek(char c) {
    skip_ws();
    return p < end && *p == c;
  }
  std::string parse_string() {
    skip_ws();
    std::string out;
    if (p >= end || *p != '"') { ok = false; return out; }
    p++;
    while (p < end && *p != '"') {
      if (*p == '\\' && p + 1 < end) { p++; out.push_back(*p++); }
      else out.push_back(*p++);
    }
    if (p < end) p++; else ok = false;
    return out;
  }
  int64_t parse_int() {
    skip_ws();
    bool neg = p < end && *p == '-';
    if (neg) p++;
    int64_t v = 0;
    bool any = false;
    while (p < end && *p >= '0' && *p <= '9') { v = v * 10 + (*p++ - '0'); any = true; }
    if (!any) ok = false;
    return neg ? -v : v;
  }
  void skip_value();  // for __metadata__ payloads
};

void Scanner::skip_value() {
  skip_ws();
  if (p >= end) { ok = false; return; }
  if (*p == '"') { parse_string(); return; }
  if (*p == '{') {
    p++;
    skip_ws();
    if (peek('}')) { consume('}'); return; }
    while (ok) {
      parse_string();
      consume(':');
      skip_value();
      if (peek(',')) { consume(','); continue; }
      consume('}');
      break;
    }
    return;
  }
  if (*p == '[') {
    p++;
    skip_ws();
    if (peek(']')) { consume(']'); return; }
    while (ok) {
      skip_value();
      if (peek(',')) { consume(','); continue; }
      consume(']');
      break;
    }
    return;
  }
  // number / true / false / null
  while (p < end && *p != ',' && *p != '}' && *p != ']') p++;
}

bool parse_header(File* f, const char* json, size_t len) {
  Scanner s{json, json + len};
  if (!s.consume('{')) return false;
  if (s.peek('}')) return s.consume('}');
  while (s.ok) {
    std::string name = s.parse_string();
    s.consume(':');
    if (name == "__metadata__") {
      s.skip_value();
    } else {
      TensorInfo info;
      if (!s.consume('{')) return false;
      while (s.ok && !s.peek('}')) {
        std::string key = s.parse_string();
        s.consume(':');
        if (key == "dtype") {
          info.dtype = s.parse_string();
        } else if (key == "shape") {
          s.consume('[');
          if (!s.peek(']')) {
            while (s.ok) {
              info.shape.push_back(s.parse_int());
              if (s.peek(',')) { s.consume(','); continue; }
              break;
            }
          }
          s.consume(']');
        } else if (key == "data_offsets") {
          s.consume('[');
          info.begin = (uint64_t)s.parse_int();
          s.consume(',');
          info.end = (uint64_t)s.parse_int();
          s.consume(']');
        } else {
          s.skip_value();
        }
        if (s.peek(',')) s.consume(',');
      }
      s.consume('}');
      f->names.push_back(name);
      f->tensors.emplace(std::move(name), std::move(info));
    }
    if (s.peek(',')) { s.consume(','); continue; }
    s.consume('}');
    break;
  }
  return s.ok;
}

}  // namespace

extern "C" {

void* st_open(const char* path) {
  File* f = new File();
  f->fd = open(path, O_RDONLY);
  if (f->fd < 0) { delete f; return nullptr; }
  struct stat st;
  if (fstat(f->fd, &st) != 0 || st.st_size < 8) { close(f->fd); delete f; return nullptr; }
  f->size = (size_t)st.st_size;
  f->map = (const uint8_t*)mmap(nullptr, f->size, PROT_READ, MAP_PRIVATE, f->fd, 0);
  if (f->map == MAP_FAILED) { close(f->fd); delete f; return nullptr; }
  uint64_t header_len = 0;
  memcpy(&header_len, f->map, 8);  // little-endian on all supported hosts
  // f->size >= 8 is guaranteed above; compare without `8 + header_len`, which can
  // wrap for a corrupt/malicious header_len near UINT64_MAX and bypass the check.
  if (header_len > f->size - 8) { munmap((void*)f->map, f->size); close(f->fd); delete f; return nullptr; }
  f->data = f->map + 8 + header_len;
  f->data_size = f->size - 8 - (size_t)header_len;
  if (!parse_header(f, (const char*)(f->map + 8), (size_t)header_len)) {
    munmap((void*)f->map, f->size);
    close(f->fd);
    delete f;
    return nullptr;
  }
  return f;
}

int st_num_tensors(void* handle) {
  return (int)((File*)handle)->names.size();
}

const char* st_tensor_name(void* handle, int i) {
  File* f = (File*)handle;
  if (i < 0 || i >= (int)f->names.size()) return nullptr;
  return f->names[i].c_str();
}

// Returns 0 on success. dtype_out must hold >= 8 bytes; shape_out >= 8 entries.
int st_tensor_info(void* handle, const char* name, char* dtype_out, int64_t* shape_out,
                   int* ndim, const uint8_t** data_ptr, int64_t* nbytes) {
  File* f = (File*)handle;
  auto it = f->tensors.find(name);
  if (it == f->tensors.end()) return 1;
  const TensorInfo& t = it->second;
  if (t.shape.size() > 8) return 2;
  // Validate offsets BEFORE forming pointers: begin <= end and end within the data
  // section, so corrupt headers can never expose out-of-mapping views.
  if (t.begin > t.end || t.end > (uint64_t)f->data_size) return 3;
  snprintf(dtype_out, 8, "%s", t.dtype.c_str());
  *ndim = (int)t.shape.size();
  for (size_t i = 0; i < t.shape.size(); i++) shape_out[i] = t.shape[i];
  *data_ptr = f->data + t.begin;
  *nbytes = (int64_t)(t.end - t.begin);
  return 0;
}

void st_close(void* handle) {
  File* f = (File*)handle;
  if (f->map) munmap((void*)f->map, f->size);
  if (f->fd >= 0) close(f->fd);
  delete f;
}

}  // extern "C"

// Zero-copy safetensors reader: mmap the shard, parse the JSON header,
// hand out pointers into the mapping. The TPU-native replacement for the
// reference's reliance on torch/safetensors Python loading inside vLLM's
// weight loader (`modeling_hymeta.py:1487-1691` streams a dict of torch
// tensors); here the host never copies weight bytes — numpy views feed
// jax.device_put directly.
//
// C API (ctypes-friendly):
//   void* st_open(const char* path);
//   int   st_num_tensors(void* h);
//   const char* st_tensor_name(void* h, int i);
//   int   st_tensor_info(void* h, const char* name, char* dtype_out,
//                        long* shape_out, int* ndim_out, long* nbytes_out);
//   const void* st_data_ptr(void* h, const char* name);
//   void  st_close(void* h);
//   const char* st_last_error();
//
// Build: make -C csrc   (produces libsafetensors_reader.so)

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <map>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

thread_local std::string g_error;

struct TensorInfo {
  std::string dtype;
  std::vector<int64_t> shape;
  int64_t begin = 0;
  int64_t end = 0;
};

struct Handle {
  int fd = -1;
  size_t size = 0;
  const uint8_t* base = nullptr;   // mmap base
  const uint8_t* data = nullptr;   // start of tensor data section
  std::map<std::string, TensorInfo> tensors;
  std::vector<std::string> names;  // stable iteration order
};

// --- minimal JSON parsing for the safetensors header subset -------------
// Grammar needed: object of  "name": {"dtype": str, "shape": [ints],
// "data_offsets": [int, int]}  plus an optional "__metadata__" object of
// string->string. Strings never contain escaped quotes in tensor names
// produced by HF, but we handle \" anyway.

struct Parser {
  const char* p;
  const char* end;
  bool fail = false;

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      ++p;
  }
  bool expect(char c) {
    skip_ws();
    if (p < end && *p == c) { ++p; return true; }
    fail = true;
    return false;
  }
  bool peek(char c) {
    skip_ws();
    return p < end && *p == c;
  }
  std::string parse_string() {
    skip_ws();
    std::string out;
    if (p >= end || *p != '"') { fail = true; return out; }
    ++p;
    while (p < end && *p != '"') {
      if (*p == '\\' && p + 1 < end) { ++p; }
      out.push_back(*p++);
    }
    if (p >= end) { fail = true; return out; }
    ++p;  // closing quote
    return out;
  }
  int64_t parse_int() {
    skip_ws();
    bool neg = false;
    if (p < end && *p == '-') { neg = true; ++p; }
    int64_t v = 0;
    bool any = false;
    while (p < end && *p >= '0' && *p <= '9') {
      v = v * 10 + (*p - '0');
      ++p;
      any = true;
    }
    if (!any) fail = true;
    return neg ? -v : v;
  }
  void skip_value();  // fwd
  void skip_object() {
    if (!expect('{')) return;
    if (peek('}')) { ++p; return; }
    while (!fail) {
      parse_string();
      if (!expect(':')) return;
      skip_value();
      if (peek(',')) { ++p; continue; }
      expect('}');
      return;
    }
  }
  void skip_array() {
    if (!expect('[')) return;
    if (peek(']')) { ++p; return; }
    while (!fail) {
      skip_value();
      if (peek(',')) { ++p; continue; }
      expect(']');
      return;
    }
  }
};

void Parser::skip_value() {
  skip_ws();
  if (p >= end) { fail = true; return; }
  if (*p == '"') { parse_string(); return; }
  if (*p == '{') { skip_object(); return; }
  if (*p == '[') { skip_array(); return; }
  // number / true / false / null
  while (p < end && *p != ',' && *p != '}' && *p != ']') ++p;
}

bool parse_header(const char* json, size_t n, Handle* h) {
  Parser ps{json, json + n};
  if (!ps.expect('{')) return false;
  if (ps.peek('}')) return true;
  while (!ps.fail) {
    std::string name = ps.parse_string();
    if (!ps.expect(':')) break;
    if (name == "__metadata__") {
      ps.skip_object();
    } else {
      TensorInfo info;
      if (!ps.expect('{')) break;
      while (!ps.fail) {
        std::string key = ps.parse_string();
        if (!ps.expect(':')) break;
        if (key == "dtype") {
          info.dtype = ps.parse_string();
        } else if (key == "shape") {
          if (!ps.expect('[')) break;
          if (!ps.peek(']')) {
            while (!ps.fail) {
              info.shape.push_back(ps.parse_int());
              if (ps.peek(',')) { ++ps.p; continue; }
              break;
            }
          }
          ps.expect(']');
        } else if (key == "data_offsets") {
          if (!ps.expect('[')) break;
          info.begin = ps.parse_int();
          ps.expect(',');
          info.end = ps.parse_int();
          ps.expect(']');
        } else {
          ps.skip_value();
        }
        if (ps.peek(',')) { ++ps.p; continue; }
        ps.expect('}');
        break;
      }
      h->tensors[name] = info;
      h->names.push_back(name);
    }
    if (ps.peek(',')) { ++ps.p; continue; }
    ps.expect('}');
    break;
  }
  return !ps.fail;
}

}  // namespace

extern "C" {

void st_close(void* hv);  // fwd

const char* st_last_error() { return g_error.c_str(); }

void* st_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) {
    g_error = std::string("open failed: ") + path;
    return nullptr;
  }
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 8) {
    g_error = "stat failed or file too small";
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) {
    g_error = "mmap failed";
    ::close(fd);
    return nullptr;
  }
  madvise(base, st.st_size, MADV_SEQUENTIAL);

  auto* h = new Handle;
  h->fd = fd;
  h->size = st.st_size;
  h->base = static_cast<const uint8_t*>(base);

  uint64_t header_len;
  std::memcpy(&header_len, h->base, 8);
  if (8 + header_len > h->size) {
    g_error = "corrupt header length";
    st_close(h);
    return nullptr;
  }
  h->data = h->base + 8 + header_len;
  if (!parse_header(reinterpret_cast<const char*>(h->base + 8), header_len,
                    h)) {
    g_error = "header parse failed";
    st_close(h);
    return nullptr;
  }
  return h;
}

int st_num_tensors(void* hv) {
  return static_cast<int>(static_cast<Handle*>(hv)->names.size());
}

const char* st_tensor_name(void* hv, int i) {
  auto* h = static_cast<Handle*>(hv);
  if (i < 0 || i >= static_cast<int>(h->names.size())) return nullptr;
  return h->names[i].c_str();
}

int st_tensor_info(void* hv, const char* name, char* dtype_out,
                   long* shape_out, int* ndim_out, long* nbytes_out) {
  auto* h = static_cast<Handle*>(hv);
  auto it = h->tensors.find(name);
  if (it == h->tensors.end()) {
    g_error = std::string("no tensor: ") + name;
    return -1;
  }
  const TensorInfo& t = it->second;
  std::strncpy(dtype_out, t.dtype.c_str(), 15);
  dtype_out[15] = 0;
  *ndim_out = static_cast<int>(t.shape.size());
  for (size_t i = 0; i < t.shape.size() && i < 8; ++i)
    shape_out[i] = t.shape[i];
  *nbytes_out = t.end - t.begin;
  return 0;
}

const void* st_data_ptr(void* hv, const char* name) {
  auto* h = static_cast<Handle*>(hv);
  auto it = h->tensors.find(name);
  if (it == h->tensors.end()) return nullptr;
  if (h->data + it->second.end > h->base + h->size) {
    g_error = "tensor extends past file";
    return nullptr;
  }
  return h->data + it->second.begin;
}

void st_close(void* hv) {
  auto* h = static_cast<Handle*>(hv);
  if (h->base) munmap(const_cast<uint8_t*>(h->base), h->size);
  if (h->fd >= 0) ::close(h->fd);
  delete h;
}

}  // extern "C"

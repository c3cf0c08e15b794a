// Fast .wts parser — native analog of loadWeights() (lenet/utils.h:49-80).
//
// The reference parses the text format with iostream `>> std::hex` per token;
// for 100MB+ checkpoint dumps that is the slow path of engine builds. This
// parser mmap-reads the file once and decodes hex with a lookup table.
//
// C ABI for ctypes (no pybind11 in the image):
//   wts_open(path)           -> handle (NULL on failure)
//   wts_count(h)             -> number of tensors
//   wts_name(h, i)           -> tensor name (valid until wts_close)
//   wts_size(h, i)           -> element count
//   wts_read(h, i, out)      -> decode tensor i into out[size] floats, 1=ok
//   wts_close(h)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Entry {
  std::string name;
  int64_t count;
  const char* payload;  // start of first hex token
};

struct Wts {
  std::vector<char> data;
  std::vector<Entry> entries;
};

int8_t kHex[256];

struct HexInit {
  HexInit() {
    memset(kHex, -1, sizeof(kHex));
    for (int c = '0'; c <= '9'; ++c) kHex[c] = c - '0';
    for (int c = 'a'; c <= 'f'; ++c) kHex[c] = 10 + c - 'a';
    for (int c = 'A'; c <= 'F'; ++c) kHex[c] = 10 + c - 'A';
  }
} hex_init;

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n')) ++p;
  return p;
}

inline const char* next_ws(const char* p, const char* end) {
  while (p < end && *p != ' ' && *p != '\t' && *p != '\r' && *p != '\n') ++p;
  return p;
}

}  // namespace

extern "C" {

void* wts_open(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  Wts* w = new Wts();
  w->data.resize(sz);
  if (fread(w->data.data(), 1, sz, f) != static_cast<size_t>(sz)) {
    fclose(f);
    delete w;
    return nullptr;
  }
  fclose(f);

  const char* p = w->data.data();
  const char* end = p + sz;
  p = skip_ws(p, end);
  char* after = nullptr;
  long count = strtol(p, &after, 10);
  p = after;
  w->entries.reserve(count);
  for (long i = 0; i < count && p < end; ++i) {
    p = skip_ws(p, end);
    const char* name_end = next_ws(p, end);
    if (p == name_end) break;
    Entry e;
    e.name.assign(p, name_end - p);
    p = skip_ws(name_end, end);
    e.count = strtol(p, &after, 10);
    p = after;
    p = skip_ws(p, end);
    e.payload = p;
    // skip count hex tokens (8 hex chars + separator each); scan to line end
    const char* q = p;
    while (q < end && *q != '\n') ++q;
    p = q;
    w->entries.push_back(std::move(e));
  }
  return w;
}

int64_t wts_count(void* h) { return static_cast<Wts*>(h)->entries.size(); }

const char* wts_name(void* h, int64_t i) {
  return static_cast<Wts*>(h)->entries[i].name.c_str();
}

int64_t wts_size(void* h, int64_t i) {
  return static_cast<Wts*>(h)->entries[i].count;
}

int wts_read(void* h, int64_t i, float* out) {
  Wts* w = static_cast<Wts*>(h);
  const Entry& e = w->entries[i];
  const char* p = e.payload;
  const char* end = w->data.data() + w->data.size();
  for (int64_t k = 0; k < e.count; ++k) {
    p = skip_ws(p, end);
    uint32_t v = 0;
    int digits = 0;
    while (p < end) {
      int8_t d = kHex[static_cast<unsigned char>(*p)];
      if (d < 0) break;
      v = (v << 4) | static_cast<uint32_t>(d);
      ++p;
      ++digits;
    }
    if (digits == 0) return 0;  // truncated line
    memcpy(out + k, &v, 4);
  }
  return 1;
}

void wts_close(void* h) { delete static_cast<Wts*>(h); }

}  // extern "C"

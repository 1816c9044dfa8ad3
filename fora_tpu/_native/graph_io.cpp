// Native graph ingest: fast edge-list parser for the reference dataset
// contract (graph.txt: one "src dst" pair per line).
//
// The reference's loader is a C++ istream loop inside its Graph constructor
// [R: graph.h — reconstruction, SURVEY.md Sec. 2.1]; Python-side parsing of
// Twitter/Friendster-scale lists (1.4B+ edges) is the bottleneck, so this
// stays native here too (SURVEY.md Sec. 2.1 native-code checklist item 4).
//
// Exposed via ctypes (no pybind11 in this image): two-pass API — count,
// then fill caller-allocated int64 arrays.
//
// Build: make -C fora_tpu/_native   (produces libfora_native.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Mapped {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;
  bool ok() const { return data != nullptr; }
};

Mapped map_file(const char* path) {
  Mapped m;
  m.fd = ::open(path, O_RDONLY);
  if (m.fd < 0) return m;
  struct stat st;
  if (::fstat(m.fd, &st) != 0 || st.st_size == 0) {
    ::close(m.fd);
    m.fd = -1;
    return m;
  }
  void* p = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, m.fd, 0);
  if (p == MAP_FAILED) {
    ::close(m.fd);
    m.fd = -1;
    return m;
  }
  ::madvise(p, st.st_size, MADV_SEQUENTIAL);
  m.data = static_cast<const char*>(p);
  m.size = static_cast<size_t>(st.st_size);
  return m;
}

void unmap(Mapped& m) {
  if (m.data) ::munmap(const_cast<char*>(m.data), m.size);
  if (m.fd >= 0) ::close(m.fd);
  m.data = nullptr;
  m.fd = -1;
}

// Scan integers; any non-digit run is a separator. '#'-prefixed and '%'-
// prefixed lines (comment conventions of SNAP dumps) are skipped.
template <typename OnPair>
int64_t scan_pairs(const Mapped& m, OnPair&& on_pair) {
  const char* p = m.data;
  const char* end = m.data + m.size;
  int64_t count = 0;
  while (p < end) {
    // skip comment lines
    if (*p == '#' || *p == '%') {
      while (p < end && *p != '\n') ++p;
      if (p < end) ++p;
      continue;
    }
    // parse up to two integers on this line
    int64_t vals[2];
    int got = 0;
    while (p < end && *p != '\n' && got < 2) {
      while (p < end && *p != '\n' && (*p < '0' || *p > '9') && *p != '-') ++p;
      if (p >= end || *p == '\n') break;
      bool neg = (*p == '-');
      if (neg) ++p;
      int64_t v = 0;
      bool any = false;
      while (p < end && *p >= '0' && *p <= '9') {
        v = v * 10 + (*p - '0');
        ++p;
        any = true;
      }
      if (any) vals[got++] = neg ? -v : v;
    }
    if (got == 2) {
      on_pair(vals[0], vals[1], count);
      ++count;
    }
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;
  }
  return count;
}

}  // namespace

extern "C" {

// Returns edge count, or -1 on I/O error.
int64_t fora_count_edges(const char* path) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;
  int64_t c = scan_pairs(m, [](int64_t, int64_t, int64_t) {});
  unmap(m);
  return c;
}

// Fills src/dst (caller-allocated, capacity cap). Returns edges written,
// or -1 on I/O error, or -2 if the file holds more than cap edges.
int64_t fora_parse_edges(const char* path, int64_t* src, int64_t* dst,
                         int64_t cap) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;
  bool overflow = false;
  int64_t c = scan_pairs(m, [&](int64_t a, int64_t b, int64_t i) {
    if (i >= cap) {
      overflow = true;
      return;
    }
    src[i] = a;
    dst[i] = b;
  });
  unmap(m);
  if (overflow) return -2;
  return c;
}

}  // extern "C"

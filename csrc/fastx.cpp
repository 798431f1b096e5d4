// Native FASTA/FASTQ(.gz) parser — the host-runtime replacement for the
// reference's bioparser (vendor/spoa/vendor/bioparser): gzip-streamed chunked
// parsing with name shortening at the first whitespace (parser.hpp:113-120),
// uppercased sequence data and the all-zero-quality drop rule
// (src/sequence.cpp:19-42).
//
// Exposed as a C API for ctypes; built by vechat_tpu/io/native.py.

#include <zlib.h>

#include <cctype>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Record {
  std::string name;
  std::string seq;
  std::string qual;  // empty when absent / all-'!'
};

struct FastxFile {
  std::vector<Record> records;
  std::string error;
};

bool read_all(const char* path, std::string* dst, std::string* err) {
  gzFile f = gzopen(path, "rb");
  if (!f) {
    *err = "cannot open file";
    return false;
  }
  gzbuffer(f, 1 << 20);
  char buf[1 << 16];
  int n;
  while ((n = gzread(f, buf, sizeof(buf))) > 0) {
    dst->append(buf, n);
  }
  bool ok = n == 0;
  if (!ok) *err = "gzip read error";
  gzclose(f);
  return ok;
}

inline size_t shorten(const char* s, size_t len) {
  for (size_t i = 0; i < len; ++i) {
    if (std::isspace(static_cast<unsigned char>(s[i]))) return i;
  }
  return len;
}

void finish_record(FastxFile* fx, std::string&& name, std::string&& seq,
                   std::string&& qual) {
  for (auto& c : seq) c = std::toupper(static_cast<unsigned char>(c));
  if (!qual.empty()) {
    // all-'!' (Phred 0 everywhere) quality is treated as absent
    // (reference: src/sequence.cpp:34-42)
    uint64_t sum = 0;
    for (unsigned char c : qual) sum += c - '!';
    if (sum == 0) qual.clear();
  }
  fx->records.push_back({std::move(name), std::move(seq), std::move(qual)});
}

}  // namespace

extern "C" {

void* fastx_parse(const char* path, int shorten_names) {
  auto* fx = new FastxFile();
  std::string data;
  if (!read_all(path, &data, &fx->error)) {
    return fx;
  }
  size_t i = 0;
  const size_t n = data.size();
  auto next_line = [&](size_t* b, size_t* e) -> bool {
    if (i >= n) return false;
    *b = i;
    while (i < n && data[i] != '\n') ++i;
    *e = i;
    if (*e > *b && data[*e - 1] == '\r') --(*e);
    if (i < n) ++i;  // skip newline
    return true;
  };

  size_t b, e;
  if (n == 0) return fx;
  const char mode = data[0];
  if (mode == '>') {
    std::string name, seq;
    while (next_line(&b, &e)) {
      if (e > b && data[b] == '>') {
        if (!name.empty()) {
          finish_record(fx, std::move(name), std::move(seq), std::string());
          name.clear();
          seq.clear();
        }
        size_t len = e - b - 1;
        size_t nl = shorten_names ? shorten(&data[b + 1], len) : len;
        name.assign(&data[b + 1], nl);
      } else {
        seq.append(&data[b], e - b);
      }
    }
    if (!name.empty()) {
      finish_record(fx, std::move(name), std::move(seq), std::string());
    }
  } else if (mode == '@') {
    while (next_line(&b, &e)) {
      if (e == b) continue;
      if (data[b] != '@') {
        fx->error = "malformed FASTQ";
        break;
      }
      size_t len = e - b - 1;
      size_t nl = shorten_names ? shorten(&data[b + 1], len) : len;
      std::string name(&data[b + 1], nl);
      std::string seq, qual;
      // sequence lines until '+'
      while (next_line(&b, &e)) {
        if (e > b && data[b] == '+') break;
        seq.append(&data[b], e - b);
      }
      // quality lines until length matches
      while (qual.size() < seq.size() && next_line(&b, &e)) {
        qual.append(&data[b], e - b);
      }
      if (qual.size() != seq.size()) {
        fx->error = "truncated FASTQ record";
        break;
      }
      finish_record(fx, std::move(name), std::move(seq), std::move(qual));
    }
  } else {
    fx->error = "invalid FASTA/FASTQ file";
  }
  return fx;
}

const char* fastx_error(void* h) {
  auto* fx = static_cast<FastxFile*>(h);
  return fx->error.empty() ? nullptr : fx->error.c_str();
}

long fastx_count(void* h) {
  return static_cast<FastxFile*>(h)->records.size();
}

long fastx_name(void* h, long i, const char** ptr) {
  auto& r = static_cast<FastxFile*>(h)->records[i];
  *ptr = r.name.data();
  return r.name.size();
}

long fastx_seq(void* h, long i, const char** ptr) {
  auto& r = static_cast<FastxFile*>(h)->records[i];
  *ptr = r.seq.data();
  return r.seq.size();
}

long fastx_qual(void* h, long i, const char** ptr) {
  auto& r = static_cast<FastxFile*>(h)->records[i];
  *ptr = r.qual.data();
  return r.qual.size();
}

void fastx_free(void* h) { delete static_cast<FastxFile*>(h); }

}  // extern "C"

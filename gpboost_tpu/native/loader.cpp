// Native data loader for gpboost-tpu.
//
// TPU-native counterpart of the reference's C++ IO layer
// (src/LightGBM/io/parser.cpp CSV/TSV parsing, dataset_loader.cpp): the
// compute path is JAX/XLA, but data ingestion stays native — multithreaded
// CSV/TSV parsing straight into a dense double matrix handed to numpy via
// ctypes (zero-copy on the Python side).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread loader.cpp -o libgpbloader.so

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <charconv>
#include <fstream>
#include <string>
#include <thread>
#include <vector>
#include <cmath>

namespace {

// parse one line into out[0..ncol); returns number of fields parsed
static int parse_line(const char* p, const char* end, char sep, double* out,
                      int max_cols) {
  int col = 0;
  while (p < end && col < max_cols) {
    // skip leading spaces
    while (p < end && (*p == ' ' || *p == '\t' && sep != '\t')) ++p;
    const char* field_end = p;
    while (field_end < end && *field_end != sep) ++field_end;
    double v = std::nan("");
    if (field_end > p) {
      // std::from_chars for double (GCC >= 11)
      auto res = std::from_chars(p, field_end, v);
      if (res.ec != std::errc()) {
        // fallback strtod (handles leading '+', 'nan', 'inf' spellings)
        char buf[64];
        size_t len = std::min<size_t>(field_end - p, 63);
        std::memcpy(buf, p, len);
        buf[len] = 0;
        v = std::strtod(buf, nullptr);
        if (v == 0.0 && buf[0] != '0' && buf[0] != '-' && buf[0] != '+'
            && buf[0] != '.')
          v = std::nan("");
      }
    }
    out[col++] = v;
    p = field_end + 1;
  }
  return col;
}

}  // namespace

extern "C" {

// Parse a delimited numeric file. Returns a malloc'd row-major [rows, cols]
// double array (caller frees with gpb_free); rows/cols written to out params.
// sep == 0 -> auto-detect ('\t' if present in the first line, else ',').
double* gpb_parse_csv(const char* path, char sep, int has_header,
                      int64_t* out_rows, int64_t* out_cols,
                      int num_threads) {
  *out_rows = 0;
  *out_cols = 0;
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) return nullptr;
  const std::streamsize size = f.tellg();
  f.seekg(0);
  std::string buf(static_cast<size_t>(size), '\0');
  if (!f.read(buf.data(), size)) return nullptr;

  // index line starts
  std::vector<size_t> starts;
  starts.reserve(1 << 16);
  starts.push_back(0);
  for (size_t i = 0; i < buf.size(); ++i)
    if (buf[i] == '\n' && i + 1 < buf.size()) starts.push_back(i + 1);
  // drop empty trailing line
  while (!starts.empty() && starts.back() >= buf.size()) starts.pop_back();

  size_t first = has_header ? 1 : 0;
  if (starts.size() <= first) return nullptr;

  // detect separator + column count from the first data line
  size_t l0 = starts[first];
  size_t l0_end = buf.find('\n', l0);
  if (l0_end == std::string::npos) l0_end = buf.size();
  if (sep == 0)
    sep = (buf.find('\t', l0) < l0_end) ? '\t' : ',';
  int ncol = 1;
  for (size_t i = l0; i < l0_end; ++i)
    if (buf[i] == sep) ++ncol;

  const int64_t nrow = static_cast<int64_t>(starts.size() - first);
  double* out = static_cast<double*>(
      std::malloc(sizeof(double) * nrow * ncol));
  if (!out) return nullptr;

  int nt = num_threads > 0
               ? num_threads
               : static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  std::atomic<int64_t> bad_rows{0};
  auto worker = [&](int t) {
    for (int64_t r = t; r < nrow; r += nt) {
      size_t s = starts[first + r];
      size_t e = (first + r + 1 < starts.size()) ? starts[first + r + 1] - 1
                                                 : buf.size();
      // trim trailing \r
      while (e > s && (buf[e - 1] == '\r' || buf[e - 1] == '\n')) --e;
      int got = parse_line(buf.data() + s, buf.data() + e, sep,
                           out + r * ncol, ncol);
      for (int c = got; c < ncol; ++c) out[r * ncol + c] = std::nan("");
      if (got != ncol) bad_rows.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 1; t < nt; ++t) threads.emplace_back(worker, t);
  worker(0);
  for (auto& th : threads) th.join();

  *out_rows = nrow;
  *out_cols = ncol;
  return out;
}

void gpb_free(double* p) { std::free(p); }

}  // extern "C"

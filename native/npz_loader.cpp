// Native sequence loader for CaSPR frame archives (.npz).
//
// The reference leans on torch's native DataLoader machinery for input
// (reference caspr/train.py:91-101); this module is the framework's native
// IO path: a minimal ZIP/NPY reader plus the full per-sequence assembly of
// reference caspr/data/caspr_dataset.py:148-208 (blank-frame truncation,
// repeat-padding to the expected point count, NOCS [0,1] / world
// [0,max_timestamp] timestamp synthesis), multithreaded across frames.
//
// Supports STORED and DEFLATE zip entries (zlib), NPY v1/v2 little-endian
// float32/float64 payloads.  Bound via ctypes (no pybind11 in the image).

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Entry {
  std::string name;
  uint16_t method;
  uint64_t comp_size;
  uint64_t uncomp_size;
  uint64_t local_offset;
};

bool read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out.resize(n);
  size_t got = fread(out.data(), 1, n, f);
  fclose(f);
  return got == static_cast<size_t>(n);
}

uint16_t rd16(const uint8_t* p) { uint16_t v; memcpy(&v, p, 2); return v; }
uint32_t rd32(const uint8_t* p) { uint32_t v; memcpy(&v, p, 4); return v; }

// Parse the central directory of an in-memory zip.
bool parse_zip(const std::vector<uint8_t>& buf, std::vector<Entry>& entries) {
  if (buf.size() < 22) return false;
  // find EOCD (scan back over possible comment)
  size_t eocd = std::string::npos;
  size_t start = buf.size() >= 22 + 65535 ? buf.size() - 22 - 65535 : 0;
  for (size_t i = buf.size() - 22; i + 1 > start; --i) {
    if (rd32(&buf[i]) == 0x06054b50) {
      eocd = i;
      break;
    }
    if (i == 0) break;
  }
  if (eocd == std::string::npos) return false;
  uint16_t count = rd16(&buf[eocd + 10]);
  uint32_t cd_off = rd32(&buf[eocd + 16]);
  size_t p = cd_off;
  for (int i = 0; i < count; ++i) {
    if (p + 46 > buf.size() || rd32(&buf[p]) != 0x02014b50) return false;
    Entry e;
    e.method = rd16(&buf[p + 10]);
    e.comp_size = rd32(&buf[p + 20]);
    e.uncomp_size = rd32(&buf[p + 24]);
    uint16_t name_len = rd16(&buf[p + 28]);
    uint16_t extra_len = rd16(&buf[p + 30]);
    uint16_t comment_len = rd16(&buf[p + 32]);
    e.local_offset = rd32(&buf[p + 42]);
    e.name.assign(reinterpret_cast<const char*>(&buf[p + 46]), name_len);
    if (e.comp_size == 0xFFFFFFFFu || e.local_offset == 0xFFFFFFFFu)
      return false;  // ZIP64 unsupported (frame files are small)
    entries.push_back(std::move(e));
    p += 46 + name_len + extra_len + comment_len;
  }
  return true;
}

// Decompress/locate entry payload.
bool entry_payload(const std::vector<uint8_t>& buf, const Entry& e,
                   std::vector<uint8_t>& out) {
  size_t p = e.local_offset;
  if (p + 30 > buf.size() || rd32(&buf[p]) != 0x04034b50) return false;
  uint16_t name_len = rd16(&buf[p + 26]);
  uint16_t extra_len = rd16(&buf[p + 28]);
  size_t data = p + 30 + name_len + extra_len;
  if (data + e.comp_size > buf.size()) return false;
  if (e.method == 0) {
    out.assign(buf.begin() + data, buf.begin() + data + e.comp_size);
    return true;
  }
  if (e.method == 8) {
    out.resize(e.uncomp_size);
    z_stream zs{};
    inflateInit2(&zs, -MAX_WBITS);
    zs.next_in = const_cast<uint8_t*>(&buf[data]);
    zs.avail_in = e.comp_size;
    zs.next_out = out.data();
    zs.avail_out = out.size();
    int rc = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    return rc == Z_STREAM_END || (rc == Z_OK && zs.avail_out == 0);
  }
  return false;
}

// Parse an NPY payload into doubles. Returns rank in *rank, dims in dims[4].
bool parse_npy(const std::vector<uint8_t>& npy, std::vector<double>& vals,
               int* rank, int64_t dims[4]) {
  if (npy.size() < 10 || memcmp(npy.data(), "\x93NUMPY", 6) != 0) return false;
  uint8_t major = npy[6];
  size_t header_len, header_off;
  if (major == 1) {
    header_len = rd16(&npy[8]);
    header_off = 10;
  } else {
    header_len = rd32(&npy[8]);
    header_off = 12;
  }
  std::string hdr(reinterpret_cast<const char*>(&npy[header_off]), header_len);

  auto find_val = [&](const char* key) -> std::string {
    size_t k = hdr.find(key);
    if (k == std::string::npos) return "";
    size_t c = hdr.find(':', k);
    size_t e = hdr.find(',', c);
    // shape tuples contain commas; handle separately
    return hdr.substr(c + 1, e - c - 1);
  };

  std::string descr = find_val("'descr'");
  bool f8 = descr.find("<f8") != std::string::npos;
  bool f4 = descr.find("<f4") != std::string::npos;
  if (!f8 && !f4) return false;
  if (hdr.find("'fortran_order': True") != std::string::npos) return false;

  size_t sh = hdr.find("'shape'");
  size_t lp = hdr.find('(', sh);
  size_t rp = hdr.find(')', lp);
  std::string shape_str = hdr.substr(lp + 1, rp - lp - 1);
  *rank = 0;
  int64_t total = 1;
  {
    const char* s = shape_str.c_str();
    char* end = nullptr;
    while (*rank < 4) {
      long long v = strtoll(s, &end, 10);
      if (end == s) break;
      dims[(*rank)++] = v;
      total *= v;
      s = end;
      while (*s == ',' || *s == ' ') ++s;
    }
    if (*rank == 0) total = 0;
  }

  size_t data_off = header_off + header_len;
  size_t elem = f8 ? 8 : 4;
  if (npy.size() < data_off + total * elem) return false;
  vals.resize(total);
  if (f8) {
    memcpy(vals.data(), &npy[data_off], total * 8);
  } else {
    const float* src = reinterpret_cast<const float*>(&npy[data_off]);
    for (int64_t i = 0; i < total; ++i) vals[i] = src[i];
  }
  return true;
}

bool read_npz_entry(const char* path, const char* entry_name,
                    std::vector<double>& vals, int* rank, int64_t dims[4]) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return false;
  std::vector<Entry> entries;
  if (!parse_zip(buf, entries)) return false;
  std::string want = std::string(entry_name) + ".npy";
  for (const auto& e : entries) {
    if (e.name == want || e.name == entry_name) {
      std::vector<uint8_t> payload;
      if (!entry_payload(buf, e, payload)) return false;
      return parse_npy(payload, vals, rank, dims);
    }
  }
  return false;
}

// Load one frame into the sequence buffers (reference
// caspr_dataset.py:166-206 semantics).  Returns 1 on blank frame.
int load_frame(const char* path, int step_idx, int seq_len,
               int64_t expected_pts, double max_timestamp, double* nocs_seq,
               double* depth_seq, double* pose_seq) {
  std::vector<double> nocs, depth, pose;
  int rank;
  int64_t dims[4];
  if (!read_npz_entry(path, "nocs_data", nocs, &rank, dims)) return -1;
  int64_t n_nocs = rank >= 1 ? dims[0] : 0;
  if (!read_npz_entry(path, "depth_data", depth, &rank, dims)) return -1;
  int64_t n_depth = rank >= 1 ? dims[0] : 0;
  if (!read_npz_entry(path, "obj_T", pose, &rank, dims)) return -1;

  if (depth.empty()) {  // warping-cars: use NOCS as input
    depth = nocs;
    n_depth = n_nocs;
  }
  bool blank = true;
  for (double v : nocs)
    if (v != 0.0) {
      blank = false;
      break;
    }
  if (blank) return 1;

  if (pose.size() == 16) {
    memcpy(pose_seq + 16 * step_idx, pose.data(), 16 * sizeof(double));
  }

  double step_size = seq_len == 1 ? 0.0 : 1.0 / (seq_len - 1);
  double t_nocs = step_size * step_idx;
  double t_world = max_timestamp * t_nocs;

  double* nocs_row = nocs_seq + 4 * expected_pts * step_idx;
  double* depth_row = depth_seq + 4 * expected_pts * step_idx;
  for (int64_t i = 0; i < expected_pts; ++i) {
    int64_t si = n_nocs > 0 ? (i % n_nocs) : 0;  // repeat-pad short frames
    nocs_row[4 * i + 0] = nocs[3 * si + 0];
    nocs_row[4 * i + 1] = nocs[3 * si + 1];
    nocs_row[4 * i + 2] = nocs[3 * si + 2];
    nocs_row[4 * i + 3] = t_nocs;
    int64_t di = n_depth > 0 ? (i % n_depth) : 0;
    depth_row[4 * i + 0] = depth[3 * di + 0];
    depth_row[4 * i + 1] = depth[3 * di + 1];
    depth_row[4 * i + 2] = depth[3 * di + 2];
    depth_row[4 * i + 3] = t_world;
  }
  return 0;
}

}  // namespace

extern "C" {

// paths: concatenated NUL-terminated frame paths (seq_len of them).
// Buffers (callee fills): nocs/depth (seq_len, expected_pts, 4) f64,
// pose (seq_len, 4, 4) f64 — caller must zero-initialize.
// Returns 0 ok, <0 read error on frame (-idx-1).
int caspr_load_sequence(const char* paths, int seq_len, int64_t expected_pts,
                        double max_timestamp, int num_threads,
                        double* nocs_seq, double* depth_seq,
                        double* pose_seq) {
  std::vector<const char*> frame_paths(seq_len);
  const char* p = paths;
  for (int i = 0; i < seq_len; ++i) {
    frame_paths[i] = p;
    p += strlen(p) + 1;
  }

  std::vector<int> results(seq_len, 0);
  auto work = [&](int lo, int hi) {
    for (int i = lo; i < hi; ++i) {
      results[i] = load_frame(frame_paths[i], i, seq_len, expected_pts,
                              max_timestamp, nocs_seq, depth_seq, pose_seq);
    }
  };
  int nt = num_threads > 1 ? (num_threads < seq_len ? num_threads : seq_len) : 1;
  if (nt <= 1) {
    work(0, seq_len);
  } else {
    std::vector<std::thread> threads;
    int chunk = (seq_len + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
      int lo = t * chunk, hi = std::min(seq_len, lo + chunk);
      if (lo < hi) threads.emplace_back(work, lo, hi);
    }
    for (auto& th : threads) th.join();
  }

  // blank-frame truncation: the reference stops filling at the first blank
  // frame (remaining steps stay zero); frames AFTER a blank must be zeroed
  // since we loaded them in parallel.
  for (int i = 0; i < seq_len; ++i) {
    if (results[i] < 0) return -i - 1;
    if (results[i] == 1) {
      size_t row = 4 * expected_pts;
      memset(nocs_seq + row * i, 0, row * (seq_len - i) * sizeof(double));
      memset(depth_seq + row * i, 0, row * (seq_len - i) * sizeof(double));
      memset(pose_seq + 16 * i, 0, 16 * (seq_len - i) * sizeof(double));
      break;
    }
  }
  return 0;
}

}  // extern "C"

// Fast bottom-up-attention TSV decoder.
//
// Native replacement for the reference's per-row Python csv + base64 +
// numpy decode (reference src/utils.py:16-54 — "minutes of host time per
// run").  Streams the TSV once, base64-decodes the six payload columns
// directly into caller-provided packed arrays (the PackedFeatures layout
// of rgqa_tpu/data/tsv.py).
//
// C ABI only — loaded via ctypes (no pybind11 in this image).
//
// Row format (tab-separated):
//   img_id, img_h, img_w, objects_id(b64 i64), objects_conf(b64 f32),
//   attrs_id(b64 i64), attrs_conf(b64 f32), num_boxes,
//   boxes(b64 f32 x4), features(b64 f32 x feat_dim)

#include <cstddef>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

// Base64 decode table (-1 = invalid, -2 = padding).
int8_t B64[256];
struct B64Init {
  B64Init() {
    memset(B64, -1, sizeof(B64));
    const char* alphabet =
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
    for (int i = 0; i < 64; ++i) B64[(uint8_t)alphabet[i]] = (int8_t)i;
    B64[(uint8_t)'='] = -2;
  }
} b64_init;

// Decode base64 [src, src+len) into dst (capacity cap bytes).
// Returns decoded byte count, or -1 on error/overflow.
// Fast path: unrolled 4-chars -> 3-bytes quads (no per-char branching);
// the scalar tail handles padding / stray whitespace.
ptrdiff_t b64_decode(const char* src, size_t len, uint8_t* dst, size_t cap) {
  size_t out = 0;
  size_t i = 0;
  if (len >= 4) {
    size_t quads_end = len - 4;  // keep the final quad for the tail
    while (i <= quads_end && out + 3 <= cap) {
      int8_t a = B64[(uint8_t)src[i]], b = B64[(uint8_t)src[i + 1]];
      int8_t c = B64[(uint8_t)src[i + 2]], d = B64[(uint8_t)src[i + 3]];
      if ((a | b | c | d) < 0) break;  // padding/whitespace -> slow tail
      uint32_t acc = ((uint32_t)a << 18) | ((uint32_t)b << 12) |
                     ((uint32_t)c << 6) | (uint32_t)d;
      dst[out] = (uint8_t)(acc >> 16);
      dst[out + 1] = (uint8_t)(acc >> 8);
      dst[out + 2] = (uint8_t)acc;
      out += 3;
      i += 4;
    }
  }
  uint32_t acc = 0;
  int bits = 0;
  for (; i < len; ++i) {
    int8_t v = B64[(uint8_t)src[i]];
    if (v == -2) break;  // padding: done
    if (v < 0) continue; // skip whitespace
    acc = (acc << 6) | (uint32_t)v;
    bits += 6;
    if (bits >= 8) {
      bits -= 8;
      if (out >= cap) return (ptrdiff_t)out;  // stop cleanly at capacity
      dst[out++] = (uint8_t)(acc >> bits);
    }
  }
  return (ptrdiff_t)out;
}

struct Field {
  const char* p;
  size_t len;
};

// Split a line into 10 tab-separated fields. Returns false if malformed.
bool split_fields(char* line, size_t len, Field out[10]) {
  size_t start = 0;
  int f = 0;
  for (size_t i = 0; i <= len; ++i) {
    if (i == len || line[i] == '\t') {
      if (f >= 10) return false;
      out[f].p = line + start;
      out[f].len = i - start;
      ++f;
      start = i + 1;
    }
  }
  return f == 10;
}

long to_long(const Field& f) {
  return strtol(std::string(f.p, f.len).c_str(), nullptr, 10);
}

// Whole-file slurp (feature TSVs are scanned once; buffered fgetc is the
// bottleneck otherwise).
bool slurp(const char* path, std::vector<char>& buf) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  fseek(fp, 0, SEEK_END);
  long size = ftell(fp);
  fseek(fp, 0, SEEK_SET);
  buf.resize((size_t)size);
  size_t got = size ? fread(buf.data(), 1, (size_t)size, fp) : 0;
  fclose(fp);
  return got == (size_t)size;
}

}  // namespace

extern "C" {

// Count data rows in the TSV (for array preallocation).
long long rgqa_tsv_count_rows(const char* path) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  long long rows = 0;
  int c, prev = '\n';
  bool any = false;
  while ((c = fgetc(fp)) != EOF) {
    if (c == '\n') ++rows;
    any = true;
    prev = c;
  }
  if (any && prev != '\n') ++rows;  // unterminated final line
  fclose(fp);
  return rows;
}

// Decode up to `topk` rows (<=0: all) into the packed output arrays.
//
// features:      (rows, num_boxes, feat_dim) f32
// boxes:         (rows, num_boxes, 4) f32
// objects_id:    (rows, num_boxes) i64      objects_conf: f32
// attrs_id:      (rows, num_boxes) i64      attrs_conf:   f32
// sizes:         (rows, 2) i32 (img_h, img_w)
// img_ids:       bytes buffer, ids separated by '\n' (cap img_ids_cap)
//
// Rows with more boxes than num_boxes are truncated; fewer are
// zero-padded.  Returns rows decoded, or -errno-style negative on error.
long long rgqa_tsv_decode(
    const char* path, long long topk, int num_boxes, int feat_dim,
    float* features, float* boxes,
    int64_t* objects_id, float* objects_conf,
    int64_t* attrs_id, float* attrs_conf,
    int32_t* sizes, char* img_ids, long long img_ids_cap) {
  std::vector<char> content;
  if (!slurp(path, content)) return -1;

  std::vector<uint8_t> scratch;
  long long row = 0;
  long long ids_off = 0;
  size_t pos = 0;
  const size_t total = content.size();

  while ((topk <= 0 || row < topk) && pos < total) {
    size_t eol = pos;
    while (eol < total && content[eol] != '\n') ++eol;
    char* line_p = content.data() + pos;
    size_t line_len = eol - pos;
    pos = eol + 1;
    if (line_len == 0) continue;
    Field f[10];
    if (!split_fields(line_p, line_len, f)) { return -2; }

    long n = to_long(f[7]);  // num_boxes in this row
    if (n <= 0) { return -3; }
    long k = n < num_boxes ? n : num_boxes;

    // img_id + sizes
    if (ids_off + (long long)f[0].len + 1 > img_ids_cap) { return -4; }
    memcpy(img_ids + ids_off, f[0].p, f[0].len);
    ids_off += f[0].len;
    img_ids[ids_off++] = '\n';
    sizes[row * 2 + 0] = (int32_t)to_long(f[1]);
    sizes[row * 2 + 1] = (int32_t)to_long(f[2]);

    // Helper: decode payload column `fi` straight into the packed array,
    // truncating at k boxes (b64_decode stops at capacity — no scratch
    // buffer, no extra memcpy).
    auto decode_into = [&](int fi, size_t elem, long width,
                           void* dst_row, size_t) -> bool {
      size_t want = (size_t)k * elem * (size_t)width;
      ptrdiff_t got = b64_decode(
          f[fi].p, f[fi].len, (uint8_t*)dst_row, want);
      return got >= 0 && (size_t)got == want;
    };
    (void)scratch;

    if (!decode_into(3, 8, 1, objects_id + row * num_boxes, 0) ||
        !decode_into(4, 4, 1, objects_conf + row * num_boxes, 0) ||
        !decode_into(5, 8, 1, attrs_id + row * num_boxes, 0) ||
        !decode_into(6, 4, 1, attrs_conf + row * num_boxes, 0) ||
        !decode_into(8, 4, 4, boxes + (size_t)row * num_boxes * 4, 0) ||
        !decode_into(9, 4, feat_dim,
                     features + (size_t)row * num_boxes * feat_dim, 0)) {
      return -5;
    }
    ++row;
  }
  return row;
}

}  // extern "C"

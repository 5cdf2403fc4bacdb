// fuzz_driver.cpp — ASan/UBSan harness for the native bitstream decoder.
//
// tests/test_native_fuzz.py generates hostile inputs (bit-flipped payloads,
// truncations, random garbage, corrupt canonical tables) as little-endian
// case files and runs this driver, built with -fsanitize=address,undefined,
// against dctbits_verify_stripes + dctbits_unpack_stripes. The contract
// under arbitrary input: no crash, no hang, no out-of-bounds access —
// corruption is either detected (nonzero per-stripe status) or decodes to
// garbage coefficients; both are acceptable, aborting is not.
//
// Case file layout (little-endian):
//   u32 magic 'DFZ1'
//   i32 n_stripes, bps, n2, mode, table_size, run_table_size, vmin
//   u8  table_lengths[table_size]
//   u8  run_lengths[run_table_size]
//   u32 expected_bits[n_stripes]
//   u64 offsets[n_stripes + 1]
//   u8  blob[offsets[n_stripes]]
//
// The reference's only decode bounds check lives at
// /root/reference/src/entropy.c:349; this library must hold up with none of
// the reference's implicit trusted-input assumptions.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
int dctbits_unpack_stripes(const uint8_t*, const uint64_t*, int, int, int,
                           int, const uint8_t*, int, const uint8_t*, int, int,
                           int16_t*, int);
int dctbits_verify_stripes(const uint8_t*, const uint64_t*, int, int, int,
                           int, const uint8_t*, int, const uint8_t*, int, int,
                           const uint32_t*, int32_t*, int);
}

namespace {

template <typename T>
bool read_exact(FILE* f, T* out, size_t n) {
  return fread(out, sizeof(T), n, f) == n;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 2) {
    fprintf(stderr, "usage: %s case.bin\n", argv[0]);
    return 2;
  }
  FILE* f = fopen(argv[1], "rb");
  if (!f) {
    perror("fopen");
    return 2;
  }
  uint32_t magic = 0;
  int32_t hdr[7];
  if (!read_exact(f, &magic, 1) || magic != 0x315A4644u ||  // 'DFZ1'
      !read_exact(f, hdr, 7)) {
    fprintf(stderr, "bad header\n");
    fclose(f);
    return 2;
  }
  const int n_stripes = hdr[0], bps = hdr[1], n2 = hdr[2], mode = hdr[3];
  const int table_size = hdr[4], run_table_size = hdr[5], vmin = hdr[6];
  // harness sanity bounds — this validates TEST CASES, not the library;
  // the library under test receives whatever passes these caps verbatim
  if (n_stripes < 1 || n_stripes > 4096 || bps < 1 || bps > (1 << 20) ||
      n2 < 1 || n2 > 1024 || mode < 0 || mode > 2 || table_size < 0 ||
      table_size > 4096 || run_table_size < 0 || run_table_size > 4096) {
    fprintf(stderr, "header out of harness bounds\n");
    fclose(f);
    return 2;
  }
  std::vector<uint8_t> table_lengths(table_size ? table_size : 1, 0);
  std::vector<uint8_t> run_lengths(run_table_size ? run_table_size : 1, 0);
  std::vector<uint32_t> expected_bits(n_stripes, 0);
  std::vector<uint64_t> offsets(n_stripes + 1, 0);
  if ((table_size && !read_exact(f, table_lengths.data(), table_size)) ||
      (run_table_size &&
       !read_exact(f, run_lengths.data(), run_table_size)) ||
      !read_exact(f, expected_bits.data(), n_stripes) ||
      !read_exact(f, offsets.data(), n_stripes + 1)) {
    fprintf(stderr, "truncated case\n");
    fclose(f);
    return 2;
  }
  for (int s = 0; s < n_stripes; ++s) {
    if (offsets[s + 1] < offsets[s] || offsets[s + 1] > (1ull << 32)) {
      fprintf(stderr, "bad offsets\n");
      fclose(f);
      return 2;
    }
  }
  std::vector<uint8_t> blob(offsets[n_stripes] ? offsets[n_stripes] : 1, 0);
  if (offsets[n_stripes] &&
      !read_exact(f, blob.data(), offsets[n_stripes])) {
    fprintf(stderr, "truncated blob\n");
    fclose(f);
    return 2;
  }
  fclose(f);

  std::vector<int32_t> status(n_stripes, 0);
  dctbits_verify_stripes(blob.data(), offsets.data(), n_stripes, bps, n2,
                         mode, table_lengths.data(), table_size,
                         run_lengths.data(), run_table_size, vmin,
                         expected_bits.data(), status.data(), 2);
  std::vector<int16_t> out((size_t)n_stripes * bps * n2, 0);
  int rc = dctbits_unpack_stripes(
      blob.data(), offsets.data(), n_stripes, bps, n2, mode,
      table_lengths.data(), table_size, run_lengths.data(), run_table_size,
      vmin, out.data(), 2);
  // report what happened so the test can assert detection behavior; any
  // sanitizer abort would have exited nonzero before reaching this line
  int64_t checksum = 0;
  for (int16_t v : out) checksum += v;
  printf("unpack_rc=%d checksum=%lld status=", rc, (long long)checksum);
  for (int s = 0; s < n_stripes; ++s)
    printf("%d%c", status[s], s + 1 == n_stripes ? '\n' : ',');
  return 0;
}

// Standalone profiling harness for the entropy stage: loads the blob
// written by tools/dump_bench_slices.py and loops dt_decode_picture_slices
// single-threaded so gprof/perf can attribute time inside the decoder.
//
// Build:  g++ -O3 -march=native -pg -std=c++17 -pthread \
//             entropy.cc recon.cc deblock.cc prof_main.cc -o /tmp/prof_ent
// Run:    /tmp/prof_ent /tmp/bench_slices.bin 50 && gprof /tmp/prof_ent
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

struct SliceParamsX {
  int64_t rbsp_off, rbsp_len, bit_off;
  int32_t first_mb, slice_qp, slice_type, cabac_init_idc;
  int32_t nref_l0, nref_l1;
};
struct PicParamsX {
  int32_t mb_w, mb_h, chroma_array_type, transform_8x8_mode_flag;
  int32_t bit_depth_luma, bit_depth_chroma, direct_8x8_inference_flag;
};
struct OutX {
  int32_t *kind, *qp_y, *cbp, *i16_mode, *chroma_mode, *modes4, *modes8;
  int32_t *luma4, *luma8, *luma_dc, *chroma_dc, *chroma_ac, *pcm_y, *pcm_c;
  int32_t* slice_id;
  int64_t* bin_count;
  int32_t *mb_type_code, *sub_mb_type, *ref_idx, *mvd, *transform8;
};
extern "C" int dt_decode_picture_slices(const uint8_t*, const SliceParamsX*,
                                        int32_t, PicParamsX, OutX, int32_t);
extern "C" int dt_abi_sizes(int32_t*, int32_t*, int32_t*);
#ifdef DT_RDTSC
extern "C" void dt_get_tsc(unsigned long long*);
#endif

// the *X structs mirror entropy.cc's ABI; verified at startup against
// dt_abi_sizes so layout drift fails loudly (advisor round-1 finding)
static bool check_abi() {
  int32_t sp = 0, pp = 0, out = 0;
  dt_abi_sizes(&sp, &pp, &out);
  if (sp != (int32_t)sizeof(SliceParamsX) ||
      pp != (int32_t)sizeof(PicParamsX) ||
      out != (int32_t)sizeof(OutX)) {
    fprintf(stderr, "ABI mismatch vs entropy.cc: sp %d/%zu pp %d/%zu out %d/%zu\n",
            sp, sizeof(SliceParamsX), pp, sizeof(PicParamsX), out,
            sizeof(OutX));
    return false;
  }
  return true;
}

int main(int argc, char** argv) {
  const char* path = argc > 1 ? argv[1] : "/tmp/bench_slices.bin";
  int iters = argc > 2 ? atoi(argv[2]) : 50;
  int nthreads = argc > 3 ? atoi(argv[3]) : 1;
  if (!check_abi()) return 2;
  FILE* f = fopen(path, "rb");
  if (!f) { perror("open"); return 1; }
  int32_t hdr[8];
  if (fread(hdr, 4, 8, f) != 8) return 1;
  int ns = hdr[0];
  PicParamsX pp{hdr[1], hdr[2], hdr[3], hdr[4], hdr[5], hdr[6], hdr[7]};
  std::vector<SliceParamsX> sp(ns);
  if (fread(sp.data(), sizeof(SliceParamsX), ns, f) != (size_t)ns) return 1;
  int64_t blob_len;
  if (fread(&blob_len, 8, 1, f) != 1) return 1;
  std::vector<uint8_t> rbsp(blob_len);
  if (fread(rbsp.data(), 1, blob_len, f) != (size_t)blob_len) return 1;
  fclose(f);

  int n = pp.mb_w * pp.mb_h;
  std::vector<int32_t> kind(n), qp_y(n), cbp(n), i16(n), cm(n), m4(n * 16),
      m8(n * 4), l4(n * 256), l8(n * 256), ldc(n * 16), cdc(n * 16),
      cac(n * 256), py(n * 256), pc(n * 128), sid(n), mtc(n), smt(n * 4),
      ri(n * 8), mvd(n * 64), t8(n);
  std::vector<int64_t> bc(ns);
  OutX o{kind.data(), qp_y.data(), cbp.data(), i16.data(), cm.data(),
         m4.data(), m8.data(), l4.data(), l8.data(), ldc.data(), cdc.data(),
         cac.data(), py.data(), pc.data(), sid.data(), bc.data(), mtc.data(),
         smt.data(), ri.data(), mvd.data(), t8.data()};
  for (int i = 0; i < iters; i++)
    dt_decode_picture_slices(rbsp.data(), sp.data(), ns, pp, o, nthreads);
  int64_t bins = 0;
  for (int k = 0; k < ns; k++) bins += bc[k];
  printf("iters=%d bins/frame=%lld\n", iters, (long long)bins);
#ifdef DT_RDTSC
  unsigned long long t[8]; dt_get_tsc(t);
  double per = (double)bins * iters;
  printf("tsc/bin: cbf=%.2f sig=%.2f levels=%.2f (sum=%.2f)\n",
         t[0]/per, t[1]/per, t[2]/per, (t[0]+t[1]+t[2])/per);
  printf("calls/frame: cbf=%.0f coded=%.0f  per-call cyc: cbf=%.1f sig=%.1f lev=%.1f\n",
         (double)t[4]/iters, (double)t[5]/iters, (double)t[0]/t[4], (double)t[1]/t[5], (double)t[2]/t[6]);
#endif
  return 0;
}

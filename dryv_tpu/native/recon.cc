// Native scalar intra reconstruction (CPU path).
//
// Mirror of dryv_tpu/refimpl (itself bit-exact vs libavcodec): inverse
// transforms (spec 8.5) + intra prediction (spec 8.3) + per-MB frame loop.
// Two uses: (a) CPU fallback decode path, (b) the single-threaded
// C++ full-decode baseline that stands in for the reference decoder's
// Rust CPU performance in bench.py (cargo is not available in this image;
// see BASELINE.md).
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

enum : int { KIND_I4 = 0, KIND_I8 = 1, KIND_I16 = 2, KIND_PCM = 3 };

struct ZPosR { int x, y; };
constexpr ZPosR kZ[16] = {
  {0,0},{1,0},{0,1},{1,1},{2,0},{3,0},{2,1},{3,1},
  {0,2},{1,2},{0,3},{1,3},{2,2},{3,2},{2,3},{3,3}};

const int kZig4[16] = {0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15};
const int kZig8[64] = {
  0,1,8,16,9,2,3,10,17,24,32,25,18,11,4,5,
  12,19,26,33,40,48,41,34,27,20,13,6,7,14,21,28,
  35,42,49,56,57,50,43,36,29,22,15,23,30,37,44,51,
  58,59,52,45,38,31,39,46,53,60,61,54,47,55,62,63};

// normAdjust tables (spec 8.5.9), flat-16 weight scale baked in
const int kV4[6][3] = {{10,16,13},{11,18,14},{13,20,16},
                       {14,23,18},{16,25,20},{18,29,23}};
const int kV8[6][6] = {{20,18,32,19,25,24},{22,19,35,21,28,26},
                       {26,23,42,24,33,31},{28,25,45,26,35,33},
                       {32,28,51,30,40,38},{36,32,58,34,46,43}};

int ls4(int m, int i, int j) {
  int cls = (i % 2 == 0 && j % 2 == 0) ? 0 : (i % 2 == 1 && j % 2 == 1) ? 1 : 2;
  return 16 * kV4[m][cls];
}
int ls8(int m, int i, int j) {
  int cls;
  if (i % 4 == 0 && j % 4 == 0) cls = 0;
  else if (i % 2 == 1 && j % 2 == 1) cls = 1;
  else if (i % 4 == 2 && j % 4 == 2) cls = 2;
  else if ((i % 4 == 0 && j % 2 == 1) || (i % 2 == 1 && j % 4 == 0)) cls = 3;
  else if ((i % 4 == 0 && j % 4 == 2) || (i % 4 == 2 && j % 4 == 0)) cls = 4;
  else cls = 5;
  return 16 * kV8[m][cls];
}

const int kQpcTab[22] = {29,30,31,32,32,33,34,34,35,35,36,36,37,
                         37,37,38,38,38,39,39,39,39};
int qpc_from_qpy(int qpy, int off) {
  int qpi = qpy + off;
  if (qpi < 0) qpi = 0;
  if (qpi > 51) qpi = 51;
  return qpi < 30 ? qpi : kQpcTab[qpi - 30];
}

void idct4(int64_t d[4][4], int64_t r[4][4]) {
  int64_t f[4][4];
  for (int i = 0; i < 4; i++) {
    int64_t e0 = d[i][0] + d[i][2], e1 = d[i][0] - d[i][2];
    int64_t e2 = (d[i][1] >> 1) - d[i][3], e3 = d[i][1] + (d[i][3] >> 1);
    f[i][0] = e0 + e3; f[i][1] = e1 + e2; f[i][2] = e1 - e2; f[i][3] = e0 - e3;
  }
  for (int j = 0; j < 4; j++) {
    int64_t g0 = f[0][j] + f[2][j], g1 = f[0][j] - f[2][j];
    int64_t g2 = (f[1][j] >> 1) - f[3][j], g3 = f[1][j] + (f[3][j] >> 1);
    r[0][j] = (g0 + g3 + 32) >> 6;
    r[1][j] = (g1 + g2 + 32) >> 6;
    r[2][j] = (g1 - g2 + 32) >> 6;
    r[3][j] = (g0 - g3 + 32) >> 6;
  }
}

void dequant4(const int32_t* raster, int qp, bool i16_shift, int64_t out[4][4],
              int64_t dc_override, bool has_dc) {
  for (int i = 0; i < 4; i++)
    for (int j = 0; j < 4; j++) {
      int64_t v = raster[i * 4 + j];
      int64_t d;
      if (qp >= 24) d = (v * ls4(qp % 6, i, j)) << (qp / 6 - 4);
      else d = (v * ls4(qp % 6, i, j) + (1 << (3 - qp / 6))) >> (4 - qp / 6);
      out[i][j] = d;
    }
  if (has_dc) out[0][0] = dc_override;
}

void idct8_stage(int64_t m[8][8], bool rows) {
  int64_t tmp[8];
  for (int i = 0; i < 8; i++) {
    int64_t c[8];
    for (int k = 0; k < 8; k++) c[k] = rows ? m[i][k] : m[k][i];
    int64_t e0 = c[0] + c[4];
    int64_t e1 = -c[3] + c[5] - c[7] - (c[7] >> 1);
    int64_t e2 = c[0] - c[4];
    int64_t e3 = c[1] + c[7] - c[3] - (c[3] >> 1);
    int64_t e4 = (c[2] >> 1) - c[6];
    int64_t e5 = -c[1] + c[7] + c[5] + (c[5] >> 1);
    int64_t e6 = c[2] + (c[6] >> 1);
    int64_t e7 = c[3] + c[5] + c[1] + (c[1] >> 1);
    int64_t f0 = e0 + e6, f1 = e1 + (e7 >> 2), f2 = e2 + e4;
    int64_t f3 = e3 + (e5 >> 2), f4 = e2 - e4, f5 = (e3 >> 2) - e5;
    int64_t f6 = e0 - e6, f7 = e7 - (e1 >> 2);
    tmp[0] = f0 + f7; tmp[1] = f2 + f5; tmp[2] = f4 + f3; tmp[3] = f6 + f1;
    tmp[4] = f6 - f1; tmp[5] = f4 - f3; tmp[6] = f2 - f5; tmp[7] = f0 - f7;
    for (int k = 0; k < 8; k++) { if (rows) m[i][k] = tmp[k]; else m[k][i] = tmp[k]; }
  }
}

struct Plane {
  uint8_t* p;
  int w, h, stride;
  int at(int x, int y) const { return p[y * stride + x]; }
  void set(int x, int y, int v) { p[y * stride + x] = (uint8_t)v; }
};

inline int clip255(int64_t v) { return v < 0 ? 0 : v > 255 ? 255 : (int)v; }

struct Recon {
  // dense inputs (same layout as native/entropy.py Out)
  const int32_t *kind, *qp_y, *cbp, *i16_mode, *chroma_mode;
  const int32_t *modes4, *modes8;
  const int32_t *luma4, *luma8, *luma_dc, *chroma_dc_lv, *chroma_ac;
  const int32_t *pcm_y, *pcm_c, *slice_id;
  int mb_w, mb_h, qp_off_cb, qp_off_cr;
  Plane Y, Cb, Cr;
  // availability maps
  const uint8_t* blk_done;  // internal
  uint8_t* blk_done_m;
  uint8_t* mb_done_m;

  bool luma_avail(int x, int y, int sid) const {
    if (x < 0 || y < 0 || x >= Y.w || y >= Y.h) return false;
    if (!blk_done_m[(y >> 2) * (mb_w * 4) + (x >> 2)]) return false;
    return slice_id[(y >> 4) * mb_w + (x >> 4)] == sid;
  }
  bool mb_avail(int mx, int my, int sid) const {
    if (mx < 0 || my < 0 || mx >= mb_w || my >= mb_h) return false;
    if (!mb_done_m[my * mb_w + mx]) return false;
    return slice_id[my * mb_w + mx] == sid;
  }

  // ---- predictors (spec 8.3) --------------------------------------
  void pred4(int mode, const int64_t* a, const int64_t* l, int64_t z,
             bool aa, bool ab, int64_t p[4][4]) {
    switch (mode) {
      case 0: for (int y=0;y<4;y++) for (int x=0;x<4;x++) p[y][x]=a[x]; break;
      case 1: for (int y=0;y<4;y++) for (int x=0;x<4;x++) p[y][x]=l[y]; break;
      case 2: {
        int64_t v;
        if (aa && ab) v = (a[0]+a[1]+a[2]+a[3]+l[0]+l[1]+l[2]+l[3]+4)>>3;
        else if (aa) v = (l[0]+l[1]+l[2]+l[3]+2)>>2;
        else if (ab) v = (a[0]+a[1]+a[2]+a[3]+2)>>2;
        else v = 128;
        for (int y=0;y<4;y++) for (int x=0;x<4;x++) p[y][x]=v;
        break; }
      case 3:
        for (int y=0;y<4;y++) for (int x=0;x<4;x++) {
          if (x==3 && y==3) p[y][x]=(a[6]+3*a[7]+2)>>2;
          else { int i=x+y; p[y][x]=(a[i]+2*a[i+1]+a[i+2]+2)>>2; }
        }
        break;
      case 4:
        for (int y=0;y<4;y++) for (int x=0;x<4;x++) {
          if (x>y){int i=x-y; int64_t s2=i>=2?a[i-2]:z; p[y][x]=(s2+2*a[i-1]+a[i]+2)>>2;}
          else if (x<y){int i=y-x; int64_t s2=i>=2?l[i-2]:z; p[y][x]=(s2+2*l[i-1]+l[i]+2)>>2;}
          else p[y][x]=(a[0]+2*z+l[0]+2)>>2;
        }
        break;
      case 5:
        for (int y=0;y<4;y++) for (int x=0;x<4;x++) {
          int zvr=2*x-y;
          if (zvr>=0 && zvr%2==0){int i=x-(y>>1); p[y][x]=((i==0?z:a[i-1])+a[i]+1)>>1;}
          else if (zvr>=0){int i=x-(y>>1); int64_t s0=i>=2?a[i-2]:z; int64_t s1=i>=1?a[i-1]:z; p[y][x]=(s0+2*s1+a[i]+2)>>2;}
          else if (zvr==-1) p[y][x]=(l[0]+2*z+a[0]+2)>>2;
          else {int64_t s3=y>=3?l[y-3]:z; p[y][x]=(l[y-1]+2*l[y-2]+s3+2)>>2;}
        }
        break;
      case 6:
        for (int y=0;y<4;y++) for (int x=0;x<4;x++) {
          int zhd=2*y-x;
          if (zhd>=0 && zhd%2==0){int i=y-(x>>1); p[y][x]=((i==0?z:l[i-1])+l[i]+1)>>1;}
          else if (zhd>=0){int i=y-(x>>1); int64_t s0=i>=2?l[i-2]:z; int64_t s1=i>=1?l[i-1]:z; p[y][x]=(s0+2*s1+l[i]+2)>>2;}
          else if (zhd==-1) p[y][x]=(a[0]+2*z+l[0]+2)>>2;
          else {int64_t s3=x>=3?a[x-3]:z; p[y][x]=(a[x-1]+2*a[x-2]+s3+2)>>2;}
        }
        break;
      case 7:
        for (int y=0;y<4;y++) for (int x=0;x<4;x++) {
          int i=x+(y>>1);
          if (y%2==0) p[y][x]=(a[i]+a[i+1]+1)>>1;
          else p[y][x]=(a[i]+2*a[i+1]+a[i+2]+2)>>2;
        }
        break;
      default:
        for (int y=0;y<4;y++) for (int x=0;x<4;x++) {
          int zhu=x+2*y;
          if (zhu<5 && zhu%2==0){int i=y+(x>>1); p[y][x]=(l[i]+l[i+1]+1)>>1;}
          else if (zhu<5){int i=y+(x>>1); p[y][x]=(l[i]+2*l[i+1]+l[i+2]+2)>>2;}
          else if (zhu==5) p[y][x]=(l[2]+3*l[3]+2)>>2;
          else p[y][x]=l[3];
        }
        break;
    }
  }

  void pred8(int mode, const int64_t* a, const int64_t* l, int64_t z,
             bool aa, bool ab, int64_t p[8][8]) {
    switch (mode) {
      case 0: for (int y=0;y<8;y++) for (int x=0;x<8;x++) p[y][x]=a[x]; break;
      case 1: for (int y=0;y<8;y++) for (int x=0;x<8;x++) p[y][x]=l[y]; break;
      case 2: {
        int64_t sa=0, sl=0;
        for (int i=0;i<8;i++){sa+=a[i]; sl+=l[i];}
        int64_t v;
        if (aa&&ab) v=(sa+sl+8)>>4; else if (aa) v=(sl+4)>>3;
        else if (ab) v=(sa+4)>>3; else v=128;
        for (int y=0;y<8;y++) for (int x=0;x<8;x++) p[y][x]=v;
        break; }
      case 3:
        for (int y=0;y<8;y++) for (int x=0;x<8;x++) {
          if (x==7&&y==7) p[y][x]=(a[14]+3*a[15]+2)>>2;
          else {int i=x+y; p[y][x]=(a[i]+2*a[i+1]+a[i+2]+2)>>2;}
        }
        break;
      case 4:
        for (int y=0;y<8;y++) for (int x=0;x<8;x++) {
          if (x>y){int i=x-y; int64_t s2=i>=2?a[i-2]:z; p[y][x]=(s2+2*a[i-1]+a[i]+2)>>2;}
          else if (x<y){int i=y-x; int64_t s2=i>=2?l[i-2]:z; int64_t s1=i>=1?l[i-1]:z; p[y][x]=(s2+2*s1+l[i]+2)>>2;}
          else p[y][x]=(a[0]+2*z+l[0]+2)>>2;
        }
        break;
      case 5:
        for (int y=0;y<8;y++) for (int x=0;x<8;x++) {
          int zvr=2*x-y;
          if (zvr>=0 && zvr%2==0){int i=x-(y>>1); p[y][x]=((i==0?z:a[i-1])+a[i]+1)>>1;}
          else if (zvr>=0){int i=x-(y>>1); int64_t s0=i>=2?a[i-2]:z; int64_t s1=i>=1?a[i-1]:z; p[y][x]=(s0+2*s1+a[i]+2)>>2;}
          else if (zvr==-1) p[y][x]=(l[0]+2*z+a[0]+2)>>2;
          else {int i=y-2*x; int64_t s3=i>=3?l[i-3]:z; p[y][x]=(l[i-1]+2*l[i-2]+s3+2)>>2;}
        }
        break;
      case 6:
        for (int y=0;y<8;y++) for (int x=0;x<8;x++) {
          int zhd=2*y-x;
          if (zhd>=0 && zhd%2==0){int i=y-(x>>1); p[y][x]=((i==0?z:l[i-1])+l[i]+1)>>1;}
          else if (zhd>=0){int i=y-(x>>1); int64_t s0=i>=2?l[i-2]:z; int64_t s1=i>=1?l[i-1]:z; p[y][x]=(s0+2*s1+l[i]+2)>>2;}
          else if (zhd==-1) p[y][x]=(a[0]+2*z+l[0]+2)>>2;
          else {int i=x-2*y; int64_t s3=i>=3?a[i-3]:z; p[y][x]=(a[i-1]+2*a[i-2]+s3+2)>>2;}
        }
        break;
      case 7:
        for (int y=0;y<8;y++) for (int x=0;x<8;x++) {
          int i=x+(y>>1);
          if (y%2==0) p[y][x]=(a[i]+a[i+1]+1)>>1;
          else p[y][x]=(a[i]+2*a[i+1]+a[i+2]+2)>>2;
        }
        break;
      default:
        for (int y=0;y<8;y++) for (int x=0;x<8;x++) {
          int zhu=x+2*y;
          if (zhu<13 && zhu%2==0){int i=y+(x>>1); p[y][x]=(l[i]+l[i+1]+1)>>1;}
          else if (zhu<13){int i=y+(x>>1); p[y][x]=(l[i]+2*l[i+1]+l[i+2]+2)>>2;}
          else if (zhu==13) p[y][x]=(l[6]+3*l[7]+2)>>2;
          else p[y][x]=l[7];
        }
        break;
    }
  }

  void recon_i4(int addr, int mx, int my, int sid) {
    int qp = qp_y[addr];
    for (int blk = 0; blk < 16; blk++) {
      int bx = mx * 4 + kZ[blk].x, by = my * 4 + kZ[blk].y;
      int x0 = bx * 4, y0 = by * 4;
      bool aa = luma_avail(x0 - 1, y0, sid);
      bool ab = luma_avail(x0, y0 - 1, sid);
      bool ac = luma_avail(x0 + 4, y0 - 1, sid);
      bool ad = luma_avail(x0 - 1, y0 - 1, sid);
      int64_t a[8] = {0}, l[4] = {0}, z = 0;
      if (ab) {
        for (int i = 0; i < 4; i++) a[i] = Y.at(x0 + i, y0 - 1);
        for (int i = 4; i < 8; i++)
          a[i] = ac ? Y.at(x0 + i, y0 - 1) : a[3];
      }
      if (aa) for (int i = 0; i < 4; i++) l[i] = Y.at(x0 - 1, y0 + i);
      if (ad) z = Y.at(x0 - 1, y0 - 1);
      int64_t d[4][4], r[4][4], p[4][4];
      dequant4(luma4 + ((int64_t)addr * 16 + blk) * 16, qp, false, d, 0, false);
      idct4(d, r);
      pred4(modes4[addr * 16 + blk], a, l, z, aa, ab, p);
      for (int i = 0; i < 4; i++)
        for (int j = 0; j < 4; j++)
          Y.set(x0 + j, y0 + i, clip255(p[i][j] + r[i][j]));
      blk_done_m[by * (mb_w * 4) + bx] = 1;
    }
  }

  void recon_i8(int addr, int mx, int my, int sid) {
    int qp = qp_y[addr];
    for (int blk = 0; blk < 4; blk++) {
      int x0 = mx * 16 + (blk & 1) * 8, y0 = my * 16 + (blk >> 1) * 8;
      bool aa = luma_avail(x0 - 1, y0, sid);
      bool ab = luma_avail(x0, y0 - 1, sid);
      bool ac = luma_avail(x0 + 8, y0 - 1, sid);
      bool ad = luma_avail(x0 - 1, y0 - 1, sid);
      int64_t a[16] = {0}, l[8] = {0}, z = 0;
      if (ab) {
        for (int i = 0; i < 8; i++) a[i] = Y.at(x0 + i, y0 - 1);
        for (int i = 8; i < 16; i++) a[i] = ac ? Y.at(x0 + i, y0 - 1) : a[7];
      }
      if (aa) for (int i = 0; i < 8; i++) l[i] = Y.at(x0 - 1, y0 + i);
      if (ad) z = Y.at(x0 - 1, y0 - 1);
      // filter (8.3.2.2.1)
      int64_t fa[16], fl[8], fz = z;
      std::memcpy(fa, a, sizeof(fa));
      std::memcpy(fl, l, sizeof(fl));
      if (ab) {
        fa[0] = ad ? (z + 2*a[0] + a[1] + 2) >> 2 : (3*a[0] + a[1] + 2) >> 2;
        for (int x = 1; x < 15; x++) fa[x] = (a[x-1] + 2*a[x] + a[x+1] + 2) >> 2;
        fa[15] = (a[14] + 3*a[15] + 2) >> 2;
      }
      if (ad) {
        if (aa && ab) fz = (a[0] + 2*z + l[0] + 2) >> 2;
        else if (ab) fz = (3*z + a[0] + 2) >> 2;
        else if (aa) fz = (3*z + l[0] + 2) >> 2;
      }
      if (aa) {
        fl[0] = ad ? (z + 2*l[0] + l[1] + 2) >> 2 : (3*l[0] + l[1] + 2) >> 2;
        for (int y = 1; y < 7; y++) fl[y] = (l[y-1] + 2*l[y] + l[y+1] + 2) >> 2;
        fl[7] = (l[6] + 3*l[7] + 2) >> 2;
      }
      // dequant + idct8 (coefficients arrive raster order)
      int64_t d[8][8];
      const int32_t* c = luma8 + ((int64_t)addr * 4 + blk) * 64;
      for (int i = 0; i < 8; i++)
        for (int j = 0; j < 8; j++) {
          int64_t v = c[i * 8 + j];
          if (qp >= 36) d[i][j] = (v * ls8(qp % 6, i, j)) << (qp / 6 - 6);
          else d[i][j] = (v * ls8(qp % 6, i, j) + (1 << (5 - qp / 6))) >> (6 - qp / 6);
        }
      idct8_stage(d, true);
      idct8_stage(d, false);
      int64_t p[8][8];
      pred8(modes8[addr * 4 + blk], fa, fl, fz, aa, ab, p);
      for (int i = 0; i < 8; i++)
        for (int j = 0; j < 8; j++)
          Y.set(x0 + j, y0 + i, clip255(p[i][j] + ((d[i][j] + 32) >> 6)));
      int bby = y0 / 4, bbx = x0 / 4;
      for (int i = 0; i < 2; i++)
        for (int j = 0; j < 2; j++)
          blk_done_m[(bby + i) * (mb_w * 4) + bbx + j] = 1;
    }
  }

  void recon_i16(int addr, int mx, int my, int sid) {
    int qp = qp_y[addr];
    int x0 = mx * 16, y0 = my * 16;
    bool aa = mb_avail(mx - 1, my, sid);
    bool ab = mb_avail(mx, my - 1, sid);
    bool ad = mb_avail(mx - 1, my - 1, sid);
    int64_t a[16] = {0}, l[16] = {0}, z = 0;
    if (ab) for (int i = 0; i < 16; i++) a[i] = Y.at(x0 + i, y0 - 1);
    if (aa) for (int i = 0; i < 16; i++) l[i] = Y.at(x0 - 1, y0 + i);
    if (ad) z = Y.at(x0 - 1, y0 - 1);
    int64_t pred[16][16];
    int mode = i16_mode[addr];
    if (mode == 0) {
      for (int y = 0; y < 16; y++) for (int x = 0; x < 16; x++) pred[y][x] = a[x];
    } else if (mode == 1) {
      for (int y = 0; y < 16; y++) for (int x = 0; x < 16; x++) pred[y][x] = l[y];
    } else if (mode == 2) {
      int64_t sa = 0, sl = 0;
      for (int i = 0; i < 16; i++) { sa += a[i]; sl += l[i]; }
      int64_t v = (aa && ab) ? (sa + sl + 16) >> 5 : aa ? (sl + 8) >> 4
                   : ab ? (sa + 8) >> 4 : 128;
      for (int y = 0; y < 16; y++) for (int x = 0; x < 16; x++) pred[y][x] = v;
    } else {
      int64_t hh = 0, vv = 0;
      for (int x = 0; x < 8; x++) hh += (x + 1) * (a[8 + x] - (x < 7 ? a[6 - x] : z));
      for (int y = 0; y < 8; y++) vv += (y + 1) * (l[8 + y] - (y < 7 ? l[6 - y] : z));
      int64_t b = (5 * hh + 32) >> 6, cc = (5 * vv + 32) >> 6;
      int64_t av = 16 * (a[15] + l[15]);
      for (int y = 0; y < 16; y++)
        for (int x = 0; x < 16; x++)
          pred[y][x] = clip255((av + b * (x - 7) + cc * (y - 7) + 16) >> 5);
    }
    // DC hadamard (levels arrive raster order)
    int64_t dcz[16];
    for (int k = 0; k < 16; k++) dcz[k] = luma_dc[(int64_t)addr * 16 + k];
    int64_t t[4][4], dcv[4][4];
    static const int H[4][4] = {{1,1,1,1},{1,1,-1,-1},{1,-1,-1,1},{1,-1,1,-1}};
    for (int i = 0; i < 4; i++)
      for (int j = 0; j < 4; j++) {
        int64_t s = 0;
        for (int k = 0; k < 4; k++)
          for (int mI = 0; mI < 4; mI++)
            s += (int64_t)H[i][k] * dcz[k * 4 + mI] * H[mI][j];
        int ls00 = ls4(qp % 6, 0, 0);
        if (qp >= 36) dcv[i][j] = (s * ls00) << (qp / 6 - 6);
        else dcv[i][j] = (s * ls00 + (1 << (5 - qp / 6))) >> (6 - qp / 6);
      }
    for (int blk = 0; blk < 16; blk++) {
      int bx = kZ[blk].x, by = kZ[blk].y;
      int64_t d[4][4], r[4][4];
      dequant4(luma4 + ((int64_t)addr * 16 + blk) * 16, qp, true, d,
               dcv[by][bx], true);
      idct4(d, r);
      for (int i = 0; i < 4; i++)
        for (int j = 0; j < 4; j++) {
          int yy = by * 4 + i, xx = bx * 4 + j;
          Y.set(x0 + xx, y0 + yy, clip255(pred[yy][xx] + r[i][j]));
        }
    }
    for (int i = 0; i < 4; i++)
      for (int j = 0; j < 4; j++)
        blk_done_m[(my * 4 + i) * (mb_w * 4) + mx * 4 + j] = 1;
  }

  void recon_chroma(int addr, int mx, int my, int sid) {
    int x0 = mx * 8, y0 = my * 8;
    bool aa = mb_avail(mx - 1, my, sid);
    bool ab = mb_avail(mx, my - 1, sid);
    bool ad = mb_avail(mx - 1, my - 1, sid);
    for (int ci = 0; ci < 2; ci++) {
      Plane& P = ci == 0 ? Cb : Cr;
      int qpc = qpc_from_qpy(qp_y[addr], ci == 0 ? qp_off_cb : qp_off_cr);
      int64_t a[8] = {0}, l[8] = {0}, z = 0;
      if (ab) for (int i = 0; i < 8; i++) a[i] = P.at(x0 + i, y0 - 1);
      if (aa) for (int i = 0; i < 8; i++) l[i] = P.at(x0 - 1, y0 + i);
      if (ad) z = P.at(x0 - 1, y0 - 1);
      int64_t pred[8][8];
      int mode = chroma_mode[addr];
      if (mode == 1) {
        for (int y = 0; y < 8; y++) for (int x = 0; x < 8; x++) pred[y][x] = l[y];
      } else if (mode == 2) {
        for (int y = 0; y < 8; y++) for (int x = 0; x < 8; x++) pred[y][x] = a[x];
      } else if (mode == 3) {
        int64_t hs = 0, vs = 0;
        for (int x = 0; x < 4; x++) hs += (x + 1) * (a[4 + x] - (x <= 2 ? a[2 - x] : z));
        for (int y = 0; y < 4; y++) vs += (y + 1) * (l[4 + y] - (y <= 2 ? l[2 - y] : z));
        int64_t b = (34 * hs + 32) >> 6, cc = (34 * vs + 32) >> 6;
        int64_t av = 16 * (a[7] + l[7]);
        for (int y = 0; y < 8; y++)
          for (int x = 0; x < 8; x++)
            pred[y][x] = clip255((av + b * (x - 3) + cc * (y - 3) + 16) >> 5);
      } else {
        for (int qy = 0; qy < 2; qy++)
          for (int qx = 0; qx < 2; qx++) {
            int64_t sa = 0, sl = 0;
            for (int i = 0; i < 4; i++) { sa += a[qx * 4 + i]; sl += l[qy * 4 + i]; }
            int64_t v;
            bool corner = (qx == 0 && qy == 0) || (qx == 1 && qy == 1);
            if (corner) {
              if (aa && ab) v = (sa + sl + 4) >> 3;
              else if (aa) v = (sl + 2) >> 2;
              else if (ab) v = (sa + 2) >> 2;
              else v = 128;
            } else if (qx == 1) {
              v = ab ? (sa + 2) >> 2 : aa ? (sl + 2) >> 2 : 128;
            } else {
              v = aa ? (sl + 2) >> 2 : ab ? (sa + 2) >> 2 : 128;
            }
            for (int y = 0; y < 4; y++)
              for (int x = 0; x < 4; x++)
                pred[qy * 4 + y][qx * 4 + x] = v;
          }
      }
      // chroma DC 2x2
      const int32_t* dcl = chroma_dc_lv + ((int64_t)addr * 2 + ci) * 8;
      int64_t f00 = dcl[0] + dcl[1] + dcl[2] + dcl[3];
      int64_t f01 = dcl[0] - dcl[1] + dcl[2] - dcl[3];
      int64_t f10 = dcl[0] + dcl[1] - dcl[2] - dcl[3];
      int64_t f11 = dcl[0] - dcl[1] - dcl[2] + dcl[3];
      int ls00 = ls4(qpc % 6, 0, 0);
      int64_t dcv[4] = {
        ((f00 * ls00) << (qpc / 6)) >> 5, ((f01 * ls00) << (qpc / 6)) >> 5,
        ((f10 * ls00) << (qpc / 6)) >> 5, ((f11 * ls00) << (qpc / 6)) >> 5};
      for (int j = 0; j < 4; j++) {
        int bx = j & 1, by = j >> 1;
        int64_t d[4][4], r[4][4];
        dequant4(chroma_ac + (((int64_t)addr * 2 + ci) * 8 + j) * 16, qpc,
                 true, d, dcv[j], true);
        idct4(d, r);
        for (int i = 0; i < 4; i++)
          for (int jj = 0; jj < 4; jj++)
            P.set(x0 + bx * 4 + jj, y0 + by * 4 + i,
                  clip255(pred[by * 4 + i][bx * 4 + jj] + r[i][jj]));
      }
    }
  }

  void run() {
    int n = mb_w * mb_h;
    for (int addr = 0; addr < n; addr++) {
      int mx = addr % mb_w, my = addr / mb_w;
      int sid = slice_id[addr];
      int k = kind[addr];
      if (k == KIND_PCM) {
        for (int i = 0; i < 16; i++)
          for (int j = 0; j < 16; j++)
            Y.set(mx * 16 + j, my * 16 + i, pcm_y[(int64_t)addr * 256 + i * 16 + j]);
        for (int i = 0; i < 8; i++)
          for (int j = 0; j < 8; j++) {
            Cb.set(mx * 8 + j, my * 8 + i, pcm_c[(int64_t)addr * 128 + i * 8 + j]);
            Cr.set(mx * 8 + j, my * 8 + i, pcm_c[(int64_t)addr * 128 + 64 + i * 8 + j]);
          }
        for (int i = 0; i < 4; i++)
          for (int j = 0; j < 4; j++)
            blk_done_m[(my * 4 + i) * (mb_w * 4) + mx * 4 + j] = 1;
        mb_done_m[addr] = 1;
        continue;
      }
      if (k == KIND_I16) recon_i16(addr, mx, my, sid);
      else if (k == KIND_I8) recon_i8(addr, mx, my, sid);
      else recon_i4(addr, mx, my, sid);
      recon_chroma(addr, mx, my, sid);
      mb_done_m[addr] = 1;
    }
  }
};

}  // namespace

extern "C" {

// Reconstruct a 4:2:0 8-bit intra picture from the dense entropy outputs.
int dt_reconstruct_islices(
    const int32_t* kind, const int32_t* qp_y, const int32_t* cbp,
    const int32_t* i16_mode, const int32_t* chroma_mode,
    const int32_t* modes4, const int32_t* modes8, const int32_t* luma4,
    const int32_t* luma8, const int32_t* luma_dc, const int32_t* chroma_dc,
    const int32_t* chroma_ac, const int32_t* pcm_y, const int32_t* pcm_c,
    const int32_t* slice_id, int32_t mb_w, int32_t mb_h, int32_t qp_off_cb,
    int32_t qp_off_cr, uint8_t* out_y, uint8_t* out_cb, uint8_t* out_cr) {
  Recon r;
  r.kind = kind; r.qp_y = qp_y; r.cbp = cbp; r.i16_mode = i16_mode;
  r.chroma_mode = chroma_mode; r.modes4 = modes4; r.modes8 = modes8;
  r.luma4 = luma4; r.luma8 = luma8; r.luma_dc = luma_dc;
  r.chroma_dc_lv = chroma_dc; r.chroma_ac = chroma_ac;
  r.pcm_y = pcm_y; r.pcm_c = pcm_c; r.slice_id = slice_id;
  r.mb_w = mb_w; r.mb_h = mb_h;
  r.qp_off_cb = qp_off_cb; r.qp_off_cr = qp_off_cr;
  int W = mb_w * 16, H = mb_h * 16;
  r.Y = {out_y, W, H, W};
  r.Cb = {out_cb, W / 2, H / 2, W / 2};
  r.Cr = {out_cr, W / 2, H / 2, W / 2};
  std::vector<uint8_t> blk_done(mb_w * 4 * mb_h * 4, 0);
  std::vector<uint8_t> mb_done(mb_w * mb_h, 0);
  r.blk_done_m = blk_done.data();
  r.mb_done_m = mb_done.data();
  r.run();
  return 0;
}

}  // extern "C"

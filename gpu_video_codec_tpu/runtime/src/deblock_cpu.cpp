// Native CPU runtime for gpu_video_codec_tpu.
//
// Role in the framework: the host-side execution backend -- the equivalent of
// the reference's OpenMP CPU path (hevc_deblocking_filter_cpu.h:134-993,
// driven by ExecuteCpu, main.cu:36-83) -- plus fast layout transforms for the
// streaming pipeline (plane <-> tile-planes packing).
//
// This is a from-scratch implementation of the same edge-filter semantics the
// JAX/Pallas paths implement, organized around this framework's own
// tile-geometry abstraction (a single coordinate map per edge phase) rather
// than the reference's 32-pointer-per-segment enumeration.  Semantics match
// the golden model bit-for-bit, including the documented quirk decisions:
// out-of-bounds boundary-strength reads are defined as 0 (Q2), padding is
// zero-initialized (Q6), the right-horizontal P/Q column mismatch (Q3) and
// the intra-tile phase order (Q7) are preserved.
//
// Exposed as a plain C ABI consumed via ctypes (runtime/native.py).

#include <cstdint>
#include <cstring>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int kBlock = 8;

// QP -> beta / tC lookup (HEVC spec constants; cpu.h:1021-1033 in the ref).
constexpr int kBeta[52] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24,
    26, 28, 30, 32, 34, 36, 38, 40, 42, 44, 46, 48, 50, 52, 54, 56,
    58, 60, 62, 64};
constexpr int kTc[52] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3,
    3, 3, 3, 4, 4, 4, 5, 5, 6, 6, 7, 8, 9, 10, 11, 13,
    14, 16, 18, 20};

inline int get_beta(int qp) { return kBeta[qp > 51 ? 51 : qp]; }
inline int get_tc(int qp) { return kTc[qp > 51 ? 51 : qp]; }

inline int clip1(int d, int c) { return std::min(std::max(-c, d), c); }
inline int clip2(int v) { return std::min(std::max(0, v), 255); }

// Tile-local (row, col) of the P/Q pixel at filter row r, edge distance j,
// per phase.  Phases: 0 upper-vert, 1 lower-vert, 2 left-hor, 3 right-hor.
// Same geometry table as ops/deblock.py `_SEGMENT_GEOMETRY`.
inline void p_coord(int phase, int r, int j, int &row, int &col) {
  switch (phase) {
    case 0: row = r;     col = 3 - j; break;
    case 1: row = 4 + r; col = 3 - j; break;
    case 2: row = 3 - j; col = r;     break;
    default: row = 3 - j; col = 4 + r; break;  // Q3: P from cols 4..7
  }
}
inline void q_coord(int phase, int r, int j, int &row, int &col) {
  switch (phase) {
    case 0: row = r;     col = 4 + j; break;
    case 1: row = 4 + r; col = 4 + j; break;
    default: row = 4 + j; col = r;    break;   // phases 2 and 3 share Q cols 0..3
  }
}

struct PlaneView {
  uint8_t *data;
  int stride;  // extended width
  inline uint8_t &at(int row, int col) const {
    // 64-bit offset: consistent with the pack/unpack transforms; int would
    // overflow for planes >= 2 GiB
    return data[(long long)row * stride + col];
  }
};

// One luma segment: p[r][j] / q[r][j] value grids in, filtered values out.
// Mirrors the decision + strong/normal cascade (golden model
// models/golden.py, ref cpu.h:1359-1429).
void luma_segment(int p[4][4], int q[4][4], int beta, int tc,
                  int out_p[4][4], int out_q[4][4], int &touched) {
  std::memcpy(out_p, p, sizeof(int) * 16);
  std::memcpy(out_q, q, sizeof(int) * 16);
  touched = 0;

  const int dp0 = std::abs(p[0][2] - 2 * p[0][1] + p[0][0]);
  const int dp3 = std::abs(p[3][2] - 2 * p[3][1] + p[3][0]);
  const int dq0 = std::abs(q[0][2] - 2 * q[0][1] + q[0][0]);
  const int dq3 = std::abs(q[3][2] - 2 * q[3][1] + q[3][0]);
  if (dp0 + dp3 + dq0 + dq3 >= beta) return;  // condition (1)

  const int b8 = beta / 8;
  const bool cond2 = (dp0 + dq0) < b8 && (dp3 + dq3) < b8;
  const bool cond3 =
      (std::abs(p[0][3] - p[0][0]) + std::abs(q[0][0] - q[0][3])) < b8 &&
      (std::abs(p[3][3] - p[3][0]) + std::abs(q[3][0] - q[3][3])) < b8;
  const int tc52 = 5 * tc / 2;
  const bool cond4 = std::abs(p[0][0] - q[0][0]) < tc52 &&
                     std::abs(p[3][0] - q[3][0]) < tc52;

  if (cond2 && cond3 && cond4) {
    // strong filter: 3 pixels each side, all rows
    const int c = 2 * tc;
    for (int r = 0; r < 4; ++r) {
      const int d0p = clip1((p[r][2] + 2 * p[r][1] - 6 * p[r][0] + 2 * q[r][0] + q[r][1] + 4) >> 3, c);
      const int d1p = clip1((p[r][2] - 3 * p[r][1] + p[r][0] + q[r][0] + 2) >> 2, c);
      const int d2p = clip1((2 * p[r][3] - 5 * p[r][2] + p[r][1] + p[r][0] + q[r][0] + 4) >> 3, c);
      const int d0q = clip1((q[r][2] + 2 * q[r][1] - 6 * q[r][0] + 2 * p[r][0] + p[r][1] + 4) >> 3, c);
      const int d1q = clip1((q[r][2] - 3 * q[r][1] + q[r][0] + p[r][0] + 2) >> 2, c);
      const int d2q = clip1((2 * q[r][3] - 5 * q[r][2] + q[r][1] + q[r][0] + p[r][0] + 4) >> 3, c);
      out_p[r][0] = clip2(p[r][0] + d0p);
      out_p[r][1] = clip2(p[r][1] + d1p);
      out_p[r][2] = clip2(p[r][2] + d2p);
      out_q[r][0] = clip2(q[r][0] + d0q);
      out_q[r][1] = clip2(q[r][1] + d1q);
      out_q[r][2] = clip2(q[r][2] + d2q);
    }
    touched = 3;
    return;
  }

  // normal filter: per-row gate, up to 2 pixels each side
  const int c = 2 * tc, c2 = tc / 2, b316 = 3 * beta / 16;
  const bool cond5 = (dp0 + dp3) < b316;
  const bool cond6 = (dq0 + dq3) < b316;
  for (int r = 0; r < 4; ++r) {
    const int delta0 = (9 * (q[r][0] - p[r][0]) - 3 * (q[r][1] - p[r][1]) + 8) >> 4;
    if (std::abs(delta0) >= 10 * tc) continue;
    const int D = clip1(delta0, c);
    const int dp1 = clip1((((p[r][2] + p[r][0] + 1) >> 1) - p[r][1] + D) >> 1, c2);
    const int dq1 = clip1((((q[r][2] + q[r][0] + 1) >> 1) - q[r][1] - D) >> 1, c2);
    out_p[r][0] = clip2(p[r][0] + D);
    out_q[r][0] = clip2(q[r][0] - D);
    if (cond5) out_p[r][1] = clip2(p[r][1] + dp1);
    if (cond6) out_q[r][1] = clip2(q[r][1] + dq1);
  }
  touched = 2;
}

// Only distance-0 pixels change (reference modifies only p0/q0, cpu.h:1475-1485).
void chroma_segment(const int p[4][2], const int q[4][2], int tc,
                    int out_p0[4], int out_q0[4]) {
  for (int r = 0; r < 4; ++r) {
    const int dp = clip1((((p[r][0] - q[r][0]) * 4) + p[r][1] - q[r][1] + 4) >> 3, tc);
    const int dq = clip1((((q[r][0] - p[r][0]) * 4) + q[r][1] - p[r][1] + 4) >> 3, tc);
    out_p0[r] = clip2(p[r][0] + dp);
    out_q0[r] = clip2(q[r][0] - dq);
  }
}

// Flat BS read with the OOB -> 0 rule (quirk Q2).
inline int bs_flat(const uint8_t *bs, long long n, long long idx) {
  return (idx >= 0 && idx < n) ? bs[idx] : 0;
}

void filter_tile_segment(const PlaneView &pl, int by, int bx, int phase,
                         int beta, int tc, bool chroma) {
  const int r0 = by * kBlock, c0 = bx * kBlock;
  if (!chroma) {
    int p[4][4], q[4][4], op[4][4], oq[4][4], touched;
    for (int r = 0; r < 4; ++r)
      for (int j = 0; j < 4; ++j) {
        int rr, cc;
        p_coord(phase, r, j, rr, cc);
        p[r][j] = pl.at(r0 + rr, c0 + cc);
        q_coord(phase, r, j, rr, cc);
        q[r][j] = pl.at(r0 + rr, c0 + cc);
      }
    luma_segment(p, q, beta, tc, op, oq, touched);
    for (int r = 0; r < 4; ++r)
      for (int j = 0; j < touched; ++j) {
        int rr, cc;
        p_coord(phase, r, j, rr, cc);
        pl.at(r0 + rr, c0 + cc) = static_cast<uint8_t>(op[r][j]);
        q_coord(phase, r, j, rr, cc);
        pl.at(r0 + rr, c0 + cc) = static_cast<uint8_t>(oq[r][j]);
      }
  } else {
    int p[4][2], q[4][2], op0[4], oq0[4];
    for (int r = 0; r < 4; ++r)
      for (int j = 0; j < 2; ++j) {
        int rr, cc;
        p_coord(phase, r, j, rr, cc);
        p[r][j] = pl.at(r0 + rr, c0 + cc);
        q_coord(phase, r, j, rr, cc);
        q[r][j] = pl.at(r0 + rr, c0 + cc);
      }
    chroma_segment(p, q, tc, op0, oq0);
    for (int r = 0; r < 4; ++r) {
      int rr, cc;
      p_coord(phase, r, 0, rr, cc);
      pl.at(r0 + rr, c0 + cc) = static_cast<uint8_t>(op0[r]);
      q_coord(phase, r, 0, rr, cc);
      pl.at(r0 + rr, c0 + cc) = static_cast<uint8_t>(oq0[r]);
    }
  }
}

// Sweep one extended plane.  gate_ny/gate_nx: tile counts used by the
// segment-existence gates (for chroma these are the LUMA counts -- quirk Q2).
void deblock_plane(uint8_t *plane, int hext, int wext, int lookup_w,
                   const uint8_t *vert_bs, long long n_vert,
                   const uint8_t *hor_bs, long long n_hor,
                   int gate_ny, int gate_nx, int beta, int tc, bool chroma,
                   int num_threads) {
  const int ny = hext / kBlock, nx = wext / kBlock;
  const long long sv = lookup_w / kBlock + 1, sh = lookup_w / kBlock;
  const PlaneView pl{plane, wext};
#ifdef _OPENMP
  // num_threads clause instead of omp_set_num_threads: the latter is a
  // sticky process-global, so "0 = library default" would actually mean
  // "whatever the previous caller set"
  const int nt = num_threads > 0 ? num_threads : omp_get_max_threads();
#pragma omp parallel for schedule(static) num_threads(nt)
#else
  (void)num_threads;
#endif
  for (int bx = 0; bx < nx; ++bx) {
    for (int by = 0; by < ny; ++by) {
      const int bs_v1 = by > 0 ? bs_flat(vert_bs, n_vert, (long long)(by - 1) * sv + bx) : 0;
      const int bs_v2 = by < gate_ny - 1 ? bs_flat(vert_bs, n_vert, (long long)by * sv + bx) : 0;
      const int bs_h1 = bx > 0 ? bs_flat(hor_bs, n_hor, (long long)by * sh + bx - 1) : 0;
      const int bs_h2 = bx < gate_nx - 1 ? bs_flat(hor_bs, n_hor, (long long)by * sh + bx) : 0;
      const int g[4] = {bs_v1, bs_v2, bs_h1, bs_h2};
      for (int phase = 0; phase < 4; ++phase) {
        const bool on = chroma ? g[phase] == 2 : g[phase] > 0;
        if (on) filter_tile_segment(pl, by, bx, phase, beta, tc, chroma);
      }
    }
  }
}

}  // namespace

extern "C" {

int gvct_version() { return 10; }

int gvct_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

// In-place deblock of extended planes.
//  y: (h+8)x(w+8);  u, v: chroma extended planes (ch_ext x cw_ext, derived).
//  BS arrays are the flat reference-layout arrays (utils/bs.py).
//  Returns 0 on success.
int gvct_deblock_frame(uint8_t *y, uint8_t *u, uint8_t *v,
                       int width, int height,
                       const uint8_t *vert_bs, long long n_vert,
                       const uint8_t *hor_bs, long long n_hor,
                       const uint8_t *cvert_bs, long long n_cvert,
                       const uint8_t *chor_bs, long long n_chor,
                       int qp, int luma_only, int num_threads) {
  if (width % kBlock || height % kBlock || qp < 0) return 1;
  const int beta = get_beta(qp), tc = get_tc(qp);
  const int hext = height + kBlock, wext = width + kBlock;
  const int luma_ny = height / kBlock + 1, luma_nx = width / kBlock + 1;
  deblock_plane(y, hext, wext, width, vert_bs, n_vert, hor_bs, n_hor,
                luma_ny, luma_nx, beta, tc, /*chroma=*/false, num_threads);
  if (!luma_only) {
    const int cw = width / 2, ch = height / 2;
    const int chext = ch + kBlock, cwext = cw + kBlock;
    // Quirk Q9: the reference's chroma sweep uses row stride
    // num_chroma_blocks_x*8 (cpu.h:469-471), not the plane's _new_chroma_width,
    // i.e. it filters the flat buffer reinterpreted as an
    // (8*ncby, 8*ncbx) image.  Passing the effective dims reproduces that
    // exactly (identical when cwext is already a multiple of 8).
    const int eff_h = (chext / kBlock) * kBlock;
    const int eff_w = (cwext / kBlock) * kBlock;
    deblock_plane(u, eff_h, eff_w, cw, cvert_bs, n_cvert, chor_bs, n_chor,
                  luma_ny, luma_nx, beta, tc, /*chroma=*/true, num_threads);
    deblock_plane(v, eff_h, eff_w, cw, cvert_bs, n_cvert, chor_bs, n_chor,
                  luma_ny, luma_nx, beta, tc, /*chroma=*/true, num_threads);
  }
  return 0;
}

// Layout transforms for the streaming pipeline: extended plane (hext x wext)
// <-> tile-planes (8, 8, By, Bx) with By = hext/8 (truncating), Bx = wext/8.
void gvct_pack_tiles(const uint8_t *plane, int hext, int wext, uint8_t *out) {
  const int ny = hext / kBlock, nx = wext / kBlock;
  for (int r = 0; r < kBlock; ++r)
    for (int c = 0; c < kBlock; ++c) {
      uint8_t *dst = out + ((long long)r * kBlock + c) * ny * nx;
      for (int by = 0; by < ny; ++by) {
        const uint8_t *src = plane + (long long)(by * kBlock + r) * wext + c;
        for (int bx = 0; bx < nx; ++bx) dst[(long long)by * nx + bx] = src[(long long)bx * kBlock];
      }
    }
}

void gvct_unpack_tiles(const uint8_t *tiles, int hext, int wext, uint8_t *plane) {
  const int ny = hext / kBlock, nx = wext / kBlock;
  for (int r = 0; r < kBlock; ++r)
    for (int c = 0; c < kBlock; ++c) {
      const uint8_t *src = tiles + ((long long)r * kBlock + c) * ny * nx;
      for (int by = 0; by < ny; ++by) {
        uint8_t *dst = plane + (long long)(by * kBlock + r) * wext + c;
        for (int bx = 0; bx < nx; ++bx) dst[(long long)bx * kBlock] = src[(long long)by * nx + bx];
      }
    }
}

}  // extern "C"

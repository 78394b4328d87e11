// Native AV1 tile serializer: range coder + context/CDF state machine.
//
// Consumes the op stream produced by cavif_tpu/av1/opstream.py and emits one
// entropy-coded AV1 tile, byte-identical to the Python reference serializer
// (symbols.TileWriter driven by opstream.replay_python) — differentially
// tested in tests/test_native_tilecoder.py.
//
// This is the host-side serial tail of the TPU encode design: the device
// computes modes/levels for batches of blocks; the per-symbol work (context
// derivation, CDF adaptation, arithmetic coding) is inherently sequential
// per tile and runs here. Tiles are entropy-independent, so callers encode
// many tiles in parallel (this code is thread-safe per call and holds no
// global mutable state besides the read-only spec tables installed at init).
//
// Reference parity: rav1e's od_ec + tile encode loop, exercised via
// /root/reference/ravif/src/av1encoder.rs:748-771.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Spec tables (installed once from Python; same npz as av1/tables.py).
// ---------------------------------------------------------------------------

struct SpecTables {
  // CDF tables, inverted layout (icdf), raw copies of the npz arrays.
  std::vector<uint16_t> partition;  // (20, 11)         nsym 4/10/8 by bsl
  std::vector<uint16_t> kf_y;       // (5, 5, 14)       nsym 13
  std::vector<uint16_t> uv;         // (2, 13, 15)      nsym 13 / 14 (cfl)
  std::vector<uint16_t> skip;       // (3, 3)           nsym 2
  std::vector<uint16_t> angle;      // (8, 8)           nsym 7
  std::vector<uint16_t> txb_skip;   // (4, 5, 13, 3)    nsym 2
  std::vector<uint16_t> eob_pt16;   // (4, 2, 2, 6)     nsym 5
  std::vector<uint16_t> eob_pt32;   // (4, 2, 2, 7)     nsym 6
  std::vector<uint16_t> eob_pt64;   // (4, 2, 2, 8)     nsym 7
  std::vector<uint16_t> eob_pt128;  // (4, 2, 2, 9)     nsym 8
  std::vector<uint16_t> eob_pt256;  // (4, 2, 2, 10)    nsym 9
  std::vector<uint16_t> eob_pt512;  // (4, 2, 2, 11)    nsym 10
  std::vector<uint16_t> eob_pt1024; // (4, 2, 2, 12)    nsym 11
  std::vector<uint16_t> eob_extra;  // (4, 5, 2, 9, 3)  nsym 2
  std::vector<uint16_t> base;       // (4, 5, 2, 42, 5) nsym 4
  std::vector<uint16_t> base_eob;   // (4, 5, 2, 4, 4)  nsym 3
  std::vector<uint16_t> br;         // (4, 5, 2, 21, 5) nsym 4
  std::vector<uint16_t> dc_sign;    // (4, 2, 3, 3)     nsym 2
  std::vector<uint16_t> intra_ext_tx; // (2, 4, 13, 17)  nsym 7 (set1) / 5 (set2)
  // scans (forward diagonal) + coeff-base context offsets, per (w, h)
  // coded-area size; index = (log2(w)-2)*4 + (log2(h)-2), sizes 4..32.
  std::vector<int32_t> scan[16];
  std::vector<uint8_t> nzoff[16];
  // smooth-predictor weights per size 4..64 (index log2(n)-2)
  std::vector<uint8_t> sm_weights[5];
};

SpecTables g_tables;

int size_idx(int w, int h) {
  int lw = 0, lh = 0;
  while ((4 << lw) < w) lw++;
  while ((4 << lh) < h) lh++;
  return lw * 4 + lh;
}

// ---------------------------------------------------------------------------
// Range encoder: exact mirror of av1/ec.py (od_ec_enc).
// ---------------------------------------------------------------------------

constexpr int EC_PROB_SHIFT = 6;
constexpr int EC_MIN_PROB = 4;
constexpr uint32_t PROB_TOP = 1u << 15;

inline int bitlength(uint32_t v) {
  int n = 0;
  while (v) { n++; v >>= 1; }
  return n;
}

inline uint32_t interval(uint32_t rng, uint32_t icdf_s, int n_minus_1_minus_s) {
  return (((rng >> 8) * (icdf_s >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) +
         EC_MIN_PROB * (uint32_t)n_minus_1_minus_s;
}

struct RangeEncoder {
  std::vector<uint32_t> precarry;  // 9-bit entries
  uint64_t low = 0;
  uint32_t rng = PROB_TOP;
  int cnt = -9;

  void normalize(uint64_t lw, uint32_t r) {
    int d = 16 - bitlength(r);
    int s = cnt + d;
    if (s >= 0) {
      int c = cnt;
      uint64_t m = (1ull << (c + 16)) - 1;
      if (s > 7) {
        precarry.push_back((uint32_t)((lw >> (c + 16)) & 0xFFFF));
        lw &= m;
        c -= 8;
        m >>= 8;
      }
      precarry.push_back((uint32_t)((lw >> (c + 16)) & 0xFFFF));
      lw &= m;
      s = c + d - 8;
    }
    low = (lw << d) & 0xFFFFFFFFull;
    rng = r << d;
    cnt = s;
  }

  void encode_symbol(int s, const uint16_t* icdf, int n) {
    uint32_t r = rng;
    uint64_t lw = low;
    uint32_t v = interval(r, icdf[s], n - 1 - s);
    if (s > 0) {
      uint32_t u = interval(r, icdf[s - 1], n - s);
      lw += r - u;
      r = u - v;
    } else {
      r -= v;
    }
    normalize(lw, r);
  }

  void encode_symbol2(int s, uint32_t icdf0) {
    // 2-symbol fast path (icdf = {icdf0, 0})
    uint32_t r = rng;
    uint64_t lw = low;
    if (s > 0) {
      uint32_t u = interval(r, icdf0, 1);   // n - s = 1
      uint32_t v = interval(r, 0, 0);       // icdf[1] = 0, n - 1 - s = 0
      lw += r - u;
      r = u - v;
    } else {
      r -= interval(r, icdf0, 1);           // n - 1 - s = 1
    }
    normalize(lw, r);
  }

  void encode_literal(uint32_t value, int bits) {
    for (int i = bits - 1; i >= 0; i--)
      encode_symbol2((value >> i) & 1, PROB_TOP >> 1);
  }

  // Returns number of bytes written to out (caller sized it); -1 on overflow.
  int done(uint8_t* out, int cap) {
    int c = cnt;
    int s = c + 10;
    std::vector<uint32_t> entries = precarry;
    if (s > 0) {
      uint64_t m = (1ull << (c + 16)) - 1;
      uint64_t e = ((low + 0x3FFF) & ~0x3FFFull) | 0x4000;
      while (s > 0) {
        entries.push_back((uint32_t)((e >> (c + 16)) & 0xFFFF));
        e &= m;
        s -= 8;
        c -= 8;
        m >>= 8;
      }
    }
    int n = (int)entries.size();
    if (n == 0) {
      if (cap < 1) return -1;
      out[0] = 0;
      return 1;
    }
    if (n > cap) return -1;
    uint32_t carry = 0;
    for (int i = n - 1; i >= 0; i--) {
      uint32_t v = entries[i] + carry;
      out[i] = (uint8_t)(v & 0xFF);
      carry = v >> 8;
    }
    return n;
  }
};

// ---------------------------------------------------------------------------
// Adaptive CDF store: materialized copies of the default tables + counter.
// Mirrors symbols.Cdfs (lazy copy ≡ eager copy: first use sees defaults).
// ---------------------------------------------------------------------------

constexpr int CDF_MAX = 16;

struct CdfRow {
  uint16_t v[CDF_MAX];
  uint16_t count;
};

inline void load_row(CdfRow& row, const uint16_t* src, int nsym) {
  for (int i = 0; i < nsym; i++) row.v[i] = src[i];
  row.count = 0;
}

inline void update_cdf(CdfRow& row, int val, int nsym) {
  int count = row.count;
  int nbits = bitlength((uint32_t)nsym) - 1;
  if (nbits > 2) nbits = 2;
  int rate = 3 + (count > 15) + (count > 31) + nbits;
  int tmp = (int)PROB_TOP;
  for (int i = 0; i < nsym - 1; i++) {
    if (i == val) tmp = 0;
    if (tmp < row.v[i])
      row.v[i] -= (uint16_t)((row.v[i] - tmp) >> rate);
    else
      row.v[i] += (uint16_t)((tmp - row.v[i]) >> rate);
  }
  row.count = (uint16_t)(count + (count < 32));
}

// ---------------------------------------------------------------------------
// Tile state (contexts + adaptive CDFs), mirroring symbols.TileWriter.
// ---------------------------------------------------------------------------

constexpr int OP_CLEAR_LEFT = 0;
constexpr int OP_PARTITION = 1;
constexpr int OP_SPLIT_BIN = 2;
constexpr int OP_BLOCK = 3;
constexpr int OP_COEFFS = 4;
constexpr int OP_BLOCK_COMPUTE = 5;  // (r, c, w4, h4, y_mode, uv_mode)

constexpr int DC_PRED = 0, V_PRED = 1, D67 = 8;

const int INTRA_MODE_CONTEXT[13] = {0, 1, 2, 3, 4, 4, 4, 4, 3, 0, 1, 2, 0};

const int SKIP_CONTEXTS[5][5] = {
    {1, 2, 2, 2, 3},
    {1, 4, 4, 4, 5},
    {1, 4, 4, 4, 5},
    {1, 4, 4, 4, 5},
    {1, 4, 4, 4, 6},
};

int q_ctx(int base_q) {
  if (base_q <= 20) return 0;
  if (base_q <= 60) return 1;
  if (base_q <= 120) return 2;
  return 3;
}

int txsize_ctx(int w, int h) {
  int sqr = w < h ? w : h;
  int sqr_up = w < h ? h : w;
  int a = bitlength((uint32_t)sqr) - 3;
  int b = bitlength((uint32_t)sqr_up) - 3;
  int t = (a + b + 1) >> 1;
  return t < 4 ? t : 4;
}

struct TileCoder {
  RangeEncoder enc;
  bool cdf_update;
  bool reduced_tx_set = false;
  int qctx;
  int num_planes;
  int w4, h4;        // context array extents (tile + 32 slack)
  int mi_w4, mi_h4;  // tile mi dimensions (context-write clamp bound)

  // contexts
  std::vector<uint8_t> above_part, left_part;
  std::vector<int16_t> y_modes;   // h4 * w4
  std::vector<uint8_t> skips;     // h4 * w4
  std::vector<uint8_t> above_ctx[3], left_ctx[3];

  // adaptive CDFs (q dim pre-sliced where applicable)
  CdfRow cdf_partition[20];
  CdfRow cdf_kf_y[25];
  CdfRow cdf_uv[2][13];
  CdfRow cdf_skip[3];
  CdfRow cdf_angle[8];
  CdfRow cdf_txb_skip[5][13];
  CdfRow cdf_eob_pt[7][2];        // [log2(area)/... idx][ptype], ctx = 0
  CdfRow cdf_eob_extra[5][2][9];
  CdfRow cdf_base[5][2][42];
  CdfRow cdf_base_eob[5][2][4];
  CdfRow cdf_br[5][2][21];        // txs ctx clamped to 0..3 by callers; 5 kept
  CdfRow cdf_dc_sign[2][3];
  CdfRow cdf_ext_tx[2][4][13];

  // scratch for coefficient coding
  std::vector<int32_t> padbuf;

  void init(int mi_col_start, int mi_col_end, int mi_row_start, int mi_row_end,
            int base_q, int planes, int disable_cdf_update) {
    cdf_update = !disable_cdf_update;
    qctx = q_ctx(base_q);
    num_planes = planes;
    w4 = mi_col_end - mi_col_start + 32;
    h4 = mi_row_end - mi_row_start + 32;
    mi_w4 = mi_col_end - mi_col_start;
    mi_h4 = mi_row_end - mi_row_start;
    above_part.assign(w4, 0);
    left_part.assign(h4, 0);
    y_modes.assign((size_t)w4 * h4, -1);
    skips.assign((size_t)w4 * h4, 0);
    for (int p = 0; p < 3; p++) {
      above_ctx[p].assign(w4, 0);
      left_ctx[p].assign(h4, 0);
    }
    const SpecTables& T = g_tables;
    for (int i = 0; i < 20; i++)
      load_row(cdf_partition[i], &T.partition[i * 11], 10);
    for (int i = 0; i < 25; i++)
      load_row(cdf_kf_y[i], &T.kf_y[i * 14], 13);
    for (int cfl = 0; cfl < 2; cfl++)
      for (int m = 0; m < 13; m++)
        load_row(cdf_uv[cfl][m], &T.uv[(cfl * 13 + m) * 15], cfl ? 14 : 13);
    for (int i = 0; i < 3; i++) load_row(cdf_skip[i], &T.skip[i * 3], 2);
    for (int i = 0; i < 8; i++) load_row(cdf_angle[i], &T.angle[i * 8], 7);
    for (int t = 0; t < 5; t++)
      for (int c = 0; c < 13; c++)
        load_row(cdf_txb_skip[t][c], &T.txb_skip[((qctx * 5 + t) * 13 + c) * 3], 2);
    const std::vector<uint16_t>* eob_tabs[7] = {
        &T.eob_pt16, &T.eob_pt32, &T.eob_pt64, &T.eob_pt128,
        &T.eob_pt256, &T.eob_pt512, &T.eob_pt1024};
    for (int k = 0; k < 7; k++) {
      int stride = 5 + k + 1;  // nsym + 1
      for (int p = 0; p < 2; p++)
        load_row(cdf_eob_pt[k][p],
                 &(*eob_tabs[k])[((qctx * 2 + p) * 2 + 0) * stride], 5 + k);
    }
    for (int t = 0; t < 5; t++)
      for (int p = 0; p < 2; p++) {
        for (int c = 0; c < 9; c++)
          load_row(cdf_eob_extra[t][p][c],
                   &T.eob_extra[(((qctx * 5 + t) * 2 + p) * 9 + c) * 3], 2);
        for (int c = 0; c < 42; c++)
          load_row(cdf_base[t][p][c],
                   &T.base[(((qctx * 5 + t) * 2 + p) * 42 + c) * 5], 4);
        for (int c = 0; c < 4; c++)
          load_row(cdf_base_eob[t][p][c],
                   &T.base_eob[(((qctx * 5 + t) * 2 + p) * 4 + c) * 4], 3);
        for (int c = 0; c < 21; c++)
          load_row(cdf_br[t][p][c],
                   &T.br[(((qctx * 5 + t) * 2 + p) * 21 + c) * 5], 4);
      }
    for (int p = 0; p < 2; p++)
      for (int c = 0; c < 3; c++)
        load_row(cdf_dc_sign[p][c], &T.dc_sign[((qctx * 2 + p) * 3 + c) * 3], 2);
    for (int st = 0; st < 2; st++)
      for (int tsq = 0; tsq < 4; tsq++)
        for (int m = 0; m < 13; m++)
          load_row(cdf_ext_tx[st][tsq][m],
                   &T.intra_ext_tx[((st * 4 + tsq) * 13 + m) * 17],
                   st == 0 ? 7 : 5);
  }

  void code(CdfRow& row, int sym, int nsym) {
    enc.encode_symbol(sym, row.v, nsym);
    if (cdf_update) update_cdf(row, sym, nsym);
  }

  // ---- ops ----------------------------------------------------------------

  void clear_left() {
    std::memset(left_part.data(), 0, left_part.size());
    for (int p = 0; p < 3; p++)
      std::memset(left_ctx[p].data(), 0, left_ctx[p].size());
  }

  static int part_nsym(int bsl) { return bsl == 1 ? 4 : (bsl == 5 ? 8 : 10); }

  void write_partition(int r, int c, int bsl, int part) {
    int above = (above_part[c] >> (bsl - 1)) & 1;
    int left = (left_part[r] >> (bsl - 1)) & 1;
    int ctx = left * 2 + above;
    code(cdf_partition[(bsl - 1) * 4 + ctx], part, part_nsym(bsl));
  }

  void write_split_binary(int r, int c, int bsl, int horz, int split) {
    int above = (above_part[c] >> (bsl - 1)) & 1;
    int left = (left_part[r] >> (bsl - 1)) & 1;
    int ctx = left * 2 + above;
    const CdfRow& row = cdf_partition[(bsl - 1) * 4 + ctx];
    int nsym = part_nsym(bsl);
    // gather_split_binary (symbols.py): subtract "alike" partition probs
    static const int horz_sub[6] = {2, 3, 4, 6, 7, 9};
    static const int vert_sub[6] = {1, 3, 4, 5, 6, 8};
    const int* sub = horz ? horz_sub : vert_sub;
    int nsub = (bsl != 5) ? 6 : 5;
    int p = 32768;
    for (int i = 0; i < nsub; i++) {
      int s = sub[i];
      if (s < nsym) {
        int hi = (s == 0) ? 32768 : row.v[s - 1];
        int lo = (s == nsym - 1) ? 0 : row.v[s];
        p -= hi - lo;
      }
    }
    enc.encode_symbol2(split, (uint32_t)(32768 - p));
  }

  void update_partition_ctx(int r, int c, int bw4, int bh4) {
    int wl = bitlength((uint32_t)bw4) - 1;
    int hl = bitlength((uint32_t)bh4) - 1;
    uint8_t av = (uint8_t)((0x1F << wl) & 0x1F);
    uint8_t lv = (uint8_t)((0x1F << hl) & 0x1F);
    for (int i = 0; i < bw4; i++) above_part[c + i] = av;
    for (int i = 0; i < bh4; i++) left_part[r + i] = lv;
  }

  void write_block(int r, int c, int bw4, int bh4, int y_mode, int uv_mode,
                   int skip, int cfl_allowed) {
    // skip
    {
      int above = r > 0 ? skips[(size_t)(r - 1) * w4 + c] : 0;
      int left = c > 0 ? skips[(size_t)r * w4 + (c - 1)] : 0;
      code(cdf_skip[above + left], skip, 2);
    }
    // intra modes
    {
      int am = r > 0 ? y_modes[(size_t)(r - 1) * w4 + c] : DC_PRED;
      int lm = c > 0 ? y_modes[(size_t)r * w4 + (c - 1)] : DC_PRED;
      if (am < 0) am = DC_PRED;
      if (lm < 0) lm = DC_PRED;
      int actx = INTRA_MODE_CONTEXT[am];
      int lctx = INTRA_MODE_CONTEXT[lm];
      code(cdf_kf_y[actx * 5 + lctx], y_mode, 13);
      int mind = bw4 < bh4 ? bw4 : bh4;
      if (y_mode >= V_PRED && y_mode <= D67 && mind >= 2)
        code(cdf_angle[y_mode - V_PRED], 3, 7);
      if (num_planes > 1) {
        code(cdf_uv[cfl_allowed][y_mode], uv_mode, cfl_allowed ? 14 : 13);
        if (uv_mode >= V_PRED && uv_mode <= D67 && mind >= 2)
          code(cdf_angle[uv_mode - V_PRED], 3, 7);
      }
    }
    // record + partition ctx + (skip) entropy ctx reset
    for (int i = 0; i < bh4; i++) {
      int16_t* ym = &y_modes[(size_t)(r + i) * w4 + c];
      uint8_t* sk = &skips[(size_t)(r + i) * w4 + c];
      for (int j = 0; j < bw4; j++) { ym[j] = (int16_t)y_mode; sk[j] = (uint8_t)skip; }
    }
    update_partition_ctx(r, c, bw4, bh4);
    if (skip) {
      for (int p = 0; p < num_planes; p++) {
        for (int i = 0; i < bw4; i++) above_ctx[p][c + i] = 0;
        for (int i = 0; i < bh4; i++) left_ctx[p][r + i] = 0;
      }
    }
  }

  int dc_sign_ctx(int plane, int c4, int bw4, int r4, int bh4) {
    int s = 0;
    for (int i = 0; i < bw4; i++) {
      int cat = above_ctx[plane][c4 + i] >> 6;
      s += cat == 2 ? 1 : (cat == 1 ? -1 : 0);
    }
    for (int i = 0; i < bh4; i++) {
      int cat = left_ctx[plane][r4 + i] >> 6;
      s += cat == 2 ? 1 : (cat == 1 ? -1 : 0);
    }
    return s > 0 ? 2 : (s < 0 ? 1 : 0);
  }

  void write_coeffs(int plane, int r4, int c4, int txw, int txh,
                    int eq_block, int ch, int cw, const int32_t* lv,
                    int y_mode) {
    int ptype = plane > 0 ? 1 : 0;
    int bw4 = txw >> 2;
    int bh4 = txh >> 2;
    // decoders clamp context *writes* to the tile mi bounds for blocks
    // overhanging the bottom/right edge (dav1d memsets with imin(txh,
    // bh-by)); reads then see zeros beyond the edge. Mirror exactly.
    int w4w = bw4 < (mi_w4 - c4) ? bw4 : (mi_w4 - c4);
    int h4w = bh4 < (mi_h4 - r4) ? bh4 : (mi_h4 - r4);
    int tctx = txsize_ctx(txw, txh);
    int sidx = size_idx(cw, ch);
    const int32_t* scan = g_tables.scan[sidx].data();
    const uint8_t* nzoff = g_tables.nzoff[sidx].data();
    int area = cw * ch;

    // eob from scan order
    int eob = 0;
    for (int i = area - 1; i >= 0; i--) {
      if (lv[scan[i]] != 0) { eob = i + 1; break; }
    }

    // txb_skip
    {
      int sctx;
      if (plane == 0) {
        if (eq_block) {
          sctx = 0;
        } else {
          int above = 0, left = 0;
          for (int i = 0; i < bw4; i++) {
            int v = above_ctx[0][c4 + i] & 63;
            if (v > above) above = v;
          }
          for (int i = 0; i < bh4; i++) {
            int v = left_ctx[0][r4 + i] & 63;
            if (v > left) left = v;
          }
          sctx = SKIP_CONTEXTS[above < 4 ? above : 4][left < 4 ? left : 4];
        }
      } else {
        int anz = 0, lnz = 0;
        for (int i = 0; i < bw4; i++) anz |= above_ctx[plane][c4 + i] != 0;
        for (int i = 0; i < bh4; i++) lnz |= left_ctx[plane][r4 + i] != 0;
        sctx = 7 + anz + lnz;
      }
      code(cdf_txb_skip[tctx][sctx], eob == 0 ? 1 : 0, 2);
    }
    if (eob == 0) {
      for (int i = 0; i < w4w; i++) above_ctx[plane][c4 + i] = 0;
      for (int i = 0; i < h4w; i++) left_ctx[plane][r4 + i] = 0;
      return;
    }

    // transform_type(): luma, tx sets 1/2 (sqr_up <= 16); DCT_DCT = sym 1
    if (plane == 0 && (txw > txh ? txw : txh) <= 16) {
      int sqr = txw < txh ? txw : txh;
      int tx_sqr = bitlength((uint32_t)sqr) - 3;
      int set_idx = (reduced_tx_set || sqr == 16) ? 2 : 1;
      code(cdf_ext_tx[set_idx - 1][tx_sqr][y_mode], 1, set_idx == 1 ? 7 : 5);
    }

    // eob position class
    int eob_pt;
    if (eob == 1) eob_pt = 1;
    else if (eob == 2) eob_pt = 2;
    else eob_pt = bitlength((uint32_t)(eob - 1)) + 1;
    int kidx;  // area 16->0 ... 1024->6
    {
      int a = area; kidx = 0;
      while (a > 16) { a >>= 1; kidx++; }
    }
    code(cdf_eob_pt[kidx][ptype], eob_pt - 1, 5 + kidx);
    if (eob_pt >= 3) {
      int base_v = (1 << (eob_pt - 2)) + 1;
      int offset = eob - base_v;
      int msb = (offset >> (eob_pt - 3)) & 1;
      code(cdf_eob_extra[tctx][ptype][eob_pt - 3], msb, 2);
      for (int i = eob_pt - 4; i >= 0; i--)
        enc.encode_literal((uint32_t)(offset >> i) & 1, 1);
    }

    // level coding, reverse scan; pad = abs levels seen so far (clamped 127)
    int pstride = cw + 2;
    padbuf.assign((size_t)(ch + 2) * pstride, 0);
    int32_t* pad = padbuf.data();
    int brt = tctx < 3 ? tctx : 3;
    for (int si = eob - 1; si >= 0; si--) {
      int pos = scan[si];
      int row = pos / cw, col = pos % cw;
      int v = lv[pos];
      int a = v < 0 ? -v : v;
      if (si == eob - 1) {
        int ectx;
        if (si == 0) ectx = 0;
        else if (si <= area / 8) ectx = 1;
        else if (si <= area / 4) ectx = 2;
        else ectx = 3;
        int sym = (a < 3 ? a : 3) - 1;
        code(cdf_base_eob[tctx][ptype][ectx], sym, 3);
      } else {
        int p1 = pad[row * pstride + col + 1];
        int p2 = pad[(row + 1) * pstride + col];
        int p3 = pad[(row + 1) * pstride + col + 1];
        int p4 = pad[row * pstride + col + 2];
        int p5 = pad[(row + 2) * pstride + col];
        int mag = (p1 < 3 ? p1 : 3) + (p2 < 3 ? p2 : 3) + (p3 < 3 ? p3 : 3) +
                  (p4 < 3 ? p4 : 3) + (p5 < 3 ? p5 : 3);
        int mctx = (mag + 1) >> 1;
        if (mctx > 4) mctx = 4;
        int bctx = pos == 0 ? 0 : mctx + nzoff[row * cw + col];
        code(cdf_base[tctx][ptype][bctx], a < 3 ? a : 3, 4);
      }
      if (a > 2) {
        int p1 = pad[row * pstride + col + 1];
        int p2 = pad[(row + 1) * pstride + col];
        int p3 = pad[(row + 1) * pstride + col + 1];
        int magb = (p1 < 15 ? p1 : 15) + (p2 < 15 ? p2 : 15) + (p3 < 15 ? p3 : 15);
        int bmag = (magb + 1) >> 1;
        if (bmag > 6) bmag = 6;
        int brctx;
        if (pos == 0) brctx = bmag;
        else if (row < 2 && col < 2) brctx = bmag + 7;
        else brctx = bmag + 14;
        int rem = (a < 15 ? a : 15) - 3;
        for (int k = 0; k < 4; k++) {
          int sym = rem < 3 ? rem : 3;
          code(cdf_br[brt][ptype][brctx], sym, 4);
          rem -= sym;
          if (sym < 3) break;
        }
      }
      pad[row * pstride + col] = a < 127 ? a : 127;
    }

    // signs + golomb, forward scan
    int cul = 0;
    int dc_cat = 0;
    for (int si = 0; si < eob; si++) {
      int pos = scan[si];
      int v = lv[pos];
      int a = v < 0 ? -v : v;
      int sign = v < 0 ? 1 : 0;
      if (a != 0) {
        if (si == 0) {
          int dctx = dc_sign_ctx(plane, c4, bw4, r4, bh4);
          code(cdf_dc_sign[ptype][dctx], sign, 2);
          dc_cat = sign ? 1 : 2;
        } else {
          enc.encode_literal((uint32_t)sign, 1);
        }
      }
      if (a > 14) {
        uint32_t x = (uint32_t)(a - 14);
        int n = bitlength(x);
        for (int i = 0; i < n - 1; i++) enc.encode_literal(0, 1);
        enc.encode_literal(1, 1);
        for (int i = n - 2; i >= 0; i--)
          enc.encode_literal((x >> i) & 1, 1);
      }
      cul += a;
    }
    if (cul > 63) cul = 63;
    uint8_t packed = (uint8_t)(cul | (dc_cat << 6));
    for (int i = 0; i < w4w; i++) above_ctx[plane][c4 + i] = packed;
    for (int i = 0; i < h4w; i++) left_ctx[plane][r4 + i] = packed;
  }
};

// ---------------------------------------------------------------------------
// Block pipeline: intra predict + forward DCT + quantize + reconstruct.
// Mirrors av1/predict.py (bit-exact integer predictors) and av1/transforms.py
// (orthonormal float DCT with the calibrated decoder gain). Drives the
// TileCoder directly, so pass 2 of the encoder runs entirely native.
// ---------------------------------------------------------------------------

struct DctMatrix {
  int n = 0;
  std::vector<double> d;  // (n, n), rows = frequencies
};

const double PI = 3.14159265358979323846;

const DctMatrix& dct_matrix(int n) {
  static DctMatrix cache[8];
  int idx = bitlength((uint32_t)n) - 3;  // 4->0 .. 64->4
  DctMatrix& m = cache[idx];
  if (m.n != n) {
    m.n = n;
    m.d.resize((size_t)n * n);
    double s = std::sqrt(2.0 / n);
    for (int k = 0; k < n; k++)
      for (int j = 0; j < n; j++)
        m.d[(size_t)k * n + j] = s * std::cos(PI * (2 * j + 1) * k / (2 * n));
    double r = 1.0 / std::sqrt(2.0);
    for (int j = 0; j < n; j++) m.d[j] *= r;
  }
  return m;
}

// out = A(h x h) * X(h x w) * B(w x w)^T, all row-major doubles.
void mat_sandwich(const double* A, const double* X, const double* B, int h,
                  int w, double* tmp, double* out) {
  // tmp = A * X
  for (int i = 0; i < h; i++) {
    for (int j = 0; j < w; j++) tmp[(size_t)i * w + j] = 0.0;
    for (int k = 0; k < h; k++) {
      double a = A[(size_t)i * h + k];
      const double* xr = &X[(size_t)k * w];
      double* tr = &tmp[(size_t)i * w];
      for (int j = 0; j < w; j++) tr[j] += a * xr[j];
    }
  }
  // out = tmp * B^T  (out[i][j] = sum_k tmp[i][k] * B[j][k])
  for (int i = 0; i < h; i++) {
    const double* tr = &tmp[(size_t)i * w];
    double* orow = &out[(size_t)i * w];
    for (int j = 0; j < w; j++) {
      const double* br = &B[(size_t)j * w];
      double acc = 0.0;
      for (int k = 0; k < w; k++) acc += tr[k] * br[k];
      orow[j] = acc;
    }
  }
}

struct BlockPipe {
  const int32_t* src;  // (P, Hp, Wp) plane-major padded source
  int32_t* recon;      // same shape, scratch owned by caller or us
  std::vector<int32_t> recon_store;
  int P, Hp, Wp;
  int mi_rows, mi_cols;
  int mi_r0, mi_c0;  // tile origin (mi units)
  int bit_depth;
  int dc_q, ac_q;
  double gain;

  std::vector<double> fbuf, tbuf, cbuf, rbuf;
  std::vector<int32_t> lvbuf;
  std::vector<int32_t> pred;

  void init(const int32_t* s, int p, int hp, int wp, int mir, int mic,
            int r0, int c0, int bd, int dq, int aq, double g) {
    src = s; P = p; Hp = hp; Wp = wp;
    mi_rows = mir; mi_cols = mic; mi_r0 = r0; mi_c0 = c0;
    bit_depth = bd; dc_q = dq; ac_q = aq; gain = g;
    recon_store.assign((size_t)P * Hp * Wp, 0);
    recon = recon_store.data();
    fbuf.resize(64 * 64); tbuf.resize(64 * 64);
    cbuf.resize(64 * 64); rbuf.resize(64 * 64);
    lvbuf.resize(32 * 32); pred.resize(64 * 64);
  }

  // intra predict into pred[] (txh x txw), reading recon neighbors
  void predict(int pl, int px, int py, int txw, int txh, int mode) {
    const int32_t* rp = &recon[(size_t)pl * Hp * Wp];
    int rr4 = (py >> 2) - mi_r0;
    int cc4 = (px >> 2) - mi_c0;
    bool have_a = rr4 > 0;
    bool have_l = cc4 > 0;
    int base = 1 << (bit_depth - 1);
    int64_t above[64], left[64], al;
    if (!have_a && !have_l) {
      for (int i = 0; i < txw; i++) above[i] = base - 1;
      for (int i = 0; i < txh; i++) left[i] = base + 1;
      al = base;
    } else if (!have_a) {
      for (int i = 0; i < txh; i++) left[i] = rp[(size_t)(py + i) * Wp + px - 1];
      for (int i = 0; i < txw; i++) above[i] = left[0];
      al = left[0];
    } else if (!have_l) {
      for (int i = 0; i < txw; i++) above[i] = rp[(size_t)(py - 1) * Wp + px + i];
      for (int i = 0; i < txh; i++) left[i] = above[0];
      al = above[0];
    } else {
      for (int i = 0; i < txw; i++) above[i] = rp[(size_t)(py - 1) * Wp + px + i];
      for (int i = 0; i < txh; i++) left[i] = rp[(size_t)(py + i) * Wp + px - 1];
      al = rp[(size_t)(py - 1) * Wp + px - 1];
    }
    int32_t* out = pred.data();
    switch (mode) {
      case 0: {  // DC
        int64_t avg;
        if (have_a && have_l) {
          int64_t s = 0;
          for (int i = 0; i < txw; i++) s += above[i];
          for (int i = 0; i < txh; i++) s += left[i];
          avg = (s + ((txw + txh) >> 1)) / (txw + txh);
        } else if (have_a) {
          int64_t s = 0;
          for (int i = 0; i < txw; i++) s += above[i];
          avg = (s + (txw >> 1)) >> (bitlength((uint32_t)txw) - 1);
        } else if (have_l) {
          int64_t s = 0;
          for (int i = 0; i < txh; i++) s += left[i];
          avg = (s + (txh >> 1)) >> (bitlength((uint32_t)txh) - 1);
        } else {
          avg = base;
        }
        for (int i = 0; i < txh * txw; i++) out[i] = (int32_t)avg;
        break;
      }
      case 1:  // V
        for (int y = 0; y < txh; y++)
          for (int x = 0; x < txw; x++) out[y * txw + x] = (int32_t)above[x];
        break;
      case 2:  // H
        for (int y = 0; y < txh; y++)
          for (int x = 0; x < txw; x++) out[y * txw + x] = (int32_t)left[y];
        break;
      case 9: {  // SMOOTH
        const uint8_t* wh = g_tables.sm_weights[bitlength((uint32_t)txh) - 3].data();
        const uint8_t* ww = g_tables.sm_weights[bitlength((uint32_t)txw) - 3].data();
        int64_t below = left[txh - 1], right = above[txw - 1];
        for (int y = 0; y < txh; y++)
          for (int x = 0; x < txw; x++) {
            int64_t t = (int64_t)wh[y] * above[x] + (256 - wh[y]) * below +
                        (int64_t)ww[x] * left[y] + (256 - ww[x]) * right;
            out[y * txw + x] = (int32_t)((t + 256) >> 9);
          }
        break;
      }
      case 10: {  // SMOOTH_V
        const uint8_t* wh = g_tables.sm_weights[bitlength((uint32_t)txh) - 3].data();
        int64_t below = left[txh - 1];
        for (int y = 0; y < txh; y++)
          for (int x = 0; x < txw; x++) {
            int64_t t = (int64_t)wh[y] * above[x] + (256 - wh[y]) * below;
            out[y * txw + x] = (int32_t)((t + 128) >> 8);
          }
        break;
      }
      case 11: {  // SMOOTH_H
        const uint8_t* ww = g_tables.sm_weights[bitlength((uint32_t)txw) - 3].data();
        int64_t right = above[txw - 1];
        for (int y = 0; y < txh; y++)
          for (int x = 0; x < txw; x++) {
            int64_t t = (int64_t)ww[x] * left[y] + (256 - ww[x]) * right;
            out[y * txw + x] = (int32_t)((t + 128) >> 8);
          }
        break;
      }
      case 12: {  // PAETH
        for (int y = 0; y < txh; y++)
          for (int x = 0; x < txw; x++) {
            int64_t b = left[y] + above[x] - al;
            int64_t pl_ = b - left[y]; if (pl_ < 0) pl_ = -pl_;
            int64_t pt = b - above[x]; if (pt < 0) pt = -pt;
            int64_t ptl = b - al; if (ptl < 0) ptl = -ptl;
            int64_t v;
            if (pl_ <= pt && pl_ <= ptl) v = left[y];
            else if (pt <= ptl) v = above[x];
            else v = al;
            out[y * txw + x] = (int32_t)v;
          }
        break;
      }
      default:
        for (int i = 0; i < txh * txw; i++) out[i] = base;
    }
  }

  // Compute one txb with fixed mode: quantize + reconstruct.
  // Returns levels in lvbuf (ch x cw); recon plane updated. force_skip
  // zeroes levels and reconstructs as pure prediction.
  void compute_txb(int pl, int px, int py, int txw, int txh, int mode,
                   bool force_skip, int* out_ch, int* out_cw, bool* any_nz) {
    predict(pl, px, py, txw, txh, mode);
    int cw = txw < 32 ? txw : 32;
    int ch = txh < 32 ? txh : 32;
    *out_ch = ch; *out_cw = cw;
    int32_t* rp = &recon[(size_t)pl * Hp * Wp];
    const int32_t* sp = &src[(size_t)pl * Hp * Wp];
    int maxv = (1 << bit_depth) - 1;
    if (force_skip) {
      for (int i = 0; i < ch * cw; i++) lvbuf[i] = 0;
      *any_nz = false;
      for (int y = 0; y < txh; y++)
        for (int x = 0; x < txw; x++)
          rp[(size_t)(py + y) * Wp + px + x] = pred[y * txw + x];
      return;
    }
    // residual
    for (int y = 0; y < txh; y++)
      for (int x = 0; x < txw; x++)
        fbuf[y * txw + x] =
            (double)(sp[(size_t)(py + y) * Wp + px + x] - pred[y * txw + x]);
    const DctMatrix& dh = dct_matrix(txh);
    const DctMatrix& dw = dct_matrix(txw);
    mat_sandwich(dh.d.data(), fbuf.data(), dw.d.data(), txh, txw, tbuf.data(),
                 cbuf.data());
    // quantize coded area (top-left ch x cw of the txh x txw coef array);
    // clamp to the dequant conformance bound |level * q| < 1 << (7 + bd)
    // (spec 7.13.3 — transforms.level_limits mirrors this)
    double inv_ac = 1.0 / ((double)ac_q * gain);
    double inv_dc = 1.0 / ((double)dc_q * gain);
    int coeff_max = (1 << (7 + bit_depth)) - 1;
    int max_dc = coeff_max / dc_q; if (max_dc > 32767) max_dc = 32767;
    int max_ac = coeff_max / ac_q; if (max_ac > 32767) max_ac = 32767;
    bool nz = false;
    for (int y = 0; y < ch; y++)
      for (int x = 0; x < cw; x++) {
        bool is_dc = (y == 0 && x == 0);
        double t = cbuf[y * txw + x] * (is_dc ? inv_dc : inv_ac);
        // DC rounds to nearest; AC uses a deadzone (transforms.AC_BIAS)
        double a = std::floor(std::fabs(t) + (is_dc ? 0.5 : 0.35));
        int32_t lv = (int32_t)(t < 0 ? -a : a);
        int lim = is_dc ? max_dc : max_ac;
        if (lv > lim) lv = lim;
        if (lv < -lim) lv = -lim;
        lvbuf[y * cw + x] = lv;
        nz |= lv != 0;
      }
    *any_nz = nz;
    if (!nz) {
      for (int y = 0; y < txh; y++)
        for (int x = 0; x < txw; x++)
          rp[(size_t)(py + y) * Wp + px + x] = pred[y * txw + x];
      return;
    }
    // dequant + inverse (float model, gain folded in), embedded in txh x txw
    for (int i = 0; i < txh * txw; i++) cbuf[i] = 0.0;
    double s_ac = (double)ac_q * gain;
    double s_dc = (double)dc_q * gain;
    for (int y = 0; y < ch; y++)
      for (int x = 0; x < cw; x++)
        cbuf[y * txw + x] =
            lvbuf[y * cw + x] * (y == 0 && x == 0 ? s_dc : s_ac);
    // inverse: D^T * C * D  == mat_sandwich with transposed matrices.
    // Build transposes on the fly via a transposed multiply:
    // out = A^T C B with A=dh, B=dw: out[i][j] = sum_k sum_l dh[k][i] C[k][l] dw[l][j]
    // tmp = dh^T * C
    for (int i = 0; i < txh; i++) {
      for (int j = 0; j < txw; j++) tbuf[(size_t)i * txw + j] = 0.0;
    }
    for (int k = 0; k < txh; k++) {
      const double* crow = &cbuf[(size_t)k * txw];
      for (int i = 0; i < txh; i++) {
        double a = dh.d[(size_t)k * txh + i];
        double* tr = &tbuf[(size_t)i * txw];
        for (int j = 0; j < txw; j++) tr[j] += a * crow[j];
      }
    }
    // rbuf = tmp * dw  (rbuf[i][j] = sum_l tmp[i][l] * dw[l][j])
    for (int i = 0; i < txh; i++) {
      double* orow = &rbuf[(size_t)i * txw];
      for (int j = 0; j < txw; j++) orow[j] = 0.0;
      const double* tr = &tbuf[(size_t)i * txw];
      for (int l = 0; l < txw; l++) {
        double t = tr[l];
        const double* dr = &dw.d[(size_t)l * txw];
        for (int j = 0; j < txw; j++) orow[j] += t * dr[j];
      }
    }
    for (int y = 0; y < txh; y++)
      for (int x = 0; x < txw; x++) {
        long long v = (long long)pred[y * txw + x] +
                      (long long)std::llround(rbuf[y * txw + x]);
        if (v < 0) v = 0;
        if (v > maxv) v = maxv;
        rp[(size_t)(py + y) * Wp + px + x] = (int32_t)v;
      }
  }

  // Full leaf block: compute all txbs, then emit skip/modes/coeffs.
  void encode_block(TileCoder& tc, int r, int c, int w4, int h4, int y_mode,
                    int uv_mode, int num_planes) {
    int rr = r - mi_r0, cc = c - mi_c0;
    int bw = w4 * 4, bh = h4 * 4;
    int x0 = c * 4, y0 = r * 4;
    int mx = bw > bh ? bw : bh;
    bool force_skip = mx == 64;
    int cfl_allowed = mx <= 32;

    struct TxbRec { int pl, px, py, txw, txh, ch, cw, lvl_off; };
    TxbRec recs[32];
    int nrec = 0;
    static thread_local std::vector<int32_t> all_levels;
    all_levels.clear();
    bool any_nz = false;
    for (int pl = 0; pl < num_planes; pl++) {
      int txw = pl == 0 ? (bw < 64 ? bw : 64) : (bw < 32 ? bw : 32);
      int txh = pl == 0 ? (bh < 64 ? bh : 64) : (bh < 32 ? bh : 32);
      int mode = pl == 0 ? y_mode : uv_mode;
      for (int ty = 0; ty < bh; ty += txh)
        for (int tx = 0; tx < bw; tx += txw) {
          int px = x0 + tx, py = y0 + ty;
          if (px >= mi_cols * 4 || py >= mi_rows * 4) continue;
          int ch, cw; bool nz;
          compute_txb(pl, px, py, txw, txh, mode, force_skip, &ch, &cw, &nz);
          any_nz |= nz;
          int off = (int)all_levels.size();
          all_levels.insert(all_levels.end(), lvbuf.begin(),
                            lvbuf.begin() + ch * cw);
          recs[nrec++] = {pl, px, py, txw, txh, ch, cw, off};
        }
    }
    int skip = any_nz ? 0 : 1;
    tc.write_block(rr, cc, w4, h4, y_mode, uv_mode, skip, cfl_allowed);
    if (skip) return;
    for (int i = 0; i < nrec; i++) {
      const TxbRec& t = recs[i];
      int eq = (t.pl == 0 && t.txw == bw && t.txh == bh) ? 1 : 0;
      tc.write_coeffs(t.pl, (t.py / 4) - mi_r0, (t.px / 4) - mi_c0, t.txw,
                      t.txh, eq, t.ch, t.cw, &all_levels[t.lvl_off], y_mode);
    }
  }
};

}  // namespace

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

extern "C" {

int tc_set_cdf_table(int table_id, const uint16_t* data, int n) {
  std::vector<uint16_t>* dst = nullptr;
  SpecTables& T = g_tables;
  switch (table_id) {
    case 0: dst = &T.partition; break;
    case 1: dst = &T.kf_y; break;
    case 2: dst = &T.uv; break;
    case 3: dst = &T.skip; break;
    case 4: dst = &T.angle; break;
    case 5: dst = &T.txb_skip; break;
    case 6: dst = &T.eob_pt16; break;
    case 7: dst = &T.eob_pt32; break;
    case 8: dst = &T.eob_pt64; break;
    case 9: dst = &T.eob_pt128; break;
    case 10: dst = &T.eob_pt256; break;
    case 11: dst = &T.eob_pt512; break;
    case 12: dst = &T.eob_pt1024; break;
    case 13: dst = &T.eob_extra; break;
    case 14: dst = &T.base; break;
    case 15: dst = &T.base_eob; break;
    case 16: dst = &T.br; break;
    case 17: dst = &T.dc_sign; break;
    case 18: dst = &T.intra_ext_tx; break;
    default: return -1;
  }
  dst->assign(data, data + n);
  return 0;
}

int tc_set_scan(int w, int h, const int32_t* scan, const uint8_t* nzoff) {
  if (w < 4 || w > 32 || h < 4 || h > 32) return -1;
  int idx = size_idx(w, h);
  g_tables.scan[idx].assign(scan, scan + (size_t)w * h);
  g_tables.nzoff[idx].assign(nzoff, nzoff + (size_t)w * h);
  return 0;
}

int tc_set_sm_weights(int n, const uint8_t* w) {
  if (n < 4 || n > 64) return -1;
  g_tables.sm_weights[bitlength((uint32_t)n) - 3].assign(w, w + n);
  return 0;
}

// Full pass-2 tile encode: skeleton ops (partition walk + per-block modes),
// native predict/transform/quantize/reconstruct, entropy coding.
// src: (num_planes, Hp, Wp) plane-major padded int32 source.
int bp_encode_tile(const int32_t* src, int Hp, int Wp, int mi_rows,
                   int mi_cols, int mi_r0, int mi_r1, int mi_c0, int mi_c1,
                   int base_q, int bit_depth, int num_planes,
                   int disable_cdf_update, int reduced_tx_set,
                   int dc_q, int ac_q, double gain,
                   const int32_t* ops, int n_ops, uint8_t* out, int cap) {
  TileCoder tc;
  tc.init(mi_c0, mi_c1, mi_r0, mi_r1, base_q, num_planes, disable_cdf_update);
  tc.reduced_tx_set = reduced_tx_set != 0;
  BlockPipe bp;
  bp.init(src, num_planes, Hp, Wp, mi_rows, mi_cols, mi_r0, mi_c0, bit_depth,
          dc_q, ac_q, gain);
  int i = 0;
  while (i < n_ops) {
    switch (ops[i]) {
      case OP_CLEAR_LEFT:
        tc.clear_left();
        i += 1;
        break;
      case OP_PARTITION:
        tc.write_partition(ops[i + 1], ops[i + 2], ops[i + 3], ops[i + 4]);
        i += 5;
        break;
      case OP_SPLIT_BIN:
        tc.write_split_binary(ops[i + 1], ops[i + 2], ops[i + 3], ops[i + 4],
                              ops[i + 5]);
        i += 6;
        break;
      case OP_BLOCK_COMPUTE:
        bp.encode_block(tc, ops[i + 1], ops[i + 2], ops[i + 3], ops[i + 4],
                        ops[i + 5], ops[i + 6], num_planes);
        i += 7;
        break;
      default:
        return -2;
    }
  }
  return tc.enc.done(out, cap);
}

// Returns bytes written, or -1 on error / insufficient cap.
int tc_encode_tile(int mi_col_start, int mi_col_end, int mi_row_start,
                   int mi_row_end, int base_q, int num_planes,
                   int disable_cdf_update, int reduced_tx_set,
                   const int32_t* ops, int n_ops,
                   const int32_t* levels, uint8_t* out, int cap) {
  TileCoder tc;
  tc.init(mi_col_start, mi_col_end, mi_row_start, mi_row_end, base_q,
          num_planes, disable_cdf_update);
  tc.reduced_tx_set = reduced_tx_set != 0;
  int i = 0;
  while (i < n_ops) {
    switch (ops[i]) {
      case OP_CLEAR_LEFT:
        tc.clear_left();
        i += 1;
        break;
      case OP_PARTITION:
        tc.write_partition(ops[i + 1], ops[i + 2], ops[i + 3], ops[i + 4]);
        i += 5;
        break;
      case OP_SPLIT_BIN:
        tc.write_split_binary(ops[i + 1], ops[i + 2], ops[i + 3], ops[i + 4],
                              ops[i + 5]);
        i += 6;
        break;
      case OP_BLOCK:
        tc.write_block(ops[i + 1], ops[i + 2], ops[i + 3], ops[i + 4],
                       ops[i + 5], ops[i + 6], ops[i + 7], ops[i + 8]);
        i += 9;
        break;
      case OP_COEFFS:
        tc.write_coeffs(ops[i + 1], ops[i + 2], ops[i + 3], ops[i + 4],
                        ops[i + 5], ops[i + 6], ops[i + 7], ops[i + 8],
                        levels + ops[i + 9], ops[i + 10]);
        i += 11;
        break;
      default:
        return -1;
    }
  }
  return tc.enc.done(out, cap);
}

}  // extern "C"

// VVC slice-data parser: coding tree, intra CU syntax, residual coding.
// Emits device-ready syntax tensors (coefficient planes, per-min-CB mode
// planes, CU/TU record tables) for the JAX reconstruction pipeline.
//
// Behavioural parity targets (independent implementation):
//   coding tree / CU / TU     vvc_ctu.c:947-2330
//   syntax element decoding   vvc_cabac.c:950-1780
//   residual coding           vvc_cabac.c:1843-2460
//
// v1 toolset: all-intra, single tree, CU == CTU or no-split configs
// (split decoding lands with can_split), regular residual coding.
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "bits.h"
#include "cabac.h"
#include "cabac_tables.h"
#include "headers.h"

namespace vvc {
namespace {

constexpr int MODE_INTER = 0, MODE_INTRA = 1;
constexpr int INTRA_PLANAR = 0, INTRA_DC = 1, INTRA_HORZ = 18, INTRA_VERT = 50,
              INTRA_VDIAG = 66;

// Diagonal scan (spec 6.5.2), computed on demand.
struct DiagScan {
  std::vector<uint8_t> x, y;
};
const DiagScan& diag_scan(int log2_w, int log2_h) {
  static DiagScan cache[6][6];
  static bool init[6][6] = {};
  DiagScan& s = cache[log2_w][log2_h];
  if (!init[log2_w][log2_h]) {
    int bw = 1 << log2_w, bh = 1 << log2_h;
    int xx = 0, yy = 0;
    while ((int)s.x.size() < bw * bh) {
      while (yy >= 0) {
        if (xx < bw && yy < bh) {
          s.x.push_back(xx);
          s.y.push_back(yy);
        }
        yy--;
        xx++;
      }
      yy = xx;
      xx = 0;
    }
    init[log2_w][log2_h] = true;
  }
  return s;
}

}  // namespace

#pragma pack(push, 4)
struct CuRecord {
  int32_t x0, y0, w, h;        // luma coords
  int32_t pred_mode;           // MODE_*
  int32_t luma_mode;           // IntraPredModeY
  int32_t chroma_mode;         // derived IntraPredModeC
  int32_t qp;                  // QpY
  int32_t qp_c[3];             // Qp'Cb, Qp'Cr, Qp'CbCr
};
struct TuRecord {
  int32_t x0, y0, w, h;  // component coords
  int32_t c_idx;
  int32_t coded;
  int32_t qp;            // component QP used for dequant
  int32_t cu_index;      // owning CU
};
#pragma pack(pop)

struct FrameOut {
  int width = 0, height = 0, bit_depth = 8, chroma_format_idc = 1;
  int poc = 0, slice_qp = 26;
  int mcb_w = 0, mcb_h = 0;  // min-CB grid dims of the ipm plane
  int deblock_disabled = 0;
  int beta_offset[3] = {0, 0, 0};  // luma, cb, cr (x2 applied)
  int tc_offset[3] = {0, 0, 0};
  std::vector<int32_t> coeff[3];  // [h][w] raster planes (chroma at c-res)
  std::vector<CuRecord> cus;
  std::vector<TuRecord> tus;
  std::vector<int32_t> ipm;  // per-min-cb intra mode plane
};

class Decoder {
 public:
  int decode_au(const uint8_t* data, size_t size, std::string* err) {
    try {
      auto nals = split_annexb(data, size);
      for (auto& nal : nals) {
        BitReader r(nal.rbsp.data(), nal.rbsp.size());
        switch (nal.type) {
          case NAL_SPS:
            sps_ = parse_sps(r);
            has_sps_ = true;
            break;
          case NAL_PPS:
            VVC_UNSUPPORTED(!has_sps_, "PPS before SPS");
            pps_ = parse_pps(r, sps_);
            has_pps_ = true;
            break;
          default:
            if (nal_is_slice(nal.type)) {
              VVC_UNSUPPORTED(!has_sps_ || !has_pps_, "slice before SPS/PPS");
              decode_slice(nal, r);
            }
            break;
        }
      }
      return 0;
    } catch (const std::exception& e) {
      *err = e.what();
      return -1;
    }
  }

  FrameOut out;
  bool frame_ready = false;

 private:
  Sps sps_;
  Pps pps_;
  bool has_sps_ = false, has_pps_ = false;

  // parse-time state
  CabacStates ctxs_;
  CabacDecoder* cd_ = nullptr;
  SliceHeader sh_;
  int min_cb_log2_ = 2;
  int mcb_w_ = 0, mcb_h_ = 0;  // min-cb grid dims
  std::vector<int32_t> tab_ipm_, tab_cpm_;
  std::vector<int32_t> tab_cbw_, tab_cbh_, tab_cqt_;
  bool ctb_left_ = false, ctb_up_ = false;
  int qp_y_ = 26;
  // slice-level partition constraints (I-slice luma; spec 7.4.8)
  struct {
    int min_qt, max_bt, max_tt, max_mtt;
  } part_;

  int32_t ipm_at(int x_cb, int y_cb) const { return tab_ipm_[y_cb * mcb_w_ + x_cb]; }
  int32_t cpm_at(int x_cb, int y_cb) const { return tab_cpm_[y_cb * mcb_w_ + x_cb]; }

  int bin(int ctx) { return cd_->decode(ctxs_, ctx); }

  int truncated_binary(int c_max) {
    int n = c_max + 1;
    int k = 0;
    while ((2 << k) <= n) k++;  // k = floor(log2(n))
    int u = (1 << (k + 1)) - n;
    int v = (int)cd_->bypass_bits(k);
    if (v >= u) {
      v = (v << 1) | cd_->bypass();
      v -= u;
    }
    return v;
  }

  void decode_slice(const Nal& nal, BitReader& r) {
    sh_ = parse_slice_header(r, nal.type, sps_, pps_);
    VVC_UNSUPPORTED(sh_.sh_slice_type != 2, "inter slices (todo)");
    VVC_UNSUPPORTED(sps_.sps_qtbtt_dual_tree_intra_flag, "dual tree (todo)");
    VVC_UNSUPPORTED(sh_.sh_dep_quant_used_flag, "dep quant (todo)");
    VVC_UNSUPPORTED(sh_.sh_sign_data_hiding_used_flag, "sign hiding (todo)");
    VVC_UNSUPPORTED(sps_.sps_entropy_coding_sync_enabled_flag, "WPP (todo)");
    VVC_UNSUPPORTED(pps_.num_tile_columns * pps_.num_tile_rows != 1,
                    "tiles (todo)");

    // frame setup
  out.width = pps_.width;
    out.height = pps_.height;
    out.bit_depth = sps_.bit_depth;
    out.chroma_format_idc = sps_.sps_chroma_format_idc;
    out.poc = sh_.ph.ph_pic_order_cnt_lsb;
    out.slice_qp = sh_.slice_qp_y;
    out.coeff[0].assign((size_t)pps_.width * pps_.height, 0);
    int cw = pps_.width >> sps_.hshift_c, ch = pps_.height >> sps_.vshift_c;
    if (sps_.sps_chroma_format_idc) {
      out.coeff[1].assign((size_t)cw * ch, 0);
      out.coeff[2].assign((size_t)cw * ch, 0);
    }
    out.cus.clear();
    out.tus.clear();

    min_cb_log2_ = sps_.min_cb_log2_size_y;
    mcb_w_ = pps_.width >> min_cb_log2_;
    mcb_h_ = pps_.height >> min_cb_log2_;
    tab_ipm_.assign((size_t)mcb_w_ * mcb_h_, 0);
    tab_cpm_.assign((size_t)mcb_w_ * mcb_h_, MODE_INTER);
    tab_cbw_.assign((size_t)mcb_w_ * mcb_h_, 0);
    tab_cbh_.assign((size_t)mcb_w_ * mcb_h_, 0);
    tab_cqt_.assign((size_t)mcb_w_ * mcb_h_, 0);
    out.ipm.assign((size_t)mcb_w_ * mcb_h_, 0);
    out.mcb_w = mcb_w_;
    out.mcb_h = mcb_h_;
    out.deblock_disabled = sh_.sh_deblocking_filter_disabled_flag;
    for (int i = 0; i < 3; i++) {
      out.beta_offset[i] = pps_.beta_offset[i];
      out.tc_offset[i] = pps_.tc_offset[i];
    }

    // partition constraints for I-slice luma (no PH override)
    part_.min_qt = 1 << (sps_.log2_diff_min_qt_min_cb_intra_luma +
                         sps_.min_cb_log2_size_y);
    part_.max_bt = part_.min_qt << sps_.log2_diff_max_bt_min_qt_intra_luma;
    part_.max_tt = part_.min_qt << sps_.log2_diff_max_tt_min_qt_intra_luma;
    part_.max_mtt = sps_.max_mtt_depth_intra_luma;

    int init_type = 2 - sh_.sh_slice_type;
    if (sh_.sh_cabac_init_flag && sh_.sh_slice_type != 2) init_type ^= 3;
    int qp = sh_.slice_qp_y < 0 ? 0 : (sh_.slice_qp_y > 63 ? 63 : sh_.slice_qp_y);
    ctxs_.init(qp, init_type);
    qp_y_ = sh_.slice_qp_y;

    CabacDecoder cd(r.data(), r.size(), sh_.data_bitpos);
    cd_ = &cd;

    int ctb_w = (pps_.width + sps_.ctb_size_y - 1) >> sps_.ctb_log2_size_y;
    int ctb_h = (pps_.height + sps_.ctb_size_y - 1) >> sps_.ctb_log2_size_y;
    int n_ctus = ctb_w * ctb_h;
    int idx = 0;
    for (int ry = 0; ry < ctb_h; ry++) {
      for (int rx = 0; rx < ctb_w; rx++, idx++) {
        parse_ctu(rx, ry);
        if (idx == n_ctus - 1) {
          if (!cd.terminate())
            throw std::runtime_error("end_of_slice_one_bit != 1");
        }
      }
    }
    cd_ = nullptr;
    frame_ready = true;
  }

  void parse_ctu(int rx, int ry) {
    ctb_left_ = rx > 0;
    ctb_up_ = ry > 0;
    // SAO/ALF params would be parsed here (tools off for now)
    VVC_UNSUPPORTED(sh_.sh_sao_luma_used_flag || sh_.sh_sao_chroma_used_flag,
                    "sao parse (todo)");
    int x0 = rx << sps_.ctb_log2_size_y;
    int y0 = ry << sps_.ctb_log2_size_y;
    coding_tree(x0, y0, sps_.ctb_size_y, sps_.ctb_size_y, 0, 0, 0, 0,
                SPLIT_NONE);
  }

  // -- coding tree ----------------------------------------------------
  enum SplitMode {
    SPLIT_NONE = 0, SPLIT_TT_HOR, SPLIT_BT_HOR, SPLIT_TT_VER,
    SPLIT_BT_VER, SPLIT_QT
  };
  struct Allowed {
    bool qt, btv, bth, ttv, tth;
    bool any_mtt() const { return btv || bth || ttv || tth; }
    bool any() const { return qt || any_mtt(); }
  };

  // parity: vvc_ctu.c:521-620 (luma single tree)
  Allowed can_split(int x0, int y0, int w, int h, int mtt_depth,
                    int depth_offset, int part_idx, int last_split) const {
    Allowed a{true, true, true, true, true};
    int min_cb = 1 << sps_.min_cb_log2_size_y;
    if (mtt_depth) a.qt = false;
    if (w <= part_.min_qt) a.qt = false;
    int max_mtt = part_.max_mtt + depth_offset;
    if (w <= 2 * min_cb) {
      a.ttv = false;
      if (w <= min_cb) a.btv = false;
    }
    if (h <= 2 * min_cb) {
      a.tth = false;
      if (h <= min_cb) a.bth = false;
    }
    if (w > part_.max_bt || h > part_.max_bt) a.btv = a.bth = false;
    int max_tt = part_.max_tt < 64 ? part_.max_tt : 64;
    if (w > max_tt || h > max_tt) a.ttv = a.tth = false;
    if (mtt_depth >= max_mtt) a.btv = a.bth = a.ttv = a.tth = false;
    if (x0 + w > pps_.width) {
      a.ttv = a.tth = false;
      if (h > 64) a.btv = false;
      if (y0 + h <= pps_.height)
        a.bth = false;
      else if (w > part_.min_qt)
        a.btv = a.bth = false;
    }
    if (y0 + h > pps_.height) {
      a.btv = a.ttv = a.tth = false;
      if (w > 64) a.bth = false;
    }
    if (mtt_depth > 0 && part_idx == 1) {
      if (last_split == SPLIT_TT_VER) a.btv = false;
      else if (last_split == SPLIT_TT_HOR) a.bth = false;
    }
    if (w <= 64 && h > 64) a.btv = false;
    if (w > 64 && h <= 64) a.bth = false;
    return a;
  }

  void left_top_tab(const std::vector<int32_t>& tab_l,
                    const std::vector<int32_t>& tab_t, int x0, int y0,
                    int def_l, int def_t, int* left, int* top) const {
    int x0b = x0 & (sps_.ctb_size_y - 1);
    int y0b = y0 & (sps_.ctb_size_y - 1);
    *left = (ctb_left_ || x0b)
                ? tab_l[((size_t)(y0 >> min_cb_log2_)) * mcb_w_ +
                        ((x0 - 1) >> min_cb_log2_)]
                : def_l;
    *top = (ctb_up_ || y0b)
               ? tab_t[((size_t)((y0 - 1) >> min_cb_log2_)) * mcb_w_ +
                       (x0 >> min_cb_log2_)]
               : def_t;
  }

  // parity: ff_vvc_split_cu_flag / ff_vvc_split_mode (vvc_cabac.c:1086+)
  int decode_split(int x0, int y0, int w, int h, int cqt_depth, int mtt_depth,
                   const Allowed& a) {
    bool is_inside = (x0 + w <= pps_.width) && (y0 + h <= pps_.height);
    int split_flag;
    if (a.any() && is_inside) {
      int left_h, top_w;
      left_top_tab(tab_cbh_, tab_cbw_, x0, y0, h, w, &left_h, &top_w);
      int inc = (left_h < h) + (top_w < w);
      int na = a.btv + a.bth + a.ttv + a.tth + 2 * a.qt;
      inc += (na - 1) / 2 * 3;
      split_flag = bin(SPLIT_CU_FLAG + inc);
    } else {
      split_flag = !is_inside;
    }
    if (!split_flag) return SPLIT_NONE;

    bool allow_no_qt = a.any_mtt();
    int qt_flag;
    if (allow_no_qt && a.qt) {
      int dl, dt;
      left_top_tab(tab_cqt_, tab_cqt_, x0, y0, 0, 0, &dl, &dt);
      int inc = (dl > cqt_depth) + (dt > cqt_depth) + (cqt_depth >= 2) * 3;
      qt_flag = bin(SPLIT_QT_FLAG + inc);
    } else {
      qt_flag = !allow_no_qt || a.qt;
    }
    if (qt_flag) return SPLIT_QT;

    int vertical;
    if ((a.bth || a.tth) && (a.btv || a.ttv)) {
      int v = a.btv + a.ttv, hh = a.bth + a.tth;
      int inc;
      if (v > hh) {
        inc = 4;
      } else if (v < hh) {
        inc = 3;
      } else {
        int x0b = x0 & (sps_.ctb_size_y - 1);
        int y0b = y0 & (sps_.ctb_size_y - 1);
        bool avail_a = ctb_up_ || y0b;
        bool avail_l = ctb_left_ || x0b;
        int cw_above = avail_a ? tab_cbw_[((size_t)((y0 - 1) >> min_cb_log2_))
                                          * mcb_w_ + (x0 >> min_cb_log2_)] : 1;
        int ch_left = avail_l ? tab_cbh_[((size_t)(y0 >> min_cb_log2_))
                                         * mcb_w_ + ((x0 - 1) >> min_cb_log2_)]
                              : 1;
        int da = w / (avail_a ? cw_above : 1);
        int dl = h / (avail_l ? ch_left : 1);
        if (da == dl || !avail_a || !avail_l)
          inc = 0;
        else if (da < dl)
          inc = 1;
        else
          inc = 2;
      }
      vertical = bin(MTT_SPLIT_CU_VERTICAL_FLAG + inc);
    } else {
      vertical = !(a.bth || a.tth);
    }
    int binary;
    if ((a.btv && a.ttv && vertical) || (a.bth && a.tth && !vertical)) {
      int inc = 2 * vertical + (mtt_depth <= 1 ? 1 : 0);
      binary = bin(MTT_SPLIT_CU_BINARY_FLAG + inc);
    } else {
      if (!a.btv && !a.bth) binary = 0;
      else if (!a.ttv && !a.tth) binary = 1;
      else if (a.bth && a.ttv) binary = 1 - vertical;
      else binary = vertical;
    }
    static const int modes[4] = {SPLIT_TT_HOR, SPLIT_BT_HOR, SPLIT_TT_VER,
                                 SPLIT_BT_VER};
    return modes[(vertical << 1) + binary];
  }

  // parity: vvc_ctu.c:1826-1864 (derive_mode_type_condition, I-slice 4:2:0)
  void check_mode_type(int w, int h, int split) const {
    if (sps_.sps_chroma_format_idc != 1) return;
    int area = w * h;
    bool cond =
        (area == 64 && (split == SPLIT_QT || split == SPLIT_TT_HOR ||
                        split == SPLIT_TT_VER)) ||
        (area == 32 && (split == SPLIT_BT_HOR || split == SPLIT_BT_VER)) ||
        (area == 64 && (split == SPLIT_BT_HOR || split == SPLIT_BT_VER)) ||
        (area == 128 && (split == SPLIT_TT_HOR || split == SPLIT_TT_VER)) ||
        (w == 8 && split == SPLIT_BT_VER) || (w == 16 && split == SPLIT_TT_VER);
    VVC_UNSUPPORTED(cond, "local dual tree (modeTypeCondition) — todo");
  }

  void coding_tree(int x0, int y0, int cb_w, int cb_h, int cqt_depth,
                   int mtt_depth, int depth_offset, int part_idx,
                   int last_split) {
    Allowed a = can_split(x0, y0, cb_w, cb_h, mtt_depth, depth_offset,
                          part_idx, last_split);
    int split = decode_split(x0, y0, cb_w, cb_h, cqt_depth, mtt_depth, a);
    if (split == SPLIT_NONE) {
      coding_unit(x0, y0, cb_w, cb_h, cqt_depth);
      return;
    }
    check_mode_type(cb_w, cb_h, split);
    int W = pps_.width, H = pps_.height;
    switch (split) {
      case SPLIT_QT: {
        int x1 = x0 + cb_w / 2, y1 = y0 + cb_h / 2;
        coding_tree(x0, y0, cb_w / 2, cb_h / 2, cqt_depth + 1, 0, 0, 0, split);
        if (x1 < W)
          coding_tree(x1, y0, cb_w / 2, cb_h / 2, cqt_depth + 1, 0, 0, 1, split);
        if (y1 < H)
          coding_tree(x0, y1, cb_w / 2, cb_h / 2, cqt_depth + 1, 0, 0, 2, split);
        if (x1 < W && y1 < H)
          coding_tree(x1, y1, cb_w / 2, cb_h / 2, cqt_depth + 1, 0, 0, 3, split);
        break;
      }
      case SPLIT_BT_VER: {
        int doff = depth_offset + (x0 + cb_w > W ? 1 : 0);
        int x1 = x0 + cb_w / 2;
        coding_tree(x0, y0, cb_w / 2, cb_h, cqt_depth, mtt_depth + 1, doff, 0,
                    split);
        if (x1 < W)
          coding_tree(x1, y0, cb_w / 2, cb_h, cqt_depth, mtt_depth + 1, doff,
                      1, split);
        break;
      }
      case SPLIT_BT_HOR: {
        int doff = depth_offset + (y0 + cb_h > H ? 1 : 0);
        int y1 = y0 + cb_h / 2;
        coding_tree(x0, y0, cb_w, cb_h / 2, cqt_depth, mtt_depth + 1, doff, 0,
                    split);
        if (y1 < H)
          coding_tree(x0, y1, cb_w, cb_h / 2, cqt_depth, mtt_depth + 1, doff,
                      1, split);
        break;
      }
      case SPLIT_TT_VER:
        coding_tree(x0, y0, cb_w / 4, cb_h, cqt_depth, mtt_depth + 1,
                    depth_offset, 0, split);
        coding_tree(x0 + cb_w / 4, y0, cb_w / 2, cb_h, cqt_depth,
                    mtt_depth + 1, depth_offset, 1, split);
        coding_tree(x0 + 3 * cb_w / 4, y0, cb_w / 4, cb_h, cqt_depth,
                    mtt_depth + 1, depth_offset, 2, split);
        break;
      case SPLIT_TT_HOR:
        coding_tree(x0, y0, cb_w, cb_h / 4, cqt_depth, mtt_depth + 1,
                    depth_offset, 0, split);
        coding_tree(x0, y0 + cb_h / 4, cb_w, cb_h / 2, cqt_depth,
                    mtt_depth + 1, depth_offset, 1, split);
        coding_tree(x0, y0 + 3 * cb_h / 4, cb_w, cb_h / 4, cqt_depth,
                    mtt_depth + 1, depth_offset, 2, split);
        break;
    }
  }

  // -- intra CU -------------------------------------------------------
  void coding_unit(int x0, int y0, int cb_w, int cb_h, int cqt_depth) {
    // I-slice, no IBC: pred mode inferred MODE_INTRA
    CuRecord cu = {};
    cu.x0 = x0;
    cu.y0 = y0;
    cu.w = cb_w;
    cu.h = cb_h;
    cu.pred_mode = MODE_INTRA;
    cu.luma_mode = decode_luma_intra_mode(x0, y0, cb_w, cb_h);
    set_cb_tab(tab_ipm_, x0, y0, cb_w, cb_h, cu.luma_mode);
    set_cb_tab(tab_cpm_, x0, y0, cb_w, cb_h, MODE_INTRA);
    set_cb_tab(out.ipm, x0, y0, cb_w, cb_h, cu.luma_mode);
    set_cb_tab(tab_cbw_, x0, y0, cb_w, cb_h, cb_w);
    set_cb_tab(tab_cbh_, x0, y0, cb_w, cb_h, cb_h);
    set_cb_tab(tab_cqt_, x0, y0, cb_w, cb_h, cqt_depth);
    int chroma_mode_idx = 4;
    if (sps_.sps_chroma_format_idc) {
      VVC_UNSUPPORTED(sps_.sps_cclm_enabled_flag, "cclm (todo)");
      if (!bin(INTRA_CHROMA_PRED_MODE)) {
        chroma_mode_idx = 4;
      } else {
        chroma_mode_idx = (int)cd_->bypass_bits(2);
      }
      cu.chroma_mode = derive_chroma_mode(chroma_mode_idx, cu.luma_mode,
                                          x0, y0, cb_w, cb_h);
    }
    // coded_flag inferred 1; qp derivation (no cu_qp_delta)
    cu.qp = qp_y_;
    derive_qp_c(cu);
    int cu_index = (int)out.cus.size();
    transform_unit(cu, cu_index);
    out.cus.push_back(cu);
    VVC_UNSUPPORTED(sps_.sps_lfnst_enabled_flag, "lfnst (todo)");
    VVC_UNSUPPORTED(sps_.sps_mts_enabled_flag, "mts (todo)");
  }

  void set_cb_tab(std::vector<int32_t>& tab, int x0, int y0, int w, int h,
                  int32_t v) {
    int xs = x0 >> min_cb_log2_, ys = y0 >> min_cb_log2_;
    for (int y = 0; y < (h >> min_cb_log2_); y++)
      for (int x = 0; x < (w >> min_cb_log2_); x++)
        tab[(ys + y) * mcb_w_ + xs + x] = v;
  }

  int decode_luma_intra_mode(int x0, int y0, int cb_w, int cb_h) {
    // parity: vvc_ctu.c:680-789 (luma_intra_pred_mode + MPM list)
    int mpm_flag = bin(INTRA_LUMA_MPM_FLAG);
    int not_planar = 1, mpm_idx = 0, remainder = 0;
    if (mpm_flag) {
      not_planar = bin(INTRA_LUMA_NOT_PLANAR_FLAG + 1);  // +1: no ISP
      if (not_planar)
        while (mpm_idx < 4 && cd_->bypass()) mpm_idx++;
    } else {
      remainder = truncated_binary(60);
    }
    if (mpm_flag && !not_planar) return INTRA_PLANAR;

    int ctb_mask = sps_.ctb_size_y - 1;
    int x_a = (x0 - 1) >> min_cb_log2_, y_a = (y0 + cb_h - 1) >> min_cb_log2_;
    int x_b = (x0 + cb_w - 1) >> min_cb_log2_, y_b = (y0 - 1) >> min_cb_log2_;
    int x0b = x0 & ctb_mask, y0b = y0 & ctb_mask;
    bool avail_l = ctb_left_ || x0b;
    bool avail_u = ctb_up_ || y0b;
    int a = INTRA_PLANAR, b = INTRA_PLANAR;
    if (avail_l && cpm_at(x_a, y_a) == MODE_INTRA) a = ipm_at(x_a, y_a);
    if (avail_u && cpm_at(x_b, y_b) == MODE_INTRA && y0b) b = ipm_at(x_b, y_b);

    int cand[5];
    if (a == b && a > INTRA_DC) {
      cand[0] = a;
      cand[1] = 2 + ((a + 61) % 64);
      cand[2] = 2 + ((a - 1) % 64);
      cand[3] = 2 + ((a + 60) % 64);
      cand[4] = 2 + (a % 64);
    } else {
      int minab = a < b ? a : b, maxab = a < b ? b : a;
      if (a > INTRA_DC && b > INTRA_DC) {
        int diff = maxab - minab;
        cand[0] = a;
        cand[1] = b;
        if (diff == 1) {
          cand[2] = 2 + ((minab + 61) % 64);
          cand[3] = 2 + ((maxab - 1) % 64);
          cand[4] = 2 + ((minab + 60) % 64);
        } else if (diff >= 62) {
          cand[2] = 2 + ((minab - 1) % 64);
          cand[3] = 2 + ((maxab + 61) % 64);
          cand[4] = 2 + (minab % 64);
        } else if (diff == 2) {
          cand[2] = 2 + ((minab - 1) % 64);
          cand[3] = 2 + ((minab + 61) % 64);
          cand[4] = 2 + ((maxab - 1) % 64);
        } else {
          cand[2] = 2 + ((minab + 61) % 64);
          cand[3] = 2 + ((minab - 1) % 64);
          cand[4] = 2 + ((maxab + 61) % 64);
        }
      } else if (a > INTRA_DC || b > INTRA_DC) {
        cand[0] = maxab;
        cand[1] = 2 + ((maxab + 61) % 64);
        cand[2] = 2 + ((maxab - 1) % 64);
        cand[3] = 2 + ((maxab + 60) % 64);
        cand[4] = 2 + (maxab % 64);
      } else {
        cand[0] = INTRA_DC;
        cand[1] = INTRA_VERT;
        cand[2] = INTRA_HORZ;
        cand[3] = INTRA_VERT - 4;
        cand[4] = INTRA_VERT + 4;
      }
    }
    if (mpm_flag) return cand[mpm_idx];
    // remainder: rank among non-MPM modes
    for (int i = 0; i < 5; i++)  // insertion sort (5 elems)
      for (int j = i + 1; j < 5; j++)
        if (cand[j] < cand[i]) std::swap(cand[i], cand[j]);
    int pred = remainder + 1;
    for (int i = 0; i < 5; i++)
      if (pred >= cand[i]) pred++;
    return pred;
  }

  int derive_chroma_mode(int idx, int luma_mode, int x0, int y0, int cb_w,
                         int cb_h) {
    // center luma mode (single tree, no MIP yet -> CU's own mode works,
    // but use the center sample for parity with split CUs later)
    int xc = (x0 + cb_w / 2) >> min_cb_log2_;
    int yc = (y0 + cb_h / 2) >> min_cb_log2_;
    int center = ipm_at(xc, yc);
    (void)luma_mode;
    if (idx == 4) return center;
    static const int pred_mode_c[4][5] = {
        {INTRA_VDIAG, INTRA_PLANAR, INTRA_PLANAR, INTRA_PLANAR, INTRA_PLANAR},
        {INTRA_VERT, INTRA_VDIAG, INTRA_VERT, INTRA_VERT, INTRA_VERT},
        {INTRA_HORZ, INTRA_HORZ, INTRA_VDIAG, INTRA_HORZ, INTRA_HORZ},
        {INTRA_DC, INTRA_DC, INTRA_DC, INTRA_VDIAG, INTRA_DC},
    };
    static const int modes[4] = {INTRA_PLANAR, INTRA_VERT, INTRA_HORZ, INTRA_DC};
    int m;
    for (m = 0; m < 4; m++)
      if (modes[m] == center) break;
    return pred_mode_c[idx][m];
  }

  void derive_qp_c(CuRecord& cu) {
    // parity: vvc_ctu.c set_qp_c (spec 8.7.1)
    int off = sps_.qp_bd_offset;
    int qp_luma = cu.qp + off;  // single tree
    int qp_chroma = qp_luma < 0 ? 0 : (qp_luma > 63 + off ? 63 + off : qp_luma);
    int sh_off[3] = {sh_.sh_cb_qp_offset, sh_.sh_cr_qp_offset,
                     sh_.sh_joint_cbcr_qp_offset};
    for (int i = 0; i < 2 + sps_.sps_joint_cbcr_enabled_flag; i++) {
      int qp = sps_.chroma_qp_table[i][qp_chroma];
      qp = qp + pps_.chroma_qp_offset[i] + sh_off[i];
      qp = qp < -off ? -off : (qp > 63 ? 63 : qp);
      cu.qp_c[i] = qp + off;
    }
  }

  // -- transform unit -------------------------------------------------
  void transform_unit(CuRecord& cu, int cu_index) {
    VVC_UNSUPPORTED(cu.w > sps_.max_tb_size_y || cu.h > sps_.max_tb_size_y,
                    "transform tree split (todo)");
    bool chroma_avail = sps_.sps_chroma_format_idc != 0;
    int cb_coded = 0, cr_coded = 0;
    if (chroma_avail) {
      cb_coded = bin(TU_CB_CODED_FLAG);
      cr_coded = bin(TU_CR_CODED_FLAG + cb_coded);
    }
    // intra -> tu_y_coded_flag present, inc 0
    int y_coded = bin(TU_Y_CODED_FLAG);
    VVC_UNSUPPORTED(pps_.pps_cu_qp_delta_enabled_flag, "cu qp delta (todo)");
    VVC_UNSUPPORTED(sps_.sps_joint_cbcr_enabled_flag, "joint cbcr (todo)");
    VVC_UNSUPPORTED(sps_.sps_transform_skip_enabled_flag, "transform skip (todo)");

    int hs = sps_.hshift_c, vs = sps_.vshift_c;
    struct {
      int c_idx, x, y, w, h, coded, qp;
    } tbs[3] = {
        {0, cu.x0, cu.y0, cu.w, cu.h, y_coded, cu.qp + sps_.qp_bd_offset},
        {1, cu.x0 >> hs, cu.y0 >> vs, cu.w >> hs, cu.h >> vs, cb_coded, cu.qp_c[0]},
        {2, cu.x0 >> hs, cu.y0 >> vs, cu.w >> hs, cu.h >> vs, cr_coded, cu.qp_c[1]},
    };
    int n_tbs = chroma_avail ? 3 : 1;
    for (int i = 0; i < n_tbs; i++) {
      auto& tb = tbs[i];
      if (tb.coded) residual_coding(tb.x, tb.y, tb.w, tb.h, tb.c_idx);
      TuRecord tr = {tb.x, tb.y, tb.w, tb.h, tb.c_idx, tb.coded, tb.qp, cu_index};
      out.tus.push_back(tr);
    }
  }

  // -- residual coding (regular) --------------------------------------
  // parity: vvc_cabac.c:1843-2460
  struct RcCtx {
    int log2_sb_w, log2_sb_h, num_sb_coeff;
    int w_sbs, h_sbs;
    int last_sb, last_pos;
    int last_x, last_y;
    int rem_bins;
    const DiagScan* sb_scan;
    const DiagScan* scan;
    int plane_w;  // tb width (for local arrays)
    std::vector<int32_t> abs_level, abs_level_pass1, sig;
    std::vector<uint8_t> sb_coded;
  };

  static int local_sum(const std::vector<int32_t>& v, int w, int h, int xc,
                       int yc) {
    int s = 0;
    const int32_t* p = v.data() + (size_t)yc * w + xc;
    if (xc < w - 1) {
      s += p[1];
      if (xc < w - 2) s += p[2];
      if (yc < h - 1) s += p[w + 1];
    }
    if (yc < h - 1) {
      s += p[w];
      if (yc < h - 2) s += p[2 * w];
    }
    return s;
  }

  int sig_ctx_inc(const RcCtx& rc, int tb_w, int tb_h, int xc, int yc,
                  int c_idx) {
    int d = xc + yc;
    int loc = local_sum(rc.abs_level_pass1, tb_w, tb_h, xc, yc);
    int m = (loc + 1) >> 1;
    if (m > 3) m = 3;
    if (c_idx == 0) return m + (d < 2 ? 8 : (d < 5 ? 4 : 0));
    return 36 + m + (d < 2 ? 4 : 0);
  }

  int gtx_ctx_inc(const RcCtx& rc, int tb_w, int tb_h, int xc, int yc,
                  int c_idx, bool is_last) {
    if (is_last) return c_idx == 0 ? 0 : 21;
    int d = xc + yc;
    int loc_sig = local_sum(rc.sig, tb_w, tb_h, xc, yc);
    int loc_p1 = local_sum(rc.abs_level_pass1, tb_w, tb_h, xc, yc);
    int offset = loc_p1 - loc_sig;
    if (offset > 4) offset = 4;
    if (c_idx == 0)
      return 1 + offset + (d == 0 ? 15 : (d < 3 ? 10 : (d < 10 ? 5 : 0)));
    return 22 + offset + (d == 0 ? 5 : 0);
  }

  static const int* rice_params() {
    static const int t[32] = {0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 2, 2,
                              2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 3, 3, 3};
    return t;
  }

  int rice_param(const RcCtx& rc, int tb_w, int tb_h, int xc, int yc,
                 int base_level) {
    int loc = local_sum(rc.abs_level, tb_w, tb_h, xc, yc) - base_level * 5;
    if (loc < 0) loc = 0;
    if (loc > 31) loc = 31;
    return rice_params()[loc];
  }

  int abs_decode(int c_rice) {
    const int MAX_BIN = 6;
    int prefix = 0;
    while (prefix < MAX_BIN && cd_->bypass()) prefix++;
    if (prefix < MAX_BIN) return (prefix << c_rice) + (int)cd_->bypass_bits(c_rice);
    // limited EGk, k = c_rice + 1
    int k = c_rice + 1;
    int max_pre = 26 - sps_.log2_transform_range;
    int pre = 0;
    while (pre < max_pre && cd_->bypass()) pre++;
    int esc = pre == max_pre ? sps_.log2_transform_range : pre + k;
    int val = (int)cd_->bypass_bits(esc);
    val += ((1 << pre) - 1) << k;
    return val + (MAX_BIN << c_rice);
  }

  int last_sig_prefix(int log2_tb_size, int log2_zo_size, int c_idx, int base) {
    int maximum = (log2_zo_size << 1) - 1;
    int ctx_offset, ctx_shift;
    if (c_idx == 0) {
      static const int offset_y[] = {0, 0, 3, 6, 10, 15};
      ctx_offset = offset_y[log2_tb_size - 1];
      ctx_shift = (log2_tb_size + 1) >> 2;
    } else {
      static const int shifts[] = {0, 0, 0, 1, 2, 2, 2};
      ctx_offset = 20;
      ctx_shift = shifts[log2_tb_size];
    }
    int i = 0;
    while (i < maximum && bin(base + (i >> ctx_shift) + ctx_offset)) i++;
    return i;
  }

  void residual_coding(int x0, int y0, int tb_w, int tb_h, int c_idx) {
    int log2_w = 0, log2_h = 0;
    while ((1 << log2_w) < tb_w) log2_w++;
    while ((1 << log2_h) < tb_h) log2_h++;
    int zo_w = log2_w < 5 ? log2_w : 5;
    int zo_h = log2_h < 5 ? log2_h : 5;

    RcCtx rc;
    rc.log2_sb_w = (zo_w < 2 || zo_h < 2) ? 1 : 2;
    rc.log2_sb_h = rc.log2_sb_w;
    if (zo_w + zo_h > 3) {
      if (zo_w < 2) {
        rc.log2_sb_w = zo_w;
        rc.log2_sb_h = 4 - rc.log2_sb_w;
      } else if (zo_h < 2) {
        rc.log2_sb_h = zo_h;
        rc.log2_sb_w = 4 - rc.log2_sb_h;
      }
    }
    rc.num_sb_coeff = 1 << (rc.log2_sb_w + rc.log2_sb_h);
    rc.w_sbs = 1 << (zo_w - rc.log2_sb_w);
    rc.h_sbs = 1 << (zo_h - rc.log2_sb_h);
    rc.rem_bins = ((1 << (zo_w + zo_h)) * 7) >> 2;
    rc.sb_scan = &diag_scan(zo_w - rc.log2_sb_w, zo_h - rc.log2_sb_h);
    rc.scan = &diag_scan(rc.log2_sb_w, rc.log2_sb_h);
    rc.abs_level.assign((size_t)tb_w * tb_h, 0);
    rc.abs_level_pass1.assign((size_t)tb_w * tb_h, 0);
    rc.sig.assign((size_t)tb_w * tb_h, 0);
    rc.sb_coded.assign((size_t)rc.w_sbs * rc.h_sbs, 0);

    // last significant coefficient position
    int px = last_sig_prefix(log2_w, zo_w, c_idx, LAST_SIG_COEFF_X_PREFIX);
    int py = last_sig_prefix(log2_h, zo_h, c_idx, LAST_SIG_COEFF_Y_PREFIX);
    int last_x = px, last_y = py;
    if (px > 3) {
      int len = (px >> 1) - 1;
      int suffix = (int)cd_->bypass_bits(len);
      last_x = (1 << ((px >> 1) - 1)) * (2 + (px & 1)) + suffix;
    }
    if (py > 3) {
      int len = (py >> 1) - 1;
      int suffix = (int)cd_->bypass_bits(len);
      last_y = (1 << ((py >> 1) - 1)) * (2 + (py & 1)) + suffix;
    }
    rc.last_x = last_x;
    rc.last_y = last_y;

    // derive last_sub_block / last_scan_pos
    int last_scan_pos = rc.num_sb_coeff;
    int last_sb =
        (1 << (zo_w + zo_h - rc.log2_sb_w - rc.log2_sb_h)) - 1;
    int xc, yc;
    do {
      if (last_scan_pos == 0) {
        last_scan_pos = rc.num_sb_coeff;
        last_sb--;
      }
      last_scan_pos--;
      int xs = rc.sb_scan->x[last_sb], ys = rc.sb_scan->y[last_sb];
      xc = (xs << rc.log2_sb_w) + rc.scan->x[last_scan_pos];
      yc = (ys << rc.log2_sb_h) + rc.scan->y[last_scan_pos];
    } while (xc != last_x || yc != last_y);
    rc.last_sb = last_sb;
    rc.last_pos = last_scan_pos;

    int32_t* plane;
    int plane_w;
    if (c_idx == 0) {
      plane = out.coeff[0].data();
      plane_w = out.width;
    } else {
      plane = out.coeff[c_idx].data();
      plane_w = out.width >> sps_.hshift_c;
    }

    for (int i = last_sb; i >= 0; i--)
      residual_subblock(rc, i, tb_w, tb_h, c_idx, plane, plane_w, x0, y0);
  }

  void residual_subblock(RcCtx& rc, int i, int tb_w, int tb_h, int c_idx,
                         int32_t* plane, int plane_w, int x0, int y0) {
    int xs = rc.sb_scan->x[i], ys = rc.sb_scan->y[i];
    uint8_t* sbc = &rc.sb_coded[(size_t)ys * rc.w_sbs + xs];
    int infer_sb_dc_sig = 0;
    if (i < rc.last_sb && i > 0) {
      int right = xs < rc.w_sbs - 1 ? sbc[1] : 0;
      int bottom = ys < rc.h_sbs - 1 ? sbc[rc.w_sbs] : 0;
      int inc = (right | bottom) + (c_idx ? 2 : 0);
      *sbc = bin(SB_CODED_FLAG + inc);
      infer_sb_dc_sig = 1;
    } else {
      *sbc = 1;
    }
    if (!*sbc) return;
    // (mts zero-out tracking lands with MTS support)

    int first_pos_mode0 = i == rc.last_sb ? rc.last_pos : rc.num_sb_coeff - 1;
    int first_pos_mode1 = first_pos_mode0;
    std::vector<int> gt2(rc.num_sb_coeff, 0);
    int first_sig = rc.num_sb_coeff, last_sig_sb = -1;

    int n = first_pos_mode0;
    for (; n >= 0 && rc.rem_bins >= 4; n--) {
      int xc = (xs << rc.log2_sb_w) + rc.scan->x[n];
      int yc = (ys << rc.log2_sb_h) + rc.scan->y[n];
      bool is_last = xc == rc.last_x && yc == rc.last_y;
      size_t off = (size_t)yc * tb_w + xc;
      int sig;
      if ((n > 0 || !infer_sb_dc_sig) && !is_last) {
        sig = bin(SIG_COEFF_FLAG + sig_ctx_inc(rc, tb_w, tb_h, xc, yc, c_idx));
        rc.rem_bins--;
        if (sig) infer_sb_dc_sig = 0;
      } else {
        sig = is_last ||
              (rc.scan->x[n] == 0 && rc.scan->y[n] == 0 && infer_sb_dc_sig);
      }
      rc.sig[off] = sig;
      int p1 = 0;
      if (sig) {
        int inc = gtx_ctx_inc(rc, tb_w, tb_h, xc, yc, c_idx, is_last);
        int gt1 = bin(ABS_LEVEL_GTX_FLAG + inc);
        rc.rem_bins--;
        int par = 0;
        if (gt1) {
          par = bin(PAR_LEVEL_FLAG + inc);
          gt2[n] = bin(ABS_LEVEL_GTX_FLAG + inc + 32);
          rc.rem_bins -= 2;
        }
        if (last_sig_sb == -1) last_sig_sb = n;
        first_sig = n;
        p1 = 1 + par + gt1 + (gt2[n] << 1);
      }
      rc.abs_level_pass1[off] = p1;
      first_pos_mode1 = n - 1;
    }
    for (n = first_pos_mode0; n > first_pos_mode1; n--) {
      int xc = (xs << rc.log2_sb_w) + rc.scan->x[n];
      int yc = (ys << rc.log2_sb_h) + rc.scan->y[n];
      size_t off = (size_t)yc * tb_w + xc;
      rc.abs_level[off] = rc.abs_level_pass1[off];
      if (gt2[n]) {
        int c_rice = rice_param(rc, tb_w, tb_h, xc, yc, 4);
        int rem = abs_decode(c_rice);
        rc.abs_level[off] += 2 * rem;
      }
    }
    for (n = first_pos_mode1; n >= 0; n--) {
      int xc = (xs << rc.log2_sb_w) + rc.scan->x[n];
      int yc = (ys << rc.log2_sb_h) + rc.scan->y[n];
      size_t off = (size_t)yc * tb_w + xc;
      int c_rice = rice_param(rc, tb_w, tb_h, xc, yc, 0);
      int dec = abs_decode(c_rice);
      int zero_pos = 1 << c_rice;  // qstate < 2 (dep quant off)
      int abs = 0;
      if (dec != zero_pos) {
        abs = dec;
        if (dec < zero_pos) abs += 1;
      }
      rc.abs_level[off] = abs;
      if (abs > 0) {
        if (last_sig_sb == -1) last_sig_sb = n;
        first_sig = n;
      }
    }
    // sign pass (no sign hiding / dep quant)
    for (n = first_pos_mode0; n >= 0; n--) {
      int xc = (xs << rc.log2_sb_w) + rc.scan->x[n];
      int yc = (ys << rc.log2_sb_h) + rc.scan->y[n];
      size_t off = (size_t)yc * tb_w + xc;
      int abs = rc.abs_level[off];
      if (abs > 0) {
        int sign = cd_->bypass();
        plane[(size_t)(y0 + yc) * plane_w + (x0 + xc)] = sign ? -abs : abs;
      }
    }
  }
};

// ---------------- C API ----------------
extern "C" {

void* vvch_new() { return new Decoder(); }
void vvch_free(void* h) { delete (Decoder*)h; }

static thread_local std::string g_err;

int vvch_decode_au(void* h, const uint8_t* data, int len) {
  auto* d = (Decoder*)h;
  d->frame_ready = false;
  return d->decode_au(data, (size_t)len, &g_err);
}

const char* vvch_last_error() { return g_err.c_str(); }

// info: [frame_ready,width,height,bit_depth,chroma_idc,poc,slice_qp,
//        n_cus,n_tus,mcb_w,mcb_h,deblock_disabled,
//        beta_off_l,beta_off_cb,beta_off_cr,tc_off_l,tc_off_cb,tc_off_cr]
void vvch_frame_info(void* h, int32_t* info) {
  auto* d = (Decoder*)h;
  const FrameOut& o = d->out;
  info[0] = d->frame_ready;
  info[1] = o.width;
  info[2] = o.height;
  info[3] = o.bit_depth;
  info[4] = o.chroma_format_idc;
  info[5] = o.poc;
  info[6] = o.slice_qp;
  info[7] = (int32_t)o.cus.size();
  info[8] = (int32_t)o.tus.size();
  info[9] = o.mcb_w;
  info[10] = o.mcb_h;
  info[11] = o.deblock_disabled;
  for (int i = 0; i < 3; i++) {
    info[12 + i] = o.beta_offset[i];
    info[15 + i] = o.tc_offset[i];
  }
}

const int32_t* vvch_coeffs(void* h, int c_idx) {
  return ((Decoder*)h)->out.coeff[c_idx].data();
}
const int32_t* vvch_cus(void* h) {
  return (const int32_t*)((Decoder*)h)->out.cus.data();
}
const int32_t* vvch_tus(void* h) {
  return (const int32_t*)((Decoder*)h)->out.tus.data();
}
const int32_t* vvch_ipm(void* h) { return ((Decoder*)h)->out.ipm.data(); }

int vvch_cu_record_size() { return (int)(sizeof(CuRecord) / 4); }
int vvch_tu_record_size() { return (int)(sizeof(TuRecord) / 4); }

}  // extern "C"

}  // namespace vvc

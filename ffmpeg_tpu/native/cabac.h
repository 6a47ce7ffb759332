// H.266 CABAC arithmetic decoder (spec 9.3.4): two-rate adaptive
// probability states, 9-bit range register.  Independent spec-style
// implementation; behavioural parity target vvc_cabac.c:813-911.
#pragma once

#include <cstdint>

#include "cabac_tables.h"

namespace vvc {

struct CabacStates {
  int32_t state0[kNumContexts];
  int32_t state1[kNumContexts];
  int32_t shift0[kNumContexts];
  int32_t shift1[kNumContexts];

  void init(int qp, int init_type) {
    if (qp < 0) qp = 0;
    if (qp > 63) qp = 63;
    for (int i = 0; i < kNumContexts; i++) {
      int init_value = kInitValues[init_type][i];
      int shift_idx = kInitValues[3][i];
      int m = (init_value >> 3) - 4;
      int n = (init_value & 7) * 18 + 1;
      int pre = ((m * (qp - 16)) >> 1) + n;
      pre = pre < 1 ? 1 : (pre > 127 ? 127 : pre);
      state0[i] = pre << 3;
      state1[i] = pre << 7;
      shift0[i] = (shift_idx >> 2) + 2;
      shift1[i] = (shift_idx & 3) + 3 + shift0[i];
    }
  }
};

class CabacDecoder {
 public:
  // data/size: RBSP slice payload; bitpos must be byte aligned.
  CabacDecoder(const uint8_t* data, size_t size, size_t bitpos)
      : data_(data), size_(size), pos_(bitpos) {
    range_ = 510;
    offset_ = read_bits(9);
  }

  int decode(CabacStates& s, int ctx) {
    int p_state = s.state1[ctx] + (s.state0[ctx] << 4);
    int val_mps = p_state >> 14;
    int q_range = range_ >> 5;
    int prob = val_mps ? 32767 - p_state : p_state;
    int lps = ((q_range * (prob >> 9)) >> 1) + 4;
    int bin;
    range_ -= lps;
    if (offset_ < range_) {
      bin = val_mps;
    } else {
      bin = 1 - val_mps;
      offset_ -= range_;
      range_ = lps;
    }
    while (range_ < 256) {
      range_ <<= 1;
      offset_ = (offset_ << 1) | read_bits(1);
    }
    s.state0[ctx] += ((1023 * bin) >> s.shift0[ctx]) - (s.state0[ctx] >> s.shift0[ctx]);
    s.state1[ctx] += ((16383 * bin) >> s.shift1[ctx]) - (s.state1[ctx] >> s.shift1[ctx]);
    return bin;
  }

  int bypass() {
    offset_ = (offset_ << 1) | read_bits(1);
    if (offset_ >= range_) {
      offset_ -= range_;
      return 1;
    }
    return 0;
  }

  uint32_t bypass_bits(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; i++) v = (v << 1) | bypass();
    return v;
  }

  int terminate() {
    range_ -= 2;
    if (offset_ >= range_) return 1;
    while (range_ < 256) {
      range_ <<= 1;
      offset_ = (offset_ << 1) | read_bits(1);
    }
    return 0;
  }

  size_t bitpos() const { return pos_; }

  // Re-initialize the arithmetic engine at the next byte boundary: the
  // entry point of a new tile / WPP row (spec 9.3.1: initialization is
  // invoked after byte_alignment() following end_of_tile_one_bit /
  // end_of_subset_one_bit).
  void restart() {
    pos_ = (pos_ + 7) & ~(size_t)7;
    range_ = 510;
    offset_ = read_bits(9);
  }

  // Jump to an absolute (byte-aligned) bit position and re-initialize:
  // the signaled-entry-point path (ep_init_cabac_decoder).
  void reinit_at(size_t bitpos) {
    pos_ = bitpos;
    range_ = 510;
    offset_ = read_bits(9);
  }

 private:
  uint32_t read_bits(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; i++) {
      size_t byte = pos_ >> 3;
      int bit = byte < size_ ? (data_[byte] >> (7 - (pos_ & 7))) & 1 : 0;
      v = (v << 1) | bit;
      pos_++;
    }
    return v;
  }

  const uint8_t* data_;
  size_t size_;
  size_t pos_;
  uint32_t range_, offset_;
};

}  // namespace vvc

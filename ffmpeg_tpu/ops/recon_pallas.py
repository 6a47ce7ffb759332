"""TPU Pallas reconstruction kernel: the decode-order unit loop.

This is the TPU-native replacement for the reference's per-CTU
INTER/RECON task stages (vvc_thread.c:432-463 + vvc_intra.c:498-527).
The whole frame's prediction+reconstruction runs as ONE Pallas kernel:
a sequential grid over predict units (<=32x32 tiles in decode order,
ctrl::predict_units in native/decode.cc), with the output plane and a
compact transposed column buffer resident in VMEM:

  plane[y, x]          -- the reconstructed plane (top reference rows
                          are read straight from it: dynamic-sublane
                          single-row loads are cheap vector ops)
  R[x >> g, y]         -- every 2^g-th column of everything decoded,
                          stored transposed (g=2 luma, g=1 chroma).
                          Left reference columns are rows of R.

Intra prediction of a unit reads row y0-1 (from the plane) and column
x0-1 (from R).  Units are 4-aligned in luma and 2-aligned in chroma,
so column x0-1 is always a stored column; storing *every* such column
(not just unit right edges) is what makes references into the interior
of a larger already-decoded neighbour correct.  All sample addressing
uses dynamic-sublane row loads + lane rolls (vector ops), and the
data-dependent angular / PDPC reference indexing becomes one-hot f32
matmuls on the MXU -- there are no gathers or scatters anywhere (XLA
gather/scatter costs ~10ns/element on TPU, which is what made
batched-XLA formulations of this loop ~100x too slow).

Bit-exactness contract: identical results to ops/intra.py
(edge_arrays / ref_filter_121 / project_negative_angle / pred_* /
pdpc_*) for every legal control row; those functions are themselves
MD5-parity-tested against the reference decoder.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intra import INTRA_LUMA_FILTER

S = 32            # unit tile (max predict-unit dimension)
LE = 256          # edge-vector lanes (2x128); j = lane - OFF in [-64,192)
OFF = 64          # edge origin
JMAX = 103        # edge_arrays' index bound (176-long arrays, origin 72:
                  # clip(idx, 0, 175) == clamp j at 103) for PDPC parity

# ctrl row indices (recon.CTRL_KEYS order; decode.cc ctrl::Key)
(KX0, KY0, KW, KH, KLOGW, KLOGH, KMC, KANGLE, KINV, KFF, KSMOOTH,
 KLSZ, KTSZ, KUNF, KPDPC, KNS, KAVL, KAVT, KCUL, KPROJV, KPROJH,
 KPF, KM0X, KM0Y, KM1X, KM1Y, KR0, KR1, KCHUNK,
 KWDEN, KW0, KW1, KO0, KO1, KHPEL, KCIIPW,
 KGPMPART, KGPMTX, KGPMTY, KGPMLW, KGPMLH, KHYP0LX, KHYP1LX,
 KW0B, KW1B, KO0B, KO1B,
 KCSRC,
 KPROF, KPDHX0, KPDHY0, KPDVX0, KPDVY0,
 KPDHX1, KPDHY1, KPDVX1, KPDVY1, KBDOF,
 KDMVR, KOM0X, KOM0Y, KOM1X, KOM1Y,
 KMIPID, KMIPT, KMIPSZ,
 KCCLM, KCCLMVC, KCCLMCT, KCCLMCL,
 KCCLMP0, KCCLMP1, KCCLMP2, KCCLMP3,
 KMRL) = range(75)

(MC_PLANAR, MC_DC, MC_VERT, MC_HORZ, MC_ANG_V, MC_ANG_H, MC_INTER,
 MC_MIP, MC_CCLM) = range(9)


def _r128(v: int) -> int:
  return (v + 127) // 128 * 128


def plane_geom(W: int, H: int, gran: int = 4):
  """Padded plane geometry for the kernel: (Hp, Wp, Wr, HL).
  Wp/HL are lane dims (128-multiples, >= LE); Hp covers the 40-row
  store spans; Wr is the R-buffer row count (one per gran columns)."""
  # lane dim must cover the (40, 256) store window at the last unit's
  # 128-aligned origin: xa_max + 256
  Wp = max(_r128(W + 40), ((max(W, 1) - 1) // 128) * 128 + 256, LE)
  Hp = max((H + 36 + 7) // 8 * 8, 64)
  HL = max(_r128(Hp), LE)     # R-buffer lane dim
  # + S//gran headroom: the R store writes nr rows at a dynamic start
  Wr = (Wp // gran + S // gran + 7) // 8 * 8
  return Hp, Wp, Wr, HL


def _dyn_extract(v, k):
  """Dynamic lane extract -> (1, 1) value; k is a traced scalar."""
  L = v.shape[1]
  return pltpu.roll(v, (L - k) % L, axis=1)[:, :1] + 0


def _st_extract(v, k: int):
  """Static lane extract -> (1, 1) value."""
  L = v.shape[1]
  return pltpu.roll(v, (L - k) % L, axis=1)[:, :1] + 0


def _toeplitz(vec):
  """(1, LE) -> (S, LE) with T[s, l] = vec[(l + s) % LE]."""
  return jnp.concatenate(
      [pltpu.roll(vec, (LE - s) % LE, axis=1) for s in range(S)], axis=0)


def _dot_t(a, b):
  """Exact small-int a @ b.T on the MXU via f32 (contract last dims).
  HIGHEST precision (f32x3) is required: the default single-pass bf16
  truncates operands to 8 significant bits, which corrupts >8-bit
  samples (e.g. 10-bit pixels) by +/-1."""
  d = jax.lax.dot_general(a.astype(jnp.float32), b.astype(jnp.float32),
                          (((1,), (1,)), ((), ())),
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
  return d.astype(jnp.int32)


def _dot(a, b):
  """Exact small-int a @ b on the MXU via f32 (see _dot_t re precision)."""
  d = jax.lax.dot_general(a.astype(jnp.float32), b.astype(jnp.float32),
                          (((1,), (0,)), ((), ())),
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
  return d.astype(jnp.int32)


def _col(m, k: int):
  """Static column k of (S, N) as (S, 1)."""
  L = m.shape[1]
  return pltpu.roll(m, (L - k) % L, axis=1)[:, :1] + 0


def _row(m, k: int):
  """Static row k of (R, N) as (1, N) via mask-reduce (offset-free)."""
  sub = jax.lax.broadcasted_iota(jnp.int32, m.shape, 0)
  return jnp.sum(jnp.where(sub == k, m, 0), axis=0, keepdims=True)


def _scal(v):
  """(1, 1) vector -> rank-0 scalar (sreg): Mosaic cannot broadcast a
  vector in both sublanes and lanes, but scalars broadcast anywhere."""
  return jnp.sum(v)


def _build_kernel(Hp, Wp, Wr, HL, nch, bit_depth, is_chroma, gran,
                  has_mip=False, has_cclm=False, has_mrl=False):
  maxv = (1 << bit_depth) - 1
  mid = 1 << (bit_depth - 1)
  lg = gran.bit_length() - 1      # log2(gran)
  nr = S // gran                  # R rows written per unit

  def kernel(ctrl_ref, meta_ref, ipos_ref, *rest):
    if has_cclm:
      sel_ref, rest = rest[0], rest[1:]
    res_ref, iblk_ref, ftab_ref = rest[:3]
    rest = rest[3:]
    if has_mip:
      mip_ref, rest = rest[0], rest[1:]
    if has_cclm:
      dsy_ref, rest = rest[0], rest[1:]
    if has_mrl:
      # R2: the two extra columns per gran-4 group ((c & 3) in {1, 2}),
      # packed 16-bit lo/hi into one int32 row per group — the MRL
      # left-reference columns x0-2 / x0-3
      p_in, r_in, r2_in, plane_ref, r_ref, r2_ref = rest
    else:
      p_in, r_in, plane_ref, r_ref = rest
    i = pl.program_id(0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)

    @pl.when(i == 0)
    def _():
      plane_ref[...] = p_in[...]
      r_ref[...] = r_in[...]
      if has_mrl:
        r2_ref[...] = r2_in[...]

    @pl.when(i < meta_ref[0])
    def _():
      x0 = ctrl_ref[KX0, i]
      y0 = ctrl_ref[KY0, i]
      w = ctrl_ref[KW, i]
      h = ctrl_ref[KH, i]
      mc = ctrl_ref[KMC, i]
      is_inter = mc == MC_INTER

      # ---- channel-invariant control-derived pieces (hoisted out of
      # the per-channel loop: for the chroma kernel nch=2 they would
      # otherwise be computed twice) --------------------------------
      avl = ctrl_ref[KAVL, i]
      avt = ctrl_ref[KAVT, i]
      cul = ctrl_ref[KCUL, i]
      logw = ctrl_ref[KLOGW, i]
      logh = ctrl_ref[KLOGH, i]
      inv = ctrl_ref[KINV, i]
      projv = ctrl_ref[KPROJV, i]
      projh = ctrl_ref[KPROJH, i]
      angle = ctrl_ref[KANGLE, i]
      ff = ctrl_ref[KFF, i]
      ns = ctrl_ref[KNS, i]
      pdpc = ctrl_ref[KPDPC, i]
      # MRL reference-line offset (luma only; 0 when the frame has no
      # MRL units, keeping non-MRL programs identical)
      mrl = ctrl_ref[KMRL, i] if has_mrl else 0

      jl = jax.lax.broadcasted_iota(jnp.int32, (1, LE), 1) - OFF
      jj_le = jax.lax.broadcasted_iota(jnp.int32, (S, LE), 1)
      rows1 = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)

      # angular one-hot 4-tap weight matrix A (shared by channels)
      pos = (rows1 + 1 + mrl) * angle
      aidx = pos >> 5                     # (S, 1)
      fact = pos & 31
      if is_chroma:
        A = ((32 - fact) * (jj_le == OFF + aidx)
             + fact * (jj_le == OFF + aidx + 1))
      else:
        pcol = jax.lax.broadcasted_iota(jnp.int32, (S, 64), 1)
        oh = (pcol == fact + 32 * ff).astype(jnp.int32)
        taps = _dot(oh, ftab_ref[0:64, :])  # (S, 128): lanes 0..3
        A = (_col(taps, 0) * (jj_le == OFF + aidx - 1)
             + _col(taps, 1) * (jj_le == OFF + aidx)
             + _col(taps, 2) * (jj_le == OFF + aidx + 1)
             + _col(taps, 3) * (jj_le == OFF + aidx + 2))

      # negative-angle projection one-hot selectors (per limit)
      def project_mt(limit):
        # mt[l, r]: src lane l contributing to projected lane r
        ll2 = jax.lax.broadcasted_iota(jnp.int32, (LE, 128), 0)
        rr2 = jax.lax.broadcasted_iota(jnp.int32, (LE, 128), 1)
        xx = rr2 - 32                    # j+1+mrl
        sidx = OFF - 1 - mrl + jnp.minimum((xx * inv + 256) >> 9, limit)
        return (ll2 == jnp.clip(sidx, 0, LE - 1)).astype(jnp.int32)

      mt_v = project_mt(h)               # for projecting top (limit=h)
      mt_h = project_mt(w)               # for projecting left (limit=w)

      # pdpc one-hot row selector G (shared): g(q) = (256+inv*(q+1))>>9
      g = jnp.minimum((256 + inv * (rows1 + 1)) >> 9, JMAX + 1)
      G = (jj_le == OFF + g).astype(jnp.int32)

      # pdpc blend weights (shared)
      wlv = 32 >> jnp.minimum((ix * 2) >> ns, 31)
      wth = 32 >> jnp.minimum((iy * 2) >> ns, 31)
      scale_hv = (logw + logh - 2) >> 2
      is_vh = (mc == MC_VERT) | (mc == MC_HORZ)
      wl_hv = jnp.where(mc == MC_HORZ, 0,
                        32 >> jnp.minimum((ix << 1) >> scale_hv, 31))
      wt_hv = jnp.where(mc == MC_VERT, 0,
                        32 >> jnp.minimum((iy << 1) >> scale_hv, 31))

      # dc normalization (shared)
      offset_dc = jnp.maximum(
          jnp.where(w == h, w << 1, jnp.maximum(w, h)), 1)
      shift_dc = (2 + (offset_dc >= 8).astype(jnp.int32)
                  + (offset_dc >= 16) + (offset_dc >= 32)
                  + (offset_dc >= 64))
      lane_s = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)

      # store masks / selectors (shared).  The plane store RMWs a
      # (40, 256) window at a 128-aligned lane origin xa instead of
      # full (40, Wp) rows: at 1080p the full-width temporaries alone
      # overflowed the 16 MB VMEM budget.
      ya = pl.multiple_of((y0 >> 3) * 8, 8)
      dy = y0 - ya                       # in {0,..,6}, gran-aligned
      xa = pl.multiple_of((x0 >> 7) * 128, 128)
      dx = x0 - xa                       # in {0,..,127}
      lanes40 = jax.lax.broadcasted_iota(jnp.int32, (40, 256), 1)
      sub40 = jax.lax.broadcasted_iota(jnp.int32, (40, 256), 0)
      m40 = ((lanes40 >= dx) & (lanes40 < dx + w)
             & (sub40 >= dy) & (sub40 < dy + h))
      kk = jax.lax.broadcasted_iota(jnp.int32, (nr, S), 0)
      cc = jax.lax.broadcasted_iota(jnp.int32, (nr, S), 1)
      col_oh = (cc == gran * kk + gran - 1).astype(jnp.int32)
      b0 = x0 >> lg
      lane_h1 = jax.lax.broadcasted_iota(jnp.int32, (1, HL), 1)
      lmask = (lane_h1 >= y0) & (lane_h1 < y0 + h)

      for ch in range(nch):
        res = res_ref[0, ch] if nch > 1 else res_ref[0]
        iblk = iblk_ref[0, ch] if nch > 1 else iblk_ref[0]

        # ---- edge vectors (left/top) ------------------------------
        # top row straight from the plane (row y0-1-mrl); left column
        # from R (col x0-1; MRL lines x0-2 / x0-3 from the packed R2)
        trow = plane_ref[ch, pl.ds(jnp.maximum(y0 - 1 - mrl, 0), 1), :]
        trow = pltpu.roll(trow, (Wp - (x0 - 1 - mrl)) % Wp, axis=1)
        tloc = trow[:, :LE] + 0        # lane k = plane[y0-1-r, x0-1-r+k]
        rrow = r_ref[ch, pl.ds(jnp.maximum((x0 - 1) >> lg, 0), 1), :]
        if has_mrl:
          r2row = r2_ref[ch, pl.ds(jnp.maximum((x0 - 1) >> lg, 0), 1), :]
          rrow = jnp.where(
              mrl == 0, rrow,
              jnp.where(mrl == 1, (r2row >> 16) & 0xffff,   # col x0-2
                        r2row & 0xffff))                    # col x0-3
        lrow = pltpu.roll(rrow, (HL - (y0 - 1 - mrl)) % HL, axis=1)
        lloc = lrow[:, :LE] + 0        # lane k = plane[y0-1-r+k, x0-1-r]

        t_run = pltpu.roll(tloc, OFF - 1 - mrl, axis=1)  # lane j+OFF=x0+j
        l_run = pltpu.roll(lloc, OFF - 1 - mrl, axis=1)
        t_last = jnp.broadcast_to(_dyn_extract(tloc, avt + mrl), (1, LE))
        l_last = jnp.broadcast_to(_dyn_extract(lloc, avl + mrl), (1, LE))
        top0 = _dyn_extract(tloc, 1 + mrl)          # plane[y0-1-r, x0]
        left0 = _dyn_extract(lloc, 1 + mrl)         # plane[y0, x0-1-r]
        tm1_px = _dyn_extract(tloc, mrl + 0)        # plane[y0-1-r, x0-1]
        lm1_px = _dyn_extract(lloc, mrl + 0)        # plane[y0-1, x0-1-r]
        fallback = jnp.where(avl > 0, left0,
                             jnp.where(avt > 0, top0, mid))
        fb_b = jnp.broadcast_to(fallback, (1, LE))
        tm1_b = jnp.broadcast_to(
            jnp.where(cul > 0, tm1_px, fallback), (1, LE))
        lm1_b = jnp.broadcast_to(
            jnp.where(cul > 0, lm1_px, fallback), (1, LE))
        # negative lanes clamp at j = -1-r (parity edge_arrays joff)
        t0_b = jnp.broadcast_to(tloc[:, :1] + 0, (1, LE))
        l0_b = jnp.broadcast_to(lloc[:, :1] + 0, (1, LE))
        t_neg = jnp.where(jl >= -1 - mrl, t_run, t0_b)
        l_neg = jnp.where(jl >= -1 - mrl, l_run, l0_b)
        top = jnp.where(
            jl >= 0,
            jnp.where(avt > 0,
                      jnp.where(jl < avt, t_run, t_last), tm1_b),
            jnp.where(cul > 0, t_neg, fb_b))
        left = jnp.where(
            jl >= 0,
            jnp.where(avl > 0,
                      jnp.where(jl < avl, l_run, l_last), lm1_b),
            jnp.where(cul > 0, l_neg, fb_b))

        # ---- [1 2 1] reference filter (ref_filter_121) ------------
        if not is_chroma:
          smooth = ctrl_ref[KSMOOTH, i]
          lsz = ctrl_ref[KLSZ, i]
          tsz = ctrl_ref[KTSZ, i]
          unf = ctrl_ref[KUNF, i]
          c_f = (_st_extract(left, OFF) + 2 * _st_extract(left, OFF - 1)
                 + _st_extract(top, OFF) + 2) >> 2
          c_fb = jnp.broadcast_to(c_f, (1, LE))

          def filt(a):
            return (pltpu.roll(a, 1, axis=1) + 2 * a
                    + pltpu.roll(a, LE - 1, axis=1) + 2) >> 2

          lf = jnp.where((jl >= 0) & (jl < lsz - unf), filt(left), left)
          tf = jnp.where((jl >= 0) & (jl < tsz - unf), filt(top), top)
          lf = jnp.where(jl == -1, c_fb, lf)
          tf = jnp.where(jl == -1, c_fb, tf)
          left = jnp.where(smooth > 0, lf, left)
          top = jnp.where(smooth > 0, tf, top)

        # ---- negative-angle projection (project_negative_angle) ---
        def project(dst, src, mt, limit):
          # dst[j] <- src[OFF-1-mrl + min(((j+1+mrl)*inv + 256) >> 9,
          # limit)] for j in [-limit-1-mrl, -2-mrl]; evaluated at
          # j = q-33-mrl for matrix column q in [0,32)
          prow = _dot(src, mt)             # (1,128): col q = src[sidx(q)]
          pvec = jnp.concatenate(
              [prow, jnp.zeros((1, LE - 128), jnp.int32)], axis=1)
          pvec = pltpu.roll(pvec, 31 - mrl, axis=1)  # lane q+31-mrl = j+OFF
          sel = (jl >= -limit - 1 - mrl) & (jl <= -2 - mrl)
          return jnp.where(sel, pvec, dst)

        top = jnp.where(projv > 0, project(top, left, mt_v, h), top)
        left = jnp.where(projh > 0, project(left, top, mt_h, w), left)

        # ---- prediction branches ----------------------------------
        t32 = pltpu.roll(top, LE - OFF, axis=1)[:, :S] + 0
        l32 = pltpu.roll(left, LE - OFF, axis=1)[:, :S] + 0
        t32b = jnp.broadcast_to(t32, (S, S))
        lcol = jnp.broadcast_to(l32, (S, S)).T    # left[y] down columns

        # planar (pred_planar); tr/bl are scalars top[OFF+w]/left[OFF+h]
        tr_s = _dyn_extract(top, (OFF + w) % LE)
        bl_s = _dyn_extract(left, (OFF + h) % LE)
        pv = ((h - 1 - iy) * t32b + (iy + 1) * _scal(bl_s)) << logw
        ph_ = ((w - 1 - ix) * lcol + (ix + 1) * _scal(tr_s)) << logh
        planar = (pv + ph_ + w * h) >> (logw + logh + 1)

        # dc (pred_dc)
        sum_t = jnp.sum(jnp.where(lane_s < w, t32, 0))
        sum_l = jnp.sum(jnp.where(lane_s < h, l32, 0))
        s_ = jnp.where(w >= h, sum_t, 0) + jnp.where(w <= h, sum_l, 0)
        dc = jnp.zeros((S, S), jnp.int32) + (
            (s_ + (offset_dc >> 1)) >> shift_dc)

        # angular core: one-hot 4-tap weights x toeplitz window matmul
        def ang_core(main):
          acc = _dot_t(A, _toeplitz(main))  # [i, x] = sum_l A[i,l]m[l+x]
          if is_chroma:
            return (acc + 16) >> 5
          return jnp.clip((acc + 32) >> 6, 0, maxv)

        def pdpc_mat(other):
          # [q, d] = other_clamped[OFF + min(g(q),104) + d]; clamping g
          # at 104 matches clip(idx, 0, 175) in ops/intra.py (values
          # are constant beyond j=103)
          oth_ext = jnp.where(
              jl <= JMAX, other,
              jnp.broadcast_to(_st_extract(other, OFF + JMAX), (1, LE)))
          return _dot_t(G, _toeplitz(oth_ext))

        # V family: rows = y, taps over top; pdpc blends left along x
        pv_pred = ang_core(top)
        lmat = pdpc_mat(left).T             # [y, x] = left[OFF+g(x)+y]
        pv_val = jnp.clip(pv_pred + (((lmat - pv_pred) * wlv + 32) >> 6),
                          0, maxv)
        pv_w = jnp.where(ix < jnp.minimum(w, 3 << ns), pv_val, pv_pred)
        angv = jnp.where(pdpc > 0, pv_w, pv_pred)

        # H family: rows = x, taps over left; transposed; pdpc blends
        # top along y: t[y, x] = top[OFF + g(y) + x]
        ph_pred = ang_core(left).T
        tmat = pdpc_mat(top)                # [y, x] = top[OFF+g(y)+x]
        ph_val = jnp.clip(ph_pred + (((tmat - ph_pred) * wth + 32) >> 6),
                          0, maxv)
        ph_w = jnp.where(iy < jnp.minimum(h, 3 << ns), ph_val, ph_pred)
        angh = jnp.where(pdpc > 0, ph_w, ph_pred)

        pred = jnp.where(
            mc == MC_PLANAR, planar,
            jnp.where(mc == MC_DC, dc,
                      jnp.where(mc == MC_VERT, t32b,
                                jnp.where(mc == MC_HORZ, lcol,
                                          jnp.where(mc == MC_ANG_V, angv,
                                                    angh)))))

        # pdpc for planar/dc/v/h (pdpc_hvdc)
        c_l = _st_extract(left, OFF - 1)
        c_t = _st_extract(top, OFF - 1)
        lq = jnp.where(is_vh, lcol - _scal(c_l) + pred, lcol)
        tq = jnp.where(is_vh, t32b - _scal(c_t) + pred, t32b)
        hv_pdpc = jnp.clip(
            pred + ((wl_hv * (lq - pred) + wt_hv * (tq - pred) + 32) >> 6),
            0, maxv)
        pred = jnp.where((pdpc > 0) & (mc < MC_ANG_V), hv_pdpc, pred)

        # ---- MIP (8.4.5.2.2; parity ops/intra.py pred_mip) ----------
        if has_mip and not is_chroma:
          mip_id = ctrl_ref[KMIPID, i]
          mip_t = ctrl_ref[KMIPT, i]
          msz = ctrl_ref[KMIPSZ, i]
          bsz = jnp.where(msz == 0, 2, 4)
          lgps = jnp.where(msz == 2, 3, 2)       # log2(predSize)
          ps_ = jnp.where(msz == 2, 8, 4)
          in_size = jnp.where(msz == 0, 4, jnp.where(msz == 2, 7, 8))
          lgbsz = jnp.where(msz == 0, 1, 2)
          # boundary downsampling: one-hot group-sum matmuls.  src1 is
          # reduced into entries [0, bsz), src2 into [bsz, 2*bsz)
          # (sources swap when transposed: mip_downsampling + FFSWAP)
          n1 = jnp.where(mip_t > 0, h, w)
          n2 = jnp.where(mip_t > 0, w, h)
          rat1 = n1 >> lgbsz
          rat2 = n2 >> lgbsz
          lg1 = ((rat1 >= 2).astype(jnp.int32) + (rat1 >= 4) + (rat1 >= 8))
          lg2 = ((rat2 >= 2).astype(jnp.int32) + (rat2 >= 4) + (rat2 >= 8))
          src1 = jnp.where(mip_t > 0, left, top)
          src2 = jnp.where(mip_t > 0, top, left)
          sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, LE), 0)
          jl8 = jax.lax.broadcasted_iota(jnp.int32, (8, LE), 1) - OFF
          d1 = ((sub8 < bsz) & (jl8 >= 0) & (jl8 < n1)
                & ((jl8 >> lg1) == sub8)).astype(jnp.int32)
          d2 = ((sub8 >= bsz) & (jl8 >= 0) & (jl8 < n2)
                & ((jl8 >> lg2) == sub8 - bsz)).astype(jnp.int32)
          r8 = _dot_t(d1, src1) + _dot_t(d2, src2)           # (8, 1)
          rowi = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
          r8 = ((r8 + jnp.where(rowi < bsz, rat1 >> 1, rat2 >> 1))
                >> jnp.where(rowi < bsz, lg1, lg2))
          temp0 = _scal(_row(r8, 0))
          r8s = pltpu.roll(r8, 7, axis=0)                    # r8[i+1]
          vv = jnp.where(msz == 2, r8s - temp0,
                         jnp.where(rowi == 0, mid - temp0, r8 - temp0))
          vv = jnp.where(rowi < in_size, vv, 0)              # (8, 1)
          ow = 32 - 32 * jnp.sum(vv)
          # matrix rows (bank layout: row mip_id*8+k = input-k column,
          # lanes = the 64 reduced-pred outputs)
          mrow0 = jnp.maximum(mip_id, 0) * 8
          mat8 = jnp.concatenate(
              [mip_ref[pl.ds(mrow0 + k, 1), :] for k in range(8)], axis=0)
          pv = jax.lax.dot_general(
              vv.astype(jnp.float32), mat8.astype(jnp.float32),
              (((0,), (0,)), ((), ())),
              precision=jax.lax.Precision.HIGHEST,
              preferred_element_type=jnp.float32).astype(jnp.int32)
          pv = jnp.clip(((pv + ow) >> 6) + temp0, 0, maxv)   # (1, 128)
          # reduced-pred grid: P8[y, x] = pv[y*ps + x]
          t8 = jnp.concatenate(
              [pltpu.roll(pv, (128 - x_) % 128, axis=1)
               for x_ in range(8)], axis=0)                  # (8, 128)
          sub8b = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
          lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
          e8 = (lane8 == sub8b * ps_).astype(jnp.int32)
          p8g = _dot_t(e8, t8)                               # (8, 8)
          p8g = jnp.where(mip_t > 0, p8g.T, p8g)
          # upsampling (mip_upsampling_1d): H over the ps rows holding
          # predRed (left boundary at rows (y+1)*uv-1), then V over all
          # columns (top boundary)
          uv_ = h >> lgps
          uh_ = w >> lgps
          lg_h = ((uh_ >= 2).astype(jnp.int32) + (uh_ >= 4) + (uh_ >= 8))
          lg_v = ((uv_ >= 2).astype(jnp.int32) + (uv_ >= 4) + (uv_ >= 8))
          eb = (jl8 == (sub8 + 1) * uv_ - 1 - 0).astype(jnp.int32)
          b8 = _dot_t(eb, left)                              # (8, 1)
          ext_h = jnp.concatenate(
              [b8, p8g, jnp.zeros((8, 128 - 9), jnp.int32)], axis=1)
          jj2 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
          xx2 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
          kx = xx2 >> lg_h
          dxx = (xx2 & (uh_ - 1)) + 1
          w_h = jnp.where(xx2 < S,
                          (jj2 == kx) * (uh_ - dxx) + (jj2 == kx + 1) * dxx,
                          0)
          tmp8 = (_dot(ext_h, w_h) + (uh_ >> 1)) >> lg_h     # (8, 128)
          trow128 = pltpu.roll(top, LE - OFF, axis=1)[:, :128] + 0
          ext_v = jnp.concatenate(
              [trow128, tmp8, jnp.zeros((7, 128), jnp.int32)], axis=0)
          yy3 = jax.lax.broadcasted_iota(jnp.int32, (S, 16), 0)
          jj3 = jax.lax.broadcasted_iota(jnp.int32, (S, 16), 1)
          ky = yy3 >> lg_v
          dyy = (yy3 & (uv_ - 1)) + 1
          w_v = (jj3 == ky) * (uv_ - dyy) + (jj3 == ky + 1) * dyy
          mip_out = (_dot(w_v, ext_v) + (uv_ >> 1)) >> lg_v  # (S, 128)
          pred = jnp.where(mc == MC_MIP, mip_out[:, :S] + 0, pred)

        # ---- CCLM (8.4.5.2.14; parity ops/intra.py cclm_*) ----------
        if has_cclm and is_chroma:
          cnt_t = ctrl_ref[KCCLMCT, i]
          cnt_l = ctrl_ref[KCCLMCL, i]
          n_sel = cnt_t + cnt_l
          posj = [ctrl_ref[KCCLMP0 + j, i] for j in range(4)]
          slj = [sel_ref[j, i] for j in range(4)]
          # chroma picks from this channel's substituted edge vectors
          scj = []
          for j in range(4):
            tval = _scal(_dyn_extract(top, (OFF + posj[j]) % LE))
            lval = _scal(_dyn_extract(left, (OFF + posj[j]) % LE))
            scj.append(jnp.where(j < cnt_t, tval, lval))
          # 2-pick reorder: [s0, s1] -> [s1, s0, s1, s0]
          two = n_sel == 2
          slj = [jnp.where(two, v, slj[j])
                 for j, v in enumerate([slj[1], slj[0], slj[1], slj[0]])]
          scj = [jnp.where(two, v, scj[j])
                 for j, v in enumerate([scj[1], scj[0], scj[1], scj[0]])]
          # 4-element min/max network, payload in lockstep
          pairs = [(slj[j], scj[j]) for j in range(4)]

          def swp(cond, a, b):
            return ((jnp.where(cond, b[0], a[0]),
                     jnp.where(cond, b[1], a[1])),
                    (jnp.where(cond, a[0], b[0]),
                     jnp.where(cond, a[1], b[1])))

          mi0, mi1, ma0, ma1 = pairs[0], pairs[2], pairs[1], pairs[3]
          mi0, mi1 = swp(mi0[0] > mi1[0], mi0, mi1)
          ma0, ma1 = swp(ma0[0] > ma1[0], ma0, ma1)
          c3p = mi0[0] > ma1[0]
          mi0, ma0 = swp(c3p, mi0, ma0)
          mi1, ma1 = swp(c3p, mi1, ma1)
          mi1, ma0 = swp(mi1[0] > ma0[0], mi1, ma0)
          max_l = (ma0[0] + ma1[0] + 1) >> 1
          min_l = (mi0[0] + mi1[0] + 1) >> 1
          max_c = (ma0[1] + ma1[1] + 1) >> 1
          min_c = (mi0[1] + mi1[1] + 1) >> 1
          diff = max_l - min_l
          diffc = max_c - min_c

          def log2c(v):  # floor(log2) for v in [1, 2^12)
            acc = (v >= 2).astype(jnp.int32)
            for kk in range(2, 12):
              acc = acc + (v >= (1 << kk))
            return acc

          xx_ = log2c(jnp.maximum(diff, 1))
          norm_diff = ((diff << 4) >> xx_) & 15
          xx_ = xx_ + (norm_diff != 0).astype(jnp.int32)
          absc = jnp.abs(diffc)
          yy_ = jnp.where(absc > 0, log2c(jnp.maximum(absc, 1)) + 1, 0)
          dvrow = _row(ftab_ref[...], 64)          # CCLM div-sig table
          vdiv = _scal(_dyn_extract(dvrow, norm_diff)) | 8
          add_ = (1 << yy_) >> 1
          a_ = (diffc * vdiv + add_) >> yy_
          k_ = jnp.maximum(1, 3 + xx_ - yy_)
          a_ = jnp.where((3 + xx_ - yy_) < 1,
                         jnp.sign(a_) * 15, a_)
          b_ = min_c - ((a_ * min_l) >> k_)
          a_ = jnp.where(diff == 0, 0, a_)
          k_ = jnp.where(diff == 0, 0, k_)
          b_ = jnp.where(diff == 0, min_c, b_)
          a_ = jnp.where(n_sel == 0, 0, a_)
          k_ = jnp.where(n_sel == 0, 0, k_)
          b_ = jnp.where(n_sel == 0, mid, b_)
          # collocated downsampled-luma block at (y0, x0)
          span = dsy_ref[pl.ds(ya, 40), pl.ds(xa, 256)]  # (40, 256)
          rows = span[0:S]
          for d in (2, 4, 6):
            rows = jnp.where(dy == d,
                             pltpu.roll(span, 40 - d, axis=0)[0:S], rows)
          blk_dsy = pltpu.roll(rows, (256 - dx) % 256, axis=1)[:, :S] + 0
          cclm_pred = jnp.clip(((blk_dsy * a_) >> k_) + b_, 0, maxv)
          pred = jnp.where(mc == MC_CCLM, cclm_pred, pred)

        # CIIP: blend the (planar+PDPC) intra prediction with the
        # prefetched MC block (put_ciip, vvc_inter_template.c:60-76)
        ciipw = ctrl_ref[KCIIPW, i]
        pred = jnp.where(ciipw > 0,
                         (pred * ciipw + iblk * (4 - ciipw) + 2) >> 2,
                         pred)

        base = jnp.where(is_inter, iblk, pred)
        out = jnp.clip(base + res, 0, maxv)

        # ---- store: 40-row plane span -----------------------------
        # shift while small: (40, S) with out at rows [dy, dy+32)
        sh0 = jnp.concatenate([out, jnp.zeros((8, S), jnp.int32)], axis=0)
        blk = sh0
        for d in range(gran, 8, gran):
          shd = jnp.concatenate([jnp.zeros((d, S), jnp.int32),
                                 sh0[:40 - d] + 0], axis=0)
          blk = jnp.where(dy == d, shd, blk)
        blk40 = jnp.concatenate(
            [blk, jnp.zeros((40, 256 - S), jnp.int32)], axis=1)
        blk40 = pltpu.roll(blk40, dx, axis=1)
        span = plane_ref[ch, pl.ds(ya, 40), pl.ds(xa, 256)]
        plane_ref[ch, pl.ds(ya, 40), pl.ds(xa, 256)] = jnp.where(
            m40, blk40, span)

        # ---- store: R columns (every gran-th column, transposed) --
        # colsT[k, j] = out[j, gran*k + gran-1] via one-hot MXU matmul
        # (multi-row dynamic-start slices hang the Mosaic compiler, so
        # the nr rows are read-modify-written one at a time)
        colsT = _dot_t(col_oh, out)
        rblk = jnp.concatenate(
            [colsT, jnp.zeros((nr, HL - S), jnp.int32)], axis=1)
        rblk = pltpu.roll(rblk, y0, axis=1)
        if has_mrl:
          # R2: columns gran*k+1 (lo 16) and gran*k+2 (hi 16) packed
          # into one int32 row per group — the MRL left lines x0-3/x0-2
          c1_oh = (cc == gran * kk + 1).astype(jnp.int32)
          c2_oh = (cc == gran * kk + 2).astype(jnp.int32)
          packT = _dot_t(c1_oh, out) + (_dot_t(c2_oh, out) << 16)
          r2blk = jnp.concatenate(
              [packT, jnp.zeros((nr, HL - S), jnp.int32)], axis=1)
          r2blk = pltpu.roll(r2blk, y0, axis=1)
        for k in range(nr):
          bi = jnp.minimum(b0 + k, Wr - 1)
          live = lmask & (k < (w >> lg))
          old = r_ref[ch, pl.ds(bi, 1), :]
          r_ref[ch, pl.ds(bi, 1), :] = jnp.where(live, _row(rblk, k), old)
          if has_mrl:
            old2 = r2_ref[ch, pl.ds(bi, 1), :]
            r2_ref[ch, pl.ds(bi, 1), :] = jnp.where(
                live, _row(r2blk, k), old2)

  return kernel


# filter-tap lookup rows for the one-hot fact->taps matmul: row
# (fact + 32*filter_flag), lanes 0..3 = the 4 taps.  Row 64 carries the
# CCLM division-significand table (lanes 0..15).
_FTAB_ROWS = np.zeros((72, 128), np.int32)
_FTAB_ROWS[:32, :4] = INTRA_LUMA_FILTER[0]
_FTAB_ROWS[32:64, :4] = INTRA_LUMA_FILTER[1]
from .intra import CCLM_DIV_SIG  # noqa: E402
_FTAB_ROWS[64, :16] = CCLM_DIV_SIG


# MIP matrix bank in kernel layout: row mip_id*8 + k holds input-k's
# column of the matrix across lanes 0..63 (transposed w.r.t. the spec
# tables so the reduced prediction is one (1,8)x(8,64) MXU matmul)
def _mip_bank_rows() -> np.ndarray:
  from .intra import MIP_BANK  # (30, 64, 8)

  bank = np.zeros((240, 128), np.int32)
  for mid_ in range(30):
    bank[mid_ * 8:(mid_ + 1) * 8, :64] = MIP_BANK[mid_].T
  return bank


_MIP_BANK_ROWS = None


@functools.partial(jax.jit, static_argnames=(
    "W", "H", "nch", "bit_depth", "is_chroma", "has_mip", "has_cclm",
    "has_mrl"))
def recon_plane_pallas(ctrl, n_units, inter_pos, res_blocks, inter_blocks,
                       *, W, H, nch, bit_depth, is_chroma, has_mip=False,
                       has_cclm=False, has_mrl=False, sel_luma=None,
                       dsy=None):
  """Run the recon kernel over one plane kind.

  ctrl: (30, ncap) int32 decode-order control matrix.
  n_units: () int32 count of live units.
  inter_pos: (ncap,) int32 index into inter_blocks (0 for intra units).
  res_blocks: (ncap, [nch,] S, S) int32 residual tiles per unit.
  inter_blocks: (icap, [nch,] S, S) int32 inter prediction tiles.
  Returns (nch, Hp, Wp) reconstructed planes (padded; crop to H, W).
  """
  gran = 2 if is_chroma else 4
  Hp, Wp, Wr, HL = plane_geom(W, H, gran)
  ncap = ctrl.shape[1]
  has_mip = bool(has_mip) and not is_chroma
  has_cclm = bool(has_cclm) and is_chroma
  has_mrl = bool(has_mrl) and not is_chroma
  kernel = _build_kernel(Hp, Wp, Wr, HL, nch, bit_depth, is_chroma, gran,
                         has_mip, has_cclm, has_mrl)
  mid = 1 << (bit_depth - 1)
  p0 = jnp.full((nch, Hp, Wp), mid, jnp.int32)
  r0 = jnp.zeros((nch, Wr, HL), jnp.int32)
  nstate = 3 if has_mrl else 2   # plane, R (+ packed R2 for MRL)
  if nch > 1:
    res_spec = pl.BlockSpec((1, nch, S, S),
                            lambda i, *sp: (i, 0, 0, 0))
    iblk_spec = pl.BlockSpec((1, nch, S, S),
                             lambda i, *sp: (sp[2][i], 0, 0, 0))
  else:
    res_spec = pl.BlockSpec((1, S, S), lambda i, *sp: (i, 0, 0))
    iblk_spec = pl.BlockSpec((1, S, S), lambda i, *sp: (sp[2][i], 0, 0))
  vm = pl.BlockSpec(memory_space=pltpu.VMEM)
  # The ctrl matrix is a scalar-prefetch operand and lives in SMEM
  # (1 MB cap on current TPUs).  Large frames can need ncap=4096+
  # units, and (63, 4096) int32 alone is 1.03 MB — so the unit grid is
  # split into segments whose ctrl slice fits comfortably, threading
  # the plane / R-column buffers through via input-output aliasing
  # (one kernel launch per segment, state stays in VMEM-backed HBM).
  seg = min(ncap, max(256, (600 * 1024 // (4 * ctrl.shape[0])) // 256 * 256))
  nseg = (ncap + seg - 1) // seg
  nsp = 4 if has_cclm else 3   # scalar-prefetch operands
  nconst = 1 + has_mip + has_cclm  # ftab (+mip bank) (+dsy) pre p/r
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=nsp, grid=(seg,),
      in_specs=[res_spec, iblk_spec] + [vm] * (nconst + nstate),
      out_specs=[vm] * nstate)
  fn = pl.pallas_call(
      kernel,
      out_shape=[jax.ShapeDtypeStruct((nch, Hp, Wp), jnp.int32)]
      + [jax.ShapeDtypeStruct((nch, Wr, HL), jnp.int32)] * (nstate - 1),
      grid_spec=grid_spec,
      input_output_aliases={nsp + 2 + nconst + k: k for k in range(nstate)},
      # the XLA default scoped-VMEM budget (16 MB) is conservative;
      # large-frame plane+R state plus windows needs more (v5e VMEM
      # is far larger) — raise the ceiling for the 1080p/4K kernels
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      # off-TPU (FFMPEG_TPU_PALLAS=1 tests) run the kernel interpreted
      interpret=jax.default_backend() != "tpu")
  consts = [jnp.asarray(_FTAB_ROWS)]
  if has_mip:
    global _MIP_BANK_ROWS
    if _MIP_BANK_ROWS is None:
      _MIP_BANK_ROWS = _mip_bank_rows()
    consts.append(jnp.asarray(_MIP_BANK_ROWS))
  if has_cclm:
    # embed the downsampled-luma plane into this kernel's geometry
    dsy_k = jnp.zeros((Hp, Wp), jnp.int32)
    dh = min(Hp, dsy.shape[0])
    dw = min(Wp, dsy.shape[1])
    dsy_k = dsy_k.at[:dh, :dw].set(dsy[:dh, :dw])
    consts.append(dsy_k)
  state = [p0, r0] + ([jnp.zeros((nch, Wr, HL), jnp.int32)]
                      if has_mrl else [])
  for s in range(nseg):
    lo, hi = s * seg, min((s + 1) * seg, ncap)
    if hi - lo < seg:  # keep one kernel variant: pad the tail segment
      pad = seg - (hi - lo)
      ctrl_s = jnp.pad(ctrl[:, lo:hi], ((0, 0), (0, pad)))
      pos_s = jnp.pad(inter_pos[lo:hi], (0, pad))
      res_s = jnp.pad(res_blocks[lo:hi],
                      ((0, pad),) + ((0, 0),) * (res_blocks.ndim - 1))
      sel_s = (jnp.pad(sel_luma[:, lo:hi], ((0, 0), (0, pad)))
               if has_cclm else None)
    else:
      ctrl_s = ctrl[:, lo:hi]
      pos_s = inter_pos[lo:hi]
      res_s = res_blocks[lo:hi]
      sel_s = sel_luma[:, lo:hi] if has_cclm else None
    meta = jnp.clip(n_units - lo, 0, seg).astype(jnp.int32).reshape(1)
    sp = [ctrl_s, meta, pos_s] + ([sel_s] if has_cclm else [])
    state = list(fn(*sp, res_s, inter_blocks, *consts, *state))
  return state[0]

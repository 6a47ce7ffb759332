"""Deblocking filter as full-plane vectorized JAX passes.

Spec 8.8.3: all vertical edges of the picture are filtered first, then
all horizontal edges — exactly a pair of full-plane passes, which is the
TPU-native formulation (the reference's per-CTU staging, vvc_filter.c:
861-1004, reconstructs the same order via its task graph).

Bit-exact mirrors of the decision and filter math in
`vvc_filter_template.c:466-760` and `h2656_deblock_template.c` (luma
weak/strong/large, chroma weak/strong/one-sided), driven by per-edge
parameter grids (bs, qp, max filter lengths) that the caller derives
from the syntax planes.

Layout: for the vertical pass, edges sit at x = G*e; each 4-row (luma)
or 2-row (4:2:0 chroma) segment of each edge has its own parameters.
The horizontal pass runs the same kernel on transposed planes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TCTABLE = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 3, 4, 4, 4, 4, 5, 5, 5, 5, 7, 7, 8, 9, 10,
    10, 11, 13, 14, 15, 17, 19, 21, 24, 25, 29, 33, 36, 41, 45, 51,
    57, 64, 71, 80, 89, 100, 112, 125, 141, 157, 177, 198, 222, 250, 280, 314,
    352, 395], dtype=np.int32)

BETATABLE = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24,
    26, 28, 30, 32, 34, 36, 38, 40, 42, 44, 46, 48, 50, 52, 54, 56,
    58, 60, 62, 64, 66, 68, 70, 72, 74, 76, 78, 80, 82, 84, 86, 88],
    dtype=np.int32)

MAX_QP = 63
DEFAULT_INTRA_TC_OFFSET = 2

# large-filter coefficient tables indexed by max_len in {3,5,7} -> idx 0/1/2
# (m_coef, ref_coef, tc_mult) per position 0..6 (vvc_filter_template.c:495-545)
_LEN_IDX = {3: 0, 5: 1, 7: 2}
LARGE_COEF_M = np.zeros((3, 7), np.int32)
LARGE_COEF_R = np.zeros((3, 7), np.int32)
LARGE_TC_MULT = np.zeros((3, 7), np.int32)
LARGE_COEF_M[0, :3] = [53, 32, 11]
LARGE_COEF_R[0, :3] = [11, 32, 53]
LARGE_TC_MULT[0, :3] = [6, 4, 2]
LARGE_COEF_M[1, :5] = [58, 45, 32, 19, 6]
LARGE_COEF_R[1, :5] = [6, 19, 32, 45, 58]
LARGE_TC_MULT[1, :5] = [6, 5, 4, 3, 2]
LARGE_COEF_M[2, :7] = [59, 50, 41, 32, 23, 14, 5]
LARGE_COEF_R[2, :7] = [5, 14, 23, 32, 41, 50, 59]
LARGE_TC_MULT[2, :7] = [6, 5, 4, 3, 2, 1, 1]


def _len_to_idx(ml):
    # 3 -> 0, 5 -> 1, 7 -> 2
    return jnp.clip((ml - 3) >> 1, 0, 2)


@functools.partial(jax.jit, static_argnames=("grid", "bit_depth",
                                              "beta_off", "tc_off"))
def deblock_vertical_luma(plane, bs, qp, maxp, maxq, hor_ctu_edge, *,
                          grid: int = 4, bit_depth: int = 8,
                          beta_off: int = 0, tc_off: int = 0):
  """One luma deblock pass over vertical edges.

  plane: (H, W) int32, H % 4 == 0, W % grid == 0.
  bs/qp/maxp/maxq/hor_ctu_edge: (S, E) int32, S = H//4 segments,
    E = W//grid edges (edge e at x = grid*e; edge 0 must have bs 0).
    qp is the raw averaged QP; beta_off/tc_off are the effective
    slice/PH/PPS deblock offsets (already x2), applied to the table
    indices per spec 8.8.3.6.
  Returns filtered plane.
  """
  H, W = plane.shape
  S, E = bs.shape
  maxv = (1 << bit_depth) - 1

  beta = jnp.asarray(BETATABLE)[jnp.clip(qp + beta_off, 0, MAX_QP)] \
      << (bit_depth - 8)
  tc10 = jnp.asarray(TCTABLE)[jnp.clip(
      qp + DEFAULT_INTRA_TC_OFFSET * (bs - 1) + tc_off, 0,
      MAX_QP + DEFAULT_INTRA_TC_OFFSET)]
  if bit_depth < 10:
    tc = (tc10 + (1 << (9 - bit_depth))) >> (10 - bit_depth)
  else:
    tc = tc10 << (bit_depth - 10)
  tc = jnp.where(bs > 0, tc, 0)

  # gather 16-wide windows around every edge for every row:
  # win[y, e, k] = plane[y, grid*e + k - 8]
  xs = (jnp.arange(E)[None, :, None] * grid
        + jnp.arange(16)[None, None, :] - 8)
  xs = jnp.clip(xs, 0, W - 1)
  win = plane[jnp.arange(H)[:, None, None], xs]  # (H, E, 16)

  def P(i):  # p_i for all rows
    return win[..., 7 - i]

  def Q(i):
    return win[..., 8 + i]

  # per-row gradients, then pick decision lines 0 and 3 of each segment
  def seg_line(v, line):  # v: (H, E) -> (S, E) taking row 4*s + line
    return v.reshape(S, 4, E)[:, line, :]

  dp = jnp.abs(P(2) - 2 * P(1) + P(0))
  dq = jnp.abs(Q(2) - 2 * Q(1) + Q(0))
  dp0, dp3 = seg_line(dp, 0), seg_line(dp, 3)
  dq0, dq3 = seg_line(dq, 0), seg_line(dq, 3)
  d0 = dp0 + dq0
  d3 = dp3 + dq3
  tc25 = (tc * 5 + 1) >> 1
  beta_3 = beta >> 3
  beta_2 = beta >> 2

  large_p = (maxp > 3) & (hor_ctu_edge == 0)
  large_q = maxq > 3
  any_large = large_p | large_q
  mlp = jnp.where(large_p, maxp, 3)
  mlq = jnp.where(large_q, maxq, 3)

  # ---- large decision (per segment) --------------------------------
  dpl = jnp.abs(P(5) - 2 * P(4) + P(3))
  dql = jnp.abs(Q(5) - 2 * Q(4) + Q(3))
  dp0l = jnp.where(large_p, (dp0 + seg_line(dpl, 0) + 1) >> 1, dp0)
  dp3l = jnp.where(large_p, (dp3 + seg_line(dpl, 3) + 1) >> 1, dp3)
  dq0l = jnp.where(large_q, (dq0 + seg_line(dql, 0) + 1) >> 1, dq0)
  dq3l = jnp.where(large_q, (dq3 + seg_line(dql, 3) + 1) >> 1, dq3)
  d0l = dp0l + dq0l
  d3l = dp3l + dq3l
  beta53 = (beta * 3) >> 5
  beta_4 = beta >> 4

  # gather helpers on decision lines
  def win_line(line):  # (S, E, 16)
    return win.reshape(S, 4, E, 16)[:, line]

  w0, w3 = win_line(0), win_line(3)

  def PL(wl, i):
    return wl[..., 7 - i]

  def QL(wl, i):
    return wl[..., 8 + i]

  def PL_dyn(wl, ml):  # wl[..., 7-ml]
    return jnp.take_along_axis(wl, (7 - ml)[..., None], axis=-1)[..., 0]

  def QL_dyn(wl, ml):
    return jnp.take_along_axis(wl, (8 + ml)[..., None], axis=-1)[..., 0]

  sp0l = jnp.abs(PL(w0, 3) - PL(w0, 0)) + jnp.where(
      mlp == 7, jnp.abs(PL(w0, 7) - PL(w0, 6) - PL(w0, 5) + PL(w0, 4)), 0)
  sq0l = jnp.abs(QL(w0, 0) - QL(w0, 3)) + jnp.where(
      mlq == 7, jnp.abs(QL(w0, 4) - QL(w0, 5) - QL(w0, 6) + QL(w0, 7)), 0)
  sp3l = jnp.abs(PL(w3, 3) - PL(w3, 0)) + jnp.where(
      mlp == 7, jnp.abs(PL(w3, 7) - PL(w3, 6) - PL(w3, 5) + PL(w3, 4)), 0)
  sq3l = jnp.abs(QL(w3, 0) - QL(w3, 3)) + jnp.where(
      mlq == 7, jnp.abs(QL(w3, 4) - QL(w3, 5) - QL(w3, 6) + QL(w3, 7)), 0)
  sp0 = jnp.where(large_p, (sp0l + jnp.abs(PL(w0, 3) - PL_dyn(w0, mlp)) + 1) >> 1, sp0l)
  sp3 = jnp.where(large_p, (sp3l + jnp.abs(PL(w3, 3) - PL_dyn(w3, mlp)) + 1) >> 1, sp3l)
  sq0 = jnp.where(large_q, (sq0l + jnp.abs(QL(w0, 3) - QL_dyn(w0, mlq)) + 1) >> 1, sq0l)
  sq3 = jnp.where(large_q, (sq3l + jnp.abs(QL(w3, 3) - QL_dyn(w3, mlq)) + 1) >> 1, sq3l)

  use_large = (any_large & (d0l + d3l < beta)
               & (sp0 + sq0 < beta53) & (jnp.abs(PL(w0, 0) - QL(w0, 0)) < tc25)
               & (sp3 + sq3 < beta53) & (jnp.abs(PL(w3, 0) - QL(w3, 0)) < tc25)
               & ((d0l << 1) < beta_4) & ((d3l << 1) < beta_4))

  # ---- strong/weak decision (per segment) --------------------------
  normal_pass = (d0 + d3 < beta) & ~use_large
  use_strong = (normal_pass & (maxp > 2) & (maxq > 2)
                & (jnp.abs(PL(w0, 3) - PL(w0, 0)) + jnp.abs(QL(w0, 3) - QL(w0, 0)) < beta_3)
                & (jnp.abs(PL(w0, 0) - QL(w0, 0)) < tc25)
                & (jnp.abs(PL(w3, 3) - PL(w3, 0)) + jnp.abs(QL(w3, 3) - QL(w3, 0)) < beta_3)
                & (jnp.abs(PL(w3, 0) - QL(w3, 0)) < tc25)
                & ((d0 << 1) < beta_2) & ((d3 << 1) < beta_2))
  use_weak = normal_pass & ~use_strong
  nd_p = jnp.where((maxp > 1) & (maxq > 1)
                   & (dp0 + dp3 < ((beta + (beta >> 1)) >> 3)), 2, 1)
  nd_q = jnp.where((maxp > 1) & (maxq > 1)
                   & (dq0 + dq3 < ((beta + (beta >> 1)) >> 3)), 2, 1)

  active = tc > 0
  use_large &= active
  use_strong &= active
  use_weak &= active

  # broadcast segment decisions to rows
  def b(v):  # (S, E) -> (H, E)
    return jnp.repeat(v, 4, axis=0)

  tc_r = b(tc)
  use_large_r, use_strong_r, use_weak_r = b(use_large), b(use_strong), b(use_weak)
  mlp_r, mlq_r = b(mlp), b(mlq)
  nd_p_r, nd_q_r = b(nd_p), b(nd_q)

  # ---- large filter values (per row) -------------------------------
  p = [P(i) for i in range(8)]
  q = [Q(i) for i in range(8)]
  # middle value m: 6 variants selected by (mlp, mlq)
  m55 = (p[4] + p[3] + 2 * (p[2] + p[1] + p[0] + q[0] + q[1] + q[2]) + q[3] + q[4] + 8) >> 4
  m77 = (p[6] + p[5] + p[4] + p[3] + p[2] + p[1] + 2 * (p[0] + q[0])
         + q[1] + q[2] + q[3] + q[4] + q[5] + q[6] + 8) >> 4
  m57 = (p[5] + p[4] + p[3] + p[2] + 2 * (p[1] + p[0] + q[0] + q[1])
         + q[2] + q[3] + q[4] + q[5] + 8) >> 4
  m_8 = (p[3] + p[2] + p[1] + p[0] + q[0] + q[1] + q[2] + q[3] + 4) >> 3
  m37 = (2 * (p[2] + p[1] + p[0] + q[0]) + p[0] + p[1]
         + q[1] + q[2] + q[3] + q[4] + q[5] + q[6] + 8) >> 4
  m73 = (p[6] + p[5] + p[4] + p[3] + p[2] + p[1]
         + 2 * (q[2] + q[1] + q[0] + p[0]) + q[0] + q[1] + 8) >> 4
  m = jnp.select(
      [(mlp_r == 5) & (mlq_r == 5), mlp_r == mlq_r,
       mlp_r + mlq_r == 12, mlp_r + mlq_r == 8, mlq_r == 7],
      [m55, m77, m57, m_8, m37], m73)
  # refp/refq with dynamic max_len
  def row_dyn(arr16, idx):  # arr16 (H,E,16), idx (H,E)
    return jnp.take_along_axis(arr16, idx[..., None], axis=-1)[..., 0]

  refp = (row_dyn(win, 7 - mlp_r) + row_dyn(win, 7 - (mlp_r - 1)) + 1) >> 1
  refq = (row_dyn(win, 8 + mlq_r) + row_dyn(win, 8 + mlq_r - 1) + 1) >> 1
  cm = jnp.asarray(LARGE_COEF_M)
  cr = jnp.asarray(LARGE_COEF_R)
  ct = jnp.asarray(LARGE_TC_MULT)
  ip = _len_to_idx(mlp_r)
  iq = _len_to_idx(mlq_r)

  large_p_out, large_q_out = [], []
  for pos in range(7):
    cmp_, crp, ctp = cm[ip, pos], cr[ip, pos], ct[ip, pos]
    lim_p = (tc_r * ctp) >> 1
    large_p_out.append(p[pos] + jnp.clip(
        ((m * cmp_ + refp * crp + 32) >> 6) - p[pos], -lim_p, lim_p))
    cmq, crq, ctq = cm[iq, pos], cr[iq, pos], ct[iq, pos]
    lim_q = (tc_r * ctq) >> 1
    large_q_out.append(q[pos] + jnp.clip(
        ((m * cmq + refq * crq + 32) >> 6) - q[pos], -lim_q, lim_q))

  # ---- strong filter values ----------------------------------------
  tc2_r, tc3_r = tc_r << 1, tc_r * 3
  sp0v = p[0] + jnp.clip(((p[2] + 2 * p[1] + 2 * p[0] + 2 * q[0] + q[1] + 4) >> 3) - p[0], -tc3_r, tc3_r)
  sp1v = p[1] + jnp.clip(((p[2] + p[1] + p[0] + q[0] + 2) >> 2) - p[1], -tc2_r, tc2_r)
  sp2v = p[2] + jnp.clip(((2 * p[3] + 3 * p[2] + p[1] + p[0] + q[0] + 4) >> 3) - p[2], -tc_r, tc_r)
  sq0v = q[0] + jnp.clip(((p[1] + 2 * p[0] + 2 * q[0] + 2 * q[1] + q[2] + 4) >> 3) - q[0], -tc3_r, tc3_r)
  sq1v = q[1] + jnp.clip(((p[0] + q[0] + q[1] + q[2] + 2) >> 2) - q[1], -tc2_r, tc2_r)
  sq2v = q[2] + jnp.clip(((2 * q[3] + 3 * q[2] + q[1] + q[0] + p[0] + 4) >> 3) - q[2], -tc_r, tc_r)

  # ---- weak filter values ------------------------------------------
  delta0 = (9 * (q[0] - p[0]) - 3 * (q[1] - p[1]) + 8) >> 4
  weak_ok = jnp.abs(delta0) < 10 * tc_r
  d0c = jnp.clip(delta0, -tc_r, tc_r)
  wp0 = jnp.clip(p[0] + d0c, 0, maxv)
  wq0 = jnp.clip(q[0] - d0c, 0, maxv)
  tc_2 = tc_r >> 1
  dp1 = jnp.clip((((p[2] + p[0] + 1) >> 1) - p[1] + d0c) >> 1, -tc_2, tc_2)
  wp1 = jnp.clip(p[1] + dp1, 0, maxv)
  dq1 = jnp.clip((((q[2] + q[0] + 1) >> 1) - q[1] - d0c) >> 1, -tc_2, tc_2)
  wq1 = jnp.clip(q[1] + dq1, 0, maxv)

  # ---- compose output windows --------------------------------------
  new_win = win
  for pos in range(7):
    k_p = 7 - pos
    k_q = 8 + pos
    vp = large_p_out[pos]
    vq = large_q_out[pos]
    sel_p = use_large_r & (pos < mlp_r)
    sel_q = use_large_r & (pos < mlq_r)
    if pos < 3:
      sel_p_s = use_strong_r
      sel_q_s = use_strong_r
      vp = jnp.where(sel_p_s, [sp0v, sp1v, sp2v][pos], vp)
      vq = jnp.where(sel_q_s, [sq0v, sq1v, sq2v][pos], vq)
      sel_p = sel_p | sel_p_s
      sel_q = sel_q | sel_q_s
    if pos < 2:
      sel_p_w = use_weak_r & weak_ok & ((pos == 0) | (nd_p_r > 1))
      sel_q_w = use_weak_r & weak_ok & ((pos == 0) | (nd_q_r > 1))
      vp = jnp.where(sel_p_w, [wp0, wp1][pos], vp)
      vq = jnp.where(sel_q_w, [wq0, wq1][pos], vq)
      sel_p = sel_p | sel_p_w
      sel_q = sel_q | sel_q_w
    new_win = new_win.at[..., k_p].set(jnp.where(sel_p, vp, new_win[..., k_p]))
    new_win = new_win.at[..., k_q].set(jnp.where(sel_q, vq, new_win[..., k_q]))

  # scatter deltas back (edge write regions never overlap by spec design)
  delta = new_win - win
  out = plane.at[jnp.arange(H)[:, None, None], xs].add(delta)
  return out


@functools.partial(jax.jit, static_argnames=("bit_depth", "beta_off",
                                              "tc_off"))
def deblock_vertical_chroma(plane, bs, qp, maxp, maxq, *, bit_depth: int = 8,
                            beta_off: int = 0, tc_off: int = 0):
  """One 4:2:0 chroma deblock pass over vertical edges.

  plane: (H, W) int32 chroma plane, H % 2 == 0, W % 8 == 0.
  bs/qp/maxp/maxq: (S, E) int32; S = H//2 two-row segments, E = W//8
  edges (edge e at x = 8*e — the chroma deblock grid is 8 samples).  maxp is pre-demoted to 1 at horizontal CTU
  edges by the caller (max_filter_length_chroma).
  """
  H, W = plane.shape
  S, E = bs.shape
  maxv = (1 << bit_depth) - 1

  beta = jnp.asarray(BETATABLE)[jnp.clip(qp + beta_off, 0, MAX_QP)] \
      << (bit_depth - 8)
  tc10 = jnp.asarray(TCTABLE)[jnp.clip(
      qp + DEFAULT_INTRA_TC_OFFSET * (bs - 1) + tc_off, 0,
      MAX_QP + DEFAULT_INTRA_TC_OFFSET)]
  if bit_depth < 10:
    tc = (tc10 + (1 << (9 - bit_depth))) >> (10 - bit_depth)
  else:
    tc = tc10 << (bit_depth - 10)
  tc = jnp.where(bs > 0, tc, 0)

  xs = (jnp.arange(E)[None, :, None] * 8 + jnp.arange(8)[None, None, :] - 4)
  xs = jnp.clip(xs, 0, W - 1)
  win = plane[jnp.arange(H)[:, None, None], xs]  # (H, E, 8)

  def P(i):
    return win[..., 3 - i]

  def Q(i):
    return win[..., 4 + i]

  def win_line(line):  # decision lines 0 and 1 of each 2-row segment
    return win.reshape(S, 2, E, 8)[:, line]

  w0, w1 = win_line(0), win_line(1)

  def PL(wl, i):
    return wl[..., 3 - i]

  def QL(wl, i):
    return wl[..., 4 + i]

  tc25 = (tc * 5 + 1) >> 1
  beta_3 = beta >> 3
  beta_2 = beta >> 2
  active = (tc > 0) & (maxp > 0) & (maxq > 0)

  # decision for maxq == 3 (vvc_filter_template.c:700-735)
  p2_0 = jnp.where(maxp == 1, PL(w0, 1), PL(w0, 2))
  p3_0 = jnp.where(maxp == 1, PL(w0, 1), PL(w0, 3))
  p2_1 = jnp.where(maxp == 1, PL(w1, 1), PL(w1, 2))
  p3_1 = jnp.where(maxp == 1, PL(w1, 1), PL(w1, 3))
  dp0 = jnp.abs(p2_0 - 2 * PL(w0, 1) + PL(w0, 0))
  dq0 = jnp.abs(QL(w0, 2) - 2 * QL(w0, 1) + QL(w0, 0))
  dp1 = jnp.abs(p2_1 - 2 * PL(w1, 1) + PL(w1, 0))
  dq1 = jnp.abs(QL(w1, 2) - 2 * QL(w1, 1) + QL(w1, 0))
  d0 = dp0 + dq0
  d1 = dp1 + dq1
  dsam0 = (((d0 << 1) < beta_2)
           & (jnp.abs(p3_0 - PL(w0, 0)) + jnp.abs(QL(w0, 0) - QL(w0, 3)) < beta_3)
           & (jnp.abs(PL(w0, 0) - QL(w0, 0)) < tc25))
  dsam1 = (((d1 << 1) < beta_2)
           & (jnp.abs(p3_1 - PL(w1, 0)) + jnp.abs(QL(w1, 0) - QL(w1, 3)) < beta_3)
           & (jnp.abs(PL(w1, 0) - QL(w1, 0)) < tc25))
  keep3 = (maxq == 3) & (d0 + d1 < beta) & dsam0 & dsam1
  mlp = jnp.where((maxq == 3) & ~keep3, 1, maxp)
  mlq = jnp.where((maxq == 3) & ~keep3, 1, maxq)

  use_strong = active & (mlp == 3) & (mlq == 3)
  use_one_side = active & (mlq == 3) & ~use_strong
  use_weak = active & (mlq != 3)

  def b(v):
    return jnp.repeat(v, 2, axis=0)

  tc_r = b(tc)
  strong_r, oneside_r, weak_r = b(use_strong), b(use_one_side), b(use_weak)

  p0, p1, p2, p3 = P(0), P(1), P(2), P(3)
  q0, q1, q2, q3 = Q(0), Q(1), Q(2), Q(3)

  # strong (both sides)
  st_p0 = jnp.clip((p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2 + 4) >> 3, p0 - tc_r, p0 + tc_r)
  st_p1 = jnp.clip((2 * p3 + p2 + 2 * p1 + p0 + q0 + q1 + 4) >> 3, p1 - tc_r, p1 + tc_r)
  st_p2 = jnp.clip((3 * p3 + 2 * p2 + p1 + p0 + q0 + 4) >> 3, p2 - tc_r, p2 + tc_r)
  st_q0 = jnp.clip((p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3 + 4) >> 3, q0 - tc_r, q0 + tc_r)
  st_q1 = jnp.clip((p1 + p0 + q0 + 2 * q1 + q2 + 2 * q3 + 4) >> 3, q1 - tc_r, q1 + tc_r)
  st_q2 = jnp.clip((p0 + q0 + q1 + 2 * q2 + 3 * q3 + 4) >> 3, q2 - tc_r, q2 + tc_r)
  # one-sided strong
  os_p0 = jnp.clip((3 * p1 + 2 * p0 + q0 + q1 + q2 + 4) >> 3, p0 - tc_r, p0 + tc_r)
  os_q0 = jnp.clip((2 * p1 + p0 + 2 * q0 + q1 + q2 + q3 + 4) >> 3, q0 - tc_r, q0 + tc_r)
  os_q1 = jnp.clip((p1 + p0 + q0 + 2 * q1 + q2 + 2 * q3 + 4) >> 3, q1 - tc_r, q1 + tc_r)
  os_q2 = jnp.clip((p0 + q0 + q1 + 2 * q2 + 3 * q3 + 4) >> 3, q2 - tc_r, q2 + tc_r)
  # weak
  wd = jnp.clip((((q0 - p0) * 4) + p1 - q1 + 4) >> 3, -tc_r, tc_r)
  wk_p0 = jnp.clip(p0 + wd, 0, maxv)
  wk_q0 = jnp.clip(q0 - wd, 0, maxv)

  new_win = win
  upd = [
      (3, jnp.select([strong_r, oneside_r, weak_r], [st_p0, os_p0, wk_p0], p0),
       strong_r | oneside_r | weak_r),
      (2, st_p1, strong_r),
      (1, st_p2, strong_r),
      (4, jnp.select([strong_r, oneside_r, weak_r], [st_q0, os_q0, wk_q0], q0),
       strong_r | oneside_r | weak_r),
      (5, jnp.where(strong_r, st_q1, os_q1), strong_r | oneside_r),
      (6, jnp.where(strong_r, st_q2, os_q2), strong_r | oneside_r),
  ]
  for k, val, sel in upd:
    new_win = new_win.at[..., k].set(jnp.where(sel, val, new_win[..., k]))

  delta = new_win - win
  return plane.at[jnp.arange(H)[:, None, None], xs].add(delta)

"""Adaptive loop filter as whole-plane vectorized passes.

Bit-exact mirror of the reference ALF (spec 8.8.5; parity targets
vvc_filter_template.c:299-381 alf_classify, :43-135 alf_filter_luma,
:137-237 alf_filter_chroma, :239-262 alf_filter_cc, and the driver
ff_vvc_alf_filter, vvc_filter.c:1254-1320).

The reference filters per CTU from a padded buffer holding pre-ALF
neighbour samples (alf_prepare_buffer) — an in-place scheduling
artifact.  Out-of-place whole-plane passes read pre-ALF neighbours by
construction, so only two reference behaviours need explicit handling:
  * picture-border replication -> clamped sample indexing;
  * the ALWAYS-ON horizontal virtual boundary 4 luma rows above every
    CTU row boundary (vb_pos) -> per-row tap-row remapping, identical
    in every CTU row band, expressed on row index % ctb.

All functions take exact picture-size (H, W) int32 planes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# transpose_idx -> coefficient position permutation (alf_recon_coeff)
TRANSPOSE_IDX = np.array([
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11],
    [9, 4, 10, 8, 1, 5, 11, 7, 3, 0, 2, 6],
    [0, 3, 2, 1, 8, 7, 6, 5, 4, 9, 10, 11],
    [9, 8, 10, 4, 3, 7, 11, 5, 1, 0, 2, 6],
], dtype=np.int32)

# class_idx from directional activity (alf_get_idx)
ARG_VAR = np.array([0, 1, 2, 2, 2, 2, 2, 3, 3, 3, 3, 3, 3, 3, 3, 4],
                   dtype=np.int32)

# luma 7x7 diamond: coefficient j -> symmetric neighbour offsets
# (dy0, dx0), (dy1, dx1) (alf_filter_luma tap table)
LUMA_TAPS = [((3, 0), (-3, 0)), ((2, 1), (-2, -1)), ((2, 0), (-2, 0)),
             ((2, -1), (-2, 1)), ((1, 2), (-1, -2)), ((1, 1), (-1, -1)),
             ((1, 0), (-1, 0)), ((1, -1), (-1, 1)), ((1, -2), (-1, 2)),
             ((0, 3), (0, -3)), ((0, 2), (0, -2)), ((0, 1), (0, -1))]

# chroma 5x5 diamond
CHROMA_TAPS = [((2, 0), (-2, 0)), ((1, 1), (-1, -1)), ((1, 0), (-1, 0)),
               ((1, -1), (-1, 1)), ((0, 2), (0, -2)), ((0, 1), (0, -1))]

# cc-alf: 7 taps on the luma grid around the collocated sample
CC_TAPS = [(-1, 0), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1), (2, 0)]


def _mulcmp_le(a, b, c, d):
  """Exact a*b <= c*d for non-negative int32 operands whose product may
  exceed 31 bits (the reference promotes to uint64, alf_get_idx)."""
  ah = a * (b >> 9) + ((a * (b & 511)) >> 9)
  al = (a * (b & 511)) & 511
  ch = c * (d >> 9) + ((c * (d & 511)) >> 9)
  cl = (c * (d & 511)) & 511
  return jnp.where(ah != ch, ah < ch, al <= cl)


def _vb_row_offsets(y, ctb, vb_rel):
  """Per-row tap row-offset maps with virtual-boundary remapping.

  Returns (d1, d2, d3) positive-side and the symmetric negative side is
  -dk by construction of the remap chains (both sides collapse toward
  row 0 with identical conditions).  y: (H, 1) absolute rows."""
  ly = y % ctb
  above = (ly < vb_rel) & (ly >= vb_rel - 4)
  below = (ly >= vb_rel) & (ly <= vb_rel + 3)
  d1 = jnp.where((above & (ly == vb_rel - 1)) | (below & (ly == vb_rel)),
                 0, 1)
  d2 = jnp.where((above & (ly >= vb_rel - 2)) | (below & (ly <= vb_rel + 1)),
                 d1, 2)
  d3 = jnp.where((above & (ly >= vb_rel - 3)) | (below & (ly <= vb_rel + 2)),
                 d2, 3)
  return d1, d2, d3


def _near_vb(y, ctb, vb_rel):
  ly = y % ctb
  return (ly >= vb_rel - 1) & (ly <= vb_rel)


def _clipf(curr, v, clip):
  return jnp.clip(v - curr, -clip, clip)


def alf_classify(plane, ctb: int, bit_depth: int):
  """Per-4x4-block (class_idx, transpose_idx) for a (H, W) luma plane
  (alf_classify + alf_get_idx).  Returns two (H//4, W//4) int32."""
  H, W = plane.shape
  vb_rel = ctb - 4

  def P(r, c):
    return plane[jnp.clip(r, 0, H - 1)[:, None],
                 jnp.clip(c, 0, W - 1)[None, :]]

  # gradient field on odd rows r = 2*gi - 3, even cols c = 2*ci - 2;
  # the virtual-boundary row substitutions (s3:=s2 at local y == vb,
  # s0:=s1 at local y == vb+2) depend only on r % ctb, so one global
  # field serves every CTU row band
  Hg, Wg = H // 2 + 2, W // 2 + 2
  r = 2 * jnp.arange(Hg) - 3
  c = 2 * jnp.arange(Wg) - 2
  lr = r % ctb
  # s0..s3 are rows r..r+3 with the VB substitutions
  r0 = jnp.where(lr == ctb - 5, r + 1, r)          # s0 := s1
  r3 = jnp.where(lr == ctb - 7, r + 2, r + 3)      # s3 := s2

  val0 = P(r + 1, c) * 2
  vert0 = jnp.abs(val0 - P(r0, c) - P(r + 2, c))
  horz0 = jnp.abs(val0 - P(r + 1, c - 1) - P(r + 1, c + 1))
  dig00 = jnp.abs(val0 - P(r0, c - 1) - P(r + 2, c + 1))
  dig10 = jnp.abs(val0 - P(r0, c + 1) - P(r + 2, c - 1))

  val1 = P(r + 2, c + 1) * 2
  vert1 = jnp.abs(val1 - P(r + 1, c + 1) - P(r3, c + 1))
  horz1 = jnp.abs(val1 - P(r + 2, c) - P(r + 2, c + 2))
  dig01 = jnp.abs(val1 - P(r + 1, c) - P(r3, c + 2))
  dig11 = jnp.abs(val1 - P(r + 1, c + 2) - P(r3, c))

  grad = jnp.stack([vert0 + vert1, horz0 + horz1,
                    dig00 + dig01, dig10 + dig11])  # (4, Hg, Wg)

  nby, nbx = H // 4, W // 4
  by = jnp.arange(nby) * 4
  ly = by % ctb
  start = jnp.where(ly == vb_rel, 1, 0)             # (nby,)
  end = jnp.where(ly == vb_rel - 4, 3, 4)
  ac = jnp.where((ly == vb_rel) | (ly == vb_rel - 4), 3, 2)

  sums = jnp.zeros((4, nby, nbx), jnp.int32)
  for i in range(4):
    live_i = ((i >= start) & (i < end))[None, :, None]
    row_slice = grad[:, i:i + 2 * nby:2, :]          # rows 2*by + i
    for j in range(4):
      sums = sums + jnp.where(live_i,
                              row_slice[:, :, j:j + 2 * nbx:2], 0)

  v, hz, d0g, d1g = sums[0], sums[1], sums[2], sums[3]
  dir_hv = (v <= hz).astype(jnp.int32)
  hv1 = jnp.maximum(v, hz)
  hv0 = jnp.minimum(v, hz)
  dir_d = (d0g <= d1g).astype(jnp.int32)
  d1 = jnp.maximum(d0g, d1g)
  d0 = jnp.minimum(d0g, d1g)
  dir1 = _mulcmp_le(d1, hv0, hv1, d0)
  hvd1 = jnp.where(dir1, hv1, d1)
  hvd0 = jnp.where(dir1, hv0, d0)
  sum_hv = v + hz
  act = jnp.clip((sum_hv * ac[:, None]) >> (bit_depth - 1), 0, 15)
  cls = jnp.asarray(ARG_VAR)[act]
  dir1i = dir1.astype(jnp.int32)
  cls = jnp.where(hvd1 * 2 > 9 * hvd0, cls + ((dir1i * 2) + 2) * 5,
                  jnp.where(hvd1 > 2 * hvd0, cls + ((dir1i * 2) + 1) * 5,
                            cls))
  transpose = dir_d * 2 + dir_hv
  return cls, transpose


def _block_to_pixel(blk, H, W, bs=4):
  """(H//bs, W//bs) -> (H, W) by block replication."""
  return jnp.repeat(jnp.repeat(blk, bs, axis=0), bs, axis=1)[:H, :W]


def alf_filter_luma(plane, coeff, clip, ctb: int, on, bit_depth: int):
  """7x7 diamond clipped filter (alf_filter_luma).

  coeff/clip: (H//4, W//4, 12) per-block (transpose already applied);
  on: (H//4, W//4) bool — blocks whose CTB has alf_ctb_flag[luma].
  """
  H, W = plane.shape
  vb_rel = ctb - 4
  y = jnp.arange(H)[:, None]
  x = jnp.arange(W)[None, :]
  d1, d2, d3 = _vb_row_offsets(y, ctb, vb_rel)
  dmap = {1: d1, 2: d2, 3: d3, 0: jnp.zeros_like(d1)}

  def tap(dy, dx):
    rows = jnp.clip(y + (dmap[abs(dy)] if dy >= 0 else -dmap[abs(dy)]),
                    0, H - 1)
    cols = jnp.clip(x + dx, 0, W - 1)
    return plane[rows, cols]

  curr = plane
  total = jnp.zeros((H, W), jnp.int32)
  for j, ((dy0, dx0), (dy1, dx1)) in enumerate(LUMA_TAPS):
    cj = _block_to_pixel(coeff[:, :, j], H, W)
    kj = _block_to_pixel(clip[:, :, j], H, W)
    total = total + cj * (_clipf(curr, tap(dy0, dx0), kj)
                          + _clipf(curr, tap(dy1, dx1), kj))
  near = _near_vb(y, ctb, vb_rel)
  s = jnp.where(near, (total + (1 << 9)) >> 10, (total + 64) >> 7)
  out = jnp.clip(curr + s, 0, (1 << bit_depth) - 1)
  return jnp.where(_block_to_pixel(on.astype(jnp.int32), H, W) > 0,
                   out, plane)


def alf_filter_chroma(plane, coeff, clip, ctb_c: int, on, bit_depth: int):
  """5x5 diamond clipped filter (alf_filter_chroma).

  coeff/clip: (H, W, 6) per-pixel (expanded from the CTB alternative
  selection); on: (H, W) bool.  ctb_c: CTB size in chroma samples.
  """
  H, W = plane.shape
  vb_rel = ctb_c - 2
  y = jnp.arange(H)[:, None]
  x = jnp.arange(W)[None, :]
  ly = y % ctb_c
  above = (ly < vb_rel) & (ly >= vb_rel - 2)
  below = (ly >= vb_rel) & (ly <= vb_rel + 1)
  d1 = jnp.where((above & (ly == vb_rel - 1)) | (below & (ly == vb_rel)),
                 0, 1)
  d2 = jnp.where((above & (ly >= vb_rel - 2)) | (below & (ly <= vb_rel + 1)),
                 d1, 2)
  dmap = {0: jnp.zeros_like(d1), 1: d1, 2: d2}

  def tap(dy, dx):
    rows = jnp.clip(y + (dmap[abs(dy)] if dy >= 0 else -dmap[abs(dy)]),
                    0, H - 1)
    cols = jnp.clip(x + dx, 0, W - 1)
    return plane[rows, cols]

  curr = plane
  total = jnp.zeros((H, W), jnp.int32)
  for j, ((dy0, dx0), (dy1, dx1)) in enumerate(CHROMA_TAPS):
    cj = coeff[:, :, j]
    kj = clip[:, :, j]
    total = total + cj * (_clipf(curr, tap(dy0, dx0), kj)
                          + _clipf(curr, tap(dy1, dx1), kj))
  ly2 = y % ctb_c
  near = (ly2 >= vb_rel - 1) & (ly2 <= vb_rel)
  s = jnp.where(near, (total + (1 << 9)) >> 10, (total + 64) >> 7)
  out = jnp.clip(curr + s, 0, (1 << bit_depth) - 1)
  return jnp.where(on, out, plane)


def alf_filter_cc(chroma, luma_pre_alf, coeff, ctb: int, on,
                  bit_depth: int, vs: int = 1, hs: int = 1):
  """Cross-component filter (alf_filter_cc): adds a high-pass of the
  PRE-ALF luma to the (chroma-ALF'd) chroma plane.

  coeff: (Hc, Wc, 7) per-pixel; on: (Hc, Wc) bool; ctb: luma CTB size.
  """
  Hc, Wc = chroma.shape
  Hl, Wl = luma_pre_alf.shape
  vb_rel = ctb - 4
  yc = jnp.arange(Hc)[:, None]
  xc = jnp.arange(Wc)[None, :]
  yl = yc << vs
  xl = xc << hs
  pos = yl % ctb
  # row remapping: collapse taps near the luma virtual boundary
  sub_all = (pos == vb_rel - 1) | (pos == vb_rel)     # s3=s2=s0 := s1
  sub_s3 = (pos == vb_rel - 2) | (pos == vb_rel + 1)  # s3 := s2
  rm1 = jnp.where(sub_all, 0, -1)        # s0 (row -1)
  r1 = jnp.where(sub_all, 0, 1)          # s2 (row +1)
  r2 = jnp.where(sub_all, 0, jnp.where(sub_s3, r1, 2))  # s3 (row +2)

  def ltap(dy_map, dx):
    rows = jnp.clip(yl + dy_map, 0, Hl - 1)
    cols = jnp.clip(xl + dx, 0, Wl - 1)
    return luma_pre_alf[rows, cols]

  center = ltap(jnp.zeros_like(r1), 0)
  rows_of = {-1: rm1, 0: jnp.zeros_like(r1), 1: r1, 2: r2}
  total = jnp.zeros((Hc, Wc), jnp.int32)
  for j, (dy, dx) in enumerate(CC_TAPS):
    total = total + coeff[:, :, j] * (ltap(rows_of[dy], dx) - center)
  s = jnp.clip((total + 64) >> 7, -(1 << (bit_depth - 1)),
               (1 << (bit_depth - 1)) - 1)
  out = jnp.clip(chroma + s, 0, (1 << bit_depth) - 1)
  # 4:4:4 (vs == 0) only: samples on the two luma VB rows are skipped
  skip = (vs == 0) & ((pos == vb_rel) | (pos == vb_rel + 1))
  return jnp.where(on & ~skip, out, chroma)

"""Spatial ('tile'-axis) sharding of filter stages with halo exchange.

The reference parallelizes in-loop filters across CTUs with a stencil
task graph (P2: anti-diagonal wavefronts, vvc_thread.c:156-184).  The
TPU mapping: each filter stage is a whole-plane pass, sharded by
CTB-row bands over the mesh 'tile' axis; the stencil dependency
becomes a 1-row halo exchanged between neighbouring shards over ICI
(jax.lax.ppermute inside shard_map) — the ring-communication pattern
of the scaling playbook, not a task graph.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.sao import sao_rows


def deblock_vertical_tiled(plane, bs, qp, maxp, maxq, hor_ctu_edge, *,
                           grid: int = 4, bit_depth: int, mesh,
                           axis: str = "tile", beta_off: int = 0,
                           tc_off: int = 0, chroma: bool = False,
                           seg: int = 4):
  """Bit-exact deblock_vertical_{luma,chroma}, sharded by row bands
  over `axis`.  Vertical-edge filtering only reads and writes samples
  within each `seg`-row segment, so the shards need NO halo — the
  stencil axis is entirely along the edge columns.  The caller applies
  the horizontal pass by transposing, exactly like the whole-plane op.

  plane: (Hp, Wp) int32; bs/qp/maxp/maxq: (S, E) with S = Hp // seg.
  """
  from ..ops.deblock import deblock_vertical_chroma, deblock_vertical_luma

  T = mesh.shape[axis]
  Hp, Wp = plane.shape
  S = bs.shape[0]
  # band height: a multiple of seg rows covering the plane across T
  rows_per = -(-Hp // (T * seg)) * seg
  Hp2 = rows_per * T
  segs_per = rows_per // seg
  plane_p = jnp.pad(plane, ((0, Hp2 - Hp), (0, 0)))
  padg = ((0, segs_per * T - S), (0, 0))
  bs_p = jnp.pad(bs, padg)   # bs 0 = no filtering on padded segments
  qp_p = jnp.pad(qp, padg)
  mp_p = jnp.pad(maxp, padg)
  mq_p = jnp.pad(maxq, padg)
  he_p = jnp.pad(hor_ctu_edge, padg) if hor_ctu_edge is not None else None

  specs = (P(axis, None),) * (5 if chroma else 6)

  @functools.partial(jax.shard_map, mesh=mesh, in_specs=specs,
                     out_specs=P(axis, None))
  def run(pl, b, q, p_, q_, *he):
    if chroma:
      return deblock_vertical_chroma(pl, b, q, p_, q_,
                                     bit_depth=bit_depth,
                                     beta_off=beta_off, tc_off=tc_off)
    return deblock_vertical_luma(pl, b, q, p_, q_, he[0], grid=grid,
                                 bit_depth=bit_depth, beta_off=beta_off,
                                 tc_off=tc_off)

  args = (plane_p, bs_p, qp_p, mp_p, mq_p)
  if not chroma:
    args = args + (he_p,)
  return run(*args)[:Hp]


def alf_luma_tiled(ly0, ctb_bank, ctb_flag, banks_coeff, banks_clipv,
                   *, ctb: int, bit_depth: int, mesh, axis: str = "tile"):
  """Bit-exact ALF luma (classify + 7x7 clipped filter), sharded by
  CTB-row bands over `axis` with a one-CTB-row halo.

  The ALF virtual boundary already confines most row taps to the CTU
  row (ops/alf vb remapping), but classification windows and the first
  rows of a CTU still read a few rows across the boundary: a full
  CTB-row halo (edge-replicated at the ring ends, matching the global
  clamp) keeps y % ctb congruent and covers every tap.

  ly0: (H, W) int32 cropped luma; ctb_bank/ctb_flag: (nby, nbx) per-CTB
  filter-bank index / on flag; banks_coeff/banks_clipv: (B, 25, 12).
  """
  from ..ops.alf import TRANSPOSE_IDX, alf_classify, alf_filter_luma

  T = mesh.shape[axis]
  H, W = ly0.shape
  rows_per = -(-H // (T * ctb)) * ctb
  H2 = rows_per * T
  plane_p = jnp.pad(ly0, ((0, H2 - H), (0, 0)), mode="edge")
  nby = -(-H // ctb)
  cb_per = rows_per // ctb
  padb = ((0, cb_per * T - nby), (0, 0))
  bank_p = jnp.pad(ctb_bank, padb)
  flag_p = jnp.pad(ctb_flag, padb)  # padding rows: filter off

  up_perm = [(i, i + 1) for i in range(T - 1)]
  dn_perm = [(i + 1, i) for i in range(T - 1)]

  @functools.partial(
      jax.shard_map, mesh=mesh,
      in_specs=(P(axis, None), P(axis, None), P(axis, None), P(None),
                P(None)),
      out_specs=P(axis, None))
  def run(pl, bank, flag, bco, bcl):
    tid = jax.lax.axis_index(axis)
    up = jax.lax.ppermute(pl[-ctb:], axis, up_perm)
    dn = jax.lax.ppermute(pl[:ctb], axis, dn_perm)
    # ring ends: edge-replicate own first/last row (== the global
    # row clamp the whole-plane op applies at picture borders)
    up = jnp.where(tid == 0, jnp.broadcast_to(pl[:1], (ctb, pl.shape[1])),
                   up)
    dn = jnp.where(tid == T - 1,
                   jnp.broadcast_to(pl[-1:], (ctb, pl.shape[1])), dn)
    ext = jnp.concatenate([up, pl, dn], axis=0)
    cls, tr = alf_classify(ext, ctb, bit_depth)
    nby_l, nbx_l = ext.shape[0] // 4, ext.shape[1] // 4
    # per-4x4 bank from the CTB grid (halo rows use clamped CTB rows;
    # their outputs are discarded)
    cb_by = jnp.clip((jnp.arange(nby_l) * 4) // ctb - 1, 0,
                     bank.shape[0] - 1)
    cb_bx = (jnp.arange(nbx_l) * 4) // ctb
    bank44 = bank[cb_by[:, None], cb_bx[None, :]]
    flag44 = flag[cb_by[:, None], cb_bx[None, :]]
    coeff12 = bco[bank44, cls]
    clip12 = bcl[bank44, cls]
    perm = jnp.asarray(TRANSPOSE_IDX)[tr]
    coeff12 = jnp.take_along_axis(coeff12, perm, axis=-1)
    clip12 = jnp.take_along_axis(clip12, perm, axis=-1)
    out = alf_filter_luma(ext, coeff12, clip12, ctb, flag44 > 0,
                          bit_depth)
    return out[ctb:ctb + pl.shape[0]]

  return run(plane_p, bank_p, flag_p, jnp.asarray(banks_coeff),
             jnp.asarray(banks_clipv))[:H]


def sao_plane_tiled(plane, sao_type, band_pos, offv, eo_class,
                    pic_w, pic_h, *, ctb: int, bit_depth: int, mesh,
                    axis: str = "tile"):
  """Bit-exact sao_plane, computed as CTB-row bands sharded over
  `axis` with a one-row halo ppermute between neighbours.

  plane: (Hp, Wp) int32.  Returns the filtered (Hp, Wp) plane.
  """
  T = mesh.shape[axis]
  Hp, Wp = plane.shape
  rows_per = -(-Hp // (T * ctb)) * ctb    # CTB-aligned band height
  Hp2 = rows_per * T
  cb_per = rows_per // ctb
  CBH, CBW = sao_type.shape[:2]

  plane_p = jnp.pad(plane, ((0, Hp2 - Hp), (0, 0)))
  padg = ((0, cb_per * T - CBH), (0, 0))
  type_p = jnp.pad(sao_type, padg)        # type 0 = SAO off (padding)
  bp_p = jnp.pad(band_pos, padg)
  eo_p = jnp.pad(eo_class, padg)
  ov_p = jnp.pad(offv, padg + ((0, 0),))

  up_perm = [(i, i + 1) for i in range(T - 1)]
  dn_perm = [(i + 1, i) for i in range(T - 1)]

  @functools.partial(
      jax.shard_map, mesh=mesh,
      in_specs=(P(axis, None), P(axis, None), P(axis, None),
                P(axis, None, None), P(axis, None)),
      out_specs=P(axis, None))
  def run(pl, st, bp, ov, eo):
    tid = jax.lax.axis_index(axis)
    # halo exchange: last row -> next shard's top halo, first row ->
    # previous shard's bottom halo; ring ends receive zeros, which the
    # in-picture mask inside sao_rows ignores
    up = jax.lax.ppermute(pl[-1:], axis, up_perm)
    dn = jax.lax.ppermute(pl[:1], axis, dn_perm)
    ext = jnp.concatenate([up, pl, dn], axis=0)
    return sao_rows(ext, st, bp, ov, eo, pic_w, pic_h,
                    ctb=ctb, bit_depth=bit_depth,
                    y0=tid * rows_per, halo=1)

  return run(plane_p, type_p, bp_p, ov_p, eo_p)[:Hp]

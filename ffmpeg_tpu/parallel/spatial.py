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

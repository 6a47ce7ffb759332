"""Sample Adaptive Offset as a full-plane vectorized pass.

Bit-exact mirror of the reference SAO filters (spec 8.8.2; parity
target vvc_filter_template.c sao_band_filter/sao_edge_filter +
ff_vvc_sao_filter, vvc_filter.c:154-306).  The whole plane is filtered
out-of-place from the deblocked input, so the reference's pre-SAO
line-buffer machinery (an in-place scheduling artifact) is unnecessary:
every edge comparison reads the unfiltered neighbour by construction.

Edge offsets are not applied where the needed neighbour lies outside
the picture (single slice/tile; loop-filter-across cases come with
tiles).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# per-eo-class neighbour offsets (a, b): (dx, dy)
_EO_DIRS = np.array([
    [[-1, 0], [1, 0]],    # 0: horizontal
    [[0, -1], [0, 1]],    # 1: vertical
    [[-1, -1], [1, 1]],   # 2: 135 diagonal
    [[1, -1], [-1, 1]],   # 3: 45 diagonal
], dtype=np.int32)

# edge_idx remap (sao_edge_filter): 2+sign(c-a)+sign(c-b) -> offset slot
_EDGE_MAP = np.array([1, 2, 0, 3, 4], dtype=np.int32)


def sao_rows(plane_ext, sao_type, band_pos, offv, eo_class, pic_w, pic_h,
             *, ctb: int, bit_depth: int, y0=0, halo: int = 0):
  """Row-band SAO core: filters rows [halo, Hs+halo) of plane_ext,
  whose first/last `halo` rows carry neighbour rows from the adjacent
  band (or anything, at picture borders — in_pic masks them).  `y0` is
  the global picture row of the band's first real row; sao_type /
  band_pos / eo_class / offv are the band's OWN CTB rows (the band must
  be CTB-row aligned).  Returns the filtered (Hs, Wp) real rows.
  This is the unit the 'tile'-sharded filter stage runs per shard
  (parallel/spatial.py); sao_plane is the halo=0 whole-plane wrapper."""
  He, Wp = plane_ext.shape
  Hs = He - 2 * halo
  maxv = (1 << bit_depth) - 1
  y = jnp.arange(Hs)[:, None] + y0            # global picture row
  ye = jnp.arange(Hs)[:, None] + halo         # row in plane_ext
  x = jnp.arange(Wp)[None, :]
  plane = plane_ext[halo:He - halo if halo else He, :]
  cby = jnp.clip((y - y0) // ctb, 0, sao_type.shape[0] - 1)
  cbx = jnp.clip(x // ctb, 0, sao_type.shape[1] - 1)
  t = sao_type[cby, cbx]          # (Hp, Wp)
  bpos = band_pos[cby, cbx]
  eo = eo_class[cby, cbx]
  offs = offv[cby, cbx]           # (Hp, Wp, 5)

  # band offset
  band = plane >> (bit_depth - 5)
  delta = (band - bpos) & 31
  band_off = jnp.where(delta < 4,
                       jnp.take_along_axis(
                           offs, jnp.clip(delta + 1, 0, 4)[..., None],
                           axis=-1)[..., 0],
                       0)

  # edge offset (neighbour rows may come from the halo)
  dirs = jnp.asarray(_EO_DIRS)
  da = dirs[eo, 0]  # (Hs, Wp, 2)
  db = dirs[eo, 1]
  ax = jnp.clip(x + da[..., 0], 0, Wp - 1)
  ay = jnp.clip(ye + da[..., 1], 0, He - 1)
  bx = jnp.clip(x + db[..., 0], 0, Wp - 1)
  by = jnp.clip(ye + db[..., 1], 0, He - 1)
  a = plane_ext[ay, ax]
  b = plane_ext[by, bx]
  idx = 2 + jnp.sign(plane - a) + jnp.sign(plane - b)
  slot = jnp.asarray(_EDGE_MAP)[idx]
  edge_off = jnp.take_along_axis(offs, slot[..., None], axis=-1)[..., 0]
  # neighbours must be inside the picture
  in_pic = ((x + da[..., 0] >= 0) & (x + da[..., 0] < pic_w)
            & (y + da[..., 1] >= 0) & (y + da[..., 1] < pic_h)
            & (x + db[..., 0] >= 0) & (x + db[..., 0] < pic_w)
            & (y + db[..., 1] >= 0) & (y + db[..., 1] < pic_h))
  edge_off = jnp.where(in_pic, edge_off, 0)

  off = jnp.where(t == 1, band_off, jnp.where(t == 2, edge_off, 0))
  out = jnp.clip(plane + off, 0, maxv)
  return jnp.where((y < pic_h) & (x < pic_w), out, plane)


@functools.partial(jax.jit, static_argnames=("ctb", "bit_depth"))
def sao_plane(plane, sao_type, band_pos, offv, eo_class, pic_w, pic_h, *,
              ctb: int, bit_depth: int):
  """plane: (Hp, Wp) int32 (padded; only pic area filtered).
  sao_type/band_pos/eo_class: (CBH, CBW) int32 per-CTB grids.
  offv: (CBH, CBW, 5) int32 offsets.
  Returns filtered plane.
  """
  return sao_rows(plane, sao_type, band_pos, offv, eo_class, pic_w, pic_h,
                  ctb=ctb, bit_depth=bit_depth, y0=0, halo=0)

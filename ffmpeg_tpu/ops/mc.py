"""Motion-compensated prediction as batched JAX gathers + separable taps.

Bit-exact mirror of the reference's MC path for translational uni
prediction (vvc_inter.c:222-260 + h2656_inter_template.c): 16-phase
8-tap luma and 32-phase 4-tap chroma interpolation, with the phase-0
identity filter folding the copy/h-only/v-only variants into one
separable formulation (identical integer results).  Out-of-frame
reads replicate edge pixels via clamped gather indices — the
emulated-edge behaviour.

MVs are 1/16-pel (luma domain).  All math int32.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_TABLES = np.load(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "models", "vvc", "vvc_tables.npz"))

INTERP_LUMA = _TABLES["interp_luma"].astype(np.int32)      # (3, 16, 8)
INTERP_CHROMA = _TABLES["interp_chroma"].astype(np.int32)  # (3, 32, 4)


@functools.partial(jax.jit, static_argnames=("w", "h", "is_chroma",
                                             "bit_depth"))
def mc_uni_batch(ref_plane, x0s, y0s, mvx, mvy, *, w: int, h: int,
                 is_chroma: bool, bit_depth: int = 8):
  """Uni-directional MC for N same-size blocks.

  ref_plane: (H, W) int32 reference component plane.
  x0s/y0s: (N,) block positions in component coords.
  mvx/mvy: (N,) MVs in 1/16-pel luma units.
  Returns (N, h, w) int32 predicted blocks (pixel range).
  """
  H, W = ref_plane.shape
  taps = 4 if is_chroma else 8
  before = 1 if is_chroma else 3
  if is_chroma:
    frac_x = mvx & 31
    frac_y = mvy & 31
    ix = x0s + (mvx >> 5)
    iy = y0s + (mvy >> 5)
    ftab = jnp.asarray(INTERP_CHROMA[0])
  else:
    frac_x = mvx & 15
    frac_y = mvy & 15
    ix = x0s + (mvx >> 4)
    iy = y0s + (mvy >> 4)
    ftab = jnp.asarray(INTERP_LUMA[0])

  hf = ftab[frac_x]  # (N, taps)
  vf = ftab[frac_y]

  # gather (h + taps - 1, w + taps - 1) windows with clamped indices
  gw = w + taps - 1
  gh = h + taps - 1
  xs = jnp.clip(ix[:, None] + jnp.arange(gw)[None, :] - before, 0, W - 1)
  ys = jnp.clip(iy[:, None] + jnp.arange(gh)[None, :] - before, 0, H - 1)
  win = ref_plane[ys[:, :, None], xs[:, None, :]]  # (N, gh, gw)

  shift1 = bit_depth - 8
  # horizontal pass
  acc = jnp.zeros((x0s.shape[0], gh, w), dtype=jnp.int32)
  for k in range(taps):
    acc = acc + hf[:, k, None, None] * win[:, :, k:k + w]
  tmp = acc >> shift1
  # vertical pass (tmp is 14-bit scale)
  acc = jnp.zeros((x0s.shape[0], h, w), dtype=jnp.int32)
  for k in range(taps):
    acc = acc + vf[:, k, None, None] * tmp[:, k:k + h, :]
  val = acc >> 6
  # uni output rounding (put_uni_*): (val + off) >> (14 - bd), clip
  shift2 = 14 - bit_depth
  off = 1 << (shift2 - 1)
  return jnp.clip((val + off) >> shift2, 0, (1 << bit_depth) - 1)


@functools.partial(jax.jit, static_argnames=("w", "h", "is_chroma",
                                             "bit_depth"))
def mc_put_batch(ref_plane, x0s, y0s, mvx, mvy, *, w: int, h: int,
                 is_chroma: bool, bit_depth: int = 8):
  """Bi-prediction intermediate MC: returns 14-bit-scale (N, h, w) int32
  without the final uni rounding (h2656 put_* path)."""
  H, W = ref_plane.shape
  taps = 4 if is_chroma else 8
  before = 1 if is_chroma else 3
  if is_chroma:
    frac_x = mvx & 31
    frac_y = mvy & 31
    ix = x0s + (mvx >> 5)
    iy = y0s + (mvy >> 5)
    ftab = jnp.asarray(INTERP_CHROMA[0])
  else:
    frac_x = mvx & 15
    frac_y = mvy & 15
    ix = x0s + (mvx >> 4)
    iy = y0s + (mvy >> 4)
    ftab = jnp.asarray(INTERP_LUMA[0])
  hf = ftab[frac_x]
  vf = ftab[frac_y]
  gw = w + taps - 1
  gh = h + taps - 1
  xs = jnp.clip(ix[:, None] + jnp.arange(gw)[None, :] - before, 0, W - 1)
  ys = jnp.clip(iy[:, None] + jnp.arange(gh)[None, :] - before, 0, H - 1)
  win = ref_plane[ys[:, :, None], xs[:, None, :]]
  shift1 = bit_depth - 8
  acc = jnp.zeros((x0s.shape[0], gh, w), dtype=jnp.int32)
  for k in range(taps):
    acc = acc + hf[:, k, None, None] * win[:, :, k:k + w]
  tmp = acc >> shift1
  acc = jnp.zeros((x0s.shape[0], h, w), dtype=jnp.int32)
  for k in range(taps):
    acc = acc + vf[:, k, None, None] * tmp[:, k:k + h, :]
  return acc >> 6


def mc_avg(t0, t1, bit_depth: int = 8):
  """Bi-prediction average (vvc_inter_template.c:25-41)."""
  shift = max(3, 15 - bit_depth)
  off = 1 << (shift - 1)
  return jnp.clip((t0 + t1 + off) >> shift, 0, (1 << bit_depth) - 1)

"""Frame reconstruction pipeline: syntax tensors -> decoded planes.

Stage structure (TPU-first, per SURVEY §7): a batched dequant+inverse-
transform pass over all TUs of a size class (MXU matmuls), then a single
jitted sequential pass over CUs for intra prediction + residual add
(reconstruction is causally dependent on neighbours; the CU loop is a
lax.fori_loop with dynamic slices so the whole frame is one XLA program).

Bit-exact vs the reference decode path (vvc_intra.c:432-527).
v1 scope: all-intra, uniform CU==CTU grids, DCT2, no loop filters.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import intra as I
from ...ops.transform import dequant_itx_batch, dequant_scale_shift
from .host import FrameSyntax


def derive_cu_controls(fs: FrameSyntax, plane_kind: str) -> dict:
  """Host-side per-CU control arrays for one plane type.

  plane_kind: 'y' or 'c' (cb/cr share geometry+mode).
  All returned arrays are numpy int32 of shape (n_cus,).
  """
  is_chroma = plane_kind == "c"
  ss = 1 if (is_chroma and fs.chroma_format_idc == 1) else 0
  cus = fs.cus
  n = len(cus["x0"])
  ctb = 32  # v1: CU == CTU == 32 luma
  pic_w = fs.width >> ss
  pic_h = fs.height >> ss

  out = {k: np.zeros(n, np.int32) for k in (
      "x0", "y0", "mode_class", "angle", "inv_angle", "filter_flag",
      "smooth", "left_size", "top_size", "unfilter_last_one",
      "do_pdpc", "nscale", "avail_l", "avail_t", "cand_up_left",
      "proj_v", "proj_h")}

  for i in range(n):
    x0 = int(cus["x0"][i]) >> ss
    y0 = int(cus["y0"][i]) >> ss
    w = int(cus["w"][i]) >> ss
    h = int(cus["h"][i]) >> ss
    mode = int(cus["chroma_mode"][i] if is_chroma else cus["luma_mode"][i])
    # square blocks: wide-angle mapping is identity
    assert w == h
    mc = I.classify_mode(mode)
    angle = inv = 0
    filter_flag = 0
    pdpc = I.need_pdpc(w, h, mode)
    ns = 0
    if mc in (I.MC_ANG_V, I.MC_ANG_H):
      angle = I.intra_pred_angle(mode)
      inv = I.intra_inv_angle(angle) if angle else 0
      if not is_chroma:
        if I.ref_filter_flag(mode):
          filter_flag = 0
        else:
          min_dist = min(abs(mode - 50), abs(mode - 18))
          thres = [24, 14, 2, 0, 0]
          ntbs = ((w.bit_length() - 1) + (h.bit_length() - 1)) >> 1
          filter_flag = int(min_dist > thres[ntbs - 2])
      if pdpc:
        ns = I.nscale(w, h, mode)
    smooth = int((not is_chroma) and w * h > 32 and I.ref_filter_flag(mode))
    # edge sizes for the [1 2 1] filter
    if mc == I.MC_PLANAR:
      left_size, top_size = h + 1, w + 1
      unfilter_last = 0  # unfilter size = size + filter_flag(=1 when smooth)
    else:
      left_size, top_size = 2 * h, 2 * w
      unfilter_last = 1
    # availability (v1: CU == CTU, single slice/tile)
    need_l = left_size + (1 if (smooth and mc == I.MC_PLANAR) else 0)
    need_t = top_size + (1 if (smooth and mc == I.MC_PLANAR) else 0)
    ctb_bottom = min(pic_h, y0 + (ctb >> ss))
    avail_l = min(need_l, ctb_bottom - y0) if x0 > 0 else 0
    avail_t = min(need_t, pic_w - x0) if y0 > 0 else 0

    out["x0"][i] = x0
    out["y0"][i] = y0
    out["mode_class"][i] = mc
    out["angle"][i] = angle
    out["inv_angle"][i] = inv
    out["filter_flag"][i] = filter_flag
    out["smooth"][i] = smooth
    out["left_size"][i] = left_size
    out["top_size"][i] = top_size
    out["unfilter_last_one"][i] = unfilter_last
    out["do_pdpc"][i] = int(pdpc)
    out["nscale"][i] = ns
    out["avail_l"][i] = avail_l
    out["avail_t"][i] = avail_t
    out["cand_up_left"][i] = int(x0 > 0 and y0 > 0)
    out["proj_v"][i] = int(mc == I.MC_ANG_V and angle < 0)
    out["proj_h"][i] = int(mc == I.MC_ANG_H and angle < 0)
  return out


@functools.partial(jax.jit, static_argnames=("w", "h", "is_chroma",
                                             "bit_depth"))
def recon_plane_jit(res_plane, ctrl, *, w: int, h: int, is_chroma: bool,
                    bit_depth: int):
  """Sequential intra reconstruction of one plane.

  res_plane: (H, W) int32 residual plane.
  ctrl: dict of (N,) int32 per-CU control arrays.
  """
  H, W = res_plane.shape
  maxv = (1 << bit_depth) - 1
  mid = 1 << (bit_depth - 1)
  n = ctrl["x0"].shape[0]
  plane0 = jnp.full((H, W), mid, dtype=jnp.int32)

  def body(i, plane):
    x0 = ctrl["x0"][i]
    y0 = ctrl["y0"][i]
    left, top, OFF = I.edge_arrays(plane, x0, y0, w, h, ctrl["avail_l"][i],
                                   ctrl["avail_t"][i],
                                   ctrl["cand_up_left"][i], mid)

    def do_filter(args):
      l, t = args
      return I.ref_filter_121(l, t, OFF, ctrl["left_size"][i],
                              ctrl["top_size"][i],
                              ctrl["unfilter_last_one"][i])

    left, top = jax.lax.cond(ctrl["smooth"][i] > 0, do_filter,
                             lambda a: a, (left, top))
    top = jax.lax.cond(
        ctrl["proj_v"][i] > 0,
        lambda t: I.project_negative_angle(t, left, OFF,
                                           ctrl["inv_angle"][i], h),
        lambda t: t, top)
    left = jax.lax.cond(
        ctrl["proj_h"][i] > 0,
        lambda l: I.project_negative_angle(l, top, OFF,
                                           ctrl["inv_angle"][i], w),
        lambda l: l, left)

    angle = ctrl["angle"][i]
    inv = ctrl["inv_angle"][i]
    ff = ctrl["filter_flag"][i]
    pdpc = ctrl["do_pdpc"][i]
    ns = ctrl["nscale"][i]

    branches = [
        lambda: I.pred_planar(top, left, OFF, w, h),
        lambda: I.pred_dc(top, left, OFF, w, h),
        lambda: I.pred_v(top, OFF, w, h),
        lambda: I.pred_h(left, OFF, w, h),
        lambda: I.pred_angular_v(top, left, OFF, w, h, angle, inv, ff,
                                 pdpc, ns, is_chroma, maxv),
        lambda: I.pred_angular_h(top, left, OFF, w, h, angle, inv, ff,
                                 pdpc, ns, is_chroma, maxv),
    ]
    mc = ctrl["mode_class"][i]
    pred = jax.lax.switch(mc, branches)
    # PDPC for planar/DC/V/H classes
    pred = jax.lax.cond(
        (pdpc > 0) & (mc < I.MC_ANG_V),
        lambda p: I.pdpc_hvdc(p, top, left, OFF, w, h, mc, maxv),
        lambda p: p, pred)

    res = jax.lax.dynamic_slice(res_plane, (y0, x0), (h, w))
    blk = jnp.clip(pred + res, 0, maxv).astype(jnp.int32)
    return jax.lax.dynamic_update_slice(plane, blk, (y0, x0))

  return jax.lax.fori_loop(0, n, body, plane0)


def reconstruct_frame(fs: FrameSyntax) -> list[np.ndarray]:
  """Full frame reconstruction; returns [Y, Cb, Cr] uint8/uint16 planes."""
  assert fs.chroma_format_idc == 1, "4:2:0 only for now"
  bd = fs.bit_depth
  planes = []
  ctrl_y = derive_cu_controls(fs, "y")
  ctrl_c = derive_cu_controls(fs, "c")

  for c_idx, (coeff, ctrl, blk) in enumerate((
      (fs.coeff_y, ctrl_y, 32),
      (fs.coeff_cb, ctrl_c, 16),
      (fs.coeff_cr, ctrl_c, 16))):
    H, W = coeff.shape
    gw, gh = W // blk, H // blk
    # batched dequant + inverse DCT2 over the uniform TU grid
    blocks = coeff.reshape(gh, blk, gw, blk).transpose(0, 2, 1, 3) \
        .reshape(gh * gw, blk, blk)
    # per-TU qp: from tus records (c_idx match), in raster order
    sel = fs.tus["c_idx"] == c_idx
    qps = fs.tus["qp"][sel]
    assert len(qps) == gh * gw
    ss_list = [dequant_scale_shift(int(q), blk.bit_length() - 1,
                                   blk.bit_length() - 1, bd) for q in qps]
    scales = jnp.asarray([s for s, _ in ss_list], dtype=jnp.int32)
    shifts = jnp.asarray([s for _, s in ss_list], dtype=jnp.int32)
    res_blocks = dequant_itx_batch(
        jnp.asarray(blocks), scales, shifts,
        log2_w=blk.bit_length() - 1, log2_h=blk.bit_length() - 1,
        bit_depth=bd)
    res_plane = res_blocks.reshape(gh, gw, blk, blk).transpose(0, 2, 1, 3) \
        .reshape(H, W)
    ctrl_j = {k: jnp.asarray(v) for k, v in ctrl.items()}
    out = recon_plane_jit(res_plane, ctrl_j, w=blk, h=blk,
                          is_chroma=c_idx > 0, bit_depth=bd)
    dt = np.uint8 if bd == 8 else np.uint16
    planes.append(np.asarray(out).astype(dt))
  return planes
